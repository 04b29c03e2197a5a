"""Training-set preparation operators: benchmark decontamination,
deterministic shard assignment + sharded training export, and
lead / dense-rank window breadth.

Decontamination is the standard LLM-pretraining hygiene step (the 8-gram
overlap test of GPT-3/PaLM-style data cards): a training document is
contaminated if it shares any token 8-gram with an evaluation-benchmark
document. The scale shape is the canonical small-side broadcast:

  * the BENCHMARK side is small by construction (eval suites are
    thousands of documents, not billions) — its distinct shingle-hash set
    is built distributedly, collected once, and shipped once via
    ``ray.put``;
  * the TRAINING side streams through ``map_batches`` and probes the
    broadcast set with one vectorized ``np.searchsorted`` per batch —
    training text never shuffles and the driver never holds a
    training-side column.

Membership is tested on 64-bit shingle hashes on the Ray side while the
DuckDB oracle compares shingle STRINGS: a false hit needs a 64-bit
collision between a benchmark and a training shingle (~n_bench·n_train /
2^64 — negligible even at 10^12 docs, and the standard trade in
production decontamination pipelines).

Shard assignment/export is the training-data delivery step: every doc is
routed to ``shard = md5(doc_id)[0] % num_shards`` — md5, not a salted
hash, so the assignment is reproducible across engines (the DuckDB
oracle computes the identical nibble) and across reruns, which is what
makes the export resumable per shard.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from metareadability_ray.functions.scalars import re2_tokens, stable_hash64
from metareadability_ray.pipelines.textops import I64, bucketed_distinct, bucketed_map_groups

_NGRAM_N = 8
_BENCH_MOD = 10  # doc_id % _BENCH_MOD == 0 → benchmark (eval) doc


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _batch_shingle_hashes(batch: pa.Table, n: int = _NGRAM_N) -> tuple[np.ndarray, np.ndarray]:
    """All (row_index, shingle_hash) pairs of a batch, token n-grams over
    the same ``\\S+`` token stream the SQL oracles use; docs with fewer
    than ``n`` tokens contribute nothing. One vectorized hash call per
    batch (the per-doc loop only slices token lists)."""
    idx: list[int] = []
    grams: list[str] = []
    for i, t in enumerate(batch.column("text").to_pylist()):
        if not t:
            continue
        toks = re2_tokens(t)
        if len(toks) < n:
            continue
        gs = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        idx.extend([i] * len(gs))
        grams.extend(gs)
    if not grams:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.asarray(idx, dtype=np.int64), stable_hash64(np.asarray(grams, dtype=object))


def _docs_side(sf_dir: str, bench_mod: int, benchmark: bool) -> "ray.data.Dataset":
    """documents split into benchmark / training halves by doc_id modulus
    (vectorized batch filter — Ray's filter(expr=...) can't parse ``%``).

    Null-id docs belong to NEITHER side: SQL's ``doc_id % 10 = 0`` /
    ``<> 0`` are both unknown on NULL, so the twins drop the row from the
    bench AND train halves. The kernel used to leak them into the TRAIN
    side (null → NaN under numpy modulo, and ``NaN != 0`` is True) and
    then crash the int64 doc_id emit when such a doc actually shared an
    8-gram — found by the null-doc_id conformance generator (r5)."""
    def keep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column("doc_id")))
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % bench_mod == 0) if benchmark else (ids % bench_mod != 0)
        return b.filter(pa.array(mask))

    return ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def benchmark_shingles_ref(sf_dir: str, n: int = _NGRAM_N, bench_mod: int = _BENCH_MOD):
    """Distinct shingle hashes of the benchmark docs → sorted int64 array in
    the object store. Distinct runs distributedly (per-block np.unique →
    bucketed distinct); the driver materialises only the final set, bounded
    by benchmark size — never by corpus size."""
    bench = _docs_side(sf_dir, bench_mod, benchmark=True)

    def block_hashes(batch: pa.Table) -> pa.Table:
        _, h = _batch_shingle_hashes(batch, n)
        return pa.table({"h": pa.array(np.unique(h), I64)})

    distinct = bucketed_distinct(
        bench.map_batches(block_hashes, batch_format="pyarrow", zero_copy_batch=True), "h"
    )
    parts = [ray.get(r) for r in distinct.to_arrow_refs()]
    parts = [t for t in parts if t.num_rows]
    hs = (
        np.sort(np.concatenate([t.column("h").to_numpy(zero_copy_only=False) for t in parts]))
        if parts
        else np.empty(0, np.int64)
    )
    return ray.put(hs)


def q_decontaminate(sf_dir: str, n: int = _NGRAM_N, bench_mod: int = _BENCH_MOD):
    """Contaminated training docs: (doc_id, n_hits) where n_hits = number of
    DISTINCT token 8-grams the doc shares with the benchmark set; docs with
    zero hits are clean and not emitted."""
    bench_ref = benchmark_shingles_ref(sf_dir, n, bench_mod)
    train = _docs_side(sf_dir, bench_mod, benchmark=False)

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        idx, h = _batch_shingle_hashes(batch, n)
        if not len(h) or not len(bench):
            return pa.table({"doc_id": pa.array([], I64), "n_hits": pa.array([], I64)})
        # distinct (doc, shingle) pairs, then one sorted-membership probe
        order = np.lexsort((h, idx))
        idx, h = idx[order], h[order]
        keep = np.concatenate(([True], (idx[1:] != idx[:-1]) | (h[1:] != h[:-1])))
        idx, h = idx[keep], h[keep]
        pos = np.searchsorted(bench, h)
        pos[pos == len(bench)] = 0
        hit = bench[pos] == h
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        counts = np.bincount(idx[hit], minlength=batch.num_rows)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"doc_id": pa.array(doc_ids[nz], I64), "n_hits": pa.array(counts[nz], I64)}
        )

    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        train.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("doc_id", I64), ("n_hits", I64)]),
    )


# -------------------------------------------------------------- shard export


def _write_shard_atomic(group: pa.Table, out_dir: str) -> pa.Table:
    """Write one shard group to ``out_dir/shard=NN/part-0.parquet``
    atomically (tmp + rename) and return its one-row manifest. Resume rule:
    an existing final file is NOT rewritten, and its manifest row (n_docs,
    content_hash) is computed from the BYTES ON DISK — not from the current
    group — so a rerun after the input changed can never report a hash that
    disagrees with the file it skipped."""
    import pyarrow.parquet as pq

    shard = int(group.column("shard")[0].as_py())
    sdir = os.path.join(out_dir, f"shard={shard:02d}")
    final = os.path.join(sdir, "part-0.parquet")
    if os.path.exists(final):  # resume: finished shards are skipped
        g = pq.read_table(final, columns=["doc_id"]).sort_by("doc_id")
    else:
        g = group.drop_columns(["shard"]).sort_by("doc_id")
        os.makedirs(sdir, exist_ok=True)
        tmp = final + ".tmp"
        pq.write_table(g, tmp)
        os.replace(tmp, final)
    ids = ",".join(str(d) for d in g.column("doc_id").to_pylist())
    return pa.table(
        {
            "shard": pa.array([shard], I64),
            "n_docs": pa.array([g.num_rows], I64),
            "path": pa.array([final], pa.string()),
            "content_hash": pa.array([hashlib.md5(ids.encode()).hexdigest()], pa.string()),
        }
    )


def _shard_of(doc_ids: pa.ChunkedArray | pa.Array, num_shards: int) -> np.ndarray:
    """md5 top nibble of the decimal doc_id string, mod num_shards — the
    cross-engine-stable routing the DuckDB oracle reproduces with
    ``strpos('0123456789abcdef', substr(md5(...),1,1))``. One md5
    implementation repo-wide (scalars.md5_hex); the nibble extraction is
    Arrow-vectorized (utf8_slice + index_in over the 16 hex digits)."""
    import pyarrow.compute as pc

    from metareadability_ray.functions.scalars import md5_hex

    hexes = md5_hex(pc.cast(doc_ids, pa.string()))
    first = pc.utf8_slice_codeunits(hexes, 0, 1)
    nib = pc.index_in(first, value_set=pa.array(list("0123456789abcdef")))
    return nib.to_numpy(zero_copy_only=False).astype(np.int64) % num_shards


def q_shard_assignment(sf_dir: str, num_shards: int = 16):
    """Per-shard routing report for the training export: (shard, n_docs,
    sum_chars). Per-batch combine (np.bincount) → 16-group final aggregate."""
    docs = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a shard route needs an id; null-id rows are excluded on BOTH
        # engines (twin filters too — r5 null-id contract)
        batch = batch.filter(pc.is_valid(batch.column("doc_id")))
        sh = _shard_of(batch.column("doc_id"), num_shards)
        chars = batch.column("n_chars").to_numpy(zero_copy_only=False)
        n = np.bincount(sh, minlength=num_shards)
        s = np.bincount(sh, weights=chars.astype(np.float64), minlength=num_shards)
        nz = np.nonzero(n)[0]
        return pa.table(
            {
                "shard": pa.array(nz, I64),
                "n_docs_p": pa.array(n[nz], I64),
                "sum_chars_p": pa.array(s[nz].astype(np.int64), I64),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(Sum("n_docs_p", alias_name="n_docs"), Sum("sum_chars_p", alias_name="sum_chars"))
    )

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "shard": batch.column("shard").cast(I64),
                "n_docs": batch.column("n_docs").cast(I64),
                "sum_chars": batch.column("sum_chars").cast(I64),
            }
        )

    return agg.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)


def write_training_shards(sf_dir: str, out_dir: str, num_shards: int = 16) -> pa.Table:
    """Sharded, resumable training export: every doc lands in
    ``out_dir/shard=NN/part-0.parquet`` per its md5 routing, rows sorted by
    doc_id inside each shard, file written atomically (tmp + rename). Returns
    the manifest (shard, n_docs, path, content_hash) — re-running skips
    shards whose manifest entry already exists, the same
    checkpoint-partition layout as the flagship writer.

    At this corpus size each shard is one file; at real scale the writer
    would emit one file per (shard, input block) under the same directory —
    the layout (and the resume rule: a shard directory is the unit of
    retry) is what carries over.
    """
    docs = ray.data.read_parquet(_p(sf_dir, "documents"))

    def add_shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "shard", pa.array(_shard_of(batch.column("doc_id"), num_shards), I64)
        )

    manifest = bucketed_map_groups(
        docs.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True),
        "shard",
        lambda g: _write_shard_atomic(g, out_dir),
        num_buckets=num_shards,
    )
    parts = [ray.get(r) for r in manifest.to_arrow_refs()]
    parts = [t for t in parts if t.num_rows]
    out = pa.concat_tables(parts) if parts else pa.table({})
    return out.sort_by("shard") if out.num_rows else out


# ------------------------------------------------- lead / dense_rank windows


def q_value_lead_dense(sf_dir: str):
    """Per-user windows in one grouped pass: next_value = lead(value) over
    (ts, event_id) order, type_rank = dense_rank of the row's event_type
    within the user's alphabetically-ordered distinct types."""
    ev = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts", "value"]
    )

    def per_user(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        # lead(value): shift via Arrow slice+concat so a NULL value stays
        # NULL (SQL lead() semantics) instead of becoming NaN through numpy
        vals = g.column("value").combine_chunks().cast(pa.float64())
        nxt = pa.concat_arrays([vals.slice(1), pa.array([None], pa.float64())])
        # dense_rank over event_type with DuckDB's default NULLS LAST: all
        # NULL types share one rank AFTER every non-null distinct type
        types = g.column("event_type").to_pylist()
        nonnull = sorted({t for t in types if t is not None})
        rank_of = {t: i + 1 for i, t in enumerate(nonnull)}
        null_rank = len(nonnull) + 1
        ranks = [rank_of[t] if t is not None else null_rank for t in types]
        return pa.table(
            {
                "event_id": g.column("event_id").cast(I64),
                "user_id": g.column("user_id").cast(I64),
                "next_value": nxt,
                "type_rank": pa.array(ranks, I64),
            }
        )

    return bucketed_map_groups(ev, "user_id", per_user)


# ----------------------------------------- composed curation → shard export


def export_curated_shards(sf_dir: str, out_dir: str, num_shards: int = 16) -> pa.Table:
    """The full training-data delivery flow in one call: webtext curation
    (length + CCNet boilerplate + Gopher repetition + near-dup survivor,
    `webtext.q_curated_corpus`) → benchmark decontamination (drop docs
    sharing an 8-gram with the benchmark split) → md5-routed sharded Parquet
    export with a resume manifest.

    Composition stays streaming: curation is one pass over documents with
    two bounded broadcast side inputs; decontamination adds one broadcast
    probe (contaminated ids are collected — bounded by contamination count,
    which is tiny by construction for a real benchmark); the shard write is
    the single routing shuffle. Returns the manifest table."""
    import pyarrow.compute as pc

    from metareadability_ray.pipelines.webtext import q_curated_corpus

    contaminated = q_decontaminate(sf_dir)
    bad_parts = [ray.get(r) for r in contaminated.to_arrow_refs()]
    bad_ids = np.sort(
        np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False) for t in bad_parts if t.num_rows]
            or [np.empty(0, np.int64)]
        )
    )
    bad_ref = ray.put(bad_ids)

    curated = q_curated_corpus(sf_dir)

    def drop_contaminated(batch: pa.Table) -> pa.Table:
        bad = ray.get(bad_ref) if isinstance(bad_ref, ray.ObjectRef) else bad_ref
        if not len(bad):
            return batch
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(bad, ids)
        pos[pos == len(bad)] = 0
        return batch.filter(pa.array(~(bad[pos] == ids)))

    clean = curated.map_batches(drop_contaminated, batch_format="pyarrow", zero_copy_batch=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "shard", pa.array(_shard_of(batch.column("doc_id"), num_shards), I64)
        )

    manifest = bucketed_map_groups(
        clean.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True),
        "shard",
        lambda g: _write_shard_atomic(g, out_dir),
        num_buckets=num_shards,
    )
    parts = [ray.get(r) for r in manifest.to_arrow_refs()]
    parts = [t for t in parts if t.num_rows]
    out = pa.concat_tables(parts) if parts else pa.table({})
    return out.sort_by("shard") if out.num_rows else out


# ----------------------------------------------- sequence packing (contexts)
_PACK_BUDGET = 512  # tokens per training context window
_PACK_BUCKETS = 256


def _token_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n) token counts per document, n > 0 only — ONE streaming
    text pass; everything downstream operates on this 16-byte/doc reduced
    stream, never the text again."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        ns: list[int] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            # packing orders by doc_id — an anonymous doc has no
            # deterministic pack position; skip on BOTH engines (r5)
            if did is None or not t:
                continue
            k = len(re2_tokens(t))
            if k > 0:
                ids.append(did)
                ns.append(k)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "n": pa.array(ns, pa.int64())})

    return ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)


def q_pack_contexts(sf_dir: str, budget: int = _PACK_BUDGET) -> "ray.data.Dataset":
    """Training context packing — the "concatenate and chunk" layout every
    LLM pretraining run applies before batching: documents in doc_id order
    are laid head-to-tail on one global token axis and cut into
    ``budget``-token context windows; each doc reports its token interval
    and the first/last window it lands in (a doc may straddle windows —
    standard packing-with-overflow semantics, GPT-style).

    The hard part at scale is the GLOBAL exclusive prefix sum over a
    distributed, unordered block layout. Shape: a two-level distributed
    scan —

    1. one streaming text pass reduces the corpus to (doc_id, n_tokens)
       (16 B/doc; materialized — this is the REDUCED stream, never text);
    2. docs are range-bucketed by doc_id (monotonic ``(doc_id-min)//width``,
       ≤256 buckets); the per-bucket token totals (≤256 rows) come to the
       driver, which computes each bucket's exclusive prefix offset —
       O(buckets) driver state, never O(docs);
    3. one bucketed shuffle: each bucket sorts by doc_id, adds its offset
       to a vectorized cumsum, and emits integer spans. No global sort of
       the corpus, no driver-side row loop; at 256 nodes each bucket is
       one task.

    All outputs are integers — nothing float crosses the compare boundary.
    """
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("tok_start", pa.int64()),
            ("seq_first", pa.int64()),
            ("seq_last", pa.int64()),
        ]
    )
    nds = _token_counts(sf_dir).materialize()
    if nds.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    mn = nds.min("doc_id")
    mx = nds.max("doc_id")
    width = max(1, (mx - mn) // _PACK_BUCKETS + 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__rb", pa.array((d - np.int64(mn)) // np.int64(width), pa.int64())
        )

    bucketed = nds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # per-bucket totals -> exclusive prefix offsets (O(buckets) driver state)
    totals = {
        int(r["__rb"]): int(r["n"])
        for r in bucketed.groupby("__rb").aggregate(Sum("n", alias_name="n")).take_all()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]

    def pack_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = int(group.column("__rb")[0].as_py())
        base = offsets[b]
        g = group.take(pc.sort_indices(group, sort_keys=[("doc_id", "ascending")]))
        n = g.column("n").to_numpy(zero_copy_only=False)
        end = base + np.cumsum(n)
        start = end - n
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "n_tokens": pa.array(n, pa.int64()),
                "tok_start": pa.array(start, pa.int64()),
                "seq_first": pa.array(start // np.int64(budget), pa.int64()),
                "seq_last": pa.array((end - 1) // np.int64(budget), pa.int64()),
            }
        )

    out = bucketed.groupby("__rb").map_groups(pack_bucket, batch_format="pyarrow")
    return with_schema_seed(out, out_schema)


# ------------------------------------- source-weighted token-budget sampling
_MIX_DEN = 4  # keep ~1/4 of each source's tokens
_MIX_BUCKETS = 256


def q_token_budget_mix(sf_dir: str, den: int = _MIX_DEN) -> "ray.data.Dataset":
    """Data-mixing sampler: per source, keep a deterministic ~1/``den`` of
    the TOKENS (not docs) — the per-source token-budget draw every
    pretraining mixture spec needs ("x billion tokens from source s").
    Selection order within a source is md5(doc_id) — a deterministic
    shuffle, reproducible across engines/reruns/cluster layouts — and a doc
    is kept while the source's running token total stays ≤ its budget
    ``ceil(total_tokens_s / den)`` (integer arithmetic on both sides).

    Scale shape — the same two-level distributed scan as
    :func:`q_pack_contexts`, keyed by (source, md5-prefix bucket): md5 is
    uniform, so the first byte range-buckets each source's hash order into
    256 equal slices; per-(source,bucket) totals (sources×256 rows) come to
    the driver for exclusive prefix offsets, and — the payoff — every
    bucket whose offset already exceeds its source's budget is PRUNED
    before the shuffle: at den=4 three quarters of the reduced stream
    never moves. NULL source is a legal group (SQL semantics), handled by
    the collision-free 'V'/'N' key encoding."""
    from metareadability_ray.functions.scalars import md5_hex
    from metareadability_ray.util import enc_null_key, with_schema_seed

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("n_tokens", pa.int64())]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "source", "text"])

    def reduce_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids: list[int] = []
        srcs: list[str | None] = []
        ns: list[int] = []
        for did, src, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("source").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            # budget cut orders by (md5(id), id) — anonymous docs have no
            # deterministic position; skip on BOTH engines (r5)
            if did is None or not t:
                continue
            k = len(re2_tokens(t))
            if k > 0:
                ids.append(did)
                srcs.append(src)
                ns.append(k)
        t_ids = pa.array(ids, pa.int64())
        h = md5_hex(pc.cast(t_ids, pa.string()))
        hb = (
            np.array([int(x[:2], 16) for x in h.to_pylist()], dtype=np.int64)
            if len(h)
            else np.empty(0, np.int64)
        )
        src_enc = enc_null_key(pa.array(srcs, pa.string()))
        sb = pc.binary_join_element_wise(
            src_enc,
            pa.array([f"{int(x):03d}" for x in hb], pa.string()),
            ":",
        )
        return pa.table(
            {
                "doc_id": t_ids,
                "source": pa.array(srcs, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "h": h,
                "__sb": sb,
            }
        )

    nds = ds.map_batches(reduce_batch, batch_format="pyarrow", zero_copy_batch=True).materialize()
    if nds.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    # per-(source,bucket) totals -> budgets + exclusive prefix offsets
    totals: dict[str, int] = {
        r["__sb"]: int(r["n"])
        for r in nds.groupby("__sb").aggregate(Sum("n", alias_name="n")).take_all()
    }
    per_source: dict[str, int] = {}
    for sb, t in totals.items():
        src = sb.rsplit(":", 1)[0]
        per_source[src] = per_source.get(src, 0) + t
    budgets = {src: (tot + den - 1) // den for src, tot in per_source.items()}
    offsets: dict[str, int] = {}
    acc_by_src: dict[str, int] = {}
    for sb in sorted(totals):  # 'src:bbb' sorts by (src, bucket) — md5 order
        src = sb.rsplit(":", 1)[0]
        offsets[sb] = acc_by_src.get(src, 0)
        acc_by_src[src] = offsets[sb] + totals[sb]
    live = {sb for sb in totals if offsets[sb] < budgets[sb.rsplit(":", 1)[0]]}

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch.column("__sb"), value_set=pa.array(sorted(live), pa.string()))
        return batch.filter(keep)

    def take_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sb = group.column("__sb")[0].as_py()
        base = offsets[sb]
        budget = budgets[sb.rsplit(":", 1)[0]]
        g = group.take(
            pc.sort_indices(group, sort_keys=[("h", "ascending"), ("doc_id", "ascending")])
        )
        cum = base + np.cumsum(g.column("n").to_numpy(zero_copy_only=False))
        kept = g.filter(pa.array(cum <= budget))
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "source": kept.column("source"),
                "n_tokens": kept.column("n").cast(pa.int64()),
            }
        )

    out = (
        nds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__sb")
        .map_groups(take_bucket, batch_format="pyarrow")
    )
    return with_schema_seed(out, out_schema)
