"""Web-corpus curation operators: CCNet-style cross-document paragraph
dedup stats, Gopher-style within-document repetition, weighted sampling,
bigram counts, and SQL-window parity ops (ntile / rank / histogram).

Scale discipline matches textops.py/textops2.py: a document's text lives in
exactly one row, so every per-document kernel (chunking, distinct-counting,
sampling) runs wholly inside ``map_batches`` with zero shuffle; the only
streams that ever shuffle are chunk/bigram vocabularies that a per-batch
combiner has already collapsed to one row per distinct value per block.

"Paragraphs" are non-overlapping 3-token chunks: the synthetic corpus has no
line structure, and fixed-width chunking is the same hash-unit trick CCNet
applies to real paragraphs (Wenzek et al., 2020) — the unit is pluggable,
the pipeline shape is what matters.
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

from metareadability_ray.pipelines.textops import _PAIR_BUCKETS
from metareadability_ray.util import keyset_mask

_CHUNK_W = 3  # tokens per pseudo-paragraph


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _batch_chunks(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """All (doc_id, chunk) rows of a batch: non-overlapping ``_CHUNK_W``-token
    windows (trailing short chunk kept), token stream identical to the SQL
    oracles' ``regexp_extract_all(text, '\\S+')``."""
    doc_ids: list[int] = []
    chunks: list[str] = []
    for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        # null-id docs are skipped on BOTH engines across the whole chunk
        # family (per-doc outputs have no addressable row for an anonymous
        # doc, and count(DISTINCT doc_id) boilerplate thresholds ignore
        # NULL anyway — the bigram_cond_entropy contract; the twins carry
        # the matching doc_id IS NOT NULL)
        if did is None or not t:
            continue
        toks = re2_tokens(t)
        cs = [" ".join(toks[i : i + _CHUNK_W]) for i in range(0, len(toks), _CHUNK_W)]
        doc_ids.extend([did] * len(cs))
        chunks.extend(cs)
    return np.asarray(doc_ids, dtype=np.int64), np.asarray(chunks, dtype=object)


def _empty(schema: dict[str, pa.DataType]) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in schema.items()})


# ------------------------------------------------ cross-doc repeated chunks
# canonical impl lives in the scalar-function library
from metareadability_ray.functions.scalars import re2_tokens  # noqa: E402
from metareadability_ray.functions.scalars import stable_hash64 as _stable_hash64  # noqa: E402


def _n_docs(sf_dir: str) -> int:
    """Corpus row count from Parquet FOOTER metadata only — O(files) driver
    work, no data scan, valid at any corpus size."""
    import pyarrow.parquet as pq

    path = _p(sf_dir, "documents")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def q_common_chunks(sf_dir: str, min_df: int = 2) -> "ray.data.Dataset":
    """Chunks that appear in ≥``min_df`` distinct documents — the corpus
    "boilerplate list" a CCNet-style paragraph dedup removes.

    Two-phase, hash-first (the CCNet shuffle discipline): at web scale most
    chunks are unique, so a string-keyed document-frequency groupby would
    shuffle nearly the whole corpus's text. Phase 1 instead shuffles only
    (u64 chunk-hash, partial-df) — 8 bytes per distinct chunk per block —
    and keeps just the hashes with df ≥ 2 (the candidate set, bounded by
    the boilerplate vocabulary + collisions). Phase 2 re-reads the corpus,
    keeps only chunks whose hash is a candidate, and recounts those BY
    STRING: a collision can only add a candidate, never drop one, and the
    exact string recount filters the false positives — output is exact.
    Because a document is one row, per-batch distinct-(doc, chunk) partials
    are already globally distinct, so summing them gives exact df.

    ``min_df`` is the document-frequency cut; the registry query pins the
    definitional df>=2, while composed consumers (``q_curated_corpus``) pass
    a corpus-size-scaled cut so "boilerplate" stays a df *fraction* as the
    corpus grows (CCNet's shard-count scaling)."""
    def phase1_partial(batch: pa.Table) -> pa.Table:
        doc_ids, chunks = _batch_chunks(batch)
        if len(chunks) == 0:
            return _empty({"h": pa.int64(), "n_docs": pa.int64(), "__b": pa.int64()})
        hs = _stable_hash64(chunks)
        pairs = np.unique(np.rec.fromarrays([doc_ids, hs]))
        u, c = np.unique(pairs.f1, return_counts=True)
        return pa.table(
            {
                "h": pa.array(u, pa.int64()),
                "n_docs": pa.array(c, pa.int64()),
                # distinct chunk hashes are corpus-cardinality: shuffle by
                # h%64 and Arrow-aggregate per bucket (per-key Ray groupby
                # pays Python cost per distinct chunk)
                "__b": pa.array(u % np.int64(_PAIR_BUCKETS), pa.int64()),  # numpy % is never negative
            }
        )

    def sum_bucket(group: pa.Table, key: str, val: str) -> pa.Table:
        t = pa.TableGroupBy(group.select([key, val]), key).aggregate([(val, "sum")])
        return pa.table({key: t.column(key), val: t.column(f"{val}_sum").cast(pa.int64())})

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    cand_batches = list(
        ds.map_batches(phase1_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(lambda g: sum_bucket(g, "h", "n_docs"), batch_format="pyarrow")
        .filter(expr=f"n_docs >= {min_df}")
        .iter_batches(batch_format="pyarrow")
    )
    # no chunk repeats across docs → the iterator is EMPTY and concat_tables
    # would raise (hypothesis-found); an empty candidate set is a legal state
    cand = (
        pa.concat_tables(cand_batches)
        if cand_batches
        else _empty({"h": pa.int64(), "n_docs": pa.int64()})
    )
    col = cand.column("h")
    cand_ref = ray.put(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)

    def phase2_partial(batch: pa.Table) -> pa.Table:
        doc_ids, chunks = _batch_chunks(batch)
        if len(chunks) == 0:
            return _empty({"chunk": pa.string(), "n_docs": pa.int64()})
        hs = _stable_hash64(chunks)
        mask = np.asarray(keyset_mask(cand_ref, pa.array(hs, pa.int64())))
        doc_ids, chunks = doc_ids[mask], chunks[mask]
        if len(chunks) == 0:
            return _empty({"chunk": pa.string(), "n_docs": pa.int64()})
        pairs = np.unique(np.rec.fromarrays([doc_ids, chunks.astype(str)]))
        u, c = np.unique(pairs.f1, return_counts=True)
        return pa.table({"chunk": pa.array(u, pa.string()), "n_docs": pa.array(c, pa.int64())})

    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        ds.map_batches(phase2_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("chunk")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .filter(expr=f"n_docs >= {min_df}"),
        pa.schema([("chunk", pa.string()), ("n_docs", pa.int64())]),
    )


def _common_chunk_ref(sf_dir: str, min_df: int = 2):
    """Materialise the boilerplate chunk set once and ``ray.put`` it.

    Bounded by the number of chunks repeated ACROSS documents — the
    boilerplate vocabulary, which for web corpora is orders of magnitude
    smaller than the corpus (it is exactly the set CCNet ships to every
    worker); never bounded by corpus size."""
    batches = list(q_common_chunks(sf_dir, min_df=min_df).iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(batches) if batches else _empty({"chunk": pa.string(), "n_docs": pa.int64()})
    col = t.column("chunk")
    return ray.put(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)


def q_para_dedup_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-document CCNet paragraph-dedup accounting: of the doc's chunks,
    how many are corpus-boilerplate (appear in ≥2 docs)? Two streaming
    passes: (1) build the boilerplate set distributedly and broadcast it
    once; (2) per batch, a vectorized ``pc.is_in`` membership + bincount —
    per-doc totals need no shuffle because a doc is one row. Output keeps
    integer counts (n_chunks, n_common); the removal ratio is their quotient
    downstream, so no float crosses the compare boundary."""
    common = _common_chunk_ref(sf_dir)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        doc_ids, chunks = _batch_chunks(batch)
        if len(chunks) == 0:
            return _empty({"doc_id": pa.int64(), "n_chunks": pa.int64(), "n_common": pa.int64()})
        mask = np.asarray(keyset_mask(common, pa.array(chunks.astype(str), pa.string())))
        docs, inv = np.unique(doc_ids, return_inverse=True)
        total = np.bincount(inv, minlength=len(docs))
        ncommon = np.bincount(inv, weights=mask.astype(np.float64), minlength=len(docs))
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "n_chunks": pa.array(total, pa.int64()),
                "n_common": pa.array(ncommon.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- within-doc repetition (Gopher)
def q_dup_chunk_ratio(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style within-document repetition signal (Rae et al., 2021:
    "fraction of duplicate lines"): per document, total vs distinct chunk
    counts. Pure per-batch kernel — a doc is one row, so the distinct runs
    on the doc's own chunks via one ``np.unique`` over the batch's
    (doc, chunk) pairs; nothing shuffles."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        doc_ids, chunks = _batch_chunks(batch)
        if len(chunks) == 0:
            return _empty({"doc_id": pa.int64(), "n_chunks": pa.int64(), "n_distinct": pa.int64()})
        docs, inv = np.unique(doc_ids, return_inverse=True)
        total = np.bincount(inv, minlength=len(docs))
        pairs = np.unique(np.rec.fromarrays([doc_ids, chunks.astype(str)]))
        du, dc = np.unique(pairs.f0, return_counts=True)
        distinct = np.zeros(len(docs), dtype=np.int64)
        distinct[np.searchsorted(docs, du)] = dc
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "n_chunks": pa.array(total, pa.int64()),
                "n_distinct": pa.array(distinct, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------- weighted sampling
_WS_RATE_NUM = 2_000_000  # keep iff u32(md5(doc_id)[:8]) < n_chars * this


def q_weighted_sample(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic LENGTH-WEIGHTED Poisson sample: keep a document with
    probability ∝ its n_chars (the curation idiom "sample tokens, not
    docs"). Inclusion is pure integer math — u32 of the first 8 md5 hex
    digits of doc_id compared against n_chars·RATE — so every engine,
    block order, and retry selects the identical set; no RNG state, no
    float threshold. Embarrassingly parallel: filter inside map_batches,
    zero shuffle."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        w = batch.column("n_chars").to_numpy(zero_copy_only=False)
        v = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids),
            dtype=np.int64,
            count=len(ids),
        )
        keep = v < np.minimum(w * _WS_RATE_NUM, 0xFFFFFFFF)
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------- bigram top-k
def q_bigram_topk(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k adjacent-token bigrams corpus-wide — the n-gram LM / collocation
    building block. Same shape as q_word_count_topk: per-batch ``np.unique``
    combiner collapses the bigram stream to (bigram, count) partials, one
    groupby sums them, the final sort sees only the bigram vocabulary.
    Ties at the cut break lexicographically (deterministic)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = re2_tokens(t)
            grams.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        if not grams:
            return _empty({"bigram": pa.string(), "n": pa.int64()})
        u, c = np.unique(np.asarray(grams, dtype=object).astype(str), return_counts=True)
        return pa.table({"bigram": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())})

    from metareadability_ray.util import seeded_after_limit

    from metareadability_ray.pipelines.textops2 import _block_topk

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )
    # per-block top-k prefilter: the global sort sees k·blocks rows, not
    # the bigram vocabulary (the largest token space in the registry)
    out = (
        _block_topk(counts, k, key_col="bigram")
        .sort(key=["n", "bigram"], descending=[True, False])
        .limit(k)
    )
    # single-token / empty corpus → legit 0 bigrams; keep the schema
    return seeded_after_limit(out, pa.schema([("bigram", pa.string()), ("n", pa.int64())]))


# ---------------------------------------------------- quality signals (doc)
def q_token_entropy(sf_dir: str) -> "ray.data.Dataset":
    """Per-document unigram Shannon entropy (bits) — the classic
    gibberish/boilerplate quality signal (low entropy = repetitive text).
    Pure per-batch kernel: a doc is one row, so its token histogram and
    −Σ p·log2 p are computed wholly in-batch via one ``np.unique`` over the
    batch's (doc, token) pairs; nothing shuffles. Terms are summed in
    token-sorted order; the %.4f rounding on both sides absorbs the
    engine-vs-engine summation-order ulps."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def ent(batch: pa.Table) -> pa.Table:
        out_ids: list[int] = []
        out_h: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            # null-id docs skip on BOTH engines (r5 null-id contract)
            if did is None or not t:
                continue
            toks = re2_tokens(t)
            if not toks:
                continue
            _, c = np.unique(np.asarray(toks, dtype=object).astype(str), return_counts=True)
            p = c / c.sum()
            out_ids.append(did)
            out_h.append("%.4f" % float(-(p * np.log2(p)).sum()))
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()), "entropy": pa.array(out_h, pa.string())}
        )

    return ds.map_batches(ent, batch_format="pyarrow", zero_copy_batch=True)


def q_top_bigram_fraction(sf_dir: str) -> "ray.data.Dataset":
    """Gopher repetition signal (Rae et al., 2021): per document, the count
    of the single most frequent bigram vs the total bigram count (their
    quotient is the "top 2-gram fraction" filter). Integer outputs only —
    nothing float crosses the compare boundary. Per-batch kernel, zero
    shuffle (a doc is one row)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def frac(batch: pa.Table) -> pa.Table:
        out_ids: list[int] = []
        top: list[int] = []
        total: list[int] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            # null-id docs skip on BOTH engines (SQL GROUP BY doc_id would
            # pool them — the bigram_cond_entropy r5 null-id contract)
            if did is None or not t:
                continue
            toks = re2_tokens(t)
            if len(toks) < 2:
                continue
            grams = np.asarray([f"{a} {b}" for a, b in zip(toks, toks[1:])], dtype=object)
            _, c = np.unique(grams.astype(str), return_counts=True)
            out_ids.append(did)
            top.append(int(c.max()))
            total.append(len(grams))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "top_bigram_n": pa.array(top, pa.int64()),
                "n_bigrams": pa.array(total, pa.int64()),
            }
        )

    return ds.map_batches(frac, batch_format="pyarrow", zero_copy_batch=True)


def q_gopher_repetition(sf_dir: str) -> "ray.data.Dataset":
    """The full Gopher n-gram repetition panel (Rae et al., 2021, Table A1):
    per document, top-{2,3,4}-gram count vs total overlapping n-gram count.
    One row per document (zeros when the doc is too short for that n), all
    integers. One pass, per-batch kernel, zero shuffle — the three n sizes
    share a single token split per doc."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def panel(batch: pa.Table) -> pa.Table:
        # null-id docs skip on BOTH engines (SQL per-doc grouping has no
        # addressable row for an anonymous doc — r5 null-id contract)
        ids = [d for d in batch.column("doc_id").to_pylist() if d is not None]
        cols: dict[str, list[int]] = {f"top{n}_n": [] for n in (2, 3, 4)}
        for n in (2, 3, 4):
            cols[f"n{n}"] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did is None:
                continue
            toks = re2_tokens(t)
            for n in (2, 3, 4):
                if len(toks) < n:
                    cols[f"top{n}_n"].append(0)
                    cols[f"n{n}"].append(0)
                    continue
                grams = np.asarray(
                    [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)],
                    dtype=object,
                )
                _, c = np.unique(grams.astype(str), return_counts=True)
                cols[f"top{n}_n"].append(int(c.max()))
                cols[f"n{n}"].append(len(grams))
        out = {"doc_id": pa.array(ids, pa.int64())}
        for k in ("top2_n", "n2", "top3_n", "n3", "top4_n", "n4"):
            out[k] = pa.array(cols[k], pa.int64())
        return pa.table(out)

    return ds.map_batches(panel, batch_format="pyarrow", zero_copy_batch=True)


def q_source_mix(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-mix report per source (the data-mixing dashboard: how much of
    each provenance, how long, how language-diverse). Pre-aggregates to
    (source, lang) partials INSIDE map_batches — the shuffle carries one row
    per (source, lang) per block, bounded by vocabulary not corpus — then a
    tiny sort-groupby finishes n_docs / sum_chars / distinct-lang counts."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["source", "lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # dropna=False: NULL source (or lang) is a legal group under SQL
        # GROUP BY — pandas' default silently drops it (hypothesis-found
        # with the null-source documents strategy)
        df = batch.to_pandas()
        g = df.groupby(["source", "lang"], sort=False, dropna=False)["n_chars"].agg(
            ["count", "sum"]
        )
        g = g.reset_index()
        src = pa.array([None if isinstance(v, float) else v for v in g["source"]], pa.string())
        lng = pa.array([None if isinstance(v, float) else v for v in g["lang"]], pa.string())
        return pa.table(
            {
                "source": src,
                "lang": lng,
                "n": pa.array(g["count"].astype(np.int64), pa.int64()),
                "chars": pa.array(g["sum"].astype(np.int64), pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        # count(DISTINCT lang) ignores NULL langs, per SQL
        langs = {v for v in group.column("lang").to_pylist() if v is not None}
        return pa.table(
            {
                "source": pa.array([group.column("source")[0].as_py()], pa.string()),
                "n_docs": pa.array([int(pc.sum(group.column("n")).as_py())], pa.int64()),
                "sum_chars": pa.array(
                    [int(pc.sum(group.column("chars")).as_py())], pa.int64()
                ),
                "n_langs": pa.array([len(langs)], pa.int64()),
            }
        )

    from metareadability_ray.util import null_safe_map_groups

    return null_safe_map_groups(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "source",
        finish,
    )


# ------------------------------------------------- composed curation pipeline
def q_curated_corpus(
    sf_dir: str, broadcast_threshold: int | None = None
) -> "ray.data.Dataset":
    """The end-to-end webtext curation pipeline, composed from the individual
    signals: keep a document iff

      1. length: 100 ≤ n_chars ≤ 500,
      2. boilerplate: ≤50% of its chunks are corpus-common (CCNet filter,
         ``n_common·2 ≤ n_chunks``; chunk-less docs fail), where "common"
         is a corpus-size-scaled df cut ``df ≥ max(2, ceil(0.002·n_docs))``
         — a df *fraction*, so the boilerplate definition is stable as the
         corpus grows 1000× (a fixed df≥2 would eventually mark every
         chunk common),
      3. repetition: its top bigram is ≤1/15 of all bigrams (Gopher filter,
         ``top_bigram_n·15 ≤ n_bigrams``; docs with no bigram are dropped),
      4. near-dup: it is its duplicate-cluster's survivor (min doc_id).

    All thresholds are integer cross-multiplications — no float ever crosses
    the compare boundary. SIZE-ADAPTIVE execution (the CC switch, round-3
    verdict ask): while both side inputs fit ``broadcast_threshold``
    (default ``util._ANTI_BROADCAST_ROWS`` = 5M rows ≈ one comfortable
    ``ray.put``), they broadcast and ONE streaming pass computes every
    signal in-batch — text read once, never shuffled. Above it — at 10^12
    docs a 30% dup rate or a fat boilerplate vocabulary is TB-scale — the
    plan swaps per side input to the distributed twin: the boilerplate
    membership becomes a chunk-hash-bucketed string semi-join (per-doc
    totals ride the in-batch pass; only matched occurrences and thin
    per-doc count rows shuffle), and the loser filter becomes the bucketed
    ``scalable_anti_join``. Both paths are property-tested equal at
    sf0.001 with the threshold forced to 0."""
    from metareadability_ray.pipelines.clustering import _clusters_table
    from metareadability_ray.pipelines.textops import _PAIR_BUCKETS, reduce_side_attach
    from metareadability_ray.util import (
        _ANTI_BROADCAST_ROWS,
        scalable_anti_join,
        with_schema_seed,
    )

    import math

    if broadcast_threshold is None:
        broadcast_threshold = _ANTI_BROADCAST_ROWS
    I64 = pa.int64()

    min_df = max(2, math.ceil(0.002 * _n_docs(sf_dir)))
    common_ds = q_common_chunks(sf_dir, min_df=min_df).materialize()
    clusters = _clusters_table(sf_dir)
    losers_t = clusters.filter(
        pc.invert(pc.equal(clusters.column("doc_id"), clusters.column("cluster_id")))
    ).select(["doc_id"])

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "lang", "n_chars"]
    )

    def bigram_length_mask(batch: pa.Table) -> pa.Array:
        # Repetition signal: per-doc top-bigram count (np.unique per doc —
        # the bigram vocabulary is doc-local, nothing crosses docs).
        texts = batch.column("text").to_pylist()
        bi_ok = np.zeros(len(texts), dtype=bool)
        for j, t in enumerate(texts):
            toks = re2_tokens(t)
            if len(toks) < 2:
                continue
            grams = np.asarray(
                [f"{a} {b}" for a, b in zip(toks, toks[1:])], dtype=object
            ).astype(str)
            _, c = np.unique(grams, return_counts=True)
            bi_ok[j] = int(c.max()) * 15 <= len(grams)
        return pc.and_(
            pa.array(bi_ok.tolist(), pa.bool_()),
            pc.and_(
                pc.greater_equal(batch.column("n_chars"), pa.scalar(100)),
                pc.less_equal(batch.column("n_chars"), pa.scalar(500)),
            ),
        )

    if common_ds.count() <= broadcast_threshold and losers_t.num_rows <= broadcast_threshold:
        tabs = list(common_ds.iter_batches(batch_format="pyarrow"))
        ct = pa.concat_tables(tabs) if tabs else _empty({"chunk": pa.string(), "n_docs": pa.int64()})
        col = ct.column("chunk")
        common = ray.put(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        loser_ids = losers_t.column("doc_id")
        loser_ref = ray.put(
            loser_ids.combine_chunks() if isinstance(loser_ids, pa.ChunkedArray) else loser_ids
        )

        def curate(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("doc_id").to_numpy(zero_copy_only=False), np.int64)
            # Boilerplate signal: ONE vectorized membership call over the
            # whole batch's chunk stream (same kernel as q_para_dedup_stats),
            # then per-doc totals via bincount.
            chunk_ok = np.zeros(len(ids), dtype=bool)
            doc_ids, chunks = _batch_chunks(batch)
            if len(chunks):
                m = np.asarray(keyset_mask(common, pa.array(chunks.astype(str), pa.string())))
                docs, inv = np.unique(doc_ids, return_inverse=True)
                tot = np.bincount(inv, minlength=len(docs))
                com = np.bincount(inv, weights=m.astype(np.float64), minlength=len(docs))
                ok = dict(zip(docs.tolist(), (com.astype(np.int64) * 2 <= tot).tolist()))
                chunk_ok = np.asarray([ok.get(int(d), False) for d in ids], dtype=bool)
            mask = pc.and_(pa.array(chunk_ok.tolist(), pa.bool_()), bigram_length_mask(batch))
            mask = pc.and_(mask, keyset_mask(loser_ref, batch.column("doc_id"), negate=True))
            return batch.filter(mask).select(["doc_id", "lang", "n_chars"])

        return ds.map_batches(curate, batch_format="pyarrow", zero_copy_batch=True)

    # ---- distributed twin: nothing corpus-sized is ever driver-held ----
    out_schema = pa.schema([("doc_id", I64), ("lang", pa.string()), ("n_chars", I64)])

    def local_signals(batch: pa.Table) -> pa.Table:
        # bigram + length in-batch; per-doc chunk totals ride as a column
        ids = np.asarray(batch.column("doc_id").to_numpy(zero_copy_only=False), np.int64)
        doc_ids, _chunks = _batch_chunks(batch)
        tot = np.zeros(len(ids), dtype=np.int64)
        if len(doc_ids):
            docs, cnt = np.unique(doc_ids, return_counts=True)
            pos = np.searchsorted(docs, ids)
            pos = np.clip(pos, 0, len(docs) - 1)
            hit = docs[pos] == ids
            tot[hit] = cnt[pos[hit]]
        keep = pc.and_(bigram_length_mask(batch), pa.array((tot > 0).tolist(), pa.bool_()))
        out = batch.append_column("n_chunks", pa.array(tot, I64)).filter(keep)
        return out.select(["doc_id", "lang", "n_chars", "n_chunks"])

    base = ds.map_batches(local_signals, batch_format="pyarrow", zero_copy_batch=True)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, chunks = _batch_chunks(batch)
        if len(chunks) == 0:
            return _empty({"ck": pa.string(), "doc_id": pa.int64(), "__b": pa.int64()})
        hs = _stable_hash64(chunks)
        return pa.table(
            {
                "ck": pa.array(chunks.astype(str), pa.string()),
                "doc_id": pa.array(doc_ids, I64),
                "__b": pa.array(hs % np.int64(_PAIR_BUCKETS), I64),
            }
        )

    def common_side(batch: pa.Table) -> pa.Table:
        cks = batch.column("chunk")
        if isinstance(cks, pa.ChunkedArray):
            cks = cks.combine_chunks()
        hs = _stable_hash64(np.asarray(cks.to_pylist(), dtype=object))
        return pa.table(
            {
                "ck": cks,
                "doc_id": pa.nulls(batch.num_rows, I64),
                "__b": pa.array(hs % np.int64(_PAIR_BUCKETS), I64),
            }
        )

    unioned = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True).union(
        common_ds.map_batches(common_side, batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucket_match(group: pa.Table) -> pa.Table:
        # matched common-chunk OCCURRENCES per doc within this hash bucket
        is_common = pc.is_null(group.column("doc_id"))
        commons = group.filter(is_common)
        occ = group.filter(pc.invert(is_common))
        if commons.num_rows == 0 or occ.num_rows == 0:
            return _empty({"doc_id": pa.int64(), "nc": pa.int64()})
        cset = commons.column("ck")
        if isinstance(cset, pa.ChunkedArray):
            cset = cset.combine_chunks()
        hit = occ.filter(pc.is_in(occ.column("ck"), value_set=cset))
        if hit.num_rows == 0:
            return _empty({"doc_id": pa.int64(), "nc": pa.int64()})
        u, c = np.unique(hit.column("doc_id").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"doc_id": pa.array(u, I64), "nc": pa.array(c, I64)})

    matched = unioned.groupby("__b").map_groups(bucket_match, batch_format="pyarrow")

    # zero-seed so docs with no common chunk still get an n_common row
    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "nc": pa.array(np.zeros(batch.num_rows, np.int64), I64)}
        )

    def add_docb(batch: pa.Table) -> pa.Table:
        b = batch.column("doc_id").cast(I64).to_numpy(zero_copy_only=False) % np.int64(_PAIR_BUCKETS)
        return batch.append_column("__db", pa.array(b, I64))

    def sum_doc(group: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(group.select(["doc_id", "nc"]), "doc_id").aggregate([("nc", "sum")])
        return pa.table({"doc_id": t.column("doc_id"), "nc": t.column("nc_sum").cast(I64)})

    ncommon = (
        base.map_batches(zero_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(matched)
        .map_batches(add_docb, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__db")
        .map_groups(sum_doc, batch_format="pyarrow")
    )

    withc = reduce_side_attach(
        base, "doc_id",
        [("doc_id", I64), ("lang", pa.string()), ("n_chars", I64), ("n_chunks", I64)],
        ncommon, "doc_id", "nc", "nc", I64,
    )

    def chunk_filter(batch: pa.Table) -> pa.Table:
        ok = pc.less_equal(
            pc.multiply(batch.column("nc"), pa.scalar(2, I64)), batch.column("n_chunks")
        )
        return batch.filter(ok).select(["doc_id", "lang", "n_chars"])

    kept = withc.map_batches(chunk_filter, batch_format="pyarrow", zero_copy_batch=True)
    out = scalable_anti_join(
        kept, "doc_id", ray.data.from_arrow(losers_t), threshold=broadcast_threshold
    )
    return with_schema_seed(out, out_schema)


# ------------------------------------------------------------ SQL windows
def q_event_quartiles(sf_dir: str) -> "ray.data.Dataset":
    """NTILE(4) over value within each event_type, reported as per-(type,
    quartile) count/min/max. Exact SQL NTILE semantics: the first n%4
    buckets get the extra row. min/max are SELECTED raw doubles (never
    computed), so they hash-match without rounding. Partitioning
    assumption: one group per event_type (low-cardinality partition key,
    like every grouped window op here); within a group everything is one
    sort + ``np.repeat``."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def quart(group: pa.Table) -> pa.Table:
        # ORDER BY value NULLS LAST (DuckDB default; Arrow sort_indices
        # places nulls at_end) — null rows still occupy NTILE positions,
        # but min()/max() skip them: a quartile slice's min is its first
        # VALID value and its max its last valid one (nulls sort last
        # within the slice too), or NULL for an all-null slice.
        idx = pc.sort_indices(
            group, sort_keys=[("value", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(idx)
        n = len(g)
        q, r = divmod(n, 4)
        sizes = np.asarray([q + 1] * r + [q] * (4 - r), dtype=np.int64)
        sizes = sizes[sizes > 0]
        ends = np.cumsum(sizes)
        starts = ends - sizes
        col = g.column("value")
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
        mins, maxs = [], []
        for s, e in zip(starts, ends):
            sl = valid[s:e]
            if sl.any():
                last = e - 1 - int(np.argmax(sl[::-1]))
                mins.append(float(v[s]) if sl[0] else None)
                maxs.append(float(v[last]))
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table(
            {
                "event_type": pa.array(
                    [g.column("event_type")[0].as_py()] * len(sizes), pa.string()
                ),
                "quartile": pa.array(np.arange(1, len(sizes) + 1), pa.int64()),
                "n": pa.array(sizes, pa.int64()),
                "min_v": pa.array(mins, pa.float64()),
                "max_v": pa.array(maxs, pa.float64()),
            }
        )

    from metareadability_ray.util import null_safe_map_groups

    return null_safe_map_groups(ds, "event_type", quart)


def q_value_ranks(sf_dir: str) -> "ray.data.Dataset":
    """RANK / DENSE_RANK / PERCENT_RANK over value within event_type, per
    event. Vectorized per group: rank = ``searchsorted(left)+1`` on the
    sorted values (ties share the first position, exactly SQL RANK),
    dense_rank = unique-inverse+1, percent_rank = (rank−1)/(n−1) — the
    same IEEE double DuckDB computes, formatted %.6f on both sides."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def ranks(group: pa.Table) -> pa.Table:
        # ORDER BY value NULLS LAST; SQL window ordering treats NULLs as
        # EQUAL to each other, so all null rows form one trailing tie group:
        # rank = (#non-null)+1, dense_rank = (#distinct non-null)+1.
        idx = pc.sort_indices(
            group, sort_keys=[("value", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(idx)
        col = g.column("value")
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        n = len(valid)
        nn = int(valid.sum())  # nulls sort last → non-null is a prefix
        vv = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)[:nn]
        rnk = np.empty(n, dtype=np.int64)
        drnk = np.empty(n, dtype=np.int64)
        rnk[:nn] = np.searchsorted(vv, vv, side="left") + 1
        rnk[nn:] = nn + 1
        if nn:
            _, inv = np.unique(vv, return_inverse=True)
            drnk[:nn] = inv + 1
            drnk[nn:] = int(inv.max()) + 2
        else:
            drnk[:] = 1
        pct = (rnk - 1) / (n - 1) if n > 1 else np.zeros(n, dtype=np.float64)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "event_type": g.column("event_type"),
                "rnk": pa.array(rnk, pa.int64()),
                "drnk": pa.array(drnk, pa.int64()),
                "pct": pa.array(np.char.mod("%.6f", pct), pa.string()),
            }
        )

    from metareadability_ray.util import null_safe_map_groups

    return null_safe_map_groups(ds, "event_type", ranks)


def q_value_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Fixed-width histogram of event values (width-50 buckets) — the
    width_bucket / binning op. Per-batch ``np.unique`` combiner emits one
    row per non-empty bucket per block; the groupby sums O(buckets·blocks)
    rows. Fully Arrow-vectorized (floor/divide/cast)."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["value"])

    # NULL values form a legal (NULL, count) GROUP BY row. Ray's groupby
    # can't shuffle a null key, so the bucket rides coalesced to INT64_MIN —
    # unreachable from CAST(floor(double)) for any event value — and is
    # restored after the aggregate.
    _NULL_BUCKET = np.iinfo(np.int64).min

    def partial(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(batch.column("value"), pa.scalar(50.0))), pa.int64())
        g = pa.table({"bucket": b}).group_by("bucket").aggregate([([], "count_all")])
        return pa.table(
            {
                "bucket": pc.fill_null(g.column("bucket"), _NULL_BUCKET),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )

    def dec(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket")
        restored = pc.if_else(pc.equal(b, _NULL_BUCKET), pa.scalar(None, pa.int64()), b)
        return pa.table({"bucket": restored, "n": batch.column("n").cast(pa.int64())})

    return agg.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- LM quality scoring (CCNet triad)
def _lm_model_parts(ds: "ray.data.Dataset", count_partial):
    """Train the add-one unigram LM: run the per-block (token, count)
    combiner, sum with one vocabulary groupby, and broadcast the model
    table once. Returns ``(model_ref, n_total, v_size)``. Shared by
    :func:`q_lm_perplexity` and curation.q_ccnet_buckets so the two can
    never drift on the model definition."""
    from metareadability_ray.util import lookup_ref

    vocab_batches = [
        b
        for b in ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
        .iter_batches(batch_format="pyarrow")
        if b.num_columns
    ]
    _vocab_schema = pa.schema([("token", pa.string()), ("c", pa.int64())])
    vocab = pa.concat_tables(vocab_batches) if vocab_batches else _vocab_schema.empty_table()
    n_total = int(pc.sum(vocab.column("c")).as_py() or 0)
    v_size = vocab.num_rows
    return lookup_ref(vocab.column("token"), vocab.column("c")), n_total, v_size


def q_lm_perplexity(sf_dir: str) -> "ray.data.Dataset":
    """Per-document language-model quality score: mean bits-per-token under
    an add-one-smoothed unigram LM trained on the corpus itself — the third
    CCNet quality signal (Wenzek et al., 2020 score documents with a KenLM
    5-gram; the unigram twin keeps the exact same distributed shape while
    staying SQL-checkable). Low bits = common/natural text, high bits =
    rare-token gibberish.

    Two streaming passes, same discipline as tfidf_top_terms:

    1. **train**: per-batch ``np.unique`` combiner collapses the token
       stream to (token, count) partials → one vocabulary-sized
       groupby(token) → the model table, shipped ONCE via ``ray.put``
       (the classic broadcast small side; CCNet likewise ships a trained
       model file to every node). At 100 TB the broadcast is bounded by a
       count cut (rare tokens dropped from the table fall through to the
       same smoothed (0+1)/(N+V) probability the SQL assigns genuine OOV —
       the cut changes scores only for tokens near the cut, disclosed
       here); at sf the full vocabulary ships, so the SQL twin is exact.
    2. **score**: per batch, per-doc (token, k) pairs via one ``np.unique``
       over the batch's (doc, token) stream, counts looked up vectorized
       (``pc.index_in``), bits summed per doc in token-sorted order.

    score(doc) = Σ_t k_t · −log2((c_t + 1) / (N + V)) / Σ_t k_t, rendered
    %.4f on both sides (absorbs engine-vs-engine summation-order ulps, the
    token_entropy precedent). Docs with no tokens are excluded, matching
    the SQL's join-through-tokens shape.
    """
    from metareadability_ray.util import lookup_ref, lookup_take

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            if t:
                toks.extend(re2_tokens(t))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(toks, dtype=object).astype(str), return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()), "c": pa.array(c, pa.int64())})

    model_ref, n_total, v_size = _lm_model_parts(ds, count_partial)

    def score(batch: pa.Table) -> pa.Table:
        out_schema = {"doc_id": pa.int64(), "bits_per_token": pa.string()}
        doc_ids: list[int] = []
        toks: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            # per-doc score: null ids skip (twin's dt filters too — r5);
            # the LM itself (count_partial above) still sees their tokens
            if did is None or not t:
                continue
            parts = re2_tokens(t)
            doc_ids.extend([did] * len(parts))
            toks.extend(parts)
        if not toks:
            return _empty(out_schema)
        pairs, k = np.unique(
            np.rec.fromarrays(
                [np.asarray(doc_ids, np.int64), np.asarray(toks, dtype=object).astype(str)]
            ),
            return_counts=True,
        )
        c = (
            lookup_take(model_ref, pa.array(pairs.f1.astype(object), pa.string()), default=0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        bits = -np.log2((c + 1.0) / float(n_total + v_size))
        pd_ids = pairs.f0
        starts = np.flatnonzero(np.concatenate(([True], pd_ids[1:] != pd_ids[:-1])))
        ends = np.append(starts[1:], len(pd_ids))
        out_d: list[int] = []
        out_b: list[str] = []
        for s, e in zip(starts, ends):
            ks = k[s:e].astype(np.float64)
            out_d.append(int(pd_ids[s]))
            out_b.append("%.4f" % (float((ks * bits[s:e]).sum()) / float(ks.sum())))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "bits_per_token": pa.array(out_b, pa.string()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------- CCNet paragraph-dedup text REWRITE
def q_para_dedup_rewrite(sf_dir: str, min_df: int = 2) -> "ray.data.Dataset":
    """The CCNet cleaning step itself (not just its accounting —
    :func:`q_para_dedup_stats` counts, THIS rewrites): per document, drop
    every chunk that appears in ≥``min_df`` distinct documents and emit the
    rebuilt text, in original chunk order, plus removal accounting. The
    first corpus-informed TEXT-REWRITE operator in the registry
    (``redact_pii`` rewrites from a static pattern; this one's pattern set
    is learned from the corpus).

    Scale shape = para_dedup_stats exactly: the boilerplate chunk set is
    built distributedly (hash-first df shuffle, 8 B per distinct chunk per
    block) and broadcast ONCE via ``ray.put`` — the set CCNet ships to
    every worker — then one streaming pass rewrites each doc wholly
    in-batch (a doc is one row; membership via vectorized ``pc.is_in``).
    Text shuffles nowhere. Docs whose every chunk is boilerplate stay, with
    ``clean_text = ''`` (the downstream length filter drops them, same as
    CCNet); docs with no chunks at all (null/empty text) are not rows,
    matching the SQL's join-through-chunks shape."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("clean_text", pa.string()),
            ("n_chunks", pa.int64()),
            ("n_removed", pa.int64()),
        ]
    )
    common = _common_chunk_ref(sf_dir, min_df=min_df)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def rewrite(batch: pa.Table) -> pa.Table:
        doc_ids, chunks = _batch_chunks(batch)  # doc-order-preserving
        if len(chunks) == 0:
            return _empty(
                {f.name: f.type for f in out_schema}
            )
        is_common = np.asarray(keyset_mask(common, pa.array(chunks.astype(str), pa.string())))
        starts = np.flatnonzero(np.concatenate(([True], doc_ids[1:] != doc_ids[:-1])))
        ends = np.append(starts[1:], len(doc_ids))
        out_d: list[int] = []
        out_t: list[str] = []
        out_n: list[int] = []
        out_r: list[int] = []
        for s, e in zip(starts, ends):
            keep = ~is_common[s:e]
            out_d.append(int(doc_ids[s]))
            out_t.append(" ".join(chunks[s:e][keep]))
            out_n.append(e - s)
            out_r.append(int(is_common[s:e].sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "clean_text": pa.array(out_t, pa.string()),
                "n_chunks": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_r, pa.int64()),
            }
        )

    return with_schema_seed(
        ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# ----------------------------------------- training chunker (sliding window)
_CHUNK_WINDOW = 32
_CHUNK_STRIDE = 24


def q_chunk_documents(
    sf_dir: str, window: int = _CHUNK_WINDOW, stride: int = _CHUNK_STRIDE
) -> "ray.data.Dataset":
    """Sliding token-window chunker — the complement of ``pack_contexts``:
    where packing concatenates short docs up to a context budget, chunking
    SPLITS long docs into overlapping ``window``-token pieces every
    ``stride`` tokens (the standard pre-embedding / pre-training splitter;
    overlap = window - stride preserves cross-boundary context). One row
    per (doc, window start); trailing short windows kept (their tokens
    appear nowhere else once past the overlap); empty/null docs vanish
    (join-through-tokens shape, same as the SQL).

    Scale shape: pure per-batch flat kernel over one pruned streaming pass —
    a doc is one row, so every window is computable in-batch; nothing
    shuffles, output size ≈ corpus × (1 + overlap fraction)."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("start_tok", pa.int64()),  # 1-based, = the SQL generate_series index
            ("n_tokens", pa.int64()),
            ("chunk_text", pa.string()),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        out_d: list[int] = []
        out_s: list[int] = []
        out_n: list[int] = []
        out_t: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if not t:
                continue
            toks = re2_tokens(t)
            L = len(toks)
            if L == 0:
                continue
            for s in range(0, L, stride):
                out_d.append(did)
                out_s.append(s + 1)
                out_n.append(min(window, L - s))
                out_t.append(" ".join(toks[s : s + window]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "start_tok": pa.array(out_s, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_t, pa.string()),
            }
        )

    return with_schema_seed(
        ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# ------------------------- exact duplicated-span coverage (Lee et al., 2022)
_SPAN_K = 4


def _span_batch_grams(
    batch: pa.Table, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_id, start_offset_0based, gram) for every sliding k-gram."""
    doc_ids: list[int] = []
    offs: list[int] = []
    grams: list[str] = []
    for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        # null-id docs skip on BOTH engines across the span family (per-doc
        # outputs pool under SQL GROUP BY doc_id, the dup-set df uses
        # count(DISTINCT doc_id) which ignores NULL anyway; twins carry the
        # matching doc_id IS NOT NULL — r5 null-id contract)
        if did is None or not t:
            continue
        toks = re2_tokens(t)
        if len(toks) < k:
            continue
        gs = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        doc_ids.extend([did] * len(gs))
        offs.extend(range(len(gs)))
        grams.extend(gs)
    return (
        np.asarray(doc_ids, dtype=np.int64),
        np.asarray(offs, dtype=np.int64),
        np.asarray(grams, dtype=object),
    )


def _dup_gram_ref(ds: "ray.data.Dataset", k: int):
    """Broadcast ref of the cross-doc duplicated k-gram set, built with the
    hash-first two-phase discipline shared by the Lee-2022 span family
    (stats + rewrite use THIS one builder so their dup-set definition cannot
    drift): phase 1 shuffles only (u64 gram-hash, partial-df) per distinct
    gram per block; phase 2 recounts the ≥2-doc candidates BY STRING so a
    hash collision can never mark a unique gram duplicated. The final set is
    bounded by the duplicated vocabulary, never the corpus."""

    def phase1_partial(batch: pa.Table) -> pa.Table:
        doc_ids, _, grams = _span_batch_grams(batch, k)
        if len(grams) == 0:
            return _empty({"h": pa.int64(), "n_docs": pa.int64(), "__b": pa.int64()})
        hs = _stable_hash64(grams)
        pairs = np.unique(np.rec.fromarrays([doc_ids, hs]))
        u, c = np.unique(pairs.f1, return_counts=True)
        return pa.table(
            {
                "h": pa.array(u, pa.int64()),
                "n_docs": pa.array(c, pa.int64()),
                "__b": pa.array(u % np.int64(_PAIR_BUCKETS), pa.int64()),
            }
        )

    def sum_bucket(group: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(group.select(["h", "n_docs"]), "h").aggregate([("n_docs", "sum")])
        return pa.table({"h": t.column("h"), "n_docs": t.column("n_docs_sum").cast(pa.int64())})

    cand_batches = list(
        ds.map_batches(phase1_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(sum_bucket, batch_format="pyarrow")
        .filter(expr="n_docs >= 2")
        .iter_batches(batch_format="pyarrow")
    )
    cand = (
        pa.concat_tables(cand_batches)
        if cand_batches
        else _empty({"h": pa.int64(), "n_docs": pa.int64()})
    )
    col = cand.column("h")
    cand_ref = ray.put(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)

    # phase 2: exact string recount of candidate grams only (collision filter)
    def phase2_partial(batch: pa.Table) -> pa.Table:
        doc_ids, _, grams = _span_batch_grams(batch, k)
        if len(grams) == 0:
            return _empty({"gram": pa.string(), "n_docs": pa.int64()})
        hs = _stable_hash64(grams)
        mask = np.asarray(keyset_mask(cand_ref, pa.array(hs, pa.int64())))
        doc_ids, grams = doc_ids[mask], grams[mask]
        if len(grams) == 0:
            return _empty({"gram": pa.string(), "n_docs": pa.int64()})
        pairs = np.unique(np.rec.fromarrays([doc_ids, grams.astype(str)]))
        u, c = np.unique(pairs.f1, return_counts=True)
        return pa.table({"gram": pa.array(u, pa.string()), "n_docs": pa.array(c, pa.int64())})

    dup_batches = list(
        ds.map_batches(phase2_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gram")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .filter(expr="n_docs >= 2")
        .iter_batches(batch_format="pyarrow")
    )
    dup = (
        pa.concat_tables(dup_batches)
        if dup_batches
        else _empty({"gram": pa.string(), "n_docs": pa.int64()})
    )
    gcol = dup.column("gram")
    return ray.put(gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol)


def q_dup_span_stats(sf_dir: str, k: int = _SPAN_K) -> "ray.data.Dataset":
    """Exact-substring dedup accounting (Lee et al., 2022, "Deduplicating
    Training Data Makes Language Models Better"): per document, how many
    tokens sit inside a ``k``-token span that also occurs verbatim in
    ANOTHER document. Differs from the CCNet chunk family: spans are
    SLIDING k-grams (every offset), so coverage catches duplicated passages
    at any alignment, not just on chunk boundaries.

    Scale shape: the cross-doc duplicated-gram set is built with the same
    hash-first two-phase discipline as :func:`q_common_chunks` — phase 1
    shuffles only (u64 gram-hash, partial-df) per distinct gram per block
    (Lee et al.'s suffix array is replaced by the hash-df set, which is the
    corpus-bounded object here), phase 2 recounts candidates BY STRING so
    hash collisions cannot create false duplicates; the final set (bounded
    by the duplicated vocabulary, not the corpus) broadcasts once via
    ``ray.put``. Coverage is then a per-batch kernel: a doc is one row, so
    token coverage needs a difference-array sweep per doc and no shuffle.
    """
    from metareadability_ray.util import with_schema_seed

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    dup_ref = _dup_gram_ref(ds, k)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("n_dup_tokens", pa.int64())]
    )

    def coverage(batch: pa.Table) -> pa.Table:
        out_d: list[int] = []
        out_n: list[int] = []
        out_c: list[int] = []
        # ONE membership probe per batch (not per doc): all grams of all
        # docs go through a single vectorized pc.is_in, then the per-doc
        # difference-array sweeps slice the shared hit mask
        docs: list[tuple[int, int, int]] = []  # (doc_id, L, n_grams)
        grams: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did is None or not t:  # r5 null-id contract (twin filters too)
                continue
            toks = re2_tokens(t)
            L = len(toks)
            if L == 0:
                continue
            gs = [" ".join(toks[j : j + k]) for j in range(L - k + 1)] if L >= k else []
            docs.append((did, L, len(gs)))
            grams.extend(gs)
        hit = (
            np.asarray(keyset_mask(dup_ref, pa.array(grams, pa.string())))
            if grams
            else np.empty(0, dtype=bool)
        )
        pos = 0
        for did, L, ng in docs:
            out_d.append(did)
            out_n.append(L)
            if ng == 0:
                out_c.append(0)
                continue
            # +1 at each hit start, -1 at start+k; covered where running sum > 0
            diff = np.zeros(L + 1, dtype=np.int64)
            starts = np.flatnonzero(hit[pos : pos + ng])
            pos += ng
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + k, -1)
            out_c.append(int((np.cumsum(diff[:L]) > 0).sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "n_dup_tokens": pa.array(out_c, pa.int64()),
            }
        )

    return with_schema_seed(
        ds.map_batches(coverage, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


def q_dup_span_rewrite(sf_dir: str, k: int = _SPAN_K) -> "ray.data.Dataset":
    """The Lee-2022 exact-substring dedup REWRITE: every token inside a
    cross-doc duplicated sliding k-gram span is REMOVED from the document
    (the ExactSubstr deduplication the paper actually applies to training
    text, where :func:`q_dup_span_stats` is its accounting twin). Output
    text is the space-join of surviving tokens — whitespace-normalized, the
    same contract as para_dedup_rewrite.

    Same two-phase hash-first dup-set builder as the stats query (shared
    :func:`_dup_gram_ref`, so the span definition cannot drift), then one
    zero-shuffle per-batch rewrite pass: the difference-array coverage
    sweep yields a keep mask per doc and the text moves through the
    pipeline exactly once. Docs with tokens but full coverage emit an
    empty string (a fully-duplicated doc keeps its row — dropping is a
    separate policy); tokenless/NULL docs drop, matching the stats query."""
    from metareadability_ray.util import with_schema_seed

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    dup_ref = _dup_gram_ref(ds, k)

    out_schema = pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string())])

    def rewrite(batch: pa.Table) -> pa.Table:
        out_d: list[int] = []
        out_t: list[str] = []
        docs: list[tuple[int, list[str], int]] = []  # (doc_id, toks, n_grams)
        grams: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did is None or not t:  # r5 null-id contract (twin filters too)
                continue
            toks = re2_tokens(t)
            L = len(toks)
            if L == 0:
                continue
            gs = [" ".join(toks[j : j + k]) for j in range(L - k + 1)] if L >= k else []
            docs.append((did, toks, len(gs)))
            grams.extend(gs)
        hit = (
            np.asarray(keyset_mask(dup_ref, pa.array(grams, pa.string())))
            if grams
            else np.empty(0, dtype=bool)
        )
        pos = 0
        for did, toks, ng in docs:
            L = len(toks)
            out_d.append(did)
            if ng == 0:
                out_t.append(" ".join(toks))
                continue
            diff = np.zeros(L + 1, dtype=np.int64)
            starts = np.flatnonzero(hit[pos : pos + ng])
            pos += ng
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + k, -1)
            covered = np.cumsum(diff[:L]) > 0
            out_t.append(" ".join(tok for tok, c in zip(toks, covered) if not c))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "clean_text": pa.array(out_t, pa.string()),
            }
        )

    return with_schema_seed(
        ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# --------------------------------- Gopher quality filter (Rae et al., 2021)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")



_GOPHER_ALPHA = None  # compiled lazily per process


def _gopher_counts(toks: list[str]) -> tuple[int, int, int, int, int]:
    """The Rae-2021 Table A1 rule arithmetic shared by
    ``q_gopher_quality_filter`` (per-doc panel) and ``q_quality_by_source``
    (per-source rollup) — one implementation so the rules cannot drift:
    (n_words, word_chars, n_alpha_words, n_stop_distinct, keep)."""
    global _GOPHER_ALPHA
    if _GOPHER_ALPHA is None:
        import re as _re

        _GOPHER_ALPHA = _re.compile(r"[A-Za-z]")
    n = len(toks)
    wc = sum(len(w) for w in toks)
    na = sum(1 for w in toks if _GOPHER_ALPHA.search(w))
    stop = _GOPHER_STOPWORDS
    ns = len({w.lower() for w in toks if w.lower() in stop})
    keep = int(
        50 <= n <= 100000
        and 3 * n <= wc <= 10 * n
        and 5 * na >= 4 * n
        and ns >= 2
    )
    return n, wc, na, ns, keep


def q_gopher_quality_filter(sf_dir: str) -> "ray.data.Dataset":
    """The published Gopher quality-filter rule panel (Rae et al., 2021,
    Table A1), as exact integer arithmetic so no float crosses the compare
    boundary: word count in [50, 100000]; mean word length in [3, 10]
    (expressed as word_chars between 3·n_words and 10·n_words); ≥80% of
    words contain an alphabetic character (5·n_alpha_words ≥ 4·n_words);
    and ≥2 DISTINCT members of the Gopher stop-word list present. Emits the
    per-rule counters plus the composed ``keep_i`` flag (what a curation
    pipeline filters on). Docs with no tokens vanish (join-through-tokens,
    same as the SQL). Distinct from ``quality_score`` (ad-hoc signals) —
    this is the literature's rule set, verbatim thresholds.

    Scale shape: single pruned streaming pass, per-batch kernel, zero
    shuffle — every rule is a function of the doc's own tokens."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_words", pa.int64()),
            ("word_chars", pa.int64()),
            ("n_alpha_words", pa.int64()),
            ("n_stop_distinct", pa.int64()),
            ("keep_i", pa.int32()),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def panel(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {f.name: [] for f in out_schema}
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            # null-id docs skip on BOTH engines (SQL GROUP BY doc_id would
            # pool them — r5 null-id contract)
            if did is None or not t:
                continue
            toks = re2_tokens(t)
            if len(toks) == 0:
                continue
            n, wc, na, ns, keep = _gopher_counts(toks)
            out["doc_id"].append(did)
            out["n_words"].append(n)
            out["word_chars"].append(wc)
            out["n_alpha_words"].append(na)
            out["n_stop_distinct"].append(ns)
            out["keep_i"].append(keep)
        return pa.table({f.name: pa.array(out[f.name], f.type) for f in out_schema})

    return with_schema_seed(
        ds.map_batches(panel, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# ------------------------------------- within-document dedup (RefinedWeb)
def q_intra_doc_dedup(sf_dir: str) -> "ray.data.Dataset":
    """RefinedWeb-style WITHIN-document dedup (Penedo et al., 2023, "line-wise
    deduplication" — here over the corpus's 3-token pseudo-paragraph chunks,
    same pluggable unit as the CCNet ops): per document, keep only the FIRST
    occurrence of each chunk, in original order, and emit the rebuilt text
    plus removal accounting. Complements :func:`q_para_dedup_rewrite`, which
    removes CROSS-document boilerplate — this one needs no corpus state at
    all.

    Scale shape: the ideal operator — one pruned streaming pass, per-batch
    kernel, ZERO shuffle and zero broadcast (each doc's dedup is a function
    of the doc alone). Docs with no chunks (null/empty text) are not rows,
    matching the SQL's join-through-chunks shape."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("clean_text", pa.string()),
            ("n_chunks", pa.int64()),
            ("n_removed", pa.int64()),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def rewrite(batch: pa.Table) -> pa.Table:
        out_d: list[int] = []
        out_t: list[str] = []
        out_n: list[int] = []
        out_r: list[int] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did is None or not t:  # r5 null-id contract (twin filters too)
                continue
            toks = re2_tokens(t)
            if not toks:
                continue
            cs = [" ".join(toks[i : i + _CHUNK_W]) for i in range(0, len(toks), _CHUNK_W)]
            seen: set[str] = set()
            kept: list[str] = []
            for c in cs:
                if c not in seen:
                    seen.add(c)
                    kept.append(c)
            out_d.append(did)
            out_t.append(" ".join(kept))
            out_n.append(len(cs))
            out_r.append(len(cs) - len(kept))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "clean_text": pa.array(out_t, pa.string()),
                "n_chunks": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_r, pa.int64()),
            }
        )

    return with_schema_seed(
        ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )




def hist_quantile_cont(vals: np.ndarray, cnts: np.ndarray, q: float) -> float:
    """DuckDB ``quantile_cont`` over a (sorted values, counts) histogram:
    pos = q*(n-1) on the sorted multiset; val = (1-frac)·v[floor] +
    frac·v[ceil] — that exact weighted form, NOT the algebraically-equal
    ``lo + frac*(hi-lo)``, which differs in the last ulp (hypothesis found
    [1, 14] @ q=0.1: 2.3 vs DuckDB's 2.3000000000000003; a 400-case probe
    matches the weighted form bit-for-bit). Property-tested for exact
    float equality against DuckDB itself (tests/test_hypothesis_props.py)
    so the band filter in ``q_length_percentile_filter`` cannot diverge at
    a threshold boundary. ``vals`` must be ascending; n ≥ 1."""
    n = int(cnts.sum())
    cum = np.cumsum(cnts)  # cum[i] = #values <= vals[i]
    pos = q * (n - 1)
    k = int(np.floor(pos))
    frac = pos - k
    lo_v = vals[np.searchsorted(cum, k + 1, side="left")]
    if frac == 0.0:
        return float(lo_v)
    hi_v = vals[np.searchsorted(cum, k + 2, side="left")]
    return (1.0 - frac) * float(lo_v) + frac * float(hi_v)


# --------------------------- exact distributed percentile length filter
def q_length_percentile_filter(
    sf_dir: str, lo_q: float = 0.05, hi_q: float = 0.95
) -> "ray.data.Dataset":
    """Percentile-band length trim (the standard "drop the pathological
    tails" curation step): keep documents whose ``n_chars`` lies within the
    corpus's exact [p05, p95] band, thresholds computed with DuckDB's
    ``quantile_cont`` linear-interpolation semantics.

    Scale shape: exact quantiles over an INTEGER column need no sketch and
    no sort — pass 1 reduces the corpus to a value histogram (per-batch
    ``np.unique`` combiner, then a groupby over the ~10^3-10^4 distinct
    lengths), the driver folds the tiny histogram into two thresholds
    (O(distinct) work), and pass 2 re-filters the pruned 2-column stream.
    Both passes stream; nothing corpus-sized ever materializes. Contrast
    ``quantile_sketch_value`` (mergeable sketch, for non-integer or
    unbounded-cardinality columns)."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def vc(batch: pa.Table) -> pa.Table:
        col = batch.column("n_chars")
        arr = col.to_numpy(zero_copy_only=False)
        arr = arr[~pa.compute.is_null(col).to_numpy(zero_copy_only=False)] if col.null_count else arr
        vals, cnts = np.unique(arr, return_counts=True)
        return pa.table(
            {"n_chars": pa.array(vals, pa.int64()), "cnt": pa.array(cnts, pa.int64())}
        )

    hist = (
        ds.map_batches(vc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()  # small: one row per DISTINCT length
    )
    vals = np.array([r["n_chars"] for r in hist], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in hist], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    n = int(cnts.sum())
    if n == 0:
        # quantile over the empty set is NULL; the SQL's WHERE keeps nothing
        return with_schema_seed(ds.limit(0).map_batches(lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow"), out_schema)
    lo = hist_quantile_cont(vals, cnts, lo_q)
    hi = hist_quantile_cont(vals, cnts, hi_q)

    def band(batch: pa.Table) -> pa.Table:
        c = batch.column("n_chars")
        keep = pc.and_kleene(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        keep = pc.fill_null(keep, False)
        return batch.filter(keep)

    return with_schema_seed(
        ds.map_batches(band, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# ----------------------------- cross-source contamination (shared chunks)
def q_source_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Cross-source contamination matrix: for every pair of sources, the
    number of DISTINCT 3-token chunks that occur in both (the "how much of
    source B is already in source A" audit run before mixing corpora —
    the source-level analogue of benchmark decontamination). Null-source
    docs are excluded, matching the SQL's ``a.source < b.source``
    comparison semantics.

    Scale shape: per-batch combiner collapses each block to its DISTINCT
    (chunk, source) pairs before anything moves; the only shuffle is that
    deduped vocabulary stream, bucketed by chunk-hash so each of the
    ``_PAIR_BUCKETS`` reduce tasks sees complete chunk groups (in-bucket
    lexsort + run-length grouping, exact string equality — no collision
    risk). Per-chunk work is O(sources-containing-chunk²) with the source
    universe small by construction; bucket partials then collapse in a
    final source-pair groupby over ≤ buckets × |sources|² tiny rows."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("source_a", pa.string()),
            ("source_b", pa.string()),
            ("n_shared", pa.int64()),
        ]
    )
    nb = _PAIR_BUCKETS
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def chunk_source(batch: pa.Table) -> pa.Table:
        pairs: set[tuple[str, str]] = set()
        for src, t in zip(batch.column("source").to_pylist(), batch.column("text").to_pylist()):
            if not t or src is None:
                continue
            toks = re2_tokens(t)
            for i in range(0, len(toks), _CHUNK_W):
                pairs.add((" ".join(toks[i : i + _CHUNK_W]), src))
        if not pairs:
            return _empty({"chunk": pa.string(), "source": pa.string(), "__b": pa.int64()})
        chunks_np = np.asarray([p[0] for p in pairs], dtype=object)
        h = _stable_hash64(chunks_np)
        return pa.table(
            {
                "chunk": pa.array(chunks_np, pa.string()),
                "source": pa.array([p[1] for p in pairs], pa.string()),
                "__b": pa.array(h % np.int64(nb), pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        cs = np.asarray(group.column("chunk").to_pylist(), dtype=object)
        ss = np.asarray(group.column("source").to_pylist(), dtype=object)
        order = np.lexsort((ss, cs))
        cs, ss = cs[order], ss[order]
        # cross-block re-dedup of (chunk, source)
        keep = np.concatenate(([True], (cs[1:] != cs[:-1]) | (ss[1:] != ss[:-1])))
        cs, ss = cs[keep], ss[keep]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        ends = np.append(starts[1:], len(cs))
        agg: dict[tuple[str, str], int] = {}
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            srcs = ss[s:e]  # already sorted, distinct
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    k = (srcs[i], srcs[j])
                    agg[k] = agg.get(k, 0) + 1
        if not agg:
            return _empty(
                {"source_a": pa.string(), "source_b": pa.string(), "n_shared": pa.int64()}
            )
        ks = sorted(agg)
        return pa.table(
            {
                "source_a": pa.array([k[0] for k in ks], pa.string()),
                "source_b": pa.array([k[1] for k in ks], pa.string()),
                "n_shared": pa.array([agg[k] for k in ks], pa.int64()),
            }
        )

    partials = (
        ds.map_batches(chunk_source, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return with_schema_seed(
        partials.groupby(["source_a", "source_b"]).aggregate(
            Sum("n_shared", alias_name="n_shared")
        ),
        out_schema,
    )


# ------------------------------- per-source quality dashboard (composed)
def q_quality_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-source Gopher-panel pass rates — the mix-dashboard view a
    curation run actually reports ("source X loses 40% of docs to the
    length rule"): composes :func:`q_gopher_quality_filter`'s per-doc rule
    panel with a provenance rollup. NULL source is a legal group (SQL
    GROUP BY semantics, via the encoded-key shuffle).

    Scale shape: the panel pass streams (zero shuffle) with ``source``
    riding along; the only shuffle is the tiny (source, partial-counts)
    stream a per-batch combiner has already collapsed to one row per
    source per block. Token-less docs are not rows upstream, so they count
    in neither numerator nor denominator — same join-through-tokens shape
    as the panel itself."""
    from metareadability_ray.util import dec_null_key, enc_null_key, with_schema_seed

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("n_keep", pa.int64()),
        ]
    )
    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["source", "text"]
    )

    def panel_rollup(batch: pa.Table) -> pa.Table:
        agg: dict[str | None, list[int]] = {}
        for src, t in zip(batch.column("source").to_pylist(), batch.column("text").to_pylist()):
            if not t:
                continue
            toks = re2_tokens(t)
            if len(toks) == 0:
                continue
            _n, _wc, _na, _ns, keep = _gopher_counts(toks)
            c = agg.setdefault(src, [0, 0])
            c[0] += 1
            c[1] += keep
        ks = list(agg)
        return pa.table(
            {
                "source": enc_null_key(pa.array(ks, pa.string())),
                "n_docs": pa.array([agg[k][0] for k in ks], pa.int64()),
                "n_keep": pa.array([agg[k][1] for k in ks], pa.int64()),
            }
        )

    rolled = (
        ds.map_batches(panel_rollup, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_keep", alias_name="n_keep"))
    )

    def dec(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("source")
        return batch.set_column(i, "source", dec_null_key(batch.column("source")))

    return with_schema_seed(
        rolled.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# --------------------------- robust (MAD) length-outlier detection
def q_mad_outlier_docs(sf_dir: str, k: float = 2.0) -> "ray.data.Dataset":
    """Robust length-outlier report: documents whose ``n_chars`` deviates
    from the corpus median by more than ``k``× the median absolute
    deviation (Hampel's robust z-score — the outlier rule that, unlike
    mean/stddev, a handful of pathological pages cannot drag; the
    complement of :func:`q_length_percentile_filter`'s fixed-percentile
    band, reporting the TAIL instead of keeping the body).

    Scale shape: one histogram reduce, zero extra passes for the MAD —
    the deviation histogram is a driver-side TRANSFORM of the value
    histogram (|v − med| with the same counts, equidistant values merged),
    so both medians fold from the same O(distinct-lengths) table via
    :func:`hist_quantile_cont` (bit-for-bit DuckDB ``quantile_cont``
    parity, property-tested). Pass 2 streams the pruned 2-column corpus
    through an exact float64 band compare — med is .5-granular, MAD
    .25-granular, both dyadic, so the `>` is ulp-safe on both engines.
    NULL ``n_chars`` rows join neither the histogram nor the output."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def vc(batch: pa.Table) -> pa.Table:
        col = batch.column("n_chars")
        arr = col.to_numpy(zero_copy_only=False)
        if col.null_count:
            arr = arr[~pa.compute.is_null(col).to_numpy(zero_copy_only=False)]
        vals, cnts = np.unique(arr, return_counts=True)
        return pa.table(
            {"n_chars": pa.array(vals, pa.int64()), "cnt": pa.array(cnts, pa.int64())}
        )

    hist = (
        ds.map_batches(vc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()  # one row per DISTINCT length
    )
    vals = np.array([r["n_chars"] for r in hist], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in hist], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    if not len(vals):
        return with_schema_seed(
            ds.limit(0).map_batches(
                lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow"
            ),
            out_schema,
        )
    med = hist_quantile_cont(vals, cnts, 0.5)
    # deviation histogram = |v - med| over the SAME counts (merge ties)
    dev = np.abs(vals.astype(np.float64) - med)
    dv, inv = np.unique(dev, return_inverse=True)
    dc = np.bincount(inv, weights=cnts.astype(np.float64)).astype(np.int64)
    mad = hist_quantile_cont(dv, dc, 0.5)
    thr = k * mad

    def tail(batch: pa.Table) -> pa.Table:
        c = batch.column("n_chars")
        d = pc.abs(pc.subtract(pc.cast(c, pa.float64()), pa.scalar(med)))
        keep = pc.fill_null(pc.greater(d, pa.scalar(thr)), False)
        return batch.filter(keep)

    return with_schema_seed(
        ds.map_batches(tail, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# --------------------- per-doc bigram conditional entropy (predictability)
def q_bigram_cond_entropy(sf_dir: str) -> "ray.data.Dataset":
    """Per-document bigram conditional entropy H(W₂|W₁) in bits — the
    information-theoretic predictability signal (Shannon 1951's next-token
    uncertainty, per doc): H = −Σ p(w1,w2)·log2(c12/c1). Low H = the next
    token is near-deterministic given the current one (templated/repetitive
    text — the smooth-valued cousin of Gopher's top_bigram_fraction rule);
    H(W₂|W₁) ≤ H(W₂) always, and the GAP is how much structure unigram
    entropy misses.

    Pure per-batch kernel, zero shuffle (a doc is one row): bigram counts
    and the first-position marginal come from one ``np.unique`` each, terms
    sum in bigram-sorted order, %.4f on both engines absorbs the
    summation-order ulps (the token_entropy contract). Docs with < 2
    tokens emit no row (no bigram exists — matches the SQL join shape);
    null doc_id docs are skipped on both engines (a per-doc statistic has
    no addressable row for an anonymous doc — the stupid_backoff_score /
    incremental_dedup precedent; SQL GROUP BY doc_id would otherwise pool
    every null-id doc into ONE merged-bigram row)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def ent(batch: pa.Table) -> pa.Table:
        out_ids: list[int] = []
        out_h: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did is None or not t:
                continue
            toks = re2_tokens(t)
            if len(toks) < 2:
                continue
            w1 = np.asarray(toks[:-1], dtype=object).astype(str)
            w2 = np.asarray(toks[1:], dtype=object).astype(str)
            pairs, c12 = np.unique(np.rec.fromarrays([w1, w2]), return_counts=True)
            # first-position marginal: c1(w1) = Σ_w2 c12 — reduceat over the
            # pair-sorted runs (pairs sort primarily by w1)
            u1 = pairs.f0
            starts = np.flatnonzero(np.concatenate(([True], u1[1:] != u1[:-1])))
            c1 = np.repeat(
                np.add.reduceat(c12, starts), np.diff(np.append(starts, len(c12)))
            )
            n = float(c12.sum())
            p12 = c12 / n
            h = float(-(p12 * np.log2(c12 / c1)).sum())
            out_ids.append(did)
            out_h.append("%.4f" % h)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "cond_entropy": pa.array(out_h, pa.string()),
            }
        )

    return ds.map_batches(ent, batch_format="pyarrow", zero_copy_batch=True)
