"""Corpus-audit operators: snapshot diff, table profiling, embedding
dimension statistics.

These are the operators a running curation service executes BETWEEN
pipeline versions and crawl drops: `corpus_diff` answers "what changed
between yesterday's corpus and today's" (the regression gate every
re-curation run needs before shipping), `table_profile` is the one-pass
data profiler (null rates, cardinalities, ranges — the first thing run
against an unfamiliar 100 TB drop), and `embedding_dim_stats` is the
per-dimension health check that catches collapsed / exploded embedding
columns before they poison ANN indexes downstream.

Scale discipline (the repo-wide contract):

* nothing corpus-sized ever sits on the driver — diff ships only
  (doc_id, 16-byte md5) rows through one id-bucketed shuffle; the
  profiler's distinct counts shuffle per-block-DISTINCT (column, value)
  partials bucketed by value hash (one row per distinct value per block,
  the word-count combiner discipline); min/max/null/mean/M2 partials fold
  on the driver at O(blocks × columns), never O(rows);
* every cross-engine float compare goes through exact int64 micro-units
  BEFORE summation (the centroid_confusion nano-fix precedent), so
  partial-sum order can never move a printed digit.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from metareadability_ray.util import with_schema_seed

I64 = pa.int64()
STR = pa.string()

_BUCKETS = int(os.environ.get("MR_REDUCE_BUCKETS", "64"))


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ------------------------------------------------------------- corpus diff
def corpus_diff(
    old_ds: "ray.data.Dataset",
    new_ds: "ray.data.Dataset",
    buckets: int = _BUCKETS,
) -> "ray.data.Dataset":
    """Classify every doc_id present in either snapshot as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` by content hash — the
    between-runs regression audit of a curation service (did the new
    filter version silently drop 4% of the corpus?).

    Both inputs are ``(doc_id, text)`` datasets. Only (doc_id, md5) rows
    ever shuffle — 40 B/doc regardless of text size, one id-bucketed
    exchange; the in-bucket compare is a vectorized sorted-id merge
    (``np.searchsorted``), never a Python dict. doc_id is unique within a
    snapshot by contract (a snapshot IS keyed by id); null doc_ids are
    skipped on both engines — an anonymous doc cannot be diffed across
    runs (the bigram_cond_entropy null-id precedent).
    """

    def hash_side(side: int):
        def to_rows(batch: pa.Table) -> pa.Table:
            ids: list[int] = []
            hs: list[str] = []
            for did, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                if did is None:
                    continue
                ids.append(did)
                hs.append(hashlib.md5((t or "").encode("utf-8")).hexdigest())
            a = np.asarray(ids, dtype=np.int64) if ids else np.zeros(0, np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(a, I64),
                    "h": pa.array(hs, STR),
                    "side": pa.array(np.full(len(ids), side, np.int64), I64),
                    "__b": pa.array(a % np.int64(buckets), I64),
                }
            )

        return to_rows

    rows = old_ds.map_batches(
        hash_side(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(new_ds.map_batches(hash_side(1), batch_format="pyarrow", zero_copy_batch=True))

    def compare(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        hs = group.column("h").to_numpy(zero_copy_only=False).astype(str)
        o_ids, o_h = ids[side == 0], hs[side == 0]
        n_ids, n_h = ids[side == 1], hs[side == 1]
        no = np.argsort(n_ids)
        n_ids, n_h = n_ids[no], n_h[no]
        in_new = np.isin(o_ids, n_ids)
        out_ids = [o_ids[~in_new], n_ids[~np.isin(n_ids, o_ids)]]
        out_st = [
            np.full(int((~in_new).sum()), "removed", object),
            np.full(len(out_ids[1]), "added", object),
        ]
        common = o_ids[in_new]
        if len(common):
            pos = np.searchsorted(n_ids, common)
            same = o_h[in_new] == n_h[pos]
            out_ids.append(common)
            out_st.append(np.where(same, "unchanged", "changed").astype(object))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), I64),
                "status": pa.array(np.concatenate(out_st), STR),
            }
        )

    out_schema = pa.schema([("doc_id", I64), ("status", STR)])
    return with_schema_seed(
        rows.groupby("__b").map_groups(compare, batch_format="pyarrow"), out_schema
    )


def q_corpus_diff(sf_dir: str) -> "ray.data.Dataset":
    """Registry harness for :func:`corpus_diff` — the sf gate has only ONE
    documents table, so both snapshots derive from it deterministically
    (production passes two real snapshot dirs to ``corpus_diff``): the old
    snapshot is every identified doc; the new snapshot drops ``id % 7 ==
    0`` (crawl deletions), rewrites the text of ``id % 5 == 0`` (content
    drift), and adds ``id % 11 == 3`` back at ``id + 10^9`` (new crawls).
    Exercises all four statuses at every sf."""
    cols = ["doc_id", "text"]
    old_ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=cols)

    def perturb(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        txt: list[str] = []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None:
                continue
            if did % 7 != 0:
                ids.append(did)
                txt.append((t or "") + (" [v2]" if did % 5 == 0 else ""))
            if did % 11 == 3:
                ids.append(did + 1_000_000_000)
                txt.append("added:" + (t or ""))
        return pa.table({"doc_id": pa.array(ids, I64), "text": pa.array(txt, STR)})

    new_ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=cols).map_batches(
        perturb, batch_format="pyarrow", zero_copy_batch=True
    )
    return corpus_diff(old_ds, new_ds)


# ----------------------------------------------------------- table profile
_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def q_table_profile(sf_dir: str, buckets: int = _BUCKETS) -> pa.Table:
    """One-pass data profiler over the documents table: per column, row
    count, null count, exact distinct count, and min/max (rendered as
    strings; numerics compare natively BEFORE the cast, so '9' < '10'
    stays numeric). The first thing run against an unfamiliar 100 TB
    drop — and the schema-drift regression gate between drops.

    Two independent streams, neither corpus-sized anywhere:

    * row/null/min/max partials: one row per (block, column), folded on
      the driver at O(blocks × columns);
    * exact distinct: per-block DISTINCT (column, value) rows — bounded
      by distinct values per block, the word-count combiner discipline —
      one value-hash-bucketed shuffle, per-bucket ``np.unique`` count,
      partials sum exactly because value-space buckets are disjoint.
      Values ride stringified (injective for int64, identity for utf8 —
      distinct count is unchanged). NULLs are excluded from distinct and
      min/max, matching SQL ``count(DISTINCT x)`` / ``min(x)``.
    """
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=list(_PROFILE_COLS))

    def partials(batch: pa.Table) -> pa.Table:
        rows = []
        for col in _PROFILE_COLS:
            c = batch.column(col)
            n = len(c)
            n_null = c.null_count
            if n_null < n:
                # min/max compare NATIVELY (Arrow kernel) before the cast;
                # the driver fold re-parses int-column partials back to int
                # so '9' vs '10' never compares lexicographically
                mm = pc.min_max(c)
                mn, mx = str(mm["min"].as_py()), str(mm["max"].as_py())
            else:
                mn = mx = None
            rows.append((col, n, n_null, mn, mx))
        return pa.table(
            {
                "col": pa.array([r[0] for r in rows], STR),
                "n_rows": pa.array([r[1] for r in rows], I64),
                "n_nulls": pa.array([r[2] for r in rows], I64),
                "min_v": pa.array([r[3] for r in rows], STR),
                "max_v": pa.array([r[4] for r in rows], STR),
            }
        )

    _INT_COLS = {"doc_id", "n_chars"}

    from metareadability_ray.functions.scalars import stable_hash64

    def distinct_rows(batch: pa.Table) -> pa.Table:
        cols_out: list[str] = []
        vals_out: list[str] = []
        for col in _PROFILE_COLS:
            c = pc.drop_null(batch.column(col))
            if len(c) == 0:
                continue
            for v in pc.unique(c).to_pylist():
                cols_out.append(col)
                vals_out.append(str(v))
        if cols_out:
            keys = np.asarray(
                [c + "\x00" + v for c, v in zip(cols_out, vals_out)], dtype=object
            )
            bs = (stable_hash64(keys) & np.int64(2**62 - 1)) % np.int64(buckets)
        else:
            bs = np.zeros(0, np.int64)
        return pa.table(
            {
                "col": pa.array(cols_out, STR),
                "v": pa.array(vals_out, STR),
                "__b": pa.array(bs, I64),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        cols = group.column("col").to_numpy(zero_copy_only=False).astype(str)
        vs = group.column("v").to_numpy(zero_copy_only=False).astype(str)
        uniq_idx = np.unique(np.rec.fromarrays([cols, vs]), return_index=True)[1]
        ucols, counts = np.unique(cols[uniq_idx], return_counts=True)
        return pa.table(
            {
                "col": pa.array(ucols.astype(object), STR),
                "nd": pa.array(counts.astype(np.int64), I64),
            }
        )

    part_tabs = [
        ray.get(r)
        for r in ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    ]
    nd_tabs = [
        ray.get(r)
        for r in ds.map_batches(distinct_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .to_arrow_refs()
    ]

    agg: dict[str, list] = {c: [0, 0, None, None] for c in _PROFILE_COLS}
    for t in part_tabs:
        for r in t.to_pylist():
            a = agg[r["col"]]
            a[0] += r["n_rows"]
            a[1] += r["n_nulls"]
            for i, (v, pick) in enumerate(((r["min_v"], min), (r["max_v"], max)), start=2):
                if v is None:
                    continue
                if a[i] is None:
                    a[i] = v
                elif r["col"] in _INT_COLS:
                    a[i] = str(pick(int(a[i]), int(v)))
                else:
                    a[i] = pick(a[i], v)
    nd: dict[str, int] = {c: 0 for c in _PROFILE_COLS}
    for t in nd_tabs:
        for r in t.to_pylist():
            nd[r["col"]] += r["nd"]

    return pa.table(
        {
            "col": pa.array(list(_PROFILE_COLS), STR),
            "n_rows": pa.array([agg[c][0] for c in _PROFILE_COLS], I64),
            "n_nulls": pa.array([agg[c][1] for c in _PROFILE_COLS], I64),
            "n_distinct": pa.array([nd[c] for c in _PROFILE_COLS], I64),
            "min_v": pa.array([agg[c][2] for c in _PROFILE_COLS], STR),
            "max_v": pa.array([agg[c][3] for c in _PROFILE_COLS], STR),
        }
    )


# --------------------------------------------------- embedding dim stats
def q_embedding_dim_stats(sf_dir: str) -> pa.Table:
    """Per-dimension mean / std / min / max over the embedding column —
    the embedding-health audit (a collapsed dimension = std 0, a scale
    blow-up = max in the thousands; both poison cosine ANN silently).

    Every component fixes to int64 MICRO-units (floor(v·10⁶ + 0.5))
    before any summation — integer partial sums are order-independent,
    so the block fold and DuckDB's aggregation order produce bit-equal
    statistics (the centroid_confusion / stupid_backoff precedent); the
    final mean/std/min/max derive from those exact ints with the same
    float64 expression on both engines, then print %.4f. Partials are
    one row per (block, dim) — the driver folds O(blocks × dims) rows,
    never O(rows). std is the population σ via E[x²] − E[x]²."""
    ds = ray.data.read_parquet(_p(sf_dir, "embeddings"), columns=["embedding"])

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table(
                {
                    "dim": pa.array([], I64),
                    "n": pa.array([], I64),
                    "s1": pa.array([], I64),
                    "s2": pa.array([], I64),
                    "mn": pa.array([], I64),
                    "mx": pa.array([], I64),
                }
            )
        dims = np.diff(offs)
        # ragged-safe component index within each list (dim, 0-based);
        # offs[0] subtraction: a SLICED ListArray's offsets are not
        # zero-based while flatten() returns only the slice's values
        idx = np.arange(len(flat)) - np.repeat(offs[:-1] - offs[0], dims)
        mv = np.floor(flat * 1e6 + 0.5).astype(np.int64)
        # sort by dim, then reduceat per dim-run — int64 reduceat stays
        # int64, so every partial is EXACT (bincount's float64 weights
        # would lose bits past 2^53 on the squared terms)
        order = np.argsort(idx, kind="stable")
        si, smv = idx[order], mv[order]
        starts = np.flatnonzero(np.concatenate(([True], si[1:] != si[:-1])))
        return pa.table(
            {
                "dim": pa.array((si[starts] + 1).astype(np.int64), I64),
                "n": pa.array(np.diff(np.append(starts, len(si))).astype(np.int64), I64),
                "s1": pa.array(np.add.reduceat(smv, starts), I64),
                "s2": pa.array(np.add.reduceat(smv * smv, starts), I64),
                "mn": pa.array(np.minimum.reduceat(smv, starts), I64),
                "mx": pa.array(np.maximum.reduceat(smv, starts), I64),
            }
        )

    tabs = [
        ray.get(r)
        for r in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    ]
    acc: dict[int, list[int]] = {}
    for t in tabs:
        for r in t.to_pylist():
            a = acc.setdefault(r["dim"], [0, 0, 0, None, None])
            a[0] += r["n"]
            a[1] += r["s1"]
            a[2] += r["s2"]
            a[3] = r["mn"] if a[3] is None else min(a[3], r["mn"])
            a[4] = r["mx"] if a[4] is None else max(a[4], r["mx"])
    dims = sorted(acc)
    means, stds, mins, maxs = [], [], [], []
    for k in dims:
        n, s1, s2, mn, mx = acc[k]
        mean = s1 / 1e6 / n
        var = s2 / 1e12 / n - mean**2
        means.append("%.4f" % mean)
        stds.append("%.4f" % np.sqrt(max(var, 0.0)))
        mins.append("%.4f" % (mn / 1e6))
        maxs.append("%.4f" % (mx / 1e6))
    return pa.table(
        {
            "dim": pa.array(dims, I64),
            "n": pa.array([acc[k][0] for k in dims], I64),
            "mean": pa.array(means, STR),
            "std": pa.array(stds, STR),
            "min_v": pa.array(mins, STR),
            "max_v": pa.array(maxs, STR),
        }
    )


# ------------------------------------------------------------ recall audits
def q_lsh_recall_audit(sf_dir: str) -> pa.Table:
    """End-to-end candidate-recall audit of the MinHash-LSH dedup path:
    what fraction of the EXACT near-dup pairs (k-gram Jaccard ≥ 1/5, the
    dup pipeline's cut) does the banded LSH candidate generation surface?
    This is the number that decides whether the 100 TB scale path may
    replace the exact one — the repo pins it with a test today, but a
    production curation run re-measures it per corpus (shingle-length and
    dup-profile dependent), so it is an operator, not just a test.

    Output (one row): n_exact, n_candidates, n_hit, recall, precision —
    `recall` = hit/exact (LSH's end-to-end dedup guarantee), `precision`
    = hit/candidates (verify-stage work amortization; candidates below
    the Jaccard cut are not errors, just verify load).

    Scale shape: both pair streams are already distributed (inverted-index
    / banded shuffles); this audit adds ONE pair-bucketed shuffle of
    tagged (doc_a, doc_b, side) rows — 17 bytes each — an in-bucket
    vectorized sorted-merge count, and an O(buckets) driver fold. No pair
    set ever materializes on the driver."""
    from metareadability_ray.pipelines.textops import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(sf_dir, k=3, thresh_num=1, thresh_den=5).select_columns(
        ["doc_a", "doc_b"]
    )
    cand = minhash_lsh_pairs(sf_dir).select_columns(["doc_a", "doc_b"])

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            a = batch.column("doc_a")
            b = batch.column("doc_b")
            mix = pc.add(pc.multiply(a, pa.scalar(1_000_003, I64)), b)
            return pa.table(
                {
                    "doc_a": a,
                    "doc_b": b,
                    "side": pa.array(np.full(batch.num_rows, side, np.int64), I64),
                    "__b": pc.abs(pc.bit_wise_and(mix, pa.scalar(_BUCKETS - 1, I64))),
                }
            )

        return f

    tagged = exact.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        cand.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        a = group.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = group.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        s = group.column("side").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, b, a))
        a, b, s = a[order], b[order], s[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(a))
        has_exact = np.array([(s[st:en] == 0).any() for st, en in zip(starts, ends)])
        has_cand = np.array([(s[st:en] == 1).any() for st, en in zip(starts, ends)])
        return pa.table(
            {
                "n_exact": pa.array([int(has_exact.sum())], I64),
                "n_candidates": pa.array([int(has_cand.sum())], I64),
                "n_hit": pa.array([int((has_exact & has_cand).sum())], I64),
            }
        )

    parts = tagged.groupby("__b").map_groups(per_bucket, batch_format="pyarrow")
    ne = nc = nh = 0
    for t in parts.iter_batches(batch_format="pyarrow"):
        ne += int(pc.sum(t.column("n_exact")).as_py() or 0)
        nc += int(pc.sum(t.column("n_candidates")).as_py() or 0)
        nh += int(pc.sum(t.column("n_hit")).as_py() or 0)
    return pa.table(
        {
            "n_exact": pa.array([ne], I64),
            "n_candidates": pa.array([nc], I64),
            "n_hit": pa.array([nh], I64),
            "recall": pa.array(["%.4f" % (nh / ne)] if ne else [None], STR),
            "precision": pa.array(["%.4f" % (nh / nc)] if nc else [None], STR),
        }
    )


def q_ann_recall_audit(sf_dir: str) -> pa.Table:
    """Recall@k audit of the IVF ANN index vs exact brute-force top-k on
    the SAME queries — the index-quality dashboard number every ANN
    deployment tracks (recall falls when nprobe is too small for the
    corpus's cluster geometry; this op is how you notice after a drop).

    Scale shape: both sides are existing distributed ops; result sets are
    (num_queries × k) rows, so the compare itself is trivially small. The
    fold groups by query_id and counts neighbor-set intersection — kept
    as a per-query table (mean recall is derivable; per-query rows show
    WHICH queries the index fails, the actionable view)."""
    from metareadability_ray.pipelines.vectors import q_ivf_topk, q_knn_bruteforce

    def side_rows(ds, side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "query_id": batch.column("query_id"),
                    "neighbor_id": batch.column("neighbor_id"),
                    "side": pa.array(np.full(batch.num_rows, side, np.int64), I64),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    tagged = side_rows(q_knn_bruteforce(sf_dir), 0).union(side_rows(q_ivf_topk(sf_dir), 1))

    def per_query(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        nb = group.column("neighbor_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = group.column("side").to_numpy(zero_copy_only=False).astype(np.int64)
        ex = set(nb[s == 0].tolist())
        ap = set(nb[s == 1].tolist())
        hit = len(ex & ap)
        return pa.table(
            {
                "query_id": pa.array([qid], I64),
                "n_exact": pa.array([len(ex)], I64),
                "n_hit": pa.array([hit], I64),
                "recall": pa.array(["%.4f" % (hit / len(ex))] if ex else [None], STR),
            }
        )

    return tagged.groupby("query_id").map_groups(per_query, batch_format="pyarrow")


# ----------------------------------------------------- extraction coverage
def q_extraction_coverage(sf_dir: str) -> "ray.data.Dataset":
    """Per-host extraction-field coverage over the flagship pipeline's own
    output: what fraction of each host's pages yielded a headline /
    pubdate / authors / main text. THE production dashboard for a
    metadata-extraction service — coverage is how extraction regressions
    and hostile template changes actually surface (a host whose pubdate
    coverage drops 40 points between crawls changed its markup).

    Scale shape: composes the real extraction chain (actor-pool DOM
    kernel) with a zero-shuffle per-block combiner — one (host, 5
    counters) partial row per host per block — and a host-cardinality
    groupby. Page bytes never shuffle; only counter rows do."""
    from urllib.parse import urlparse

    from metareadability_ray.pipelines.docs2pages import pages_dataset
    from metareadability_ray.pipelines.flagship import extraction_chain
    from metareadability_ray.util import auto_actor_concurrency

    ds = extraction_chain(
        pages_dataset(sf_dir), num_partitions=16, concurrency=auto_actor_concurrency()
    ).select_columns(["url", "headline", "pubdate", "authors", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "host": pa.array([], STR),
                    "n_pages": pa.array([], I64),
                    "n_headline": pa.array([], I64),
                    "n_pubdate": pa.array([], I64),
                    "n_authors": pa.array([], I64),
                    "n_text": pa.array([], I64),
                }
            )
        hosts = np.asarray(
            [urlparse(u).netloc for u in batch.column("url").to_pylist()], dtype=object
        )
        def nz_str(col):
            return np.asarray(
                [bool(v) for v in batch.column(col).to_pylist()], dtype=np.int64
            )
        h = nz_str("headline")
        p = nz_str("pubdate")
        au = np.asarray(
            [bool(v) for v in batch.column("authors").to_pylist()], dtype=np.int64
        )
        tx = nz_str("text")
        order = np.argsort(hosts, kind="stable")
        hs = hosts[order]
        starts = np.flatnonzero(np.concatenate(([True], hs[1:] != hs[:-1])))
        def seg(x):
            return pa.array(np.add.reduceat(x[order], starts), I64)
        return pa.table(
            {
                "host": pa.array(hs[starts].astype(object), STR),
                "n_pages": pa.array(
                    np.diff(np.append(starts, len(hs))).astype(np.int64), I64
                ),
                "n_headline": seg(h),
                "n_pubdate": seg(p),
                "n_authors": seg(au),
                "n_text": seg(tx),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        host = group.column("host")[0].as_py()
        np_, nh, nd, na, nt = (
            int(pc.sum(group.column(c)).as_py())
            for c in ["n_pages", "n_headline", "n_pubdate", "n_authors", "n_text"]
        )
        return pa.table(
            {
                "host": pa.array([host], STR),
                "n_pages": pa.array([np_], I64),
                "pct_headline": pa.array(["%.4f" % (nh / np_)], STR),
                "pct_pubdate": pa.array(["%.4f" % (nd / np_)], STR),
                "pct_authors": pa.array(["%.4f" % (na / np_)], STR),
                "pct_text": pa.array(["%.4f" % (nt / np_)], STR),
            }
        )

    out_schema = pa.schema(
        [
            ("host", STR),
            ("n_pages", I64),
            ("pct_headline", STR),
            ("pct_pubdate", STR),
            ("pct_authors", STR),
            ("pct_text", STR),
        ]
    )
    return with_schema_seed(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .map_groups(finish, batch_format="pyarrow"),
        out_schema,
    )


# --------------------------------------------------- doc↔embedding coverage
def q_embedding_coverage(sf_dir: str) -> pa.Table:
    """Doc↔vector referential-coverage audit: how many documents have an
    embedding, how many vectors are orphans — the join-health check run
    BEFORE any ANN / semdedup stage (a silent 20% unembedded slice poisons
    every downstream similarity number; this is how you notice at load
    time, not after a bad dedup run). One summary row: n_docs, n_vectors,
    n_matched, n_docs_unembedded, n_orphan_vectors.

    Scale shape: only (id, side) rows move — one id-bucketed shuffle (the
    corpus_diff exchange), in-bucket vectorized membership compare, and an
    O(buckets) driver fold of five counters. NULL ids drop on both engines
    (SQL join-key semantics); ids are unique per table (both tables'
    schema contract), so counts are set cardinalities."""
    docs = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id"])
    embs = ray.data.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id"])

    def tag(col: str, side: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column(col)
            b = batch.filter(pc.is_valid(ids))
            ids = b.column(col)
            return pa.table(
                {
                    "id": ids,
                    "side": pa.array(np.full(b.num_rows, side, np.int64), I64),
                    "__b": pc.bit_wise_and(ids, pa.scalar(_BUCKETS - 1, I64)),
                }
            )

        return f

    tagged = docs.map_batches(tag("doc_id", 0), batch_format="pyarrow", zero_copy_batch=True).union(
        embs.map_batches(tag("vec_id", 1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = group.column("side").to_numpy(zero_copy_only=False).astype(np.int64)
        d = set(ids[s == 0].tolist())
        e = set(ids[s == 1].tolist())
        m = len(d & e)
        return pa.table(
            {
                "n_docs": pa.array([len(d)], I64),
                "n_vectors": pa.array([len(e)], I64),
                "n_matched": pa.array([m], I64),
            }
        )

    nd = nv = nm = 0
    parts = tagged.groupby("__b").map_groups(per_bucket, batch_format="pyarrow")
    for t in parts.iter_batches(batch_format="pyarrow"):
        nd += int(pc.sum(t.column("n_docs")).as_py() or 0)
        nv += int(pc.sum(t.column("n_vectors")).as_py() or 0)
        nm += int(pc.sum(t.column("n_matched")).as_py() or 0)
    return pa.table(
        {
            "n_docs": pa.array([nd], I64),
            "n_vectors": pa.array([nv], I64),
            "n_matched": pa.array([nm], I64),
            "n_docs_unembedded": pa.array([nd - nm], I64),
            "n_orphan_vectors": pa.array([nv - nm], I64),
        }
    )
