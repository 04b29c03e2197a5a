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
