"""Corpus/user analytics: PMI collocations, per-user OLS value trends,
time-decayed activity scores, sliding-window distinct counts, and hybrid
(BM25 + embedding) retrieval fusion.

Five operators, five canonical distributed shapes (the later two documented
on their own functions):

* :func:`q_collocations_pmi` — pointwise mutual information over adjacent
  token bigrams (the classic collocation detector; Church & Hanks 1990).
  Bigram counts pre-aggregate per block and shuffle once keyed by bigram;
  the unigram count table is a vocabulary-sized broadcast looked up
  vectorized inside the finalizer — the SAME small-side contract as
  ``q_tfidf_top_terms``'s df broadcast (textops2.py). The two totals PMI
  needs (token and bigram occurrence counts) come from one fixed-width
  per-doc aggregate, never a vocabulary scan. At 10^12 docs the broadcast
  side grows with the vocabulary, not the corpus; the bucketed reduce-side
  attach (textops.reduce_side_attach's string twin) is the named
  alternative if a deployment's vocabulary outgrows worker heaps.
* :func:`q_user_value_trend` — per-user OLS slope of event value vs time
  (DuckDB ``regr_slope`` twin). One hash-bucket shuffle co-locates each
  user's rows; inside a bucket the whole regression is segment-vectorized
  (lexsort + ``np.add.reduceat``) with the numerically-stable CENTERED
  two-pass sums, never a Python per-user loop. NULL semantics match
  DuckDB exactly (probed): pairs with NULL value are skipped, and the
  slope is NULL iff fewer than 2 valid pairs or zero x-variance — the
  group row itself always survives.
* :func:`q_decayed_user_score` — exponentially time-decayed per-user value
  sum (tau = 7 days against the corpus-max timestamp): the standard
  recency-weighted engagement score. Corpus max ts is one tiny aggregate;
  the decay term is one vectorized ``np.exp`` per batch; per-user partials
  combine in-block before a single groupby, so only (user, 2 doubles)
  rows shuffle. A user whose every value is NULL keeps their group with a
  NULL score (SQL SUM-over-empty semantics).

Float-parity discipline: scores/slopes print at %.4f via ``fmt_fixed``
(negative-zero unsigned on both sides); every arithmetic expression mirrors
the SQL twin's operation order so engine drift stays at the ulp level the
rounding absorbs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from metareadability_ray.pipelines.relational import fmt_fixed
from metareadability_ray.pipelines.textops import _PAIR_BUCKETS
from metareadability_ray.util import lookup_ref, lookup_take, with_schema_seed

I64 = pa.int64()
STR = pa.string()
F64 = pa.float64()

PMI_MIN_COUNT = 5
# epoch seconds of 2024-01-01 (the testdata epoch); x rides in HOURS from
# here so slope magnitudes stay printable — slope is offset/scale-invariant
# up to the constant, and both engines apply the identical affine map
TREND_T0_S = 1704067200.0
DECAY_TAU_S = 604800.0  # 7 days


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ------------------------------------------------------- PMI collocations
def q_collocations_pmi(sf_dir: str) -> "ray.data.Dataset":
    """All adjacent-token bigrams with count ≥ PMI_MIN_COUNT and their PMI
    log2((c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni))).

    No top-k cut: a float-ordered cut would make the result set itself
    depend on last-ulp log2 differences between engines; the min-count
    threshold is integer-exact on both sides, so the ROW SET is stable and
    only the printed PMI needs the %.4f contract."""
    from metareadability_ray.functions.scalars import re2_tokens

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            if t:
                toks.extend(re2_tokens(t))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], I64)})
        u, c = np.unique(np.asarray(toks, dtype=object).astype(str), return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()), "n": pa.array(c, I64)})

    def bi_partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = re2_tokens(t)
            grams.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        if not grams:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n_ab": pa.array([], I64)}
            )
        u, c = np.unique(np.asarray(grams, dtype=object).astype(str), return_counts=True)
        return pa.table({"bigram": pa.array(u, pa.string()), "n_ab": pa.array(c, I64)})

    def nb_partial(batch: pa.Table) -> pa.Table:
        # N_bi = Σ max(0, tokens−1): pure Arrow kernel, no Python tokenize —
        # count_substring_regex(\S+) matches len(re2_tokens) exactly
        k = pc.fill_null(
            pc.cast(pc.count_substring_regex(batch.column("text"), r"\S+"), I64), 0
        )
        nb = pc.sum(pc.max_element_wise(pc.subtract(k, 1), 0)).as_py() or 0
        return pa.table({"nb": pa.array([nb], I64)})

    n_bi = float(
        ds.map_batches(nb_partial, batch_format="pyarrow", zero_copy_batch=True).sum("nb")
        or 0
    )

    schema = pa.schema([("bigram", pa.string()), ("n_ab", I64), ("pmi", pa.string())])
    if n_bi == 0:
        return with_schema_seed(
            ray.data.from_arrow(schema.empty_table()), schema
        )

    # vocabulary-sized broadcast (the tfidf df contract); N_uni is the free
    # column sum of the same table — no third pass over the text
    uni_batches = [
        b
        for b in ds.map_batches(uni_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
        if b.num_columns
    ]
    uni_t = pa.concat_tables(uni_batches)
    n_uni = float(pc.sum(uni_t.column("n")).as_py())
    uni_ref = lookup_ref(uni_t.column("token"), uni_t.column("n"))

    bi = (
        ds.map_batches(bi_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("n_ab", alias_name="n_ab"))
        .filter(expr=f"n_ab >= {PMI_MIN_COUNT}")
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        bg = batch.column("bigram")
        # tokens are \S+ so the single interior space splits exactly in two
        parts = pc.split_pattern(bg, " ")
        tok_a = pc.list_element(parts, 0)
        tok_b = pc.list_element(parts, 1)
        n_ab = batch.column("n_ab").to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = np.asarray(lookup_take(uni_ref, tok_a)).astype(np.float64)
        n_b = np.asarray(lookup_take(uni_ref, tok_b)).astype(np.float64)
        # mirror the SQL expression's op order exactly
        pmi = np.log2((n_ab / n_bi) / ((n_a / n_uni) * (n_b / n_uni)))
        return pa.table(
            {
                "bigram": bg,
                "n_ab": batch.column("n_ab"),
                "pmi": fmt_fixed(pa.array(pmi, F64), 4),
            }
        )

    out = bi.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return with_schema_seed(out, schema)


# ----------------------------------------------------- per-user OLS trend
def q_user_value_trend(sf_dir: str) -> "ray.data.Dataset":
    """Per-user OLS slope of value vs event time (hours since TREND_T0_S):
    ``regr_slope(value, x)`` per user_id, plus the valid-pair count."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])
    nb = np.int64(_PAIR_BUCKETS)

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = batch.column("ts").cast(I64).to_numpy(zero_copy_only=False)
        # identical affine map to the SQL twin: (epoch(ts) − T0) / 3600
        x = (ts_us.astype(np.float64) / 1e6 - TREND_T0_S) / 3600.0
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "x": pa.array(x, F64),
                "y": batch.column("value").cast(F64),
                "__b": pa.array(uid % nb, I64),
            }
        )

    schema = pa.schema([("user_id", I64), ("slope", pa.string()), ("n_valid", I64)])

    def per_bucket(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        ycol = group.column("y")
        if isinstance(ycol, pa.ChunkedArray):
            ycol = ycol.combine_chunks()
        valid = ~np.asarray(pc.is_null(ycol).to_numpy(zero_copy_only=False))
        y = np.where(valid, ycol.to_numpy(zero_copy_only=False), 0.0)
        order = np.lexsort((x, uid))
        uid, x, y, valid = uid[order], x[order], y[order], valid[order]
        n = len(uid)
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        v = valid.astype(np.float64)
        nv = np.add.reduceat(v, starts)
        sx = np.add.reduceat(np.where(valid, x, 0.0), starts)
        sy = np.add.reduceat(y, starts)
        safe_nv = np.where(nv > 0, nv, 1.0)
        mx, my = sx / safe_nv, sy / safe_nv
        sizes = np.diff(np.append(starts, n))
        dx = np.where(valid, x - np.repeat(mx, sizes), 0.0)
        dy = np.where(valid, y - np.repeat(my, sizes), 0.0)
        sxx = np.add.reduceat(dx * dx, starts)
        sxy = np.add.reduceat(dx * dy, starts)
        # DuckDB (probed): NULL iff <2 valid pairs or zero x-variance
        ok = (nv >= 2) & (sxx > 0)
        slope = np.where(ok, sxy / np.where(ok, sxx, 1.0), 0.0)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], I64),
                "slope": fmt_fixed(pa.array(slope, F64, mask=~ok), 4),
                "n_valid": pa.array(nv.astype(np.int64), I64),
            }
        )

    out = (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )
    return with_schema_seed(out, schema)


# ------------------------------------------------ decayed engagement score
def q_decayed_user_score(sf_dir: str) -> "ray.data.Dataset":
    """Per-user Σ value·exp(−Δt/τ) against the corpus-max timestamp."""
    import pyarrow.parquet as pq

    schema = pa.schema([("user_id", I64), ("score", pa.string()), ("n_valid", I64)])
    if pq.read_metadata(_p(sf_dir, "events")).num_rows == 0:
        return with_schema_seed(ray.data.from_arrow(schema.empty_table()), schema)

    tmax = ray.data.read_parquet(_p(sf_dir, "events"), columns=["ts"]).max("ts")
    tmax_s = float(pa.scalar(tmax, pa.timestamp("us")).cast(I64).as_py()) / 1e6

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_s = batch.column("ts").cast(I64).to_numpy(zero_copy_only=False).astype(np.float64) / 1e6
        vcol = batch.column("value")
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        valid = ~np.asarray(pc.is_null(vcol).to_numpy(zero_copy_only=False))
        val = np.where(valid, vcol.to_numpy(zero_copy_only=False), 0.0)
        # mirror the SQL twin: value * exp(-(epoch(mx) - epoch(ts)) / tau)
        term = np.where(valid, val * np.exp(-(tmax_s - ts_s) / DECAY_TAU_S), 0.0)
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "s": pa.array(term, F64),
                "nv": pa.array(valid.astype(np.int64), I64),
            }
        )
        g = pa.TableGroupBy(t, "user_id").aggregate([("s", "sum"), ("nv", "sum")])
        return g.rename_columns(["user_id", "s", "nv"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("s", alias_name="s"), Sum("nv", alias_name="n_valid"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        nv = batch.column("n_valid").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "score": fmt_fixed(pa.array(s, F64, mask=nv == 0), 4),
                "n_valid": batch.column("n_valid"),
            }
        )

    out = agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return with_schema_seed(out, schema)


# ------------------------------------------- sliding-window distinct users
def q_sliding_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """Distinct active users per 3-hour TRAILING window, one window per
    observed event hour — the windowed COUNT(DISTINCT) no window function
    can express (SQL needs a range self-join; streaming engines need
    retraction state).

    Plan (ONE narrow shuffle): each batch dedups its (user, hour) pairs
    in-block, expands each pair to the ≤3 window-ends it covers (h, h+1,
    h+2) — still in-block — and ships 16 B rows keyed by window. The per-
    window group then counts unique users with one ``np.unique``: the group
    is the dedup AND the count, so cross-block duplicate pairs never need
    their own shuffle. Window-ends are filtered to hours that actually
    contain an event via a broadcast observed-hour set (bounded by the time
    span — hours, not rows). A hot window's group is bounded by
    users-active-in-3h, the same cohort bound the hour-bucketed series ops
    carry."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    nb = np.int64(_PAIR_BUCKETS)
    US_PER_H = np.int64(3_600_000_000)

    def hour_partial(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(I64).to_numpy(zero_copy_only=False)
        h = np.unique(ts_us // US_PER_H)
        return pa.table({"h": pa.array(h, I64)})

    hours_set = np.unique(
        np.concatenate(
            [
                b.column("h").to_numpy(zero_copy_only=False)
                for b in ds.map_batches(
                    hour_partial, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
            or [np.array([], np.int64)]
        )
    )
    hours_ref = ray.put(hours_set)

    def expand(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        h = batch.column("ts").cast(I64).to_numpy(zero_copy_only=False) // US_PER_H
        pairs = np.unique(np.stack([uid, h], axis=1), axis=0)
        u3 = np.repeat(pairs[:, 0], 3)
        w3 = np.repeat(pairs[:, 1], 3) + np.tile(np.array([0, 1, 2], np.int64), len(pairs))
        obs = ray.get(hours_ref)
        keep = np.isin(w3, obs)
        u3, w3 = u3[keep], w3[keep]
        return pa.table(
            {
                "user_id": pa.array(u3, I64),
                "w": pa.array(w3, I64),
                "__b": pa.array(w3 % nb, I64),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        uw = np.unique(np.stack([w, u], axis=1), axis=0)
        wu = uw[:, 0]
        starts = np.flatnonzero(np.concatenate(([True], wu[1:] != wu[:-1])))
        n = np.diff(np.append(starts, len(wu)))
        return pa.table(
            {
                "window_end": pa.array(wu[starts] * US_PER_H, I64).cast(
                    pa.timestamp("us")
                ),
                "n_users": pa.array(n.astype(np.int64), I64),
            }
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )
    return with_schema_seed(
        out, pa.schema([("window_end", pa.timestamp("us")), ("n_users", I64)])
    )


# ------------------------------------------------- hybrid retrieval (RRF)
def q_hybrid_search_rrf(sf_dir: str) -> pa.Table:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack 2009, k=60) of the
    BM25 text ranking and the embedding-cosine ranking — the standard
    lexical+semantic search composition, tying the text and vector stacks
    together end-to-end.

    Both input rankings are the registry's proven kernels: the BM25 side is
    ``ranking.bm25_topk`` (distributed fixed-width stats aggregate +
    per-block top-k prefilter), the vector side is the knn_bruteforce
    normalize-then-dot kernel against the broadcast query vector (vec_id 0)
    with the same per-block top-k prefilter. Only the two ≤k winner lists
    reach the driver (the legitimate bounded-by-k fold), where the fusion
    is 2-term float sums of exactly-rounded integer divisions — BIT-
    identical to the SQL twin's expression, so the float-ordered final cut
    is deterministic across engines (unlike a sum of many terms, two-term
    RRF has no accumulation-order ambiguity)."""
    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.ranking import bm25_topk
    from metareadability_ray.pipelines.vectors import _emb_matrix

    K_EACH, K_OUT, RRF_K = 20, 10, 60

    bt = bm25_topk(sf_dir, k=K_EACH)
    t_rank = {d: i + 1 for i, d in enumerate(bt.column("doc_id").to_pylist())}

    v_rank: dict[int, int] = {}
    qt = pq.read_table(
        _p(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    if qt.num_rows:
        q = _emb_matrix(qt)[0].astype(np.float64)
        q = q / np.linalg.norm(q)
        q_ref = ray.put(q)
        eds = ray.data.read_parquet(
            _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
        )

        def local_topk(batch: pa.Table) -> pa.Table:
            qv = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
            ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            M = _emb_matrix(batch).astype(np.float64)
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            s = M @ qv
            keep = ids != 0
            ids, s = ids[keep], s[keep]
            if len(ids) > K_EACH:
                part = np.argpartition(-s, K_EACH - 1)[:K_EACH]
                ids, s = ids[part], s[part]
            return pa.table({"vec_id": pa.array(ids, I64), "cos": pa.array(s, F64)})

        parts = [
            b
            for b in eds.map_batches(
                local_topk, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        if parts:
            vt = pa.concat_tables(parts)
            vid = vt.column("vec_id").to_numpy(zero_copy_only=False)
            cos = vt.column("cos").to_numpy(zero_copy_only=False)
            order = np.lexsort((vid, -cos))[:K_EACH]
            v_rank = {int(vid[i]): r + 1 for r, i in enumerate(order)}

    all_ids = sorted(set(t_rank) | set(v_rank))
    schema = pa.schema(
        [("doc_id", I64), ("rrf", pa.string()), ("rank_text", I64), ("rank_vec", I64)]
    )
    if not all_ids:
        return schema.empty_table()
    # mirror the SQL: coalesce(1.0/(60+rt), 0.0) + coalesce(1.0/(60+rv), 0.0)
    rt = np.array([t_rank.get(d, 0) for d in all_ids], np.int64)
    rv = np.array([v_rank.get(d, 0) for d in all_ids], np.int64)
    rrf = np.where(rt > 0, 1.0 / (RRF_K + rt), 0.0) + np.where(
        rv > 0, 1.0 / (RRF_K + rv), 0.0
    )
    ids = np.array(all_ids, np.int64)
    order = np.lexsort((ids, -rrf))[:K_OUT]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], I64),
            "rrf": fmt_fixed(pa.array(rrf[order], F64), 6),
            "rank_text": pa.array(rt[order], I64, mask=rt[order] == 0),
            "rank_vec": pa.array(rv[order], I64, mask=rv[order] == 0),
        }
    )


# ----------------------------------------------------------- Pareto skyline
def skyline_mask(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D Pareto frontier (maximize BOTH coordinates).

    A point survives iff no other point is ≥ in both coordinates and > in at
    least one; exact duplicates of a frontier point all survive (neither
    dominates the other). Vectorized: one lexsort by (price desc, date desc),
    per-price-group max dates, and a running max over strictly-greater price
    groups — O(n log n), no pair matrix. The border/Kung-1975 skyline kernel."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-date, -price))
    p, d = price[order], date[order]
    new_grp = np.concatenate(([True], p[1:] != p[:-1]))
    starts = np.flatnonzero(new_grp)
    gidx = np.cumsum(new_grp) - 1
    grp_max = np.maximum.reduceat(d, starts)
    cum = np.maximum.accumulate(grp_max)
    # max date among points with STRICTLY greater price (previous groups);
    # the gidx==0 clause replaces a -inf sentinel so int64 dates (µs
    # timestamps, exact beyond float64's 2^53) never round-trip through float
    m1 = cum[np.maximum(gidx - 1, 0)]
    keep_sorted = ((gidx == 0) | (d > m1)) & (d == grp_max[gidx])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def q_pareto_frontier(sf_dir: str) -> "ray.data.Dataset":
    """Pareto-optimal orders: the skyline maximizing (o_totalprice,
    o_orderdate) — no other order is both at-least-as-expensive and
    at-least-as-recent with one strict (the classic skyline operator;
    Börzsönyi et al. 2001 'The Skyline Operator').

    Distributive containment makes it two cheap stages: skyline(corpus) ⊆
    ∪ skyline(block) — a point dominated globally is dominated by some
    point in its own block OR survives its block and loses in the merge —
    so each block cuts to its local frontier (typically O(log n) points of
    a block) and only those candidates reach the single final merge group.
    No all-to-all: the shuffle carries block frontiers, never the table.
    Output columns are SELECTED raw values (never computed), so the hash
    compares without rounding. NULL price/date rows are excluded on both
    sides (SQL dominance comparisons against NULL are NULL; the twin
    filters them explicitly)."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )

    def local_skyline(batch: pa.Table) -> pa.Table:
        valid = pc.and_(
            pc.is_valid(batch.column("o_totalprice")),
            pc.is_valid(batch.column("o_orderdate")),
        )
        batch = batch.filter(valid)
        if not batch.num_rows:
            return batch
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        date = batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = skyline_mask(price, date)
        return batch.filter(pa.array(keep))

    def merge(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__g"])
        out = local_skyline(group)
        return out

    cand = ds.map_batches(local_skyline, batch_format="pyarrow", zero_copy_batch=True)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__g", pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
        )

    out = (
        cand.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__g")
        .map_groups(merge, batch_format="pyarrow")
    )
    return with_schema_seed(
        out,
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
            ]
        ),
    )


# --------------------------------------------------- Kleinberg burst detection
def _viterbi_bursts(counts: np.ndarray, s: float, gamma: float):
    """Exact 2-state Kleinberg Viterbi over one hourly count series (the
    batch/enumerated variant of Kleinberg 2002's infinite automaton):
    state 0 emits at the series' base rate r0 = mean(counts), state 1 at
    r1 = s·r0; emission cost is the Poisson negative log-likelihood with
    the state-independent ln(c!) term dropped; entering the burst state
    costs gamma·ln(T). Returns the optimal state path as a bool array.

    Pure function of (counts, s, gamma): runs inside ONE map_groups task
    per series, so float order is fixed and results are deterministic on
    any cluster layout. Ties prefer the non-burst state."""
    T = len(counts)
    r0 = float(counts.sum()) / T
    r1 = s * r0
    c = counts.astype(np.float64)
    e0 = -(c * np.log(r0) - r0)
    e1 = -(c * np.log(r1) - r1)
    trans = gamma * np.log(T) if T > 1 else 0.0
    INF = float("inf")
    cost0, cost1 = e0[0], e1[0] + trans
    back = np.zeros((T, 2), dtype=np.int8)
    for t in range(1, T):
        # into state 0: from 0 (free) or 1 (free); tie → stay
        c00, c10 = cost0, cost1
        if c00 <= c10:
            back[t, 0], new0 = 0, c00 + e0[t]
        else:
            back[t, 0], new0 = 1, c10 + e0[t]
        # into state 1: from 1 (free) or 0 (pay trans); tie → stay in 1
        c11, c01 = cost1, cost0 + trans
        if c11 <= c01:
            back[t, 1], new1 = 1, c11 + e1[t]
        else:
            back[t, 1], new1 = 0, c01 + e1[t]
        cost0, cost1 = new0, new1
    state = 0 if cost0 <= cost1 else 1
    path = np.zeros(T, dtype=bool)
    for t in range(T - 1, -1, -1):
        path[t] = bool(state)
        state = back[t, state]
    return path


def q_burst_detect(
    sf_dir: str, s: float = 2.0, gamma: float = 0.5
) -> "ray.data.Dataset":
    """Kleinberg burst detection over per-type hourly event counts — the
    trending-topic / incident detector of a streaming analytics stack
    (Kleinberg, KDD 2002): emits one row per maximal burst interval per
    event_type, with its hour span and event mass.

    Scale shape: hourly counts pre-aggregate per block (one (type, hour,
    n) row per distinct pair per block) and shuffle ONCE keyed by type;
    each type's zero-filled series then runs the exact 2-state Viterbi in
    a single map_groups task — series length is bounded by the time span
    in hours (~9k/year), never by event count, so a 100 TB events table
    still hands each task a few-KB array. NULL type/ts rows drop (SQL
    grouping-key semantics). Rows-only (iterative DP — no SQL twin); the
    local-oracle replay + planted-burst tests pin values.

    Registered (s=2, gamma=0.5): Kleinberg's canonical gamma=1 finds
    nothing on the low-rate synthetic stream (~0.3 events/hour/type —
    the state cost gap never amortizes ln T); gamma=0.5 surfaces the
    handful of real 2-3× rate excursions the generator produces.
    Production tunes both per stream, as the paper prescribes."""
    out_schema = pa.schema(
        [
            ("event_type", STR),
            ("start_ts", pa.timestamp("us")),
            ("end_ts", pa.timestamp("us")),
            ("n_hours", I64),
            ("n_events", I64),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch.column("event_type")), pc.is_valid(batch.column("ts")))
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table(
                {"event_type": pa.array([], STR), "hour": pa.array([], I64),
                 "n": pa.array([], I64)}
            )
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        types = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((hour, types))
        tt, hh = types[order], hour[order]
        newg = np.concatenate(([True], (tt[1:] != tt[:-1]) | (hh[1:] != hh[:-1])))
        starts = np.flatnonzero(newg)
        return pa.table(
            {
                "event_type": pa.array(tt[starts].astype(object), STR),
                "hour": pa.array(hh[starts], I64),
                "n": pa.array(np.diff(np.append(starts, len(tt))).astype(np.int64), I64),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        hh = group.column("hour").to_numpy(zero_copy_only=False).astype(np.int64)
        nn = group.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        # merge cross-block partials for the same hour, zero-fill the span
        order = np.argsort(hh, kind="stable")
        hh, nn = hh[order], nn[order]
        starts = np.flatnonzero(np.concatenate(([True], hh[1:] != hh[:-1])))
        uh = hh[starts]
        un = np.add.reduceat(nn, starts)
        lo, hi = int(uh[0]), int(uh[-1])
        series = np.zeros(hi - lo + 1, dtype=np.int64)
        series[uh - lo] = un
        path = _viterbi_bursts(series, s, gamma)
        if not path.any():
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        d = np.diff(path.astype(np.int8))
        run_starts = np.flatnonzero(np.concatenate(([path[0]], d == 1)))
        run_ends = np.flatnonzero(np.concatenate((d == -1, [path[-1]])))
        rows_s, rows_e, rows_nh, rows_ne = [], [], [], []
        for rs, re_ in zip(run_starts, run_ends):
            rows_s.append((lo + int(rs)) * 3_600_000_000)
            rows_e.append((lo + int(re_)) * 3_600_000_000)
            rows_nh.append(int(re_ - rs + 1))
            rows_ne.append(int(series[rs : re_ + 1].sum()))
        return pa.table(
            {
                "event_type": pa.array([et] * len(rows_s), STR),
                "start_ts": pa.array(rows_s, I64).cast(pa.timestamp("us")),
                "end_ts": pa.array(rows_e, I64).cast(pa.timestamp("us")),
                "n_hours": pa.array(rows_nh, I64),
                "n_events": pa.array(rows_ne, I64),
            }
        )

    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow"),
        out_schema,
    )
