"""Record linkage and sequence/cohort analytics: fuzzy string join via
deletion-neighborhood blocking (FastSS / SymSpell, Bocek et al. 2007),
normalized-text dedup (the CCNet/Dolma-style "lowercase + strip punctuation"
exact pass), per-user Markov transition matrices, and weekly cohort
retention.

Scale theme (same discipline as textops' LSH family): every operator blocks
or pre-aggregates inside ``map_batches`` so the shuffle carries keys plus
fixed-size partials — candidate PAIRS and distinct (user, week) pairs move,
never the fact rows or the text. Exact verification (Levenshtein) runs only
over blocked candidates and is vectorized across pairs (one numpy DP row
per character, no per-pair Python loop).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from metareadability_ray.pipelines.relational import fmt_fixed
from metareadability_ray.pipelines.textops import _PAIR_BUCKETS, bucketed_map_groups
from metareadability_ray.util import dec_null_key, enc_null_key, with_schema_seed

I64 = pa.int64()


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ------------------------------------------------------------- fuzzy join
def deletion_variants(s: str, k: int) -> set[str]:
    """All strings obtainable from ``s`` by deleting at most ``k`` chars.

    FastSS blocking guarantee (Bocek et al. 2007, "Fast Similarity Search
    in Large Dictionaries"): levenshtein(a, b) <= k implies the deletion
    neighborhoods D_k(a) and D_k(b) intersect — so grouping records by
    neighborhood members is a RECALL-COMPLETE blocking for edit distance k.
    |D_k(s)| <= 1 + len + C(len, 2) + ... — bounded for name-length strings.
    """
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distances for aligned string lists, vectorized
    ACROSS pairs: the DP advances one source-character row at a time and
    each row is a handful of numpy ops over all pairs at once (the
    cur[j-1]+1 left-neighbor scan folds into one ``np.minimum.accumulate``
    via cur[j] = j + running-min(cand[m] - m)). O(maxlen) numpy passes per
    verify batch instead of O(pairs * len^2) Python."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    ml_a, ml_b = int(la.max()), int(lb.max())
    dist = lb.copy()  # answer for la == 0 rows
    if ml_a == 0:
        return dist
    if ml_b == 0:
        return la.copy()
    # fixed-width codepoint matrices (shorter strings pad with \0; padding
    # never affects the result because each pair's answer is read at its
    # own (la, lb) cell)
    A = np.array(a, dtype=f"U{ml_a}").view(np.uint32).reshape(n, ml_a)
    B = np.array(b, dtype=f"U{ml_b}").view(np.uint32).reshape(n, ml_b)
    J = np.arange(ml_b + 1, dtype=np.int64)
    prev = np.broadcast_to(J, (n, ml_b + 1)).copy()
    sel0 = la == 0
    cand = np.empty_like(prev)
    for i in range(1, ml_a + 1):
        cost = (A[:, i - 1 : i] != B).astype(np.int64)
        cand[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=cand[:, 1:])
        c = cand - J
        np.minimum.accumulate(c, axis=1, out=c)
        cur = c + J
        sel = la == i
        if sel.any():
            dist[sel] = cur[sel, lb[sel]]
        prev = cur
    dist[sel0] = lb[sel0]
    return dist


def fuzzy_pairs(
    ds: "ray.data.Dataset",
    key: str,
    name: str,
    k: int = 1,
    out_a: str = "key_a",
    out_b: str = "key_b",
) -> "ray.data.Dataset":
    """All (key_a, key_b, dist) pairs with levenshtein(name_a, name_b) <= k.

    Plan (the LSH-pairs shape): per batch each record emits its deletion-
    neighborhood variants as (md5(variant) as int64, key, name) rows — a
    variant-hash collision only adds a spurious CANDIDATE that the exact
    verify then rejects, so 64-bit hashes are safe and variant STRINGS never
    shuffle. Variants group by hash (folded into _PAIR_BUCKETS super-groups,
    one vectorized run-length pass per bucket), same-variant records pair up
    (names ride with the pair rows, bounded by candidate count), pairs dedup
    with one groupby, and the exact Levenshtein verify runs vectorized over
    candidates only. Per-variant-group expansion is C(m, 2) — the same
    hot-bucket contract as minhash_lsh_pairs; deletion groups are
    name-collision-sized, not corpus-sized.
    """
    nb = np.int64(_PAIR_BUCKETS)

    def to_variants(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_pylist()
        names = batch.column(name).to_pylist()
        vh, vk, vn = [], [], []
        for kk, nm in zip(keys, names):
            if nm is None or kk is None:
                continue  # SQL: levenshtein(NULL, x) is NULL -> filtered
            for v in deletion_variants(nm, k):
                h = int.from_bytes(
                    hashlib.md5(v.encode("utf-8")).digest()[:8], "big", signed=True
                )
                vh.append(h)
                vk.append(kk)
                vn.append(nm)
        return pa.table(
            {
                "vh": pa.array(vh, I64),
                "k": pa.array(vk, I64),
                "nm": pa.array(vn, pa.string()),
                "sb": pa.array(np.asarray(vh, dtype=np.int64) % nb, I64),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key_a": pa.array([], I64),
                "key_b": pa.array([], I64),
                "nm_a": pa.array([], pa.string()),
                "nm_b": pa.array([], pa.string()),
            }
        )
        if group.num_rows == 0:
            return empty
        vh = group.column("vh").to_numpy(zero_copy_only=False)
        ks = group.column("k").to_numpy(zero_copy_only=False)
        order = np.lexsort((ks, vh))
        vh, ks = vh[order], ks[order]
        nms = group.column("nm").take(pa.array(order, I64))
        # unique (variant, key): one record contributes one row per variant
        keep = np.empty(len(vh), dtype=bool)
        keep[0] = True
        keep[1:] = (vh[1:] != vh[:-1]) | (ks[1:] != ks[:-1])
        idx = np.flatnonzero(keep)
        vh, ks = vh[idx], ks[idx]
        nms = nms.take(pa.array(idx, I64))
        new = np.empty(len(vh), dtype=bool)
        new[0] = True
        new[1:] = vh[1:] != vh[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(vh)))
        ai, bi = [], []
        for s, m in zip(starts[lens > 1], lens[lens > 1]):
            iu, ju = np.triu_indices(int(m), k=1)
            ai.append(s + iu)
            bi.append(s + ju)
        if not ai:
            return empty
        ai = np.concatenate(ai)
        bi = np.concatenate(bi)
        # orient key_a < key_b (keys within a variant group sort ascending
        # already, but keep it explicit for dedup stability)
        ka, kb = ks[ai], ks[bi]
        return pa.table(
            {
                "key_a": pa.array(ka, I64),
                "key_b": pa.array(kb, I64),
                "nm_a": nms.take(pa.array(ai, I64)),
                "nm_b": nms.take(pa.array(bi, I64)),
            }
        )

    def dedup_and_verify(group: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(group.select(["key_a", "key_b", "nm_a", "nm_b"]), ["key_a", "key_b"]).aggregate(
            [("nm_a", "min"), ("nm_b", "min")]
        )
        d = levenshtein_batch(
            g.column("nm_a_min").to_pylist(), g.column("nm_b_min").to_pylist()
        )
        t = pa.table(
            {
                out_a: g.column("key_a"),
                out_b: g.column("key_b"),
                "dist": pa.array(d, I64),
            }
        )
        return t.filter(pc.less_equal(t.column("dist"), k))

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        ka = batch.column("key_a").to_numpy(zero_copy_only=False)
        kb = batch.column("key_b").to_numpy(zero_copy_only=False)
        return batch.append_column("pb", pa.array((ka + kb) % nb, I64))

    out = (
        ds.map_batches(to_variants, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sb")
        .map_groups(
            lambda g: bucket_pairs(g.drop_columns(["sb"])), batch_format="pyarrow"
        )
        .map_batches(add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(
            lambda g: dedup_and_verify(g.drop_columns(["pb"])), batch_format="pyarrow"
        )
    )
    # the seed union must be the LAST op: Ray 2.49 drops 0-row blocks
    # through subsequent map stages, so a seed followed by any map loses
    # the schema contract again
    return with_schema_seed(
        out, pa.schema([(out_a, I64), (out_b, I64), ("dist", I64)])
    )


def q_fuzzy_name_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Supplier-name record linkage: all supplier pairs whose names are
    within Levenshtein distance 1, found by deletion-neighborhood blocking
    + exact vectorized verify (never the all-pairs product the SQL twin
    runs)."""
    ds = ray.data.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    return fuzzy_pairs(
        ds, "s_suppkey", "s_name", k=1, out_a="suppkey_a", out_b="suppkey_b"
    )


# ------------------------------------------------------- normalized dedup
_NORM_NULL = "\x00null"


def q_normalized_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Normalization-hash dedup (the curation pass CCNet/Dolma run before
    exact dedup): lowercase, collapse every non-alphanumeric run to one
    space, trim, then dedup on md5 of the normalized form keeping the min
    doc_id. Same shape as q_exact_dedup: normalization is three Arrow
    kernels per batch, only (hash, doc_id) shuffles (md5%64 buckets +
    Arrow C++ hash groupby per bucket), the text never moves. NULL text is
    one SQL-NULL group via the sentinel hash."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def to_hash(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch.column("text"))
        t = pc.replace_substring_regex(t, pattern="[^a-z0-9]+", replacement=" ")
        t = pc.utf8_trim(t, characters=" ")
        digs = [
            _NORM_NULL if s is None else hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in t.to_pylist()
        ]
        buckets = [
            0 if d is _NORM_NULL else int(d[:8], 16) % _PAIR_BUCKETS for d in digs
        ]
        return pa.table(
            {
                "norm_hash": pa.array(digs, pa.string()),
                "doc_id": batch.column("doc_id"),
                "__b": pa.array(buckets, I64),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        # count over norm_hash, NOT doc_id: Arrow's hash "count" skips
        # nulls but the SQL twin's count(*) counts every row — a null-id
        # duplicate must still raise n_forms (the exact_dedup r5
        # null-doc_id find; norm_hash is sentinel-filled, never null)
        t = pa.TableGroupBy(group.select(["norm_hash", "doc_id"]), "norm_hash").aggregate(
            [("doc_id", "min"), ("norm_hash", "count")]
        )
        return pa.table(
            {
                "norm_hash": t.column("norm_hash"),
                "keep_doc_id": t.column("doc_id_min"),
                "n_forms": t.column("norm_hash_count").cast(I64),
            }
        )

    agg = (
        ds.map_batches(to_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

    def restore_null(batch: pa.Table) -> pa.Table:
        col = batch.column("norm_hash")
        fixed = pc.if_else(pc.equal(col, _NORM_NULL), pa.scalar(None, pa.string()), col)
        return batch.set_column(batch.column_names.index("norm_hash"), "norm_hash", fixed)

    return agg.map_batches(restore_null, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------- markov transitions
def q_markov_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Event-type transition matrix: per user, order events by (ts,
    event_id), count consecutive (from_type, to_type) transitions globally,
    and attach the per-from-type transition probability. Partitioning:
    events shuffle ONCE keyed by user (the sessionize contract); in-group
    the transition extraction is two array slices; per-bucket partial counts
    mean the second shuffle carries only (from, to, n) rows — |types|^2
    cardinality, not event count. NULL event_type is a legal state both as
    source and target (null-encoded through the Ray groupby)."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_user(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {"from_type": pa.array([], pa.string()),
                 "to_type": pa.array([], pa.string()),
                 "n": pa.array([], I64)}
            )
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        types = group.column("event_type").take(idx)
        t = pa.table(
            {
                "from_type": enc_null_key(types.slice(0, len(types) - 1)),
                "to_type": enc_null_key(types.slice(1)),
            }
        )
        g = pa.TableGroupBy(t, ["from_type", "to_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "from_type": g.column("from_type"),
                "to_type": g.column("to_type"),
                "n": g.column("count_all").cast(I64),
            }
        )

    counts = bucketed_map_groups(ds, "user_id", per_user).groupby(
        ["from_type", "to_type"]
    ).aggregate(Sum("n", alias_name="n"))

    def add_p(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        p = n / n.sum()
        return pa.table(
            {
                "from_type": dec_null_key(group.column("from_type").combine_chunks()),
                "to_type": dec_null_key(group.column("to_type").combine_chunks()),
                "n": group.column("n").cast(I64),
                "p": fmt_fixed(pa.array(p, pa.float64()), 4),
            }
        )

    out = counts.groupby("from_type").map_groups(add_p, batch_format="pyarrow")
    return with_schema_seed(
        out,
        pa.schema(
            [("from_type", pa.string()), ("to_type", pa.string()), ("n", I64),
             ("p", pa.string())]
        ),
    )


# ----------------------------------------------------- interval overlap join
def q_interval_overlap_users(sf_dir: str) -> "ray.data.Dataset":
    """Interval-overlap SELF-join: per (user, day) activity spans
    [min ts, max ts], all same-day user pairs whose spans overlap
    (co-presence detection). Plan: per-batch (user, day, lo, hi) partials
    combine in-block, one day-bucketed shuffle finalizes the spans, and the
    in-day pair expansion is a SWEEP, not a cohort triu: spans sort by lo,
    and because lo_j >= lo_i within the sorted run, i overlaps exactly the
    j in (i, searchsorted(lo, hi_i)) — the expansion allocates
    OUTPUT-bounded arrays (np.repeat + concatenated aranges), never the
    cohort-squared key set (the round-3 similar_users_sketch lesson).
    Day buckets shard the shuffle; a single hot day degrades to one larger
    sweep, still output-bounded."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    nb = np.int64(_PAIR_BUCKETS)

    def partials(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": day.cast(I64),
                "ts": batch.column("ts").cast(I64),
            }
        )
        g = pa.TableGroupBy(t, ["user_id", "day"]).aggregate(
            [("ts", "min"), ("ts", "max")]
        )
        dv = g.column("day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "day": g.column("day"),
                "lo": g.column("ts_min"),
                "hi": g.column("ts_max"),
                "__b": pa.array(dv % nb, I64),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(group.select(["user_id", "day", "lo", "hi"]), ["user_id", "day"]).aggregate(
            [("lo", "min"), ("hi", "max")]
        )
        day = g.column("day").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        lo = g.column("lo_min").to_numpy(zero_copy_only=False)
        hi = g.column("hi_max").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, lo, day))
        day, uid, lo, hi = day[order], uid[order], lo[order], hi[order]
        n = len(day)
        empty = pa.table(
            {"day": pa.array([], I64), "user_a": pa.array([], I64),
             "user_b": pa.array([], I64)}
        )
        if n < 2:
            return empty
        starts = np.flatnonzero(np.concatenate(([True], day[1:] != day[:-1])))
        ends = np.append(starts[1:], n)
        ai_all, bi_all = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            l, h = lo[s:e], hi[s:e]
            # j in (i, upper_i): lo_j <= hi_i; overlap then follows from
            # hi_j >= lo_j >= lo_i
            upper = np.searchsorted(l, h, side="right")
            cnt = np.maximum(upper - np.arange(1, e - s + 1), 0)
            tot = int(cnt.sum())
            if tot == 0:
                continue
            ai = np.repeat(np.arange(e - s), cnt)
            # concatenated aranges: offsets within each i's (i, i+cnt_i] run
            run_off = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            bi = ai + 1 + run_off
            ai_all.append(s + ai)
            bi_all.append(s + bi)
        if not ai_all:
            return empty
        ai = np.concatenate(ai_all)
        bi = np.concatenate(bi_all)
        ua, ub = uid[ai], uid[bi]
        return pa.table(
            {
                "day": pa.array(day[ai], I64),
                "user_a": pa.array(np.minimum(ua, ub), I64),
                "user_b": pa.array(np.maximum(ua, ub), I64),
            }
        )

    out = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch.column("day").cast(pa.timestamp("us")),
                "user_a": batch.column("user_a"),
                "user_b": batch.column("user_b"),
            }
        )

    out = out.map_batches(to_ts, batch_format="pyarrow", zero_copy_batch=True)
    return with_schema_seed(
        out,
        pa.schema([("day", pa.timestamp("us")), ("user_a", I64), ("user_b", I64)]),
    )


# ---------------------------------------------------------- cohort retention
def q_cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Weekly cohort retention: users cohorted by the Monday-truncated week
    of their first event; for every (cohort_week, activity_week) the number
    of distinct active users. Plan: per-batch combiner dedups (user, week)
    pairs, one user-keyed bucket shuffle makes the pair-distinct exact AND
    computes each user's cohort (min week) in the same vectorized pass, and
    the second shuffle carries only (cohort, week, partial_count) rows —
    cohort-matrix cardinality, not event count. Weeks ride as int64 epoch
    micros through the shuffles and restore to timestamps at the end."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    nb = np.int64(_PAIR_BUCKETS)

    def to_pairs(batch: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(batch.column("ts"), unit="week", week_starts_monday=True)
        t = pa.table(
            {"user_id": batch.column("user_id"), "week": wk.cast(I64)}
        )
        g = pa.TableGroupBy(t, ["user_id", "week"]).aggregate([])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column("__b", pa.array(uid % nb, I64))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(group.select(["user_id", "week"]), ["user_id", "week"]).aggregate([])
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        wk = t.column("week").to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, uid))
        uid, wk = uid[order], wk[order]
        new = np.empty(len(uid), dtype=bool)
        if len(uid):
            new[0] = True
            new[1:] = uid[1:] != uid[:-1]
        # per-user cohort = first (min) week after the lexsort
        cohort = wk[np.maximum.accumulate(np.where(new, np.arange(len(uid)), 0))]
        part = pa.TableGroupBy(
            pa.table({"cohort_week": pa.array(cohort, I64), "week": pa.array(wk, I64)}),
            ["cohort_week", "week"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "cohort_week": part.column("cohort_week"),
                "week": part.column("week"),
                "n_part": part.column("count_all").cast(I64),
            }
        )

    agg = (
        ds.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
        .groupby(["cohort_week", "week"])
        .aggregate(Sum("n_part", alias_name="n_users"))
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch.column("cohort_week").cast(pa.timestamp("us")),
                "week": batch.column("week").cast(pa.timestamp("us")),
                "n_users": batch.column("n_users").cast(I64),
            }
        )

    return agg.map_batches(to_ts, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------- path trigrams
def q_path_trigrams(sf_dir: str) -> pa.Table:
    """Top-10 most common event-type TRIGRAMS across per-user event
    sequences (sequential path mining — "which 3-step behaviours dominate").

    Same partitioning contract as :func:`q_markov_transitions`: events
    shuffle ONCE keyed by user; in-group the trigram extraction is three
    array slices of the (ts, event_id)-sorted type column and a per-user
    groupby, so the second shuffle carries only (t1, t2, t3, n) partial
    rows — |types|³ cardinality, not event count. NULL event_type is a
    legal element in any position (null-encoded through both shuffles, and
    the final tie-break sorts on the ENCODED keys: enc_null_key orders
    nulls first, so the SQL twin says NULLS FIRST). Top-k selection is a
    10-row global sort over the |types|³ aggregate — nothing corpus-sized
    reaches the driver."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_user(group: pa.Table) -> pa.Table:
        if group.num_rows < 3:
            return pa.table(
                {"t1": pa.array([], pa.string()), "t2": pa.array([], pa.string()),
                 "t3": pa.array([], pa.string()), "n": pa.array([], I64)}
            )
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        types = group.column("event_type").take(idx)
        t = pa.table(
            {
                "t1": enc_null_key(types.slice(0, len(types) - 2)),
                "t2": enc_null_key(types.slice(1, len(types) - 2)),
                "t3": enc_null_key(types.slice(2)),
            }
        )
        g = pa.TableGroupBy(t, ["t1", "t2", "t3"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "t1": g.column("t1"), "t2": g.column("t2"), "t3": g.column("t3"),
                "n": g.column("count_all").cast(I64),
            }
        )

    counts = (
        bucketed_map_groups(ds, "user_id", per_user)
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
    )
    top = counts.sort(["n", "t1", "t2", "t3"], descending=[True, False, False, False]).limit(10)
    tabs = list(top.iter_batches(batch_format="pyarrow"))
    if not tabs:
        return pa.table(
            {"t1": pa.array([], pa.string()), "t2": pa.array([], pa.string()),
             "t3": pa.array([], pa.string()), "n": pa.array([], I64)}
        )
    t = pa.concat_tables(tabs, promote_options="permissive")
    return pa.table(
        {
            "t1": dec_null_key(t.column("t1")),
            "t2": dec_null_key(t.column("t2")),
            "t3": dec_null_key(t.column("t3")),
            "n": t.column("n").cast(I64),
        }
    )
