"""Advanced relational / streaming-style operators: as-of join, running
(window) aggregates, left-outer join, flat_map explode, deterministic
sampling, min/max rollups, and an HLL distinct-count sketch.

Partitioning assumptions are documented per operator — the as-of join and
running sum require all rows of one key in one group (hash-shuffle on the
key), exactly like their reference semantics would on a real cluster.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from metareadability_ray.pipelines.textops import bucketed_distinct, bucketed_map_groups
from metareadability_ray.util import distinct_keys_ref, keyset_mask, lookup_ref, lookup_take


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ----------------------------------------------------------------- left outer
def q_left_outer_join(sf_dir: str) -> "ray.data.Dataset":
    """orders LEFT OUTER JOIN rich customers (c_acctbal > 9000): unmatched
    orders keep null c_name. Broadcast idiom — the right side is a filtered
    dim table, so it ships once via ray.put and the big side never shuffles.
    (Dataset.join(left_outer) chokes when a hash partition of the small side
    is empty — schema-less empty blocks; broadcast also happens to be the
    right plan at scale.)"""
    import pyarrow.parquet as pq

    ct = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"])
    ct = ct.filter(pc.greater(ct.column("c_acctbal"), 9000.0))
    name_ref = lookup_ref(ct.column("c_custkey"), ct.column("c_name"))

    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])

    def add_name(batch: pa.Table) -> pa.Table:
        # pc.index_in + take: unmatched keys stay null (LEFT JOIN semantics)
        return batch.append_column("c_name", lookup_take(name_ref, batch.column("o_custkey")))

    return orders.map_batches(add_name, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------ as-of join
def q_asof_join(sf_dir: str) -> "ray.data.Dataset":
    """As-of join (custom operator — Ray Data has none): for every 'click'
    event, the most recent 'view' by the same user at or before the click.

    Partitioning assumption: all events of one user land in one group
    (groupby(user_id) hash shuffle); within a group the match is a vectorized
    numpy searchsorted over the user's time-sorted views. (user_id, ts) pairs
    are unique in the data, so the as-of winner is well-defined."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type", "value"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("event_type"), value_set=pa.array(["click", "view"])))

    def asof_group(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(idx)
        types = np.asarray(g.column("event_type").to_pylist())
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # a matched view's NULL value must stay NULL (not NaN-via-numpy) —
        # track validity alongside the 0-filled values
        vcol = g.column("value")
        vvalid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(vcol, 0.0).to_numpy(zero_copy_only=False)
        eids = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id")[0].as_py()
        is_click = types == "click"
        is_view = types == "view"
        click_ts, click_eid = ts[is_click], eids[is_click]
        view_ts, view_vals, view_valid = ts[is_view], vals[is_view], vvalid[is_view]
        pos = np.searchsorted(view_ts, click_ts, side="right") - 1
        has = pos >= 0
        # LEFT-join semantics when the user has clicks but zero views: every
        # match is null (np.where would eagerly index the empty view arrays).
        out_view_ts = np.zeros(len(click_ts), dtype=np.int64)
        out_view_val = np.zeros(len(click_ts))
        out_val_ok = np.zeros(len(click_ts), dtype=bool)
        if len(view_ts):
            out_view_ts[has] = view_ts[pos[has]]
            out_view_val[has] = view_vals[pos[has]]
            out_val_ok[has] = view_valid[pos[has]]
        return pa.table(
            {
                "event_id": pa.array(click_eid, pa.int64()),
                "user_id": pa.array([uid] * len(click_eid), pa.int64()),
                "view_ts": pa.array(
                    [int(t) if h else None for t, h in zip(out_view_ts, has)], pa.int64()
                ).cast(pa.timestamp("us")),
                "view_value": pa.array(out_view_val, pa.float64(), mask=~out_val_ok),
            }
        )

    from metareadability_ray.util import with_schema_seed

    # schema-stability seed: with zero click rows the groupby path yields an
    # EMPTY dataset with no schema — see util.with_schema_seed
    # (hypothesis-found: tests/test_property_conformance.py, views-only input)
    return with_schema_seed(
        bucketed_map_groups(
            ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True),
            "user_id",
            asof_group,
        ),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("view_ts", pa.timestamp("us")),
                ("view_value", pa.float64()),
            ]
        ),
    )


# ----------------------------------------------------------- running aggregate
def q_window_cumsum(sf_dir: str) -> "ray.data.Dataset":
    """Running per-user sum of `value` ordered by (ts, event_id) — the
    window-function pattern as a grouped vectorized cumsum. Same partitioning
    assumption as the as-of join (all of a user's rows in one group)."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def cumsum_group(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(idx)
        # SQL running sum SKIPS null values and is NULL until the first
        # non-null one — use Arrow validity, never to_numpy's null→NaN
        col = g.column("value")
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        cs = np.cumsum(pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False))
        seen = np.cumsum(valid) > 0
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "cum_value": pa.array(
                    np.char.mod("%.2f", cs).astype(object), pa.string(), mask=~seen
                ),
            }
        )

    return bucketed_map_groups(ds, "user_id", cumsum_group)


# --------------------------------------------------------------- sessionization
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, µs


def q_sessionize(sf_dir: str) -> "ray.data.Dataset":
    """Gap-based sessionization (the classic event-time window op): a new
    session starts at a user's first event or after a >30 min silence;
    session_id is 1-based per user. Partitioning assumption: all of a
    user's events in one group (hash shuffle on user_id); within a group
    the boundary detection is a vectorized diff + cumsum."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def sess(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(idx)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        boundary = np.ones(len(ts), dtype=np.int64)
        boundary[1:] = (np.diff(ts) > _SESSION_GAP_US).astype(np.int64)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "session_id": pa.array(np.cumsum(boundary), pa.int64()),
            }
        )

    return bucketed_map_groups(ds, "user_id", sess)


# -------------------------------------------------------- rolling window avg
def q_rolling_avg_events(sf_dir: str) -> "ray.data.Dataset":
    """Per-user moving average of `value` over the current + 2 preceding
    events (by ts, event_id) — the bounded-frame window-function pattern,
    vectorized via shifted partial sums inside the per-user group."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def roll(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
        g = group.take(idx)
        # SQL avg() over a ROWS frame: null rows occupy frame positions but
        # contribute neither to the sum nor the count; an all-null frame is
        # NULL. Compute frame sum and frame non-null COUNT with the same
        # shifted adds (Arrow validity, not null→NaN).
        col = g.column("value")
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
        n = len(v)
        s, c = v.copy(), valid.copy()
        if n > 1:
            s[1:] = v[:-1] + v[1:]
            c[1:] = valid[:-1] + valid[1:]
        if n > 2:
            s[2:] = v[:-2] + v[1:-1] + v[2:]
            c[2:] = valid[:-2] + valid[1:-1] + valid[2:]
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = s / c
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "avg3": pa.array(
                    np.char.mod("%.2f", np.where(c > 0, avg, 0.0)).astype(object),
                    pa.string(),
                    mask=c == 0,
                ),
            }
        )

    return bucketed_map_groups(ds, "user_id", roll)


# -------------------------------------------------------------------- flat_map
def q_explode_part_names(sf_dir: str) -> "ray.data.Dataset":
    """flat_map/explode: one row per whitespace word of p_name."""
    ds = ray.data.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_name"])

    def explode(batch: pa.Table) -> pa.Table:
        keys, words = [], []
        for k, name in zip(batch.column("p_partkey").to_pylist(), batch.column("p_name").to_pylist()):
            for w in (name or "").split(" "):
                keys.append(k)
                words.append(w)
        return pa.table(
            {"p_partkey": pa.array(keys, pa.int64()), "word": pa.array(words, pa.string())}
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- MR-O3 sample
def q_sample_deterministic(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic ~25% sample: keep rows whose md5(text) starts with
    0x0-0x3. Content-hash sampling is reproducible across engines, block
    orders, and cluster sizes — unlike RNG sampling. Null text never
    samples (SQL: substring(md5(NULL),1,1) <= '3' is NULL → not kept)."""
    import hashlib

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def sample(batch: pa.Table) -> pa.Table:
        mask = [
            t is not None and hashlib.md5(t.encode("utf-8")).hexdigest()[0] <= "3"
            for t in batch.column("text").to_pylist()
        ]
        return batch.filter(pa.array(mask, pa.bool_())).select(["doc_id", "lang"])

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------ min/max agg
def q_supplier_balance_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-nation supplier rollup with Min/Max (raw doubles are selected, not
    computed, so they hash-match without rounding) + Sum (formatted)."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"]
    )
    agg = ds.groupby("s_nationkey").aggregate(
        Count(alias_name="n_suppliers"),
        Min("s_acctbal", alias_name="min_bal"),
        Max("s_acctbal", alias_name="max_bal"),
        Sum("s_acctbal", alias_name="sum_bal"),
    )

    def fmt(batch: pa.Table) -> pa.Table:
        from metareadability_ray.pipelines.relational import fmt_fixed

        i = batch.column_names.index("sum_bal")
        return batch.set_column(i, "sum_bal", fmt_fixed(batch.column("sum_bal"), 2))

    return agg.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------------- OLAP rollup
def q_rollup_orders(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(status, priority): detail rows + per-status subtotals
    + grand total. ONE distributed groupby produces the detail aggregate;
    the coarser levels are derived driver-side from that cardinality-sized
    table (relational3.grouping_levels) — no extra shuffles, no lineage
    re-execution per level."""
    from metareadability_ray.pipelines.relational3 import grouping_levels

    base = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority"]
    )
    detail = pa.concat_tables(
        base.groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    )
    rollup = grouping_levels(
        detail, ["o_orderstatus", "o_orderpriority"], "n", [(True, False), (False, False)]
    )
    return ray.data.from_arrow(rollup)


# ------------------------------------------------------------------ funnel
_FUNNEL = ("view", "click", "purchase")


def q_funnel_stages(sf_dir: str) -> "ray.data.Dataset":
    """Sequential funnel: a user reaches stage k when each event type in
    (view → click → purchase) occurs STRICTLY AFTER the previous stage's
    first occurrence. Output: users per furthest stage (0 = no view).
    Partitioning: all of a user's events in one group; the in-group pass
    is a vectorized min-ts chain."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "event_type"])

    def stage_of(group: pa.Table) -> pa.Table:
        types = np.asarray(group.column("event_type").to_pylist())
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        prev_t = -(1 << 62)
        stage = 0
        for step in _FUNNEL:
            sel = (types == step) & (ts > prev_t)
            if not sel.any():
                break
            prev_t = ts[sel].min()
            stage += 1
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "stage": pa.array([stage], pa.int64()),
            }
        )

    return (
        bucketed_map_groups(ds, "user_id", stage_of)
        .groupby("stage")
        .aggregate(Count(alias_name="n_users"))
    )


# ------------------------------------------------------------------- set ops
def _users_of(sf_dir: str, event_type: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    def f(batch: pa.Table) -> pa.Table:
        return (
            batch.filter(pc.equal(batch.column("event_type"), event_type))
            .select(["user_id"])
        )

    return bucketed_distinct(
        ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True), "user_id"
    )


def _users_of_pred(sf_dir: str, event_type: str, min_value: float) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch.column("event_type"), event_type),
            pc.greater(batch.column("value"), min_value),
        )
        return batch.filter(mask).select(["user_id"])

    return bucketed_distinct(
        ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True), "user_id"
    )


def q_intersect_users(sf_dir: str) -> "ray.data.Dataset":
    """INTERSECT: users with both a 'purchase' and an 'error' event.

    Expressed as tag → union → one groupby(user_id) over the two
    pre-distinct key streams (only (user_id, 2×int8 tag) rows ever
    shuffle): ``Dataset.join`` was the natural spelling, but Ray 2.49's
    hash-shuffle join crashes with ArrowInvalid when one side is
    legitimately EMPTY (its shuffled partitions carry no user_id field,
    seeded schema or not) — and an empty filtered slice is routine at
    scale. The union+groupby form is the same single all-to-all exchange,
    handles the empty side by construction, and needs no driver state
    (hypothesis-found crash)."""
    from metareadability_ray.util import with_schema_seed

    def tag(in_a: int, in_b: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "in_a": pa.array([in_a] * n, pa.int64()),
                    "in_b": pa.array([in_b] * n, pa.int64()),
                }
            )

        return f

    a = _users_of(sf_dir, "purchase").map_batches(
        tag(1, 0), batch_format="pyarrow", zero_copy_batch=True
    )
    b = _users_of(sf_dir, "error").map_batches(
        tag(0, 1), batch_format="pyarrow", zero_copy_batch=True
    )
    both = with_schema_seed(
        a.union(b),
        pa.schema([("user_id", pa.int64()), ("in_a", pa.int64()), ("in_b", pa.int64())]),
    )
    merged = both.groupby("user_id").aggregate(
        Sum("in_a", alias_name="in_a"), Sum("in_b", alias_name="in_b")
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(batch.column("in_a"), 0), pc.greater(batch.column("in_b"), 0)
        )
        return batch.filter(mask).select(["user_id"])

    return with_schema_seed(
        merged.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("user_id", pa.int64())]),
    )


def q_except_users(sf_dir: str) -> "ray.data.Dataset":
    """EXCEPT: users with a big (>300) purchase but no big error.

    Both sides are DISTINCT-ed distributedly (groupby shuffle of the key
    column only); only the distinct big-error-user set — bounded by user
    cardinality, never by the events fact-table size — is broadcast, and the
    anti filter is a vectorized ``pc.is_in`` inversion. The value predicate
    keeps the sets from being universal (every user has every event type in
    this data)."""
    big_err_ref = distinct_keys_ref(_users_of_pred(sf_dir, "error", 300.0), "user_id")
    buyers = _users_of_pred(sf_dir, "purchase", 300.0)

    def anti(batch: pa.Table) -> pa.Table:
        return batch.filter(keyset_mask(big_err_ref, batch.column("user_id"), negate=True))

    from metareadability_ray.util import with_schema_seed

    # empty buyers side → legit 0 rows; the (user_id) contract must survive
    return with_schema_seed(
        buyers.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("user_id", pa.int64())]),
    )


# ----------------------------------------------------------------- HLL sketch
_HLL_P = 12  # 4096 registers → ~1.6% relative error
_HLL_M = 1 << _HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: deterministic 64-bit avalanche hash of
    a uint64 array (public-domain constant set) — hashes a whole block at
    numpy speed instead of one hashlib call per row."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hll_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial HLL registers per event_type (pre-aggregation before
    the shuffle — at scale only 4 KiB of registers per (block, key) moves).
    Fully vectorized: splitmix64 block hash, frexp bit-length, maximum.at
    scatter into the registers."""
    out_types, out_regs = [], []
    types = np.asarray(batch.column("event_type").to_pylist())
    uids = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    h_all = _splitmix64(uids)
    idx_all = (h_all & np.uint64(_HLL_M - 1)).astype(np.int64)
    w_all = h_all >> np.uint64(_HLL_P)  # 52 significant bits → float64-exact
    _, exp = np.frexp(w_all.astype(np.float64))  # exp == bit_length for w>0
    rank_all = np.where(w_all > 0, 52 - exp + 1, 53).astype(np.uint8)
    for t in np.unique(types):
        sel = types == t
        regs = np.zeros(_HLL_M, dtype=np.uint8)
        np.maximum.at(regs, idx_all[sel], rank_all[sel])
        out_types.append(str(t))
        out_regs.append(regs.tolist())
    return pa.table(
        {
            "event_type": pa.array(out_types, pa.string()),
            "regs": pa.array(out_regs, pa.list_(pa.uint8())),
        }
    )


def _hll_merge(group: pa.Table) -> pa.Table:
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    for r in group.column("regs").to_pylist():
        regs = np.maximum(regs, np.asarray(r, dtype=np.uint8))
    # standard HLL estimator with small-range correction
    est = (0.7213 / (1 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _HLL_M and zeros:
        est = _HLL_M * np.log(_HLL_M / zeros)
    return pa.table(
        {
            "event_type": pa.array([group.column("event_type")[0].as_py()], pa.string()),
            "approx_distinct_users": pa.array([int(round(est))], pa.int64()),
        }
    )


def q_hll_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """MR-G4: approximate distinct user_id per event_type via a partial+merge
    HyperLogLog sketch (deterministic blake2 hashing → same estimate on any
    cluster layout). Rows-only check; accuracy asserted in unit tests."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])
    return (
        ds.map_batches(_hll_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(_hll_merge, batch_format="pyarrow")
    )
