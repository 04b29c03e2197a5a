"""Relational QA surface over the driver testdata (SURVEY.md §2.4–2.8).

Each ``q_*`` function takes ``sf_dir`` and returns a lazy ``ray.data.Dataset``
(or a small ``pyarrow.Table``); its DuckDB-equivalent SQL lives in
``metareadability_ray.qa.REGISTRY``. Column names are pinned to match the SQL
aliases exactly (the driver's compare hashes values after sorting columns by
name).

Scale discipline (these run at sf0.01 for the gate but are written for 100 TB):
  * every read prunes columns at the scan (``read_parquet(columns=[...])``);
  * groupbys aggregate with Ray's partial+final ``AggregateFn``s (no
    driver-side loops);
  * small-side joins are BROADCAST: the small table is read once on the
    driver, shipped via ``ray.put`` once, and looked up inside ``map_batches``
    — no shuffle of the big side;
  * big-big joins use ``Dataset.join`` (hash shuffle on the key);
  * floats that cross the oracle boundary are rounded (2–4 dp) identically on
    both sides so double-accumulation order can't flip the hash.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from metareadability_ray.pipelines.textops import _PAIR_BUCKETS
from metareadability_ray.util import distinct_keys_ref, keyset_mask, lookup_ref, lookup_take

def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def fmt_fixed(col: pa.ChunkedArray | pa.Array, nd: int) -> pa.Array:
    """Float column → fixed-decimal strings, vectorized via ``np.char.mod``
    (C printf ``%.Nf``, identical rounding to Python's f-string and DuckDB's
    ``printf``); nulls propagate.

    Negative zero is rendered UNSIGNED: a value that cancels to ~0 can come
    out ±1e-17 depending on each engine's summation path (e.g. Ray's
    normalize-then-dot cosine vs DuckDB's dot-then-divide — hypothesis-found
    '-0.0000' vs '0.0000' in knn_bruteforce), so both sides pin the rule
    "anything that prints as -0.00… prints as 0.00…" (the SQL twins wrap
    printf in an anchored regexp_replace)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
    strs = np.char.mod(f"%.{nd}f", vals)
    neg_zero = f"-0.{'0' * nd}" if nd else "-0"
    strs = np.where(strs == neg_zero, neg_zero[1:], strs)
    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    return pa.array(strs, pa.string(), mask=nulls)


def _fmt_cols(ds: "ray.data.Dataset", spec: dict[str, int]) -> "ray.data.Dataset":
    """Render double columns as fixed-decimal STRINGS (`printf('%.Nf')` on the
    SQL side): double sums accumulate in engine-specific order, so two
    correctly-rounded doubles can differ by one ulp — a decimal string at
    ≤4 dp is identical on both sides for anything not astronomically close
    to a rounding boundary."""

    def do(batch: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            i = batch.column_names.index(col)
            batch = batch.set_column(i, col, fmt_fixed(batch.column(col), nd))
        return batch

    return ds.map_batches(do, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- MR-F1/MR-P1
def q_filter_project(sf_dir: str) -> "ray.data.Dataset":
    """Arrow-native filter + projection, pruned at the read."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_quantity", "l_discount"],
    )

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(batch.column("l_quantity"), 45.0),
            pc.less(batch.column("l_discount"), 0.05),
        )
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------- MR-G1/G2
def q_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style grouped aggregate (partial+final combine under the hood)."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="count_order"),
    )
    return _fmt_cols(agg, {"sum_qty": 2, "sum_base_price": 2, "avg_disc": 4})


# ---------------------------------------------------------------------- MR-J3
def q_join_customer_orders(sf_dir: str) -> "ray.data.Dataset":
    """Hash equi-join (Dataset.join) + grouped rollup: revenue by segment."""
    cust = ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="revenue"),
    )
    from metareadability_ray.util import with_schema_seed

    # an inner join with zero matches is a legal empty result — keep schema
    return with_schema_seed(
        _fmt_cols(agg, {"revenue": 2}),
        pa.schema(
            [("c_mktsegment", pa.string()), ("n_orders", pa.int64()), ("revenue", pa.string())]
        ),
    )


def q_three_way_join(sf_dir: str) -> "ray.data.Dataset":
    """customer ⋈ nation (broadcast) ⋈ orders (hash) → revenue per nation."""
    import pyarrow.parquet as pq

    n_tbl = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    n_ref = lookup_ref(n_tbl.column("n_nationkey"), n_tbl.column("n_name"))

    cust = ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])

    def add_nation(batch: pa.Table) -> pa.Table:
        # INNER semantics: a customer whose nation is missing from the dim
        # is dropped like the SQL join (a default value would fabricate a
        # phantom nation group — same class the conformance suite falsified
        # in the broadcast part join)
        names = lookup_take(n_ref, batch.column("c_nationkey"))
        b = batch.append_column("n_name", names)
        return b.filter(pc.is_valid(b.column("n_name")))

    cust = cust.map_batches(add_nation, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )
    agg = joined.groupby("n_name").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="revenue"),
    )
    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        _fmt_cols(agg, {"revenue": 2}),
        pa.schema([("n_name", pa.string()), ("n_orders", pa.int64()), ("revenue", pa.string())]),
    )


# ---------------------------------------------------------------------- MR-J2
def q_broadcast_join_part(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast-hash-join idiom: small `part` side via ray.put, no shuffle of
    lineitem; then grouped rollup by brand."""
    import pyarrow.parquet as pq

    small = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    brand_ref = lookup_ref(small.column("p_partkey"), small.column("p_brand"))

    li = ray.data.read_parquet(_p(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"])

    def add_brand(batch: pa.Table) -> pa.Table:
        # INNER semantics: a lineitem whose part is missing from the dim is
        # dropped, exactly like the SQL join (the earlier version let null
        # brands form a phantom group — a data-dependent assumption the
        # generated-data conformance suite falsified)
        b = batch.append_column("p_brand", lookup_take(brand_ref, batch.column("l_partkey")))
        return b.filter(pc.is_valid(b.column("p_brand")))

    with_brand = li.map_batches(add_brand, batch_format="pyarrow", zero_copy_batch=True)
    agg = with_brand.groupby("p_brand").aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Count(alias_name="n_items"),
    )
    from metareadability_ray.util import with_schema_seed

    # schema seed: every lineitem referencing a missing part is legal input
    # (inner join drops all rows) and must still yield the typed empty result
    return with_schema_seed(
        _fmt_cols(agg, {"sum_qty": 2}),
        pa.schema([("p_brand", pa.string()), ("sum_qty", pa.string()), ("n_items", pa.int64())]),
    )


def q_semi_join_customers(sf_dir: str) -> "ray.data.Dataset":
    """Semi-join: customers that have ≥1 order.

    The order keys are DISTINCT-ed distributedly (groupby shuffle of the key
    column only); the driver holds just the distinct set — bounded by
    customer cardinality, never by the orders fact-table size. Membership is
    ``pc.is_in`` (vectorized)."""
    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey"])
    keys_ref = distinct_keys_ref(orders, "o_custkey")
    cust = ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(keyset_mask(keys_ref, batch.column("c_custkey")))

    return cust.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)


def q_anti_join_customers(sf_dir: str) -> "ray.data.Dataset":
    """Anti-join: customers with NO 'F'-status order. Same distributed-distinct
    + broadcast plan as the semi join, with the membership mask inverted."""
    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus"])

    def only_f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("o_orderstatus"), "F")).select(["o_custkey"])

    f_orders = orders.map_batches(only_f, batch_format="pyarrow", zero_copy_batch=True)
    keys_ref = distinct_keys_ref(f_orders, "o_custkey")
    cust = ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    def anti(batch: pa.Table) -> pa.Table:
        return batch.filter(keyset_mask(keys_ref, batch.column("c_custkey"), negate=True))

    return cust.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------- MR-G3
def q_distinct_event_types(sf_dir: str) -> "ray.data.Dataset":
    """SELECT DISTINCT via groupby (distributed, no driver materialize).
    NULL is a distinct value — the key rides null-encoded through the
    shuffle (Ray's sort groupby can't order None vs str)."""
    from metareadability_ray.util import dec_null_key, enc_null_key

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type"])

    def enc(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": enc_null_key(batch.column("event_type"))})

    def dec(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": dec_null_key(batch.column("event_type"))})

    return (
        ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
        .map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------- MR-O2
def q_topk_orders(sf_dir: str) -> "ray.data.Dataset":
    """Top-k by distributed sort + limit (tie-broken on key for determinism)."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_orderpriority"]
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


# --------------------------------------------------------- MR-D1 (relational)
def q_latest_event_per_user(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup, latest-wins: one row per user_id (max ts, tie → max id).

    Users are corpus-cardinality, so the shuffle key is user_id%64 (not the
    user) and each bucket picks winners in one vectorized lexsort pass; a
    per-batch combiner pre-picks local winners first so the shuffle carries
    at most one row per (block, user)."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_id", "ts", "event_type"]
    )

    def pick_latest(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False).view(np.int64)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((-eid, -ts, uid))  # per user: max ts, tie → max id
        su = uid[order]
        first = np.empty(len(su), dtype=bool)
        if len(su):
            first[0] = True
            first[1:] = su[1:] != su[:-1]
        return batch.take(pa.array(order[first], pa.int64()))

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = pick_latest(batch)  # local combiner
        b = batch.column("user_id").to_numpy(zero_copy_only=False) % np.int64(_PAIR_BUCKETS)
        return batch.append_column("__b", pa.array(b, pa.int64()))

    def bucket_latest(group: pa.Table) -> pa.Table:
        return pick_latest(group).select(["user_id", "event_id", "event_type"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_latest, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------- MR-D2
def q_union_priority(sf_dir: str) -> "ray.data.Dataset":
    """Union of two filtered slices, then grouped count."""
    base = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_orderpriority", "o_orderstatus"])

    def mk(status: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("o_orderstatus"), status))

        return f

    a = base.map_batches(mk("F"), batch_format="pyarrow", zero_copy_batch=True)
    b = base.map_batches(mk("O"), batch_format="pyarrow", zero_copy_batch=True)
    from metareadability_ray.util import with_schema_seed

    # when BOTH slices filter to nothing the grouped result is a legitimate
    # 0 rows, but Ray's aggregate drops the schema (intermittently, by block
    # order — hypothesis-found in a full-suite run); seed the contract
    return with_schema_seed(
        a.union(b).groupby(["o_orderstatus", "o_orderpriority"]).aggregate(
            Count(alias_name="n")
        ),
        pa.schema(
            [
                ("o_orderstatus", pa.string()),
                ("o_orderpriority", pa.string()),
                ("n", pa.int64()),
            ]
        ),
    )


# ------------------------------------------------------------- json / window
def q_json_props_sum(sf_dir: str) -> "ray.data.Dataset":
    """JSON field extraction (vectorized regex, no Python json loop) + rollup."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "props"])

    from metareadability_ray.util import dec_null_key, enc_null_key

    def extract_k(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        # NULL is a legal GROUP BY key; Ray's sort groupby is not null-safe,
        # so the key rides encoded ('V'+v / 'N') and is decoded after
        return pa.table({"event_type": enc_null_key(batch.column("event_type")), "k": k})

    agg = (
        ds.map_batches(extract_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )

    def dec(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("event_type")
        return batch.set_column(i, "event_type", dec_null_key(batch.column("event_type")))

    return agg.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


def q_hourly_event_window(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling event-time window: truncate ts to the hour, then rollup —
    the windowed-aggregate pattern (window key = groupby key)."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    from metareadability_ray.util import dec_null_key, enc_null_key

    def add_hour(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        return pa.table(
            {
                "hour": hour,
                # null-safe group key (Ray sort groupby crashes on None<str)
                "event_type": enc_null_key(batch.column("event_type")),
                "value": batch.column("value"),
            }
        )

    agg = (
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    def dec(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("event_type")
        return batch.set_column(i, "event_type", dec_null_key(batch.column("event_type")))

    return _fmt_cols(agg.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True), {"sum_value": 2})
