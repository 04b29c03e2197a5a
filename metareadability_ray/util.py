"""Shared helpers: actor-pool sizing + broadcast-join building blocks.

The broadcast helpers implement the two scale-safe small-side join idioms:

* :func:`distinct_keys_ref` — the key set of a FACT table is built
  DISTRIBUTEDLY (groupby distinct); only the distinct key set — bounded by
  key cardinality, never by fact-table row count — is materialised and
  shipped once via ``ray.put``. The driver never holds a fact-table column.
* :func:`lookup_ref` — a DIM table's (key, value) columns ship once via
  ``ray.put`` as Arrow arrays; per-batch lookups run through
  ``pc.index_in`` + ``pc.take`` (vectorized, no Python dict loop).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def auto_actor_concurrency(frac: float = 0.5, minimum: int = 1, cap: int | None = None) -> int:
    """Actor-pool size that always leaves CPU headroom for the task-based
    stages (read / shuffle / write) feeding the pool.

    An actor pool sized to every CPU deadlocks a small cluster: actors hold
    their CPU for the lifetime of the operator while upstream read tasks and
    downstream shuffle tasks wait for one. Half the CPUs (min 1) is safe at
    every size and measured fastest on this oversubscribed VM (bench.py).

    Sized from ``ray.cluster_resources()`` (total capacity) — NOT
    ``available_resources()``, whose instantaneous free-CPU count would make
    pool sizes load-dependent (undersized to 1 mid-session on a busy
    cluster).
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:  # pragma: no cover - ray not importable
        cpus = 4
    c = max(minimum, int(cpus * frac))
    return min(c, cap) if cap is not None else c


def _concat_column(batches: list[pa.Table], col: str) -> pa.Array:
    chunks: list[pa.Array] = []
    for b in batches:
        c = b.column(col)
        chunks.extend(c.chunks if isinstance(c, pa.ChunkedArray) else [c])
    if not chunks:
        return pa.array([], pa.null())
    return pa.concat_arrays(chunks)


def distinct_keys_ref(ds: "ray.data.Dataset", col: str):
    """Distributed-distinct of ``ds[col]`` → ``ray.put`` of a ``pa.Array``.

    The distinct runs as a Ray Data groupby (hash shuffle of the KEY column
    only); the driver materialises just the distinct set, which for a
    foreign-key column is bounded by the dim-side cardinality — never by the
    fact table's row count. Use with ``pc.is_in`` inside ``map_batches`` for
    semi/anti joins of a big table against a fact-derived key set.
    """
    import ray
    from ray.data.aggregate import Count

    distinct = ds.groupby(col).aggregate(Count(alias_name="__n"))
    batches = list(distinct.iter_batches(batch_format="pyarrow"))
    return ray.put(_concat_column(batches, col))


def lookup_ref(keys: pa.Array | pa.ChunkedArray, values: pa.Array | pa.ChunkedArray):
    """Ship a small (key, value) lookup once via ``ray.put`` as Arrow arrays."""
    import ray

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    return ray.put((keys, values))


def lookup_take(ref, key_col: pa.ChunkedArray | pa.Array, default=None) -> pa.Array:
    """Vectorized broadcast lookup: ``pc.index_in`` + ``pc.take``.

    Missing keys yield null (like ``dict.get`` → None); pass ``default`` to
    fill them (e.g. ``""``). C-speed hash lookup, no Python per-row loop.
    """
    import ray

    keys, values = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
    idx = pc.index_in(key_col, value_set=keys)
    out = pc.take(values, idx)
    if default is not None:
        out = pc.fill_null(out, default)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def keyset_mask(ref, key_col: pa.ChunkedArray | pa.Array, negate: bool = False) -> pa.Array:
    """Vectorized membership mask against a broadcast key set (``pc.is_in``)."""
    import ray

    keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
    if len(keys) == 0:  # empty/typeless key set → nothing is a member
        mask = pa.array([False] * len(key_col), pa.bool_())
    else:
        mask = pc.is_in(key_col, value_set=keys)
    if negate:
        mask = pc.invert(mask)
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return mask


def with_schema_seed(ds: "ray.data.Dataset", schema: "pa.Schema") -> "ray.data.Dataset":
    """Union one typed 0-row block so the dataset's schema survives the
    no-output case.

    Ray 2.49 skips the map UDF on empty blocks and its sort-groupby carries
    no schema when no group ever runs, so an operator whose legitimate
    result is EMPTY (no contaminated docs, no click events, no near-dup
    pairs) otherwise comes back schema-less — downstream writers and the
    driver's schema compare then see a different contract than the non-empty
    case. One extra 0-row block is free. (Hypothesis-found via the
    generated-data conformance suite.)"""
    import ray.data

    seed = pa.table({f.name: pa.array([], f.type) for f in schema})
    return ds.union(ray.data.from_arrow(seed))


def seeded_after_limit(ds: "ray.data.Dataset", schema: "pa.Schema") -> "ray.data.Dataset":
    """:func:`with_schema_seed` for a dataset whose plan ends in ``Limit``.

    Two Ray 2.49 quirks compose here: (a) ``Sort`` emits schema-less blocks
    when the total row count is 0, so a top-k over a legitimately-empty
    aggregate loses its column contract; (b) the planner asserts
    (``len(physical_children) >= 2``) when a ``Union`` directly follows a
    ``Limit``, so the seed can't be appended as-is. A no-op identity
    ``map_batches`` between the two keeps the plan legal; the seed block
    then restores the schema exactly as in :func:`with_schema_seed`."""

    def _ident(batch: pa.Table) -> pa.Table:
        return batch

    return with_schema_seed(ds.map_batches(_ident, batch_format="pyarrow"), schema)


def null_safe_map_groups(
    ds: "ray.data.Dataset",
    key: str,
    fn,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """``ds.groupby(key).map_groups(fn)`` that tolerates NULL group keys.

    Ray 2.49's sort-based groupby crashes on a null key (its partition-
    boundary searchsorted compares None < str). SQL GROUP BY makes NULL a
    legal group, and the generated-data conformance suite produces such
    rows, so grouped queries on nullable columns route through this: shuffle
    on a 64-bit stable hash of the key (nulls → one fixed bucket), then
    slice each bucket into per-key sub-tables with one Arrow sort (nulls
    ordered last) — ``fn`` sees exactly the per-key tables map_groups would
    pass, including one table whose key column is all-null. Same
    corpus-cardinality discipline as textops.bucketed_map_groups: Ray's
    per-group machinery runs once per BUCKET, not once per key."""
    import numpy as np

    from metareadability_ray.functions.scalars import stable_hash64

    def add_b(batch: pa.Table) -> pa.Table:
        k = batch.column(key)
        vals = k.to_numpy(zero_copy_only=False)
        mask = np.asarray([v is None for v in vals.tolist()], dtype=bool)
        h = stable_hash64(np.where(mask, "", vals.astype(object)).astype(object))
        h = np.where(mask, np.int64(0), h % np.int64(num_buckets))
        return batch.append_column("__b", pa.array(h.astype(np.int64), pa.int64()))

    def per_bucket(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__b"])
        order = pc.sort_indices(group, sort_keys=[(key, "ascending")])
        sorted_t = group.take(order)
        vals = sorted_t.column(key).to_pylist()
        starts = [0] + [i for i in range(1, len(vals)) if vals[i] != vals[i - 1]]
        ends = starts[1:] + [len(vals)]
        outs = [fn(sorted_t.slice(s, e - s)) for s, e in zip(starts, ends)]
        return pa.concat_tables(outs, promote_options="permissive")

    return (
        ds.map_batches(add_b, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


import os as _os

_ANTI_BROADCAST_ROWS = int(_os.environ.get("MR_ANTI_BROADCAST_ROWS", "5000000"))


def scalable_anti_join(
    rows: "ray.data.Dataset",
    key: str,
    remove: "ray.data.Dataset",
    remove_key: str | None = None,
    threshold: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Drop from ``rows`` every row whose ``key`` appears in ``remove`` —
    the anti-filter every survivor/curation pipeline ends with, made
    SIZE-ADAPTIVE (the same local/distributed switch ``connected_components``
    uses):

    * remove-set ≤ ``threshold`` rows (default 5M ≈ 40 MB of int64 ids —
      comfortably one ``ray.put``): collect the ids once, broadcast, and
      stream ``rows`` through a vectorized ``pc.is_in`` anti mask — ZERO
      shuffle of the big side.
    * above the threshold (e.g. a 30% dup rate at 10^12 docs makes the
      loser set itself TB-scale): bucketed reduce-side anti join — both
      sides shuffle once on ``key % num_buckets`` and each bucket drops
      members with one ``pc.is_in``; the driver holds nothing, per-bucket
      memory is bounded by the bucket's slice of BOTH sides.

    Both paths are property-tested equal (``threshold=0`` forces the
    distributed path). CONTRACT: ``key`` castable to int64 (doc/vec ids).
    Row order is preserved within blocks on the broadcast path; the
    distributed path re-partitions by key bucket (callers that need a
    deterministic order sort afterwards, as the writers already do)."""
    return _scalable_membership_join(
        rows, key, remove, remove_key, threshold, num_buckets, negate=True
    )


def scalable_semi_join(
    rows: "ray.data.Dataset",
    key: str,
    keep: "ray.data.Dataset",
    keep_key: str | None = None,
    threshold: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """KEEP only rows whose ``key`` appears in ``keep`` — the semi-join twin
    of :func:`scalable_anti_join`, same size-adaptive broadcast/bucketed
    switch and the same contract."""
    return _scalable_membership_join(
        rows, key, keep, keep_key, threshold, num_buckets, negate=False
    )


def _scalable_membership_join(
    rows: "ray.data.Dataset",
    key: str,
    other: "ray.data.Dataset",
    other_key: str | None,
    threshold: int | None,
    num_buckets: int,
    negate: bool,
) -> "ray.data.Dataset":
    import numpy as np

    import ray
    import ray.data

    remove = other
    rk = other_key or key
    if threshold is None:
        threshold = _ANTI_BROADCAST_ROWS
    remove = remove.materialize()
    if remove.count() <= threshold:
        batches = list(remove.iter_batches(batch_format="pyarrow"))
        ids = _concat_column([b.select([rk]) for b in batches], rk) if batches else pa.array([], pa.null())
        ref = ray.put(ids)

        def member_filter(batch: pa.Table) -> pa.Table:
            return batch.filter(keyset_mask(ref, batch.column(key), negate=negate))

        return rows.map_batches(member_filter, batch_format="pyarrow", zero_copy_batch=True)

    schema = rows.schema().base_schema
    names = list(schema.names)
    I64 = pa.int64()

    def row_side(batch: pa.Table) -> pa.Table:
        kb = batch.column(key).cast(I64).to_numpy(zero_copy_only=False)
        cols = {c: batch.column(c) for c in names}
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        cols["__b"] = pa.array(kb % np.int64(num_buckets), I64)
        return pa.table(cols)

    def remove_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        kcol = batch.column(rk).cast(schema.field(key).type)
        cols = {c: (kcol if c == key else pa.nulls(n, schema.field(c).type)) for c in names}
        cols["__side"] = pa.array(np.ones(n, np.int8), pa.int8())
        kb = batch.column(rk).cast(I64).to_numpy(zero_copy_only=False)
        cols["__b"] = pa.array(kb % np.int64(num_buckets), I64)
        return pa.table(cols)

    unioned = rows.map_batches(row_side, batch_format="pyarrow", zero_copy_batch=True).union(
        remove.map_batches(remove_side, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        data = group.filter(pc.equal(side, 0)).select(names)
        rem = group.filter(pc.equal(side, 1))
        if rem.num_rows == 0 or data.num_rows == 0:
            return data if negate else data.slice(0, 0)
        rkeys = rem.column(key)
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        mask = pc.is_in(data.column(key), value_set=rkeys)
        if negate:
            mask = pc.invert(mask)
        return data.filter(mask)

    out = unioned.groupby("__b").map_groups(per_bucket, batch_format="pyarrow")
    return with_schema_seed(out, schema)


def enc_null_key(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Encode a NULLABLE string group-key column so Ray's sort-based groupby
    (which crashes comparing None < str, Ray 2.49) can shuffle it: value v →
    'V'+v, null → 'N'. Prefixing makes the encoding collision-free for every
    possible string — no sentinel-in-data assumption — and order-preserving
    with nulls FIRST ('N' < 'V'). Invert with :func:`dec_null_key`."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    prefix = pa.array(["V"] * len(col), pa.string())  # typed: empty [] is null-typed otherwise
    enc = pc.binary_join_element_wise(prefix, col.cast(pa.string()), "")
    return pc.fill_null(enc, "N")


def dec_null_key(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Inverse of :func:`enc_null_key`: 'N' → null, 'V'+v → v."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    val = pc.utf8_slice_codeunits(col, 1)
    return pc.if_else(pc.equal(col, "N"), pa.scalar(None, pa.string()), val)
