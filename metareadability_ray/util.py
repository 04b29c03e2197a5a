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
