"""Seeded-random property tests for the custom distributed operators:
``reduce_side_attach`` vs a pandas merge, and ``connected_components`` vs a
plain union-find — 20 random instances each (hypothesis-style loops, no
hypothesis dependency per SURVEY §5.3)."""

import random

import pandas as pd
import pyarrow as pa


def _to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tabs, promote_options="permissive") if tabs else pa.table({})


def test_reduce_side_attach_matches_pandas_merge(ray_session):
    import ray.data

    from metareadability_ray.pipelines.textops import reduce_side_attach

    rng = random.Random(99)
    i64 = pa.int64()
    for trial in range(20):
        n_rows = rng.randrange(0, 60)
        keys = [rng.randrange(0, 12) for _ in range(n_rows)]
        payload = [rng.randrange(1000) for _ in range(n_rows)]
        # attach side: unique keys, possibly missing some row keys (inner drop)
        attach_keys = sorted(set(rng.sample(range(12), rng.randrange(1, 12))))
        attach_vals = [k * 100 + 7 for k in attach_keys]

        rows = pa.table({"k": pa.array(keys, i64), "v": pa.array(payload, i64)})
        attach = pa.table(
            {"doc_id": pa.array(attach_keys, i64), "val": pa.array(attach_vals, i64)}
        )
        got_ds = reduce_side_attach(
            ray.data.from_arrow(rows), "k", [("k", i64), ("v", i64)],
            ray.data.from_arrow(attach), "doc_id", "val", "out", i64,
        )
        got = _to_table(got_ds).to_pandas()
        want = (
            rows.to_pandas()
            .merge(attach.to_pandas(), left_on="k", right_on="doc_id", how="inner")
            .rename(columns={"val": "out"})[["k", "v", "out"]]
        )
        key = lambda df: sorted(map(tuple, df[["k", "v", "out"]].itertuples(index=False)))
        assert (key(got) if len(got) else []) == (key(want) if len(want) else []), f"trial {trial}"


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


def test_connected_components_matches_union_find(ray_session):
    """Both paths: trials 0-1 force the DISTRIBUTED min-label rounds
    (local_threshold=0); later trials take the local union-find fast path."""
    import ray.data

    from metareadability_ray.pipelines.clustering import connected_components

    rng = random.Random(7)
    for trial in range(4):
        n_edges = rng.randrange(1, 25)
        edges = [
            (rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                    "doc_b": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        )
        threshold = 0 if trial < 2 else 1_000_000
        t = _to_table(connected_components(pairs, local_threshold=threshold))
        got = dict(zip(t.column("doc_id").to_pylist(), t.column("cluster_id").to_pylist()))
        want = _uf_components(edges)
        assert got == want, f"trial {trial}: {sorted(got.items())} != {sorted(want.items())}"
