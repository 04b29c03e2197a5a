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


def test_misra_gries_prune_properties():
    """MG prune invariants on random count vectors: never overcounts, keeps
    ≤ cap counters, and per-prune undercount ≤ n/(cap+1)."""
    import numpy as np

    from metareadability_ray.pipelines.textops2 import _mg_prune

    rng = random.Random(17)
    for trial in range(30):
        n_tokens = rng.randrange(1, 400)
        cap = rng.randrange(1, 64)
        tokens = np.array([f"t{i}" for i in range(n_tokens)])
        counts = np.array([rng.randrange(1, 500) for _ in range(n_tokens)], dtype=np.int64)
        kt, kc = _mg_prune(tokens, counts, cap)
        assert len(kt) <= cap, trial
        true = dict(zip(tokens.tolist(), counts.tolist()))
        n_total = int(counts.sum())
        for t, c in zip(kt.tolist(), kc.tolist()):
            assert c <= true[t], trial
            assert true[t] - c <= n_total / (cap + 1), trial


def test_quantile_sketch_batching_invariance_and_error_bound():
    """Fixed-width-histogram sketch: (a) the merged result is IDENTICAL for
    every batch split of the same rows (the property that licenses its exact
    SQL oracle), (b) each reported quantile is within one bucket width below
    the true quantile (lower-edge pick of the crossing bucket)."""
    import numpy as np
    import pyarrow as pa

    from metareadability_ray.pipelines.relational3 import (
        _QSK_BUCKET,
        _quantile_merge,
        _quantile_partial,
    )

    def run(vals, n_batches):
        parts = []
        for i in range(n_batches):
            chunk = vals[i::n_batches]
            if not chunk:
                continue
            parts.append(
                _quantile_partial(
                    pa.table(
                        {
                            "event_type": pa.array(["x"] * len(chunk)),
                            "value": pa.array(chunk, pa.float64()),
                        }
                    )
                )
            )
        return _quantile_merge(pa.concat_tables(parts)).to_pydict()

    rng = random.Random(5)
    for trial in range(10):
        n = rng.randrange(50, 3000)
        vals = [rng.uniform(-100, 1000) for _ in range(n)]
        results = [run(vals, nb) for nb in (1, 2, 5)]
        assert results[0] == results[1] == results[2], trial  # batching-invariant
        svals = sorted(vals)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            got = float(results[0][col][0])
            # true quantile at the sketch's rank convention: first order
            # statistic whose rank*100 >= q100*n
            import math

            rank = math.ceil(q * n) - 1
            true = svals[max(0, rank)]
            assert got <= true < got + 2 * _QSK_BUCKET, (trial, q, got, true)


def test_bloom_filter_no_false_negatives():
    """Bloom bitmap built from partials never misses an inserted key, and the
    false-positive rate on disjoint probes stays under 1% at this load."""
    import numpy as np

    from metareadability_ray.pipelines.relational3 import _BLOOM_BITS, _bloom_hashes

    rng = random.Random(23)
    keys = np.array(rng.sample(range(10**9), 5000), dtype=np.int64)
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for part in np.array_split(keys, 7):  # partial build + OR-merge
        pb = np.zeros_like(bits)
        i1, i2 = _bloom_hashes(part)
        for idx in (i1, i2):
            np.bitwise_or.at(pb, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        bits |= pb

    def hit(arr):
        i1, i2 = _bloom_hashes(arr)
        return (((bits[i1 >> 3] >> (i1 & 7)) & 1) & ((bits[i2 >> 3] >> (i2 & 7)) & 1)).astype(bool)

    assert hit(keys).all()
    probes = np.array([k for k in rng.sample(range(10**9, 2 * 10**9), 20000)], dtype=np.int64)
    assert hit(probes).mean() < 0.01


def test_grouping_levels_sums_consistent():
    """ROLLUP/CUBE level derivation: every level's measure total equals the
    detail total, and the all-null grand row equals the sum, on random
    detail tables."""
    import pyarrow as pa

    from metareadability_ray.pipelines.relational3 import grouping_levels

    rng = random.Random(41)
    for trial in range(20):
        rows = rng.randrange(1, 40)
        a = [rng.choice("xyz") for _ in range(rows)]
        b = [rng.choice("pq") for _ in range(rows)]
        n = [rng.randrange(1, 100) for _ in range(rows)]
        detail = (
            pa.table({"a": pa.array(a), "b": pa.array(b), "n": pa.array(n, pa.int64())})
            .group_by(["a", "b"])
            .aggregate([("n", "sum")])
            .rename_columns(["a", "b", "n"])
        )
        total = sum(n)
        out = grouping_levels(detail, ["a", "b"], "n", [(True, False), (False, True), (False, False)])
        df = out.to_pandas()
        # detail level
        lvl = df[df.a.notna() & df.b.notna()]
        assert int(lvl.n.sum()) == total, trial
        # each coarser level sums to the same total
        assert int(df[df.a.notna() & df.b.isna()].n.sum()) == total, trial
        assert int(df[df.a.isna() & df.b.notna()].n.sum()) == total, trial
        grand = df[df.a.isna() & df.b.isna()]
        assert len(grand) == 1 and int(grand.n.iloc[0]) == total, trial


def test_skyline_mask_matches_bruteforce():
    """skyline_mask == the O(n²) dominance definition, including duplicate
    points (all duplicates of a frontier point survive) and single-axis ties."""
    import numpy as np

    from metareadability_ray.pipelines.analytics import skyline_mask

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=0, max_size=24
        )
    )
    def inner(pts):
        p = np.asarray([a for a, _ in pts], dtype=np.float64)
        d = np.asarray([b for _, b in pts], dtype=np.int64)
        got = skyline_mask(p, d)
        n = len(pts)
        want = np.asarray(
            [
                not any(
                    p[j] >= p[i] and d[j] >= d[i] and (p[j] > p[i] or d[j] > d[i])
                    for j in range(n)
                )
                for i in range(n)
            ],
            dtype=bool,
        )
        assert (got == want).all()

    inner()
