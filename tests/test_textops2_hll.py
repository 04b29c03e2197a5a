"""distinct_ngram_hll: agreement vs the exact op + determinism.

The sketch twin must (a) produce per-source estimates within HLL's p=12
error envelope of the exact distinct counts, (b) carry the IDENTICAL exact
n_grams totals (those are counted, not sketched), and (c) be deterministic
across runs/layouts (unsalted hashing — the whole point of the register
design)."""

from __future__ import annotations

import pyarrow as pa

SF = "/root/testdata/sf0.01"


def _collect(res) -> pa.Table:
    import ray

    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    return pa.concat_tables([t for t in tabs if t.num_rows])


def test_hll_agrees_with_exact_distinct_ngram_ratio(ray_session):
    from metareadability_ray.pipelines.textops2 import (
        q_distinct_ngram_hll,
        q_distinct_ngram_ratio,
    )

    exact = {
        r["source"]: r for r in _collect(q_distinct_ngram_ratio(SF)).to_pylist()
    }
    approx = {
        r["source"]: r for r in _collect(q_distinct_ngram_hll(SF)).to_pylist()
    }
    assert set(exact) == set(approx)
    for s in exact:
        assert approx[s]["n_grams"] == exact[s]["n_grams"]  # counted, not sketched
        e, a = exact[s]["n_distinct"], approx[s]["approx_distinct"]
        assert abs(a - e) / e <= 0.05, (s, e, a)  # p=12 → σ≈1.6%, 3σ bound


def test_hll_deterministic_across_runs(ray_session):
    from metareadability_ray.pipelines.textops2 import q_distinct_ngram_hll

    a = sorted(map(repr, _collect(q_distinct_ngram_hll(SF)).to_pylist()))
    b = sorted(map(repr, _collect(q_distinct_ngram_hll(SF)).to_pylist()))
    assert a == b
