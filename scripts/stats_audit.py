"""Per-operator wall-time audit of the expensive pipelines (the evidence
behind BASELINE.md's "wall time is dominated by useful compute" claims).

Runs the flagship chain plus the slowest registry queries at $GRAFT_SF_DIR
and prints, per pipeline, Ray's `ds.stats()` operator breakdown — so a
reviewer can see where remote wall goes (extract kernel vs shuffle vs
glue) without reverse-engineering bench.py. Usage::

    python scripts/stats_audit.py [query ...]   # default: the headline set
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "minhash_lsh_pairs",
    "dedup_survivors_lsh",
    "bloom_semi_join",
    "semdedup",
    "dup_span_stats",
    "curated_corpus",
]


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT

    from metareadability_ray.qa import REGISTRY

    for name in names:
        import gc

        gc.collect()
        t0 = time.perf_counter()
        res = REGISTRY[name].fn(sf_dir)
        if hasattr(res, "materialize"):
            res = res.materialize()
            stats = res.stats()
            rows = res.count()
        else:  # driver-fold queries return an Arrow table
            stats, rows = "(driver-fold result: no Dataset stats)", res.num_rows
        wall = time.perf_counter() - t0
        print(f"\n===== {name}: {wall:.2f}s, {rows} rows =====")
        print(stats)

    ray.shutdown()


if __name__ == "__main__":
    main()
