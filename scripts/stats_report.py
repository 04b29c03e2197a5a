"""Per-operator Ray Data stats audit of the flagship extraction pipeline.

Prints `ds.stats()` for the full chain (read → partition → actor-pool
extract → url-hash shuffle → per-partition write) over the cached bench
corpus, plus a condensed per-operator wall/CPU table — the evidence that
wall-time is dominated by the extraction kernel (useful compute), not by
shuffle or scheduling overhead. Run::

    python scripts/stats_report.py [n_pages] [num_cpus]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import glob
    import shutil
    import time

    import ray

    from bench import _init_ray, ensure_corpus, pool_size

    _init_ray(num_cpus)
    from metareadability_ray.pipelines.flagship import run_extraction

    corpus = ensure_corpus(n_pages)
    files = sorted(glob.glob(os.path.join(corpus, "shard=*", "pages.parquet")))
    out = "/tmp/mr_stats_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_extraction(
        files,
        out,
        num_partitions=max(64, num_cpus * 2),
        concurrency=pool_size(num_cpus, "prod"),
        batch_size=256,
        resume=False,
        override_num_blocks=max(16, num_cpus * 4),
        return_stats=True,
    )
    wall = time.perf_counter() - t0
    stats = res.get("stats", "")
    print(stats)
    print("=" * 72)
    # condensed: operator → total remote wall time (sum over its tasks)
    for m in re.finditer(r"Operator (\d+) (\S+?):(.*?)(?=\nOperator |\nDataset |\Z)", stats, re.S):
        idx, name, body = m.groups()
        tm = re.search(r"\* Remote wall time:.*?([\d.]+(?:us|ms|s|m)) total", body)
        print(f"op{idx:>2} {name[:58]:<58} total={tm.group(1) if tm else '?':>9}")
    print(f"wall_s={wall:.2f} rows={res['rows_written']} docs_per_sec={res['rows_written']/wall:,.0f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
