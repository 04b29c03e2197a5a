"""CLI entrypoint for the flagship extraction job — `ray job submit`-compatible.

On a real cluster::

    ray job submit --working-dir . -- \
        python scripts/run_extract.py --input s3://bucket/pages/*.parquet \
        --out /shared/out --num-partitions 4096

Locally (owns its Ray session; library code never calls ray.init)::

    python scripts/run_extract.py --input /tmp/pages --out /tmp/out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", nargs="+", required=True, help="pages parquet file(s)/dir(s)")
    ap.add_argument("--out", required=True, help="output dir (shared storage on a cluster)")
    ap.add_argument("--num-partitions", type=int, default=64,
                    help="url-hash partitions = output files = resume granularity; "
                         "choose ~input-bytes/512MiB at scale")
    ap.add_argument("--concurrency", type=int, default=None, help="extract actor count")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--no-resume", action="store_true", help="ignore existing manifests")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # On a cluster `ray job submit` provides the address; locally start one.
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    from metareadability_ray.pipelines.flagship import run_extraction

    t0 = time.perf_counter()
    res = run_extraction(
        args.input,
        args.out,
        num_partitions=args.num_partitions,
        concurrency=args.concurrency,
        batch_size=args.batch_size,
        resume=not args.no_resume,
    )
    res["wall_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
