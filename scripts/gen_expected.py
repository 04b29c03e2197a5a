"""Generate pinned expected-output Parquet for rows-only queries.

The driver's gate can only row-count queries with no SQL oracle; these
committed snapshots pin their full VALUES at sf0.001 so any semantic drift
fails tests/test_expected_snapshots.py. All four pipelines are deterministic
(seeded planes/permutations, blake2/md5 hashing, no RNG), so a snapshot is a
legitimate oracle. Regenerate ONLY on an intentional semantic change::

    python scripts/gen_expected.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT_QUERIES = [
    "simhash", "minhash_lsh_pairs", "media_features", "media_frame_sample",
    "pdf_layout_spans",
    # deterministic regardless of block order/parallelism (seeded planes /
    # centroids, commutative register-max / exact reduces) — snapshots are
    # generated at 8 CPUs and asserted under the 4-CPU test session, so a
    # pass is also evidence of parallelism-independence. The two genuinely
    # merge-order-sensitive sketches (approx_heavy_hitters, Misra-Gries;
    # quantile_sketch_value strides) stay guarantee-tested instead.
    "lsh_bucket_stats", "lsh_neardup_pairs", "ivf_topk", "hll_distinct_users",
    "dedup_survivors_lsh",
    # centroids rounded to 6 dp / covariance to 9 dp before use, so float-sum
    # block-order wobble cannot flip assignments or projections
    "semdedup", "pca_project",
    # r5 composed audits: deterministic extraction + commutative int sums
    # (coverage), both pair streams snapshot-deterministic (lsh recall),
    # snapshot-pinned ANN sides (ann recall), exact int hourly counts into a
    # single-task DP (bursts)
    "extraction_coverage", "lsh_recall_audit", "ann_recall_audit",
    "burst_detect",
    # end-to-end curation-run accounting: deterministic extraction, exact
    # counts, hash dedup on deterministic text
    "html_curation_run",
]
SF_DIR = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "expected")


def canonical(t):
    """Sort columns by name and rows by their repr for order-free equality."""
    import pyarrow as pa

    t = t.select(sorted(t.column_names))
    rows = t.to_pylist()
    rows.sort(key=repr)
    return pa.Table.from_pylist(rows, schema=t.schema) if rows else t


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq

    from metareadability_ray.qa import REGISTRY

    os.makedirs(OUT_DIR, exist_ok=True)
    for name in SNAPSHOT_QUERIES:
        res = REGISTRY[name].fn(SF_DIR)
        t = (
            res
            if isinstance(res, pa.Table)
            else pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))
        )
        t = canonical(t)
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(t, path)
        print(f"wrote {path}: {t.num_rows} rows, cols={t.column_names}")
        import gc

        gc.collect()
    ray.shutdown()


if __name__ == "__main__":
    main()
