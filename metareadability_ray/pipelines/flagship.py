"""Flagship batch-extraction pipeline (SURVEY.md §3.2(b)) — Ray-Data-first.

Plan (stage → Ray Data mapping)::

    read_parquet(pages, columns=[url, warc_ts, html])   # MR-S1: prune at read
      → map_batches(assign_partition)                   # MR-P4: crc32(url) % P
      → [resume] map_batches(drop done partitions)      # MR-D3: manifest anti-filter
      → map_batches(ExtractActor, pyarrow, zero-copy)   # MR-X0: stateful actor pool
      → groupby(partition_id).map_groups(               # THE one url-hash shuffle:
            dedup_extracted + sort-by-url + write)      # MR-D1 + MR-S2/S3
      → sidecar rebuild (lineage/metrics parquet)

Scale notes (10^12-doc design, tested single-node):
  * **The raw ``html`` column NEVER shuffles.** Extraction runs streaming on
    read order; dedup (MR-D1: latest ``warc_ts`` per url, tie → smallest
    md5(html)) happens AFTER extraction on the small (url + 3 short strings)
    rows, using an ``html_md5`` column carried from the extract actor.
    Extracting a duplicate costs ~2% extra CPU; shuffling every page's bytes
    to dedup first would cost an all-to-all over the full corpus.
  * The single shuffle key (partition_id = crc32(url)%P) serves dedup,
    deterministic output order AND the checkpoint/file layout at once.
  * Partition count P is the checkpoint/resume granularity AND the output
    file layout; choose P ≈ total-input-bytes / 512 MiB on a real cluster.
  * On a multi-node cluster ``out_dir`` must be shared storage (object store
    / NFS); every stage writes only its own partition file, atomically.
  * Streaming executor end to end — nothing materializes the full dataset;
    the driver only ever holds P manifest rows.
"""

from __future__ import annotations

import hashlib
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from metareadability_ray import __version__ as ENGINE_VERSION
from metareadability_ray.stages.extract_stage import ExtractActor
from metareadability_ray.stages.partitioning import assign_partition, dedup_extracted
from metareadability_ray.state import manifest as mf


def _drop_done(batch: pa.Table, done_pids: frozenset[int]) -> pa.Table:
    if not done_pids:
        return batch
    done = pa.array(sorted(done_pids), pa.int64())
    keep = pc.invert(pc.is_in(batch.column("partition_id"), value_set=done))
    return batch.filter(keep)


def _make_write_partition(out_dir: str, input_files: list[str]):
    def write_partition(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = int(group.column("partition_id")[0].as_py())

        # MR-D1 dedup on the small extracted rows, which also yields the
        # deterministic url sort order (MR-O1) for free.
        g = dedup_extracted(group)
        out = g.select(["url", "headline", "pubdate", "authors", "text"])

        # attempt tracking: a start marker survives a mid-write crash
        os.makedirs(os.path.join(out_dir, mf.MANIFEST_DIR), exist_ok=True)
        start_marker = mf.manifest_file(out_dir, pid) + ".start"
        attempt = 1
        if os.path.exists(start_marker):
            try:
                with open(start_marker) as f:
                    attempt = int(f.read().strip() or "0") + 1
            except ValueError:
                attempt = 1
        with open(start_marker, "w") as f:
            f.write(str(attempt))

        # atomic data write: tmp + rename, then manifest
        path = mf.partition_file(out_dir, pid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        import pyarrow.parquet as pq

        pq.write_table(out, tmp)
        with open(tmp, "rb") as f:
            content_hash = hashlib.md5(f.read()).hexdigest()
        os.replace(tmp, path)

        n = out.num_rows
        urls = out.column("url")

        def _count_nonempty(col: str) -> int:
            return int(pc.sum(pc.cast(pc.not_equal(g.column(col), ""), pa.int64())).as_py() or 0)

        row = {
            "partition_id": pid,
            "status": "done",
            "output_file": path,
            "content_hash": content_hash,
            "attempt": attempt,
            "input_files": input_files,
            "row_count": n,
            "first_url": urls[0].as_py() if n else "",
            "last_url": urls[n - 1].as_py() if n else "",
            "n_headline": _count_nonempty("headline"),
            "n_pubdate": _count_nonempty("pubdate"),
            "n_text": _count_nonempty("text"),
            "n_authors": int(pc.sum(pc.cast(pc.greater(pc.list_value_length(g.column("authors")), 0), pa.int64())).as_py() or 0),
            "n_parse_err": int(pc.sum(g.column("parse_err")).as_py() or 0),
            "n_enc_fallback": int(pc.sum(g.column("enc_fallback")).as_py() or 0),
            "n_oversize": int(pc.sum(g.column("oversize")).as_py() or 0),
            "bytes_in": int(pc.sum(g.column("bytes_in")).as_py() or 0),
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
        mf.write_manifest_row(out_dir, row)
        return pa.table(
            {
                "partition_id": pa.array([pid], pa.int32()),
                "row_count": pa.array([n], pa.int64()),
                "attempt": pa.array([attempt], pa.int32()),
                "output_file": pa.array([path], pa.string()),
            }
        )

    return write_partition


def extraction_chain(
    ds: "ray.data.Dataset",
    num_partitions: int = 64,
    concurrency=None,
    batch_size: int = 128,
    done_pids: frozenset[int] = frozenset(),
    dedup: bool = True,
) -> "ray.data.Dataset":
    """partition→extract(→dedup) over an existing `pages` Dataset (lazy).

    Extraction streams WITHOUT any shuffle of the html payload; dedup (when
    requested) is the single url-hash groupby over the small extracted rows.
    ``run_extraction`` passes ``dedup=False`` because its per-partition
    writer performs the dedup inside the same (only) shuffle.
    """
    if concurrency is None:
        import ray

        # production pool policy: n − ⌈n/8⌉ actors (capacity-based, not the
        # instantaneous free count) — read/shuffle/write keep ⌈n/8⌉ CPUs
        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = max(1, n - max(1, (n + 7) // 8))
    ds = ds.map_batches(
        assign_partition,
        fn_kwargs={"num_partitions": num_partitions},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if done_pids:
        ds = ds.map_batches(
            _drop_done,
            fn_kwargs={"done_pids": done_pids},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ds = ds.map_batches(
        ExtractActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        # max_restarts=0: Ray 2.49's restartable map-worker actors can fail
        # teardown ("Failed to report actor out of scope"), wedging the whole
        # session after ~5 datasets (reproduced in-sandbox). The stage is
        # idempotent + deterministic, so lost actors are re-created by task
        # retry at the operator level instead.
        max_restarts=0,
    )
    if dedup:
        ds = ds.groupby("partition_id").map_groups(dedup_extracted, batch_format="pyarrow")
    return ds


def build_extraction_dataset(
    inputs: list[str] | str,
    num_partitions: int = 64,
    concurrency=None,
    batch_size: int = 128,
    done_pids: frozenset[int] = frozenset(),
    override_num_blocks: int | None = None,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """read_parquet(pages) → :func:`extraction_chain` (lazy, no write)."""
    ds = ray.data.read_parquet(
        inputs,
        columns=["url", "warc_ts", "html"],
        override_num_blocks=override_num_blocks,
    )
    return extraction_chain(
        ds,
        num_partitions=num_partitions,
        concurrency=concurrency,
        batch_size=batch_size,
        done_pids=done_pids,
        dedup=dedup,
    )


def _input_coverage(inputs: list[str], num_partitions: int) -> dict[str, list[int]]:
    """Per input FILE, the sorted set of partition ids its urls hash to —
    computed from a url-column-only scan (``include_paths``), so the pass
    reads a sliver of the input bytes. The resulting map is driver-held but
    bounded by #files × P ints, never by row count."""
    import numpy as np

    cov_ds = ray.data.read_parquet(inputs, columns=["url"], include_paths=True)

    def per_batch(batch: pa.Table) -> pa.Table:
        b = assign_partition(batch, num_partitions)
        t = pa.table({"path": b.column("path"), "pid": b.column("partition_id").cast(pa.int32())})
        return t.group_by(["path", "pid"]).aggregate([])

    cov: dict[str, set[int]] = {}
    for b in cov_ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for path, pid in zip(b.column("path").to_pylist(), b.column("pid").to_pylist()):
            cov.setdefault(path, set()).add(int(pid))
    return {k: sorted(v) for k, v in cov.items()}


def run_extraction(
    inputs: list[str] | str,
    out_dir: str,
    num_partitions: int = 64,
    concurrency=None,
    batch_size: int = 128,
    resume: bool = True,
    override_num_blocks: int | None = None,
    return_stats: bool = False,
) -> dict:
    """Run the flagship pipeline end-to-end; returns a run summary dict
    (plus the Ray Data per-operator stats text when ``return_stats``)."""
    if isinstance(inputs, str):
        inputs = [inputs]
    os.makedirs(out_dir, exist_ok=True)

    done = mf.read_done(out_dir) if resume else {}
    if resume and len(done) >= num_partitions:
        # every possible partition id is already manifested — nothing to run
        from oracle import SIGNALS_VERSION

        mf.rebuild_sidecars(out_dir, {"signals": SIGNALS_VERSION, "engine": ENGINE_VERSION})
        return {
            "out_dir": out_dir,
            "partitions_run": 0,
            "partitions_skipped": len(done),
            "rows_written": 0,
            "data_dir": os.path.join(out_dir, mf.DATA_DIR),
        }
    if not resume:
        import shutil

        for sub in (mf.MANIFEST_DIR, mf.DATA_DIR):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)

    # shard-level input pruning (round-2 verdict #8): the coverage map
    # (file → partition ids, from a url-only scan recorded on first resume)
    # lets a resume read ONLY the files that contain rows of a missing
    # partition, instead of re-scanning the whole input. Fresh runs skip
    # the scan entirely — they read everything anyway.
    effective_inputs = list(inputs)
    if resume and done:
        cov = mf.read_coverage(out_dir, num_partitions)
        if cov is None:
            cov = _input_coverage(inputs, num_partitions)
            mf.write_coverage(out_dir, cov, num_partitions)
        needed = [f for f, pids in cov.items() if any(p not in done for p in pids)]
        if not needed:
            # every partition that can have rows is manifested — nothing to run
            from oracle import SIGNALS_VERSION

            mf.rebuild_sidecars(out_dir, {"signals": SIGNALS_VERSION, "engine": ENGINE_VERSION})
            return {
                "out_dir": out_dir,
                "partitions_run": 0,
                "partitions_skipped": len(done),
                "rows_written": 0,
                "data_dir": os.path.join(out_dir, mf.DATA_DIR),
                "input_files_scanned": [],
            }
        # paths recorded by the url scan are the expanded file paths
        if len(needed) < len(cov):
            effective_inputs = sorted(needed)

    ds = build_extraction_dataset(
        effective_inputs,
        num_partitions=num_partitions,
        concurrency=concurrency,
        batch_size=batch_size,
        done_pids=frozenset(done),
        dedup=False,  # the writer dedups inside the same single shuffle
        # Coarse blocks matter: the post-extract sort shuffle costs per-BLOCK,
        # not per-row (measured 8.9s over 224 blocks vs 1.4s over 32 for the
        # same 240k rows) — keep extract output blocks few and fat.
        override_num_blocks=override_num_blocks,
    )
    writer = _make_write_partition(out_dir, [os.path.abspath(p) for p in inputs])
    manifest_ds = ds.groupby("partition_id").map_groups(writer, batch_format="pyarrow")
    ran = manifest_ds.take_all()  # tiny: one row per partition run
    stats_text = manifest_ds.stats() if return_stats else None

    # Release the actor pool NOW: completed datasets leave MapWorker actor
    # handles trapped in reference cycles; without an explicit collect they
    # accumulate (each holding 1 CPU) until the cluster has no CPUs left and
    # the next dataset wedges forever (reproduced: ~5-12 runs on 4 CPUs).
    import gc

    del manifest_ds, ds
    gc.collect()

    from oracle import SIGNALS_VERSION

    mf.rebuild_sidecars(out_dir, {"signals": SIGNALS_VERSION, "engine": ENGINE_VERSION})
    rows_written = sum(r["row_count"] for r in ran)
    out = {
        "out_dir": out_dir,
        "partitions_run": len(ran),
        "partitions_skipped": len(done),
        "rows_written": rows_written,
        "data_dir": os.path.join(out_dir, mf.DATA_DIR),
        "input_files_scanned": effective_inputs,
    }
    if return_stats:
        out["stats"] = stats_text
    return out


def read_extracted(out_dir: str) -> "ray.data.Dataset":
    """Read the deterministic extraction output back as a Dataset."""
    return ray.data.read_parquet(os.path.join(out_dir, mf.DATA_DIR))
