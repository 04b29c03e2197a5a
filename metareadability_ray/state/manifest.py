"""Per-partition checkpoint manifest + lineage/metrics sidecars (MR-S3, §4.4).

Layout under the output directory::

    out/
      extracted/part-00017.parquet     # one file per partition, rows sorted by url
      _manifest/part-00017.json        # written ATOMICALLY after its data file
      lineage.parquet                  # rebuilt from _manifest/ at end of run
      metrics.parquet

A partition is "done" iff its manifest JSON exists and parses. Resume =
read done-set → drop those partitions from the input at the scan (before any
shuffle) → run the remainder → rebuild sidecars. Data files are written to a
temp name and renamed, and the manifest is written only after the rename, so
a killed run can never leave a done-marked partition with bad data.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"
DATA_DIR = "extracted"


def partition_file(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, DATA_DIR, f"part-{pid:05d}.parquet")


def manifest_file(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{pid:05d}.json")


def read_done(out_dir: str) -> dict[int, dict]:
    """pid → manifest row for every completed partition."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return done
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                row = json.load(f)
            done[int(row["partition_id"])] = row
        except (ValueError, KeyError, json.JSONDecodeError):
            continue  # torn manifest → partition not done
    return done


def write_manifest_row(out_dir: str, row: dict) -> None:
    """Atomic (tmp+rename) manifest write; marks the partition done."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    path = manifest_file(out_dir, int(row["partition_id"]))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def rebuild_sidecars(out_dir: str, stage_versions: dict[str, str]) -> None:
    """Rebuild lineage.parquet + metrics.parquet from the manifest dir (§1.2)."""
    rows = sorted(read_done(out_dir).values(), key=lambda r: r["partition_id"])
    if not rows:
        return
    lineage = pa.table(
        {
            "partition_id": pa.array([r["partition_id"] for r in rows], pa.int32()),
            "input_files": pa.array([r.get("input_files", []) for r in rows], pa.list_(pa.string())),
            "row_count": pa.array([r["row_count"] for r in rows], pa.int64()),
            "first_url": pa.array([r.get("first_url", "") for r in rows], pa.string()),
            "last_url": pa.array([r.get("last_url", "") for r in rows], pa.string()),
            "stage_versions": pa.array(
                [list(stage_versions.items())] * len(rows),
                pa.map_(pa.string(), pa.string()),
            ),
            "wall_ms": pa.array([r.get("wall_ms", 0) for r in rows], pa.int64()),
            "attempt": pa.array([r.get("attempt", 1) for r in rows], pa.int32()),
            "content_hash": pa.array([r.get("content_hash", "") for r in rows], pa.string()),
        }
    )
    metrics = pa.table(
        {
            "partition_id": pa.array([r["partition_id"] for r in rows], pa.int32()),
            "n_docs": pa.array([r["row_count"] for r in rows], pa.int64()),
            "n_headline": pa.array([r.get("n_headline", 0) for r in rows], pa.int64()),
            "n_pubdate": pa.array([r.get("n_pubdate", 0) for r in rows], pa.int64()),
            "n_text": pa.array([r.get("n_text", 0) for r in rows], pa.int64()),
            "n_authors": pa.array([r.get("n_authors", 0) for r in rows], pa.int64()),
            "n_parse_err": pa.array([r.get("n_parse_err", 0) for r in rows], pa.int64()),
            "n_enc_fallback": pa.array([r.get("n_enc_fallback", 0) for r in rows], pa.int64()),
            "n_oversize": pa.array([r.get("n_oversize", 0) for r in rows], pa.int64()),
            "bytes_in": pa.array([r.get("bytes_in", 0) for r in rows], pa.int64()),
        }
    )
    pq.write_table(lineage, os.path.join(out_dir, "lineage.parquet"))
    pq.write_table(metrics, os.path.join(out_dir, "metrics.parquet"))


# ------------------------------------------------- input coverage (resume prune)

COVERAGE_FILE = "input_coverage.json"


def coverage_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, COVERAGE_FILE)


def write_coverage(out_dir: str, cov: dict[str, list[int]], num_partitions: int) -> None:
    """Atomic write of the input-file → partition-id coverage map.

    Recorded once per run (a url-column-only scan — a ~0.1% fraction of the
    input bytes at Common-Crawl html sizes); on resume the main scan then
    reads ONLY the files whose coverage intersects the missing partitions.
    With uniform url-hash data every file covers every partition and the
    prune is a no-op; with host- or shard-clustered crawl files it skips
    whole files — the layout decides the win, the correctness is unconditional.
    """
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    path = coverage_path(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"num_partitions": num_partitions, "files": {k: sorted(v) for k, v in cov.items()}},
            f,
        )
    os.replace(tmp, path)


def read_coverage(out_dir: str, num_partitions: int) -> dict[str, list[int]] | None:
    """Coverage map for this partition count, or None (absent / stale P)."""
    path = coverage_path(out_dir)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            d = json.load(f)
        if int(d.get("num_partitions", -1)) != num_partitions:
            return None
        return {k: [int(p) for p in v] for k, v in d["files"].items()}
    except (ValueError, KeyError, json.JSONDecodeError):
        return None
