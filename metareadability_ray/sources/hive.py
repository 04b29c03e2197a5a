"""Hive-partitioned Parquet sink + partition-pruned reads for the documents
table.

The layout that makes 100 TB reads cheap: writing ``out/lang=en/...``
means a consumer that wants one language (or one source, one date bucket)
opens ONLY that directory — the read is pruned by the filesystem listing
before a byte of Parquet is touched. This is the same
partition-layout-decides-the-win story as the flagship's per-partition
output and the IVF cluster-partitioned corpus: the writer pays one keyed
shuffle once so every later read can skip.

Writer notes:
- ``repartition_by`` first routes each partition value's rows together
  (one keyed shuffle), so each directory holds a few FAT files instead of
  one sliver per upstream block × value (files ∝ values, not
  blocks × values — at 256 input blocks × 30 languages that is 30 files
  instead of 7,680).
- Ray's ``write_parquet(partition_cols=...)`` performs the actual
  hive-dir fan-out inside the writer tasks; the driver never holds rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data


def export_hive_partitioned(
    docs: "ray.data.Dataset", out_dir: str, col: str = "lang"
) -> dict:
    """Write ``docs`` hive-partitioned by ``col`` (``out/col=value/*.parquet``).

    Null partition values ride as the literal hive null dir (Ray delegates
    to Arrow's dataset writer). Returns {"out_dir", "partition_values"}."""
    from metareadability_ray.util import enc_null_key

    # route each value's rows together so every hive dir gets few fat
    # files: one range shuffle on the (null-safe encoded) value — Ray 2.49's
    # key-based repartition requires the hash-shuffle strategy, so the sort
    # IS the keyed shuffle here; block boundaries then align with value runs
    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("__k", enc_null_key(batch.column(col)))

    (
        docs.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .sort("__k")
        .drop_columns(["__k"])
        .write_parquet(out_dir, partition_cols=[col])
    )
    # Decode dir names back to the ACTUAL partition values (round-3 ADVICE):
    # Arrow's hive writer URL-encodes values ('en us' → dir 'en%20us') and
    # writes nulls as the __HIVE_DEFAULT_PARTITION__ sentinel — returning
    # the raw dir names would hand callers strings no row ever contained.
    vals = sorted(
        (_hive_decode(d.split("=", 1)[1]) for d in os.listdir(out_dir) if "=" in d),
        key=lambda v: (v is None, v),
    )
    return {"out_dir": out_dir, "partition_values": vals}


_HIVE_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"


def _hive_encode(value: str | None) -> str:
    """Partition value → hive dir segment, the same rule Arrow's
    HivePartitioning applies on write (URL percent-encoding; None → the
    hive null sentinel dir)."""
    from urllib.parse import quote

    if value is None:
        return _HIVE_NULL_DIR
    return quote(str(value), safe="")


def _hive_decode(segment: str) -> str | None:
    from urllib.parse import unquote

    if segment == _HIVE_NULL_DIR:
        return None
    return unquote(segment)


def read_partition(out_dir: str, col: str, value: str | None) -> "ray.data.Dataset":
    """Partition-pruned read: opens ONLY ``out_dir/col=value/`` — the
    filesystem listing is the pushdown, no footer of any other partition
    is touched. ``value`` is the ACTUAL value (it is hive-encoded here with
    the writer's own rule, so 'en us' finds the 'en%20us' dir and
    ``value=None`` reads the hive null partition). Raises FileNotFoundError
    when the partition has no dir (the caller distinguishes 'absent value'
    from 'empty table')."""
    path = os.path.join(out_dir, f"{col}={_hive_encode(value)}")
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    return ray.data.read_parquet(path)
