"""CSV source and sink for the documents table.

Tabular corpora and metadata dumps commonly ship as sharded CSV; this makes
them a first-class ingest next to Parquet, JSONL, and WARC. Reading uses
``ray.data.read_csv`` (Arrow's streaming CSV reader — one task per file, so
parallelism comes from the shard count), then the same normalizing
``map_batches`` contract as the JSONL source: project/cast to the canonical
documents schema, derive ``n_chars`` when the file doesn't carry it, null
out missing columns. Writing goes through ``Dataset.write_csv`` (one shard
per block, written inside mapper tasks — the driver never holds text).

CSV has no types: everything may arrive as string (or be inferred int), so
the normalizer casts explicitly and treats the empty string in ``text`` as
null — matching what a round-trip through CSV does to null text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from metareadability_ray.sources.jsonl import DOCS_SCHEMA


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    n = batch.num_rows
    for field in DOCS_SCHEMA:
        if field.name in batch.column_names:
            c = batch.column(field.name)
            if field.name == "text":
                # CSV cannot distinguish null from "": read both as null
                c = c.cast(pa.string())
                c = pc.if_else(pc.equal(pc.coalesce(c, ""), ""), pa.nulls(n, pa.string()), c)
            cols[field.name] = c.cast(field.type)
        elif field.name == "n_chars" and "text" in batch.column_names:
            cols[field.name] = pc.cast(
                pc.coalesce(pc.utf8_length(batch.column("text").cast(pa.string())), 0),
                pa.int64(),
            )
        else:
            cols[field.name] = pa.nulls(n, field.type)
    return pa.table(cols)


def read_csv_docs(paths: list[str] | str) -> "ray.data.Dataset":
    """CSV shard set → documents Dataset with the canonical schema."""
    import ray.data

    ds = ray.data.read_csv(paths)
    return ds.map_batches(_normalize, batch_format="pyarrow", zero_copy_batch=True)


def export_csv(docs: "ray.data.Dataset", out_dir: str) -> None:
    """Documents Dataset → sharded CSV directory (one file per block)."""
    docs.write_csv(out_dir)
