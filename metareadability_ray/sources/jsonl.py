"""JSONL (newline-delimited JSON) source and sink for the documents table.

Public text corpora (The Pile, RedPajama, Dolma, …) ship as sharded
``*.jsonl`` / ``*.jsonl.gz``; this module makes them a first-class ingest
next to Parquet and WARC. Reading uses ``ray.data.read_json`` (Arrow's
streaming JSON reader, one task per file — parallelism from the shard
count), then a normalizing ``map_batches`` that projects/casts to the
canonical documents schema so every downstream operator works unchanged.

Writing goes through ``Dataset.write_json`` (one shard per block, written
inside the mapper tasks — the driver never holds document text).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    n = batch.num_rows
    for field in DOCS_SCHEMA:
        if field.name in batch.column_names:
            cols[field.name] = batch.column(field.name).cast(field.type)
        elif field.name == "n_chars" and "text" in batch.column_names:
            # derive when the corpus didn't carry it (most raw jsonl doesn't)
            cols[field.name] = pc.cast(
                pc.utf8_length(batch.column("text").cast(pa.string())), pa.int64()
            )
        else:
            cols[field.name] = pa.nulls(n, field.type)
    return pa.table(cols)


def read_jsonl_docs(paths: list[str] | str) -> "ray.data.Dataset":
    """JSONL shard set → documents Dataset with the canonical schema
    (missing columns become null; ``n_chars`` is derived from ``text``
    when absent)."""
    import ray.data

    ds = ray.data.read_json(paths)
    return ds.map_batches(_normalize, batch_format="pyarrow", zero_copy_batch=True)


def export_jsonl(docs: "ray.data.Dataset", out_dir: str) -> None:
    """Documents Dataset → sharded JSONL directory (one file per block)."""
    docs.write_json(out_dir)
