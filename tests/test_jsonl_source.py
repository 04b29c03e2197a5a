"""JSONL source/sink roundtrip: parquet documents → jsonl shards → Dataset
must be value-identical, and raw jsonl without n_chars must derive it."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from metareadability_ray.sources.jsonl import export_jsonl, read_jsonl_docs

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow") if t.num_rows]
    return pa.concat_tables(tabs, promote_options="permissive").sort_by("doc_id")


def test_roundtrip_parquet_jsonl(ray_session, tmp_path):
    import ray.data

    src = ray.data.read_parquet(SF + "/documents.parquet")
    out = str(tmp_path / "shards")
    export_jsonl(src, out)
    back = _collect(read_jsonl_docs(out))
    want = pq.read_table(SF + "/documents.parquet").sort_by("doc_id")
    assert back.num_rows == want.num_rows
    for col in ["doc_id", "text", "lang", "source", "n_chars"]:
        assert back.column(col).to_pylist() == want.column(col).to_pylist(), col


def test_derives_n_chars_and_nulls_missing(ray_session, tmp_path):
    p = tmp_path / "raw.jsonl"
    rows = [
        {"doc_id": 1, "text": "hello world"},
        {"doc_id": 2, "text": ""},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    t = _collect(read_jsonl_docs(str(p)))
    assert t.column("n_chars").to_pylist() == [11, 0]
    assert t.column("lang").to_pylist() == [None, None]
    assert t.schema.field("doc_id").type == pa.int64()
