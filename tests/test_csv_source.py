"""CSV source/sink roundtrip: parquet documents → csv shards → Dataset must
be value-identical (modulo CSV's null-vs-empty-text collapse, which this
corpus doesn't exercise), and raw CSV without n_chars must derive it."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from metareadability_ray.sources.csv_source import export_csv, read_csv_docs

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    tabs = [t for t in ds.iter_batches(batch_format="pyarrow") if t.num_rows]
    return pa.concat_tables(tabs, promote_options="permissive").sort_by("doc_id")


def test_roundtrip_parquet_csv(ray_session, tmp_path):
    import ray.data

    src = ray.data.read_parquet(SF + "/documents.parquet")
    out = str(tmp_path / "shards")
    export_csv(src, out)
    back = _collect(read_csv_docs(out))
    want = pq.read_table(SF + "/documents.parquet").sort_by("doc_id")
    assert back.num_rows == want.num_rows
    for col in ["doc_id", "text", "lang", "source", "n_chars"]:
        assert back.column(col).to_pylist() == want.column(col).to_pylist(), col


def test_derives_n_chars_and_nulls_missing(ray_session, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text('doc_id,text\n1,hello world\n2,""\n')
    t = _collect(read_csv_docs(str(p)))
    assert t.column("n_chars").to_pylist() == [11, 0]
    assert t.column("text").to_pylist() == ["hello world", None]  # "" → null
    assert t.column("lang").to_pylist() == [None, None]
    assert t.schema.field("doc_id").type == pa.int64()
