"""Hive-partitioned sink + partition-pruned read (sources/hive.py)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_hive_roundtrip_and_pruned_read(ray_session, tmp_path):
    import ray.data

    from metareadability_ray.sources.hive import export_hive_partitioned, read_partition

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    out = str(tmp_path / "hive")
    res = export_hive_partitioned(docs, out)
    assert res["partition_values"] == ["de", "en", "es", "fr", "zh"]
    # value-routing: one fat file per partition value, not blocks x values
    files = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    assert len(files) <= 2 * len(res["partition_values"])

    full = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    )
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars"])
    assert sorted(full.column("doc_id").to_pylist()) == sorted(src.column("doc_id").to_pylist())

    en = read_partition(out, "lang", "en")
    t = pa.concat_tables(list(en.iter_batches(batch_format="pyarrow")))
    want = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    n_en = sum(1 for v in want.column("lang").to_pylist() if v == "en")
    assert t.num_rows == n_en
    # the pruned read touched ONLY the en directory
    assert all("lang=en" in f for f in en.input_files())

    with pytest.raises(FileNotFoundError):
        read_partition(out, "lang", "tlh")


def test_hive_null_partition_value(ray_session, tmp_path):
    import ray.data

    from metareadability_ray.sources.hive import export_hive_partitioned

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "lang": pa.array(["en", None, "en"], pa.string()),
            "n_chars": pa.array([1, 2, 3], pa.int64()),
        }
    )
    out = str(tmp_path / "hive_null")
    res = export_hive_partitioned(ray.data.from_arrow(t), out)
    # null rides as Arrow's hive null dir; every row lands somewhere
    files = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    full = pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")
    assert full.num_rows == 3
    # partition_values reports ACTUAL values: None, not the sentinel dir name
    assert res["partition_values"] == ["en", None]
    # the null partition is readable via value=None
    from metareadability_ray.sources.hive import read_partition

    nt = pa.concat_tables(
        list(read_partition(out, "lang", None).iter_batches(batch_format="pyarrow"))
    )
    assert nt.column("doc_id").to_pylist() == [1]


def test_hive_encoded_partition_value(ray_session, tmp_path):
    """Round-3 ADVICE: the writer URL-encodes values ('en us' → dir
    'en%20us'); read_partition must encode with the same rule and
    partition_values must decode back to the actual values."""
    import ray.data

    from metareadability_ray.sources.hive import export_hive_partitioned, read_partition

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "lang": pa.array(["en us", "en us", "fr"], pa.string()),
            "n_chars": pa.array([1, 2, 3], pa.int64()),
        }
    )
    out = str(tmp_path / "hive_enc")
    res = export_hive_partitioned(ray.data.from_arrow(t), out)
    assert res["partition_values"] == ["en us", "fr"]
    # the dir on disk is the encoded form — prove we're exercising the rule
    assert os.path.isdir(os.path.join(out, "lang=en%20us"))
    got = pa.concat_tables(
        list(read_partition(out, "lang", "en us").iter_batches(batch_format="pyarrow"))
    )
    assert sorted(got.column("doc_id").to_pylist()) == [0, 1]
