"""WARC source/sink: grammar round-trip, robustness, and ingest parity —
the Parquet pages path and the WARC crawl path must produce byte-identical
extraction output (BASELINE input_hint's per-row invariant holds regardless
of ingest format)."""

from __future__ import annotations

import datetime as dt
import gzip

import pyarrow as pa
import pytest

from metareadability_ray.sources.warc import (
    export_warc,
    parse_warc_bytes,
    read_warc_pages,
    write_warc_pages,
)


def _pages_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array(
                ["https://a.example/x", "https://b.example/y?q=1", "https://c.example/"]
            ),
            "warc_ts": pa.array(
                [dt.datetime(2021, 1, 2, 3, 4, 5)] * 3, pa.timestamp("us")
            ),
            "html": pa.array(
                [b"<html>A</html>", "caf\xe9".encode("latin-1"), b""], pa.binary()
            ),
        }
    )


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_bytes_identical(tmp_path, compress):
    t = _pages_table()
    p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    write_warc_pages(t, p, compress=compress)
    recs = parse_warc_bytes(open(p, "rb").read())
    assert [r[0] for r in recs] == t.column("url").to_pylist()
    assert [r[1] for r in recs] == t.column("warc_ts").to_pylist()
    assert [r[2] for r in recs] == t.column("html").to_pylist()


def test_deterministic_file_bytes(tmp_path):
    t = _pages_table()
    p1, p2 = str(tmp_path / "1.warc.gz"), str(tmp_path / "2.warc.gz")
    write_warc_pages(t, p1)
    write_warc_pages(t, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_parser_robustness(tmp_path):
    t = _pages_table()
    p = str(tmp_path / "x.warc")
    write_warc_pages(t, p, compress=False)
    raw = open(p, "rb").read()
    # truncate mid-final-record → earlier records survive, no raise
    recs = parse_warc_bytes(raw[: len(raw) - 20])
    assert len(recs) == 2
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"garbage not warc") == []
    # multi-member gzip (Common Crawl's member-per-record layout)
    half = raw.find(b"WARC/1.0", 1)
    multi = gzip.compress(raw[:half], mtime=0) + gzip.compress(raw[half:], mtime=0)
    assert [r[0] for r in parse_warc_bytes(multi)] == t.column("url").to_pylist()


def test_non_response_records_skipped(tmp_path):
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://skip.me/\r\n"
        b"WARC-Date: 2021-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    p = str(tmp_path / "m.warc")
    write_warc_pages(_pages_table(), p, compress=False)
    raw = req + open(p, "rb").read()
    recs = parse_warc_bytes(raw)
    assert [r[0] for r in recs] == _pages_table().column("url").to_pylist()


def test_ingest_parity_parquet_vs_warc(ray_session, fixture_pages, tmp_path):
    """read_parquet→extract and export_warc→read_warc→extract: identical."""
    import ray
    import ray.data

    from metareadability_ray.pipelines.flagship import extraction_chain

    def collect(ds):
        tabs = [t for t in ds.iter_batches(batch_format="pyarrow") if t.num_rows]
        t = pa.concat_tables(tabs, promote_options="permissive")
        t = t.sort_by("url")
        return t.select(["url", "headline", "pubdate", "authors", "text"])

    pq_ds = ray.data.read_parquet(
        fixture_pages["pages"], columns=["url", "warc_ts", "html"]
    )
    paths = export_warc(pq_ds, str(tmp_path / "warcs"))
    assert len(paths) >= 1
    warc_ds = read_warc_pages(paths)
    a = collect(
        extraction_chain(pq_ds, num_partitions=8, concurrency=2, dedup=True)
    )
    b = collect(
        extraction_chain(warc_ds, num_partitions=8, concurrency=2, dedup=True)
    )
    assert a.num_rows == b.num_rows > 0
    assert a.equals(b)
