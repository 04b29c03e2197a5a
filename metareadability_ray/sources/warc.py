"""WARC (ISO 28500 / Common Crawl) source and sink for the pages table.

Common Crawl ships crawls as segments of ~1 GB ``*.warc.gz`` files — tens of
thousands per crawl — so the natural Ray Data ingest unit is ONE FILE PER
BLOCK: ``read_warc_pages`` uses ``ray.data.read_binary_files`` (each file's
bytes become one row, read in parallel tasks) followed by a ``map_batches``
parser that explodes every file into its (url, warc_ts, html) response
records. Parallelism and backpressure come from the file count, exactly how
a 256-node cluster would stream a 100k-file crawl; no file is ever held by
the driver.

The parser is a strict sequential reader of the record grammar::

    WARC/1.0\r\n  <headers>  \r\n\r\n  <Content-Length bytes>  \r\n\r\n

It keeps ``WARC-Type: response`` records, strips the embedded HTTP/1.1
response head (everything through the first CRLFCRLF of the content block
when the record's Content-Type is ``application/http``), and tolerates
truncated tails (a cut-off final record is dropped, not raised — crawl
files in the wild end mid-record). Gzip members are detected by magic bytes
per file, so plain ``.warc`` and ``.warc.gz`` both work; Common Crawl's
member-per-record gzip concatenation decompresses transparently because
``gzip.decompress`` handles multi-member streams.

``write_warc_pages`` is the deterministic inverse (used by tests and by
interop exports): record ids derive from the url's md5 — no uuid/clock
randomness — so page-table → WARC → page-table roundtrips byte-identically
and re-runs produce identical files.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import os

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def parse_warc_bytes(data: bytes) -> list[tuple[str, dt.datetime, bytes]]:
    """All (url, warc_ts, html) response records of one WARC file's bytes."""
    if data[:2] == _GZ_MAGIC:
        data = gzip.decompress(data)
    out: list[tuple[str, dt.datetime, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break  # truncated header block → drop the tail
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break  # lost sync — stop rather than emit garbage
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            break
        content_start = head_end + len(_CRLF2)
        content_end = content_start + clen
        if content_end > n:
            break  # truncated final record
        if fields.get("warc-type") == "response":
            url = fields.get("warc-target-uri", "")
            ts = _parse_warc_date(fields.get("warc-date", ""))
            content = data[content_start:content_end]
            if fields.get("content-type", "").startswith("application/http"):
                http_end = content.find(_CRLF2)
                content = content[http_end + len(_CRLF2) :] if http_end >= 0 else b""
            if url:
                out.append((url, ts, content))
        pos = content_end
    return out


def _parse_warc_date(s: str) -> dt.datetime:
    try:
        return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return dt.datetime(1970, 1, 1)


_PAGES_SCHEMA = pa.schema(
    [("url", pa.string()), ("warc_ts", pa.timestamp("us")), ("html", pa.binary())]
)


def _explode_warc_files(batch: pa.Table) -> pa.Table:
    urls: list[str] = []
    tss: list[dt.datetime] = []
    htmls: list[bytes] = []
    for blob in batch.column("bytes").to_pylist():
        for url, ts, html in parse_warc_bytes(blob):
            urls.append(url)
            tss.append(ts)
            htmls.append(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def read_warc_pages(paths: list[str] | str) -> "ray.data.Dataset":
    """WARC file set → pages Dataset with the flagship's input schema
    (url:string, warc_ts:timestamp[us], html:binary — BASELINE input_hint).

    Feed the result straight into ``flagship.extraction_chain``: the two
    ingest paths (Parquet pages table / raw crawl WARCs) are interchangeable
    and parity-tested byte-identical in ``tests/test_warc_source.py``."""
    import ray.data

    ds = ray.data.read_binary_files(paths, file_extensions=["warc", "gz"])
    return ds.map_batches(
        _explode_warc_files,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1,  # one ~1 GB crawl file is already a full block's work
    )


def write_warc_pages(
    table: pa.Table, path: str, *, compress: bool = True
) -> str:
    """One pages-schema Arrow table → one deterministic ``.warc[.gz]`` file.

    Record-ID is md5(url) (stable across runs); records are written in table
    order. Used per-shard inside a Ray task by ``export_warc`` so each output
    file is produced exactly once by exactly one worker."""
    chunks: list[bytes] = []
    for url, ts, html in zip(
        table.column("url").to_pylist(),
        table.column("warc_ts").to_pylist(),
        table.column("html").to_pylist(),
    ):
        body = html if isinstance(html, (bytes, bytearray)) else str(html or "").encode()
        http_head = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        )
        content = http_head + body
        rid = hashlib.md5(url.encode("utf-8", "replace")).hexdigest()
        ts = ts or dt.datetime(1970, 1, 1)
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">\r\n"
            b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
            b"WARC-Target-URI: " + url.encode("utf-8", "replace") + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(content)).encode() + b"\r\n\r\n"
        )
        chunks.append(head + content + _CRLF2)
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob, mtime=0)  # mtime=0 → byte-stable output
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic, resume-safe
    return path


def export_warc(pages: "ray.data.Dataset", out_dir: str, *, compress: bool = True) -> list[str]:
    """Pages Dataset → one WARC file per block, written inside the mapper
    tasks (the driver never sees page bytes). Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.gz" if compress else "warc"

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
        first = hashlib.md5(str(batch.column("url")[0].as_py()).encode()).hexdigest()[:12]
        p = os.path.join(out_dir, f"part-{first}.{ext}")
        write_warc_pages(batch, p, compress=compress)
        return pa.table({"path": pa.array([p]), "rows": pa.array([batch.num_rows], pa.int64())})

    manifest = pages.map_batches(
        write_block, batch_format="pyarrow", zero_copy_batch=True
    )
    return sorted(p for b in manifest.iter_batches(batch_format="pyarrow") for p in b.column("path").to_pylist())
