"""Url-hash partitioning + in-partition exact dedup (MR-D1, MR-P4).

Partition key (pinned): ``crc32(url_utf8) % num_partitions`` — stable across
Python versions/processes (unlike ``hash()``), cheap (zlib C speed), and
key-uniform even when the host distribution is Zipf-skewed: partitioning by
url-hash (never by host) is the explicit skew defense mandated by
BASELINE.json ("explicit repartitioning by url-hash to defeat host-domain
skew").

Dedup rule (pinned, deterministic under nondeterministic block order):
one output row per url — keep the row with the LATEST ``warc_ts``; ties break
to the lexicographically smallest ``md5(html)``. Duplicates of a url always
share a partition (same hash), so dedup is local to the partition group — the
url-hash shuffle is the ONLY time full html bytes move.
"""

from __future__ import annotations

import hashlib
import zlib

import pyarrow as pa
import pyarrow.compute as pc


def assign_partition(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Append ``partition_id = crc32(url) % P`` (int32).

    The per-url loop is a bare C call (zlib.crc32 on the Arrow-decoded bytes;
    no per-row .encode) — ~0.2 µs/url, noise next to the extract kernel.
    A table-driven numpy crc32 over variable-length strings would not pay
    for its complexity here.
    """
    import numpy as np

    urls = pc.cast(batch.column("url"), pa.binary()).to_pylist()
    crc = zlib.crc32
    pids = np.fromiter((crc(u) for u in urls), dtype=np.uint32, count=len(urls))
    pids = (pids % np.uint32(num_partitions)).astype(np.int32)
    if "partition_id" in batch.column_names:
        batch = batch.drop_columns(["partition_id"])
    return batch.append_column("partition_id", pa.array(pids, pa.int32()))


def dedup_extracted(group: pa.Table) -> pa.Table:
    """Exact url dedup AFTER extraction (MR-D1), on small extracted rows.

    Scale rationale: extraction is pure per-row, so extracting duplicates
    (~2% extra compute) and deduping the small (url + 3 short strings)
    output is far cheaper than shuffling raw ``html`` payload bytes to
    co-locate duplicates first — the binary column never crosses the wire.
    Winner rule unchanged: latest ``warc_ts``, tie → smallest ``html_md5``
    (computed from the raw bytes inside the extract actor).
    """
    idx = pc.sort_indices(
        group,
        sort_keys=[("url", "ascending"), ("warc_ts", "descending"), ("html_md5", "ascending")],
    )
    g = group.take(idx)
    if g.num_rows <= 1:
        return g
    urls = g.column("url")
    first_of_run = pc.not_equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    mask = pa.chunked_array([pa.array([True]), first_of_run.combine_chunks()])
    return g.filter(mask)


def dedup_partition(group: pa.Table) -> pa.Table:
    """Exact url dedup within one partition group (MR-D1).

    Sort (url asc, warc_ts desc, md5(html) asc) then keep the first row of
    each url run. Arrow-vectorized except the md5 pass (C-speed hashlib).
    """
    if group.num_rows <= 1:
        return group.drop_columns(["__md5"]) if "__md5" in group.column_names else group
    md5s = [
        hashlib.md5(v if v is not None else b"").hexdigest()
        for v in group.column("html").to_pylist()
    ]
    g = group.append_column("__md5", pa.array(md5s, pa.string()))
    idx = pc.sort_indices(
        g,
        sort_keys=[("url", "ascending"), ("warc_ts", "descending"), ("__md5", "ascending")],
    )
    g = g.take(idx)
    urls = g.column("url")
    first_of_run = pc.not_equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    mask = pa.chunked_array([pa.array([True]), first_of_run.combine_chunks()])
    return g.filter(mask).drop_columns(["__md5"])
