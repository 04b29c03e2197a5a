"""MR-X0 as a Ray Data stage: the stateful extraction actor pool.

``ExtractActor`` is a callable CLASS for ``ds.map_batches(ExtractActor,
batch_format="pyarrow", zero_copy_batch=True, concurrency=(min,max))``:
importing the oracle in ``__init__`` compiles every signal-table regex ONCE
per actor process (BASELINE.json: "actor pool holding precompiled regex
tables"); ``__call__`` runs the fused per-document kernel over each Arrow
batch. The kernel itself is the vendored oracle (``oracle.extract``), so
engine output is byte-identical to the oracle by construction.

Per-document DOM heuristics are irreducibly per-row Python (as in the
reference); everything around the kernel — the batch columns, the output
assembly, filtering, partitioning — stays Arrow-vectorized. Batches should be
small (64–256 rows) because ``html`` rows are 10–500 KiB.
"""

from __future__ import annotations

import pyarrow as pa

OUTPUT_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html_md5", pa.string()),  # dedup tie-break key (MR-D1) — html itself never shuffles
        ("headline", pa.string()),
        ("pubdate", pa.string()),
        ("authors", pa.list_(pa.string())),
        ("text", pa.string()),  # A.6 boilerplate-stripped main text
        ("parse_err", pa.int8()),
        ("enc_fallback", pa.int8()),
        ("oversize", pa.int8()),
        ("bytes_in", pa.int64()),
    ]
)


class ExtractActor:
    """Stateful per-actor extraction stage (MR-X0 + MR-A1/A2/A3)."""

    def __init__(self) -> None:
        # Importing oracle compiles the full signal/regex bank once per actor.
        from oracle import SIGNALS_VERSION, extract

        self._extract = extract
        self.signals_version = SIGNALS_VERSION
        self.docs_seen = 0  # MR-A3 per-actor counter (diagnostics)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        has_pid = "partition_id" in batch.column_names
        pids = batch.column("partition_id").to_pylist() if has_pid else [0] * len(urls)

        n = len(urls)
        heads: list[str] = [""] * n
        dates: list[str] = [""] * n
        auths: list[list[str]] = [[] for _ in range(n)]
        texts: list[str] = [""] * n
        md5s: list[str] = [""] * n
        perr = [0] * n
        efb = [0] * n
        ovs = [0] * n
        nbytes = [0] * n

        ex = self._extract
        for i in range(n):
            html = htmls[i]
            nbytes[i] = len(html) if html is not None else 0
            md5s[i] = hashlib.md5(html if html is not None else b"").hexdigest()
            r = ex(html, urls[i], tss[i])
            heads[i] = r.headline
            dates[i] = r.pubdate
            auths[i] = r.authors
            texts[i] = r.text
            perr[i] = 1 if r.parse_err else 0
            efb[i] = 1 if r.enc_fallback else 0
            ovs[i] = 1 if r.oversize else 0
        self.docs_seen += n

        return pa.table(
            {
                "partition_id": pa.array(pids, pa.int32()),
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html_md5": pa.array(md5s, pa.string()),
                "headline": pa.array(heads, pa.string()),
                "pubdate": pa.array(dates, pa.string()),
                "authors": pa.array(auths, pa.list_(pa.string())),
                "text": pa.array(texts, pa.string()),
                "parse_err": pa.array(perr, pa.int8()),
                "enc_fallback": pa.array(efb, pa.int8()),
                "oversize": pa.array(ovs, pa.int8()),
                "bytes_in": pa.array(nbytes, pa.int64()),
            },
            schema=OUTPUT_SCHEMA,
        )
