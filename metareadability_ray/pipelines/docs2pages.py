"""Deterministic `documents` → `pages` adapter (MR-S4 corpus reader).

The driver testdata has no `pages` table (TESTDATA.md), but the flagship
pipeline's input contract is the Common-Crawl-style schema
``(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint). This adapter
synthesises that table **deterministically from the `documents` table**: each
output row is a pure function of its ``doc_id`` (per-row ``random.Random(
doc_id)``), so the mapping is reproducible across runs, processes, block
orders, and CPU counts — no global RNG state, fully parallel-safe.

Scale note: this is an ordinary stateless ``map_batches`` stage, so at 100 TB
it streams — pages are synthesised block-by-block and never materialised.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa

import ray.data

_FIRST = "Jane John Ana Bo Carol David Emma Frank Grace Hugo Iris Jack".split()
_LAST = "Doe Smith Torres Li Jones Brown Rossi Novak Kim Patel Silva Olson".split()
_SITES = ["The Daily Bugle", "Morning Post", "City Herald"]

_EPOCH = dt.datetime(2015, 1, 1)
_SPAN_S = int((dt.datetime(2025, 1, 1) - _EPOCH).total_seconds())


def _page_for_doc(doc_id: int | None, text: str, lang: str, source: str):
    """Pure function of (doc_id, text, lang, source) → one pages row.

    A null doc_id must NOT fall through to ``random.Random(None)`` (OS
    entropy — that would silently break the determinism contract, r4
    ADVICE): anonymous docs seed from their content instead, so the page
    is still a pure function of the row. ``random.Random(str)`` seeds via
    sha512, deterministic across processes (no PYTHONHASHSEED exposure).
    Their url tail is ``-None.html`` — downstream id-recovery stages
    (linkgraph.enrich_links) guard the parse."""
    rng = random.Random(
        doc_id if doc_id is not None else "anon:%s:%s:%s" % (text, lang, source)
    )
    words = text.split()[:6] or ["untitled"]
    headline = " ".join(w.capitalize() for w in words)
    slug = "-".join(w.lower() for w in words)[:60]
    author = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
    pub = (_EPOCH + dt.timedelta(seconds=rng.randrange(_SPAN_S))).replace(microsecond=0)
    iso = pub.strftime("%Y-%m-%dT%H:%M:%S") + "Z"
    site = rng.choice(_SITES)
    host = f"{source}.example.org"
    url = f"https://{host}/{pub.year}/{pub.month:02d}/{pub.day:02d}/{slug}-{doc_id}.html"

    style = rng.randrange(3)
    if style == 0:
        hl, date_html = f"<h1>{headline}</h1>", f'<meta property="article:published_time" content="{iso}">'
    elif style == 1:
        hl, date_html = f'<h1 class="entry-title">{headline}</h1>', f'<time datetime="{iso}">today</time>'
    else:
        hl, date_html = f'<h2 class="headline">{headline}</h2>', f'<span class="date">{pub.strftime("%Y-%m-%d")}</span>'

    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{headline} | {site}</title>"
        f"{date_html if date_html.startswith('<meta') else ''}"
        "</head><body>"
        f"{hl}<p class=\"byline\">By {author}</p>"
        f"{date_html if not date_html.startswith('<meta') else ''}"
        f"<p>{text}</p>"
        "<footer><a href='/a'>About</a></footer></body></html>"
    ).encode("utf-8")

    warc_ts = (pub + dt.timedelta(days=1 + rng.randrange(365))).replace(microsecond=0)
    return url, warc_ts, html

def docs_to_pages_batch(batch: pa.Table) -> pa.Table:
    """Stateless vector stage: one pages row per documents row."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    urls, tss, htmls = [], [], []
    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        url, ts, html = _page_for_doc(doc_id, text or "", lang, source)
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_dataset(sf_dir: str) -> "ray.data.Dataset":
    """`pages` Dataset derived deterministically from ``{sf_dir}/documents.parquet``."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    return ds.map_batches(docs_to_pages_batch, batch_format="pyarrow", zero_copy_batch=True)
