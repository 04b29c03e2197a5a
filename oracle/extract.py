"""Per-document extraction orchestrator (MR-X0) — the fused kernel.

Order (pinned, mirrors the reference capability described in BASELINE.json:
decode → parse+pre-clean → headline (winner node kept) → pubdate → authors
(uses headline-winner proximity)):

  1. MR-X1 decode (oracle.encoding) — never raises.
  2. MR-X2 parse + pre-clean (oracle.dom) — a raised parse exception or an
     oversize document (> MAX_HTML_BYTES) yields the all-empty result with the
     corresponding metric flag.
  3. MR-X3 headline, 4. MR-X6 pubdate, 5. MR-X8 authors.

This function is the single shared kernel: the Ray engine's ExtractActor calls
exactly this per row, so engine-vs-oracle byte-identity holds by construction
and the pytest parity suite (tests/test_parity.py) enforces it end-to-end.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from oracle import signals
from oracle.byline import extract_authors
from oracle.content import extract_main_text
from oracle.dom import parse, subtree_stats
from oracle.encoding import decode_html
from oracle.headline import extract_headline
from oracle.pubdate import extract_pubdate


@dataclass
class ExtractResult:
    headline: str = ""
    pubdate: str = ""        # canonical ISO rendering (A.5), "" if none
    authors: list[str] = field(default_factory=list)
    text: str = ""           # A.6 boilerplate-stripped main text, "" if none
    parse_err: bool = False
    enc_fallback: bool = False
    oversize: bool = False


def extract(html: bytes | str | None, url: str, warc_ts: _dt.datetime | None = None) -> ExtractResult:
    """Extract (headline, pubdate, authors) from one page. Never raises."""
    if html is None or len(html) == 0:
        return ExtractResult(parse_err=True)
    if isinstance(html, (bytes, bytearray)) and len(html) > signals.MAX_HTML_BYTES:
        return ExtractResult(oversize=True)

    text, enc_fallback = decode_html(bytes(html) if isinstance(html, bytearray) else html)
    try:
        root = parse(text)
    except Exception:
        return ExtractResult(parse_err=True, enc_fallback=enc_fallback)

    headline, hl_node = extract_headline(root, url)
    pubdate = extract_pubdate(root, url, warc_ts)
    # one shared bottom-up tree scan feeds both the byline prefilter and the
    # content length/link-density cuts (they used to walk separately)
    stats = subtree_stats(root)
    authors = extract_authors(root, hl_node, stats=stats)
    main_text = extract_main_text(root, stats=stats)
    return ExtractResult(
        headline=headline,
        pubdate=pubdate,
        authors=authors,
        text=main_text,
        enc_fallback=enc_fallback,
    )
