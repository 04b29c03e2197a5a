"""Text normalization — the byte-identity kernel (SURVEY.md Appendix A.1, MR-X9).

Normative rules (pinned; shared verbatim by oracle and engine):
  * Unicode NFC normalization.
  * All whitespace runs (including NBSP \\u00a0, which Python's ``\\s`` matches
    in unicode mode) collapse to a single ASCII space; ends stripped.
  * ``render_text`` concatenates descendant text nodes in document order with
    a single space joint between adjacent text nodes, then applies ``norm_ws``.
    HTML entities were already resolved at parse time (dom.py uses
    ``convert_charrefs=True``).
  * Missing-value renderings: headline ``""``, pubdate ``""``, authors ``[]``.
"""

from __future__ import annotations

import re
import unicodedata

_WS_RUN = re.compile(r"\s+")


def norm_ws(s: str) -> str:
    """NFC-normalize and collapse every whitespace run to one ASCII space.

    Implementation note: ``" ".join(s.split())`` is byte-identical to
    ``_WS_RUN.sub(" ", s).strip()`` (verified exhaustively over the BMP —
    str.split's whitespace set equals re's unicode ``\\s`` here) and ~5×
    faster; NFC is skipped for pure-ASCII input (identity there), which is
    the hot path for English news text.
    """
    if not s:
        return ""
    if not s.isascii():
        s = unicodedata.normalize("NFC", s)
    return " ".join(s.split())


def render_text(node) -> str:
    """Visible text of a DOM node: descendant text in document order, normalized.

    ``node`` is an ``oracle.dom.Node``. Text chunks are joined with a single
    space so that ``<p>a</p><p>b</p>`` renders ``"a b"`` — the joint collapses
    with surrounding whitespace under ``norm_ws``.
    """
    parts: list[str] = []
    node.collect_text(parts)
    return norm_ws(" ".join(parts))
