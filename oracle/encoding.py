"""Encoding sniff + decode (MR-X1, SURVEY.md §2.2) — never raises.

Pinned resolution order:
  1. BOM (UTF-8-sig, UTF-16 LE/BE).
  2. Declared charset in the first 2048 bytes: ``<meta charset=...>``,
     ``<meta http-equiv=content-type content="...charset=...">`` or an XML
     declaration ``encoding=...``.
  3. Strict UTF-8 attempt.
  4. Fallback latin-1 (decodes any byte string; flagged ``enc_fallback``).

Returns ``(text, enc_fallback)`` where ``enc_fallback`` is True when neither
a BOM, a valid declared charset, nor strict UTF-8 applied.
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.IGNORECASE)
_XML_DECL = re.compile(rb"""<\?xml[^>]+encoding\s*=\s*["']([A-Za-z0-9_\-]+)["']""", re.IGNORECASE)

_SNIFF_WINDOW = 2048


def _lookup(name: str):
    try:
        return codecs.lookup(name)
    except LookupError:
        return None


def decode_html(raw: bytes | str) -> tuple[str, bool]:
    """Decode raw page bytes to text. Never raises."""
    if isinstance(raw, str):
        return raw, False
    if raw.startswith(codecs.BOM_UTF8):
        return raw[len(codecs.BOM_UTF8):].decode("utf-8", "replace"), False
    if raw.startswith(codecs.BOM_UTF16_LE) or raw.startswith(codecs.BOM_UTF16_BE):
        return raw.decode("utf-16", "replace"), False

    head = raw[:_SNIFF_WINDOW]
    m = _META_CHARSET.search(head) or _XML_DECL.search(head)
    if m:
        codec = _lookup(m.group(1).decode("ascii", "replace"))
        if codec is not None:
            try:
                return raw.decode(codec.name, "strict"), False
            except (UnicodeDecodeError, ValueError):
                pass  # declared charset lied → continue sniffing

    try:
        return raw.decode("utf-8", "strict"), False
    except UnicodeDecodeError:
        return raw.decode("latin-1", "replace"), True
