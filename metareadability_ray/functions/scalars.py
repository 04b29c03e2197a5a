"""Vectorized scalar-function library (§2.8): Arrow-kernel implementations
of the per-value helpers the pipelines share. Every function here maps an
Arrow array → Arrow array with NO Python per-row loop unless explicitly
documented otherwise, so callers can drop them straight into a
``map_batches`` hot path.

The per-row DOM/date heuristics stay in ``oracle/`` (they are the pinned
byte-parity kernels); this module is the batch-level complement: cheap
column transforms a query composes around the oracle kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "stable_hash64",
    "md5_hex",
    "re2_tokens",
    "norm_ws",
    "token_count",
    "json_get_int",
    "url_host",
    "url_path",
    "url_slug",
    "url_date",
]


def stable_hash64(strings: np.ndarray) -> np.ndarray:
    """Deterministic (cross-process, unsalted) 64-bit hash of a string
    ndarray — pandas' fixed-key siphash, vectorized.

    Returned as an int64 VIEW (not uint64): Ray Data's sort-groupby keeps
    int64 keys zero-copy Arrow, but uint64 values above 2**63 fall back to
    pickled Python objects and break block concat (Ray 2.49)."""
    import pandas as pd

    return pd.util.hash_array(strings, categorize=False).view(np.int64)


import re as _re

# RE2 (= DuckDB regexp / pyarrow compute) "\S" is exactly [^\t\n\f\r ]:
# NO \x0b (vertical tab) and NO Unicode whitespace (\xa0,  , ...),
# unlike Python str.split() / re-module \s. Every tokenizer that twins a
# SQL regexp_extract_all(text, '\S+') oracle must use this class, verified
# char-by-char against DuckDB in tests/test_scalars_properties.py.
_RE2_TOKEN = _re.compile(r"[^\t\n\x0c\r ]+")


def re2_tokens(t: str | None) -> list[str]:
    """Tokenize exactly like RE2 ``\\S+`` (the DuckDB / pyarrow regex
    engine) — the cross-engine token stream every shingle/bigram/chunk
    oracle twin depends on. None/empty → []."""
    return _RE2_TOKEN.findall(t) if t else []


def md5_hex(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Content md5 as hex. Per-row ``hashlib`` (no Arrow md5 kernel exists);
    nulls propagate as null (SQL ``md5(NULL)`` semantics). Use for content
    fingerprints, not hot inner loops."""
    import hashlib

    out = [
        None
        if v is None
        else hashlib.md5(v if isinstance(v, bytes) else str(v).encode()).hexdigest()
        for v in arr.to_pylist()
    ]
    return pa.array(out, pa.string())


def norm_ws(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Collapse whitespace runs to single spaces and trim — the exact SQL
    twin of::

        regexp_replace(regexp_replace(s, '\\s+', ' ', 'g'), '^ | $', '', 'g')

    Both steps are RE2 on both engines, so equality holds for EVERY input
    (property-tested against DuckDB itself in
    tests/test_hypothesis_props.py). The earlier ``trim(...)``-based twin
    was NOT exact — hypothesis found two divergences in edge whitespace:
    Arrow's ``utf8_trim_whitespace`` strips \\x0b/\\x1c–\\x1f (unicode
    whitespace that RE2 ``\\s`` doesn't match), and DuckDB's ``trim`` strips
    U+00A0 (Unicode Zs) — pure-RE2 trimming sidesteps both engines'
    bespoke trim character sets."""
    s = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.replace_substring_regex(s, pattern=r"^ | $", replacement="")


def token_count(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace-token count per value (int64); null → null."""
    return pc.cast(pc.count_substring_regex(arr, pattern=r"\S+"), pa.int64())


def json_get_int(arr: pa.Array | pa.ChunkedArray, key: str) -> pa.Array:
    """Integer field of a flat JSON object column, vectorized via
    ``pc.extract_regex`` (no per-row ``json.loads``). Missing key → null.
    Valid for the flat ``{"k": 1, ...}`` objects the events table carries;
    nested objects need a real parser."""
    import re

    pat = '"' + re.escape(key) + r'":\s*(?P<v>-?\d+)'
    m = pc.extract_regex(arr, pat)
    return pc.cast(pc.struct_field(m, "v"), pa.int64())


def url_host(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Hostname of a URL column (scheme and port stripped); no match → null."""
    m = pc.extract_regex(arr, r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/:?#]+)")
    return pc.struct_field(m, "h")


def url_path(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Path component (leading slash kept, query/fragment stripped)."""
    m = pc.extract_regex(arr, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(?P<p>/[^?#]*)")
    return pc.fill_null(pc.struct_field(m, "p"), "/")


def url_slug(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Last non-empty path segment, file extension stripped — the vectorized
    twin of the oracle's per-row slug helper (oracle/headline.py)."""
    m = pc.extract_regex(arr, r"/(?P<s>[^/?#]+?)(?:\.[A-Za-z0-9]{1,5})?/?(?:[?#].*)?$")
    return pc.struct_field(m, "s")


def url_date(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """(y, m, d) struct from a /YYYY/MM/DD/ url path (the news-site date
    slug the oracle's pubdate scorer uses as a signal); no match → null."""
    return pc.extract_regex(
        arr, r"/(?P<y>19\d{2}|20\d{2})/(?P<m>\d{1,2})/(?P<d>\d{1,2})(?:/|$)"
    )
