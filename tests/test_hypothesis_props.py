"""Hypothesis property tests for the pure kernels (no Ray).

SURVEY §5.3 originally substituted seeded-random loops believing hypothesis
was absent; it IS installed (6.123.2), so the load-bearing equivalences get
real property tests with shrinking on top of the existing seeded suites:

* norm_ws: spec equivalence (regex twin), idempotence, NFC stability;
* fastparse vs the stdlib-HTMLParser reference builder: identical trees on
  adversarial tag soup (THE byte-identity-critical differential);
* LCS binary-search vs the O(n·m) DP twin;
* fuzzydate / decode / extract never raise on arbitrary input;
* split_authors output invariants.
"""

from __future__ import annotations

import datetime as dt
import re
import unicodedata

from hypothesis import given, settings, strategies as st

# ----------------------------------------------------------------- norm_ws

_WS_RUN = re.compile(r"\s+")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_norm_ws_matches_regex_spec(s):
    from oracle.textnorm import norm_ws

    want = _WS_RUN.sub(" ", unicodedata.normalize("NFC", s)).strip() if s else ""
    # spec order: NFC then collapse (norm_ws skips NFC for pure-ASCII input,
    # where it is the identity)
    assert norm_ws(s) == want


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_norm_ws_idempotent(s):
    from oracle.textnorm import norm_ws

    once = norm_ws(s)
    assert norm_ws(once) == once


# ------------------------------------------------------ fastparse differential

_SOUP_BITS = st.sampled_from(
    [
        "<div class='a b'>", "</div>", "<p>", "</p>", "<p ", "<h1 id=x>", "</h1>",
        "<a href='u'>", "</a>", "<li>", "</li>", "<br>", "<br/>", "<img src=y>",
        "<script>drop this</script>", "<style>.x{}</style>", "<!--comment-->",
        "<!-- broken", "<!doctype html>", "<?pi data?>", "<![CDATA[z]]>",
        "text", " more ", "&amp;", "&#65;", "&bogus;", "&", "<", ">", "=", "'",
        '"', "<tag attr>", "</", "</>", "<>", "<TAG A=1 a=2>", "\n", "é", " ",
        "<td>", "<tr>", "<option>", "<p class=\"byline\">By A</p>",
    ]
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_SOUP_BITS, min_size=0, max_size=60))
def test_fastparse_tree_equals_reference(bits):
    from oracle.dom import Node, parse_reference
    from oracle.fastparse import parse_fast

    html = "".join(bits)

    def canon(n: Node):
        kids = []
        buf: list[str] = []
        for ch in n.children:
            if isinstance(ch, str):
                buf.append(ch)
            else:
                if buf:
                    kids.append("".join(buf))
                    buf = []
                kids.append(canon(ch))
        if buf:
            kids.append("".join(buf))
        return (n.tag, tuple(sorted(n.attrs.items())), tuple(kids))

    try:
        ref = parse_reference(html)
    except Exception as e:  # reference raises → fast must raise the same class
        try:
            parse_fast(html)
        except Exception as e2:
            assert type(e) is type(e2)
            return
        raise AssertionError(f"reference raised {type(e).__name__}, fast did not")
    fast = parse_fast(html)
    assert canon(ref) == canon(fast)


# --------------------------------------------------------------- LCS twin

_WORDS = st.text(alphabet="ab ", max_size=30)


@settings(max_examples=300, deadline=None)
@given(_WORDS, _WORDS)
def test_lcs_binary_search_equals_dp(a, b):
    from oracle.headline import _lcs_substring_len, _lcs_substring_len_dp

    assert _lcs_substring_len(a, b) == _lcs_substring_len_dp(a, b)


# ----------------------------------------------------------- never raises

@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_fuzzydate_never_raises(s):
    from oracle.fuzzydate import parse_fuzzy_date

    parse_fuzzy_date(s)  # None or a FuzzyDate; must not raise


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_extract_never_raises_on_bytes(data):
    from oracle import extract

    r = extract(data, "https://x.com/2021/01/02/t.html", dt.datetime(2021, 1, 3))
    assert r is not None


# ------------------------------------------------------------ split_authors

@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_split_authors_invariants(s):
    from oracle.byline import split_authors

    out = split_authors(s)
    assert all(p and p == p.strip() for p in out)
    assert len(out) == len(set(out))  # case-sensitive dedupe


# ------------------------------------------- Arrow scalar lib ≡ oracle twin

@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=20))
def test_arrow_norm_ws_matches_duckdb(vals):
    """scalars.norm_ws's documented SQL twin, run on DuckDB itself as the
    oracle. The twin is pure RE2 on both engines — this property originally
    asserted trim()-based twins and hypothesis immediately found two edge
    divergences (\\x1f: Python-whitespace-not-RE2; \\xa0: stripped by
    DuckDB trim, invisible to RE2 \\s), which is why the contract is now
    regex-only."""
    import duckdb
    import pyarrow as pa

    from metareadability_ray.functions.scalars import norm_ws as a_norm

    got = a_norm(pa.array(vals, pa.string())).to_pylist()
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT regexp_replace(regexp_replace(?, '\\s+', ' ', 'g'), '^ | $', '', 'g')",
            [v],
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=12))
def test_arrow_token_count_matches_duckdb(vals):
    """token_count's SQL twin is ``length(regexp_extract_all(s,'\\S+'))`` —
    again RE2 on both engines, DuckDB itself as oracle."""
    import duckdb
    import pyarrow as pa

    from metareadability_ray.functions.scalars import token_count

    got = token_count(pa.array(vals, pa.string())).to_pylist()
    con = duckdb.connect()
    want = [
        con.execute("SELECT length(regexp_extract_all(?, '\\S+'))", [v]).fetchone()[0]
        for v in vals
    ]
    assert got == want


_JSON_INTS = st.dictionaries(
    st.sampled_from(["a", "kk", "x1"]), st.integers(-10**12, 10**12), max_size=3
)


@settings(max_examples=100, deadline=None)
@given(_JSON_INTS)
def test_json_get_int_matches_duckdb(obj):
    import json

    import duckdb
    import pyarrow as pa

    from metareadability_ray.functions.scalars import json_get_int

    s = json.dumps(obj)
    got = json_get_int(pa.array([s], pa.string()), "kk").to_pylist()[0]
    con = duckdb.connect()
    want = con.execute("SELECT CAST(json_extract(?, '$.kk') AS BIGINT)", [s]).fetchone()[0]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=10))
def test_md5_hex_matches_duckdb(vals):
    import duckdb
    import pyarrow as pa

    from metareadability_ray.functions.scalars import md5_hex

    got = md5_hex(pa.array(vals, pa.string())).to_pylist()
    con = duckdb.connect()
    want = [
        None if v is None else con.execute("SELECT md5(?)", [v]).fetchone()[0] for v in vals
    ]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 2000), min_size=1, max_size=60),
    st.sampled_from([0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95]),
)
def test_hist_quantile_cont_matches_duckdb_exactly(vals, q):
    """The histogram quantile fold behind q_length_percentile_filter must be
    bit-identical to DuckDB quantile_cont — repr equality, not tolerance:
    the value is used as a >=/<= band threshold, so a 1-ulp divergence
    could flip a boundary row's membership."""
    import duckdb
    import numpy as np

    from metareadability_ray.pipelines.webtext import hist_quantile_cont

    u, c = np.unique(np.asarray(vals, dtype=np.int64), return_counts=True)
    got = hist_quantile_cont(u, c, q)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(v),) for v in vals])
    want = con.execute("SELECT quantile_cont(v, ?) FROM t", [q]).fetchone()[0]
    con.close()
    assert repr(float(want)) == repr(got), (vals, q, want, got)
