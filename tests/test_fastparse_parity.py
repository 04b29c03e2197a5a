"""Differential parity: fastparse.parse_fast vs the HTMLParser reference
builder. The fast path may only ship while these pass — identical trees
(modulo text-chunk boundaries) and identical extraction output over
fixtures, adversarial constructs, and seeded fuzz soup."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from oracle.dom import Node, parse_reference
from oracle.fastparse import parse_fast


def canon(node: Node):
    """(tag, attrs, children) with adjacent text chunks merged — chunk
    boundaries are the one permitted representation difference."""
    kids = []
    buf = []
    for ch in node.children:
        if isinstance(ch, str):
            buf.append(ch)
        else:
            if buf:
                kids.append("".join(buf))
                buf = []
            kids.append(canon(ch))
    if buf:
        kids.append("".join(buf))
    return (node.tag, dict(node.attrs), kids)


def both(text: str):
    try:
        a = canon(parse_reference(text))
        a_err = None
    except Exception as e:  # noqa: BLE001 - parity includes raising behavior
        a, a_err = None, type(e).__name__
    try:
        b = canon(parse_fast(text))
        b_err = None
    except Exception as e:  # noqa: BLE001
        b, b_err = None, type(e).__name__
    return (a, a_err), (b, b_err)


def assert_parity(text: str):
    (a, a_err), (b, b_err) = both(text)
    assert a_err == b_err, f"raise mismatch {a_err} vs {b_err} on {text[:120]!r}"
    assert a == b, f"tree mismatch on {text[:200]!r}"


ADVERSARIAL = [
    "",
    "plain text only",
    "<p>a<p>b<p>c",
    "<ul><li>1<li>2</ul>",
    "<div class=x id=y data-a='1' data-a='2'>t</div>",
    "<a href='x' href=\"y\">dup</a>",
    "<br><br/><img src=x><input value='v'>",
    "<script>var a = '<div>not a tag</div>';</script><p>after</p>",
    "<style>p { content: '</span>'; }</style>ok",
    "<SCRIPT>x</SCRIPT><p>case</p>",
    "<script>unclosed rest is swallowed <p>gone",
    "<!-- comment --><p>a</p><!-- unterminated",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<!doctype html public 'x'><p>y</p>",
    "<?php echo 1 ?><p>pi</p>",
    "<?pi-unterminated",
    "<![CDATA[ raw <b>stuff</b> ]]><p>after</p>",
    "<![IF gte mso 9]>ms<![endif]><p>z</p>",
    "<![CDATA[ unterminated",
    "<!bogus comment><p>w</p>",
    "<!bogus unterminated",
    "</>" "<p>ok</p>",
    "</ >x",
    "</div extra='1'>y",
    "</nomatch><p>k</p>",
    "a < b and c > d",
    "x<",
    "5 &lt; 6 &amp;&amp; 7 &gt;&gt; 1 &unknown; &#65; &#x42; &#99",
    "<p title='5 &lt; 6 &amp; &#65;'>attr entities</p>",
    "<a b=c d e='f' g=\"h\" i>bare</a>",
    "<a/b>slashname</a>",
    "<a foo='1'/x>tail</a>",
    "<div 'quoted'>malformed</div>",
    "<div", "<div ", "<div a", "<div a=", "<div a='x", "<div a='x'",
    "</div", "<!--", "<!", "<![", "<![CD", "<?",
    "<p>deep" + "<span>" * 120 + "x" + "</span>" * 120 + "</p>",
    "<td>implied<tr><td>table bits</td></tr>",
    "\x00nul<p a='\x00'>byte</p>",
    "<p>é café — &eacute;</p>",
    "<option>1<option>2<tr>r<tr>s",
    "< p>not a tag</ p>",
    "<1invalid>num</1invalid>",
    "text &am", "text &amp", "tail &",
]


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_adversarial_parity(idx):
    assert_parity(ADVERSARIAL[idx])


def test_fixture_corpus_parity(fixture_pages):
    import pyarrow.parquet as pq

    from oracle.encoding import decode_html

    t = pq.read_table(fixture_pages["pages"], columns=["html"])
    for blob in t.column("html").to_pylist():
        text, _ = decode_html(blob)
        assert_parity(text)


def test_fuzz_soup_parity():
    rng = random.Random(1234)
    atoms = [
        "<div>", "</div>", "<p ", "class='", '"', "'", ">", "<", "&", "&amp;",
        "&#6", "x", " ", "<script>", "</script>", "<!--", "-->", "<!", "<![",
        "]]>", "=", "/", "/>", "<br>", "text ", "<a href=", "<?", "\n", "\t",
        "<li>", "<td>", "é", "&#x41;", "<P CLASS=Y>", "</p>", "<![if x]>",
    ]
    for _ in range(400):
        text = "".join(rng.choice(atoms) for _ in range(rng.randrange(1, 60)))
        assert_parity(text)


def test_extract_level_parity(fixture_pages, monkeypatch):
    """Full extractor over the fixture corpus through both parsers."""
    import importlib

    import pyarrow.parquet as pq

    ex = importlib.import_module("oracle.extract")

    t = pq.read_table(fixture_pages["pages"])
    rows = list(
        zip(
            t.column("url").to_pylist(),
            t.column("html").to_pylist(),
            t.column("warc_ts").to_pylist(),
        )
    )
    monkeypatch.setattr(ex, "parse", parse_reference)
    ref = [ex.extract(h, u, ts) for u, h, ts in rows]
    monkeypatch.setattr(ex, "parse", parse_fast)
    fast = [ex.extract(h, u, ts) for u, h, ts in rows]
    assert ref == fast


def test_lcs_binary_search_equals_dp():
    import random as _r

    from oracle.headline import _lcs_substring_len, _lcs_substring_len_dp

    rng = _r.Random(7)
    for _ in range(500):
        a = "".join(rng.choice("abcd ") for _ in range(rng.randrange(0, 40)))
        b = "".join(rng.choice("abcd ") for _ in range(rng.randrange(0, 40)))
        assert _lcs_substring_len(a, b) == _lcs_substring_len_dp(a, b), (a, b)
