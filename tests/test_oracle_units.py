"""Unit tests for oracle modules: MR-X1 (encoding), MR-X2 (dom), MR-X9
(textnorm), MR-X3/X4/X5/X10 (headline+helpers), MR-X6 (pubdate), MR-X8 (byline)."""

import codecs
import datetime as dt

from oracle import signals
from oracle.byline import extract_authors, split_authors
from oracle.dom import dom_distance, parse
from oracle.encoding import decode_html
from oracle.headline import (
    extract_headline,
    fuzzy_overlap,
    link_density,
    slug_words,
    strip_title_site_suffix,
)
from oracle.pubdate import extract_pubdate, url_path_date
from oracle.textnorm import norm_ws, render_text


# ---------------------------------------------------------------- textnorm
def test_norm_ws():
    assert norm_ws("  a\t\nb  c ") == "a b c"
    assert norm_ws("") == ""
    assert norm_ws(" ") == ""
    # NFC: e + combining acute → é
    assert norm_ws("é") == "é"


def test_render_text_entities_and_joins():
    root = parse("<p>a&amp;b</p><p>c&#233;</p>")
    assert render_text(root) == "a&b cé"


# ---------------------------------------------------------------- encoding
def test_decode_bom():
    assert decode_html(codecs.BOM_UTF8 + "héllo".encode("utf-8")) == ("héllo", False)
    assert decode_html("hi".encode("utf-16"))[0] == "hi"


def test_decode_declared_charset():
    raw = '<meta charset="latin-1"><p>caf\xe9</p>'.encode("latin-1")
    text, fb = decode_html(raw)
    assert "café" in text and fb is False


def test_decode_declared_charset_lies_falls_through():
    # declared utf-8 but invalid utf-8 bytes → latin-1 fallback flagged
    raw = b'<meta charset="utf-8"><p>caf\xe9</p>'
    text, fb = decode_html(raw)
    assert "café" in text and fb is True


def test_decode_utf8_then_latin1_fallback():
    assert decode_html("café".encode("utf-8")) == ("café", False)
    text, fb = decode_html(b"caf\xe9")
    assert text == "café" and fb is True


def test_decode_str_passthrough():
    assert decode_html("abc") == ("abc", False)


# ---------------------------------------------------------------- dom
def test_dom_basics():
    root = parse("<div id=a class='x y'><p>one<p>two</div><script>drop()</script><!-- c -->")
    divs = [n for n in root.iter() if n.tag == "div"]
    assert len(divs) == 1
    assert divs[0].classes == ["x", "y"]
    assert divs[0].class_id == "x y a"
    ps = [n for n in root.iter() if n.tag == "p"]
    assert len(ps) == 2  # <p> auto-closes <p>
    assert render_text(root) == "one two"  # script + comment dropped


def test_dom_void_and_unmatched():
    root = parse("<br><img src=x></span><b>t")
    assert render_text(root) == "t"
    assert [n.tag for n in root.iter()][1:] == ["br", "img", "b"]


def test_dom_distance():
    root = parse("<div><p id=a>x</p><span><b id=b>y</b></span></div>")
    nodes = {n.get("id"): n for n in root.iter() if n.get("id")}
    # a → div → span → b = 3 hops
    assert dom_distance(nodes["a"], nodes["b"]) == 3
    assert dom_distance(nodes["a"], nodes["a"]) == 0


# ---------------------------------------------------------------- headline helpers
def test_fuzzy_overlap():
    assert fuzzy_overlap("abc", "abc") == 1.0
    assert fuzzy_overlap("abc", "xabcx") == 1.0
    assert fuzzy_overlap("", "x") == 0.0
    assert fuzzy_overlap("abcd", "abxy") == 0.5


def test_link_density():
    root = parse("<div>1234<a>5678</a></div>")
    node = next(n for n in root.iter() if n.tag == "div")
    assert link_density(node) == 0.5
    assert link_density(parse("<div></div>")) == 0.0


def test_strip_title_site_suffix():
    assert strip_title_site_suffix("Big Story | Site") == "Big Story"
    assert strip_title_site_suffix("Site — The Bigger Story") == "The Bigger Story"
    assert strip_title_site_suffix("Story :: Site Name Here Longer") == "Site Name Here Longer"
    assert strip_title_site_suffix("Self-titled") == "Self-titled"  # " - " only with spaces
    assert strip_title_site_suffix("") == ""


def test_slug_words():
    assert slug_words("https://x.com/2021/03/04/big-storm_hits.html") == ["big", "storm", "hits"]
    assert slug_words("https://x.com/news/abc") == ["abc"]
    assert slug_words("https://x.com/") == []


def test_headline_prefers_h1_and_title_overlap():
    html = """<title>Big Storm Hits | Bugle</title>
    <h2>Unrelated decoy heading</h2>
    <h1>Big Storm Hits</h1>"""
    text, node = extract_headline(parse(html), "https://x.com/news/big-storm-hits")
    assert text == "Big Storm Hits"
    assert node.tag == "h1"


def test_headline_classid_div():
    html = "<title>T</title><div id='story-head'>A Fine Headline Indeed</div>"
    text, node = extract_headline(parse(html), "https://x.com/a")
    assert text == "A Fine Headline Indeed"


def test_headline_none():
    text, node = extract_headline(parse("<p>no headings at all</p>"), "https://x.com/a")
    assert text == "" and node is None


# ---------------------------------------------------------------- pubdate
def test_url_path_date():
    assert url_path_date("https://x.com/2021/3/4/slug").render() == "2021-03-04"
    assert url_path_date("https://x.com/news/slug") is None
    assert url_path_date("https://x.com/2021/13/4/slug") is None


def test_pubdate_meta_wins_over_body():
    html = """<meta property="article:published_time" content="2021-03-04T10:30:00Z">
    <time datetime="2021-03-05">March 5, 2021</time>"""
    out = extract_pubdate(parse(html), "https://x.com/a", dt.datetime(2021, 3, 7))
    assert out == "2021-03-04T10:30:00+00:00"


def test_pubdate_time_tag_and_hatom():
    html = '<time datetime="2021-03-05">x</time>'
    assert extract_pubdate(parse(html), "u", dt.datetime(2022, 1, 1)) == "2021-03-05"
    html = '<abbr class="published" title="2020-02-02">Feb</abbr>'
    assert extract_pubdate(parse(html), "u", dt.datetime(2022, 1, 1)) == "2020-02-02"
    html = '<span class="date">1st January 2010</span>'
    assert extract_pubdate(parse(html), "u", dt.datetime(2022, 1, 1)) == "2010-01-01"


def test_pubdate_sanity_window():
    html = '<time datetime="1980-01-01">x</time>'
    assert extract_pubdate(parse(html), "u", dt.datetime(2022, 1, 1)) == ""
    html = '<time datetime="2030-01-01">x</time>'
    assert extract_pubdate(parse(html), "u", dt.datetime(2022, 1, 1)) == ""
    # within warc_ts + 2 days is fine
    html = '<time datetime="2022-01-02">x</time>'
    assert extract_pubdate(parse(html), "u", dt.datetime(2022, 1, 1)) == "2022-01-02"


def test_pubdate_url_beats_classid():
    html = '<span class="date">1st January 2010</span>'
    out = extract_pubdate(parse(html), "https://x.com/2011/05/06/a", dt.datetime(2022, 1, 1))
    assert out == "2011-05-06"


def test_pubdate_none():
    assert extract_pubdate(parse("<p>hi</p>"), "u", dt.datetime(2022, 1, 1)) == ""


# ---------------------------------------------------------------- byline
def test_split_authors():
    assert split_authors("By Jane Doe and John Q. Smith, Editor") == ["Jane Doe", "John Q. Smith"]
    assert split_authors("by A, B & C | D") == ["A", "B", "C", "D"]
    assert split_authors("By Staff") == []
    assert split_authors("Jane Doe, Jane Doe") == ["Jane Doe"]


def test_authors_classid():
    html = '<h1 id=h>Head Line Here</h1><p class="byline">By Jane Doe</p>'
    root = parse(html)
    hl = next(n for n in root.iter() if n.tag == "h1")
    assert extract_authors(root, hl) == ["Jane Doe"]


def test_authors_rel_and_hcard():
    root = parse('<a rel="author">Jane Doe</a>')
    assert extract_authors(root, None) == ["Jane Doe"]
    root = parse('<div class="vcard"><span class="fn">Bob Roe</span></div>')
    assert extract_authors(root, None) == ["Bob Roe"]


def test_authors_decoy_rejected():
    root = parse('<p class="byline">Posted in Sports | 5 min read</p>')
    assert extract_authors(root, None) == []


def test_authors_none():
    assert extract_authors(parse("<p>plain text</p>"), None) == []


def test_authors_bare_by_prefix():
    root = parse("<p>By Carol Jones</p>")
    assert extract_authors(root, None) == ["Carol Jones"]
