"""Unit tests for A.6 main-content extraction (oracle/content.py, MR-X11)."""

from oracle.content import extract_main_text
from oracle.dom import parse


def _t(html: str) -> str:
    return extract_main_text(parse(html))


LONG_A = "Alpha paragraph with enough characters to pass the unit filter."
LONG_B = "Beta paragraph with enough characters to pass the unit filter too."
LONG_C = "Gamma paragraph long enough for acceptance in every layout case."


def test_flat_paragraphs_in_body():
    assert _t(f"<body><p>{LONG_A}</p><p>{LONG_B}</p></body>") == f"{LONG_A}\n{LONG_B}"


def test_container_div_beats_sidebar():
    html = (
        f'<body><div class="article-body"><p>{LONG_A}</p><p>{LONG_B}</p></div>'
        f'<div class="sidebar"><p>{LONG_C}</p></div></body>'
    )
    assert _t(html) == f"{LONG_A}\n{LONG_B}"


def test_per_paragraph_wrapper_divs():
    """Chain credit (1, 1/2, 1/4) lets the outer container beat any single
    paragraph wrapper, so ALL paragraphs are kept."""
    html = (
        f'<body><div id="main-content"><div><p>{LONG_A}</p></div>'
        f"<div><p>{LONG_B}</p></div><div><p>{LONG_C}</p></div></div>"
        "<p>short</p></body>"
    )
    assert _t(html) == f"{LONG_A}\n{LONG_B}\n{LONG_C}"


def test_negative_subtree_inside_winner_is_stripped():
    html = (
        f"<body><article><p>{LONG_A}</p>"
        f'<div class="comments"><p>{LONG_C}</p></div>'
        f"<p>{LONG_B}</p></article></body>"
    )
    assert _t(html) == f"{LONG_A}\n{LONG_B}"


def test_link_dense_units_rejected():
    linky = f'<p><a href="/x">{LONG_A}</a></p>'
    html = f"<body><article><p>{LONG_B}</p>{linky}</article></body>"
    assert _t(html) == LONG_B


def test_short_units_rejected():
    assert _t("<body><p>too short</p></body>") == ""


def test_empty_and_no_content():
    assert _t("") == ""
    assert _t("<body><nav><a href='/a'>Home</a></nav></body>") == ""


def test_outermost_block_wins_nested_blocks():
    html = f"<body><blockquote><p>{LONG_A}</p></blockquote></body>"
    # blockquote is the unit; its inner p is not emitted separately
    assert _t(html) == LONG_A


def test_headline_h1_not_in_main_text():
    html = f"<body><h1>Headline Words Here Long Enough</h1><p>{LONG_A}</p></body>"
    assert _t(html) == LONG_A


def test_subhead_h2_kept_in_document_order():
    sub = "A Subhead Long Enough To Pass Filter"
    html = f"<body><article><p>{LONG_A}</p><h2>{sub}</h2><p>{LONG_B}</p></article></body>"
    assert _t(html) == f"{LONG_A}\n{sub}\n{LONG_B}"


def test_deterministic_tie_break_document_order():
    html = (
        f"<body><div><p>{LONG_A}</p></div>"
        f"<div><p>{LONG_A}</p></div></body>"
    )
    # body (chain pos 1 for both units: 0.5+0.5) TIES each wrapper (1.0);
    # tie → smallest document-order index = body, so both units are kept.
    assert _t(html) == f"{LONG_A}\n{LONG_A}"


def test_positive_class_boost():
    html = (
        f'<body><div><p>{LONG_A}</p></div>'
        f'<div class="story"><p>{LONG_B}</p></div></body>'
    )
    # same length units, but the positive-class container doubles its credit
    assert _t(html) == LONG_B


def test_idempotent_rendering():
    html = f"<body><article><p>{LONG_A}</p><p>{LONG_B}</p></article></body>"
    once = _t(html)
    again = _t(f"<body><article><p>{once}</p></article></body>")
    assert once.split("\n")[0] in again
