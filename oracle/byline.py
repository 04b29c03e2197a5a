"""Author/byline extraction (MR-X8) — normative spec SURVEY.md A.4.

Candidate nodes (a node may hit several sources; bonuses accumulate):
  * class/id matches AUTHOR_CLASSID (substring, ci)            +2
  * ``rel`` attribute contains token ``author``                +2
  * hCard: class token ``fn`` under an ancestor with ``vcard`` +2
  * rendered text starts ``by\\b`` (ci)                        +1
    — bare by-prefix candidacy is only evaluated on elements whose raw
      collected text is ≤ 400 chars and whose normalized text is ≤ 150 chars
      (pinned; whole-article containers are not bylines).
Additional score terms:
  * ≥2 capitalized words in the normalized text                +1
  * each DISTINCT stop substring (comment/posted in/filed/tags/share/
    updated/min read) present in the lowercased text           −2 per hit
  * within 3 undirected DOM hops of the headline winner        +1

Winner: max score, ties → document order; must score ≥ 1.0 else authors = [].
Cleanup (pinned order): strip leading ``by``; split on ``,`` / word ``and`` /
``&`` / ``|``; normalize each part; drop empties; drop parts that are a role
word only (editor/correspondent/reporter/staff, compared lowercased with
``.,;:`` trimmed); preserve document order; dedupe case-sensitively (first
occurrence kept).
"""

from __future__ import annotations

from oracle import signals
from oracle.dom import Node, doc_nodes, dom_distance
from oracle.textnorm import norm_ws, render_text

_BY_TEXT_RAW_MAX = 400


def _raw_scan(root: Node) -> dict[int, tuple[int, str]]:
    """One bottom-up pass: id(node) → (raw collected text length, first ≤2
    non-whitespace raw chars of the subtree).

    The prefix drives the conservative pre-filter for bare by-prefix
    candidacy: rendering only inserts/collapses whitespace and NFC never
    manufactures new ASCII 'b'/'y' base pairs, so a non-"by" prefix implies
    BY_PREFIX cannot match the rendered text — the expensive render is
    skipped for the vast majority of nodes. (A "by" prefix still goes through
    the exact rendered-text check: e.g. 'Byline…' passes the prefilter but
    fails the \\b boundary.) Computing it bottom-up alongside the lengths
    replaces a per-candidate subtree walk with a single document pass."""
    out: dict[int, tuple[int, str]] = {}

    def walk(n: Node) -> tuple[int, str]:
        total = 0
        pref = ""
        for ch in n.children:
            if isinstance(ch, str):
                total += len(ch)
                if len(pref) < 2:
                    # str.split() drops exactly the str.isspace() characters
                    # a per-char skip loop would — C-speed, same char sequence
                    t = "".join(ch.split())
                    if t:
                        pref = (pref + t)[:2]
            else:
                ct, cp = walk(ch)
                total += ct
                if len(pref) < 2 and cp:
                    pref = (pref + cp)[:2]
        out[id(n)] = (total, pref)
        return total, pref

    walk(root)
    return out


def _starts_by(pref: str) -> bool:
    return len(pref) >= 2 and pref[0] in "bB" and pref[1] in "yY"


def _role_word_only(part: str) -> bool:
    return part.strip(".,;:").lower() in signals.ROLE_WORDS


def split_authors(winner_text: str) -> list[str]:
    """Winner-text → canonical author list (the A.4 cleanup, standalone for tests)."""
    t = signals.BY_STRIP.sub("", winner_text)
    parts = signals.AUTHOR_SPLIT.split(t)
    seen: set[str] = set()
    authors: list[str] = []
    for p in parts:
        p = norm_ws(p)
        if not p or _role_word_only(p):
            continue
        if p not in seen:
            seen.add(p)
            authors.append(p)
    return authors


def extract_authors(
    root: Node, headline_node: Node | None, stats: dict | None = None
) -> list[str]:
    # callers that already ran the shared dom.subtree_stats pass hand it in
    # (same raw-length/prefix fields at indices 0/3 — one tree walk saved)
    if stats is not None:
        raw_scan, pref_i = stats, 3
    else:
        raw_scan, pref_i = _raw_scan(root), 1

    best_score = None
    best_text = ""

    for n in doc_nodes(root):
        classid = n.class_id
        classid_hit = bool(classid) and signals.AUTHOR_CLASSID.search(classid) is not None
        rel_hit = "author" in n.get("rel").split()
        hcard_hit = "fn" in n.classes and any("vcard" in a.classes for a in n.ancestors())

        text: str | None = None
        by_hit = False
        if classid_hit or rel_hit or hcard_hit:
            text = render_text(n)
            if text and len(text) <= signals.AUTHOR_MAX_TEXT_LEN:
                by_hit = signals.BY_PREFIX.match(text) is not None
        elif 0 < raw_scan[id(n)][0] <= _BY_TEXT_RAW_MAX:
            if not _starts_by(raw_scan[id(n)][pref_i]):  # sound skip: BY_PREFIX can't match
                continue
            text = render_text(n)
            if text and len(text) <= signals.AUTHOR_MAX_TEXT_LEN:
                by_hit = signals.BY_PREFIX.match(text) is not None
            if not by_hit:
                continue
        else:
            continue
        if not text:
            continue

        score = 0.0
        if classid_hit:
            score += signals.AUTHOR_CLASSID_BONUS
        if rel_hit:
            score += signals.AUTHOR_REL_BONUS
        if hcard_hit:
            score += signals.AUTHOR_HCARD_BONUS
        if by_hit:
            score += signals.AUTHOR_BY_PREFIX_BONUS
        if len(signals.CAP_WORD.findall(text)) >= 2:
            score += signals.AUTHOR_CAPWORDS_BONUS
        low = text.lower()
        score -= signals.AUTHOR_STOPWORD_PENALTY * sum(
            1 for s in signals.AUTHOR_STOP_SUBSTRINGS if s in low
        )
        if headline_node is not None:
            if dom_distance(n, headline_node, signals.AUTHOR_PROXIMITY_HOPS + 1) <= signals.AUTHOR_PROXIMITY_HOPS:
                score += signals.AUTHOR_PROXIMITY_BONUS

        if best_score is None or score > best_score:
            best_score = score
            best_text = text

    if best_score is None or best_score < signals.AUTHOR_MIN_SCORE:
        return []
    return split_authors(best_text)
