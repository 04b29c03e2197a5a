"""Headline extraction (MR-X3) + title-similarity (MR-X4) + link-density
(MR-X5) + url-slug helper (MR-X10 part). Normative spec: SURVEY.md A.2.

Candidate set: every element whose tag is h1–h4, or whose class/id matches
``HEADLINE_CLASSID``; candidates with empty rendered text are skipped (pinned).

Score = tag weight (+3 h1 / +2 h2 / +1 h3,h4)
      + 2.0 · class/id hit
      + 3.0 · fuzzy_overlap(candidate, site-suffix-stripped <title>)
      + 1.0 if ≥2 url-slug words appear in the candidate's word set
      − 2.0 · link_density
      − 2.0 if text length < 8 or > 200.
Tie-break: document order (first strictly-greater score wins). The winner must
score strictly greater than 0.0, else headline = "".
"""

from __future__ import annotations

from urllib.parse import urlsplit

from oracle import signals
from oracle.dom import Node, doc_nodes
from oracle.textnorm import norm_ws, render_text


def _lcs_substring_len(a: str, b: str) -> int:
    """Length of the longest common substring — exact, via binary search on
    the answer length with set-membership checks (string hashing runs in C,
    ~10× the pure-Python O(n·m) DP row loop this replaced; the DP twin is
    kept below for the differential test)."""
    lo, hi = 0, len(a)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        bsubs = {b[j : j + mid] for j in range(len(b) - mid + 1)}
        if any(a[i : i + mid] in bsubs for i in range(len(a) - mid + 1)):
            lo = mid
        else:
            hi = mid - 1
    return lo


def _lcs_substring_len_dp(a: str, b: str) -> int:
    """Reference O(n·m) rolling-row DP (differential twin of the above)."""
    prev = [0] * (len(b) + 1)
    best = 0
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        ai = a[i - 1]
        for j in range(1, len(b) + 1):
            if ai == b[j - 1]:
                v = prev[j - 1] + 1
                cur[j] = v
                if v > best:
                    best = v
        prev = cur
    return best


def fuzzy_overlap(a: str, b: str) -> float:
    """len(longest common substring) / len(shorter), on normalized lowercase.

    Returns 0.0 when either side is empty (MR-X4).
    """
    a = norm_ws(a).lower()
    b = norm_ws(b).lower()
    if not a or not b:
        return 0.0
    if len(a) > len(b):
        a, b = b, a  # a is the shorter
    return _lcs_substring_len(a, b) / len(a)


def link_density(node: Node) -> float:
    """len(text under <a> descendants) / len(all text) of ``node`` (MR-X5).

    Lengths are raw collected-text character counts (pre-normalization,
    pinned); 0.0 for a textless node.
    """
    total = 0
    linked = 0

    def walk(n: Node, in_link: bool) -> None:
        nonlocal total, linked
        for ch in n.children:
            if isinstance(ch, str):
                total += len(ch)
                if in_link:
                    linked += len(ch)
            else:
                walk(ch, in_link or ch.tag == "a")

    walk(node, node.tag == "a")
    if total == 0:
        return 0.0
    return linked / total


def strip_title_site_suffix(title: str) -> str:
    """Split <title> on ``| — – " - " ::`` and keep the longest part (A.2)."""
    parts = [p.strip() for p in signals.TITLE_SPLIT.split(title)]
    parts = [p for p in parts if p]
    if not parts:
        return ""
    return max(parts, key=len)  # ties → first (max is stable)


def slug_words(url: str) -> list[str]:
    """Lowercased words of the url's last path segment, split on ``-_`` with
    a trailing file extension stripped (MR-X10)."""
    path = urlsplit(url).path
    seg = path.rstrip("/").rsplit("/", 1)[-1]
    if "." in seg:
        seg = seg.rsplit(".", 1)[0]
    out = []
    for w in seg.replace("_", "-").split("-"):
        w = w.strip().lower()
        if w:
            out.append(w)
    return out


def _doc_title(root: Node) -> str:
    for n in doc_nodes(root):
        if n.tag == "title":
            return render_text(n)
    return ""


def extract_headline(root: Node, url: str) -> tuple[str, Node | None]:
    """Return (headline_text, winning_node). ("" , None) when nothing scores > 0."""
    cleaned_title = strip_title_site_suffix(_doc_title(root))
    slugs = set(slug_words(url))

    best_score = signals.HEADLINE_MIN_SCORE
    best_node: Node | None = None
    best_text = ""

    for n in doc_nodes(root):
        tag_w = signals.HEADLINE_TAGS.get(n.tag)
        classid = n.class_id
        classid_hit = bool(classid) and signals.HEADLINE_CLASSID.search(classid) is not None
        if tag_w is None and not classid_hit:
            continue
        text = render_text(n)
        if not text:
            continue
        score = tag_w or 0.0
        if classid_hit:
            score += signals.HEADLINE_CLASSID_BONUS
        if cleaned_title:
            score += signals.TITLE_OVERLAP_WEIGHT * fuzzy_overlap(text, cleaned_title)
        if slugs:
            words = {w.lower() for w in text.split()}
            if len(slugs & words) >= 2:
                score += signals.SLUG_BONUS
        score -= signals.LINK_DENSITY_WEIGHT * link_density(n)
        if len(text) < signals.HEADLINE_MIN_LEN or len(text) > signals.HEADLINE_MAX_LEN:
            score -= signals.LENGTH_PENALTY
        if score > best_score:  # strictly greater → first-in-doc-order wins ties
            best_score = score
            best_node = n
            best_text = text

    return best_text, best_node
