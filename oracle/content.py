"""Main-content extraction / boilerplate strip (MR-X11). Normative spec:
SURVEY.md Appendix A.6.

The north rule requires "HTML boilerplate strip … matching the reference's
extracted text/spans per document (byte-identical extracted text per url)".
With `/root/reference/` empty (SURVEY.md §0), THIS module is the normative
kernel: a deterministic, readability-style (Arc90 public-domain heuristic
family) two-level scorer shared verbatim by the oracle and the Ray engine.

Algorithm (pinned):

1. **Text units.** Walk the DOM pre-order; a node is a unit iff its tag is
   in ``CONTENT_BLOCK_TAGS`` and no ancestor is (outermost block wins).
   ``unit_text`` = A.1 ``render_text``. A unit is ACCEPTED iff
   ``len(unit_text) >= CONTENT_MIN_UNIT_CHARS`` and
   ``link_density(unit) <= CONTENT_MAX_LINK_DENSITY`` — this is the
   per-block boilerplate filter (navigation/chrome blocks are short or
   link-dominated).
2. **Container scoring.** Each accepted unit credits its container ancestor
   chain (nearest container first — tags in ``CONTENT_CONTAINER_TAGS``,
   root as fallback) with ``len(unit_text) * CONTENT_CHAIN_WEIGHTS[i]`` for
   the i-th chain position (3 levels), each credit multiplied by the
   container's class/id factor: ``CONTENT_NEGATIVE`` match → 0.25, else
   ``CONTENT_POSITIVE`` match → 2.0, else 1.0.
3. **Winner.** Max score, tie → smallest document-order index; must score
   >= ``CONTENT_MIN_SCORE`` else main_text = "".
4. **Rendering.** Accepted units that are descendants of the winner, in
   document order, SKIPPING any unit that has a ``CONTENT_NEGATIVE``
   container strictly between it and the winner (the in-winner boilerplate
   strip: comment/sidebar/related sub-trees). Units joined with ``"\\n"``.
"""

from __future__ import annotations

from oracle import signals
from oracle.dom import Node, subtree_stats
from oracle.headline import link_density
from oracle.textnorm import norm_ws, render_text


def _class_factor(node: Node, _cache: dict[int, float] | None = None) -> float:
    """Container class/id factor. ``_cache`` (id(node) → factor) amortizes the
    two regex searches: the same few containers sit on most units' chains."""
    if _cache is not None:
        f = _cache.get(id(node))
        if f is not None:
            return f
    ci = node.class_id
    f = 1.0
    if ci:
        if signals.CONTENT_NEGATIVE.search(ci):
            f = signals.CONTENT_NEGATIVE_FACTOR
        elif signals.CONTENT_POSITIVE.search(ci):
            f = signals.CONTENT_POSITIVE_FACTOR
    if _cache is not None:
        _cache[id(node)] = f
    return f


def _container_chain(node: Node, root: Node) -> list[Node]:
    """Container ancestors of ``node``, nearest first; root is the fallback
    terminal container (always last)."""
    chain: list[Node] = []
    n = node.parent
    while n is not None:
        if n.tag in signals.CONTENT_CONTAINER_TAGS or n is root:
            chain.append(n)
        n = n.parent
    return chain


def _collect_units(root: Node) -> list[Node]:
    """Outermost-block text units, document order (pre-order, no descent
    into a block once found)."""
    units: list[Node] = []

    def walk(n: Node) -> None:
        for ch in n.children:
            if isinstance(ch, str):
                continue
            if ch.tag in signals.CONTENT_BLOCK_TAGS:
                units.append(ch)  # outermost block: do not descend
            else:
                walk(ch)

    walk(root)
    return units


def extract_main_text(root: Node, stats: dict | None = None) -> str:
    """Return the boilerplate-stripped main text of the document ("" if no
    container scores above ``CONTENT_MIN_SCORE``). ``stats`` is an optional
    precomputed ``dom.subtree_stats`` map (the fused pass shared with the
    byline extractor); computed locally when absent."""
    accepted: list[tuple[Node, str, list[Node]]] = []  # (unit, text, chain)
    scores: dict[int, float] = {}
    nodes: dict[int, Node] = {}
    factors: dict[int, float] = {}

    if stats is None:
        stats = subtree_stats(root)
    for unit in _collect_units(root):
        tot, cnt, lnk = stats[id(unit)][:3]
        # cheap reject before the normalize/split render: rendered length is
        # ≤ raw length + (chunks−1) single-space joints (norm_ws only
        # collapses), so a unit whose UPPER BOUND is under the cut skips
        # the render entirely — most chrome units die here; byte-identical
        # by construction
        if tot + (cnt - 1 if cnt else 0) < signals.CONTENT_MIN_UNIT_CHARS:
            continue
        parts: list[str] = []
        unit.collect_text(parts)
        text = norm_ws(" ".join(parts))
        if len(text) < signals.CONTENT_MIN_UNIT_CHARS:
            continue
        # identical value to headline.link_density(unit), precomputed above
        if tot and lnk / tot > signals.CONTENT_MAX_LINK_DENSITY:
            continue
        chain = _container_chain(unit, root)
        accepted.append((unit, text, chain))
        for i, c in enumerate(chain[: len(signals.CONTENT_CHAIN_WEIGHTS)]):
            credit = len(text) * signals.CONTENT_CHAIN_WEIGHTS[i] * _class_factor(c, factors)
            key = id(c)
            scores[key] = scores.get(key, 0.0) + credit
            nodes[key] = c

    if not accepted:
        return ""

    winner: Node | None = None
    best_score = 0.0
    for key, sc in scores.items():
        c = nodes[key]
        if sc < signals.CONTENT_MIN_SCORE:
            continue
        # higher score wins; tie → smallest document-order index
        if winner is None or sc > best_score or (sc == best_score and c.index < winner.index):
            best_score = sc
            winner = c
    if winner is None:
        return ""

    out: list[tuple[int, str]] = []
    for unit, text, chain in accepted:
        if winner not in chain:
            continue
        negative_between = False
        for c in chain:
            if c is winner:
                break
            # factor == NEGATIVE_FACTOR ⟺ CONTENT_NEGATIVE matched (it is
            # checked first and the three factor constants are distinct)
            if _class_factor(c, factors) == signals.CONTENT_NEGATIVE_FACTOR:
                negative_between = True
                break
        if not negative_between:
            out.append((unit.index, text))
    out.sort(key=lambda t: t[0])  # document order
    return "\n".join(t for _, t in out)
