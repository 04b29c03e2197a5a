"""Minimal, deterministic DOM on the stdlib ``html.parser`` (MR-X2).

lxml is unavailable in this environment (SURVEY.md Appendix B), so both the
oracle and the Ray engine parse with THIS module — parser choice is part of
the byte-identity contract and must never diverge between the two.

Semantics (pinned):
  * ``convert_charrefs=True``: entities/charrefs resolve to text at parse time.
  * Comments, ``<script>``/``<style>`` content, doctypes and processing
    instructions are dropped (MR-X2 pre-clean).
  * Void elements never take children.
  * An end tag closes the nearest matching open tag; unmatched end tags are
    ignored; unclosed tags are implicitly closed at EOF.
  * ``<p>``/``<li>`` auto-close a preceding open ``<p>``/``<li>`` (the only
    implicit-close rules we pin — enough for real-world news markup while
    staying deterministic and simple).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

DROP_SUBTREES = frozenset({"script", "style"})

# tags whose new start-tag implicitly closes an open tag of the same name
_AUTO_CLOSE_SELF = frozenset({"p", "li", "option", "tr", "td", "th"})


class Node:
    """One element. ``children`` holds Nodes and raw-text ``str`` chunks.

    ``nodes`` is set ONLY on the root by :func:`parse`: the flat pre-order
    node list, cached because every extractor iterates the whole document
    and the recursive generator costs a Python frame per yield."""

    __slots__ = ("tag", "attrs", "children", "parent", "index", "nodes", "_cid")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        self.index = 0  # document-order index, assigned by parse()
        self._cid: str | None = None  # lazy class_id cache (attrs are immutable post-parse)

    # -- attribute helpers -------------------------------------------------
    def get(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    @property
    def class_id(self) -> str:
        """class + id joined — the string the class/id pattern regexes scan.

        Cached after first access: four extractor walks (headline, byline,
        pubdate, content container scoring) each query it for most nodes."""
        cid = self._cid
        if cid is None:
            c = self.attrs.get("class", "")
            i = self.attrs.get("id", "")
            cid = (c + " " + i) if (c and i) else (c or i)
            self._cid = cid
        return cid

    # -- traversal ---------------------------------------------------------
    def iter(self):
        """Document-order (pre-order DFS) iteration over element nodes."""
        yield self
        for ch in self.children:
            if isinstance(ch, Node):
                yield from ch.iter()

    def collect_text(self, out: list[str]) -> None:
        for ch in self.children:
            if isinstance(ch, str):
                out.append(ch)
            else:
                ch.collect_text(out)

    def ancestors(self):
        n = self.parent
        while n is not None:
            yield n
            n = n.parent

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Node {self.tag} #{self.index} attrs={self.attrs}>"


def subtree_stats(root: "Node") -> dict[int, tuple[int, int, int, str]]:
    """id(node) → (raw_len, n_text_chunks, linked_len, prefix2) in ONE
    bottom-up pass — the shared scan byline and content both need (each
    used to walk the tree separately):

    * raw_len / n_text_chunks: collected-text length and chunk count
      (render upper bound = raw_len + chunks − 1 single-space joints);
    * linked_len: text under an <a> descendant, counted once — a child
      <a> contributes its whole subtree total, any other child its own
      linked total — exactly ``headline.link_density``'s numerator;
    * prefix2: first ≤2 non-whitespace raw chars in document order (the
      byline "by"-prefix prefilter; str.split() drops exactly the
      str.isspace() chars a per-char skip loop would)."""
    out: dict[int, tuple[int, int, int, str]] = {}

    def walk(n: "Node") -> tuple[int, int, int, str]:
        tot = cnt = lnk = 0
        pref = ""
        for ch in n.children:
            if isinstance(ch, str):
                tot += len(ch)
                cnt += 1
                if len(pref) < 2:
                    t = "".join(ch.split())
                    if t:
                        pref = (pref + t)[:2]
            else:
                ct, cc, cl, cp = walk(ch)
                tot += ct
                cnt += cc
                lnk += ct if ch.tag == "a" else cl
                if len(pref) < 2 and cp:
                    pref = (pref + cp)[:2]
        res = (tot, cnt, lnk, pref)
        out[id(n)] = res
        return res

    walk(root)
    return out


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.stack: list[Node] = [self.root]
        self._drop_depth = 0  # >0 while inside <script>/<style>

    # -- HTMLParser callbacks ---------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self._drop_depth:
            if tag in DROP_SUBTREES:
                self._drop_depth += 1
            return
        if tag in DROP_SUBTREES:
            self._drop_depth = 1
            return
        if tag in _AUTO_CLOSE_SELF and self.stack[-1].tag == tag:
            self.stack.pop()
        adict: dict[str, str] = {}
        for k, v in attrs:
            if k not in adict:  # first occurrence wins (pinned)
                adict[k] = v if v is not None else ""
        node = Node(tag, adict, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._drop_depth:
            return
        if tag in DROP_SUBTREES:
            return
        adict: dict[str, str] = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        self.stack[-1].children.append(Node(tag, adict, self.stack[-1]))

    def handle_endtag(self, tag: str) -> None:
        if self._drop_depth:
            if tag in DROP_SUBTREES:
                self._drop_depth -= 1
            return
        # close nearest matching open tag, if any
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self.stack[-1].children.append(data)

    # comments / doctype / PIs dropped
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


def parse_reference(text: str) -> Node:
    """REFERENCE parse: HTML text → Node tree via the stdlib HTMLParser
    builder above. This is the semantics-defining implementation; the
    shipping :func:`parse` is the fast single-pass twin in
    ``oracle.fastparse``, held output-identical to this one by the
    differential suite (tests/test_fastparse_parity.py: fixtures,
    adversarial constructs, fuzz soup, extract-level comparison).

    Never raises on malformed markup (HTMLParser is tolerant); callers treat
    a raised exception (pathological input) as a parse error (MR-X2 rule:
    all-empty output row + n_parse_err metric).
    """
    tb = _TreeBuilder()
    tb.feed(text)
    tb.close()
    nodes = list(tb.root.iter())
    for i, node in enumerate(nodes):
        node.index = i
    tb.root.nodes = nodes  # cached document-order list (same order as iter())
    return tb.root


def parse(text: str) -> Node:
    """Parse HTML text into a Node tree rooted at a synthetic ``#root``
    (fast path; see :func:`parse_reference` for the contract)."""
    from oracle.fastparse import parse_fast

    return parse_fast(text)


def doc_nodes(root: Node) -> "list[Node]":
    """Document-order node list: the cache set by :func:`parse`, or a fresh
    walk for hand-built trees."""
    cached = getattr(root, "nodes", None)
    return cached if cached is not None else list(root.iter())


def dom_distance(a: Node, b: Node, limit: int = 16) -> int:
    """Undirected tree-path hop count between two nodes (A.4 proximity).

    Returns ``limit`` if the distance exceeds it.
    """
    if a is b:
        return 0
    a_anc: dict[int, int] = {id(a): 0}
    n, d = a, 0
    while n.parent is not None and d < limit:
        n = n.parent
        d += 1
        a_anc[id(n)] = d
    n, up = b, 0
    while up <= limit:
        if id(n) in a_anc:
            total = a_anc[id(n)] + up
            return total if total <= limit else limit
        if n.parent is None:
            break
        n = n.parent
        up += 1
    return limit
