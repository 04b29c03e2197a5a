"""Fast single-pass tree builder — output-identical to dom._TreeBuilder.

The stdlib ``html.parser.HTMLParser`` costs a Python method call per token
plus line/column bookkeeping (``updatepos``) per chunk; profiling shows the
parse at ~48% of the extraction kernel. This module re-implements the SAME
tokenization — using the stdlib's own compiled regexes
(``tagfind_tolerant`` / ``attrfind_tolerant`` / ``locatestarttagend_tolerant``
/ ``endtagfind`` / ``commentclose``) and the exact branch structure of
``HTMLParser.goahead`` under ``convert_charrefs=True`` + whole-document
feed — as one inlined loop that builds the Node tree directly, with no
handler dispatch and no position tracking.

Equivalence contract (enforced by tests/test_fastparse_parity.py, which
runs the full extractor over fixtures + adversarial + fuzz inputs through
BOTH builders and requires identical results):

* identical element tree: tag names, attr dicts (first occurrence wins,
  lowercased names, unescaped values), child order, void/auto-close rules;
* identical TEXT CONTENT per parent (chunk boundaries may differ — every
  consumer joins chunks before use, dom.Node.collect_text order is
  unchanged);
* identical dropped constructs (comments, PIs, doctypes, bogus comments,
  marked sections, script/style subtrees) including the stdlib's
  skip-length rules for each, its EOF-truncation fallback (emit to the
  next ``>`` / ``<`` as text), and its AssertionError on unknown marked
  sections (``<![foo`` — callers already treat any raise as parse_err).

Simplification used: script/style content is ALWAYS dropped by the tree
builder (dom semantics), so cdata-mode data events need no buffering — the
loop scans straight to the closing tag regex and discards.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import (
    attrfind_tolerant,
    commentclose,
    endtagfind,
    locatestarttagend_tolerant,
    tagfind_tolerant,
)

from oracle.dom import DROP_SUBTREES, VOID_ELEMENTS, _AUTO_CLOSE_SELF, Node

_markedsectionclose = re.compile(r"]\s*]\s*>")
_msmarkedsectionclose = re.compile(r"]\s*>")
_declname_match = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*").match
_endendtag = re.compile(">")
_ATTR_BREAK = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")
_STD_SECTIONS = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MS_SECTIONS = frozenset({"if", "else", "endif"})
_CDATA_CLOSE = {t: re.compile(r"</\s*%s\s*>" % t, re.I) for t in DROP_SUBTREES}


def parse_fast(text: str) -> Node:
    """One-pass tokenizer + tree builder; see module docstring."""
    s = text
    n = len(s)
    root = Node("#root", {}, None)
    stack = [root]
    # nodes are CREATED in document order (a parser emits pre-order), so the
    # flat node list is collected inline — no post-parse tree walk
    nodes = [root]
    i = 0
    while i < n:
        # ---- text run up to the next '<' (goahead convert_charrefs path)
        j = s.find("<", i)
        if j < 0:
            j = n
        if i < j:
            chunk = s[i:j]
            if "&" in chunk:
                chunk = unescape(chunk)
            if chunk:
                stack[-1].children.append(chunk)
        i = j
        if i == n:
            break
        # ---- construct dispatch (ordering identical to goahead; single
        # char-class tests replace the regex/startswith chain — same cases)
        c = s[i + 1 : i + 2]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):  # '<' + letter: start tag
            m = locatestarttagend_tolerant.match(s, i)
            j = m.end()
            nxt = s[j : j + 1]
            if nxt == ">":
                endpos = j + 1
            elif nxt == "/":
                if s.startswith("/>", j):
                    endpos = j + 2
                else:  # stdlib: '/' not followed by '>' → incomplete
                    endpos = -1
            elif nxt == "":
                endpos = -1
            elif nxt in _ATTR_BREAK:
                endpos = -1  # EOF in/before attribute value (whole-doc: malformed)
            else:
                endpos = j if j > i else i + 1
            if endpos < 0:
                i = _eof_fallback(s, i, stack)
                continue
            m2 = tagfind_tolerant.match(s, i + 1)
            k = m2.end()
            tag = m2.group(1).lower()
            attrs: dict[str, str] = {}
            while k < endpos and s[k] not in ">/":
                # (">"/"/" here means no attrs remain — skips the big
                # attrfind regex for the common attr-less tag)
                ma = attrfind_tolerant.match(s, k)
                if not ma:
                    break
                name, rest, value = ma.group(1, 2, 3)
                if not rest:
                    value = None
                elif value[:1] == "'" == value[-1:] or value[:1] == '"' == value[-1:]:
                    value = value[1:-1]
                if value:
                    value = unescape(value)
                name = name.lower()
                if name not in attrs:  # first occurrence wins (dom rule)
                    attrs[name] = value if value is not None else ""
                k = ma.end()
            tail = s[k:endpos].strip()
            if tail not in (">", "/>"):
                # malformed start tag: stdlib emits the RAW tag text as data
                stack[-1].children.append(s[i:endpos])
                i = endpos
                continue
            if tail == "/>":
                if tag not in DROP_SUBTREES:
                    node = Node(tag, attrs, stack[-1])
                    stack[-1].children.append(node)
                    nodes.append(node)
                i = endpos
                continue
            # plain start tag
            if tag in DROP_SUBTREES:
                # enter cdata mode: scan to the closing tag, discard content
                mc = _CDATA_CLOSE[tag].search(s, endpos)
                if mc is None:
                    break  # unclosed script/style swallows the rest (stdlib)
                i = mc.end()
                continue
            if tag in _AUTO_CLOSE_SELF and stack[-1].tag == tag:
                stack.pop()
            node = Node(tag, attrs, stack[-1])
            stack[-1].children.append(node)
            nodes.append(node)
            if tag not in VOID_ELEMENTS:
                stack.append(node)
            i = endpos
        elif c == "/":  # end tag
            mg = _endendtag.search(s, i + 1)
            if not mg:
                i = _eof_fallback(s, i, stack)
                continue
            gtpos = mg.end()
            me = endtagfind.match(s, i)
            if not me:
                mn = tagfind_tolerant.match(s, i + 2)
                if not mn:
                    if s.startswith("</>", i):
                        i += 3
                        continue
                    pos = s.find(">", i + 2)  # bogus comment, dropped
                    if pos == -1:
                        i = _eof_fallback(s, i, stack)
                        continue
                    i = pos + 1
                    continue
                tagname = mn.group(1).lower()
                gtpos = s.find(">", mn.end())
                _close(stack, tagname)
                i = gtpos + 1
                continue
            _close(stack, me.group(1).lower())
            i = gtpos
        elif c == "!" and s.startswith("--", i + 2):  # comment, dropped
            mc = commentclose.search(s, i + 4)
            if not mc:
                i = _eof_fallback(s, i, stack)
                continue
            i = mc.end()
        elif c == "?":  # processing instruction, dropped
            pos = s.find(">", i + 2)
            if pos == -1:
                i = _eof_fallback(s, i, stack)
                continue
            i = pos + 1
        elif c == "!":  # declaration family (non-comment)
            if s.startswith("<![", i):
                k = _marked_section_end(s, i)
                if k < 0:
                    i = _eof_fallback(s, i, stack)
                    continue
                i = k
            elif s[i : i + 9].lower() == "<!doctype":
                gtpos = s.find(">", i + 9)
                if gtpos == -1:
                    i = _eof_fallback(s, i, stack)
                    continue
                i = gtpos + 1
            else:
                pos = s.find(">", i + 2)  # bogus comment, dropped
                if pos == -1:
                    i = _eof_fallback(s, i, stack)
                    continue
                i = pos + 1
        else:  # lone '<'
            stack[-1].children.append("<")
            i += 1
    for idx, node in enumerate(nodes):
        node.index = idx
    root.nodes = nodes
    return root


def _close(stack: list[Node], tag: str) -> None:
    """End tag: close the nearest matching open tag; unmatched → ignored."""
    for i in range(len(stack) - 1, 0, -1):
        if stack[i].tag == tag:
            del stack[i:]
            return


def _eof_fallback(s: str, i: int, stack: list[Node]) -> int:
    """A construct ran off the end of the document (stdlib goahead(end=1)
    k<0 path): emit up to and including the next '>' — else up to the next
    '<' — else one char, unescaped, as text; resume after it."""
    k = s.find(">", i + 1)
    if k < 0:
        k = s.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    chunk = s[i:k]
    if "&" in chunk:
        chunk = unescape(chunk)
    if chunk:
        stack[-1].children.append(chunk)
    return k


def _marked_section_end(s: str, i: int) -> int:
    """'<![' section: stdlib parse_marked_section skip length, or -1.
    Raises AssertionError on unknown keywords exactly like the stdlib
    (callers treat any raise as a parse error)."""
    if i + 3 == len(s):
        return -1  # buffer ends right at '<![' (stdlib _scan_name i==n)
    m = _declname_match(s, i + 3)
    if not m:
        raise AssertionError(
            "expected name token at %r" % s[i : i + 20]
        )
    if m.end() == len(s):
        return -1  # name runs to end of buffer (stdlib _scan_name → -1)
    name = m.group().strip().lower()
    if name in _STD_SECTIONS:
        mm = _markedsectionclose.search(s, i + 3)
    elif name in _MS_SECTIONS:
        mm = _msmarkedsectionclose.search(s, i + 3)
    else:
        raise AssertionError(
            "unknown status keyword %r in marked section" % s[i + 3 : m.end()]
        )
    if not mm:
        return -1
    return mm.end()
