"""anchor_text_index: independent regex-oracle agreement + kernel edge cases.

The distributed operator parses with the production DOM tree
(oracle.dom.parse); the test oracle here re-extracts every anchor with a
regex and re-aggregates with plain dicts — a genuinely independent
implementation, so agreement checks the whole chain (enrichment determinism,
href resolution, normalization, bucketed shuffle, per-target aggregate).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

_A_RE = re.compile(
    r"""<a[^>]*\shref=(["'])(.*?)\1[^>]*>(.*?)</a>""", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _regex_anchors(url: str, raw: bytes):
    sp = urlsplit(url)
    out = []
    for m in _A_RE.finditer(raw.decode("utf-8")):
        href = m.group(2).strip()
        if not href or href.startswith("#"):
            continue
        if href.startswith(("http://", "https://")):
            target = href
        elif href.startswith("/"):
            target = f"{sp.scheme}://{sp.netloc}{href}"
        else:
            continue
        anchor = _WS_RE.sub(" ", _TAG_RE.sub(" ", m.group(3))).strip()
        out.append((target, anchor, sp.netloc))
    return out


def _expected_index():
    from metareadability_ray.pipelines.docs2pages import docs_to_pages_batch
    from metareadability_ray.pipelines.linkgraph import enrich_links

    docs = pq.read_table(f"{SF}/documents.parquet")
    pages = enrich_links(docs_to_pages_batch(docs))
    per_target_anchors: dict[str, Counter] = defaultdict(Counter)
    per_target_hosts: dict[str, set] = defaultdict(set)
    for url, raw in zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()):
        for target, anchor, host in _regex_anchors(url, raw):
            per_target_anchors[target][anchor] += 1
            per_target_hosts[target].add(host)
    rows = {}
    for t, cnt in per_target_anchors.items():
        # tie-break: max count, then lexicographically SMALLEST anchor
        maxc = max(cnt.values())
        top = min(a for a, c in cnt.items() if c == maxc)
        rows[t] = (sum(cnt.values()), len(per_target_hosts[t]), top)
    return rows


def test_anchor_index_matches_regex_oracle(ray_session):
    import ray

    from metareadability_ray.pipelines.linkgraph import anchor_text_index

    res = anchor_text_index(SF)
    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    tab = pa.concat_tables([t for t in tabs if t.num_rows])
    got = {
        r["target_url"]: (r["n_links"], r["n_src_hosts"], r["top_anchor"])
        for r in tab.to_pylist()
    }
    want = _expected_index()
    assert got == want
    assert len(got) > 1000  # the enriched corpus produces a real graph


def test_page_anchor_kernel_edges():
    from metareadability_ray.pipelines.linkgraph import _page_anchors

    html = (
        b"<html><body>"
        b'<a href="#frag">skip</a>'
        b'<a href="">skip2</a>'
        b'<a href="relative/no">skip3</a>'
        b'<a href="/local/1">go <b>deep</b> text</a>'
        b'<a href="https://other.example/x">abs</a>'
        b"</body></html>"
    )
    got = _page_anchors("https://h.example.org/a/b.html", html)
    assert got == [
        ("https://h.example.org/local/1", "go deep text", "h.example.org"),
        ("https://other.example/x", "abs", "h.example.org"),
    ]


def test_page_anchor_malformed_never_raises():
    from metareadability_ray.pipelines.linkgraph import _page_anchors

    assert isinstance(_page_anchors("https://h/x", b"<a href='/y'>z"), list)
    assert _page_anchors("https://h/x", b"\xff\xfe garbage <<<>>") == []


def _regex_edges():
    """Distinct directed (src_url, target_url) edges via the independent
    regex extractor — the url_pagerank oracle input."""
    from metareadability_ray.pipelines.docs2pages import docs_to_pages_batch
    from metareadability_ray.pipelines.linkgraph import enrich_links

    docs = pq.read_table(f"{SF}/documents.parquet")
    pages = enrich_links(docs_to_pages_batch(docs))
    edges = set()
    for url, raw in zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()):
        for target, _a, _h in _regex_anchors(url, raw):
            edges.add((url, target))
    return edges


def _numpy_pagerank_directed(edges, damping=0.85, iters=20):
    import numpy as np

    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    si = np.array([idx[a] for a, _ in edges])
    di = np.array([idx[b] for _, b in edges])
    outdeg = np.bincount(si, minlength=n).astype(float)
    dang = outdeg == 0
    safe = np.where(dang, 1.0, outdeg)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        d_mass = float(r[dang].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] / safe[si])
        r = (1.0 - damping) / n + damping * (contrib + d_mass / n)
    return dict(zip(nodes, r))


def _rank_table(res):
    import ray

    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    return pa.concat_tables([t for t in tabs if t.num_rows])


def test_url_pagerank_matches_independent_oracle(ray_session):
    import numpy as np

    from metareadability_ray.pipelines.linkgraph import url_pagerank

    tab = _rank_table(url_pagerank(SF))
    got = dict(zip(tab.column("url").to_pylist(), tab.column("pagerank").to_pylist()))
    want = _numpy_pagerank_directed(_regex_edges())
    assert set(got) == set(want)
    g = np.array([got[u] for u in sorted(got)])
    w = np.array([want[u] for u in sorted(want)])
    np.testing.assert_allclose(g, w, rtol=1e-9)
    # mass conservation: the dangling redistribution keeps Σr = 1
    assert abs(g.sum() - 1.0) < 1e-9


def test_url_pagerank_distributed_equals_local(ray_session):
    import numpy as np

    from metareadability_ray.pipelines.linkgraph import url_pagerank

    local = _rank_table(url_pagerank(SF))
    dist = _rank_table(url_pagerank(SF, local_threshold=0))
    gl = dict(zip(local.column("url").to_pylist(), local.column("pagerank").to_pylist()))
    gd = dict(zip(dist.column("url").to_pylist(), dist.column("pagerank").to_pylist()))
    assert set(gl) == set(gd)
    a = np.array([gl[u] for u in sorted(gl)])
    b = np.array([gd[u] for u in sorted(gd)])
    np.testing.assert_allclose(a, b, rtol=1e-9)


def _numpy_hits(edges, iters=20):
    """Independent HITS replay over the regex-extracted edge set (same
    independence argument as _numpy_pagerank_directed)."""
    import numpy as np

    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    si = np.array([idx[a] for a, _ in edges])
    di = np.array([idx[b] for _, b in edges])
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        np.add.at(a, di, h[si])
        na = float(np.sqrt((a * a).sum()))
        if na > 0:
            a /= na
        h = np.zeros(n)
        np.add.at(h, si, a[di])
        nh = float(np.sqrt((h * h).sum()))
        if nh > 0:
            h /= nh
    return {u: (a[i], h[i]) for u, i in idx.items()}


def test_url_hits_matches_independent_oracle(ray_session):
    import numpy as np

    from metareadability_ray.pipelines.linkgraph import url_hits

    tab = _rank_table(url_hits(SF))
    got = {
        r["url"]: (r["authority"], r["hub"]) for r in tab.to_pylist()
    }
    want = _numpy_hits(_regex_edges())
    assert set(got) == set(want)
    g = np.array([got[u] for u in sorted(got)])
    w = np.array([want[u] for u in sorted(want)])
    np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12)
    # L2 normalization invariant on both score vectors
    assert abs(float((g[:, 0] ** 2).sum()) - 1.0) < 1e-9
    assert abs(float((g[:, 1] ** 2).sum()) - 1.0) < 1e-9
    # structural sanity: fetched pages (the only outlink holders) carry the
    # hub mass; frontier targets carry the authority mass
    fetched = {u for u, _ in _regex_edges()}
    hub_top = max(got, key=lambda u: got[u][1])
    assert hub_top in fetched


def test_url_hits_distributed_equals_local(ray_session):
    import numpy as np

    from metareadability_ray.pipelines.linkgraph import url_hits

    local = _rank_table(url_hits(SF))
    dist = _rank_table(url_hits(SF, local_threshold=0))
    gl = {r["url"]: (r["authority"], r["hub"]) for r in local.to_pylist()}
    gd = {r["url"]: (r["authority"], r["hub"]) for r in dist.to_pylist()}
    assert set(gl) == set(gd)
    a = np.array([gl[u] for u in sorted(gl)])
    b = np.array([gd[u] for u in sorted(gd)])
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)
