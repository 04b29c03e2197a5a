"""Web link-graph extraction: the anchor-text index (the classic web-search
signal — Brin & Page 1998 §2.2 use anchor text as the strongest off-page
relevance feature; every production crawler materialises exactly this table
from its page store).

Two stages over the Common-Crawl-style ``pages`` schema:

* :func:`enrich_links` — a deterministic per-row adapter that gives the
  docs2pages synthetic corpus a realistic OUTLINK section (cross-host nav
  links, a pure function of ``doc_id`` — the docs2pages determinism
  contract), because the base adapter's single ``/a`` footer link would
  make any link-graph operator degenerate. It touches only the html
  column, appending before ``</body>``, so the flagship's extraction
  fields (headline/pubdate/byline live far from the footer region) are
  untouched — and the flagship never reads THESE pages anyway (this module
  builds its own stream).
* :func:`anchor_text_index` — per TARGET url: in-link count, distinct
  linking hosts, and the modal anchor text (ties → lexicographically
  smallest). Extraction uses the production DOM parse (oracle.dom.parse,
  the fastparse single-pass tokenizer held identical to the stdlib
  reference by the 59-case differential suite) — NOT a regex — so nested
  markup inside ``<a>`` renders the way the flagship renders text.

Scale shape: pages stream block-by-block (never materialised); each block
emits only (target_url, anchor, src_host) triples — anchors are a few
tokens, html never shuffles. Triples shuffle ONCE bucketed by target-url
hash, so a bucket holds complete target groups and the per-target
aggregate (count / distinct hosts / modal anchor) is exact in one
vectorized lexsort pass. Host-domain skew (every crawl's reality: a few
hub targets receive millions of in-links) is bounded the usual way: the
per-block combiner collapses duplicate (target, anchor, host) triples
before the shuffle, so a hub's cost is one row per distinct triple per
block, not one per link occurrence.
"""

from __future__ import annotations

import random
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from metareadability_ray.pipelines.docs2pages import pages_dataset
from metareadability_ray.util import with_schema_seed

I64 = pa.int64()
STR = pa.string()

_LINK_WORDS = (
    "archive briefing live report update analysis opinion sports world "
    "local business tech science health weather markets results preview"
).split()
_N_HOSTS = 10  # synthetic cross-host universe: s0..s9.example.org


def _outlink_html(doc_id: int) -> str:
    """Deterministic nav-link block for one page (pure function of doc_id)."""
    rng = random.Random(doc_id * 2654435761 % (2**31))
    n = 5 + rng.randrange(8)
    parts = []
    for _ in range(n):
        host = f"s{rng.randrange(_N_HOSTS)}.example.org"
        w1, w2 = rng.choice(_LINK_WORDS), rng.choice(_LINK_WORDS)
        path = f"/{w1}/{rng.randrange(200)}"
        anchor = f"{w1} {w2}" if rng.random() < 0.7 else w2
        parts.append(f'<a href="https://{host}{path}">{anchor}</a>')
    # ~30% of links are site-relative (resolve against the page's own host)
    for _ in range(2 + rng.randrange(3)):
        w = rng.choice(_LINK_WORDS)
        parts.append(f'<a href="/{w}/{rng.randrange(200)}">{w}</a>')
    return "<nav class=\"outlinks\">" + " ".join(parts) + "</nav>"


def enrich_links(batch: pa.Table) -> pa.Table:
    """Append the deterministic outlink nav before ``</body>``."""
    htmls = batch.column("html").to_pylist()
    urls = batch.column("url").to_pylist()
    out = []
    for url, raw in zip(urls, htmls):
        # doc_id is recoverable from the docs2pages url tail ("...-<id>.html");
        # a null doc_id upstream yields "...-None.html" — guard the parse so
        # one anonymous doc can't crash the whole run (r4 ADVICE): such pages
        # pass through un-enriched (no deterministic id → no deterministic nav)
        stem = url.rsplit("-", 1)[-1].split(".")[0]
        try:
            doc_id = int(stem)
        except ValueError:
            out.append(raw)
            continue
        nav = _outlink_html(doc_id).encode("utf-8")
        body_end = raw.rfind(b"</body>")
        out.append(raw[:body_end] + nav + raw[body_end:] if body_end >= 0 else raw + nav)
    return batch.set_column(batch.column_names.index("html"), "html", pa.array(out, pa.binary()))


def _page_anchors(url: str, raw: bytes) -> list[tuple[str, str, str]]:
    """(target_url, anchor_text, src_host) triples of one page via the
    production DOM parse; relative hrefs resolve against the page host,
    fragment-only/empty hrefs drop, anchor text whitespace-normalises."""
    from oracle.dom import parse
    from oracle.encoding import decode_html
    from oracle.textnorm import norm_ws

    text, _ = decode_html(raw)
    try:
        root = parse(text)
    except Exception:
        return []
    sp = urlsplit(url)
    src_host = sp.netloc
    out: list[tuple[str, str, str]] = []
    for node in root.iter():
        if node.tag != "a":
            continue
        href = node.get("href").strip()
        if not href or href.startswith("#"):
            continue
        if href.startswith("http://") or href.startswith("https://"):
            target = href
        elif href.startswith("/"):
            target = f"{sp.scheme}://{src_host}{href}"
        else:
            continue  # non-root-relative: out of scope (no base resolution)
        buf: list[str] = []
        node.collect_text(buf)
        anchor = norm_ws(" ".join(buf))
        out.append((target, anchor, src_host))
    return out


def anchor_text_index(sf_dir: str, buckets: int = 64) -> "ray.data.Dataset":
    """Per-target anchor-text index over the link-enriched pages stream:
    (target_url, n_links, n_src_hosts, top_anchor)."""
    from metareadability_ray.functions.scalars import stable_hash64

    ds = pages_dataset(sf_dir).map_batches(
        enrich_links, batch_format="pyarrow", zero_copy_batch=True
    )

    def triples(batch: pa.Table) -> pa.Table:
        ts: list[str] = []
        an: list[str] = []
        hs: list[str] = []
        cs: list[int] = []
        rows: dict[tuple[str, str, str], int] = {}
        for url, raw in zip(batch.column("url").to_pylist(), batch.column("html").to_pylist()):
            for trip in _page_anchors(url, raw):
                rows[trip] = rows.get(trip, 0) + 1
        for (t, a, h), c in rows.items():
            ts.append(t)
            an.append(a)
            hs.append(h)
            cs.append(c)
        if not ts:
            return pa.table(
                {
                    "target": pa.array([], STR),
                    "anchor": pa.array([], STR),
                    "src_host": pa.array([], STR),
                    "c": pa.array([], I64),
                    "__b": pa.array([], I64),
                }
            )
        return pa.table(
            {
                "target": pa.array(ts, STR),
                "anchor": pa.array(an, STR),
                "src_host": pa.array(hs, STR),
                "c": pa.array(cs, I64),
                "__b": pa.array(
                    stable_hash64(np.asarray(ts, dtype=object)) % np.int64(buckets), I64
                ),
            }
        )

    def per_target(group: pa.Table) -> pa.Table:
        tg = group.column("target").to_numpy(zero_copy_only=False).astype(str)
        an = group.column("anchor").to_numpy(zero_copy_only=False).astype(str)
        hs = group.column("src_host").to_numpy(zero_copy_only=False).astype(str)
        cs = group.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((hs, an, tg))
        tg, an, hs, cs = tg[order], an[order], hs[order], cs[order]
        t_starts = np.flatnonzero(np.concatenate(([True], tg[1:] != tg[:-1])))
        t_ends = np.append(t_starts[1:], len(tg))
        out_t: list[str] = []
        out_n: list[int] = []
        out_h: list[int] = []
        out_a: list[str] = []
        for s, e in zip(t_starts, t_ends):
            out_t.append(str(tg[s]))
            out_n.append(int(cs[s:e].sum()))
            out_h.append(len(np.unique(hs[s:e])))
            # modal anchor: sum block partials per anchor, max count, tie → min anchor
            a_seg = an[s:e]
            a_starts = np.flatnonzero(np.concatenate(([True], a_seg[1:] != a_seg[:-1])))
            a_tot = np.add.reduceat(cs[s:e], a_starts)
            best = a_starts[int(np.argmax(a_tot))]  # argmax takes FIRST max; a_seg sorted asc
            out_a.append(str(a_seg[best]))
        return pa.table(
            {
                "target_url": pa.array(out_t, STR),
                "n_links": pa.array(out_n, I64),
                "n_src_hosts": pa.array(out_h, I64),
                "top_anchor": pa.array(out_a, STR),
            }
        )

    out_schema = pa.schema(
        [
            ("target_url", STR),
            ("n_links", I64),
            ("n_src_hosts", I64),
            ("top_anchor", STR),
        ]
    )
    return with_schema_seed(
        ds.map_batches(triples, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_target, batch_format="pyarrow"),
        out_schema,
    )


def q_anchor_text_index(sf_dir: str) -> "ray.data.Dataset":
    return anchor_text_index(sf_dir)


# ------------------------------------------------- URL PageRank (Page 1999)
def link_graph_tables(sf_dir: str, buckets: int = 64):
    """The shared link-graph build every whole-graph operator starts from
    (url_pagerank, url_hits): parse the enriched pages stream → per-block
    DISTINCT (src, dst) id pairs (ids = 62-bit masked stable url hashes,
    non-negative for the reduce-side-attach contract; at 10^12 urls the
    62-bit space gives ~10^-5 expected collision rate — disclosed, and
    the id→url table would catch any in the attach) → one bucketed global
    edge dedup (16 B/row) plus the distinct (id, url) node table for the
    final attach. Html never leaves the first stage; everything after is
    fixed-width integers. Returns ``(edges, nodes)`` Datasets."""
    from metareadability_ray.functions.scalars import stable_hash64

    _MASK = np.int64((1 << 62) - 1)

    ds = pages_dataset(sf_dir).map_batches(
        enrich_links, batch_format="pyarrow", zero_copy_batch=True
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        pairs: set[tuple[str, str]] = set()
        for url, raw in zip(batch.column("url").to_pylist(), batch.column("html").to_pylist()):
            for target, _anchor, _h in _page_anchors(url, raw):
                pairs.add((url, target))
        if not pairs:
            return pa.table(
                {
                    "src_url": pa.array([], STR),
                    "dst_url": pa.array([], STR),
                    "src": pa.array([], I64),
                    "dst": pa.array([], I64),
                    "__b": pa.array([], I64),
                }
            )
        su = np.asarray([p[0] for p in pairs], dtype=object)
        du = np.asarray([p[1] for p in pairs], dtype=object)
        sid = stable_hash64(su) & _MASK
        did = stable_hash64(du) & _MASK
        return pa.table(
            {
                "src_url": pa.array(su, STR),
                "dst_url": pa.array(du, STR),
                "src": pa.array(sid, I64),
                "dst": pa.array(did, I64),
                "__b": pa.array((sid * np.int64(1_000_003) + did) % np.int64(buckets), I64),
            }
        )

    # materialize ONCE: both the edge-dedup chain and the node-table chain
    # consume raw_edges; left lazy, Ray re-executes the expensive
    # pages → enrich → DOM-parse lineage end-to-end twice (r4 ADVICE). The
    # materialized set is edge triples (urls + ids), corpus-link-bounded and
    # object-store-resident — NOT the page bytes.
    raw_edges = ds.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def dedup_edges(group: pa.Table) -> pa.Table:
        s = group.column("src").to_numpy(zero_copy_only=False)
        d = group.column("dst").to_numpy(zero_copy_only=False)
        key = np.rec.fromarrays([s, d])
        _, idx = np.unique(key, return_index=True)
        return pa.table(
            {
                "src": pa.array(s[idx], I64),
                "dst": pa.array(d[idx], I64),
            }
        )

    edges = raw_edges.groupby("__b").map_groups(dedup_edges, batch_format="pyarrow")

    # distinct (id, url) node table for the final attach
    def node_rows(batch: pa.Table) -> pa.Table:
        ids: dict[int, str] = {}
        for c_id, c_url in (("src", "src_url"), ("dst", "dst_url")):
            for i, u in zip(batch.column(c_id).to_pylist(), batch.column(c_url).to_pylist()):
                ids[i] = u
        return pa.table(
            {
                "id": pa.array(list(ids.keys()), I64),
                "url": pa.array(list(ids.values()), STR),
                "__b": pa.array([i % buckets for i in ids.keys()], I64),
            }
        )

    def dedup_nodes(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_numpy(zero_copy_only=False)
        _, idx = np.unique(ids, return_index=True)
        return pa.table(
            {
                "id": pa.array(ids[idx], I64),
                "url": group.column("url").take(pa.array(idx)),
            }
        )

    nodes = (
        raw_edges.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(dedup_nodes, batch_format="pyarrow")
    )
    return edges, nodes


def url_pagerank(
    sf_dir: str, damping: float = 0.85, iters: int = 20, local_threshold: int = 1_000_000
) -> "ray.data.Dataset":
    """PageRank over the EXTRACTED url link graph — the full Brin–Page
    composition this module exists for: parse pages → anchor edges →
    directed power iteration with dangling-mass redistribution (most
    targets are frontier URLs with no fetched outlinks — precisely the
    dangling case the dup-graph :func:`clustering.pagerank` never meets).
    Graph build shape: :func:`link_graph_tables`; iteration shape:
    size-adaptive :func:`clustering.pagerank_directed`; ranks re-attach
    urls via one reduce-side join against the distinct node table."""
    from metareadability_ray.pipelines.clustering import pagerank_directed
    from metareadability_ray.pipelines.textops import reduce_side_attach

    edges, nodes = link_graph_tables(sf_dir)
    ranks = pagerank_directed(
        edges, damping=damping, iters=iters, local_threshold=local_threshold
    )
    F64 = pa.float64()
    joined = reduce_side_attach(
        ranks, "doc_id", [("doc_id", I64), ("pagerank", F64)], nodes, "id", "url", "url", STR
    )
    out_schema = pa.schema([("url", STR), ("pagerank", F64)])
    return with_schema_seed(
        joined.map_batches(
            lambda b: b.select(["url", "pagerank"]), batch_format="pyarrow", zero_copy_batch=True
        ),
        out_schema,
    )


def q_url_pagerank(sf_dir: str) -> "ray.data.Dataset":
    return url_pagerank(sf_dir)


def url_hits(
    sf_dir: str, iters: int = 20, local_threshold: int = 1_000_000
) -> "ray.data.Dataset":
    """HITS hubs & authorities over the EXTRACTED url link graph
    (Kleinberg 1999) — PageRank's companion ranking, and structurally its
    mirror test: on this corpus the hub mass concentrates on the fetched
    pages (they hold the outlinks) while the authority mass concentrates
    on the frontier targets — the opposite split from pagerank's
    dangling-mass smoothing, so the two operators probe different halves
    of the same graph build. Same :func:`link_graph_tables` graph, same
    size-adaptive iteration contract (:func:`clustering.hits_directed`),
    scores re-attach urls via one reduce-side join."""
    from metareadability_ray.pipelines.clustering import hits_directed
    from metareadability_ray.pipelines.textops import reduce_side_attach

    edges, nodes = link_graph_tables(sf_dir)
    scores = hits_directed(edges, iters=iters, local_threshold=local_threshold)
    F64 = pa.float64()
    joined = reduce_side_attach(
        scores, "doc_id",
        [("doc_id", I64), ("authority", F64), ("hub", F64)],
        nodes, "id", "url", "url", STR,
    )
    out_schema = pa.schema([("url", STR), ("authority", F64), ("hub", F64)])
    return with_schema_seed(
        joined.map_batches(
            lambda b: b.select(["url", "authority", "hub"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        out_schema,
    )


def q_url_hits(sf_dir: str) -> "ray.data.Dataset":
    return url_hits(sf_dir)
