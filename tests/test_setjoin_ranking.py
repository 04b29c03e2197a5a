"""Unit/property tests for the set-join and ranking modules: the prefix-filter
recall lemma and exactly-once emission on random sets (pure kernel, no Ray),
triangle_count vs a brute-force numpy oracle through the full Ray plan, and
the BM25 / JS edge cases the SQL twins can't probe (empty corpus, one source)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from metareadability_ray.pipelines.setjoin import _prefix_len, triangle_count


# ------------------------------------------------------ prefix-filter lemma
@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sets(st.integers(-50, 50), min_size=1, max_size=12).map(
            lambda s: np.array(sorted(s), dtype=np.int64)
        ),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from([(1, 2), (1, 3), (4, 5), (1, 1)]),
)
def test_prefix_filter_recall_and_exactly_once(sets, thresh):
    """For every pair with J >= num/den: (a) the two prefixes intersect
    (recall lemma), and (b) simulating per-group emission with the
    smallest-common-prefix-element rule yields the pair EXACTLY once."""
    num, den = thresh
    emitted: dict[tuple[int, int], int] = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = np.intersect1d(a, b, assume_unique=True)
            union = a.size + b.size - inter.size
            if inter.size * den < num * union:
                continue  # below threshold — not a result pair
            pa_ = int(_prefix_len(np.array([a.size]), num, den)[0])
            pb_ = int(_prefix_len(np.array([b.size]), num, den)[0])
            cut = min(a[pa_ - 1], b[pb_ - 1])
            in_pref = inter[inter <= cut]
            # (a) recall: a passing pair always shares a prefix element
            assert in_pref.size > 0, (a.tolist(), b.tolist(), num, den)
            # (b) exactly-once: exactly one group key g (a shared prefix
            # element) satisfies "g == smallest common prefix element"
            winners = [g for g in in_pref if g == in_pref[0]]
            assert len(winners) == 1
            emitted[(i, j)] = emitted.get((i, j), 0) + 1
    assert all(v == 1 for v in emitted.values())


def test_prefix_len_bounds():
    n = np.array([0, 1, 2, 10, 100], dtype=np.int64)
    p = _prefix_len(n, 1, 2)
    # p = n - ceil(n/2) + 1, and 0 for empty sets
    assert p.tolist() == [0, 1, 2, 6, 51]
    assert (_prefix_len(n, 1, 1) == np.where(n > 0, 1, 0)).all()  # t=1 → 1-prefix


# ------------------------------------------------------------- triangles
def _tri_brute(edges: list[tuple[int, int]]) -> int:
    es = set(edges)
    nodes = sorted({x for e in edges for x in e})
    cnt = 0
    for i, u in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            for l in range(j + 1, len(nodes)):
                v, w = nodes[j], nodes[l]
                if (u, v) in es and (u, w) in es and (v, w) in es:
                    cnt += 1
    return cnt


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_triangle_count_matches_bruteforce(seed):
    import ray

    rng = np.random.RandomState(seed)
    n = 14
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    mask = rng.rand(len(pairs)) < 0.35
    edges = [p for p, m in zip(pairs, mask) if m]
    t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    got = triangle_count(ray.data.from_arrow(t))
    assert got.column("n_triangles")[0].as_py() == _tri_brute(edges)


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_edge_graphs():
    import ray

    empty = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    assert triangle_count(ray.data.from_arrow(empty)).column("n_triangles")[0].as_py() == 0
    # one triangle + a dangling edge
    t = pa.table(
        {
            "doc_a": pa.array([1, 1, 2, 3], pa.int64()),
            "doc_b": pa.array([2, 3, 3, 9], pa.int64()),
        }
    )
    assert triangle_count(ray.data.from_arrow(t)).column("n_triangles")[0].as_py() == 1


# --------------------------------------------------------- bm25 / js edges
@pytest.mark.usefixtures("ray_session")
def test_bm25_empty_and_no_match_corpus(tmp_path):
    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.ranking import bm25_topk

    d = tmp_path / "sf"
    d.mkdir()
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["nothing here", None], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    out = bm25_topk(str(d))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "score"]
    # all-empty texts: avgdl == 0 guard
    docs2 = docs.set_column(1, "text", pa.array(["", None], pa.string()))
    pq.write_table(docs2, str(d / "documents.parquet"))
    out2 = bm25_topk(str(d))
    assert out2.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_js_divergence_degenerate_sources(tmp_path):
    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.ranking import source_js_divergence

    d = tmp_path / "sf"
    d.mkdir()
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "a b", None], pa.string()),
            "source": pa.array(["only", None, "empty_text_source"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    # 'empty_text_source' has no tokens → excluded (matches SQL's tot join);
    # NULL source excluded → a single source remains → no pairs
    out = source_js_divergence(str(d))
    assert out.num_rows == 0
    assert out.column_names == ["source_a", "source_b", "js"]
    # identical distributions → JS exactly 0.0000
    docs2 = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x y x", "x y x"], pa.string()),
            "source": pa.array(["a", "b"], pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
        }
    )
    pq.write_table(docs2, str(d / "documents.parquet"))
    out2 = source_js_divergence(str(d))
    assert out2.num_rows == 1
    assert out2.column("js")[0].as_py() == "0.0000"


# ---------------------------------------------------------------- k-core
from metareadability_ray.pipelines.setjoin import _h_index, _kcore_local, kcore


def _core_brute(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Textbook repeated-peeling oracle (independent of _kcore_local's
    bucket-heap): for k = 1, 2, ... delete nodes with degree < k until
    stable; a node's coreness is the last k it survived."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    core = {v: 0 for v in adj}
    alive = set(adj)
    k = 1
    while alive:
        changed = True
        while changed:
            drop = {v for v in alive if sum(1 for u in adj[v] if u in alive) < k}
            changed = bool(drop)
            alive -= drop
        for v in alive:
            core[v] = k
        k += 1
    return core


def _rand_edges(seed: int, n: int = 16, p: float = 0.3) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    return [pr for pr, m in zip(pairs, rng.rand(len(pairs)) < p) if m]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_kcore_local_matches_bruteforce(seed):
    edges = _rand_edges(seed)
    if not edges:
        return
    sym = pa.table(
        {
            "src": pa.array([a for a, b in edges] + [b for a, b in edges], pa.int64()),
            "dst": pa.array([b for a, b in edges] + [a for a, b in edges], pa.int64()),
        }
    )
    got = {
        d: c
        for d, c in zip(
            _kcore_local(sym).column("doc_id").to_pylist(),
            _kcore_local(sym).column("coreness").to_pylist(),
        )
    }
    assert got == _core_brute(edges)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_kcore_distributed_equals_local(seed):
    """local_threshold=0 forces the h-index iteration; Lü-2016 convergence
    to exact coreness is the property under test."""
    import ray

    edges = _rand_edges(seed, n=12, p=0.35)
    t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    dist = kcore(ray.data.from_arrow(t), local_threshold=0)
    got = sorted(
        zip(*[
            pa.concat_tables(list(dist.iter_batches(batch_format="pyarrow")),
                             promote_options="permissive").column(c).to_pylist()
            for c in ("doc_id", "coreness")
        ])
    )
    want = sorted(_core_brute(edges).items())
    assert got == [tuple(x) for x in want]


@pytest.mark.usefixtures("ray_session")
def test_kcore_planted_structures():
    """5-clique → coreness 4; attached chain → coreness 1; h-index helper."""
    import ray

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in clique + chain], pa.int64()),
            "doc_b": pa.array([b for _, b in clique + chain], pa.int64()),
        }
    )
    out = pa.concat_tables(
        list(kcore(ray.data.from_arrow(t)).iter_batches(batch_format="pyarrow")),
        promote_options="permissive",
    )
    core = dict(zip(out.column("doc_id").to_pylist(), out.column("coreness").to_pylist()))
    assert all(core[i] == 4 for i in range(5))
    assert core[10] == core[11] == core[12] == 1
    assert _h_index(np.array([3, 3, 3])) == 3
    assert _h_index(np.array([1, 1, 1, 1])) == 1
    assert _h_index(np.array([], dtype=np.int64)) == 0
