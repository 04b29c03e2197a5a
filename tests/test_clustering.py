"""Connected-components clustering over dup pairs (pipelines/clustering.py)."""

import pyarrow as pa
import pyarrow.compute as pc


def _cc(ray_session, pair_rows):
    import ray.data

    from metareadability_ray.pipelines.clustering import connected_components

    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in pair_rows], pa.int64()),
                "doc_b": pa.array([b for _, b in pair_rows], pa.int64()),
            }
        )
    )
    t = pa.concat_tables(
        list(connected_components(pairs).iter_batches(batch_format="pyarrow"))
    )
    return dict(zip(t.column("doc_id").to_pylist(), t.column("cluster_id").to_pylist()))


def test_transitive_chain_collapses(ray_session):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    got = _cc(ray_session, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_converges(ray_session):
    # path of 9 nodes — exercises several propagation rounds + early stop
    edges = [(i, i + 1) for i in range(20, 28)]
    got = _cc(ray_session, edges)
    assert set(got.values()) == {20}
    assert sorted(got) == list(range(20, 29))


def test_survivor_is_min_doc_id(ray_session):
    got = _cc(ray_session, [(7, 5), (5, 9)])
    assert got == {5: 5, 7: 5, 9: 5}


def test_lsh_survivors_agree_with_exact(ray_session):
    """The LSH scale path must closely reproduce the exact pipeline's
    survivor set at small sf (recall of removals bounded below)."""
    import pyarrow as pa

    from metareadability_ray.qa import REGISTRY

    sf = "/root/testdata/sf0.001"

    def ids(name):
        ds = REGISTRY[name].fn(sf)
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        return set(t.column("doc_id").to_pylist())

    exact = ids("dedup_survivors")
    lsh = ids("dedup_survivors_lsh")
    all_docs = ids("quality_score")  # full corpus ids (per-doc map query)
    removed_exact = all_docs - exact
    removed_lsh = all_docs - lsh
    assert removed_exact, "fixture corpus should contain duplicates"
    # LSH candidate generation may miss/extra-flag a few borderline pairs;
    # the pinned bound documents the measured agreement.
    inter = len(removed_exact & removed_lsh)
    assert inter / len(removed_exact) >= 0.75, (removed_exact, removed_lsh)
    assert len(removed_lsh - removed_exact) <= max(3, len(removed_exact) // 4)


def _pr(ray_session, pair_rows, **kw):
    import ray
    import ray.data

    from metareadability_ray.pipelines.clustering import pagerank

    pairs = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pair_rows], pa.int64()),
            "doc_b": pa.array([b for _, b in pair_rows], pa.int64()),
        }
    )
    res = pagerank(ray.data.from_arrow(pairs), **kw)
    tabs = [t for t in res.iter_batches(batch_format="pyarrow") if t.num_rows]
    t = pa.concat_tables(tabs) if tabs else pa.table({"doc_id": [], "pagerank": []})
    return dict(zip(t.column("doc_id").to_pylist(), t.column("pagerank").to_pylist()))


def test_pagerank_star_graph(ray_session):
    """Star 1-{2,3,4}: the center's rank must exceed the leaves', ranks sum
    to 1, and the values match the closed-form fixed point (deg-1 leaves
    send everything to the center): c = (1-d)/4 + d*3*l, l = (1-d)/4 + d*c/3."""
    r = _pr(ray_session, [(1, 2), (1, 3), (1, 4)])
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[1] > r[2] == r[3] == r[4]
    d = 0.85
    # replay the operator's exact schedule: 20 synchronous rounds from the
    # uniform start (c and leaves update from the PREVIOUS round together)
    c, leaf = 0.25, 0.25
    for _ in range(20):
        c, leaf = (1 - d) / 4 + d * 3 * leaf, (1 - d) / 4 + d * c / 3
    assert abs(r[1] - c) < 1e-12 and abs(r[2] - leaf) < 1e-12


def test_pagerank_distributed_equals_local(ray_session):
    """The distributed rounds (local_threshold=0) must reproduce the numpy
    power iteration within float tolerance on an irregular multi-component
    graph."""
    rows = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12)]
    loc = _pr(ray_session, rows)
    dist = _pr(ray_session, rows, local_threshold=0)
    assert set(loc) == set(dist)
    for k in loc:
        assert abs(loc[k] - dist[k]) < 1e-9, (k, loc[k], dist[k])


def test_pagerank_empty_and_querypath(ray_session):
    from metareadability_ray.qa import REGISTRY

    assert _pr(ray_session, []) == {}
    ds = REGISTRY["pagerank_dup"].fn("/root/testdata/sf0.001")
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert t.num_rows > 0
    assert abs(sum(t.column("pagerank").to_pylist()) - 1.0) < 1e-9


def test_central_survivors_one_per_cluster(ray_session):
    """Centrality survivor policy invariants: exactly one survivor per dup
    cluster, same total corpus size as the min-id policy, and the kept
    member has the cluster-max PageRank."""
    import numpy as np

    from metareadability_ray.pipelines.clustering import (
        _clusters_table,
        ngram_jaccard_pairs,
        pagerank,
    )
    from metareadability_ray.qa import REGISTRY

    sf = "/root/testdata/sf0.001"
    surv_min = pa.concat_tables(
        list(REGISTRY["dedup_survivors"].fn(sf).iter_batches(batch_format="pyarrow"))
    )
    surv_c = pa.concat_tables(
        list(REGISTRY["dedup_survivors_central"].fn(sf).iter_batches(batch_format="pyarrow"))
    )
    assert surv_c.num_rows == surv_min.num_rows  # same one-per-cluster count
    clusters = _clusters_table(sf)
    kept = set(surv_c.column("doc_id").to_pylist())
    pr = pa.concat_tables(
        list(pagerank(ngram_jaccard_pairs(sf, k=3, thresh_num=1, thresh_den=5)).iter_batches(batch_format="pyarrow"))
    )
    rank_of = dict(zip(pr.column("doc_id").to_pylist(), pr.column("pagerank").to_pylist()))
    by_cluster: dict[int, list[int]] = {}
    for d, c in zip(clusters.column("doc_id").to_pylist(), clusters.column("cluster_id").to_pylist()):
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        winners = [m for m in members if m in kept]
        assert len(winners) == 1, (c, members, winners)
        mx = max(rank_of.get(m, 0.0) for m in members)
        assert abs(rank_of.get(winners[0], 0.0) - mx) < 1e-15


def test_dedup_cascade_invariants(ray_session):
    """Cascade accounting must be self-consistent: remaining is monotone
    non-increasing, every stage's removed+remaining equals the previous
    remaining, and the final remaining matches input minus total removed."""
    import pyarrow.parquet as pq

    from metareadability_ray.qa import REGISTRY

    sf = "/root/testdata/sf0.001"
    t = REGISTRY["dedup_cascade"].fn(sf)
    rows = t.to_pylist()
    assert [r["stage"] for r in rows] == ["exact", "neardup_lsh", "semantic"]
    n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
    prev = n_docs
    for r in rows:
        assert r["n_removed"] >= 0
        assert r["n_removed"] + r["n_remaining"] == prev
        prev = r["n_remaining"]
    assert prev == n_docs - sum(r["n_removed"] for r in rows)
    assert rows[1]["n_removed"] > 0  # the fixture corpus has near-dups
