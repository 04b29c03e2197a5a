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


def test_scalable_anti_join_paths_equal(ray_session):
    """The size-adaptive anti-filter's two paths (broadcast keyset mask vs
    bucketed reduce-side anti join, forced with threshold=0) must drop the
    same rows — including on an empty remove set."""
    import ray.data

    from metareadability_ray.util import scalable_anti_join

    rows = pa.table(
        {
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "lang": pa.array([f"l{i % 3}" for i in range(20)], pa.string()),
        }
    )
    for rem_ids in ([3, 7, 11, 19], []):
        rem = pa.table({"doc_id": pa.array(rem_ids, pa.int64())})
        outs = []
        for thr in (10**9, 0):
            out = scalable_anti_join(
                ray.data.from_arrow(rows), "doc_id", ray.data.from_arrow(rem), threshold=thr
            )
            t = pa.concat_tables(
                list(out.iter_batches(batch_format="pyarrow")), promote_options="permissive"
            ).sort_by("doc_id")
            outs.append(t)
        assert outs[0].equals(outs[1]), rem_ids
        assert set(outs[0].column("doc_id").to_pylist()) == set(range(20)) - set(rem_ids)


def test_dedup_cascade_sequential_semantics(ray_session, tmp_path):
    """Stage 3 must run on stage-1/2 SURVIVORS: a doc whose only similar
    lower-id vector was already removed by exact dedup is NOT a semantic
    dup (the r3 full-corpus intersection over-removed it — round-4 ADVICE).
    Corpus: docs 1,2 share text (exact removes 2); vec 2 ≈ vec 3 but vec 1
    is ~orthogonal to both, so intersection semantics would kill 3 while
    sequential semantics keep it."""
    import numpy as np
    import pyarrow.parquet as pq

    from metareadability_ray.qa import REGISTRY

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["same text here", "same text here", "other words entirely"]),
            "lang": pa.array(["en", "en", "en"]),
            "source": pa.array(["a", "a", "a"]),
            "n_chars": pa.array([14, 14, 20], pa.int64()),
        }
    )
    e2 = np.array([1.0, 0.0, 0.1, 0.0], np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [
                    np.array([0.0, 1.0, 0.0, 0.0], np.float32),  # ⊥ to 2 and 3
                    e2,
                    e2 + np.array([0.0, 0.0, 0.01, 0.0], np.float32),  # ≈ vec 2
                ],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 0], pa.int32()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    rows = {r["stage"]: r for r in REGISTRY["dedup_cascade"].fn(str(tmp_path)).to_pylist()}
    assert rows["exact"]["n_removed"] == 1 and rows["exact"]["n_remaining"] == 2
    # sequential: vec 2 is gone, so nothing marks doc 3
    assert rows["semantic"]["n_removed"] == 0, rows
    assert rows["semantic"]["n_remaining"] == 2


def test_curated_corpus_distributed_twin_equal(ray_session):
    """q_curated_corpus's broadcast and distributed plans (threshold forced
    to 0: chunk-hash-bucketed string semi-join + bucketed loser anti join)
    must keep the identical document set."""
    from metareadability_ray.pipelines.webtext import q_curated_corpus

    sf = "/root/testdata/sf0.001"

    def tab(ds):
        ts = [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
        return (
            pa.concat_tables(ts, promote_options="permissive") if ts else pa.table({})
        ).sort_by("doc_id")

    a = tab(q_curated_corpus(sf))
    b = tab(q_curated_corpus(sf, broadcast_threshold=0))
    assert a.num_rows > 0
    assert a.equals(b)
