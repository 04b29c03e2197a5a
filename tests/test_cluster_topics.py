"""cluster_topics: planted-structure recovery, determinism, accounting."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_planted(d):
    """Two orthogonal embedding groups with disjoint vocabularies; vec_id
    0 and 1 land in different groups so the deterministic seed init
    separates them."""
    n = 40
    vecs, texts = [], []
    for i in range(n):
        if i % 2 == 0:
            vecs.append([1.0, 0.0, 0.25 * ((i // 2) % 3), 0.0])
            texts.append("apple banana cherry apple banana shared")
        else:
            vecs.append([0.0, 1.0, 0.0, 0.25 * ((i // 2) % 3)])
            texts.append("delta echo foxtrot delta echo shared")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 2 for i in range(n)], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s0"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def test_cluster_topics_recovers_planted_vocab(ray_session, tmp_path):
    from metareadability_ray.pipelines.vectors import cluster_topics

    _write_planted(tmp_path)
    t = cluster_topics(str(tmp_path), n_clusters=2, top_m=3)
    rows = t.to_pylist()
    assert len(rows) == 2
    assert sum(r["n_docs"] for r in rows) == 40
    vocab_a = {"apple", "banana", "cherry"}
    vocab_b = {"delta", "echo", "foxtrot"}
    terms = [set(r["top_terms"].split()) for r in rows]
    # each cluster's distinctive terms come entirely from ONE planted
    # vocabulary, and "shared" (df = k → score 0) never appears
    assert (terms[0] <= vocab_a and terms[1] <= vocab_b) or (
        terms[0] <= vocab_b and terms[1] <= vocab_a
    ), rows
    assert all("shared" not in s for s in terms)
    assert all(len(s) == 3 for s in terms)


def test_cluster_topics_deterministic_and_accounted(ray_session):
    from metareadability_ray.pipelines.vectors import cluster_topics

    a = cluster_topics(SF).to_pylist()
    b = cluster_topics(SF).to_pylist()
    assert a == b
    assert sum(r["n_docs"] for r in a) == 500  # every embedded doc assigned
