"""kmeanspp_sample (k-means|| seeding): exact local-oracle replay,
determinism, and planted-cluster coverage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_kmeanspp_distributed_equals_local_oracle(ray_session):
    """The distributed run and the single-process replay share every
    deterministic choice (seed point, nano-int φ folds, hash draws,
    weighted farthest-point finish) — outputs must be IDENTICAL, not
    approximately equal."""
    from metareadability_ray.pipelines.vectors import (
        _kmeanspar_local,
        kmeanspp_sample,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    want_ids, want_w = _kmeanspar_local(ids, X, k=8, rounds=5, ell=16)

    got = kmeanspp_sample(SF, k=8, rounds=5, oversample=16)
    assert got.column("vec_id").to_pylist() == want_ids.tolist()
    assert got.column("weight").to_pylist() == want_w.tolist()
    assert got.column("rank").to_pylist() == list(range(len(want_ids)))
    # weights of the selected seeds never exceed the corpus
    assert sum(want_w.tolist()) <= len(ids)


def test_kmeanspp_deterministic(ray_session):
    from metareadability_ray.pipelines.vectors import kmeanspp_sample

    a = kmeanspp_sample(SF).to_pylist()
    b = kmeanspp_sample(SF).to_pylist()
    assert a == b


def test_kmeanspp_covers_planted_clusters(ray_session, tmp_path):
    """Four well-separated planted clusters: the k=4 seeds must hit all
    four (the whole point of d²-weighted seeding — naive first-k ids
    would take all seeds from cluster 0)."""
    from metareadability_ray.pipelines.vectors import kmeanspp_sample

    n_per, centers = 25, np.array(
        [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0], [0, 0, 0, 10]], dtype=np.float64
    )
    vecs, ids = [], []
    i = 0
    for ci in range(4):
        for j in range(n_per):
            vecs.append((centers[ci] + 0.01 * ((j % 5) - 2)).tolist())
            ids.append(i)
            i += 1
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i // n_per for i in ids], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = kmeanspp_sample(str(tmp_path), k=4, rounds=5)
    clusters_hit = {v // n_per for v in got.column("vec_id").to_pylist()}
    assert clusters_hit == {0, 1, 2, 3}, got.to_pylist()
