"""SemDeDup and distributed-PCA correctness: agreement with the exact
all-pairs oracle, numpy ground truth, and cross-run determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    import ray

    tabs = [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs, promote_options="permissive") if tabs else pa.table({})


def test_semdedup_within_cluster_recall_is_exact(ray_session):
    """Every exact near-dup pair (cosine ≥ 0.45) whose two vectors land in
    the same cluster must have its higher vec_id flagged — within-cluster
    recall 1.0; flagged rows must carry max_sim_prev ≥ threshold."""
    from metareadability_ray.pipelines.vectors import neardup_cosine_pairs, semdedup

    sd = _collect(semdedup(SF_DIR)).sort_by("vec_id")
    cluster = dict(zip(sd.column("vec_id").to_pylist(), sd.column("cluster").to_pylist()))
    dup = dict(zip(sd.column("vec_id").to_pylist(), sd.column("is_dup").to_pylist()))

    exact = _collect(neardup_cosine_pairs(SF_DIR, threshold=0.45))
    n_colocated = 0
    for a, b in zip(exact.column("vec_a").to_pylist(), exact.column("vec_b").to_pylist()):
        if cluster[a] == cluster[b]:
            n_colocated += 1
            assert dup[b] == 1, f"pair ({a},{b}) co-located but {b} not flagged"
    # the planted near-dups must make this test non-vacuous
    assert n_colocated > 0
    # every flagged dup carries an above-threshold similarity
    for v, d, s in zip(
        sd.column("vec_id").to_pylist(),
        sd.column("is_dup").to_pylist(),
        sd.column("max_sim_prev").to_pylist(),
    ):
        if d:
            assert s is not None and float(s) >= 0.45, v


def test_semdedup_deterministic_across_runs(ray_session):
    from metareadability_ray.pipelines.vectors import semdedup

    a = _collect(semdedup(SF_DIR)).sort_by("vec_id")
    b = _collect(semdedup(SF_DIR)).sort_by("vec_id")
    assert a.equals(b)


def test_pca_matches_numpy_ground_truth(ray_session):
    from metareadability_ray.pipelines.vectors import pca_components, pca_project

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    mean, vals, comps = pca_components(SF_DIR, q=4)

    # ground truth straight from numpy on the full matrix
    cov = np.cov(M, rowvar=False)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    w_true, V_true = w[order], V[:, order].T
    assert np.allclose(vals, w_true, atol=1e-6)
    for got, want in zip(comps, V_true):
        # sign-fixed components must match up to the documented convention
        want = want * np.sign(want[np.abs(want).argmax()])
        assert np.allclose(got, want, atol=1e-6)

    # components orthonormal, eigenvalues descending
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] for i in range(3))

    # projection agrees with the direct computation
    proj = _collect(pca_project(SF_DIR, q=4)).sort_by("vec_id")
    ids = proj.column("vec_id").to_pylist()
    got = np.stack([proj.column(f"pc{j + 1}").to_numpy(zero_copy_only=False) for j in range(4)], 1)
    src_ids = t.column("vec_id").to_pylist()
    want = np.round((M[np.argsort(src_ids)] - mean) @ comps.T, 6)
    assert ids == sorted(src_ids)
    assert np.allclose(got, want, atol=1e-6)


def test_pca_deterministic_across_runs(ray_session):
    from metareadability_ray.pipelines.vectors import pca_project

    a = _collect(pca_project(SF_DIR)).sort_by("vec_id")
    b = _collect(pca_project(SF_DIR)).sort_by("vec_id")
    assert a.equals(b)


def test_quantize_int8_reconstruction_bound(ray_session):
    """Reconstruction error per element ≤ scale/2; codes within [-127,127];
    round-trip is deterministic."""
    from metareadability_ray.pipelines.vectors import quantize_int8

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    src_order = np.argsort(t.column("vec_id").to_pylist())

    qt = _collect(quantize_int8(SF_DIR)).sort_by("vec_id")
    scales = qt.column("scale").to_numpy(zero_copy_only=False)
    codes = np.stack(
        [np.frombuffer(b, dtype=np.int8) for b in qt.column("codes").to_pylist()]
    ).astype(np.float64)
    recon = codes * scales[:, None]
    err = np.abs(recon - M[src_order])
    # elementwise error ≤ scale/2 + rounding slack from the 9-dp scale round
    assert (err <= scales[:, None] / 2 + 1e-7).all()
    assert np.abs(codes).max() <= 127

    qt2 = _collect(quantize_int8(SF_DIR)).sort_by("vec_id")
    assert qt.equals(qt2)


def test_quantize_int8_zero_vector(ray_session, tmp_path):
    from metareadability_ray.pipelines.vectors import quantize_int8

    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0] * 4, [1.0, -2.0, 0.5, 0.0]], pa.list_(pa.float32())),
            "label": pa.array([0, 0], pa.int32()),
        }
    )
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    got = _collect(quantize_int8(str(d))).sort_by("vec_id")
    assert got.column("scale").to_pylist()[0] == 0.0
    assert np.frombuffer(got.column("codes").to_pylist()[0], dtype=np.int8).tolist() == [0, 0, 0, 0]
    c1 = np.frombuffer(got.column("codes").to_pylist()[1], dtype=np.int8)
    assert c1.tolist() == [64, -127, 32, 0]
