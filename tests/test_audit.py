"""Unit tests for the corpus-audit operators (pipelines/audit.py).

The registry conformance harness covers the deterministic sf-gate harness
(`q_corpus_diff` etc. vs their DuckDB twins on generated data); these tests
cover what that cannot: the GENERIC two-snapshot `corpus_diff` entrypoint
(production passes two real snapshot dirs), the profiler's numeric min/max
fold ('9' vs '10' must compare numerically across block partials), and the
dim-stats kernel on ragged embedding lists (real drops ship mixed dims)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _collect(res) -> pa.Table:
    import ray

    if isinstance(res, pa.Table):
        return res
    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    ne = [t for t in tabs if t.num_rows]
    return pa.concat_tables(ne, promote_options="permissive") if ne else tabs[0]


def test_corpus_diff_generic_two_snapshots(ray_session):
    import ray.data

    from metareadability_ray.pipelines.audit import corpus_diff

    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, None], pa.int64()),
                "text": pa.array(["a", "b", "c", "ghost"], pa.string()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([2, 3, 4], pa.int64()),
                "text": pa.array(["b", "c CHANGED", "d"], pa.string()),
            }
        )
    )
    got = {
        r["doc_id"]: r["status"] for r in _collect(corpus_diff(old, new)).to_pylist()
    }
    # null-id "ghost" doc is skipped (cannot be diffed across runs)
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_corpus_diff_null_text_hashes_as_empty(ray_session):
    import ray.data

    from metareadability_ray.pipelines.audit import corpus_diff

    old = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": pa.array([None, ""], pa.string())}
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": pa.array(["", None], pa.string())}
        )
    )
    got = {r["doc_id"]: r["status"] for r in _collect(corpus_diff(old, new)).to_pylist()}
    # md5(coalesce(text,'')) on both engines: NULL ≡ '' → both unchanged
    assert got == {1: "unchanged", 2: "unchanged"}


def test_table_profile_numeric_minmax_across_blocks(ray_session, tmp_path):
    """doc_id 9 in one block and 10 in another: the driver fold must merge
    the per-block min/max STRINGS numerically for int columns ('10' < '9'
    lexicographically — the exact trap the fold's re-parse exists for)."""
    from metareadability_ray.pipelines.audit import q_table_profile

    n = 12
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(2, 2 + n)), pa.int64()),  # 2..13
            "text": pa.array(
                [None if i % 4 == 0 else f"t{i}" for i in range(n)], pa.string()
            ),
            "lang": pa.array(["en", "de"] * (n // 2), pa.string()),
            "source": pa.array([None] * n, pa.string()),
            "n_chars": pa.array([i % 3 for i in range(n)], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = {r["col"]: r for r in q_table_profile(str(tmp_path)).to_pylist()}
    assert got["doc_id"]["min_v"] == "2" and got["doc_id"]["max_v"] == "13"
    assert got["doc_id"]["n_distinct"] == n and got["doc_id"]["n_nulls"] == 0
    assert got["text"]["n_nulls"] == 3 and got["text"]["n_distinct"] == n - 3
    assert got["source"]["n_nulls"] == n and got["source"]["n_distinct"] == 0
    assert got["source"]["min_v"] is None and got["source"]["max_v"] is None
    assert got["n_chars"]["n_distinct"] == 3
    assert all(r["n_rows"] == n for r in got.values())


def test_embedding_dim_stats_ragged_lists_match_duckdb(ray_session, tmp_path):
    from metareadability_ray.pipelines.audit import q_embedding_dim_stats
    from metareadability_ray.qa import REGISTRY

    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[0.25, -0.5, 1.0], [0.75, 0.25], [-0.25, 0.0, 0.5, 2.0]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 1, 0], pa.int32()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    got = q_embedding_dim_stats(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = con.execute(REGISTRY["embedding_dim_stats"].sql).fetch_arrow_table()
    con.close()
    cols = sorted(got.column_names)
    assert sorted(want.column_names) == cols
    assert sorted(map(repr, got.select(cols).to_pylist())) == sorted(
        map(repr, want.select(cols).to_pylist())
    )
    # ragged lens 3/2/4 → per-dim counts 3,3,2,1
    ns = {r["dim"]: r["n"] for r in got.to_pylist()}
    assert ns == {1: 3, 2: 3, 3: 2, 4: 1}
