"""Regression tests for round-1 advisor findings (ADVICE.md):

* as-of join must not crash — and must emit NULL matches — for a user with
  clicks but zero views (ASOF LEFT JOIN semantics);
* null text must propagate as SQL NULL through md5-based operators
  (exact_dedup, doc_fingerprint, sample_deterministic), matching
  ``md5(NULL) IS NULL``.
"""

import datetime as dt
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def mini_sf(tmp_path):
    """A tiny sf_dir with events + documents exercising the edge cases."""
    ts0 = dt.datetime(2024, 1, 1)

    def t(m):
        return ts0 + dt.timedelta(minutes=m)

    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array([t(0), t(5), t(10), t(1), t(2), t(7)], pa.timestamp("us")),
            # user 1: view→click→click; user 2: clicks ONLY (no view);
            # user 3: view only (no clicks)
            "event_type": pa.array(
                ["view", "click", "click", "click", "click", "view"], pa.string()
            ),
            "value": pa.array([10.0, 0.0, 0.0, 0.0, 0.0, 30.0], pa.float64()),
        }
    )
    pq.write_table(events, os.path.join(tmp_path, "events.parquet"))

    documents = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["alpha beta", None, "alpha beta", None], pa.string()),
            "lang": pa.array(["en", "en", "en", "de"], pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([10, 0, 10, 0], pa.int64()),
        }
    )
    pq.write_table(documents, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _rows(ds):
    t = ds if isinstance(ds, pa.Table) else pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")], promote_options="permissive"
    )
    cols = sorted(t.column_names)
    return sorted(
        (tuple(repr(r[c]) for c in cols) for r in t.select(cols).to_pylist()), key=repr
    )


def _duck(sf_dir: str, sql: str) -> pa.Table:
    con = duckdb.connect()
    for name in ("events", "documents"):
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetch_arrow_table()


def test_asof_join_user_with_no_views(ray_session, mini_sf):
    """Clicks from a user with zero views get NULL matches, not a crash."""
    from metareadability_ray.pipelines import relational2 as R2
    from metareadability_ray.qa import REGISTRY

    got = _rows(R2.q_asof_join(mini_sf))
    want = _rows(_duck(mini_sf, REGISTRY["asof_join"].sql))
    assert got == want
    # sanity: user 2's clicks are present with null view_ts
    t = pa.concat_tables(list(R2.q_asof_join(mini_sf).iter_batches(batch_format="pyarrow")))
    u2 = t.filter(pa.compute.equal(t.column("user_id"), 2))
    assert u2.num_rows == 2
    assert all(v is None for v in u2.column("view_ts").to_pylist())


def test_exact_dedup_null_text(ray_session, mini_sf):
    from metareadability_ray.pipelines import textops as T
    from metareadability_ray.qa import REGISTRY

    got = _rows(T.q_exact_dedup(mini_sf))
    want = _rows(_duck(mini_sf, REGISTRY["exact_dedup"].sql))
    assert got == want


def test_doc_fingerprint_null_text(ray_session, mini_sf):
    from metareadability_ray.pipelines import textops as T
    from metareadability_ray.qa import REGISTRY

    got = _rows(T.q_doc_fingerprint(mini_sf))
    want = _rows(_duck(mini_sf, REGISTRY["doc_fingerprint"].sql))
    assert got == want


def test_sample_deterministic_null_text(ray_session, mini_sf):
    from metareadability_ray.pipelines import relational2 as R2
    from metareadability_ray.qa import REGISTRY

    got = _rows(R2.q_sample_deterministic(mini_sf))
    want = _rows(_duck(mini_sf, REGISTRY["sample_deterministic"].sql))
    assert got == want


def test_funnel_stages_crafted(ray_session, tmp_path):
    """All four stages + the strictly-after ordering rule: a purchase
    BEFORE the first qualifying click must not advance the funnel."""
    import datetime as dt

    import pyarrow.parquet as pq

    from metareadability_ray.pipelines import relational2 as R2
    from metareadability_ray.qa import REGISTRY

    t0 = dt.datetime(2024, 1, 1)

    def t(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: view -> click -> purchase (stage 3)
        (1, 1, t(0), "view"), (2, 1, t(1), "click"), (3, 1, t(2), "purchase"),
        # user 2: purchase BEFORE view/click chain -> stops at stage 2
        (4, 2, t(0), "purchase"), (5, 2, t(1), "view"), (6, 2, t(2), "click"),
        # user 3: view only (stage 1)
        (7, 3, t(0), "view"),
        # user 4: click/purchase but never a view (stage 0)
        (8, 4, t(0), "click"), (9, 4, t(1), "purchase"),
        # user 5: click at the SAME ts as first view -> strictly-after fails (stage 1)
        (10, 5, t(0), "view"), (11, 5, t(0), "click"),
    ]
    events = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(events, os.path.join(tmp_path, "documents.parquet").replace("documents", "events"))

    got = _rows(R2.q_funnel_stages(str(tmp_path)))
    want = _rows(_duck(str(tmp_path), REGISTRY["funnel_stages"].sql))
    assert got == want
    # direct expectation: stage->count = {3:1, 2:1, 1:2, 0:1}
    t = pa.concat_tables(list(R2.q_funnel_stages(str(tmp_path)).iter_batches(batch_format="pyarrow")))
    m = dict(zip(t.column("stage").to_pylist(), t.column("n_users").to_pylist()))
    assert m == {3: 1, 2: 1, 1: 2, 0: 1}


# ---------------------------------------------------------------- round-3 pins
# hypothesis's falsifying-example DB is gitignored, so data-varied finds get
# committed as explicit cases (same policy as the knn negative-zero pin)


def test_union_priority_keeps_schema_when_both_slices_empty(ray_session, tmp_path):
    """Round-3 full-suite find: with every order in status 'P' both the F
    and O slices are empty and the grouped 0-row result intermittently lost
    its columns (block-order dependent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([0], pa.int64()),
                "o_custkey": pa.array([0], pa.int64()),
                "o_orderstatus": pa.array(["P"], pa.string()),
                "o_totalprice": pa.array([1.0], pa.float64()),
                "o_orderdate": pa.array([0], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"], pa.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from metareadability_ray.pipelines.relational import q_union_priority

    import ray

    for _ in range(3):
        res = q_union_priority(str(tmp_path))
        # to_arrow_refs, not iter_batches: the schema of a legitimately
        # 0-row result rides on empty blocks, which iter_batches elides
        tabs = [t for t in (ray.get(r) for r in res.to_arrow_refs()) if t.num_columns]
        t = pa.concat_tables(tabs, promote_options="permissive")
        assert t.num_rows == 0
        assert set(t.column_names) == {"o_orderstatus", "o_orderpriority", "n"}


def test_source_mix_keeps_null_source_group(ray_session, tmp_path):
    """Round-3 null-source strategy find: the NULL-source group was silently
    dropped by pandas' groupby dropna default; it is a legal SQL GROUP BY
    group and must be reported."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["a", "b", "c"], pa.string()),
                "lang": pa.array(["en", "en", "de"], pa.string()),
                "source": pa.array(["s0", None, None], pa.string()),
                "n_chars": pa.array([1, 1, 1], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from metareadability_ray.pipelines.webtext import q_source_mix

    res = q_source_mix(str(tmp_path))
    t = pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))
    rows = {r["source"]: r for r in t.to_pylist()}
    assert set(rows) == {"s0", None}
    assert rows[None]["n_docs"] == 2 and rows[None]["n_langs"] == 2
    assert rows["s0"]["n_docs"] == 1
