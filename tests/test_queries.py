"""Relational conformance tests (SURVEY.md §5.4): every SQL-backed query in
qa.REGISTRY must match its DuckDB oracle on the sf0.001 testdata — row count,
column names, and order-insensitive values. The driver runs the same compare
at sf0.01; this is the in-repo early-warning version."""

import datetime as dt

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in TABLES:
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')")
    return c


def _canon_val(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon_val(x) for x in v)
    return v


def _canon(t: pa.Table):
    cols = sorted(t.column_names)
    rows = sorted(
        (tuple(_canon_val(r[c]) for c in cols) for r in t.select(cols).to_pylist()),
        key=repr,
    )
    return t.num_rows, tuple(cols), rows


def _to_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    import ray

    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    return pa.concat_tables(tabs, promote_options="permissive") if tabs else pa.table({})


def _registry():
    from metareadability_ray.qa import REGISTRY

    return REGISTRY


# Derived from the registry so a newly added query is covered automatically
# (a query missing its oracle lands in ROWS_ONLY below, visible in -v output).
SQL_QUERIES = [n for n, s in _registry().items() if s.sql is not None]


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_duckdb(ray_session, con, name):
    spec = _registry()[name]
    assert spec.sql is not None
    ray_t = _to_table(spec.fn(SF_DIR))
    sql_t = con.execute(spec.sql).fetch_arrow_table()
    rn, rc, rv = _canon(ray_t)
    sn, sc, sv = _canon(sql_t)
    assert rn == sn, f"{name}: row count {rn} != {sn}"
    if sn:  # empty results legitimately lose column info on the Ray side
        assert rc == sc, f"{name}: columns {rc} != {sc}"
        assert rv == sv, f"{name}: values differ; first ray={rv[:1]} sql={sv[:1]}"


ROWS_ONLY = [n for n, s in _registry().items() if s.sql is None]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    spec = _registry()[name]
    t = _to_table(spec.fn(SF_DIR))
    if name in ("simhash", "media_features", "extract_pages"):
        assert t.num_rows == 500  # one row per sf0.001 document
    else:
        assert t.num_rows >= 0


def test_hll_estimate_close_to_exact(ray_session, con):
    """MR-G4 sketch accuracy: HLL estimate within 5% of the exact count."""
    spec = _registry()["hll_distinct_users"]
    est = {
        r["event_type"]: r["approx_distinct_users"]
        for r in _to_table(spec.fn(SF_DIR)).to_pylist()
    }
    exact = dict(
        con.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(est) == set(exact)
    for t, e in exact.items():
        assert abs(est[t] - e) <= max(2, 0.05 * e), (t, est[t], e)


def test_quantile_sketch_rank_accuracy(ray_session, con):
    """MR-G4 quantile sketch (fixed-width histogram): each reported quantile
    is the LOWER EDGE of the bucket holding the target-rank value, so the
    true quantile sits in [reported, reported + bucket width)."""
    import math

    from metareadability_ray.pipelines.relational3 import _QSK_BUCKET

    spec = _registry()["quantile_sketch_value"]
    approx = {r["event_type"]: r for r in _to_table(spec.fn(SF_DIR)).to_pylist()}
    for et, row in approx.items():
        vals = [
            v
            for (v,) in con.execute(
                "SELECT value FROM events WHERE event_type = ? AND value IS NOT NULL "
                "ORDER BY value",
                [et],
            ).fetchall()
        ]
        n = len(vals)
        assert row["n"] == n, (et, row["n"], n)
        for q, key in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            true_q = vals[max(0, math.ceil(q * n) - 1)]
            got = float(row[key])
            assert got <= true_q < got + _QSK_BUCKET, (et, key, got, true_q)


def test_misra_gries_guarantee(ray_session, con):
    """Misra-Gries summary: estimates never overcount, undercount by at most
    n/(cap+1), and every token whose true frequency clears 4·n/(cap+1) is
    present in the top-k output (cap=256, k=20 at this corpus size)."""
    est = {
        r["token"]: r["est_n"]
        for r in _to_table(_registry()["approx_heavy_hitters"].fn(SF_DIR)).to_pylist()
    }
    true = dict(
        con.execute(
            r"""SELECT token, count(*) FROM (
                    SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents)
                GROUP BY token ORDER BY 2 DESC, 1 LIMIT 20"""
        ).fetchall()
    )
    n_total = con.execute(
        r"SELECT sum(length(regexp_extract_all(text, '\S+'))) FROM documents"
    ).fetchone()[0]
    bound = n_total / 257
    for tok, e in est.items():
        t = con.execute(
            r"""SELECT count(*) FROM (
                    SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents)
                WHERE token = ?""",
            [tok],
        ).fetchone()[0]
        assert e <= t, (tok, e, t)
        assert t - e <= bound, (tok, e, t, bound)
    for tok, t in true.items():
        if t >= 4 * bound:
            assert tok in est, (tok, t, bound)


def test_registry_fully_covered():
    """Every registry entry is exercised by exactly one of the two param
    lists above — a new operator can't silently skip the conformance gate."""
    reg = set(_registry())
    listed = set(SQL_QUERIES) | set(ROWS_ONLY)
    assert reg == listed, reg ^ listed
    # and the SQL/rows split matches the registry's own declaration
    for name in SQL_QUERIES:
        assert _registry()[name].sql is not None, name
    for name in ROWS_ONLY:
        assert _registry()[name].sql is None, name


def test_simhash_hamming_pairs_exact_vs_bruteforce(ray_session):
    """The Manku-2007 band search must be EXACT for hamming <= 3 (pigeonhole
    over 4 disjoint 16-bit bands guarantees recall 1; the in-group verify
    guarantees precision 1): pipeline output == all-pairs popcount over the
    q_simhash fingerprints of token-bearing docs, each pair exactly once."""
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.textops import (
        _popcount64,
        q_simhash,
        q_simhash_hamming_pairs,
    )

    got_t = _to_table(q_simhash_hamming_pairs(SF_DIR))
    fp = _to_table(q_simhash(SF_DIR))
    docs = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    has_tok = {
        d: bool(t and re.findall(r"\S+", t))
        for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    }
    ids = np.array(fp.column("doc_id").to_pylist())
    sh = np.array(fp.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)
    keep = np.array([has_tok[i] for i in ids])
    ids, sh = ids[keep], sh[keep]
    ham = _popcount64(sh[:, None] ^ sh[None, :])
    ai, bj = np.nonzero((ham <= 3) & (ids[:, None] < ids[None, :]))
    expected = sorted(zip(ids[ai].tolist(), ids[bj].tolist(), ham[ai, bj].tolist()))
    got = sorted(
        zip(
            got_t.column("doc_a").to_pylist(),
            got_t.column("doc_b").to_pylist(),
            got_t.column("hamming").to_pylist(),
        )
    )
    assert expected == got and len(got) > 0


def test_similar_users_sketch_recovers_planted_pairs(ray_session, tmp_path):
    """Planted-signal recovery: users 0/1 share one hourly pattern and users
    2/3 its negation (anti-similar); users 4-7 are independent noise. The
    sketch must surface every planted high-|cos| pair (direct AND
    complemented band match), never invent pairs the exact metric scores
    low, and report cos4 values that match an in-test numpy oracle."""
    import collections
    import datetime as dt

    import numpy as np
    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.relational3 import (
        _hourly_points,
        q_similar_users_sketch,
    )

    rng = np.random.RandomState(7)
    base = dt.datetime(2024, 1, 1)
    pattern = rng.rand(48) * 4.0
    rows = []
    eid = 0
    for u in range(8):
        for h in range(48):
            if u in (0, 1):
                v = pattern[h] + rng.rand() * 0.05
            elif u in (2, 3):
                v = 4.0 - pattern[h] + rng.rand() * 0.05  # negated pattern
            else:
                v = rng.rand() * 4.0
            rows.append((eid, base + dt.timedelta(hours=h), u, "view", float(v)))
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = _to_table(q_similar_users_sketch(str(tmp_path)))
    got_pairs = {
        (a, b): c
        for a, b, c in zip(
            got.column("user_a").to_pylist(),
            got.column("user_b").to_pylist(),
            got.column("cos4").to_pylist(),
        )
    }

    # exact centered-cosine oracle
    pts = _to_table(_hourly_points(str(tmp_path)))
    series: dict[int, dict[int, float]] = collections.defaultdict(dict)
    for u, h, v in zip(
        pts.column("user_id").to_pylist(), pts.column("hr").to_pylist(), pts.column("v").to_pylist()
    ):
        series[u][h] = v
    cent = {}
    for u, d in series.items():
        m = float(np.mean(list(d.values())))
        cent[u] = {h: v - m for h, v in d.items()}
    exact = {}
    users = sorted(series)
    for i in range(len(users)):
        for j in range(i + 1, len(users)):
            a, b = cent[users[i]], cent[users[j]]
            common = set(a) & set(b)
            na = float(np.sqrt(sum(x * x for x in a.values())))
            nb = float(np.sqrt(sum(x * x for x in b.values())))
            if len(common) < 3 or na == 0.0 or nb == 0.0:
                continue
            exact[(users[i], users[j])] = sum(a[h] * b[h] for h in common) / (na * nb)

    planted = {(0, 1), (2, 3), (0, 2), (0, 3), (1, 2), (1, 3)}
    for p in planted:
        assert abs(exact[p]) > 0.9  # the construction really plants them
        assert p in got_pairs, (p, sorted(got_pairs))
    # every reported value matches the oracle at the printed precision
    for p, c4 in got_pairs.items():
        want = f"{exact[p]:.4f}"
        want = "0.0000" if want == "-0.0000" else want
        assert c4 == want, (p, c4, want)


def test_sketch_distributed_candidates_equal_driver_fold(ray_session, tmp_path):
    """The band-shuffle candidate build (distributed_candidates=True) must
    produce the identical verified output to the driver fold — same sketch,
    same bands, only the grouping machinery differs."""
    import datetime as dt

    import numpy as np
    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.relational3 import q_similar_users_sketch

    rng = np.random.RandomState(11)
    base = dt.datetime(2024, 3, 1)
    pattern = rng.rand(36) * 3.0
    rows = []
    eid = 0
    for u in range(10):
        for h in range(36):
            if u in (0, 1):
                v = pattern[h] + rng.rand() * 0.05
            elif u in (2, 3):
                v = 3.0 - pattern[h] + rng.rand() * 0.05
            else:
                v = rng.rand() * 3.0
            rows.append((eid, base + dt.timedelta(hours=h), u, "view", float(v)))
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    keys = [("user_a", "ascending"), ("user_b", "ascending")]
    a = _to_table(q_similar_users_sketch(str(tmp_path))).sort_by(keys)
    b = _to_table(
        q_similar_users_sketch(str(tmp_path), distributed_candidates=True)
    ).sort_by(keys)
    assert a.num_rows > 0  # the planted pairs must survive both paths
    assert a.equals(b)
