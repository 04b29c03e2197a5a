"""burst_detect: exact local-oracle replay + planted-burst recovery;
lsh_recall_audit / ann_recall_audit: hand-computable corpora + sf invariants.
(Snapshot value pinning lives in test_expected_snapshots.py.)"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _collect(res) -> pa.Table:
    import ray

    if isinstance(res, pa.Table):
        return res
    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    nonempty = [t for t in tabs if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="permissive")
    for t in tabs:
        if t.num_columns:
            return t
    return pa.table({})


def _events(tmp_path, rows):
    ev = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_burst_detect_recovers_planted_burst(ray_session, tmp_path):
    from metareadability_ray.pipelines.analytics import q_burst_detect

    base = dt.datetime(2026, 1, 1)
    rows = []
    # background: 1 event every 4 hours for 20 days
    for h in range(0, 480, 4):
        rows.append(("tick", base + dt.timedelta(hours=h, minutes=7)))
    # planted burst: 20 events/hour for hours 100..102
    for h in (100, 101, 102):
        for m in range(20):
            rows.append(("tick", base + dt.timedelta(hours=h, minutes=m)))
    d = _events(tmp_path, rows)
    got = _collect(q_burst_detect(d)).to_pylist()
    assert len(got) == 1, got
    b = got[0]
    assert b["event_type"] == "tick"
    assert b["start_ts"] == base + dt.timedelta(hours=100)
    assert b["end_ts"] == base + dt.timedelta(hours=102)
    assert b["n_hours"] == 3 and b["n_events"] == 61  # 60 planted + 1 background


def test_burst_detect_matches_local_oracle_at_sf(ray_session):
    """Distributed hourly-count plumbing ≡ a driver-side replay from DuckDB
    counts through the SAME Viterbi — catches partial-merge / zero-fill /
    run-extraction bugs independently of the DP itself."""
    import duckdb

    from metareadability_ray.pipelines.analytics import _viterbi_bursts, q_burst_detect

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["event_type"], r["start_ts"], r["end_ts"], r["n_hours"], r["n_events"])
        for r in _collect(q_burst_detect(sf)).to_pylist()
    )

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 h,
                   count(*) c
            FROM read_parquet('{sf}/events.parquet')
            WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    per: dict[str, dict[int, int]] = {}
    for et, h, c in rows:
        per.setdefault(et, {})[int(h)] = int(c)
    want = []
    for et, d in per.items():
        lo, hi = min(d), max(d)
        series = np.zeros(hi - lo + 1, dtype=np.int64)
        for h, c in d.items():
            series[h - lo] = c
        path = _viterbi_bursts(series, 2.0, 0.5)
        if not path.any():
            continue
        dd = np.diff(path.astype(np.int8))
        starts = np.flatnonzero(np.concatenate(([path[0]], dd == 1)))
        ends = np.flatnonzero(np.concatenate((dd == -1, [path[-1]])))
        for s_, e_ in zip(starts, ends):
            want.append(
                (
                    et,
                    dt.datetime(1970, 1, 1) + dt.timedelta(hours=lo + int(s_)),
                    dt.datetime(1970, 1, 1) + dt.timedelta(hours=lo + int(e_)),
                    int(e_ - s_ + 1),
                    int(series[s_ : e_ + 1].sum()),
                )
            )
    assert got == sorted(want)
    assert len(got) > 0  # the registered params find real bursts at sf


def test_lsh_recall_audit_hand_corpus(ray_session, tmp_path):
    from metareadability_ray.pipelines.audit import q_lsh_recall_audit

    long = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = [long, long, long, "different entirely other words here now", None]
    docs = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(["s0"] * 5, pa.string()),
            "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = q_lsh_recall_audit(str(tmp_path)).to_pylist()[0]
    # 3 identical docs → 3 exact pairs; identical signatures collide in
    # every band → all 3 candidate pairs found
    assert got["n_exact"] == 3 and got["n_hit"] == 3
    assert got["recall"] == "1.0000"
    assert got["n_hit"] <= got["n_candidates"]


def test_ann_recall_audit_sf_invariants(ray_session):
    from metareadability_ray.pipelines.audit import q_ann_recall_audit

    got = _collect(q_ann_recall_audit("/root/testdata/sf0.001")).to_pylist()
    assert len(got) == 5  # num_queries of both sides
    for r in got:
        assert r["n_exact"] == 10
        assert 0 <= r["n_hit"] <= 10
        assert r["recall"] == "%.4f" % (r["n_hit"] / 10)
    # nprobe=4 of 16 cells recovers most true neighbors on this corpus
    assert np.mean([r["n_hit"] for r in got]) / 10 >= 0.6
