"""compression_ratio: monotone invariants + determinism + null handling."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _run(d):
    import ray

    from metareadability_ray.pipelines.curation import q_compression_ratio

    res = q_compression_ratio(str(d))
    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    t = pa.concat_tables([x for x in tabs if x.num_rows])
    return {r["doc_id"]: r for r in t.to_pylist()}


def test_compression_ratio_separates_repetition(ray_session, tmp_path):
    import os

    texts = [
        "spam " * 400,                     # 0: pure repetition → tiny ratio
        " ".join(os.urandom(1).hex() for _ in range(400)),  # not used — see 2
        None,                              # unscorable
        "",                                # unscorable
    ]
    # doc 1: incompressible-ish hex noise, deterministic (seeded by index)
    import hashlib

    texts[1] = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(100)
    )
    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s0"] * 4, pa.string()),
            "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = _run(tmp_path)
    assert len(got) == 4
    # repetition compresses an order of magnitude below noise
    assert got[0]["compression_ratio"] < 0.05
    assert got[1]["compression_ratio"] > 0.5
    assert got[0]["compression_ratio"] < got[1]["compression_ratio"]
    # unscorable docs keep their rows with NULL ratio, 0 bytes
    for i in (2, 3):
        assert got[i]["compression_ratio"] is None and got[i]["n_bytes"] == 0
    assert got[0]["n_bytes"] == len(texts[0].encode("utf-8"))


def test_compression_ratio_deterministic(ray_session):
    SF = "/root/testdata/sf0.001"
    a = _run(SF)
    b = _run(SF)
    assert a == b and len(a) == 500
