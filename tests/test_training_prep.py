"""Training-prep operators: sharded export roundtrip/resume and the
decontamination broadcast kernel."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_shard_export_roundtrip_and_resume(ray_session, tmp_path):
    from metareadability_ray.pipelines.training_prep import write_training_shards

    out = str(tmp_path / "shards")
    man = write_training_shards(SF_DIR, out, num_shards=16)
    assert man.num_rows == 16
    assert sorted(man.column("shard").to_pylist()) == list(range(16))

    # every doc lands in exactly one shard; re-read union == source
    files = sorted(glob.glob(os.path.join(out, "shard=*", "part-0.parquet")))
    assert len(files) == 16
    rt = pa.concat_tables([pq.read_table(f) for f in files])
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    assert rt.num_rows == src.num_rows
    assert sorted(rt.column("doc_id").to_pylist()) == sorted(src.column("doc_id").to_pylist())
    assert man.column("n_docs").to_pylist() == [
        pq.read_table(f).num_rows for f in files
    ]

    # resume: rerun skips finished shards (mtimes unchanged) and reports the
    # identical manifest
    mtimes = [os.path.getmtime(f) for f in files]
    man2 = write_training_shards(SF_DIR, out, num_shards=16)
    assert [os.path.getmtime(f) for f in files] == mtimes
    assert man2.column("content_hash").to_pylist() == man.column("content_hash").to_pylist()


def test_shard_routing_matches_sql_nibble(ray_session):
    """The Ray-side md5 routing equals the SQL oracle's top-nibble rule."""
    import hashlib

    from metareadability_ray.pipelines.training_prep import _shard_of

    ids = pa.chunked_array([pa.array([0, 1, 7, 123456789, 999], pa.int64())])
    got = _shard_of(ids, 16)
    want = [int(hashlib.md5(str(d).encode()).hexdigest()[0], 16) % 16 for d in ids.to_pylist()]
    assert got.tolist() == want


def test_decontaminate_flags_planted_overlap(ray_session, tmp_path):
    """A training doc sharing an 8-gram with a benchmark doc is flagged with
    the exact distinct-shingle hit count; disjoint and short docs are not."""
    import ray

    bench_text = "a b c d e f g h i j"  # doc_id 0 → benchmark (mod 10)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            # doc 1: contains bench 8-grams "a..h", "b..i", "c..j" → 3 hits
            "text": pa.array(
                [bench_text, "x " + bench_text, "q r s t u v w x y z", "a b c"], pa.string()
            ),
        }
    )
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    from metareadability_ray.pipelines.training_prep import q_decontaminate

    got = pa.concat_tables(
        [t for t in (ray.get(r) for r in q_decontaminate(str(d)).to_arrow_refs()) if t.num_rows]
    )
    assert got.to_pydict() == {"doc_id": [1], "n_hits": [3]}


def test_batch_shingle_hashes_dedups_within_doc(ray_session):
    from metareadability_ray.pipelines.training_prep import _batch_shingle_hashes

    t = pa.table({"text": pa.array(["w1 w2 w3 w4 w5 w6 w7 w8 w9", None, "short text"], pa.string())})
    idx, h = _batch_shingle_hashes(t)
    assert idx.tolist() == [0, 0]  # two 8-grams from doc 0 only
    assert len(np.unique(h)) == 2


def test_export_curated_shards_end_to_end(ray_session, tmp_path):
    """Composed curation → decontamination → sharded export: the output union
    must equal (curated ∩ not-contaminated), every file re-readable, manifest
    consistent, rerun idempotent."""
    import ray

    from metareadability_ray.pipelines.training_prep import (
        export_curated_shards,
        q_decontaminate,
    )
    from metareadability_ray.pipelines.webtext import q_curated_corpus

    out = str(tmp_path / "curated_shards")
    man = export_curated_shards(SF_DIR, out)
    files = sorted(glob.glob(os.path.join(out, "shard=*", "part-0.parquet")))
    assert len(files) == man.num_rows > 0
    got_ids = sorted(
        i for f in files for i in pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
    )

    def ids_of(ds):
        return {
            i
            for r in ds.to_arrow_refs()
            for i in ray.get(r).column("doc_id").to_pylist()
        }

    want = sorted(ids_of(q_curated_corpus(SF_DIR)) - ids_of(q_decontaminate(SF_DIR)))
    assert got_ids == want

    man2 = export_curated_shards(SF_DIR, out)
    assert man2.column("content_hash").to_pylist() == man.column("content_hash").to_pylist()
