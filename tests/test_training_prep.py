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


def _docs_table(texts, sources=None):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(sources or ["s0"] * n, pa.string()),
            "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
        }
    )


def _collect(ds):
    import ray

    tabs = [ray.get(r) for r in ds.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def test_pack_contexts_window_straddle(ray_session, tmp_path):
    """Hand-checkable packing: budget 5, docs of 3/4/2/5 tokens laid
    head-to-tail → spans [0,3) [3,7) [7,9) [9,14): doc 1 straddles the
    window boundary at 5 (seq 0→1), doc 3 straddles 10 (seq 1→2)."""
    from metareadability_ray.pipelines.training_prep import q_pack_contexts

    pq.write_table(
        _docs_table(["a b c", "a b c d", "x y", "p q r s t"]), str(tmp_path / "documents.parquet")
    )
    out = _collect(q_pack_contexts(str(tmp_path), budget=5)).sort_by("doc_id")
    assert out.column("tok_start").to_pylist() == [0, 3, 7, 9]
    assert out.column("seq_first").to_pylist() == [0, 0, 1, 1]
    assert out.column("seq_last").to_pylist() == [0, 1, 1, 2]


def test_pack_contexts_offsets_are_globally_consistent(ray_session, tmp_path):
    """The two-level prefix scan must produce the same spans as a serial
    cumsum regardless of bucket layout: spans are contiguous, gap-free,
    and doc_id-ordered."""
    from metareadability_ray.pipelines.training_prep import q_pack_contexts

    texts = [" ".join(["w"] * (1 + i % 7)) for i in range(300)]
    pq.write_table(_docs_table(texts), str(tmp_path / "documents.parquet"))
    out = _collect(q_pack_contexts(str(tmp_path), budget=64)).sort_by("doc_id")
    starts = np.asarray(out.column("tok_start").to_pylist())
    ns = np.asarray(out.column("n_tokens").to_pylist())
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + ns[:-1]).all()  # contiguous, gap-free


def test_token_budget_mix_keeps_budget_per_source(ray_session, tmp_path):
    """Per source: kept token total ≤ ceil(total/4), and adding the NEXT
    doc in md5 order would exceed it (maximality of the prefix rule)."""
    import hashlib

    from metareadability_ray.pipelines.training_prep import q_token_budget_mix

    texts = [" ".join(["w"] * (1 + i % 9)) for i in range(200)]
    sources = ["s%d" % (i % 3) for i in range(200)]
    pq.write_table(_docs_table(texts, sources), str(tmp_path / "documents.parquet"))
    out = _collect(q_token_budget_mix(str(tmp_path)))
    kept = {
        (r["source"], r["doc_id"]): r["n_tokens"] for r in out.to_pylist()
    }
    per_src_total: dict[str, int] = {}
    docs = [(sources[i], i, 1 + i % 9) for i in range(200)]
    for s, _, n in docs:
        per_src_total[s] = per_src_total.get(s, 0) + n
    budgets = {s: (t + 3) // 4 for s, t in per_src_total.items()}
    for s in budgets:
        order = sorted(
            (d for d in docs if d[0] == s),
            key=lambda d: (hashlib.md5(str(d[1]).encode()).hexdigest(), d[1]),
        )
        cum = 0
        expect = set()
        for _, did, n in order:
            cum += n
            if cum <= budgets[s]:
                expect.add(did)
        got = {did for (src, did) in kept if src == s}
        assert got == expect, f"source {s}: prefix rule violated"
        assert sum(n for (src, _), n in kept.items() if src == s) <= budgets[s]


def test_lm_perplexity_rare_tokens_score_higher(ray_session, tmp_path):
    """A doc of corpus-common tokens must score fewer bits/token than a doc
    of corpus-rare tokens (the CCNet quality direction)."""
    from metareadability_ray.pipelines.webtext import q_lm_perplexity

    texts = ["the the the the"] * 20 + ["zq xv jj kk"]
    pq.write_table(_docs_table(texts), str(tmp_path / "documents.parquet"))
    out = _collect(q_lm_perplexity(str(tmp_path))).sort_by("doc_id")
    bits = [float(b) for b in out.column("bits_per_token").to_pylist()]
    assert bits[-1] > bits[0], "rare-token doc must score more bits/token"


def test_decontaminate_null_doc_id_drops_both_sides(ray_session, tmp_path):
    """Null-id docs belong to NEITHER the benchmark nor the training half:
    SQL's doc_id % 10 = 0 / <> 0 are both unknown on NULL. The kernel used
    to leak them into the TRAIN side (null → NaN under numpy modulo, NaN !=
    0 is True) and crash the int64 doc_id emit when the doc shared an
    8-gram with the benchmark — the r5 full-registry conformance soak's
    falsifying example, pinned here because .hypothesis/ is not committed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    from metareadability_ray.pipelines.training_prep import q_decontaminate

    long = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, None], pa.int64()),
            "text": pa.array([long, long, long], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s0"] * 3, pa.string()),
            "n_chars": pa.array([len(long)] * 3, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    res = q_decontaminate(str(tmp_path))
    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    rows = [r for t in tabs for r in t.to_pylist()]
    # doc 0 is benchmark; doc 1 is contaminated train (3 shared 8-grams);
    # the null-id doc appears NOWHERE despite sharing every 8-gram
    assert rows == [{"doc_id": 1, "n_hits": 3}]
