"""Unit tests for the training-data text/vector operators' pure kernels
(no Ray needed — the distributed paths are covered by the driver-compare
harness in scripts/verify_queries.py and by test_queries.py)."""

import numpy as np
import pyarrow as pa

from metareadability_ray.pipelines.textops import (
    MinHasher,
    SimHasher,
    _doc_minhash,
    _minhash_params,
    _shingles,
)
from metareadability_ray.stages.multimodal import (
    DECODED_SCHEMA,
    MEDIA_SCHEMA,
    MediaDecodeActor,
    _fake_decode,
    synth_media_batch,
)


def test_shingles_basic():
    assert _shingles(["a", "b", "c", "d"], 3) == {"a b c", "b c d"}
    assert _shingles(["a", "b"], 3) == {"a b"}
    assert _shingles([], 3) == set()
    # identical docs → identical shingle sets
    assert _shingles("x y z w".split(), 3) == _shingles("x y z w".split(), 3)


def test_minhash_deterministic_across_instances():
    a, b = _minhash_params(64)
    a2, b2 = _minhash_params(64)
    assert np.array_equal(a, a2) and np.array_equal(b, b2)
    s1 = _doc_minhash("the quick brown fox jumps".split(), a, b)
    s2 = _doc_minhash("the quick brown fox jumps".split(), a, b)
    assert np.array_equal(s1, s2)


def test_minhash_estimates_jaccard():
    a, b = _minhash_params(256)
    t1 = [f"w{i}" for i in range(100)]
    t2 = t1[:80] + [f"v{i}" for i in range(20)]  # high overlap
    s1 = _doc_minhash(t1, a, b)
    s2 = _doc_minhash(t2, a, b)
    est = (s1 == s2).mean()
    sh1, sh2 = _shingles(t1), _shingles(t2)
    true_j = len(sh1 & sh2) / len(sh1 | sh2)
    assert abs(est - true_j) < 0.15  # 256 perms → small error
    # disjoint docs → near-zero estimate
    s3 = _doc_minhash([f"z{i}" for i in range(100)], a, b)
    assert (s1 == s3).mean() < 0.05


def test_minhasher_batch_stage():
    mh = MinHasher(num_perm=64)
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["a b c d e", "a b c d e"]})
    out = mh(batch)
    sigs = out.column("sig").to_pylist()
    assert sigs[0] == sigs[1]  # identical text → identical signature
    assert len(sigs[0]) == 64


def test_simhash_properties():
    sh = SimHasher()
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["alpha beta gamma delta", "alpha beta gamma delta", "one two three four"],
        }
    )
    out = sh(batch).column("simhash").to_pylist()
    assert out[0] == out[1]  # deterministic
    assert out[0] != out[2]
    # near-identical docs → small hamming distance
    batch2 = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta " * 4,
                "alpha beta gamma delta epsilon zeta eta theta " * 4 + "iota",
            ],
        }
    )
    a, b = sh(batch2).column("simhash").to_pylist()
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham <= 16


def test_fake_decode_deterministic_and_raises_on_empty():
    w1, h1, f1, feat1 = _fake_decode(b"payload", "image")
    w2, h2, f2, feat2 = _fake_decode(b"payload", "image")
    assert (w1, h1, f1) == (w2, h2, f2)
    assert np.array_equal(feat1, feat2)
    assert f1 == 1  # image → single frame
    _, _, vf, _ = _fake_decode(b"payload", "video")
    assert vf >= 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _fake_decode(b"", "image")


def test_media_decode_actor_schema_and_error_counting():
    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": ["hello", "", "world"]})
    media = synth_media_batch(docs)
    assert media.schema == MEDIA_SCHEMA
    actor = MediaDecodeActor()
    out = actor(media)
    assert out.schema == DECODED_SCHEMA
    assert out.num_rows == 3
    assert actor.decoded == 2 and actor.failed == 1  # empty text → empty payload
    # failed row is zeroed, not dropped
    assert out.column("width").to_pylist()[1] == 0


def test_ngram_df_cut_drops_hot_posting_lists(ray_session, tmp_path):
    """df_cut bounds the quadratic hot-shingle pair emission: true near-dup
    pairs (sharing non-hot shingles) survive; pairs that existed ONLY through
    the dropped hot shingle are gone."""
    import os

    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.textops import ngram_jaccard_pairs

    texts = ["dup one two three four five", "dup one two three four five"]
    # 6 docs that share ONLY the hot shingle "x y z"
    texts += [f"x y z tail{i} word{i} more{i}" for i in range(6)]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))

    def pairs(ds):
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        return set(zip(t.column("doc_a").to_pylist(), t.column("doc_b").to_pylist()))

    exact = pairs(ngram_jaccard_pairs(str(tmp_path), k=3, thresh_num=1, thresh_den=5))
    capped = pairs(
        ngram_jaccard_pairs(str(tmp_path), k=3, thresh_num=1, thresh_den=5, df_cut=4)
    )
    assert (0, 1) in exact and (0, 1) in capped  # true dup survives the cut
    assert capped <= exact
    # the hot-shingle-only pairs exceeded the cut and were dropped
    assert all(not (a >= 2 and b >= 2) for a, b in capped)


def test_pdf_layout_stub_spans():
    """PDF layout-parse plumbing: magic check, pagination, span schema,
    failure accounting (the parse kernel is a documented deterministic stub)."""
    import pyarrow as pa

    from metareadability_ray.stages.pdf_layout import (
        PDF_SCHEMA,
        SPAN_SCHEMA,
        PdfLayoutActor,
        synth_pdf_batch,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["word " * 400, "short body text", ""],
        }
    )
    pdfs = synth_pdf_batch(docs)
    assert pdfs.schema == PDF_SCHEMA
    assert all(p.startswith(b"%PDF") for p in pdfs.column("pdf").to_pylist())

    # corrupt one payload: the actor must count it failed, not raise
    broken = pdfs.set_column(1, "pdf", pa.array(
        [pdfs.column("pdf")[0].as_py(), b"not a pdf", pdfs.column("pdf")[2].as_py()],
        pa.binary(),
    ))
    actor = PdfLayoutActor()
    out = actor(broken)
    assert out.schema == SPAN_SCHEMA
    assert actor.parsed == 2 and actor.failed == 1
    d0 = out.filter(pa.compute.equal(out.column("doc_id"), 0))
    assert d0.num_rows > 2  # multi-page doc explodes to many spans
    assert set(d0.column("kind").to_pylist()) == {"heading", "body"}
    assert max(d0.column("page").to_pylist()) >= 1  # paginated
    # doc 1 was corrupted → no spans; doc 2 empty text → no spans
    assert out.filter(pa.compute.equal(out.column("doc_id"), 1)).num_rows == 0


def test_redact_pii_crafted_text(ray_session, tmp_path):
    """Emails redact before URLs (an address inside a URL query never
    survives); counts match the replacements made."""
    import os

    import pyarrow.parquet as pq

    from metareadability_ray.pipelines.textops import q_redact_pii

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "contact bob@example.com or see https://ex.com/a?x=1 now",
                "no pii here at all",
                "two mails a@b.co c@d.org and http://plain.example",
            ],
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    t = pa.concat_tables(list(q_redact_pii(str(tmp_path)).iter_batches(batch_format="pyarrow")))
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert rows[0]["text_clean"] == "contact <EMAIL> or see <URL> now"
    assert rows[0]["n_emails"] == 1 and rows[0]["n_urls"] == 1
    assert rows[1]["text_clean"] == "no pii here at all"
    assert rows[1]["n_emails"] == 0 and rows[1]["n_urls"] == 0
    assert rows[2]["text_clean"] == "two mails <EMAIL> <EMAIL> and <URL>"
    assert rows[2]["n_emails"] == 2 and rows[2]["n_urls"] == 1
