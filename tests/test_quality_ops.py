"""Unit tests for the quality.py audit operators (charset_profile,
markup_leakage, hash_feature_score, event_type_overlap) and
clustering.q_contrastive_pairs: value-level checks on hand-built corpora
where the expected numbers are computable by eye, plus null/unicode
handling. SQL parity is covered separately by the conformance suite."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq


def _collect(res) -> pa.Table:
    import ray

    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    nonempty = [t for t in tabs if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="permissive")
    for t in tabs:
        if t.num_columns:
            return t
    return pa.table({})


def _docs(tmp_path, texts, sources=None, ids=None):
    n = len(texts)
    docs = pa.table(
        {
            "doc_id": pa.array(ids if ids is not None else range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(sources if sources is not None else ["s0"] * n, pa.string()),
            "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_charset_profile_values(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_charset_profile

    texts = [
        "abc 123",          # 0: 7 chars, 0 non-ascii, 3 digits
        "héllo �",     # 1: 7 chars, 2 non-ascii (é + U+FFFD), 1 FFFD
        None,               # 2: null text → zero counts, NULL pct
        "",                 # 3: empty → zero counts, NULL pct
        "日本語",            # 4: 3 chars, all non-ascii
    ]
    d = _docs(tmp_path, texts, ids=[0, 1, None, 3, 4])
    got = {r["doc_id"]: r for r in _collect(q_charset_profile(d)).to_pylist()}
    assert set(got) == {0, 1, 3, 4}  # null-id doc skipped
    assert got[0] == {
        "doc_id": 0, "n_chars": 7, "n_non_ascii": 0, "n_digits": 3,
        "n_fffd": 0, "non_ascii_pct": "0.0000",
    }
    assert got[1]["n_chars"] == 7 and got[1]["n_non_ascii"] == 2
    assert got[1]["n_fffd"] == 1 and got[1]["non_ascii_pct"] == "0.2857"
    assert got[3]["n_chars"] == 0 and got[3]["non_ascii_pct"] is None
    assert got[4] == {
        "doc_id": 4, "n_chars": 3, "n_non_ascii": 3, "n_digits": 0,
        "n_fffd": 0, "non_ascii_pct": "1.0000",
    }


def test_markup_leakage_flags_residue(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_markup_leakage

    texts = [
        "clean prose here",                 # s0: clean
        "leak <p>para</p> and &amp; twice &lt;",  # s0: 1 open-tag + 2 entity
        # hits (the </p> close tag starts '</' and the open-tag alternation
        # deliberately requires a letter — close tags leak WITH their opens)
        None,                               # s1: null text → unflagged doc
        "<div class='x'>block</div>",       # s1: 1 open-tag hit
    ]
    d = _docs(tmp_path, texts, sources=["s0", "s0", "s1", "s1"])
    got = {r["source"]: r for r in _collect(q_markup_leakage(d)).to_pylist()}
    assert got["s0"]["n_docs"] == 2 and got["s0"]["n_flagged"] == 1
    assert got["s0"]["n_hits"] == 3 and got["s0"]["flag_pct"] == "0.5000"
    assert got["s1"]["n_docs"] == 2 and got["s1"]["n_flagged"] == 1
    assert got["s1"]["n_hits"] == 1


def test_markup_leakage_null_source_group(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_markup_leakage

    n = len(texts := ["<b>x</b>", "plain"])
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([None, None], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    rows = _collect(q_markup_leakage(str(tmp_path))).to_pylist()
    assert rows == [
        {"source": None, "n_docs": 2, "n_flagged": 1, "n_hits": 1, "flag_pct": "0.5000"}
    ]


def test_hash_feature_score_matches_local_oracle(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_hash_feature_score

    texts = ["alpha beta alpha", "", None, "gamma"]
    d = _docs(tmp_path, texts)
    got = {r["doc_id"]: r for r in _collect(q_hash_feature_score(d)).to_pylist()}

    def w(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 2001 - 1000

    exp0 = "%.4f" % ((2 * w("alpha") + w("beta")) / 3000.0)
    assert got[0] == {"doc_id": 0, "n_tokens": 3, "score": exp0}
    assert got[1]["n_tokens"] == 0 and got[1]["score"] is None
    assert got[2]["n_tokens"] == 0 and got[2]["score"] is None
    assert got[3]["score"] == "%.4f" % (w("gamma") / 1000.0)
    # the hash weight is bounded by construction
    assert all(-1.0 <= float(r["score"]) <= 1.0 for r in got.values() if r["score"])


def test_event_type_overlap_counts_distinct_users(ray_session, tmp_path):
    import datetime as dt

    from metareadability_ray.pipelines.quality import q_event_type_overlap

    # u1: view+click (twice each — distinct once), u2: view only,
    # u3: view+click+buy, null user / null type rows drop
    rows = [
        (1, "view"), (1, "click"), (1, "view"), (1, "click"),
        (2, "view"),
        (3, "view"), (3, "click"), (3, "buy"),
        (None, "view"), (4, None),
    ]
    ev = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([dt.datetime(2026, 1, 1)] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    got = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in _collect(q_event_type_overlap(str(tmp_path))).to_pylist()
    }
    assert got == {("click", "view"): 2, ("buy", "click"): 1, ("buy", "view"): 1}


def test_contrastive_pairs_star_per_cluster(ray_session, tmp_path):
    from metareadability_ray.pipelines.clustering import q_contrastive_pairs

    long = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = [long, long, long, "totally different text entirely", "another unique one"]
    d = _docs(tmp_path, texts)
    pairs = sorted(
        (r["anchor_id"], r["positive_id"])
        for r in _collect(q_contrastive_pairs(d)).to_pylist()
    )
    # docs 0,1,2 form one cluster anchored at 0 → star (0,1),(0,2);
    # singletons emit nothing
    assert pairs == [(0, 1), (0, 2)]


def test_type_token_ratio_values(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_type_token_ratio

    d = _docs(tmp_path, ["a b a b a", None, "x y z"])
    got = {r["doc_id"]: r for r in _collect(q_type_token_ratio(d)).to_pylist()}
    assert got[0] == {"doc_id": 0, "n_tokens": 5, "n_distinct": 2, "ttr": "0.4000"}
    assert got[1]["n_tokens"] == 0 and got[1]["ttr"] is None
    assert got[2]["ttr"] == "1.0000"


def test_posting_lists_df_cut_and_sample(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_posting_lists

    d = _docs(
        tmp_path,
        ["common rare1 common", "common", "common rare2", None],
        ids=[0, 1, 2, None],
    )
    rows = {r["tok"]: r for r in _collect(q_posting_lists(d)).to_pylist()}
    # 'common' appears in docs 0,1,2 (df 3 ≥ 2); rare tokens are cut;
    # the null-id doc contributes nothing
    assert set(rows) == {"common"}
    assert rows["common"]["df"] == 3
    assert rows["common"]["sample_docs"] == [0, 1, 2]


def test_embedding_coverage_counts(ray_session, tmp_path):
    from metareadability_ray.pipelines.audit import q_embedding_coverage

    _docs(tmp_path, ["a", "b", "c"], ids=[0, 1, 2])
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2, 9], pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * 3, pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0], pa.int32()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    got = q_embedding_coverage(str(tmp_path)).to_pylist()[0]
    assert got == {
        "n_docs": 3, "n_vectors": 3, "n_matched": 2,
        "n_docs_unembedded": 1, "n_orphan_vectors": 1,
    }


def test_html_curation_run_gates_and_export(ray_session, tmp_path):
    from metareadability_ray.pipelines.curation import html_curation_run

    long = (
        "spark data engine stream batch shuffle partition arrow parquet "
        "vector window agg sort merge join filter scan table row column"
    )
    dup = long + " unique one"
    texts = [
        # ids 0,1,4 share one text; the deterministic page templates render
        # id 0 WITH a headline line in the main container and ids 1,4
        # body-only (verified against the docs2pages seed), so exact-text
        # dedup removes exactly one of {1,4} and keeps 0 as distinct
        dup,
        dup,
        # 2: < 5 words but enough chars to clear the content scorer -
        # dies at the WORD floor, not at extraction
        "internationalization anthropomorphization compartmentalization institutionalization",
        # 3: planted markup - the EXTRACTOR strips it (that is the point of
        # the pipeline), so this doc passes the residue gate with tag-free
        # text; the gate exists for extraction casualties, asserted below
        long + " markup <b>bold</b> residue",
        dup,
    ]
    d = _docs(tmp_path, texts)
    out = str(tmp_path / "export")
    acct = {r["stage"]: r for r in html_curation_run(d, out_dir=out).to_pylist()}
    assert acct["pages"]["n_remaining"] == 5
    assert acct["extractable"]["n_remaining"] == 5
    assert acct["quality_gate"]["n_removed"] == 1   # the 4-word doc
    assert acct["exact_dedup"]["n_removed"] == 1    # one of the body-only twins
    assert acct["exact_dedup"]["n_remaining"] == 3

    import pyarrow.dataset as pds

    ds = pds.dataset(out, partitioning="hive")
    assert ds.count_rows() == 3
    texts_out = ds.to_table(columns=["text"]).column("text").to_pylist()
    # extraction stripped the planted tags before the gate ever saw them
    assert any("markup bold residue" in t for t in texts_out)
    assert not any("<b>" in t for t in texts_out)
    assert sum(t == dup for t in texts_out) == 1          # twins deduped
    assert sum(t.endswith(" unique one") for t in texts_out) == 2  # + headline variant


def test_ngram_novelty_ownership(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_ngram_novelty

    texts = [
        "a b c d",        # 0: shingles {abc, bcd} — both novel (first doc)
        "a b c d",        # 1: same shingles, owned by 0 → novelty 0
        "a b c x",        # 2: {abc(owned by 0), bcx(novel)} → 0.5
        "",               # 3: empty → 0 shingles, NULL novelty
    ]
    d = _docs(tmp_path, texts)
    got = {r["doc_id"]: r for r in _collect(q_ngram_novelty(d)).to_pylist()}
    assert got[0] == {"doc_id": 0, "n_shingles": 2, "n_novel": 2, "novelty": "1.0000"}
    assert got[1] == {"doc_id": 1, "n_shingles": 2, "n_novel": 0, "novelty": "0.0000"}
    assert got[2] == {"doc_id": 2, "n_shingles": 2, "n_novel": 1, "novelty": "0.5000"}
    assert got[3]["n_shingles"] == 0 and got[3]["novelty"] is None


def test_vocab_growth_deciles(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_vocab_growth

    # ids 0..9 → one per decile; each doc introduces its own token plus
    # the shared token 'x' (owned by doc 0)
    texts = ["t%d x" % i for i in range(10)]
    d = _docs(tmp_path, texts)
    rows = {r["bucket"]: r for r in q_vocab_growth(d).to_pylist()}
    assert len(rows) == 10
    assert rows[0]["n_new_tokens"] == 2          # t0 + x
    assert all(rows[b]["n_new_tokens"] == 1 for b in range(1, 10))
    assert rows[9]["cum_vocab"] == 11            # 10 unique + shared x


def test_mix_diversity_uniform_vs_skewed(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_mix_diversity

    # uniform 4-source mix: H = 2 bits, effective 4, gini 0
    d = _docs(tmp_path, ["t"] * 8, sources=["a", "b", "c", "d"] * 2)
    got = q_mix_diversity(d).to_pylist()[0]
    assert got == {
        "n_sources": 4, "entropy_bits": "2.0000",
        "effective_sources": "4.0000", "gini": "0.0000",
    }


def test_mix_diversity_skew_and_nulls(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_mix_diversity

    # 9-vs-1 split (null sources excluded): H = -(0.9 lg 0.9 + 0.1 lg 0.1)
    srcs = ["big"] * 9 + ["small"] + [None] * 3
    d = _docs(tmp_path, ["t"] * 13, sources=srcs)
    got = q_mix_diversity(d).to_pylist()[0]
    import math

    h = -(0.9 * math.log2(0.9) + 0.1 * math.log2(0.1))
    assert got["n_sources"] == 2
    assert got["entropy_bits"] == "%.4f" % h
    # sorted asc: small(1), big(9); k=2, tot=10 →
    # ((2*1-3)*1 + (2*2-3)*9) / (2*10) = 8/20
    assert got["gini"] == "0.4000"


def test_media_synth_and_join_null_doc_id(ray_session, tmp_path):
    """r5 full-registry soak finds, pinned because .hypothesis/ is not
    committed: (a) synth_media_batch crashed on a null-id doc (None % 3 in
    the type cycle) — null-id docs now skip per the per-doc contract;
    (b) doc_embedding_join lost its SCHEMA when every join key was null
    (reduce_side_attach drops null keys per SQL inner-join semantics, so
    the result is legitimately 0 rows — but it must keep its columns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    from metareadability_ray.pipelines.vectors import q_doc_embedding_join
    from metareadability_ray.stages.multimodal import media_features

    long = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    d = _docs(tmp_path, [long, long], ids=[0, None])
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0, 0.25]] * 2, pa.list_(pa.float32())),
            "label": pa.array([0, 0], pa.int32()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))

    media = _collect(media_features(str(tmp_path)))
    assert media.num_rows == 1  # the null-id doc emits no media row

    # all-null-id docs: the join is 0 rows but keeps its 3 columns
    import os

    os.makedirs(str(tmp_path / "sub"), exist_ok=True)
    _docs(tmp_path / "sub", [long], ids=[None])
    pq.write_table(emb, str(tmp_path / "sub" / "embeddings.parquet"))
    res = _collect(q_doc_embedding_join(str(tmp_path / "sub")))
    assert res.num_rows == 0
    assert set(res.column_names) == {"lang", "n_docs", "sum_norm_sq"}


def test_length_ks_drift_known_distributions(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_length_ks_drift

    # source a: lengths {1,2,3,4}; source b: lengths {3,4,5,6} → KS = 0.5
    # (CDF gap at len 2: 2/4 vs 0/4); a third tiny source is ignored
    texts = ["x" * n for n in [1, 2, 3, 4, 3, 4, 5, 6, 9]]
    srcs = ["a"] * 4 + ["b"] * 4 + ["c"]
    d = _docs(tmp_path, texts, sources=srcs)
    got = q_length_ks_drift(d).to_pylist()[0]
    assert got == {"source_a": "a", "source_b": "b", "n_a": 4, "n_b": 4, "ks": "0.5000"}


def test_length_ks_drift_single_source_null_row(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_length_ks_drift

    d = _docs(tmp_path, ["xx", "yyy"], sources=["only", "only"])
    got = q_length_ks_drift(d).to_pylist()[0]
    assert got == {"source_a": None, "source_b": None, "n_a": None, "n_b": None, "ks": None}


def test_dup_rate_by_source_cross_source_exposure(ray_session, tmp_path):
    from metareadability_ray.pipelines.quality import q_dup_rate_by_source

    # 'mirror' copies a doc from 'orig' → BOTH sources show the exposure;
    # null-text doc is excluded entirely
    texts = ["same text here", "same text here", "unique one", None]
    srcs = ["orig", "mirror", "orig", "orig"]
    d = _docs(tmp_path, texts, sources=srcs)
    got = {r["source"]: r for r in _collect(q_dup_rate_by_source(d)).to_pylist()}
    assert got["orig"] == {
        "source": "orig", "n_docs": 2, "n_dup_docs": 1, "dup_pct": "0.5000",
    }
    assert got["mirror"] == {
        "source": "mirror", "n_docs": 1, "n_dup_docs": 1, "dup_pct": "1.0000",
    }
