"""Data-varied Ray-vs-DuckDB conformance: hypothesis generates small
`documents` tables (dup texts, null text, unicode, empty strings — shapes
the fixed sf testdata never varies) and each example runs the REAL registry
query AND its registry oracle SQL, comparing canonically. This is the same
compare the driver gate does, with the DATA as the free variable."""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

_WORD = st.sampled_from(
    # \xa0 / \x0b /   pin the RE2-\S+ tokenizer semantics: str.split()
    # treats them as separators, DuckDB/pyarrow RE2 does NOT (scalars.re2_tokens)
    ["alpha", "beta", "Gé", "x", "1", "--", "a b", "a\xa0b", "v\x0bt", "p q"]
)
_LONG = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # ≥8 tokens: exercises 8-gram paths
_TEXT = st.one_of(
    st.none(),
    st.just(""),
    st.just(_LONG),               # duplicated across docs → decontam hits
    st.just("pre " + _LONG),      # shares 8-grams with _LONG
    st.lists(_WORD, max_size=8).map(" ".join),
)


@st.composite
def documents_table(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    texts = draw(st.lists(_TEXT, min_size=n, max_size=n))
    # NULL lang is legal (raw web corpora ship un-identified docs): its own
    # group under SQL GROUP BY, excluded by count(DISTINCT lang)
    langs = draw(
        st.lists(st.one_of(st.none(), st.sampled_from(["en", "de", "fr"])), min_size=n, max_size=n)
    )
    # NULL doc_id is legal too (a crawl row whose id column failed to parse):
    # hypothesis sometimes nulls the LAST id — probes the null-id semantics
    # of every doc-keyed query (the r4 ADVICE found two kernels/twins that
    # diverged exactly here; the fixed sf testdata never ships a null id)
    ids: list = list(range(n))
    if draw(st.booleans()):
        ids[-1] = None
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            # every 5th doc has a NULL source: legal per the schema, its own
            # group under DuckDB GROUP BY, excluded by </> comparisons —
            # probes the null-key semantics of every source-keyed query
            "source": pa.array(
                [None if i % 5 == 4 else "s%d" % (i % 2) for i in range(n)], pa.string()
            ),
            "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
        }
    )


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


def _ray_table(res) -> pa.Table:
    import ray

    if isinstance(res, pa.Table):  # driver-fold queries return a Table
        return res
    tabs = [ray.get(r) for r in res.to_arrow_refs()]
    nonempty = [t for t in tabs if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="permissive")
    # all-empty result: keep the schema (operators union a typed 0-row seed
    # block exactly so their schema survives the no-output case)
    for t in tabs:
        if t.num_columns:
            return t
    return pa.table({})


def _run_both(name: str, docs: pa.Table, tmp_path_factory) -> None:
    from metareadability_ray.qa import REGISTRY

    d = tmp_path_factory.mktemp("propconf")
    pq.write_table(docs, str(d / "documents.parquet"))

    spec = REGISTRY[name]
    got = _canon(_ray_table(spec.fn(str(d))))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = _canon(con.execute(spec.sql).fetch_arrow_table())
    con.close()
    import gc

    gc.collect()  # release any actor pool before the next hypothesis example
    assert got == want, f"{name} diverged on generated data"


# settings: each example runs a real Ray pipeline (~0.5 s at 4 CPUs), so the
# example budget is small but the data shapes (nulls, dups, unicode, empty)
# are exactly what sf testdata holds constant.
# soak knob: CONF_MAX_EXAMPLES=40 python -m pytest tests/test_property_conformance.py
# lets a long run search far more data shapes than the default CI budget
# (hypothesis persists falsifying examples, so a soak find stays caught).
import os as _os

_N_EX = int(_os.environ.get("CONF_MAX_EXAMPLES", "8"))

_PROP = dict(
    max_examples=_N_EX,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.mark.parametrize(
    "name",
    [
        "exact_dedup", "token_stats", "median_doc_length", "doc_fingerprint",
        "quality_score", "decontaminate", "ngram_jaccard_pairs", "common_chunks",
        "winnow_fingerprint", "redact_pii", "bpe_token_stats", "token_entropy",
        "langid", "median_hist", "word_count_topk", "tfidf_top_terms",
        "weighted_sample", "bigram_topk", "dup_chunk_ratio", "top_bigram_fraction",
        "sample_deterministic", "train_test_split", "dup_clusters",
        "dedup_survivors", "stratified_sample", "topk_docs_per_lang",
        "para_dedup_stats", "gopher_repetition", "source_mix", "curated_corpus",
        "bottomk_sample", "shard_assignment",
        "lm_perplexity", "pack_contexts", "token_budget_mix", "para_dedup_rewrite",
        "chunk_documents", "dup_span_stats", "gopher_quality_filter",
        "intra_doc_dedup", "length_percentile_filter", "source_overlap",
        "oov_rate", "zipf_slope", "quality_by_source", "char_trigram_profile",
        "normalized_dedup",
        "prefix_jaccard_join", "triangle_count", "bm25_topk", "source_js_divergence",
        "collocations_pmi",
        "source_cap_sample", "mixture_weights", "ccnet_buckets",
        "dup_span_rewrite", "dsir_weights", "filter_funnel",
        "winnow_pairs", "log_odds_keywords", "stupid_backoff_score",
        "mad_outlier_docs", "distinct_ngram_ratio", "incremental_dedup",
        "containment_pairs", "bigram_cond_entropy", "blocklist_filter",
        "corpus_diff", "table_profile", "tokenizer_fertility", "canary_scan",
        "charset_profile", "markup_leakage", "hash_feature_score",
        "contrastive_pairs", "type_token_ratio", "posting_lists",
        "ngram_novelty", "vocab_growth", "mix_diversity", "length_ks_drift",
        "dup_rate_by_source",
    ],
)
def test_query_conformance_on_generated_documents(ray_session, tmp_path_factory, name):
    @settings(**_PROP)
    @given(documents_table())
    def inner(docs):
        _run_both(name, docs, tmp_path_factory)

    inner()


# ------------------------------------------------------------ events tables

@st.composite
def events_table(draw):
    """Adversarial event shapes: users with clicks but no views (the round-1
    ADVICE crash), duplicate timestamps, single-event users, value NaN-free
    floats exactly representable both engines, and NULL value / NULL
    event_type rows (legal per the events schema; the round-2 ADVICE found
    lead()/dense_rank() mishandled both)."""
    n = draw(st.integers(min_value=1, max_value=16))
    users = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    types = draw(
        st.lists(
            st.one_of(st.none(), st.sampled_from(["click", "view", "purchase"])),
            min_size=n, max_size=n,
        )
    )
    # duplicate-prone second offsets, including equal ts within a user
    secs = draw(st.lists(st.integers(0, 5000), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(0, 12).map(lambda v: v * 0.5)),
            min_size=n, max_size=n,
        )
    )
    base = dt.datetime(2024, 1, 1)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([base + dt.timedelta(seconds=s * 60) for s in secs], pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(['{"k": %d}' % (i % 3) for i in range(n)], pa.string()),
        }
    )


def _run_both_events(name: str, events: pa.Table, tmp_path_factory) -> None:
    from metareadability_ray.qa import REGISTRY

    d = tmp_path_factory.mktemp("propconf_ev")
    pq.write_table(events, str(d / "events.parquet"))

    spec = REGISTRY[name]
    got = _canon(_ray_table(spec.fn(str(d))))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = _canon(con.execute(spec.sql).fetch_arrow_table())
    con.close()
    import gc

    gc.collect()  # release any actor pool before the next hypothesis example
    assert got == want, f"{name} diverged on generated events"


@pytest.mark.parametrize(
    "name",
    [
        "asof_join", "latest_event_per_user", "sessionize", "value_lead_dense",
        "window_cumsum", "hourly_event_window", "count_distinct_users",
        "hopping_window", "funnel_stages", "value_ranks", "lag_value_delta",
        "pivot_event_sums", "rolling_avg_events", "views_before_click",
        "intersect_users", "except_users", "unpivot_event_sums", "value_histogram",
        "json_props_sum", "event_quartiles", "distinct_event_types",
        "zscore_events", "first_last_value", "quantile_sketch_value",
        "full_outer_join", "correlated_users", "markov_transitions",
        "cohort_retention", "interval_overlap_users", "path_trigrams",
        "user_value_trend", "decayed_user_score", "sliding_distinct_users",
        "event_type_overlap",
    ],
)
def test_query_conformance_on_generated_events(ray_session, tmp_path_factory, name):
    @settings(**_PROP)
    @given(events_table())
    def inner(events):
        _run_both_events(name, events, tmp_path_factory)

    inner()


# ------------------------------------------------- orders / customer tables

@st.composite
def orders_customer_tables(draw):
    """Join-edge shapes the sf data holds constant: order custkeys with NO
    matching customer, customers with no orders, an empty >9000-acctbal dim
    slice (the left_outer_join broadcast side), single-status order sets.
    Money columns use exact .25 steps so float sums are exact both engines."""
    nc = draw(st.integers(min_value=1, max_value=5))
    no = draw(st.integers(min_value=1, max_value=16))
    cust = pa.table(
        {
            "c_custkey": pa.array(range(nc), pa.int64()),
            "c_name": pa.array([f"Customer#{i}" for i in range(nc)], pa.string()),
            "c_nationkey": pa.array([i % 3 for i in range(nc)], pa.int32()),
            "c_acctbal": pa.array(
                draw(
                    st.lists(
                        st.integers(0, 44000).map(lambda v: v * 0.25),
                        min_size=nc, max_size=nc,
                    )
                ),
                pa.float64(),
            ),
            "c_mktsegment": pa.array(
                draw(st.lists(st.sampled_from(["AUTO", "HOUSE"]), min_size=nc, max_size=nc)),
                pa.string(),
            ),
        }
    )
    base = dt.datetime(2023, 6, 1)
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(no), pa.int64()),
            # custkeys beyond nc-1 → orders with NO customer (join dropouts)
            "o_custkey": pa.array(
                draw(st.lists(st.integers(0, nc + 2), min_size=no, max_size=no)), pa.int64()
            ),
            "o_orderstatus": pa.array(
                draw(st.lists(st.sampled_from(["F", "O", "P"]), min_size=no, max_size=no)),
                pa.string(),
            ),
            "o_totalprice": pa.array(
                [((i * 7) % 1000) * 0.25 + 1.0 for i in range(no)], pa.float64()
            ),
            "o_orderdate": pa.array(
                [base + dt.timedelta(days=i % 40) for i in range(no)], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                draw(
                    st.lists(
                        st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
                        min_size=no, max_size=no,
                    )
                ),
                pa.string(),
            ),
        }
    )
    # nation: fewer rows than the customers reference (nationkey 0-2) so
    # some customers point at a MISSING nation (three-way-join dropouts)
    nn = draw(st.integers(min_value=1, max_value=3))
    nation = pa.table(
        {
            "n_nationkey": pa.array(range(nn), pa.int32()),
            "n_name": pa.array([f"NATION{i}" for i in range(nn)], pa.string()),
            "n_regionkey": pa.array([i % 2 for i in range(nn)], pa.int32()),
        }
    )
    return cust, orders, nation


def _run_both_rel(name: str, cust: pa.Table, orders: pa.Table, nation: pa.Table, tmp_path_factory) -> None:
    from metareadability_ray.qa import REGISTRY

    d = tmp_path_factory.mktemp("propconf_rel")
    pq.write_table(cust, str(d / "customer.parquet"))
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(nation, str(d / "nation.parquet"))

    spec = REGISTRY[name]
    got = _canon(_ray_table(spec.fn(str(d))))

    con = duckdb.connect()
    for t in ("customer", "orders", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    want = _canon(con.execute(spec.sql).fetch_arrow_table())
    con.close()
    import gc

    gc.collect()  # release any actor pool before the next hypothesis example
    assert got == want, f"{name} diverged on generated customer/orders/nation"


@pytest.mark.parametrize(
    "name",
    [
        "join_customer_orders", "left_outer_join", "semi_join_customers",
        "anti_join_customers", "topk_orders", "mode_priority",
        "collect_set_priorities", "rollup_orders", "grouping_sets_orders",
        "cube_orders", "three_way_join", "union_priority", "range_join_bands",
        "pareto_frontier",
    ],
)
def test_query_conformance_on_generated_relational(ray_session, tmp_path_factory, name):
    @settings(**_PROP)
    @given(orders_customer_tables())
    def inner(tables):
        _run_both_rel(name, tables[0], tables[1], tables[2], tmp_path_factory)

    inner()


# --------------------------------------- lineitem / part / supplier tables

@st.composite
def lineitem_part_supplier_tables(draw):
    """Edge shapes: zero rows surviving filter_project's predicate,
    lineitems referencing missing parts (broadcast-join dropouts),
    single-flag lineitem sets, negative supplier balances. Quantities and
    prices are exact .25 steps so float sums are exact on both engines."""
    nl = draw(st.integers(min_value=1, max_value=16))
    np_ = draw(st.integers(min_value=1, max_value=4))
    ns = draw(st.integers(min_value=1, max_value=5))
    li = pa.table(
        {
            "l_orderkey": pa.array([i // 2 for i in range(nl)], pa.int64()),
            "l_partkey": pa.array(
                draw(st.lists(st.integers(0, np_ + 2), min_size=nl, max_size=nl)), pa.int64()
            ),
            "l_suppkey": pa.array([i % (ns + 1) for i in range(nl)], pa.int64()),
            "l_linenumber": pa.array([i % 4 for i in range(nl)], pa.int32()),
            "l_quantity": pa.array(
                draw(
                    st.lists(st.integers(0, 200).map(lambda v: v * 0.25), min_size=nl, max_size=nl)
                ),
                pa.float64(),
            ),
            "l_extendedprice": pa.array([((i * 13) % 800) * 0.25 for i in range(nl)], pa.float64()),
            "l_discount": pa.array(
                draw(
                    st.lists(st.integers(0, 40).map(lambda v: v * 0.0025), min_size=nl, max_size=nl)
                ),
                pa.float64(),
            ),
            "l_tax": pa.array([0.0] * nl, pa.float64()),
            "l_returnflag": pa.array(
                draw(st.lists(st.sampled_from(["A", "N", "R"]), min_size=nl, max_size=nl)),
                pa.string(),
            ),
            "l_linestatus": pa.array(
                draw(st.lists(st.sampled_from(["F", "O"]), min_size=nl, max_size=nl)), pa.string()
            ),
            "l_shipdate": pa.array(
                [dt.datetime(2023, 1, 1) + dt.timedelta(days=i % 90) for i in range(nl)],
                pa.timestamp("us"),
            ),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(range(np_), pa.int64()),
            "p_name": pa.array(
                draw(
                    st.lists(
                        st.sampled_from(["ivory navy", "plum", "red green blue", ""]),
                        min_size=np_, max_size=np_,
                    )
                ),
                pa.string(),
            ),
            "p_brand": pa.array([f"Brand#{i % 3}" for i in range(np_)], pa.string()),
            "p_type": pa.array(["STANDARD"] * np_, pa.string()),
            "p_size": pa.array([i % 50 for i in range(np_)], pa.int32()),
            "p_retailprice": pa.array([100.25 * (i + 1) for i in range(np_)], pa.float64()),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(range(ns), pa.int64()),
            "s_name": pa.array([f"Supplier#{i}" for i in range(ns)], pa.string()),
            "s_nationkey": pa.array([i % 2 for i in range(ns)], pa.int32()),
            "s_acctbal": pa.array(
                draw(
                    st.lists(
                        st.integers(-4000, 40000).map(lambda v: v * 0.25),
                        min_size=ns, max_size=ns,
                    )
                ),
                pa.float64(),
            ),
        }
    )
    # orders covering the lineitem orderkeys (plus one extra), with a
    # drawn priority mix so bloom_semi_join sees 0..all urgent builds
    no2 = nl // 2 + 2
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(no2), pa.int64()),
            "o_custkey": pa.array([i % 3 for i in range(no2)], pa.int64()),
            "o_orderstatus": pa.array(["F"] * no2, pa.string()),
            "o_totalprice": pa.array([100.25 * (i + 1) for i in range(no2)], pa.float64()),
            "o_orderdate": pa.array(
                [dt.datetime(2023, 6, 1) + dt.timedelta(days=i) for i in range(no2)],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                draw(
                    st.lists(
                        st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
                        min_size=no2, max_size=no2,
                    )
                ),
                pa.string(),
            ),
        }
    )
    return li, part, supplier, orders


def _run_both_lps(name, li, part, supplier, orders, tmp_path_factory) -> None:
    from metareadability_ray.qa import REGISTRY

    d = tmp_path_factory.mktemp("propconf_lps")
    pq.write_table(li, str(d / "lineitem.parquet"))
    pq.write_table(part, str(d / "part.parquet"))
    pq.write_table(supplier, str(d / "supplier.parquet"))
    pq.write_table(orders, str(d / "orders.parquet"))

    spec = REGISTRY[name]
    got = _canon(_ray_table(spec.fn(str(d))))

    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    want = _canon(con.execute(spec.sql).fetch_arrow_table())
    con.close()
    import gc

    gc.collect()  # release any actor pool before the next hypothesis example
    assert got == want, f"{name} diverged on generated lineitem/part/supplier/orders"


@pytest.mark.parametrize(
    "name",
    [
        "filter_project", "pricing_summary", "string_agg_status",
        "explode_part_names", "broadcast_join_part", "supplier_balance_stats",
        "corr_lineitem", "bloom_semi_join", "fuzzy_name_pairs",
    ],
)
def test_query_conformance_on_generated_lps(ray_session, tmp_path_factory, name):
    @settings(**_PROP)
    @given(lineitem_part_supplier_tables())
    def inner(tables):
        _run_both_lps(name, tables[0], tables[1], tables[2], tables[3], tmp_path_factory)

    inner()


# ----------------------------------------------------------- embeddings tables

@st.composite
def embeddings_table(draw):
    """Adversarial vector shapes: duplicate vectors (exact near-dups),
    single-vector labels, tiny corpora smaller than k, axis-aligned vectors
    (cosine ties). Components are 0.25 steps so float32→float64 roundtrips
    exactly and both engines sum identically; the zero vector is excluded
    (normalization would divide by zero — the generators never produce it,
    matching the driver's testdata)."""
    n = draw(st.integers(min_value=2, max_value=12))
    dim = 4
    comps = draw(
        st.lists(
            st.lists(st.integers(-4, 4).map(lambda v: v * 0.25), min_size=dim, max_size=dim)
            .filter(lambda v: any(x != 0 for x in v)),
            min_size=n, max_size=n,
        )
    )
    labels = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(comps, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def _run_both_emb(name, emb, docs, tmp_path_factory) -> None:
    from metareadability_ray.qa import REGISTRY

    d = tmp_path_factory.mktemp("propconf_emb")
    pq.write_table(emb, str(d / "embeddings.parquet"))
    if docs is not None:
        pq.write_table(docs, str(d / "documents.parquet"))

    spec = REGISTRY[name]
    got = _canon(_ray_table(spec.fn(str(d))))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')")
    if docs is not None:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    want = _canon(con.execute(spec.sql).fetch_arrow_table())
    con.close()
    import gc

    gc.collect()  # release any actor pool before the next hypothesis example
    assert got == want, f"{name} diverged on generated embeddings"


@pytest.mark.parametrize(
    "name", ["knn_bruteforce", "neardup_cosine", "label_stats", "label_centroids",
             "centroid_confusion", "embedding_dim_stats"]
)
def test_query_conformance_on_generated_embeddings(ray_session, tmp_path_factory, name):
    @settings(max_examples=max(6, _N_EX * 6 // 8), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(embeddings_table())
    def inner(emb):
        _run_both_emb(name, emb, None, tmp_path_factory)

    inner()


def test_embedding_coverage_conformance_on_generated(ray_session, tmp_path_factory):
    @settings(max_examples=_N_EX, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(embeddings_table(), documents_table())
    def inner(emb, docs):
        _run_both_emb("embedding_coverage", emb, docs, tmp_path_factory)

    inner()


def test_doc_embedding_join_conformance_on_generated(ray_session, tmp_path_factory):
    @settings(max_examples=max(6, _N_EX * 6 // 8), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(embeddings_table(), documents_table())
    def inner(emb, docs):
        _run_both_emb("doc_embedding_join", emb, docs, tmp_path_factory)

    inner()


def test_hybrid_search_rrf_conformance_on_generated(ray_session, tmp_path_factory):
    """Dual-table (documents for BM25, embeddings for cosine) RRF fusion vs
    the composed SQL twin — exercises empty text-side lists (no term
    matches), a missing query vector (no vec_id 0), and one-sided docs."""

    @settings(max_examples=max(6, _N_EX * 6 // 8), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(embeddings_table(), documents_table())
    def inner(emb, docs):
        _run_both_emb("hybrid_search_rrf", emb, docs, tmp_path_factory)

    inner()


# -------------------------------------------- rows-only queries: smoke harness

# No SQL twin exists for these (sketches, LSH, model-ish kernels) — the
# conformance property is weaker but still real: on generated data the query
# must RUN and produce a schema-stable result (no null-key crashes, no
# empty-input schema loss — the two failure classes every SQL-checked family
# above actually hit).

_ROWS_ONLY_DOCS = [
    "approx_heavy_hitters", "minhash_lsh_pairs", "simhash", "dedup_survivors_lsh",
    "simhash_hamming_pairs", "pagerank_dup", "dedup_survivors_central",
    # actor-pool pipelines (synth media/pdf/pages from documents): the smoke
    # asserts the full actor plumbing tolerates null/empty/unicode text
    "media_features", "media_frame_sample", "pdf_layout_spans", "extract_pages",
    "anchor_text_index", "url_pagerank", "url_hits", "distinct_ngram_hll",
    "compression_ratio", "lsh_recall_audit", "extraction_coverage",
    "html_curation_run",
]
_ROWS_ONLY_EVENTS = ["hll_distinct_users", "similar_users_sketch", "burst_detect"]
_ROWS_ONLY_EMB = ["lsh_bucket_stats", "lsh_neardup_pairs", "semdedup", "quantize_int8", "pca_project", "ivf_topk", "pq_topk", "mmr_select", "kmeanspp_sample", "ann_recall_audit"]


def _smoke(name, d):
    import gc

    from metareadability_ray.qa import REGISTRY

    res = REGISTRY[name].fn(str(d))
    t = _ray_table(res)
    ncols = t.num_columns
    # release the query's actor pool NOW: Ray 2.49 leaks MapWorker actor
    # handles per completed dataset; across hypothesis examples the leaked
    # actors hold every CPU and the next dataset wedges forever (same fix
    # as run_extraction's explicit collect)
    del res, t
    gc.collect()
    assert ncols > 0, f"{name} lost its schema on generated data"


@pytest.mark.parametrize("name", _ROWS_ONLY_DOCS)
def test_rows_only_smoke_on_generated_documents(fresh_ray_session, tmp_path_factory, name):
    @settings(max_examples=max(4, _N_EX // 2), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(documents_table())
    def inner(docs):
        d = tmp_path_factory.mktemp("propsmoke_doc")
        pq.write_table(docs, str(d / "documents.parquet"))
        _smoke(name, d)

    inner()


@pytest.mark.parametrize("name", _ROWS_ONLY_EVENTS)
def test_rows_only_smoke_on_generated_events(fresh_ray_session, tmp_path_factory, name):
    @settings(max_examples=max(4, _N_EX // 2), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(events_table())
    def inner(events):
        d = tmp_path_factory.mktemp("propsmoke_ev")
        pq.write_table(events, str(d / "events.parquet"))
        _smoke(name, d)

    inner()


@pytest.mark.parametrize("name", _ROWS_ONLY_EMB)
def test_rows_only_smoke_on_generated_embeddings(fresh_ray_session, tmp_path_factory, name):
    @settings(max_examples=max(4, _N_EX // 2), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(embeddings_table())
    def inner(emb):
        d = tmp_path_factory.mktemp("propsmoke_emb")
        pq.write_table(emb, str(d / "embeddings.parquet"))
        _smoke(name, d)

    inner()


def test_cluster_topics_smoke_on_generated(ray_session, tmp_path_factory):
    """Dual-table (embeddings for k-means, documents for the term stream)
    topic labeling: must run and stay self-consistent on adversarial
    generated corpora (tiny k_eff < n_clusters, null texts/ids, unicode)."""
    @settings(max_examples=max(4, _N_EX // 2), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(documents_table(), embeddings_table())
    def inner(docs, emb):
        import gc

        from metareadability_ray.qa import REGISTRY

        d = tmp_path_factory.mktemp("propsmoke_topics")
        pq.write_table(docs, str(d / "documents.parquet"))
        pq.write_table(emb, str(d / "embeddings.parquet"))
        t = REGISTRY["cluster_topics"].fn(str(d))
        assert t.num_rows >= 1
        assert sum(r["n_docs"] for r in t.to_pylist()) == emb.num_rows
        gc.collect()

    inner()


def test_dedup_cascade_smoke_on_generated(ray_session, tmp_path_factory):
    """The composed cascade needs BOTH tables (documents for exact/LSH,
    embeddings for the semantic stage) — its own dual-table smoke: must run
    and stay self-consistent on adversarial generated corpora."""
    @settings(max_examples=max(4, _N_EX // 2), deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
    @given(documents_table(), embeddings_table())
    def inner(docs, emb):
        import gc

        from metareadability_ray.qa import REGISTRY

        d = tmp_path_factory.mktemp("propsmoke_cascade")
        pq.write_table(docs, str(d / "documents.parquet"))
        pq.write_table(emb, str(d / "embeddings.parquet"))
        t = REGISTRY["dedup_cascade"].fn(str(d))
        rows = t.to_pylist()
        assert [r["stage"] for r in rows] == ["exact", "neardup_lsh", "semantic"]
        prev = docs.num_rows
        for r in rows:
            assert r["n_removed"] >= 0 and r["n_removed"] + r["n_remaining"] == prev
            prev = r["n_remaining"]
        gc.collect()

    inner()
