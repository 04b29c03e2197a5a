"""QA registry: every SURVEY.md §2 operator exposed as a named query with
(ray_fn, oracle_sql). Consumed by ``__ray_entry__.py`` and the local
verification harness (scripts/verify_queries.py).

oracle_sql is ANSI SQL DuckDB runs over the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). ``sql=None`` → non-SQL-expressible op (driver does rows-only).

Float policy (why every ROUND appears in pairs): any double that crosses the
compare boundary is rounded identically on both sides; thresholds on floats
are avoided in favour of integer cross-multiplication where exactness
matters (see ngram_jaccard_pairs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from metareadability_ray.pipelines import clustering as C
from metareadability_ray.pipelines import relational as R
from metareadability_ray.pipelines import relational2 as R2
from metareadability_ray.pipelines import relational3 as R3
from metareadability_ray.pipelines import textops as T
from metareadability_ray.pipelines import textops2 as T2
from metareadability_ray.pipelines import vectors as V
from metareadability_ray.pipelines import training_prep as TP
from metareadability_ray.pipelines import webtext as W


@dataclass(frozen=True)
class QASpec:
    fn: Callable
    sql: Optional[str]
    spec_id: str  # MR-* operator id(s) from SURVEY.md §2


# k=3 shingle-set CTEs over `documents`, shared by ngram_jaccard_pairs and
# the dup_clusters recursive-closure oracle (same edge definition on both).
_NGRAM_CTES = r"""toks AS (
            SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN length(t) = 0 THEN []
                        WHEN length(t) < 3 THEN [array_to_string(t, ' ')]
                        ELSE list_transform(generate_series(1, length(t) - 2),
                                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   END AS shingles
            FROM toks
        ), ds AS (
            SELECT DISTINCT doc_id, shingle
            FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
        ), sz AS (
            SELECT doc_id, count(*) AS set_size FROM ds GROUP BY doc_id
        ), inter_t AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )"""


REGISTRY: dict[str, QASpec] = {
    # ---------------------------------------------------------- relational
    "filter_project": QASpec(
        R.q_filter_project,
        """
        SELECT l_orderkey, l_partkey, l_quantity, l_discount
        FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        """,
        "MR-F1,MR-P1",
    ),
    "pricing_summary": QASpec(
        R.q_pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
               printf('%.2f', sum(l_quantity))      AS sum_qty,
               printf('%.2f', sum(l_extendedprice)) AS sum_base_price,
               printf('%.4f', avg(l_discount))      AS avg_disc,
               count(*)                       AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "MR-G1,MR-G2",
    ),
    "join_customer_orders": QASpec(
        R.q_join_customer_orders,
        """
        SELECT c_mktsegment, count(*) AS n_orders,
               printf('%.2f', sum(o_totalprice)) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """,
        "MR-J3",
    ),
    "three_way_join": QASpec(
        R.q_three_way_join,
        """
        SELECT n_name, count(*) AS n_orders,
               printf('%.2f', sum(o_totalprice)) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
        "MR-J3,MR-J2",
    ),
    "broadcast_join_part": QASpec(
        R.q_broadcast_join_part,
        """
        SELECT p_brand, printf('%.2f', sum(l_quantity)) AS sum_qty, count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        """,
        "MR-J2",
    ),
    "semi_join_customers": QASpec(
        R.q_semi_join_customers,
        """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "MR-J2(semi)",
    ),
    "anti_join_customers": QASpec(
        R.q_anti_join_customers,
        """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """,
        "MR-J2(anti),MR-D3",
    ),
    "distinct_event_types": QASpec(
        R.q_distinct_event_types,
        "SELECT DISTINCT event_type FROM events",
        "MR-G3",
    ),
    "topk_orders": QASpec(
        R.q_topk_orders,
        """
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "MR-O1,MR-O2",
    ),
    "latest_event_per_user": QASpec(
        R.q_latest_event_per_user,
        """
        SELECT user_id, event_id, event_type FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "MR-D1",
    ),
    "union_priority": QASpec(
        R.q_union_priority,
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM (
            SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        ) GROUP BY o_orderstatus, o_orderpriority
        """,
        "MR-D2",
    ),
    "json_props_sum": QASpec(
        R.q_json_props_sum,
        """
        SELECT event_type,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type
        """,
        "MR-X json_get",
    ),
    "hourly_event_window": QASpec(
        R.q_hourly_event_window,
        """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n, printf('%.2f', sum(value)) AS sum_value
        FROM events GROUP BY 1, 2
        """,
        "windowed-aggregate",
    ),
    # ------------------------------------------------------------- textops
    "token_stats": QASpec(
        T.q_token_stats,
        r"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(length(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sum_tokens,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
        """,
        "token-counting",
    ),
    "quality_score": QASpec(
        T.q_quality_score,
        r"""
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
               CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
               CAST(length(regexp_extract_all(text, '\b(the|a|and|of|to|in)\b')) AS BIGINT) AS n_stopwords,
               CAST(CASE WHEN length(regexp_extract_all(text, '\S+')) >= 10
                          AND n_chars >= 50
                          AND 2 * length(regexp_extract_all(text, '[A-Za-z]')) >= n_chars
                    THEN 1 ELSE 0 END AS INT) AS quality_ok
        FROM documents
        """,
        "quality-scoring",
    ),
    "langid": QASpec(
        T.q_langid,
        r"""
        WITH s AS (
            -- coalesce pins null text to score 0 on every marker -> 'und',
            -- matching the Ray kernel's fill_null(0) exactly
            SELECT length(regexp_extract_all(coalesce(text, ''), '\b(the|and|of|to|a)\b'))    AS s_en,
                   length(regexp_extract_all(coalesce(text, ''), '\b(el|la|de|que|los)\b'))   AS s_es,
                   length(regexp_extract_all(coalesce(text, ''), '\b(der|die|und|das|ist)\b')) AS s_de,
                   length(regexp_extract_all(coalesce(text, ''), '\b(le|les|des|et|une)\b'))  AS s_fr,
                   length(regexp_extract_all(coalesce(text, ''), '[一-鿿]'))                   AS s_zh
            FROM documents
        ), p AS (
            SELECT CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
                        WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
                        WHEN s_es >= greatest(s_de, s_fr, s_zh) THEN 'es'
                        WHEN s_de >= greatest(s_fr, s_zh) THEN 'de'
                        WHEN s_fr >= s_zh THEN 'fr'
                        ELSE 'zh' END AS lang_pred
            FROM s
        )
        SELECT lang_pred, count(*) AS n_docs FROM p GROUP BY lang_pred
        """,
        "language-ID",
    ),
    "bpe_token_stats": QASpec(
        T.q_bpe_token_stats,
        r"""
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
               CAST(length(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens
        FROM documents
        """,
        "token-counting(bpe-ish)",
    ),
    "doc_fingerprint": QASpec(
        T.q_doc_fingerprint,
        r"""
        SELECT doc_id, md5(text) AS fingerprint,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        FROM documents
        """,
        "fingerprinting",
    ),
    "exact_dedup": QASpec(
        T.q_exact_dedup,
        """
        SELECT md5(text) AS text_hash,
               CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
        """,
        "MR-D1(exact-dedup)",
    ),
    "ngram_jaccard_pairs": QASpec(
        T.q_ngram_jaccard_pairs,
        r"""
        WITH """ + _NGRAM_CTES + r"""
        SELECT doc_a, doc_b, inter,
               (sa.set_size + sb.set_size - inter) AS union_size
        FROM inter_t
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE inter * 5 >= 1 * (sa.set_size + sb.set_size - inter)
        """,
        "MR-D4(ngram-jaccard)",
    ),
    "dup_clusters": QASpec(
        C.q_dup_clusters,
        r"""
        WITH RECURSIVE """ + _NGRAM_CTES + r""",
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter_t
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE inter * 5 >= 1 * (sa.set_size + sb.set_size - inter)
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
        """,
        "dedup(connected-components)",
    ),
    "dedup_survivors": QASpec(
        C.q_dedup_survivors,
        r"""
        WITH RECURSIVE """ + _NGRAM_CTES + r""",
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter_t
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE inter * 5 >= 1 * (sa.set_size + sb.set_size - inter)
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        clusters AS (
            SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src
        )
        SELECT d.doc_id, d.lang FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM clusters c
                          WHERE c.doc_id = d.doc_id AND c.cluster_id <> d.doc_id)
        """,
        "dedup(survivor-filter)",
    ),
    # --------------------------------------------------- advanced relational
    "left_outer_join": QASpec(
        R2.q_left_outer_join,
        """
        SELECT o_orderkey, o_custkey, c_name
        FROM orders LEFT JOIN (
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000
        ) c ON o_custkey = c.c_custkey
        """,
        "MR-J3(left-outer)",
    ),
    "asof_join": QASpec(
        R2.q_asof_join,
        """
        WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             views  AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        SELECT clicks.event_id, clicks.user_id,
               views.ts AS view_ts, views.value AS view_value
        FROM clicks ASOF LEFT JOIN views
          ON clicks.user_id = views.user_id AND clicks.ts >= views.ts
        """,
        "custom(as-of-join)",
    ),
    "window_cumsum": QASpec(
        R2.q_window_cumsum,
        """
        SELECT event_id, user_id,
               printf('%.2f', sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS cum_value
        FROM events
        """,
        "custom(running-window-aggregate)",
    ),
    "explode_part_names": QASpec(
        R2.q_explode_part_names,
        "SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part",
        "flat_map/explode",
    ),
    "sample_deterministic": QASpec(
        R2.q_sample_deterministic,
        "SELECT doc_id, lang FROM documents WHERE substring(md5(text), 1, 1) <= '3'",
        "MR-O3(deterministic-sample)",
    ),
    "supplier_balance_stats": QASpec(
        R2.q_supplier_balance_stats,
        """
        SELECT s_nationkey, count(*) AS n_suppliers,
               min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal,
               printf('%.2f', sum(s_acctbal)) AS sum_bal
        FROM supplier GROUP BY s_nationkey
        """,
        "MR-G2(min/max)",
    ),
    "rollup_orders": QASpec(
        R2.q_rollup_orders,
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "MR-G2(rollup)",
    ),
    "funnel_stages": QASpec(
        R2.q_funnel_stages,
        """
        WITH v AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        ), stages AS (
            SELECT u.user_id,
                   CASE WHEN p.user_id IS NOT NULL THEN 3
                        WHEN c.user_id IS NOT NULL THEN 2
                        WHEN v.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS stage
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN v ON u.user_id = v.user_id
            LEFT JOIN c ON u.user_id = c.user_id
            LEFT JOIN p ON u.user_id = p.user_id
        )
        SELECT stage, count(*) AS n_users FROM stages GROUP BY stage
        """,
        "custom(sequential-funnel)",
    ),
    "sessionize": QASpec(
        R2.q_sessionize,
        """
        SELECT event_id, user_id,
               CAST(SUM(CASE WHEN prev_ts IS NULL
                              OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (SELECT event_id, user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events)
        """,
        "custom(gap-sessionization)",
    ),
    "winnow_fingerprint": QASpec(
        T.q_winnow_fingerprint,
        r"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        ), gl AS (
            SELECT doc_id,
                   list_transform(generate_series(1, length(t) - 2),
                                  i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS hs
            FROM toks WHERE length(t) >= 3
        ), grams AS (
            SELECT doc_id, unnest(generate_series(1, length(hs))) AS i, unnest(hs) AS h
            FROM gl
        ), wm AS (
            SELECT doc_id, i,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
                   count(*) OVER (PARTITION BY doc_id) AS n
            FROM grams
        )
        SELECT doc_id, CAST(count(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
               min(wmin) AS min_fingerprint
        FROM wm WHERE i <= greatest(n - 3, 1) GROUP BY doc_id
        """,
        "fingerprinting(winnowing-rolling-hash)",
    ),
    "stratified_sample": QASpec(
        T.q_stratified_sample,
        """
        SELECT doc_id, lang FROM documents
        WHERE CASE WHEN lang = 'en' THEN substring(md5(text), 1, 1) = '0'
                   ELSE substring(md5(text), 1, 1) <= '7' END
        """,
        "sampling(stratified-data-mixing)",
    ),
    "topk_docs_per_lang": QASpec(
        T.q_topk_docs_per_lang,
        """
        SELECT doc_id, lang, n_chars FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 5
        """,
        "MR-O2(grouped-topk)",
    ),
    "median_doc_length": QASpec(
        T.q_median_doc_length,
        """
        SELECT lang, printf('%.1f', median(n_chars)) AS median_chars,
               count(*) AS n_docs
        FROM documents GROUP BY lang
        """,
        "MR-G2(exact-median)",
    ),
    "rolling_avg_events": QASpec(
        R2.q_rolling_avg_events,
        """
        SELECT event_id, user_id,
               printf('%.2f', avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS avg3
        FROM events
        """,
        "custom(bounded-frame-window)",
    ),
    "redact_pii": QASpec(
        T.q_redact_pii,
        r"""
        SELECT doc_id,
               regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   'https?://[^\s]+', '<URL>', 'g') AS text_clean,
               CAST(length(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(length(regexp_extract_all(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   'https?://[^\s]+')) AS BIGINT) AS n_urls
        FROM documents
        """,
        "cleaning(pii-redaction)",
    ),
    # ------------------------------------------------------- relational batch 3
    "count_distinct_users": QASpec(
        R3.q_count_distinct_users,
        "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type",
        "MR-G2(exact-count-distinct)",
    ),
    "pivot_event_sums": QASpec(
        R3.q_pivot_event_sums,
        """
        SELECT user_id,
               printf('%.2f', coalesce(sum(value) FILTER (WHERE event_type = 'view'), 0)) AS sum_view,
               printf('%.2f', coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0)) AS sum_click,
               printf('%.2f', coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0)) AS sum_purchase,
               count(*) AS n_events
        FROM events GROUP BY user_id
        """,
        "custom(pivot)",
    ),
    "corr_lineitem": QASpec(
        R3.q_corr_lineitem,
        """
        SELECT l_returnflag, regexp_replace(printf('%.4f', corr(l_quantity, l_extendedprice)), '^-(0(\\.0+)?)$', '\\1') AS corr_qp,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """,
        "MR-G2(two-pass-corr)",
    ),
    "lag_value_delta": QASpec(
        R3.q_lag_value_delta,
        """
        SELECT event_id, user_id,
               printf('%.2f', value - lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS delta
        FROM events
        """,
        "custom(lag-window)",
    ),
    "range_join_bands": QASpec(
        R3.q_range_join_bands,
        """
        WITH bands(band, lo, hi) AS (VALUES
            ('low', 0.0, 100000.0), ('mid', 100000.0, 200000.0),
            ('high', 200000.0, 300000.0), ('top', 300000.0, 1e9))
        SELECT band, count(*) AS n_orders, printf('%.2f', sum(o_totalprice)) AS sum_price
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
        """,
        "custom(banded-range-join)",
    ),
    "mode_priority": QASpec(
        R3.q_mode_priority,
        """
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders GROUP BY 1, 2)
        QUALIFY row_number() OVER (
            PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) = 1
        """,
        "MR-G2(mode)",
    ),
    "string_agg_status": QASpec(
        R3.q_string_agg_status,
        """
        SELECT l_returnflag,
               string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
        FROM lineitem GROUP BY l_returnflag
        """,
        "MR-G2(ordered-string-agg)",
    ),
    "grouping_sets_orders": QASpec(
        R3.q_grouping_sets_orders,
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """,
        "MR-G2(grouping-sets)",
    ),
    "cube_orders": QASpec(
        R3.q_cube_orders,
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
        "MR-G2(cube)",
    ),
    "first_last_value": QASpec(
        R3.q_first_last_value,
        """
        SELECT user_id, printf('%.2f', min_by(value, ts)) AS first_value,
               printf('%.2f', max_by(value, ts)) AS last_value,
               count(*) AS n_events
        FROM events GROUP BY user_id
        """,
        "custom(first/last-value,argmin-combiner)",
    ),
    "collect_set_priorities": QASpec(
        R3.q_collect_set_priorities,
        """
        SELECT o_orderstatus,
               array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
        """,
        "MR-G2(collect-set)",
    ),
    "quantile_sketch_value": QASpec(
        R3.q_quantile_sketch_value,
        # exact twin of the fixed-width-histogram sketch: same buckets
        # (floor(value/0.25) — power-of-two width, so the division is exact
        # in both engines), same integer crossing rule cum·100 ≥ q100·n,
        # same lower-edge pick. The sketch is batching-invariant, which is
        # what makes this an equality oracle rather than a tolerance check.
        """
        WITH h AS (
            SELECT event_type, CAST(floor(value/0.25) AS BIGINT) AS b,
                   count(*) AS c
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, b
        ),
        cum AS (
            SELECT event_type, b,
                   CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b) AS BIGINT) AS cc,
                   CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
            FROM h
        )
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               printf('%.2f', 0.25*min(CASE WHEN cc*100 >= 50*n THEN b END)) AS p50,
               printf('%.2f', 0.25*min(CASE WHEN cc*100 >= 90*n THEN b END)) AS p90,
               printf('%.2f', 0.25*min(CASE WHEN cc*100 >= 99*n THEN b END)) AS p99
        FROM cum GROUP BY event_type
        """,
        "MR-G4(quantile-sketch)",
    ),
    "hopping_window": QASpec(
        R3.q_hopping_window,
        """
        SELECT window_start, count(*) AS n, printf('%.2f', sum(value)) AS sum_value
        FROM (
            SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                           time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
                       AS window_start,
                   value
            FROM events)
        GROUP BY window_start
        """,
        "custom(hopping-window)",
    ),
    "views_before_click": QASpec(
        R3.q_views_before_click,
        """
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
        SELECT c.event_id, c.user_id, count(v.ts) AS n_views
        FROM c LEFT JOIN v
          ON v.user_id = c.user_id
         AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts < c.ts
        GROUP BY c.event_id, c.user_id
        """,
        "custom(time-window-range-self-join)",
    ),
    "full_outer_join": QASpec(
        R3.q_full_outer_join,
        """
        WITH p AS (SELECT user_id, count(*) AS n_purch FROM events
                   WHERE event_type = 'purchase' AND value > 150 GROUP BY user_id),
             e AS (SELECT user_id, count(*) AS n_err FROM events
                   WHERE event_type = 'error' AND value > 150 GROUP BY user_id)
        SELECT user_id, n_purch, n_err FROM p FULL JOIN e USING (user_id)
        """,
        "MR-J3(full-outer)",
    ),
    "unpivot_event_sums": QASpec(
        R3.q_unpivot_event_sums,
        """
        WITH w AS (
            SELECT user_id,
                   coalesce(sum(value) FILTER (WHERE event_type = 'view'), 0) AS sum_view,
                   coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0) AS sum_click,
                   coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0) AS sum_purchase
            FROM events GROUP BY user_id)
        SELECT user_id, kind, printf('%.2f', v) AS sum_value
        FROM w UNPIVOT (v FOR kind IN (sum_view, sum_click, sum_purchase))
        """,
        "custom(unpivot-melt)",
    ),
    "bloom_semi_join": QASpec(
        R3.q_bloom_semi_join,
        """
        SELECT l_orderkey, l_quantity FROM lineitem
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
        """,
        "MR-J2(bloom-semi-join)",
    ),
    # ------------------------------------------------------- corpus statistics
    "word_count_topk": QASpec(
        T2.q_word_count_topk,
        r"""
        SELECT token, count(*) AS n FROM (
            SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 20
        """,
        "custom(heavy-hitters-wordcount)",
    ),
    # ------------------------------------------------------- webtext curation
    "common_chunks": QASpec(
        W.q_common_chunks,
        r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                      WHERE doc_id IS NOT NULL),
             ch AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, length(t), 3),
                                                 i -> array_to_string(t[i:i+2], ' '))) AS chunk
                    FROM toks)
        SELECT chunk, count(DISTINCT doc_id) AS n_docs
        FROM ch GROUP BY chunk HAVING count(DISTINCT doc_id) >= 2
        """,
        "custom(ccnet-boilerplate-chunks)",
    ),
    "para_dedup_stats": QASpec(
        W.q_para_dedup_stats,
        r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                      WHERE doc_id IS NOT NULL),
             ch AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, length(t), 3),
                                                 i -> array_to_string(t[i:i+2], ' '))) AS chunk
                    FROM toks),
             common AS (SELECT chunk FROM ch GROUP BY chunk
                        HAVING count(DISTINCT doc_id) >= 2)
        SELECT doc_id, count(*) AS n_chunks,
               count(*) FILTER (WHERE chunk IN (SELECT chunk FROM common)) AS n_common
        FROM ch GROUP BY doc_id
        """,
        "custom(ccnet-paragraph-dedup)",
    ),
    "dup_chunk_ratio": QASpec(
        W.q_dup_chunk_ratio,
        r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                      WHERE doc_id IS NOT NULL),
             ch AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, length(t), 3),
                                                 i -> array_to_string(t[i:i+2], ' '))) AS chunk
                    FROM toks)
        SELECT doc_id, count(*) AS n_chunks, count(DISTINCT chunk) AS n_distinct
        FROM ch GROUP BY doc_id
        """,
        "custom(gopher-dup-fraction)",
    ),
    "token_entropy": QASpec(
        W.q_token_entropy,
        r"""
        WITH tc AS (
            SELECT doc_id, token, count(*) AS c FROM (
                SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
                FROM documents WHERE doc_id IS NOT NULL)
            GROUP BY doc_id, token),
        tot AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id)
        SELECT tc.doc_id, printf('%.4f', -sum((c / n) * log2(c / n))) AS entropy
        FROM tc JOIN tot USING (doc_id) GROUP BY tc.doc_id
        """,
        "custom(unigram-entropy-quality)",
    ),
    "top_bigram_fraction": QASpec(
        W.q_top_bigram_fraction,
        r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                      WHERE doc_id IS NOT NULL),
             bi AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, length(t) - 1),
                                                 i -> t[i] || ' ' || t[i+1])) AS bigram
                    FROM toks),
             bc AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram)
        SELECT doc_id, max(c) AS top_bigram_n, CAST(sum(c) AS BIGINT) AS n_bigrams
        FROM bc GROUP BY doc_id
        """,
        "custom(gopher-top-bigram-fraction)",
    ),
    "gopher_repetition": QASpec(
        W.q_gopher_repetition,
        r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                      WHERE doc_id IS NOT NULL),
             g2 AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, length(t) - 1),
                                                 i -> t[i] || ' ' || t[i+1])) AS g
                    FROM toks),
             c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
             s2 AS (SELECT doc_id, max(c) AS top2_n, CAST(sum(c) AS BIGINT) AS n2
                    FROM c2 GROUP BY doc_id),
             g3 AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, length(t) - 2),
                                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
                    FROM toks),
             c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
             s3 AS (SELECT doc_id, max(c) AS top3_n, CAST(sum(c) AS BIGINT) AS n3
                    FROM c3 GROUP BY doc_id),
             g4 AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, length(t) - 3),
                                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
                    FROM toks),
             c4 AS (SELECT doc_id, g, count(*) AS c FROM g4 GROUP BY 1, 2),
             s4 AS (SELECT doc_id, max(c) AS top4_n, CAST(sum(c) AS BIGINT) AS n4
                    FROM c4 GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(top2_n, 0) AS top2_n, COALESCE(n2, 0) AS n2,
               COALESCE(top3_n, 0) AS top3_n, COALESCE(n3, 0) AS n3,
               COALESCE(top4_n, 0) AS top4_n, COALESCE(n4, 0) AS n4
        -- the zeros-row base must carry the SAME null-id filter as toks:
        -- LEFT JOIN USING (doc_id) never matches NULL, so an unfiltered
        -- base emitted a zeros row per anonymous doc the kernel skips
        FROM (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL) d
        LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id) LEFT JOIN s4 USING (doc_id)
        """,
        "custom(gopher-repetition-panel)",
    ),
    "source_mix": QASpec(
        W.q_source_mix,
        """
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               count(DISTINCT lang) AS n_langs
        FROM documents GROUP BY source
        """,
        "custom(data-mixing-report)",
    ),
    "curated_corpus": QASpec(
        W.q_curated_corpus,
        r"""
        WITH RECURSIVE """ + _NGRAM_CTES + r""",
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter_t
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE inter * 5 >= 1 * (sa.set_size + sb.set_size - inter)
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        clusters AS (
            SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src
        ),
        ch AS (SELECT doc_id,
                      unnest(list_transform(generate_series(1, length(t), 3),
                                            i -> array_to_string(t[i:i+2], ' '))) AS chunk
               FROM toks),
        common AS (SELECT chunk FROM ch GROUP BY chunk
                   HAVING count(DISTINCT doc_id) >=
                          (SELECT greatest(2, CAST(ceil(0.002 * count(*)) AS BIGINT))
                           FROM documents)),
        chstat AS (SELECT doc_id, count(*) AS n_chunks,
                          count(*) FILTER (WHERE chunk IN (SELECT chunk FROM common))
                              AS n_common
                   FROM ch GROUP BY doc_id),
        bi AS (SELECT doc_id,
                      unnest(list_transform(generate_series(1, length(t) - 1),
                                            i -> t[i] || ' ' || t[i+1])) AS bigram
               FROM toks),
        bc AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram),
        bistat AS (SELECT doc_id, max(c) AS top_n, CAST(sum(c) AS BIGINT) AS n_bi
                   FROM bc GROUP BY doc_id)
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d
        JOIN chstat USING (doc_id)
        JOIN bistat USING (doc_id)
        WHERE d.n_chars BETWEEN 100 AND 500
          AND chstat.n_common * 2 <= chstat.n_chunks
          AND bistat.top_n * 15 <= bistat.n_bi
          AND NOT EXISTS (SELECT 1 FROM clusters c
                          WHERE c.doc_id = d.doc_id AND c.cluster_id <> d.doc_id)
        """,
        "pipeline(composed-curation)",
    ),
    "weighted_sample": QASpec(
        W.q_weighted_sample,
        """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              < printf('%08x', least(n_chars * 2000000, 4294967295))
        """,
        "MR-O3(length-weighted-sample)",
    ),
    "bigram_topk": QASpec(
        W.q_bigram_topk,
        r"""
        WITH toks AS (SELECT regexp_extract_all(text, '\S+') AS t FROM documents),
             bi AS (SELECT unnest(list_transform(generate_series(1, length(t) - 1),
                                                 i -> t[i] || ' ' || t[i+1])) AS bigram
                    FROM toks)
        SELECT bigram, count(*) AS n FROM bi
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
        """,
        "custom(bigram-collocations)",
    ),
    "event_quartiles": QASpec(
        W.q_event_quartiles,
        """
        WITH q AS (SELECT event_type, value,
                          ntile(4) OVER (PARTITION BY event_type
                                         ORDER BY value, event_id) AS quartile
                   FROM events)
        SELECT event_type, quartile, count(*) AS n,
               min(value) AS min_v, max(value) AS max_v
        FROM q GROUP BY event_type, quartile
        """,
        "custom(ntile-window)",
    ),
    "value_ranks": QASpec(
        W.q_value_ranks,
        """
        SELECT event_id, event_type,
               rank() OVER (PARTITION BY event_type ORDER BY value) AS rnk,
               dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS drnk,
               printf('%.6f', percent_rank() OVER (PARTITION BY event_type
                                                   ORDER BY value)) AS pct
        FROM events
        """,
        "custom(rank-windows)",
    ),
    "value_histogram": QASpec(
        W.q_value_histogram,
        """
        SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS n
        FROM events GROUP BY bucket
        """,
        "custom(width-bucket-histogram)",
    ),
    "zscore_events": QASpec(
        R3.q_zscore_events,
        """
        SELECT event_id, event_type,
               regexp_replace(printf('%.4f', (value - avg(value) OVER (PARTITION BY event_type))
                              / stddev_samp(value) OVER (PARTITION BY event_type)), '^-(0(\\.0+)?)$', '\\1') AS z
        FROM events
        """,
        "custom(zscore-standardize)",
    ),
    "label_centroids": QASpec(
        V.q_label_centroids,
        """
        SELECT label, i - 1 AS dim, regexp_replace(printf('%.4f', avg(e)), '^-(0(\\.0+)?)$', '\\1') AS centroid
        FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
        GROUP BY label, i
        """,
        "custom(vector-centroids)",
    ),
    "train_test_split": QASpec(
        T2.q_train_test_split,
        """
        SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                    ELSE 'test' END AS split,
               lang, count(*) AS n
        FROM documents GROUP BY split, lang
        """,
        "MR-O3(train-test-split)",
    ),
    "bottomk_sample": QASpec(
        T2.q_bottomk_sample,
        """
        SELECT doc_id, lang FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100
        """,
        "MR-O3(bottom-k-priority-sample)",
    ),
    "approx_heavy_hitters": QASpec(
        T2.q_approx_heavy_hitters, None, "custom(misra-gries-sketch)"
    ),
    "tfidf_top_terms": QASpec(
        T2.q_tfidf_top_terms,
        r"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token FROM documents
            WHERE doc_id IS NOT NULL
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
        ), df AS (
            SELECT token, count(*) AS df FROM tf GROUP BY token
        )
        SELECT doc_id, token, tf, df FROM tf JOIN df USING (token)
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY CAST(tf AS DOUBLE) / df DESC, token) <= 3
        """,
        "custom(tfidf-top-terms)",
    ),
    "hll_distinct_users": QASpec(R2.q_hll_distinct_users, None, "MR-G4(HLL-sketch)"),
    "intersect_users": QASpec(
        R2.q_intersect_users,
        """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
        """,
        "MR-D3(intersect)",
    ),
    "except_users": QASpec(
        R2.q_except_users,
        """
        SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error' AND value > 300
        """,
        "MR-D3(except)",
    ),
    "minhash_lsh_pairs": QASpec(T.q_minhash_lsh_pairs, None, "MR-D4(minhash-lsh)"),
    "dedup_survivors_lsh": QASpec(
        C.q_dedup_survivors_lsh, None, "dedup-cluster(lsh-scale-path)"
    ),
    "median_hist": QASpec(
        T.q_median_hist,
        """
        SELECT lang, printf('%.1f', median(n_chars)) AS median_chars,
               count(*) AS n_docs
        FROM documents GROUP BY lang
        """,
        "MR-G2(exact-median, skew-proof histogram)",
    ),
    "simhash": QASpec(T.q_simhash, None, "MR-D4(simhash)"),
    # -------------------------------------------------------------- vectors
    "knn_bruteforce": QASpec(
        V.q_knn_bruteforce,
        """
        WITH q AS (
            SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 5
        )
        SELECT qid AS query_id, vec_id AS neighbor_id,
               regexp_replace(printf('%.4f', list_cosine_similarity(qe, CAST(embedding AS DOUBLE[]))), '^-(0(\\.0+)?)$', '\\1') AS score
        FROM q CROSS JOIN embeddings
        WHERE vec_id <> qid
        QUALIFY row_number() OVER (
            PARTITION BY qid
            ORDER BY list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) DESC, vec_id
        ) <= 10
        """,
        "ANN(bruteforce-topk)",
    ),
    "neardup_cosine": QASpec(
        V.q_neardup_cosine,
        """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               printf('%.4f', list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                     CAST(b.embedding AS DOUBLE[]))) AS score
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45
        """,
        "MR-D4(embedding-cosine)",
    ),
    "lsh_bucket_stats": QASpec(V.q_lsh_bucket_stats, None, "ANN(lsh-buckets)"),
    # recall-bounded ANN — rows-only for the driver; recall vs the exact
    # oracle pinned in tests/test_vectors_ann.py
    "lsh_neardup_pairs": QASpec(V.q_lsh_neardup_pairs, None, "ANN(lsh-in-bucket-pairs)"),
    "ivf_topk": QASpec(V.q_ivf_topk, None, "ANN(ivf-coarse-quantizer)"),
    "label_stats": QASpec(
        V.q_label_stats,
        """
        SELECT label, count(*) AS n_vectors,
               printf('%.2f', sum(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                   CAST(embedding AS DOUBLE[])))) AS sum_norm_sq
        FROM embeddings GROUP BY label
        """,
        "MR-G2(vectors)",
    ),
    "doc_embedding_join": QASpec(
        V.q_doc_embedding_join,
        """
        SELECT d.lang, count(*) AS n_docs,
               printf('%.2f', sum(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])))) AS sum_norm_sq
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        GROUP BY d.lang
        """,
        "MR-J3(cross-corpus)",
    ),
    # ------------------------------------------------ training-set prep
    "decontaminate": QASpec(
        TP.q_decontaminate,
        r"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN length(t) < 8 THEN []
                        ELSE list_transform(generate_series(1, length(t) - 7),
                                            i -> array_to_string(t[i:i+7], ' '))
                   END AS gs
            FROM toks
        ), ds AS (
            SELECT DISTINCT doc_id, g
            FROM (SELECT doc_id, unnest(gs) AS g FROM sh)
        ), bench AS (
            SELECT DISTINCT g FROM ds WHERE doc_id % 10 = 0
        )
        SELECT d.doc_id, count(*) AS n_hits
        FROM ds d JOIN bench b ON d.g = b.g
        WHERE d.doc_id % 10 <> 0
        GROUP BY d.doc_id
        """,
        "decontam(8gram-broadcast)",
    ),
    "shard_assignment": QASpec(
        TP.q_shard_assignment,
        """
        SELECT CAST(strpos('0123456789abcdef',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
                   % 16 AS shard,
               count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE doc_id IS NOT NULL GROUP BY 1
        """,
        "export(md5-shard-routing)",
    ),
    "value_lead_dense": QASpec(
        TP.q_value_lead_dense,
        """
        SELECT event_id, user_id,
               lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
               dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS type_rank
        FROM events
        """,
        "window(lead,dense_rank)",
    ),
}


def _q_media_features(sf_dir: str):
    from metareadability_ray.stages.multimodal import media_features

    return media_features(sf_dir)


def _q_extract_pages(sf_dir: str):
    """Flagship DOM extraction over pages derived from the sf documents table."""
    from metareadability_ray.pipelines.docs2pages import pages_dataset
    from metareadability_ray.pipelines.flagship import extraction_chain

    from metareadability_ray.util import auto_actor_concurrency

    ds = extraction_chain(
        pages_dataset(sf_dir), num_partitions=16, concurrency=auto_actor_concurrency()
    )
    return ds.select_columns(["url", "headline", "pubdate", "authors", "text"])


def _q_media_frames(sf_dir: str):
    from metareadability_ray.stages.multimodal import media_frames

    return media_frames(sf_dir)


def _q_pdf_layout(sf_dir: str):
    from metareadability_ray.stages.pdf_layout import pdf_layout_spans

    return pdf_layout_spans(sf_dir)


REGISTRY["semdedup"] = QASpec(V.q_semdedup, None, "semdedup(kmeans+in-cluster-cosine)")
REGISTRY["quantize_int8"] = QASpec(V.q_quantize_int8, None, "vector-quantize(int8,per-vec-scale)")
REGISTRY["pca_project"] = QASpec(V.q_pca_project, None, "pca(two-pass-cov,broadcast-project)")
REGISTRY["media_features"] = QASpec(_q_media_features, None, "multimodal(decode-stub)")
REGISTRY["media_frame_sample"] = QASpec(_q_media_frames, None, "multimodal(frame-sample,flat_map)")
REGISTRY["pdf_layout_spans"] = QASpec(_q_pdf_layout, None, "pdf-layout(parse-stub,flat_map)")
REGISTRY["extract_pages"] = QASpec(_q_extract_pages, None, "MR-X0(flagship)")
REGISTRY["lm_perplexity"] = QASpec(
    W.q_lm_perplexity,
    r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token FROM documents),
    -- dt filters null ids (per-doc score has no row for an anonymous doc);
    -- gc/tot keep every token: the LM is a corpus statistic (r5 contract)
    dt AS (SELECT doc_id, token, count(*) AS k FROM toks
           WHERE doc_id IS NOT NULL GROUP BY doc_id, token),
    gc AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT count(*) AS n, count(DISTINCT token) AS v FROM toks)
    SELECT dt.doc_id,
           printf('%.4f', sum(dt.k * -log2((gc.c + 1.0) / (tot.n + tot.v))) / sum(dt.k))
               AS bits_per_token
    FROM dt JOIN gc USING (token) CROSS JOIN tot
    GROUP BY dt.doc_id
    """,
    "custom(ccnet-lm-quality,unigram-addone)",
)
REGISTRY["pack_contexts"] = QASpec(
    TP.q_pack_contexts,
    r"""
    WITH n AS (
        SELECT doc_id, length(regexp_extract_all(text, '\S+')) AS n FROM documents),
    c AS (
        SELECT doc_id, n,
               sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - n AS tok_start
        FROM n WHERE n > 0 AND doc_id IS NOT NULL)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(tok_start AS BIGINT) AS tok_start,
           CAST(tok_start // 512 AS BIGINT) AS seq_first,
           CAST((tok_start + n - 1) // 512 AS BIGINT) AS seq_last
    FROM c
    """,
    "custom(training-context-packing,distributed-prefix-scan)",
)
REGISTRY["token_budget_mix"] = QASpec(
    TP.q_token_budget_mix,
    r"""
    WITH n AS (
        SELECT doc_id, source, length(regexp_extract_all(text, '\S+')) AS n,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
    nn AS (SELECT * FROM n WHERE n > 0 AND doc_id IS NOT NULL),
    t AS (SELECT source, (sum(n) + 3) // 4 AS budget FROM nn GROUP BY source),
    c AS (SELECT doc_id, source, n,
                 sum(n) OVER (PARTITION BY source ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM nn)
    SELECT c.doc_id, c.source, CAST(c.n AS BIGINT) AS n_tokens
    FROM c JOIN t ON c.source IS NOT DISTINCT FROM t.source
    WHERE c.cum <= t.budget
    """,
    "custom(token-budget-data-mixing,bucket-pruned-prefix-scan)",
)
REGISTRY["para_dedup_rewrite"] = QASpec(
    W.q_para_dedup_rewrite,
    r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                  WHERE doc_id IS NOT NULL),
         ch AS (SELECT doc_id, g.i AS i, array_to_string(t[g.i:g.i+2], ' ') AS chunk
                FROM toks, UNNEST(generate_series(1, length(t), 3)) AS g(i)),
         common AS (SELECT chunk FROM ch GROUP BY chunk
                    HAVING count(DISTINCT doc_id) >= 2)
    SELECT doc_id,
           coalesce(string_agg(chunk, ' ' ORDER BY i)
                    FILTER (WHERE chunk NOT IN (SELECT chunk FROM common)), '') AS clean_text,
           count(*) AS n_chunks,
           count(*) FILTER (WHERE chunk IN (SELECT chunk FROM common)) AS n_removed
    FROM ch GROUP BY doc_id
    """,
    "custom(ccnet-paragraph-dedup-rewrite,broadcast-boilerplate-set)",
)
REGISTRY["chunk_documents"] = QASpec(
    W.q_chunk_documents,
    r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents)
    SELECT doc_id, g.i AS start_tok,
           least(32, length(t) - g.i + 1) AS n_tokens,
           array_to_string(t[g.i:g.i+31], ' ') AS chunk_text
    FROM toks, UNNEST(generate_series(1, length(t), 24)) AS g(i)
    """,
    "custom(sliding-window-training-chunker)",
)
REGISTRY["dup_span_stats"] = QASpec(
    W.q_dup_span_stats,
    r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                  WHERE doc_id IS NOT NULL
                    AND text IS NOT NULL AND length(regexp_extract_all(text, '\S+')) > 0),
         g AS (SELECT doc_id, g.i AS i, array_to_string(t[g.i:g.i+3], ' ') AS gram
               FROM toks, UNNEST(generate_series(1, length(t) - 3, 1)) AS g(i)),
         common AS (SELECT gram FROM g GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT d.doc_id, d.i + u.o AS j
                 FROM (SELECT doc_id, i FROM g
                       WHERE gram IN (SELECT gram FROM common)) d,
                      UNNEST(generate_series(0, 3)) AS u(o))
    SELECT toks.doc_id, length(toks.t) AS n_tokens,
           coalesce(c.n, 0) AS n_dup_tokens
    FROM toks LEFT JOIN (SELECT doc_id, count(*) AS n FROM cov GROUP BY doc_id) c
      ON toks.doc_id = c.doc_id
    """,
    "custom(exact-substring-dedup-coverage,hash-first-df,broadcast-dup-set)",
)
REGISTRY["gopher_quality_filter"] = QASpec(
    W.q_gopher_quality_filter,
    r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                  WHERE doc_id IS NOT NULL),
         w AS (SELECT doc_id, u.w AS w FROM toks, UNNEST(t) AS u(w)),
         agg AS (SELECT doc_id, count(*) AS n_words,
                        CAST(sum(length(w)) AS BIGINT) AS word_chars,
                        count(*) FILTER (WHERE regexp_matches(w, '[A-Za-z]')) AS n_alpha_words,
                        CAST(count(DISTINCT CASE WHEN lower(w) IN
                          ('the','be','to','of','and','that','have','with')
                          THEN lower(w) END) AS BIGINT) AS n_stop_distinct
                 FROM w GROUP BY doc_id)
    SELECT doc_id, n_words, word_chars, n_alpha_words, n_stop_distinct,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND word_chars BETWEEN 3 * n_words AND 10 * n_words
                      AND 5 * n_alpha_words >= 4 * n_words
                      AND n_stop_distinct >= 2 THEN 1 ELSE 0 END AS INT) AS keep_i
    FROM agg
    """,
    "custom(gopher-quality-rule-panel,rae-2021-table-a1)",
)
REGISTRY["intra_doc_dedup"] = QASpec(
    W.q_intra_doc_dedup,
    r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                  WHERE doc_id IS NOT NULL
                    AND text IS NOT NULL AND length(regexp_extract_all(text, '\S+')) > 0),
         cl AS (SELECT doc_id, list_transform(generate_series(1, length(t), 3),
                                              i -> array_to_string(t[i:i+2], ' ')) AS cs
                FROM toks),
         e AS (SELECT doc_id, unnest(cs) AS chunk,
                      unnest(generate_series(1, length(cs))) AS i FROM cl),
         f AS (SELECT doc_id, chunk, min(i) AS fi FROM e GROUP BY doc_id, chunk),
         agg AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY fi) AS clean_text,
                        count(*) AS n_kept FROM f GROUP BY doc_id),
         n AS (SELECT doc_id, count(*) AS n_chunks FROM e GROUP BY doc_id)
    SELECT n.doc_id, agg.clean_text, n.n_chunks, n.n_chunks - agg.n_kept AS n_removed
    FROM n JOIN agg ON n.doc_id = agg.doc_id
    """,
    "custom(refinedweb-intra-doc-dedup,zero-shuffle-rewrite)",
)
REGISTRY["length_percentile_filter"] = QASpec(
    W.q_length_percentile_filter,
    r"""
    WITH q AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
                      quantile_cont(n_chars, 0.95) AS hi FROM documents)
    SELECT doc_id, n_chars FROM documents, q
    WHERE n_chars >= lo AND n_chars <= hi
    """,
    "custom(exact-histogram-quantile-trim,two-pass-broadcast)",
)
REGISTRY["source_overlap"] = QASpec(
    W.q_source_overlap,
    r"""
    WITH toks AS (SELECT source, regexp_extract_all(text, '\S+') AS t FROM documents
                  WHERE text IS NOT NULL),
         ch AS (SELECT source, unnest(list_transform(generate_series(1, length(t), 3),
                                                     i -> array_to_string(t[i:i+2], ' '))) AS chunk
                FROM toks),
         sc AS (SELECT DISTINCT source, chunk FROM ch)
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
    FROM sc a JOIN sc b ON a.chunk = b.chunk AND a.source < b.source
    GROUP BY 1, 2
    """,
    "custom(cross-source-contamination-matrix,chunk-hash-bucketed)",
)
REGISTRY["simhash_hamming_pairs"] = QASpec(
    T.q_simhash_hamming_pairs, None, "simhash-neardup(manku-2007,4x16-band,popcount)"
)
REGISTRY["oov_rate"] = QASpec(
    T2.q_oov_rate,
    r"""
    WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
                  FROM documents),
         cnt AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
         vocab AS (SELECT w FROM cnt ORDER BY n DESC, w ASC LIMIT 64)
    SELECT doc_id, count(*) AS n_tokens,
           count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab)) AS n_oov
    -- vocab above intentionally keeps anonymous docs' tokens (corpus
    -- statistic); only the per-doc report filters them (r5 null-id contract)
    FROM toks WHERE doc_id IS NOT NULL GROUP BY doc_id
    """,
    "custom(vocabulary-coverage,top-v-broadcast-probe)",
)
REGISTRY["zipf_slope"] = QASpec(
    T2.q_zipf_slope,
    r"""
    WITH toks AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents),
         cnt AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
         r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w ASC) AS rnk FROM cnt)
    SELECT regexp_replace(printf('%.4f', regr_slope(ln(n), ln(rnk))),
                          '^-(0(\.0+)?)$', '\1') AS zipf_slope,
           count(*) AS n_types, CAST(sum(n) AS BIGINT) AS n_tokens
    FROM r
    """,
    "custom(zipf-rank-frequency-fit,count-of-counts-reduce)",
)
REGISTRY["quality_by_source"] = QASpec(
    W.q_quality_by_source,
    r"""
    WITH toks AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS t
                  FROM documents),
         w AS (SELECT doc_id, source, u.w AS w FROM toks, UNNEST(t) AS u(w)),
         agg AS (SELECT doc_id, any_value(source) AS source, count(*) AS n_words,
                        CAST(sum(length(w)) AS BIGINT) AS word_chars,
                        count(*) FILTER (WHERE regexp_matches(w, '[A-Za-z]')) AS n_alpha_words,
                        count(DISTINCT CASE WHEN lower(w) IN
                          ('the','be','to','of','and','that','have','with')
                          THEN lower(w) END) AS n_stop_distinct
                 FROM w GROUP BY doc_id)
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_words BETWEEN 50 AND 100000
                     AND word_chars BETWEEN 3 * n_words AND 10 * n_words
                     AND 5 * n_alpha_words >= 4 * n_words
                     AND n_stop_distinct >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM agg GROUP BY source
    """,
    "custom(gopher-panel-by-source,composed-rollup)",
)
REGISTRY["pagerank_dup"] = QASpec(
    C.q_pagerank_dup, None, "pagerank(dup-graph,power-iteration,size-adaptive)"
)
REGISTRY["dedup_survivors_central"] = QASpec(
    C.q_dedup_survivors_central, None, "dedup(pagerank-centrality-survivor,composed)"
)
REGISTRY["correlated_users"] = QASpec(
    R3.q_correlated_users,
    r"""
    WITH h AS (SELECT user_id, date_trunc('hour', ts) AS hr, avg(value) AS v
               FROM events WHERE value IS NOT NULL GROUP BY user_id, hr),
         p AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
                      corr(a.v, b.v) AS c, count(*) AS n_hours
               FROM h a JOIN h b ON a.hr = b.hr AND a.user_id < b.user_id
               GROUP BY 1, 2)
    SELECT user_a, user_b, n_hours,
           regexp_replace(printf('%.4f', c), '^-(0(\.0+)?)$', '\1') AS corr4
    FROM p WHERE n_hours >= 3 AND c IS NOT NULL
    """,
    "custom(series-correlation-join,hour-bucketed-expand,pair-reduce)",
)
REGISTRY["similar_users_sketch"] = QASpec(
    R3.q_similar_users_sketch,
    None,
    "custom(series-cosine-lsh,streaming-sketch,candidate-filtered-verify)",
)
REGISTRY["dedup_cascade"] = QASpec(
    C.q_dedup_cascade, None, "dedup-cascade(exact->lsh->semantic,stage-report)"
)
REGISTRY["char_trigram_profile"] = QASpec(
    T2.q_char_trigram_profile,
    r"""
    WITH ch AS (SELECT lang, substring(text, g.i, 3) AS tg
                FROM documents, UNNEST(generate_series(1, length(text) - 2)) AS g(i)
                WHERE text IS NOT NULL AND length(text) >= 3),
         cnt AS (SELECT lang, tg, count(*) AS n FROM ch GROUP BY lang, tg),
         r AS (SELECT lang, tg, n,
                      row_number() OVER (PARTITION BY lang ORDER BY n DESC, tg ASC) AS rk
               FROM cnt)
    SELECT lang, tg AS trigram, n FROM r WHERE rk <= 5
    """,
    "custom(cavnar-trenkle-char-ngram-profile,per-lang-topk)",
)
from metareadability_ray.pipelines import linkage as LK  # noqa: E402

REGISTRY["fuzzy_name_pairs"] = QASpec(
    LK.q_fuzzy_name_pairs,
    """
    SELECT a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
    "custom(fuzzy-join,fastss-deletion-blocking,vectorized-levenshtein)",
)
REGISTRY["normalized_dedup"] = QASpec(
    LK.q_normalized_dedup,
    """
    WITH norm AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_hash
        FROM documents)
    SELECT norm_hash, min(doc_id) AS keep_doc_id, count(*) AS n_forms
    FROM norm GROUP BY norm_hash
    """,
    "MR-D1(normalization-hash-dedup)",
)
REGISTRY["markov_transitions"] = QASpec(
    LK.q_markov_transitions,
    """
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER w AS to_type,
               lead(event_id)   OVER w AS next_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    cnt AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE next_id IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           printf('%.4f', n / sum(n) OVER (PARTITION BY from_type)) AS p
    FROM cnt
    """,
    "custom(markov-transition-matrix,user-bucketed)",
)
REGISTRY["cohort_retention"] = QASpec(
    LK.q_cohort_retention,
    """
    WITH wk AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events),
         fw AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
    SELECT fw.cohort_week, wk.week, count(*) AS n_users
    FROM wk JOIN fw ON wk.user_id = fw.user_id
    GROUP BY 1, 2
    """,
    "custom(cohort-retention,distinct-pair-shuffle)",
)
REGISTRY["interval_overlap_users"] = QASpec(
    LK.q_interval_overlap_users,
    """
    WITH iv AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               min(ts) AS lo, max(ts) AS hi
        FROM events GROUP BY 1, 2)
    SELECT a.day AS day, a.user_id AS user_a, b.user_id AS user_b
    FROM iv a JOIN iv b
      ON a.day = b.day AND a.user_id < b.user_id
     AND a.lo <= b.hi AND b.lo <= a.hi
    """,
    "custom(interval-overlap-self-join,sorted-sweep)",
)
from metareadability_ray.pipelines import setjoin as SJ  # noqa: E402
from metareadability_ray.pipelines import ranking as RK  # noqa: E402

REGISTRY["prefix_jaccard_join"] = QASpec(
    SJ.q_prefix_jaccard_join,
    r"""
    WITH """ + _NGRAM_CTES + r"""
    SELECT doc_a, doc_b, inter,
           (sa.set_size + sb.set_size - inter) AS union_size
    FROM inter_t
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter * 2 >= 1 * (sa.set_size + sb.set_size - inter)
    """,
    "custom(set-similarity-join,prefix-filter,Vernica-2010)",
)
REGISTRY["triangle_count"] = QASpec(
    SJ.q_triangle_count,
    r"""
    WITH """ + _NGRAM_CTES + r""",
    p AS (
        SELECT doc_a, doc_b
        FROM inter_t
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE inter * 5 >= 1 * (sa.set_size + sb.set_size - inter))
    SELECT count(*) AS n_triangles
    FROM p e1 JOIN p e2 ON e1.doc_a = e2.doc_a AND e1.doc_b < e2.doc_b
    JOIN p e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
    """,
    "custom(triangle-count,degree-oriented-wedges,Suri-2011)",
)
REGISTRY["bm25_topk"] = QASpec(
    RK.q_bm25_topk,
    r"""
    WITH toks AS (SELECT doc_id, coalesce(regexp_extract_all(text, '\S+'), []) AS t
                  FROM documents),
    d AS (SELECT doc_id, length(t) AS dl,
          len(list_filter(t, x -> x = 'spark')) AS tf0,
          len(list_filter(t, x -> x = 'hash'))  AS tf1,
          len(list_filter(t, x -> x = 'merge')) AS tf2 FROM toks),
    g AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl,
          sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
          sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
          sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2 FROM d),
    s AS (SELECT doc_id,
          ln((g.n - g.df0 + 0.5)/(g.df0 + 0.5) + 1) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2*(1 - 0.75 + 0.75 * dl / g.avgdl))
        + ln((g.n - g.df1 + 0.5)/(g.df1 + 0.5) + 1) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2*(1 - 0.75 + 0.75 * dl / g.avgdl))
        + ln((g.n - g.df2 + 0.5)/(g.df2 + 0.5) + 1) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2*(1 - 0.75 + 0.75 * dl / g.avgdl)) AS raw
          FROM d, g WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0)
    SELECT doc_id, regexp_replace(printf('%.4f', raw), '^-(0\.0+)$', '\1') AS score
    FROM s ORDER BY raw DESC, doc_id LIMIT 10
    """,
    "custom(bm25-okapi-topk,fixed-width-stats-aggregate)",
)
REGISTRY["source_js_divergence"] = QASpec(
    RK.q_source_js_divergence,
    r"""
    WITH tok AS (SELECT source, unnest(regexp_extract_all(text, '\S+')) AS token
                 FROM documents WHERE source IS NOT NULL),
    cnt AS (SELECT source, token, count(*)::DOUBLE AS n FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, sum(n) AS t FROM cnt GROUP BY 1),
    p AS (SELECT c.source, c.token, c.n / t.t AS p FROM cnt c JOIN tot t USING (source)),
    prs AS (SELECT a.source AS source_a, b.source AS source_b
            FROM tot a JOIN tot b ON a.source < b.source),
    v AS (SELECT DISTINCT token FROM cnt),
    terms AS (SELECT prs.source_a, prs.source_b,
              coalesce(pa.p, 0) AS pa, coalesce(pb.p, 0) AS pb
              FROM prs CROSS JOIN v
              LEFT JOIN p pa ON pa.source = prs.source_a AND pa.token = v.token
              LEFT JOIN p pb ON pb.source = prs.source_b AND pb.token = v.token)
    SELECT source_a, source_b, printf('%.4f', sum(
        CASE WHEN pa > 0 THEN 0.5*pa*ln(2*pa/(pa+pb)) ELSE 0 END +
        CASE WHEN pb > 0 THEN 0.5*pb*ln(2*pb/(pa+pb)) ELSE 0 END)) AS js
    FROM terms GROUP BY 1, 2
    """,
    "custom(jensen-shannon-source-divergence,token-bucket-partials)",
)

REGISTRY["path_trigrams"] = QASpec(
    LK.q_path_trigrams,
    """
    WITH seq AS (
        SELECT event_type AS t1,
               lead(event_type)    OVER w AS t2,
               lead(event_type, 2) OVER w AS t3,
               lead(event_id, 2)   OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    cnt AS (SELECT t1, t2, t3, count(*) AS n
            FROM seq WHERE e3 IS NOT NULL GROUP BY 1, 2, 3)
    SELECT t1, t2, t3, n FROM cnt
    ORDER BY n DESC, t1 ASC NULLS FIRST, t2 ASC NULLS FIRST, t3 ASC NULLS FIRST
    LIMIT 10
    """,
    "custom(sequence-path-mining,per-user-trigram-topk)",
)
REGISTRY["kcore_dup"] = QASpec(
    SJ.q_kcore_dup,
    None,
    "custom(kcore-decomposition,h-index-iteration,Lu-2016)",
)

from metareadability_ray.pipelines import analytics as AN  # noqa: E402

REGISTRY["collocations_pmi"] = QASpec(
    AN.q_collocations_pmi,
    r"""
    WITH toks AS (SELECT regexp_extract_all(text, '\S+') AS t FROM documents),
    uni AS (SELECT unnest(t) AS token FROM toks),
    unic AS (SELECT token, count(*) AS n FROM uni GROUP BY token),
    nu AS (SELECT count(*)::DOUBLE AS n FROM uni),
    bi AS (SELECT unnest(list_transform(generate_series(1, length(t) - 1),
                                        i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM toks),
    bic AS (SELECT bigram, count(*) AS n FROM bi GROUP BY bigram),
    nb AS (SELECT count(*)::DOUBLE AS n FROM bi)
    SELECT b.bigram, b.n AS n_ab,
           regexp_replace(printf('%.4f',
               log2((b.n::DOUBLE / nb.n) /
                    ((ua.n::DOUBLE / nu.n) * (ub.n::DOUBLE / nu.n)))),
               '^-(0\.0+)$', '\1') AS pmi
    FROM bic b, nb, nu
    JOIN unic ua ON ua.token = split_part(b.bigram, ' ', 1)
    JOIN unic ub ON ub.token = split_part(b.bigram, ' ', 2)
    WHERE b.n >= 5
    """,
    "custom(pmi-collocations,Church-Hanks-1990,broadcast-unigram-side)",
)
REGISTRY["user_value_trend"] = QASpec(
    AN.q_user_value_trend,
    r"""
    SELECT user_id,
           regexp_replace(printf('%.4f',
               regr_slope(value, (epoch(ts) - 1704067200.0) / 3600.0)),
               '^-(0\.0+)$', '\1') AS slope,
           count(value) AS n_valid
    FROM events GROUP BY user_id
    """,
    "custom(per-user-ols-trend,regr_slope-twin,segment-reduceat)",
)
REGISTRY["decayed_user_score"] = QASpec(
    AN.q_decayed_user_score,
    r"""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT user_id,
           regexp_replace(printf('%.4f',
               sum(value * exp(-(epoch(m.mx) - epoch(ts)) / 604800.0))),
               '^-(0\.0+)$', '\1') AS score,
           count(value) AS n_valid
    FROM events, m GROUP BY user_id
    """,
    "custom(time-decayed-engagement,two-pass-max-then-score)",
)
REGISTRY["sliding_distinct_users"] = QASpec(
    AN.q_sliding_distinct_users,
    """
    WITH e AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events),
    hours AS (SELECT DISTINCT h FROM e)
    SELECT hours.h AS window_end, count(DISTINCT e.user_id) AS n_users
    FROM hours JOIN e ON e.h BETWEEN hours.h - INTERVAL 2 HOUR AND hours.h
    GROUP BY hours.h
    """,
    "custom(sliding-window-count-distinct,3h-trailing,single-window-shuffle)",
)
REGISTRY["hybrid_search_rrf"] = QASpec(
    AN.q_hybrid_search_rrf,
    r"""
    WITH toks AS (SELECT doc_id, coalesce(regexp_extract_all(text, '\S+'), []) AS t
                  FROM documents),
    d AS (SELECT doc_id, length(t) AS dl,
          len(list_filter(t, x -> x = 'spark')) AS tf0,
          len(list_filter(t, x -> x = 'hash'))  AS tf1,
          len(list_filter(t, x -> x = 'merge')) AS tf2 FROM toks),
    g AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl,
          sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
          sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
          sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2 FROM d),
    s AS (SELECT doc_id,
          ln((g.n - g.df0 + 0.5)/(g.df0 + 0.5) + 1) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2*(1 - 0.75 + 0.75 * dl / g.avgdl))
        + ln((g.n - g.df1 + 0.5)/(g.df1 + 0.5) + 1) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2*(1 - 0.75 + 0.75 * dl / g.avgdl))
        + ln((g.n - g.df2 + 0.5)/(g.df2 + 0.5) + 1) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2*(1 - 0.75 + 0.75 * dl / g.avgdl)) AS raw
          FROM d, g WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0),
    trank AS (SELECT doc_id, row_number() OVER (ORDER BY raw DESC, doc_id) AS rt
              FROM s QUALIFY rt <= 20),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
    vrank AS (SELECT vec_id,
              row_number() OVER (ORDER BY list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) DESC, vec_id) AS rv
              FROM embeddings, q WHERE vec_id <> 0 QUALIFY rv <= 20)
    SELECT coalesce(t.doc_id, v.vec_id) AS doc_id,
           printf('%.6f', coalesce(1.0/(60 + t.rt), 0.0) + coalesce(1.0/(60 + v.rv), 0.0)) AS rrf,
           t.rt AS rank_text, v.rv AS rank_vec
    FROM trank t FULL OUTER JOIN vrank v ON t.doc_id = v.vec_id
    ORDER BY coalesce(1.0/(60 + t.rt), 0.0) + coalesce(1.0/(60 + v.rv), 0.0) DESC,
             coalesce(t.doc_id, v.vec_id)
    LIMIT 10
    """,
    "custom(hybrid-retrieval-rrf,Cormack-2009,bm25+cosine-fusion)",
)

# ------------------------------------------------------- curation policies
from metareadability_ray.pipelines import curation as CU  # noqa: E402

REGISTRY["source_cap_sample"] = QASpec(
    CU.q_source_cap_sample,
    """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents) WHERE rn <= 10
    """,
    "custom(domain-cap-quota,block-bottomk-prefilter)",
)
REGISTRY["mixture_weights"] = QASpec(
    CU.q_mixture_weights,
    r"""
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    t AS (SELECT sum(pow(n_docs, 0.7)) AS z FROM c)
    SELECT source, n_docs,
           regexp_replace(printf('%.6f', pow(n_docs, 0.7) / z),
                          '^-(0\.0+)$', '\1') AS weight,
           CAST(floor(pow(n_docs, 0.7) / z * 10000 + 0.5) AS BIGINT) AS quota
    FROM c CROSS JOIN t
    """,
    "custom(temperature-mixture,multinomial-source-weights)",
)
REGISTRY["ccnet_buckets"] = QASpec(
    CU.q_ccnet_buckets,
    r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token FROM documents),
    dt AS (SELECT doc_id, token, count(*) AS k FROM toks GROUP BY doc_id, token),
    gc AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT count(*) AS n, count(DISTINCT token) AS v FROM toks),
    bits AS (
        SELECT dt.doc_id,
               CAST(floor(sum(dt.k * -log2((gc.c + 1.0) / (tot.n + tot.v)))
                          / sum(dt.k) * 10000 + 0.5) AS BIGINT) AS b4
        FROM dt JOIN gc USING (token) CROSS JOIN tot
        GROUP BY dt.doc_id)
    SELECT b.doc_id, d.lang,
           ntile(3) OVER (PARTITION BY d.lang ORDER BY b.b4, b.doc_id) AS bucket
    FROM bits b JOIN documents d USING (doc_id)
    """,
    "custom(ccnet-head-middle-tail,Wenzek-2020,distributed-ntile)",
)
from metareadability_ray.pipelines import analytics as AN2  # noqa: E402

REGISTRY["pareto_frontier"] = QASpec(
    AN2.q_pareto_frontier,
    """
    WITH o AS (SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
               WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL)
    SELECT o_orderkey, o_totalprice, o_orderdate FROM o
    WHERE NOT EXISTS (
        SELECT 1 FROM o x
        WHERE x.o_totalprice >= o.o_totalprice AND x.o_orderdate >= o.o_orderdate
          AND (x.o_totalprice > o.o_totalprice OR x.o_orderdate > o.o_orderdate))
    """,
    "custom(skyline,Borzsonyi-2001,block-frontier-combine)",
)
REGISTRY["pq_topk"] = QASpec(
    V.q_pq_topk, None, "custom(product-quantization,Jegou-2011,ADC-topk)"
)
REGISTRY["mmr_select"] = QASpec(
    V.q_mmr_select, None, "custom(maximal-marginal-relevance,Carbonell-1998)"
)
REGISTRY["dup_span_rewrite"] = QASpec(
    W.q_dup_span_rewrite,
    r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                  WHERE doc_id IS NOT NULL
                    AND text IS NOT NULL AND length(regexp_extract_all(text, '\S+')) > 0),
         g AS (SELECT doc_id, g.i AS i, array_to_string(t[g.i:g.i+3], ' ') AS gram
               FROM toks, UNNEST(generate_series(1, length(t) - 3, 1)) AS g(i)),
         common AS (SELECT gram FROM g GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT d.doc_id, d.i + u.o AS j
                 FROM (SELECT doc_id, i FROM g
                       WHERE gram IN (SELECT gram FROM common)) d,
                      UNNEST(generate_series(0, 3)) AS u(o)),
         tp AS (SELECT doc_id, s.i AS i, t[s.i] AS w
                FROM toks, UNNEST(generate_series(1, length(t), 1)) AS s(i))
    SELECT tp.doc_id,
           coalesce(string_agg(tp.w, ' ' ORDER BY tp.i)
                        FILTER (WHERE cov.j IS NULL), '') AS clean_text
    FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.i = cov.j
    GROUP BY tp.doc_id
    """,
    "custom(exact-substring-dedup-rewrite,Lee-2022,shared-dup-set-builder)",
)
REGISTRY["dsir_weights"] = QASpec(
    CU.q_dsir_weights,
    r"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS token
        FROM documents),
    dt AS (SELECT doc_id, token, count(*) AS k FROM toks
           WHERE doc_id IS NOT NULL GROUP BY doc_id, token),
    src AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    stot AS (SELECT count(*) AS n, count(DISTINCT token) AS v FROM toks),
    tgt AS (SELECT token, count(*) AS c FROM toks WHERE lang = 'en' GROUP BY token),
    ttot AS (SELECT count(*) AS n, count(DISTINCT token) AS v
             FROM toks WHERE lang = 'en')
    SELECT dt.doc_id,
           regexp_replace(
               printf('%.4f',
                   sum(dt.k * (ln((coalesce(tg.c, 0) + 1.0) / greatest(ttot.n + ttot.v, 1))
                             - ln((src.c + 1.0) / greatest(stot.n + stot.v, 1))))),
               '^-(0\.0+)$', '\1') AS log_ratio
    FROM dt JOIN src USING (token) LEFT JOIN tgt tg USING (token)
    CROSS JOIN stot CROSS JOIN ttot
    GROUP BY dt.doc_id
    """,
    "custom(dsir-importance-resampling,Xie-2023,dual-broadcast-lm)",
)
REGISTRY["centroid_confusion"] = QASpec(
    V.q_centroid_confusion,
    """
    WITH dims AS (
        SELECT vec_id, label, s.i AS i, CAST(embedding[s.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(generate_series(1, length(embedding), 1)) AS s(i)),
    cent AS (SELECT label AS c_label, i, avg(x) AS m FROM dims GROUP BY label, i),
    dist AS (SELECT d.vec_id, d.label, c.c_label,
                    CAST(floor(sum((d.x - c.m) * (d.x - c.m)) * 1000000000 + 0.5)
                         AS BIGINT) AS d2f
             FROM dims d JOIN cent c USING (i)
             GROUP BY d.vec_id, d.label, c.c_label),
    pred AS (SELECT vec_id, label,
                    (array_agg(c_label ORDER BY d2f, c_label))[1] AS pred_label
             FROM dist GROUP BY vec_id, label)
    SELECT CAST(label AS BIGINT) AS label, CAST(pred_label AS BIGINT) AS pred_label,
           count(*) AS n
    FROM pred GROUP BY label, pred_label
    """,
    "custom(nearest-centroid-confusion,Rocchio,broadcast-centroids)",
)
REGISTRY["filter_funnel"] = QASpec(
    CU.q_filter_funnel,
    r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
                  WHERE doc_id IS NOT NULL),
         w AS (SELECT doc_id, u.w AS w FROM toks, UNNEST(t) AS u(w)),
         agg AS (SELECT doc_id, count(*) AS n,
                        CAST(sum(length(w)) AS BIGINT) AS wc,
                        count(*) FILTER (WHERE regexp_matches(w, '[A-Za-z]')) AS na,
                        CAST(count(DISTINCT CASE WHEN lower(w) IN
                          ('the','be','to','of','and','that','have','with')
                          THEN lower(w) END) AS BIGINT) AS ns
                 FROM w GROUP BY doc_id),
         g AS (SELECT doc_id, g.i AS i, array_to_string(t[g.i:g.i+3], ' ') AS gram
               FROM toks, UNNEST(generate_series(1, length(t) - 3, 1)) AS g(i)),
         common AS (SELECT gram FROM g GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
         dup AS (SELECT DISTINCT doc_id FROM g
                 WHERE gram IN (SELECT gram FROM common)),
         f AS (SELECT agg.*,
                      CASE WHEN agg.doc_id IN (SELECT doc_id FROM dup)
                           THEN 1 ELSE 0 END AS isdup
               FROM agg)
    SELECT '0_all' AS stage, count(*) AS n_surviving FROM documents
    UNION ALL SELECT '1_tokens', count(*) FROM f
    UNION ALL SELECT '2_quality', count(*) FROM f
        WHERE n >= 1 AND wc BETWEEN 3 * n AND 10 * n AND 5 * na >= 4 * n AND ns >= 1
    UNION ALL SELECT '3_unique_spans', count(*) FROM f
        WHERE n >= 1 AND wc BETWEEN 3 * n AND 10 * n AND 5 * na >= 4 * n AND ns >= 1
          AND isdup = 0
    """,
    "custom(curation-funnel,gopher+lee2022-composed,per-block-counter-fold)",
)
REGISTRY["winnow_pairs"] = QASpec(
    T.q_winnow_pairs,
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
    ), gl AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(t) - 2),
                              i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS hs
        FROM toks WHERE length(t) >= 3
    ), grams AS (
        SELECT doc_id, unnest(generate_series(1, length(hs))) AS i, unnest(hs) AS h
        FROM gl
    ), wm AS (
        SELECT doc_id, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, wmin AS fp FROM wm WHERE i <= greatest(n - 3, 1)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    "custom(moss-winnow-pair-search,Schleimer-2003,shared-fingerprint-kernel)",
)
from metareadability_ray.pipelines import ranking as RK2  # noqa: E402

REGISTRY["log_odds_keywords"] = QASpec(
    RK2.q_log_odds_keywords,
    r"""
    WITH w AS (SELECT source, unnest(regexp_extract_all(text, '\S+')) AS tok
               FROM documents WHERE source IS NOT NULL),
    st AS (SELECT source, tok, count(*) AS c FROM w GROUP BY source, tok),
    ns AS (SELECT source, count(*) AS n FROM w GROUP BY source),
    tt AS (SELECT tok, count(*) AS ct FROM w GROUP BY tok),
    tot AS (SELECT count(*) AS n FROM w),
    sc AS (SELECT st.source, st.tok,
                  ln((st.c + 1.0) / (ns.n - st.c + 1.0))
                - ln((tt.ct - st.c + 1.0)
                     / (tot.n - ns.n - (tt.ct - st.c) + 1.0)) AS lor
           FROM st JOIN ns USING (source) JOIN tt USING (tok) CROSS JOIN tot),
    rk AS (SELECT source, tok, lor,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY lor DESC, tok) AS r
           FROM sc)
    SELECT source, tok AS token, r,
           regexp_replace(printf('%.4f', lor), '^-(0\.0+)$', '\1') AS log_odds
    FROM rk WHERE r <= 5
    """,
    "custom(fightin-words-log-odds,Monroe-2008,token-bucket-topk)",
)

REGISTRY["stupid_backoff_score"] = QASpec(
    CU.q_stupid_backoff_score,
    r"""
    WITH tr AS (
        SELECT regexp_extract_all(text, '\S+') AS t FROM documents
        WHERE doc_id % 4 != 0
    ), ho AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        WHERE doc_id % 4 = 0 AND length(regexp_extract_all(text, '\S+')) >= 2
    ), uni AS (SELECT unnest(t) AS w FROM tr),
    c1 AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    ntot AS (SELECT count(*) AS n FROM uni),
    trbi AS (
        SELECT unnest(list_transform(generate_series(1, length(t) - 1), i -> t[i])) AS w1,
               unnest(list_transform(generate_series(1, length(t) - 1), i -> t[i+1])) AS w2
        FROM tr WHERE length(t) >= 2
    ), c2 AS (SELECT w1, w2, count(*) AS c FROM trbi GROUP BY w1, w2),
    hobi AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(t) - 1), i -> t[i])) AS w1,
               unnest(list_transform(generate_series(1, length(t) - 1), i -> t[i+1])) AS w2
        FROM ho
    ), hb AS (SELECT doc_id, w1, w2, count(*) AS k FROM hobi GROUP BY doc_id, w1, w2),
    sc AS (
        SELECT hb.doc_id, hb.k,
               CAST(floor((CASE WHEN c2.c IS NOT NULL
                     THEN -log2(c2.c / ca.c)
                     ELSE -log2(0.4 * (coalesce(cb.c, 0) + 1.0) / (ntot.n + 1.0)) END)
                    * 1000000.0 + 0.5) AS BIGINT) AS mb
        FROM hb LEFT JOIN c2 ON hb.w1 = c2.w1 AND hb.w2 = c2.w2
                LEFT JOIN c1 ca ON hb.w1 = ca.w
                LEFT JOIN c1 cb ON hb.w2 = cb.w
                CROSS JOIN ntot
    )
    SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
           printf('%.4f', sum(k * mb) / (1000000.0 * sum(k))) AS sb_bits
    FROM sc GROUP BY doc_id
    """,
    "custom(stupid-backoff-heldout-lm,Brants-2007,sharded-bigram-model)",
)

REGISTRY["mad_outlier_docs"] = QASpec(
    W.q_mad_outlier_docs,
    """
    WITH med AS (SELECT quantile_cont(n_chars, 0.5) AS m FROM documents),
    mad AS (SELECT quantile_cont(abs(n_chars - med.m), 0.5) AS d
            FROM documents, med)
    SELECT doc_id, n_chars FROM documents, med, mad
    WHERE abs(n_chars - med.m) > 2.0 * mad.d
    """,
    "custom(hampel-mad-outliers,histogram-derived-robust-stats)",
)

REGISTRY["distinct_ngram_ratio"] = QASpec(
    T2.q_distinct_ngram_ratio,
    r"""
    WITH toks AS (
        SELECT source, regexp_extract_all(text, '\S+') AS t FROM documents
        WHERE source IS NOT NULL
    ), g AS (
        SELECT source,
               unnest(list_transform(generate_series(1, length(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
        FROM toks WHERE length(t) >= 3
    )
    SELECT source, count(*) AS n_grams, count(DISTINCT gram) AS n_distinct,
           printf('%.4f', count(DISTINCT gram) / count(*)) AS distinct_ratio
    FROM g GROUP BY source
    """,
    "custom(distinct-n-diversity,Li-2016,gram-bucket-exact-distinct)",
)

REGISTRY["incremental_dedup"] = QASpec(
    T.q_incremental_dedup,
    """
    WITH inc AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 = 0
    ), base AS (
        SELECT DISTINCT md5(text) AS h FROM documents
        WHERE doc_id % 5 != 0 AND text IS NOT NULL
    )
    SELECT inc.doc_id,
           CASE WHEN base.h IS NOT NULL THEN 'dup' ELSE 'fresh' END AS status
    FROM inc LEFT JOIN base ON inc.h = base.h
    """,
    "custom(incremental-crawl-dedup,asymmetric-hash-probe)",
)

from metareadability_ray.pipelines import linkgraph as LG  # noqa: E402

REGISTRY["anchor_text_index"] = QASpec(
    LG.q_anchor_text_index,
    None,  # DOM parsing is not SQL-expressible; parity via the independent
    # regex-oracle agreement test (tests/test_linkgraph.py)
    "custom(anchor-text-index,BrinPage-1998,target-bucket-shuffle)",
)

REGISTRY["containment_pairs"] = QASpec(
    T.q_containment_pairs,
    f"""
    WITH {_NGRAM_CTES}
    SELECT doc_sub, doc_sup, inter, sub_size FROM (
        SELECT i.doc_a AS doc_sub, i.doc_b AS doc_sup, i.inter,
               sa.set_size AS sub_size
        FROM inter_t i JOIN sz sa ON i.doc_a = sa.doc_id
        UNION ALL
        SELECT i.doc_b, i.doc_a, i.inter, sb.set_size
        FROM inter_t i JOIN sz sb ON i.doc_b = sb.doc_id
    ) WHERE inter * 10 >= 8 * sub_size
    """,
    "custom(broder-containment-pairs,shared-inverted-index-kernel)",
)

REGISTRY["url_pagerank"] = QASpec(
    LG.q_url_pagerank,
    None,  # iterative numerical fixed point — no SQL twin; tested by exact
    # numpy-oracle replay over independently regex-extracted edges and a
    # distributed≡local property (tests/test_linkgraph.py)
    "custom(url-pagerank,Page-1999-directed+dangling,extract-graph-rank-composition)",
)

REGISTRY["bigram_cond_entropy"] = QASpec(
    W.q_bigram_cond_entropy,
    r"""
    WITH toks AS (
        -- doc_id IS NOT NULL: null-id docs are skipped on BOTH engines (a
        -- per-doc statistic has no addressable row for an anonymous doc;
        -- GROUP BY doc_id would otherwise POOL all null-id docs into one
        -- merged-bigram row — the r4 ADVICE divergence)
        SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        WHERE doc_id IS NOT NULL
    ), bi AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(t) - 1), i -> t[i])) AS w1,
               unnest(list_transform(generate_series(1, length(t) - 1), i -> t[i+1])) AS w2
        FROM toks WHERE length(t) >= 2
    ), bc AS (SELECT doc_id, w1, w2, count(*) AS c12 FROM bi GROUP BY doc_id, w1, w2),
    m1 AS (SELECT doc_id, w1, sum(c12) AS c1 FROM bc GROUP BY doc_id, w1),
    tot AS (SELECT doc_id, sum(c12) AS n FROM bc GROUP BY doc_id)
    SELECT bc.doc_id,
           printf('%.4f', -sum((c12 / n) * log2(c12 / c1))) AS cond_entropy
    FROM bc JOIN m1 USING (doc_id, w1) JOIN tot USING (doc_id)
    GROUP BY bc.doc_id
    """,
    "custom(bigram-conditional-entropy,Shannon-1951-predictability)",
)

REGISTRY["blocklist_filter"] = QASpec(
    CU.q_blocklist_filter,
    r"""
    -- row-wise (no doc_id re-join): the filter is a per-ROW classification,
    -- so the SQL twin must not route hit counts through a doc_id equi-join —
    -- LEFT JOIN ... USING (doc_id) never matches NULL ids (a null-id doc
    -- full of blocklisted words came back keep=true, the r4 ADVICE
    -- divergence) and would multiply rows on duplicate ids
    SELECT doc_id,
           coalesce(length(list_filter(regexp_extract_all(text, '\S+'),
                    t -> lower(t) IN ('dup', 'spark', 'vector'))), 0) AS n_hits,
           coalesce(length(list_filter(regexp_extract_all(text, '\S+'),
                    t -> lower(t) IN ('dup', 'spark', 'vector'))), 0) = 0 AS keep
    FROM documents
    """,
    "custom(c4-blocklist-filter,Raffel-2020)",
)

# --------------------------------------------------- corpus-audit operators
from metareadability_ray.pipelines import audit as AU  # noqa: E402

REGISTRY["corpus_diff"] = QASpec(
    AU.q_corpus_diff,
    r"""
    -- the same deterministic two-snapshot derivation as the Ray harness
    -- (production diffs two real snapshot dirs; the sf gate has one table)
    WITH old_snap AS (
        SELECT doc_id, md5(coalesce(text, '')) AS h
        FROM documents WHERE doc_id IS NOT NULL
    ), new_snap AS (
        SELECT doc_id,
               md5(coalesce(text, '') ||
                   CASE WHEN doc_id % 5 = 0 THEN ' [v2]' ELSE '' END) AS h
        FROM documents WHERE doc_id IS NOT NULL AND doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 1000000000, md5('added:' || coalesce(text, ''))
        FROM documents WHERE doc_id IS NOT NULL AND doc_id % 11 = 3
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.h <> n.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
    """,
    "custom(corpus-snapshot-diff,curation-regression-audit)",
)

REGISTRY["table_profile"] = QASpec(
    AU.q_table_profile,
    r"""
    SELECT 'doc_id' AS col, count(*) AS n_rows, count(*) - count(doc_id) AS n_nulls,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_v, CAST(max(doc_id) AS VARCHAR) AS max_v
    FROM documents
    UNION ALL
    SELECT 'text', count(*), count(*) - count(text), count(DISTINCT text),
           min(text), max(text) FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
           min(lang), max(lang) FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
           min(source), max(source) FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
    """,
    "custom(table-profiler,one-pass-column-stats)",
)

REGISTRY["embedding_dim_stats"] = QASpec(
    AU.q_embedding_dim_stats,
    r"""
    -- identical micro-int fixing + float64 expression as the Ray kernel
    -- (centroid_confusion precedent): stats derive from EXACT int64 sums
    WITH vals AS (
        SELECT i AS dim, CAST(floor(embedding[i] * 1000000 + 0.5) AS BIGINT) AS mv
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    )
    SELECT dim, count(*) AS n,
           printf('%.4f', sum(mv) / 1e6 / count(*)) AS mean,
           printf('%.4f', sqrt(greatest(
               sum(mv * mv) / 1e12 / count(*) - (sum(mv) / 1e6 / count(*)) ** 2,
               0))) AS std,
           printf('%.4f', min(mv) / 1e6) AS min_v,
           printf('%.4f', max(mv) / 1e6) AS max_v
    FROM vals GROUP BY dim
    """,
    "custom(embedding-dim-health,per-dimension-moments)",
)

REGISTRY["url_hits"] = QASpec(
    LG.q_url_hits,
    None,  # iterative numerical fixed point — no SQL twin; tested by exact
    # numpy-oracle replay over independently regex-extracted edges and a
    # distributed≡local property (tests/test_linkgraph.py)
    "custom(url-hits,Kleinberg-1999-hubs-authorities)",
)

REGISTRY["distinct_ngram_hll"] = QASpec(
    T2.q_distinct_ngram_hll,
    None,  # sketch (register-valued) — no SQL twin; agreement vs the exact
    # distinct_ngram_ratio op (≤5% rel err) + determinism pinned in
    # tests/test_textops2_hll.py
    "custom(distinct-ngram-hll,Flajolet-2007-scale-twin-of-distinct_ngram_ratio)",
)

REGISTRY["cluster_topics"] = QASpec(
    V.q_cluster_topics,
    None,  # k-means + c-TF-IDF — no SQL twin; planted-vocabulary recovery,
    # determinism and doc-accounting pinned in tests/test_cluster_topics.py
    "custom(cluster-topics,cTFIDF-Grootendorst-2022,corpus-exploration)",
)

REGISTRY["tokenizer_fertility"] = QASpec(
    CU.q_tokenizer_fertility,
    r"""
    SELECT lang, count(*) AS n_docs,
           CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS n_chars,
           CAST(coalesce(sum(length(regexp_extract_all(text,
                ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))), 0) AS BIGINT)
               AS n_bpe_tokens,
           printf('%.4f', CAST(coalesce(sum(length(text)), 0) AS BIGINT) * 1.0 /
                  greatest(CAST(coalesce(sum(length(regexp_extract_all(text,
                      ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))), 0) AS BIGINT), 1))
               AS chars_per_token
    FROM documents WHERE lang IS NOT NULL GROUP BY lang
    """,
    "custom(tokenizer-fertility,per-lang-chars-per-bpe-pretoken)",
)

REGISTRY["canary_scan"] = QASpec(
    CU.q_canary_scan,
    r"""
    -- LEFT JOIN ON TRUE keeps every canary row (0 hits) even over an
    -- all-null corpus; occurrence count via the replace()-length identity
    -- (exact for non-self-overlapping canaries — the operator's contract)
    WITH c(canary) AS (VALUES ('dup row'), ('spark'), ('vector'))
    SELECT c.canary,
           CAST(coalesce(sum(CASE WHEN contains(text, c.canary) THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_docs_hit,
           CAST(coalesce(sum(CAST((length(text) - length(replace(text, c.canary, '')))
               / length(c.canary) AS BIGINT)), 0) AS BIGINT) AS n_occurrences
    FROM c LEFT JOIN documents ON TRUE
    GROUP BY c.canary
    """,
    "custom(canary-scan,Carlini-memorization-probe-audit)",
)

REGISTRY["kmeanspp_sample"] = QASpec(
    V.q_kmeanspp_sample,
    None,  # iterative sampling algorithm — no SQL twin; exact local-oracle
    # replay (bit-identical, not approximate), determinism, and
    # planted-cluster coverage pinned in tests/test_kmeanspp.py
    "custom(kmeans-parallel-seeding,Bahmani-2012-scalable-kmeanspp)",
)

REGISTRY["compression_ratio"] = QASpec(
    CU.q_compression_ratio,
    None,  # zlib has no DuckDB scalar — rows-only; repetition/noise
    # separation, null handling and determinism pinned in
    # tests/test_compression_ratio.py
    "custom(compression-ratio,byte-level-redundancy-signal)",
)

from metareadability_ray.pipelines import quality as QL  # noqa: E402

REGISTRY["charset_profile"] = QASpec(
    QL.q_charset_profile,
    r"""
    SELECT doc_id,
           coalesce(length(text), 0) AS n_chars,
           coalesce(length(text)
               - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')), 0) AS n_non_ascii,
           coalesce(length(text)
               - length(regexp_replace(text, '[0-9]', '', 'g')), 0) AS n_digits,
           coalesce(length(text) - length(replace(text, chr(65533), '')), 0) AS n_fffd,
           CASE WHEN coalesce(length(text), 0) = 0 THEN NULL
                ELSE printf('%.4f',
                     (length(text) - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')))
                     / CAST(length(text) AS DOUBLE))
           END AS non_ascii_pct
    FROM documents WHERE doc_id IS NOT NULL
    """,
    "custom(charset-profile,mojibake-decode-failure-audit)",
)

REGISTRY["markup_leakage"] = QASpec(
    QL.q_markup_leakage,
    r"""
    WITH per AS (
        SELECT source,
               CASE WHEN text IS NULL THEN 0
                    ELSE length(regexp_extract_all(text, '(<[A-Za-z][^>]*>)|(&[a-z]+;)'))
               END AS hits
        FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(hits) AS BIGINT) AS n_hits,
           printf('%.4f', sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END)
                          / CAST(count(*) AS DOUBLE)) AS flag_pct
    FROM per GROUP BY source
    """,
    "custom(markup-leakage,extraction-residue-regression-audit)",
)

REGISTRY["hash_feature_score"] = QASpec(
    QL.q_hash_feature_score,
    r"""
    -- hashed-feature weight = (first 8 md5 hex digits as uint32) % 2001 - 1000,
    -- an exact integer milli-unit on both engines (summation-order-proof)
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
    toks AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM d
    ),
    w AS (
        SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 268435456
              + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16777216
              + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 1048576
              + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) * 65536
              + (strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1)) % 2001 - 1000 AS wm
        FROM toks
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_tokens, CAST(sum(wm) AS BIGINT) AS sm
        FROM w GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(agg.n_tokens, 0) AS n_tokens,
           CASE WHEN agg.n_tokens IS NULL THEN NULL
                ELSE printf('%.4f', sm / (1000.0 * agg.n_tokens)) END AS score
    FROM d LEFT JOIN agg USING (doc_id)
    """,
    "custom(hashed-bow-linear-score,fastText-style-quality-classifier-shape)",
)

REGISTRY["event_type_overlap"] = QASpec(
    QL.q_event_type_overlap,
    """
    WITH du AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_users
    FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    "custom(event-type-audience-overlap,cross-stream-contamination-matrix)",
)

REGISTRY["contrastive_pairs"] = QASpec(
    C.q_contrastive_pairs,
    r"""
    WITH RECURSIVE """ + _NGRAM_CTES + r""",
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter_t
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE inter * 5 >= 1 * (sa.set_size + sb.set_size - inter)
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clus AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    )
    SELECT cluster_id AS anchor_id, doc_id AS positive_id
    FROM clus WHERE doc_id <> cluster_id
    """,
    "custom(contrastive-pairs,dedup-byproduct-training-positives)",
)

from metareadability_ray.pipelines import audit as AU2  # noqa: E402
from metareadability_ray.pipelines import analytics as AN3  # noqa: E402

REGISTRY["lsh_recall_audit"] = QASpec(
    AU2.q_lsh_recall_audit,
    None,  # composes the exact (SQL-checked) and LSH (probabilistic) pair
    # streams; the audit numbers are pinned by tests/test_recall_audits.py
    # (hand-computable corpus + all-candidates-found invariants)
    "custom(lsh-candidate-recall-audit,scale-path-admission-gate)",
)

REGISTRY["ann_recall_audit"] = QASpec(
    AU2.q_ann_recall_audit,
    None,  # IVF side is probabilistic (nprobe-truncated) — rows-only;
    # per-query recall values pinned vs brute force in tests
    "custom(ann-recall-at-k-audit,index-quality-dashboard)",
)

REGISTRY["extraction_coverage"] = QASpec(
    AU2.q_extraction_coverage,
    None,  # composes the flagship DOM-extraction chain (not SQL-expressible);
    # per-host coverage values pinned by a committed sf0.001 snapshot +
    # determinism test
    "MR-X0+custom(per-host-field-coverage,extraction-regression-dashboard)",
)

REGISTRY["burst_detect"] = QASpec(
    AN3.q_burst_detect,
    None,  # iterative 2-state Viterbi DP — no SQL twin; exact local-oracle
    # replay + planted-burst recovery tests pin values
    "custom(kleinberg-burst-detection,KDD-2002-2-state-batch-variant)",
)

REGISTRY["type_token_ratio"] = QASpec(
    QL.q_type_token_ratio,
    r"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
    t AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM d),
    a AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
          FROM t GROUP BY doc_id)
    SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.n_distinct, 0) AS n_distinct,
           CASE WHEN a.n_tokens IS NULL THEN NULL
                ELSE printf('%.4f', a.n_distinct / CAST(a.n_tokens AS DOUBLE))
           END AS ttr
    FROM d LEFT JOIN a USING (doc_id)
    """,
    "custom(type-token-ratio,lexical-diversity-signal)",
)

REGISTRY["posting_lists"] = QASpec(
    QL.q_posting_lists,
    r"""
    WITH t AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
            FROM documents WHERE doc_id IS NOT NULL
        )
    ),
    a AS (
        SELECT tok, count(*) AS df,
               list_slice(list_sort(list(doc_id)), 1, 3) AS sample_docs
        FROM t GROUP BY tok
    )
    SELECT tok, df, sample_docs FROM a WHERE df >= 2
    """,
    "custom(inverted-index-build,posting-lists-with-df-cut)",
)

REGISTRY["embedding_coverage"] = QASpec(
    AU2.q_embedding_coverage,
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL),
         e AS (SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL),
         m AS (SELECT count(*) AS c FROM d JOIN e ON doc_id = vec_id)
    SELECT (SELECT count(*) FROM d) AS n_docs,
           (SELECT count(*) FROM e) AS n_vectors,
           (SELECT c FROM m) AS n_matched,
           (SELECT count(*) FROM d) - (SELECT c FROM m) AS n_docs_unembedded,
           (SELECT count(*) FROM e) - (SELECT c FROM m) AS n_orphan_vectors
    """,
    "custom(doc-embedding-referential-coverage,join-health-audit)",
)

REGISTRY["html_curation_run"] = QASpec(
    CU.q_html_curation_run,
    None,  # composes the flagship DOM extraction (not SQL-expressible) with
    # hygiene gates, exact-text dedup and a hive-sharded export; the
    # accounting table is snapshot-pinned and every gate is exercised by
    # planted-junk unit tests (tests/test_quality_ops.py)
    "MR-X0+custom(end-to-end-curation-run,html→extract→gate→dedup→export)",
)

REGISTRY["ngram_novelty"] = QASpec(
    QL.q_ngram_novelty,
    r"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
    toks AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM d
    ), sh AS (
        SELECT doc_id,
               CASE WHEN length(t) = 0 THEN []
                    WHEN length(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_transform(generate_series(1, length(t) - 2),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               END AS shingles
        FROM toks
    ), ds AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
    ), own AS (
        SELECT shingle, min(doc_id) AS owner FROM ds GROUP BY shingle
    ), per AS (
        SELECT ds.doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN own.owner = ds.doc_id THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel
        FROM ds JOIN own USING (shingle) GROUP BY ds.doc_id
    )
    SELECT d.doc_id, coalesce(per.n_shingles, 0) AS n_shingles,
           coalesce(per.n_novel, 0) AS n_novel,
           CASE WHEN per.n_shingles IS NULL THEN NULL
                ELSE printf('%.4f', per.n_novel / CAST(per.n_shingles AS DOUBLE))
           END AS novelty
    FROM d LEFT JOIN per USING (doc_id)
    """,
    "custom(shingle-novelty,first-occurrence-ownership,Lee-2022-novelty-curve)",
)

REGISTRY["vocab_growth"] = QASpec(
    QL.q_vocab_growth,
    r"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
    mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM d),
    bk AS (
        SELECT doc_id,
               least(9, (doc_id - mn) * 10 // (mx - mn + 1)) AS bucket
        FROM d, mm
    ),
    toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM d),
    own AS (SELECT tok, min(doc_id) AS owner FROM toks GROUP BY tok),
    nb AS (
        SELECT bk.bucket, count(*) AS n_new
        FROM own JOIN bk ON own.owner = bk.doc_id GROUP BY bk.bucket
    )
    SELECT b.bucket, coalesce(nb.n_new, 0) AS n_new_tokens,
           CAST(sum(coalesce(nb.n_new, 0)) OVER (ORDER BY b.bucket) AS BIGINT)
               AS cum_vocab
    FROM (SELECT DISTINCT bucket FROM bk) b LEFT JOIN nb USING (bucket)
    """,
    "custom(heaps-law-vocab-growth,per-id-decile-saturation-audit)",
)

REGISTRY["mix_diversity"] = QASpec(
    QL.q_mix_diversity,
    r"""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM documents WHERE source IS NOT NULL GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t, count(*) AS k FROM c),
    r AS (
        SELECT n, row_number() OVER (ORDER BY n, source) AS rn FROM c
    )
    SELECT (SELECT k FROM tot) AS n_sources,
           printf('%.4f', (SELECT sum(-(n / CAST(t AS DOUBLE))
                               * log2(n / CAST(t AS DOUBLE))) FROM c, tot) + 0.0)
               AS entropy_bits,
           printf('%.4f', pow(2.0, (SELECT sum(-(n / CAST(t AS DOUBLE))
                               * log2(n / CAST(t AS DOUBLE))) FROM c, tot)))
               AS effective_sources,
           printf('%.4f', (SELECT sum((2 * rn - k - 1) * n) FROM r, tot)
                          / CAST((SELECT k * t FROM tot) AS DOUBLE) + 0.0) AS gini
    """,
    "custom(mix-diversity,entropy-effective-sources-gini-concentration)",
)

REGISTRY["length_ks_drift"] = QASpec(
    QL.q_length_ks_drift,
    r"""
    WITH d AS (
        SELECT source, coalesce(n_chars, 0) AS len
        FROM documents WHERE source IS NOT NULL
    ),
    cnt AS (SELECT source, count(*) AS n FROM d GROUP BY source),
    top2 AS (
        SELECT source, n, row_number() OVER (ORDER BY n DESC, source) AS rn
        FROM cnt QUALIFY rn <= 2
    ),
    a AS (SELECT len FROM d JOIN top2 USING (source) WHERE rn = 1),
    b AS (SELECT len FROM d JOIN top2 USING (source) WHERE rn = 2),
    v AS (
        SELECT DISTINCT len
        FROM (SELECT len FROM a UNION ALL SELECT len FROM b)
    ),
    gaps AS (
        SELECT abs(
            (SELECT count(*) FROM a WHERE a.len <= v.len)
                / CAST((SELECT count(*) FROM a) AS DOUBLE)
          - (SELECT count(*) FROM b WHERE b.len <= v.len)
                / CAST((SELECT count(*) FROM b) AS DOUBLE)
        ) AS gap FROM v
    )
    SELECT
      CASE WHEN (SELECT count(*) FROM top2) < 2 THEN NULL
           ELSE (SELECT source FROM top2 WHERE rn = 1) END AS source_a,
      (SELECT source FROM top2 WHERE rn = 2) AS source_b,
      CASE WHEN (SELECT count(*) FROM top2) < 2 THEN NULL
           ELSE (SELECT n FROM top2 WHERE rn = 1) END AS n_a,
      (SELECT n FROM top2 WHERE rn = 2) AS n_b,
      CASE WHEN (SELECT count(*) FROM top2) < 2 THEN NULL
           ELSE printf('%.4f', (SELECT max(gap) FROM gaps)) END AS ks
    """,
    "custom(two-sample-KS-drift,top-2-source-length-distributions)",
)

REGISTRY["dup_rate_by_source"] = QASpec(
    QL.q_dup_rate_by_source,
    r"""
    WITH d AS (
        SELECT source, md5(text) AS h FROM documents WHERE text IS NOT NULL
    ),
    g AS (SELECT h, count(*) AS n FROM d GROUP BY h)
    SELECT d.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN g.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           printf('%.4f', sum(CASE WHEN g.n > 1 THEN 1 ELSE 0 END)
                          / CAST(count(*) AS DOUBLE)) AS dup_pct
    FROM d JOIN g USING (h) GROUP BY d.source
    """,
    "custom(per-source-exact-dup-exposure,provenance-slice-of-exact-dedup)",
)
