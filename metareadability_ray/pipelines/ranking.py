"""Corpus ranking and distribution comparison: Okapi BM25 query scoring and
Jensen–Shannon divergence between per-source unigram distributions.

Both are "two tiny global numbers, then one vectorized pass" operators:

* :func:`bm25_topk` — the classic Robertson/Spärck-Jones BM25 with the
  standard (k1=1.2, b=0.75) parameters. The corpus statistics BM25 needs
  (N, avgdl, per-term df) are a FIXED-width aggregate (one row), never a
  shuffle of the text; scoring is then one vectorized pass over a narrow
  per-doc term-frequency table.
* :func:`source_js_divergence` — pairwise JS divergence between the unigram
  token distributions of every source pair. Token counts pre-aggregate
  per block (the (source, token) combiner), shuffle only the counts keyed
  by token, and each token bucket emits fixed-size per-pair partial sums —
  the driver folds S*(S-1)/2 partials in a deterministic order.

Float-parity discipline: BM25's score is an EXPLICIT left-to-right sum of
per-term contributions (c1 + c2 + c3) in both the kernel and the SQL twin,
so IEEE addition order matches exactly; JS values print at %.4f (the repo's
cross-engine float contract, same as corr/zipf).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from metareadability_ray.functions.scalars import re2_tokens
from metareadability_ray.pipelines.relational import fmt_fixed
from metareadability_ray.pipelines.textops import _PAIR_BUCKETS

I64 = pa.int64()
F64 = pa.float64()

# the fixed benchmark query — three terms of the corpus vocabulary; a real
# deployment passes its own. Order matters for float parity (see module doc).
BM25_QUERY = ("spark", "hash", "merge")
BM25_K1 = 1.2
BM25_B = 0.75


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def bm25_topk(
    sf_dir: str, query: tuple[str, ...] = BM25_QUERY, k: int = 10
) -> pa.Table:
    """Top-k docs by BM25(query), deterministic tie-break on doc_id.

    Stage 1 (map_batches): per-doc (dl, tf_i, match_i) — a narrow fixed-width
    table (8 B * (2 + 2*|q|) per doc), materialized once: it is both the
    aggregate input and the scoring input, and recomputing it would read the
    text twice. Stage 2: ``ds.aggregate`` for N, sum_dl, df_i (one driver
    row — the legitimate scalar side). Stage 3: vectorized scoring + per-block
    top-k prefilter, then a k-row global sort. Only the winners' doc ids ever
    reach the driver.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Lucene non-negative form);
    term = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)); avgdl over ALL
    docs (sum_dl/N, exact integer sum). Docs matching no query term are not
    ranked (score 0 rows are excluded in both engines)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    q = list(query)

    def term_freqs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n = len(ids)
        dl = np.zeros(n, np.int64)
        tf = np.zeros((len(q), n), np.int64)
        for i, t in enumerate(texts):
            toks = re2_tokens(t)
            dl[i] = len(toks)
            for j, term in enumerate(q):
                tf[j, i] = toks.count(term)
        cols = {"doc_id": pa.array(ids, I64), "dl": pa.array(dl, I64)}
        for j in range(len(q)):
            cols[f"tf{j}"] = pa.array(tf[j], I64)
            cols[f"m{j}"] = pa.array((tf[j] > 0).astype(np.int64), I64)
        return pa.table(cols)

    narrow = ds.map_batches(
        term_freqs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    empty = pa.table({"doc_id": pa.array([], I64), "score": pa.array([], pa.string())})
    aggs = [Count(), Sum("dl")] + [Sum(f"m{j}") for j in range(len(q))]
    g = narrow.aggregate(*aggs)
    n_docs = int(g["count()"]) if g else 0
    if n_docs == 0:
        return empty
    avgdl = float(g["sum(dl)"] or 0) / n_docs
    if avgdl == 0.0:
        # all docs empty → no doc can match a term (both engines emit 0 rows)
        return empty
    idf = np.array(
        [
            np.log((n_docs - float(g[f"sum(m{j})"] or 0) + 0.5) / (float(g[f"sum(m{j})"] or 0) + 0.5) + 1.0)
            for j in range(len(q))
        ]
    )

    def score_block(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        any_match = np.zeros(batch.num_rows, bool)
        score = np.zeros(batch.num_rows, np.float64)
        # explicit left-to-right term order — the SQL twin writes the same
        # c0 + c1 + c2 expression, so the float sums are bit-identical
        for j in range(len(q)):
            tf = batch.column(f"tf{j}").to_numpy(zero_copy_only=False).astype(np.float64)
            score = score + idf[j] * (tf * (BM25_K1 + 1.0)) / (tf + norm)
            any_match |= tf > 0
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[any_match]
        score = score[any_match]
        # per-block top-k prefilter: the global top-k is contained in the
        # union of block top-ks (score sorts independently per row)
        if len(ids) > k:
            part = np.argpartition(-score, k - 1)[:k]
            ids, score = ids[part], score[part]
        return pa.table({"doc_id": pa.array(ids, I64), "__score": pa.array(score, F64)})

    top = (
        narrow.map_batches(score_block, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["__score", "doc_id"], descending=[True, False])
        .limit(k)
    )
    tabs = list(top.iter_batches(batch_format="pyarrow"))
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="permissive")
    if t.num_rows == 0:
        return empty
    return pa.table(
        {"doc_id": t.column("doc_id"), "score": fmt_fixed(t.column("__score"), 4)}
    )


def q_bm25_topk(sf_dir: str) -> pa.Table:
    return bm25_topk(sf_dir)


# ---------------------------------------------------------- JS divergence
def source_js_divergence(sf_dir: str) -> pa.Table:
    """JS(P_a || P_b) for every source pair a < b, where P_s is source s's
    unigram token distribution (NULL sources excluded, as in the SQL twin's
    a.source < b.source join).

    Shape: per-block (source, token, n) combiner rows (np.unique over the
    block's token stream — one row per distinct (source, token) per block,
    never per occurrence) → token-hash bucketed reduce. Each bucket folds
    its tokens' probability vectors into S*(S-1)/2 per-pair partial sums
    (0.5*p*ln(2p/(p+q)) terms; absent-side terms are the 0.5*p*ln2 limit),
    so the final fold is #buckets * #pairs fixed-width rows, driver-summed
    in deterministic (pair, bucket) order. Per-source totals are a tiny
    (#sources ≤ corpus sources) aggregate broadcast into the reduce."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def combine_block(batch: pa.Table) -> pa.Table:
        srcs, toks = [], []
        for s, t in zip(batch.column("source").to_pylist(), batch.column("text").to_pylist()):
            if s is None:
                continue
            tt = re2_tokens(t)
            srcs.extend([s] * len(tt))
            toks.extend(tt)
        if not srcs:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], I64),
                }
            )
        # joint factorization via integer codes (no delimiter: tokens may
        # contain any non-whitespace byte in adversarial conformance data)
        su, si = np.unique(np.asarray(srcs, dtype=object), return_inverse=True)
        tu, ti = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        key = si.astype(np.int64) * np.int64(len(tu)) + ti.astype(np.int64)
        uk, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": pa.array(su[uk // len(tu)], pa.string()),
                "token": pa.array(tu[uk % len(tu)], pa.string()),
                "n": pa.array(counts.astype(np.int64), I64),
            }
        )

    partials = ds.map_batches(
        combine_block, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # bounded: blocks × sources × vocab combiner rows

    # per-source totals: tiny (one row per source) — broadcast into the reduce
    tot_rows = partials.groupby("source").aggregate(Sum("n")).take_all()
    totals = {r["source"]: float(r["sum(n)"]) for r in tot_rows}
    sources = sorted(totals)
    if len(sources) < 2:
        return pa.table(
            {
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "js": pa.array([], pa.string()),
            }
        )
    src_idx = {s: i for i, s in enumerate(sources)}
    tot_vec = np.array([totals[s] for s in sources])
    tot_ref = ray.put((src_idx, tot_vec))

    def add_bucket(batch: pa.Table) -> pa.Table:
        import hashlib

        hv = np.array(
            [
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                % _PAIR_BUCKETS
                for t in batch.column("token").to_pylist()
            ],
            dtype=np.int64,
        )
        return batch.append_column("__b", pa.array(hv, I64))

    def bucket_js(group: pa.Table) -> pa.Table:
        src_idx_, tot_ = ray.get(tot_ref)
        S = len(tot_)
        srcs = group.column("source").to_pylist()
        toks = group.column("token").to_pylist()
        ns = group.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        # fold (source, token, n) partial rows → dense P[token, source]
        tok_ids = {}
        for t in toks:
            if t not in tok_ids:
                tok_ids[t] = len(tok_ids)
        P = np.zeros((len(tok_ids), S))
        for s, t, n in zip(srcs, toks, ns):
            P[tok_ids[t], src_idx_[s]] += n
        P /= tot_
        out_a, out_b, out_v = [], [], []
        for i in range(S):
            pi = P[:, i]
            for j in range(i + 1, S):
                pj = P[:, j]
                m = pi + pj
                with np.errstate(divide="ignore", invalid="ignore"):
                    ti = np.where(pi > 0, 0.5 * pi * np.log(2.0 * pi / m), 0.0)
                    tj = np.where(pj > 0, 0.5 * pj * np.log(2.0 * pj / m), 0.0)
                out_a.append(i)
                out_b.append(j)
                out_v.append(float(np.sum(ti + tj)))
        return pa.table(
            {
                "ia": pa.array(out_a, I64),
                "ib": pa.array(out_b, I64),
                "part": pa.array(out_v, F64),
            }
        )

    parts = (
        partials.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_js, batch_format="pyarrow")
    )
    # deterministic driver fold: #buckets × #pairs fixed-width rows
    acc: dict[tuple[int, int], list[float]] = {}
    for t in parts.iter_batches(batch_format="pyarrow"):
        for ia, ib, v in zip(
            t.column("ia").to_pylist(), t.column("ib").to_pylist(), t.column("part").to_pylist()
        ):
            acc.setdefault((ia, ib), []).append(v)
    rows_a, rows_b, rows_v = [], [], []
    for (ia, ib) in sorted(acc):
        rows_a.append(sources[ia])
        rows_b.append(sources[ib])
        rows_v.append(float(np.sum(np.sort(np.array(acc[(ia, ib)])))))
    return pa.table(
        {
            "source_a": pa.array(rows_a, pa.string()),
            "source_b": pa.array(rows_b, pa.string()),
            "js": fmt_fixed(pa.array(rows_v, F64), 4),
        }
    )


def q_source_js_divergence(sf_dir: str) -> pa.Table:
    return source_js_divergence(sf_dir)


# ------------------------------------------------- log-odds keyword mining
def log_odds_keywords(sf_dir: str, k: int = 5) -> pa.Table:
    """Per-source distinctive terms: the top-``k`` tokens of every source by
    smoothed log-odds ratio vs the REST of the corpus (the Monroe et al.
    2008 'Fightin' Words' statistic with add-one smoothing) — the standard
    "what makes this source different" report run before deciding mixture
    weights. NULL sources are excluded, as in source_js_divergence.

    lor(s, w) = ln((c_sw+1)/(n_s−c_sw+1)) − ln((c_rw+1)/(n_r−c_rw+1)),
    written as the IDENTICAL expression in the SQL twin so the doubles
    match bit-for-bit (the BM25 explicit-expression precedent); ties break
    token-ascending.

    Shape: per-block (source, token, count) combiner rows shuffle ONCE
    bucketed by token hash — a token's complete counts land in one bucket,
    so each bucket computes exact lor for its tokens (per-source totals and
    the corpus total are a tiny broadcast aggregate) and pre-cuts to its
    per-source top-k; the driver merges ≤ k·sources·buckets candidate rows
    (the _block_topk containment argument), never the vocabulary."""
    from metareadability_ray.functions.scalars import stable_hash64
    from metareadability_ray.util import lookup_ref, lookup_take

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def combine_block(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        toks: list[str] = []
        for s, t in zip(batch.column("source").to_pylist(), batch.column("text").to_pylist()):
            if s is None:
                continue
            tt = re2_tokens(t)
            srcs.extend([s] * len(tt))
            toks.extend(tt)
        if not srcs:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "tok": pa.array([], pa.string()),
                    "c": pa.array([], I64),
                    "__b": pa.array([], I64),
                }
            )
        key = np.rec.fromarrays(
            [np.asarray(srcs, dtype=object).astype(str), np.asarray(toks, dtype=object).astype(str)]
        )
        u, c = np.unique(key, return_counts=True)
        hs = stable_hash64(u.f1.astype(object))
        return pa.table(
            {
                "source": pa.array(u.f0.astype(object), pa.string()),
                "tok": pa.array(u.f1.astype(object), pa.string()),
                "c": pa.array(c, I64),
                "__b": pa.array(hs % np.int64(_PAIR_BUCKETS), I64),
            }
        )

    combined = ds.map_batches(combine_block, batch_format="pyarrow", zero_copy_batch=True)

    # tiny per-source totals (bounded by source cardinality) + corpus total
    ns_tabs = [
        b
        for b in combined.map_batches(
            lambda t: pa.table(
                {"source": t.column("source"), "n": t.column("c")}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
        if b.num_columns
    ]
    ns_schema = pa.schema([("source", pa.string()), ("n", I64)])
    ns = pa.concat_tables(ns_tabs) if ns_tabs else ns_schema.empty_table()
    n_total = int(pc.sum(ns.column("n")).as_py() or 0)
    ns_ref = lookup_ref(ns.column("source"), ns.column("n"))

    def bucket_topk(group: pa.Table) -> pa.Table:
        g = group
        toks = g.column("tok").to_numpy(zero_copy_only=False).astype(str)
        srcs = g.column("source").to_numpy(zero_copy_only=False).astype(str)
        cs = g.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        # sum the per-BLOCK partials into complete (source, token) counts
        order = np.lexsort((srcs, toks))
        toks, srcs, cs = toks[order], srcs[order], cs[order]
        new_pair = np.concatenate(
            ([True], (toks[1:] != toks[:-1]) | (srcs[1:] != srcs[:-1]))
        )
        p_starts = np.flatnonzero(new_pair)
        cs = np.add.reduceat(cs, p_starts)
        toks, srcs = toks[p_starts], srcs[p_starts]
        # per-token totals within the bucket (a token's counts are complete here)
        starts = np.flatnonzero(np.concatenate(([True], toks[1:] != toks[:-1])))
        tt = np.repeat(np.add.reduceat(cs, starts), np.diff(np.append(starts, len(toks))))
        n_s = (
            lookup_take(ns_ref, pa.array(srcs, pa.string()), default=0)
            .cast(I64)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        n_r = float(n_total) - n_s
        c_r = tt - cs
        lor = np.log((cs + 1.0) / (n_s - cs + 1.0)) - np.log((c_r + 1.0) / (n_r - c_r + 1.0))
        # per-source top-k pre-cut (containment: global per-source top-k is
        # in the union of bucket per-source top-ks)
        out_idx: list[int] = []
        so = np.lexsort((toks, -lor, srcs))
        s_sorted = srcs[so]
        b_starts = np.flatnonzero(np.concatenate(([True], s_sorted[1:] != s_sorted[:-1])))
        b_ends = np.append(b_starts[1:], len(so))
        for s, e in zip(b_starts, b_ends):
            out_idx.extend(so[s : min(e, s + k)])
        idx = np.asarray(out_idx, dtype=np.int64)
        return pa.table(
            {
                "source": pa.array(srcs[idx], pa.string()),
                "token": pa.array(toks[idx], pa.string()),
                "lor": pa.array(lor[idx], F64),
            }
        )

    cand_tabs = [
        b
        for b in combined.groupby("__b")
        .map_groups(bucket_topk, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "token": pa.array([], pa.string()),
            "r": pa.array([], I64),
            "log_odds": pa.array([], pa.string()),
        }
    )
    if not cand_tabs:
        return empty
    cand = pa.concat_tables(cand_tabs)
    srcs = cand.column("source").to_numpy(zero_copy_only=False).astype(str)
    toks = cand.column("token").to_numpy(zero_copy_only=False).astype(str)
    lor = cand.column("lor").to_numpy(zero_copy_only=False)
    so = np.lexsort((toks, -lor, srcs))
    s_sorted = srcs[so]
    b_starts = np.flatnonzero(np.concatenate(([True], s_sorted[1:] != s_sorted[:-1])))
    b_ends = np.append(b_starts[1:], len(so))
    out_idx: list[int] = []
    ranks: list[int] = []
    for s, e in zip(b_starts, b_ends):
        take = so[s : min(e, s + k)]
        out_idx.extend(take)
        ranks.extend(range(1, len(take) + 1))
    idx = np.asarray(out_idx, dtype=np.int64)
    return pa.table(
        {
            "source": pa.array(srcs[idx], pa.string()),
            "token": pa.array(toks[idx], pa.string()),
            "r": pa.array(ranks, I64),
            "log_odds": fmt_fixed(pa.array(lor[idx], F64), 4),
        }
    )


def q_log_odds_keywords(sf_dir: str) -> pa.Table:
    return log_odds_keywords(sf_dir, k=5)
