"""Corpus-curation policy operators: per-source quotas, mixture weighting,
and CCNet perplexity bucketing.

Three operators, three canonical shapes:

* :func:`q_source_cap_sample` — the Common-Crawl "domain cap": keep at most
  K documents per source, deterministically (smallest doc_id first). The
  scale shape is the same containment argument as textops2._block_topk: the
  per-source bottom-K of the corpus is contained in the union of per-BLOCK
  per-source bottom-Ks, so each block is cut to ≤ K rows per source before
  the shuffle — the all-to-all moves ≤ K·blocks·sources rows (keys + ids
  only, never text), not the corpus.
* :func:`q_mixture_weights` — temperature-scaled source mixture (weight ∝
  n_docs^alpha, the multinomial-sampling reweighting used to up-sample
  low-resource slices when composing a training mix). Per-block source
  counts combine in-batch, one source-cardinality groupby, and the final
  normalisation is a driver fold over the source table (bounded by source
  cardinality, never corpus size) in a FIXED sort order.
* :func:`q_ccnet_buckets` — CCNet's head/middle/tail split (Wenzek et al.,
  2020): per language, documents are ranked by LM bits-per-token and cut
  into 3 equal NTILE buckets (head = most natural text). The LM is the
  same add-one unigram model as webtext.q_lm_perplexity (shared builder,
  so the two queries cannot drift). Scores are fixed to 4 decimals as
  int64 micro-bits on BOTH engines, which makes the rank order integer
  arithmetic; the per-(lang, score) tie groups then shuffle ONCE, and the
  global NTILE boundary arithmetic rides on a broadcast rank-offset table
  computed from the (lang, score)-histogram — no per-lang mega-group, no
  driver pass over documents. Exact SQL NTILE semantics (first n%3 buckets
  get the extra row; ties split by doc_id).

Float-parity discipline: the only floats that cross the compare boundary
are printf-rounded (%.6f weights) or pre-fixed to integer micro-bits with
``floor(x·10⁴ + 0.5)`` spelled identically in the SQL twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from metareadability_ray.functions.scalars import re2_tokens
from metareadability_ray.util import (
    dec_null_key,
    enc_null_key,
    lookup_ref,
    lookup_take,
    null_safe_map_groups,
    with_schema_seed,
)

I64 = pa.int64()
STR = pa.string()


def _p(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


# ------------------------------------------------------------- source cap
def q_source_cap_sample(sf_dir: str, cap: int = 10) -> "ray.data.Dataset":
    """Per-source document quota: the first ``cap`` doc_ids of every source
    (row_number() OVER (PARTITION BY source ORDER BY doc_id) <= cap).

    Stage 1 cuts each BLOCK to its per-source bottom-``cap`` doc_ids
    (lexsort + segment cumcount, all numpy): the global per-source
    bottom-K is contained in the union of block bottom-Ks, so stage 2's
    key-hash shuffle carries ≤ cap rows per (source, block). Stage 2
    re-applies the same cut per source group. NULL source is a legal SQL
    partition (null_safe_map_groups's encoded-hash shuffle)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "source"])

    def block_cut(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n <= cap:
            return batch
        src = enc_null_key(batch.column("source")).to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, src))
        s = src[order]
        starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        # cumcount within source = position - start of its run
        pos = np.arange(n) - np.repeat(starts, np.diff(np.append(starts, n)))
        return batch.take(pa.array(order[pos < cap], I64))

    def group_cut(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        return group.take(idx[:cap])

    cut = ds.map_batches(block_cut, batch_format="pyarrow", zero_copy_batch=True)
    out = null_safe_map_groups(cut, "source", group_cut)
    return with_schema_seed(out, pa.schema([("doc_id", I64), ("source", STR)]))


# -------------------------------------------------------- mixture weights
def q_mixture_weights(
    sf_dir: str, alpha: float = 0.7, budget: int = 10000
) -> pa.Table:
    """Temperature-scaled source mixture: weight_s = n_s^alpha / Σ n^alpha
    (alpha < 1 flattens the mix toward low-resource sources — the standard
    multinomial reweighting for multi-source training corpora) plus the
    integer document quota at a fixed sampling budget.

    Per-block ``np.unique`` source-count partials → one source-cardinality
    groupby → driver fold over the source table in encoded-key sort order
    (fixed summation order; bounded by source cardinality). Weights print
    %.6f and quotas fix at 10⁻⁴ of the budget, absorbing pow/sum ulp drift
    between numpy and DuckDB. NULL source is its own mixture slice."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source"])

    def count_partial(batch: pa.Table) -> pa.Table:
        src = enc_null_key(batch.column("source")).to_numpy(zero_copy_only=False)
        u, c = np.unique(src.astype(object).astype(str), return_counts=True)
        return pa.table(
            {"__src": pa.array(u, STR), "n_docs": pa.array(c, I64)}
        )

    agg = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__src")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    tabs = [b for b in agg.iter_batches(batch_format="pyarrow") if b.num_columns]
    schema = pa.schema([("__src", STR), ("n_docs", I64)])
    t = pa.concat_tables(tabs) if tabs else schema.empty_table()
    t = t.take(pc.sort_indices(t, sort_keys=[("__src", "ascending")]))
    n = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
    pw = np.power(n, alpha)
    z = float(pw.sum())  # fixed fold order (sorted encoded key)
    w = pw / z if z > 0 else pw
    from metareadability_ray.pipelines.relational import fmt_fixed

    return pa.table(
        {
            "source": dec_null_key(t.column("__src")),
            "n_docs": t.column("n_docs"),
            "weight": fmt_fixed(pa.array(w, pa.float64()), 6),
            "quota": pa.array(
                np.floor(w * budget + 0.5).astype(np.int64), I64
            ),
        }
    )


# --------------------------------------------------------- CCNet buckets
def q_ccnet_buckets(sf_dir: str) -> "ray.data.Dataset":
    """CCNet head/middle/tail: per-language NTILE(3) over LM bits-per-token
    (bucket 1 = lowest perplexity = most natural text), emitted per doc.

    Distributed NTILE without a per-lang mega-group:

    1. **score** — the shared add-one unigram LM (webtext._lm_model_parts,
       broadcast once) scores each doc; bits fix to int64 micro-bits
       (``floor(bits·10⁴ + 0.5)``, the %.4f contract lm_perplexity already
       holds) so every later comparison is integer.
    2. **histogram** — per-block (lang, b4) count partials → one groupby.
       The histogram is bounded by langs × distinct fixed scores, never
       doc count; the driver folds it (sorted) into a broadcast
       rank-offset table: start[(lang, b4)] = docs of that lang with
       strictly smaller score, and n[lang].
    3. **assign** — docs shuffle once keyed (lang, b4); inside each tie
       group a doc_id sort gives the within-tie index, and bucket =
       ntile(start + idx, n[lang]) with exact SQL semantics (first n%3
       buckets get the extra row). Tie groups are bounded by score
       collisions, not corpus size.

    Docs with no tokens drop (the SQL joins through the token stream)."""
    from metareadability_ray.pipelines.webtext import _lm_model_parts

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            if t:
                toks.extend(re2_tokens(t))
        if not toks:
            return pa.table({"token": pa.array([], STR), "c": pa.array([], I64)})
        u, c = np.unique(np.asarray(toks, dtype=object).astype(str), return_counts=True)
        return pa.table({"token": pa.array(u, STR), "c": pa.array(c, I64)})

    model_ref, n_total, v_size = _lm_model_parts(
        ds.select_columns(["text"]), count_partial
    )

    def score(batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        toks: list[str] = []
        lang_of: dict[int, str | None] = {}
        for did, t, lg in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            enc_null_key(batch.column("lang")).to_pylist(),
        ):
            # null-id docs skip: the twin's final JOIN documents USING
            # (doc_id) drops them anyway (NULL never joins — r5 contract)
            if did is None or not t:
                continue
            parts = re2_tokens(t)
            if parts:
                lang_of[did] = lg
            doc_ids.extend([did] * len(parts))
            toks.extend(parts)
        if not toks:
            return pa.table(
                {
                    "doc_id": pa.array([], I64),
                    "__lang": pa.array([], STR),
                    "b4": pa.array([], I64),
                }
            )
        pairs, k = np.unique(
            np.rec.fromarrays(
                [np.asarray(doc_ids, np.int64), np.asarray(toks, dtype=object).astype(str)]
            ),
            return_counts=True,
        )
        c = (
            lookup_take(model_ref, pa.array(pairs.f1.astype(object), STR), default=0)
            .cast(I64)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        bits = -np.log2((c + 1.0) / float(n_total + v_size))
        pd_ids = pairs.f0
        starts = np.flatnonzero(np.concatenate(([True], pd_ids[1:] != pd_ids[:-1])))
        ends = np.append(starts[1:], len(pd_ids))
        out_d: list[int] = []
        out_b: list[int] = []
        for s, e in zip(starts, ends):
            ks = k[s:e].astype(np.float64)
            x = float((ks * bits[s:e]).sum()) / float(ks.sum())
            out_d.append(int(pd_ids[s]))
            out_b.append(int(np.floor(x * 10000.0 + 0.5)))
        return pa.table(
            {
                "doc_id": pa.array(out_d, I64),
                "__lang": pa.array([lang_of[d] for d in out_d], STR),
                "b4": pa.array(out_b, I64),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # ---- histogram → broadcast rank-offset table (driver holds histogram
    # rows only: langs × distinct micro-bit scores)
    def hist_partial(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {"__lang": pa.array([], STR), "b4": pa.array([], I64), "cnt": pa.array([], I64)}
            )
        key = np.rec.fromarrays(
            [
                batch.column("__lang").to_numpy(zero_copy_only=False).astype(str),
                batch.column("b4").to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "__lang": pa.array(u.f0.astype(object), STR),
                "b4": pa.array(u.f1, I64),
                "cnt": pa.array(c, I64),
            }
        )

    hist_tabs = [
        b
        for b in scored.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["__lang", "b4"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .iter_batches(batch_format="pyarrow")
        if b.num_columns
    ]
    hschema = pa.schema([("__lang", STR), ("b4", I64), ("cnt", I64)])
    hist = pa.concat_tables(hist_tabs) if hist_tabs else hschema.empty_table()
    hist = hist.take(
        pc.sort_indices(hist, sort_keys=[("__lang", "ascending"), ("b4", "ascending")])
    )
    hl = hist.column("__lang").to_numpy(zero_copy_only=False).astype(str)
    hc = hist.column("cnt").to_numpy(zero_copy_only=False)
    hb = hist.column("b4").to_numpy(zero_copy_only=False)
    # per-lang exclusive cumsum = rank offset of each (lang, b4) tie group
    csum = np.cumsum(hc) - hc
    if len(hl):
        lang_starts = np.flatnonzero(np.concatenate(([True], hl[1:] != hl[:-1])))
        base = np.repeat(csum[lang_starts], np.diff(np.append(lang_starts, len(hl))))
        start = csum - base
        lang_u = hl[lang_starts]
        lang_n = np.add.reduceat(hc, lang_starts)
    else:
        start = csum
        lang_u = np.asarray([], dtype=str)
        lang_n = np.asarray([], dtype=np.int64)
    ckeys = pa.array([f"{l}\x00{b}" for l, b in zip(hl, hb)], STR)
    start_ref = lookup_ref(ckeys, pa.array(start, I64))
    n_ref = lookup_ref(
        pa.array(lang_u.astype(object), STR), pa.array(lang_n.astype(np.int64), I64)
    )

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [
            f"{l}\x00{b}"
            for l, b in zip(
                batch.column("__lang").to_pylist(), batch.column("b4").to_pylist()
            )
        ]
        return batch.append_column("__k", pa.array(keys, STR))

    def assign(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group, sort_keys=[("doc_id", "ascending")]))
        m = g.num_rows
        s = int(
            lookup_take(start_ref, g.column("__k").slice(0, 1)).to_pylist()[0]
        )
        lang_enc = g.column("__lang")[0].as_py()
        n = int(lookup_take(n_ref, g.column("__lang").slice(0, 1)).to_pylist()[0])
        ranks = s + np.arange(m, dtype=np.int64)
        q, r = divmod(n, 3)
        if q == 0:  # fewer rows than buckets: bucket = rank + 1
            bucket = ranks + 1
        else:
            big = r * (q + 1)
            bucket = np.where(
                ranks < big, ranks // (q + 1) + 1, r + (ranks - big) // q + 1
            )
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "__lang": pa.array([lang_enc] * m, STR),
                "bucket": pa.array(bucket.astype(np.int64), I64),
            }
        )

    def decode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": dec_null_key(batch.column("__lang")),
                "bucket": batch.column("bucket"),
            }
        )

    keyed = scored.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = null_safe_map_groups(keyed, "__k", assign).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )
    return with_schema_seed(
        out, pa.schema([("doc_id", I64), ("lang", STR), ("bucket", I64)])
    )


# ------------------------------------------------- DSIR importance weights
def q_dsir_weights(sf_dir: str, target_lang: str = "en") -> "ray.data.Dataset":
    """DSIR (Xie et al., 2023, 'Data Selection for Language Models via
    Importance Resampling'): per-document log importance weight
    log w(doc) = Σ_t k_t · (ln p_target(t) − ln p_source(t)) under add-one
    unigram models of the target slice (here: lang = ``target_lang``) and
    the full corpus — the score that upweights raw-web documents that look
    like the target distribution before Gumbel-top-k resampling.

    Both models are the shared :func:`webtext._lm_model_parts` builder
    (vocabulary-groupby + one broadcast each; at 10^12 docs the broadcast
    is bounded by vocabulary with the same count-cut disclosure as
    lm_perplexity). The score pass reads the text once and does two
    vectorized lookups per distinct (doc, token). An empty target slice
    degrades to p_target ≡ 1 (smoothing denominator clamped to ≥1 on both
    engines) rather than ±inf. Docs with no tokens drop; %.4f printing
    absorbs engine summation-order ulps."""
    from metareadability_ray.pipelines.relational import fmt_fixed
    from metareadability_ray.pipelines.webtext import _lm_model_parts

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            if t:
                toks.extend(re2_tokens(t))
        if not toks:
            return pa.table({"token": pa.array([], STR), "c": pa.array([], I64)})
        u, c = np.unique(np.asarray(toks, dtype=object).astype(str), return_counts=True)
        return pa.table({"token": pa.array(u, STR), "c": pa.array(c, I64)})

    src_ref, src_n, src_v = _lm_model_parts(ds.select_columns(["text"]), count_partial)

    def only_target(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("lang"), target_lang)).select(["text"])

    tgt_ref, tgt_n, tgt_v = _lm_model_parts(
        ds.map_batches(only_target, batch_format="pyarrow", zero_copy_batch=True),
        count_partial,
    )
    src_den = float(max(src_n + src_v, 1))
    tgt_den = float(max(tgt_n + tgt_v, 1))

    def score(batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        toks: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            # per-doc weight: null ids skip (twin's dt filters too — r5);
            # the source/target MODELS above still see their tokens
            if did is None or not t:
                continue
            parts = re2_tokens(t)
            doc_ids.extend([did] * len(parts))
            toks.extend(parts)
        if not toks:
            return pa.table(
                {"doc_id": pa.array([], I64), "log_ratio": pa.array([], STR)}
            )
        pairs, k = np.unique(
            np.rec.fromarrays(
                [np.asarray(doc_ids, np.int64), np.asarray(toks, dtype=object).astype(str)]
            ),
            return_counts=True,
        )
        tok_arr = pa.array(pairs.f1.astype(object), STR)
        cs = (
            lookup_take(src_ref, tok_arr, default=0)
            .cast(I64).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        ct = (
            lookup_take(tgt_ref, tok_arr, default=0)
            .cast(I64).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        term = np.log((ct + 1.0) / tgt_den) - np.log((cs + 1.0) / src_den)
        pd_ids = pairs.f0
        starts = np.flatnonzero(np.concatenate(([True], pd_ids[1:] != pd_ids[:-1])))
        ends = np.append(starts[1:], len(pd_ids))
        out_d = [int(pd_ids[s]) for s in starts]
        out_w = [
            float((k[s:e].astype(np.float64) * term[s:e]).sum())
            for s, e in zip(starts, ends)
        ]
        return pa.table(
            {
                "doc_id": pa.array(out_d, I64),
                "log_ratio": fmt_fixed(pa.array(out_w, pa.float64()), 4),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return with_schema_seed(out, pa.schema([("doc_id", I64), ("log_ratio", STR)]))


# ---------------------------------------------------------- filter funnel
def q_filter_funnel(
    sf_dir: str, min_words: int = 1, stop_min: int = 1
) -> pa.Table:
    """Curation-funnel report: documents surviving each stage of the
    ordered filter chain — the accounting table every production curation
    run publishes (how much did each rule cost?). Stages:

    0. ``0_all`` — corpus rows.
    1. ``1_tokens`` — has ≥1 token (NULL/empty text drops).
    2. ``2_quality`` — the Gopher word-shape rules via the SHARED
       webtext._gopher_counts arithmetic (mean word length in [3, 10],
       ≥80% alphabetic words, ≥``stop_min`` distinct stop words,
       ≥``min_words`` words). The word-count floor is parameterized and
       defaults to 1 here because the synthetic corpus is short-doc; a
       production run passes the Rae-2021 [50, 100k] window.
    3. ``3_unique_spans`` — additionally carries NO cross-doc duplicated
       sliding 4-gram (the Lee-2022 dup set via the shared
       :func:`webtext._dup_gram_ref` builder).

    One pass computes every per-doc flag locally (the dup probe is a
    broadcast keyset hit, same as dup_span_stats); each block contributes
    ONE row of 4 counters, so the driver folds blocks — never documents.
    """
    from metareadability_ray.pipelines.webtext import (
        _dup_gram_ref,
        _gopher_counts,
    )

    k = 4
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    dup_ref = _dup_gram_ref(ds, k)
    from metareadability_ray.util import keyset_mask

    def flags_partial(batch: pa.Table) -> pa.Table:
        s0 = batch.num_rows
        s1 = s2 = s3 = 0
        docs: list[tuple[int, int, int]] = []  # (quality, n_grams); s1 inline
        grams: list[str] = []
        quals: list[int] = []
        ngs: list[int] = []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            # stage 0 counts EVERY corpus row (incl. anonymous docs), but
            # stages 1+ skip null ids on both engines: SQL's per-doc agg
            # GROUP BY doc_id pools them (r5 null-id contract)
            if did is None or not t:
                continue
            toks = re2_tokens(t)
            L = len(toks)
            if L == 0:
                continue
            s1 += 1
            n, wc, na, ns, _ = _gopher_counts(toks)
            q = int(
                n >= min_words
                and 3 * n <= wc <= 10 * n
                and 5 * na >= 4 * n
                and ns >= stop_min
            )
            s2 += q
            gs = [" ".join(toks[j : j + k]) for j in range(L - k + 1)] if L >= k else []
            quals.append(q)
            ngs.append(len(gs))
            grams.extend(gs)
        hit = (
            np.asarray(keyset_mask(dup_ref, pa.array(grams, STR)))
            if grams
            else np.empty(0, dtype=bool)
        )
        pos = 0
        for q, ng in zip(quals, ngs):
            isdup = bool(hit[pos : pos + ng].any())
            pos += ng
            if q and not isdup:
                s3 += 1
        return pa.table(
            {
                "s0": pa.array([s0], I64),
                "s1": pa.array([s1], I64),
                "s2": pa.array([s2], I64),
                "s3": pa.array([s3], I64),
            }
        )

    totals = np.zeros(4, dtype=np.int64)
    for b in ds.map_batches(
        flags_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if b.num_columns:
            for i, c in enumerate(("s0", "s1", "s2", "s3")):
                totals[i] += int(pc.sum(b.column(c)).as_py() or 0)
    return pa.table(
        {
            "stage": pa.array(
                ["0_all", "1_tokens", "2_quality", "3_unique_spans"], STR
            ),
            "n_surviving": pa.array(totals, I64),
        }
    )


# ---------------------------------------- Stupid Backoff held-out LM scoring
def stupid_backoff_score(sf_dir: str, alpha: float = 0.4) -> "ray.data.Dataset":
    """Held-out bigram LM scoring with Stupid Backoff (Brants et al., 2007,
    "Large Language Models in Machine Translation" — THE web-scale
    MapReduce LM paper): train a bigram model on the ``doc_id % 4 != 0``
    corpus slice, score every held-out doc (``doc_id % 4 == 0``, ≥2 tokens)
    as mean −log2 S(w_i | w_{i−1}) per bigram position, where

        S(w2|w1) = c2(w1,w2)/c1(w1)            if c2 > 0
                 = α · (c1(w2)+1)/(N+1)        otherwise (α = 0.4)

    Brants' S is deliberately unnormalised ("stupid"); the backoff unigram
    gets add-one smoothing so unseen held-out words score finitely (the
    dsir_weights degeneracy precedent). The held-out split is what makes
    backoff REAL — scoring the training slice with its own model never
    leaves the c2 > 0 branch (the lm_perplexity caveat this op fixes).

    Scale shape is the paper's own sharded-LM architecture: the BIGRAM
    model — the part that grows with the corpus — is never broadcast and
    never driver-resident. Train-slice per-block (w1, w2, count) partials
    and held-out per-block (doc_id, w1, w2, k) rows shuffle ONCE together,
    bucketed by hash(w1), so each bucket holds a complete shard of the
    model plus exactly the queries that need it (Brants' "distribute by
    first word" serving layout). Only the UNIGRAM model broadcasts (the
    lm_perplexity / CCNet KenLM-ship precedent, bounded by vocabulary).
    Per-doc results leave each bucket as two int64 partials (Σ k·microbits,
    Σ k), so the final groupby(doc_id) moves 24 B/doc/bucket.

    Float parity: each bigram's bits fix to int64 MICRO-bits
    (``floor(bits·10⁶ + 0.5)``, spelled identically in the SQL twin) BEFORE
    any cross-bucket summation, so partial-sum order cannot move the score;
    the final division of two exact integers is one float op on both
    engines, printed %.4f. NULL doc_id rows belong to neither slice (SQL:
    NULL % 4 compares unknown both ways)."""
    from metareadability_ray.pipelines.textops import _PAIR_BUCKETS
    from metareadability_ray.functions.scalars import stable_hash64
    from metareadability_ray.pipelines.webtext import _lm_model_parts

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None or did % 4 == 0 or not t:
                continue
            toks.extend(re2_tokens(t))
        if not toks:
            return pa.table({"token": pa.array([], STR), "c": pa.array([], I64)})
        u, c = np.unique(np.asarray(toks, dtype=object).astype(str), return_counts=True)
        return pa.table({"token": pa.array(u, STR), "c": pa.array(c, I64)})

    uni_ref, n_total, _v = _lm_model_parts(ds, uni_partial)

    def bigram_rows(batch: pa.Table) -> pa.Table:
        """Union rows: model partials (doc_id NULL) + held-out query rows."""
        tr_w1: list[str] = []
        tr_w2: list[str] = []
        ho_d: list[int] = []
        ho_w1: list[str] = []
        ho_w2: list[str] = []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None or not t:
                continue
            parts = re2_tokens(t)
            if len(parts) < 2:
                continue
            if did % 4 != 0:
                tr_w1.extend(parts[:-1])
                tr_w2.extend(parts[1:])
            else:
                ho_d.extend([did] * (len(parts) - 1))
                ho_w1.extend(parts[:-1])
                ho_w2.extend(parts[1:])
        cols = {"doc_id": [], "w1": [], "w2": [], "k": []}
        if tr_w1:
            u, c = np.unique(
                np.rec.fromarrays(
                    [
                        np.asarray(tr_w1, dtype=object).astype(str),
                        np.asarray(tr_w2, dtype=object).astype(str),
                    ]
                ),
                return_counts=True,
            )
            cols["doc_id"].append(pa.nulls(len(u), I64))
            cols["w1"].append(pa.array(u.f0.astype(object), STR))
            cols["w2"].append(pa.array(u.f1.astype(object), STR))
            cols["k"].append(pa.array(c, I64))
        if ho_d:
            u, c = np.unique(
                np.rec.fromarrays(
                    [
                        np.asarray(ho_d, np.int64),
                        np.asarray(ho_w1, dtype=object).astype(str),
                        np.asarray(ho_w2, dtype=object).astype(str),
                    ]
                ),
                return_counts=True,
            )
            cols["doc_id"].append(pa.array(u.f0, I64))
            cols["w1"].append(pa.array(u.f1.astype(object), STR))
            cols["w2"].append(pa.array(u.f2.astype(object), STR))
            cols["k"].append(pa.array(c, I64))
        if not cols["w1"]:
            return pa.table(
                {
                    "doc_id": pa.array([], I64),
                    "w1": pa.array([], STR),
                    "w2": pa.array([], STR),
                    "k": pa.array([], I64),
                    "__b": pa.array([], I64),
                }
            )
        w1 = pa.concat_arrays(cols["w1"])
        out = pa.table(
            {
                "doc_id": pa.concat_arrays(cols["doc_id"]),
                "w1": w1,
                "w2": pa.concat_arrays(cols["w2"]),
                "k": pa.concat_arrays(cols["k"]),
                "__b": pa.array(
                    stable_hash64(w1.to_numpy(zero_copy_only=False).astype(object))
                    % np.int64(_PAIR_BUCKETS),
                    I64,
                ),
            }
        )
        return out

    rows = ds.map_batches(bigram_rows, batch_format="pyarrow", zero_copy_batch=True)

    n_f = float(n_total)

    def bucket_score(group: pa.Table) -> pa.Table:
        dids = group.column("doc_id").to_numpy(zero_copy_only=False)
        is_q = ~pa.compute.is_null(group.column("doc_id")).to_numpy(zero_copy_only=False)
        w1 = group.column("w1").to_numpy(zero_copy_only=False).astype(str)
        w2 = group.column("w2").to_numpy(zero_copy_only=False).astype(str)
        ks = group.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "doc_id": pa.array([], I64),
                "nb": pa.array([], I64),
                "k": pa.array([], I64),
            }
        )
        if not is_q.any():
            return empty
        # complete bigram-shard counts from the model partials (this bucket
        # holds EVERY partial for its w1 hash range, so the sum is exact)
        pairs = np.rec.fromarrays([w1, w2])
        uniq, inv = np.unique(pairs, return_inverse=True)
        c2 = np.bincount(
            inv[~is_q], weights=ks[~is_q].astype(np.float64), minlength=len(uniq)
        )
        q_c2 = c2[inv[is_q]]
        q_w1, q_w2 = w1[is_q], w2[is_q]
        q_k = ks[is_q]
        q_d = dids[is_q].astype(np.int64)
        c1a = (
            lookup_take(uni_ref, pa.array(q_w1.astype(object), STR), default=0)
            .cast(I64)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        c1b = (
            lookup_take(uni_ref, pa.array(q_w2.astype(object), STR), default=0)
            .cast(I64)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        seen = q_c2 > 0
        bits = np.where(
            seen,
            -np.log2(np.where(seen, q_c2, 1.0) / np.where(c1a > 0, c1a, 1.0)),
            -np.log2(alpha * (c1b + 1.0) / (n_f + 1.0)),
        )
        mb = np.floor(bits * 1_000_000.0 + 0.5).astype(np.int64)
        order = np.argsort(q_d, kind="stable")
        q_d, mb, q_k = q_d[order], mb[order], q_k[order]
        starts = np.flatnonzero(np.concatenate(([True], q_d[1:] != q_d[:-1])))
        return pa.table(
            {
                "doc_id": pa.array(q_d[starts], I64),
                "nb": pa.array(np.add.reduceat(q_k * mb, starts), I64),
                "k": pa.array(np.add.reduceat(q_k, starts), I64),
            }
        )

    per_doc = (
        rows.groupby("__b")
        .map_groups(bucket_score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("nb", alias_name="nb"), Sum("k", alias_name="k"))
    )

    def fin(batch: pa.Table) -> pa.Table:
        nb = batch.column("nb").to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(k, I64),
                "sb_bits": pa.array(
                    ["%.4f" % (float(n) / (1_000_000.0 * float(kk))) for n, kk in zip(nb, k)],
                    STR,
                ),
            }
        )

    out_schema = pa.schema([("doc_id", I64), ("n_bigrams", I64), ("sb_bits", STR)])
    return with_schema_seed(
        per_doc.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


def q_stupid_backoff_score(sf_dir: str) -> "ray.data.Dataset":
    return stupid_backoff_score(sf_dir)


# --------------------------------------------- C4-style blocklist filtering
_DEMO_BLOCKLIST = ("spark", "vector", "dup")  # corpus words, so the sf gate
# exercises real hits; production passes its own list (C4 ships ~400 terms)


def q_blocklist_filter(
    sf_dir: str, blocklist: tuple[str, ...] = _DEMO_BLOCKLIST
) -> "ray.data.Dataset":
    """The C4 "bad words" rule (Raffel et al., 2020 §2.2: drop any page
    containing a blocklisted word, case-insensitive): per document, the
    blocklist hit count and the resulting keep flag. EVERY doc classifies —
    token-less/null docs are legitimate keeps with 0 hits (a filter that
    silently drops unscorable docs corrupts the funnel accounting).

    Zero shuffle: the blocklist is a constant small side (broadcast-free —
    it ships inside the task closure, the degenerate broadcast), matching
    is one Arrow ``utf8_lower`` + ``is_in`` pass over the batch token
    stream with a segment-sum per doc (``pc.utf8_lower`` = the DuckDB
    ``lower()`` twin, the normalized_dedup parity precedent)."""
    bl = pa.array(sorted(blocklist), STR)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def classify(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_pylist()
        toks: list[str] = []
        ngs: list[int] = []
        for t in batch.column("text").to_pylist():
            parts = re2_tokens(t) if t else []
            toks.extend(parts)
            ngs.append(len(parts))
        if toks:
            hit = pc.is_in(pc.utf8_lower(pa.array(toks, STR)), value_set=bl)
            hv = pc.fill_null(hit, False).to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            hv = np.zeros(0, np.int64)
        bounds = np.cumsum([0] + ngs)
        n_hits = np.add.reduceat(
            np.append(hv, 0), bounds[:-1]
        ) * (np.diff(bounds) > 0)
        return pa.table(
            {
                "doc_id": pa.array(dids, I64),
                "n_hits": pa.array(n_hits.astype(np.int64), I64),
                "keep": pa.array(n_hits == 0),
            }
        )

    return ds.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- tokenizer fertility
def q_tokenizer_fertility(sf_dir: str) -> "ray.data.Dataset":
    """Per-language tokenizer fertility: characters per BPE-ish pretoken —
    the cross-lingual cost audit of a training mix (a language whose text
    costs 2× the tokens per character gets half the effective context and
    double the compute per byte of signal; the standard argument for
    per-lang token budgeting). Pretokens use the SAME regex as
    bpe_token_stats so the two operators cannot drift.

    Zero-shuffle-of-text: per block, one vectorized
    ``utf8_length`` + ``count_substring_regex`` pass collapses to one
    (lang, n_docs, n_chars, n_bpe_tokens) partial row per lang per block;
    one lang-cardinality groupby sums exact int64s; the ratio is one
    float division printed %.4f on both engines. NULL langs are excluded
    on both engines (the source_js_divergence contract); NULL texts count
    as docs with 0 chars / 0 tokens (coalesce on the SQL side)."""
    from metareadability_ray.pipelines.textops import _BPE_RE

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch.column("lang"))
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table(
                {"lang": pa.array([], STR), "n_docs": pa.array([], I64),
                 "n_chars": pa.array([], I64), "n_bpe_tokens": pa.array([], I64)}
            )
        langs = np.asarray(b.column("lang").to_pylist(), dtype=object).astype(str)
        chars = (
            pc.fill_null(pc.utf8_length(b.column("text")), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        toks = (
            pc.fill_null(pc.count_substring_regex(b.column("text"), _BPE_RE), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(langs, kind="stable")
        sl, sc, st = langs[order], chars[order], toks[order]
        starts = np.flatnonzero(np.concatenate(([True], sl[1:] != sl[:-1])))
        return pa.table(
            {
                "lang": pa.array(sl[starts].astype(object), STR),
                "n_docs": pa.array(
                    np.diff(np.append(starts, len(sl))).astype(np.int64), I64
                ),
                "n_chars": pa.array(np.add.reduceat(sc, starts), I64),
                "n_bpe_tokens": pa.array(np.add.reduceat(st, starts), I64),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        nd = int(pc.sum(group.column("n_docs")).as_py())
        nc = int(pc.sum(group.column("n_chars")).as_py())
        nt = int(pc.sum(group.column("n_bpe_tokens")).as_py())
        return pa.table(
            {
                "lang": pa.array([group.column("lang")[0].as_py()], STR),
                "n_docs": pa.array([nd], I64),
                "n_chars": pa.array([nc], I64),
                "n_bpe_tokens": pa.array([nt], I64),
                "chars_per_token": pa.array(["%.4f" % (nc / max(nt, 1))], STR),
            }
        )

    out_schema = pa.schema(
        [("lang", STR), ("n_docs", I64), ("n_chars", I64),
         ("n_bpe_tokens", I64), ("chars_per_token", STR)]
    )
    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(finish, batch_format="pyarrow"),
        out_schema,
    )


# ------------------------------------------------------------- canary scan
_DEMO_CANARIES = ("dup row", "spark", "vector")


def q_canary_scan(
    sf_dir: str, canaries: tuple[str, ...] = _DEMO_CANARIES
) -> "ray.data.Dataset":
    """Contamination canary scan: for each canary STRING (not token —
    eval-set sentences and guid-style canaries cross token boundaries),
    the number of documents containing it and the total occurrence count.
    This is the leak audit run before a training export: published canary
    GUIDs (the Carlini-style memorization probes) and held-out eval
    sentences must hit 0. The demo list uses corpus substrings so the sf
    gate exercises real hits; production passes the eval-set canaries.

    Zero shuffle: the canary list is a constant small side in the task
    closure; per block one vectorized ``pc.count_substring`` pass per
    canary collapses to a single (canary, docs_hit, occurrences) partial
    row, and a canary-cardinality groupby sums exact int64s. Canary
    strings must not self-overlap (no proper prefix = suffix) — both
    engines count non-overlapping leftmost matches, which only diverge on
    self-overlapping patterns (documented; the SQL twin's replace()-based
    counter has the same contract)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    cl = tuple(sorted(canaries))

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        hits: list[int] = []
        occs: list[int] = []
        for c in cl:
            n = pc.fill_null(pc.count_substring(text, c), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            hits.append(int((n > 0).sum()))
            occs.append(int(n.sum()))
        return pa.table(
            {
                "canary": pa.array(list(cl), STR),
                "n_docs_hit": pa.array(hits, I64),
                "n_occurrences": pa.array(occs, I64),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canary": pa.array([group.column("canary")[0].as_py()], STR),
                "n_docs_hit": pa.array(
                    [int(pc.sum(group.column("n_docs_hit")).as_py())], I64
                ),
                "n_occurrences": pa.array(
                    [int(pc.sum(group.column("n_occurrences")).as_py())], I64
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("canary")
        .map_groups(finish, batch_format="pyarrow")
    )


# ------------------------------------------------------ compression ratio
def q_compression_ratio(sf_dir: str, level: int = 6) -> "ray.data.Dataset":
    """Per-document zlib compression ratio (compressed bytes / raw UTF-8
    bytes) — the classic model-free redundancy signal (used across web
    curation stacks as a repetition/boilerplate detector: templated or
    looping text compresses far below natural prose, machine-generated
    gibberish compresses near 1.0). Complements the token-level
    repetition rules (gopher_repetition, bigram_cond_entropy) with a
    byte-level one that needs no tokenizer.

    Zero shuffle, stateless map: one zlib.compress per doc (C speed) at a
    FIXED level so the ratio is deterministic across platforms (zlib's
    output is stable for a given level/strategy). Null/empty texts emit
    ratio NULL (0 raw bytes — unscorable, kept so funnel accounting sees
    every doc; the blocklist_filter every-doc-classifies contract).
    No SQL twin (DuckDB has no zlib scalar): value snapshots + monotone
    invariants pinned in tests/test_compression_ratio.py."""
    import zlib

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def ratio(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        out_r: list[float | None] = []
        out_n: list[int] = []
        for t in batch.column("text").to_pylist():
            if not t:
                out_r.append(None)
                out_n.append(0)
                continue
            raw = t.encode("utf-8")
            out_r.append(len(zlib.compress(raw, level)) / len(raw))
            out_n.append(len(raw))
        return pa.table(
            {
                "doc_id": ids,
                "n_bytes": pa.array(out_n, I64),
                "compression_ratio": pa.array(out_r, pa.float64()),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- end-to-end HTML curation run
def html_curation_run(
    sf_dir: str,
    out_dir: str | None = None,
    num_shards: int = 8,
    min_words: int = 5,
) -> pa.Table:
    """THE end-to-end pipeline this engine exists for, composed from its
    own stages: Common-Crawl-style HTML pages → flagship DOM extraction
    (headline / pubdate / authors / main text, actor-pool kernel) →
    hygiene gates on the EXTRACTED text (word-count floor + zero raw-markup
    residue — the quality.py checks applied where they belong, post-strip)
    → exact main-text dedup (smallest-url-wins) → hive-sharded Parquet
    export. Returns the stage-accounting table (stage, n_removed,
    n_remaining) — the "where did my crawl go" answer, now starting from
    HTML bytes instead of a pre-extracted documents table.

    Scale shape, stage by stage: extraction is the streaming actor-pool
    chain (page bytes move exactly once, read → actor); the extracted
    corpus is materialized ONCE (text-sized, the standard persisted
    intermediate of a curation run — at 100 TB this is a Parquet write and
    re-read, same lineage cut) and every later stage is a cheap vectorized
    pass over it; the gates are zero-shuffle Arrow kernels; dedup ships
    only (text-hash, url) rows through one hash-bucketed shuffle and
    broadcasts the LOSER url set (bounded by dup count; the distributed
    twin buckets on url-hash with in-bucket exact compare, the
    scalable_anti_join contract); the export pays one keyed shuffle so
    every shard directory gets few fat files (hive sink). Counts are
    ``ds.count()`` / metadata reads — the driver never holds rows."""
    import hashlib as _hl
    import os
    import shutil

    import pyarrow.parquet as _pq

    from metareadability_ray.functions.scalars import stable_hash64
    from metareadability_ray.pipelines.docs2pages import pages_dataset
    from metareadability_ray.pipelines.flagship import extraction_chain
    from metareadability_ray.pipelines.quality import _MARKUP_PAT
    from metareadability_ray.sources.hive import export_hive_partitioned
    from metareadability_ray.util import auto_actor_concurrency

    n_pages = _pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    extracted = (
        extraction_chain(
            pages_dataset(sf_dir), num_partitions=16, concurrency=auto_actor_concurrency()
        )
        .select_columns(["url", "headline", "pubdate", "authors", "text"])
        .materialize()
    )

    # stage 1: extractable — the DOM scorer found a main-content container
    def extractable(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(pc.fill_null(batch.column("text"), ""), ""))

    s1 = extracted.map_batches(
        extractable, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n1 = s1.count()

    # stage 2: hygiene gates on the EXTRACTED text — word-count floor and
    # zero markup residue (a page whose "main text" still contains tags is
    # an extraction casualty, not content)
    def gate(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        words = pc.count_substring_regex(text, r"\S+")
        markup = pc.count_substring_regex(text, _MARKUP_PAT)
        ok = pc.and_(
            pc.greater_equal(words, pa.scalar(min_words)),
            pc.equal(markup, pa.scalar(0)),
        )
        return batch.filter(ok)

    s2 = s1.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n2 = s2.count()

    # stage 3: exact main-text dedup, smallest-url-wins — only (hash, url)
    # rows shuffle; loser URLs broadcast back as an anti mask
    def hash_rows(batch: pa.Table) -> pa.Table:
        texts = np.asarray(batch.column("text").to_pylist(), dtype=object)
        h = stable_hash64(texts)
        return pa.table(
            {
                "h": pa.array(h, I64),
                "url": batch.column("url"),
                "__b": pa.array(h % np.int64(64), I64),
            }
        )

    def losers_in_bucket(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        urls = np.asarray(group.column("url").to_pylist(), dtype=object)
        order = np.lexsort((urls, h))
        h, urls = h[order], urls[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        keep_first = np.zeros(len(h), dtype=bool)
        keep_first[starts] = True
        lose = urls[~keep_first]
        return pa.table({"url": pa.array(lose, STR)})

    loser_parts = (
        s2.map_batches(hash_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(losers_in_bucket, batch_format="pyarrow")
    )
    loser_urls: set[str] = set()
    for t in loser_parts.iter_batches(batch_format="pyarrow"):
        loser_urls.update(t.column("url").to_pylist())
    losers_ref = ray.put(pa.array(sorted(loser_urls), STR))

    def drop_losers(batch: pa.Table) -> pa.Table:
        bad = ray.get(losers_ref) if not isinstance(losers_ref, pa.Array) else losers_ref
        if len(bad) == 0:
            return batch
        return batch.filter(pc.invert(pc.is_in(batch.column("url"), value_set=bad)))

    s3 = s2.map_batches(drop_losers, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n3 = s3.count()

    # stage 4: hive-sharded export — shard = url-hash % num_shards
    if out_dir is None:
        out_dir = "/tmp/mr_curation_run_%s" % _hl.md5(
            os.path.abspath(sf_dir).encode()
        ).hexdigest()[:8]
    shutil.rmtree(out_dir, ignore_errors=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
        sh = (stable_hash64(urls) % np.int64(num_shards)).astype(np.int64)
        # authors is list<string>; hive writer wants flat columns → join
        auth = pa.array(
            ["; ".join(a) if a else "" for a in batch.column("authors").to_pylist()], STR
        )
        out = batch.drop_columns(["authors"]).append_column("authors", auth)
        return out.append_column("shard", pa.array([str(x) for x in sh], STR))

    if n3 > 0:
        export_hive_partitioned(
            s3.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True),
            out_dir,
            col="shard",
        )
    else:
        # nothing survived (legal on adversarial corpora): an empty export
        # dir, not a crash — the accounting table is still the answer
        os.makedirs(out_dir, exist_ok=True)

    stages = [
        ("pages", 0, n_pages),
        ("extractable", n_pages - n1, n1),
        ("quality_gate", n1 - n2, n2),
        ("exact_dedup", n2 - n3, n3),
    ]
    return pa.table(
        {
            "stage": pa.array([s for s, _, _ in stages], STR),
            "n_removed": pa.array([r for _, r, _ in stages], I64),
            "n_remaining": pa.array([n for _, _, n in stages], I64),
        }
    )


def q_html_curation_run(sf_dir: str) -> pa.Table:
    return html_curation_run(sf_dir)
