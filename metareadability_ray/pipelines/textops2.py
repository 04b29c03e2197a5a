"""Corpus-statistics text operators: heavy-hitter word counts and TF-IDF
top-terms over the `documents` table.

Both follow the same scale discipline as textops.py: each document's text
lives in exactly one row, so all per-document work (tokenize, tf, top-k)
happens inside ``map_batches`` with zero shuffle; the only thing that ever
shuffles is the (token, count) vocabulary stream — which the per-batch
combiner has already collapsed to one row per distinct token per batch, so
hot tokens ("the") cost one row per block, not one row per occurrence.
That combiner IS the skew defence: no salting needed because the shuffle
key's multiplicity is bounded by block count.
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
from metareadability_ray.util import lookup_ref, lookup_take


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _batch_tokens(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """All (doc_id, token) occurrences of a batch as parallel numpy arrays.
    ``re2_tokens`` is the exact RE2-``\\S+`` token stream of the SQL
    oracles' ``regexp_extract_all(text, '\\S+')`` — NOT ``str.split()``,
    which also splits on \\x0b and Unicode whitespace and diverges on
    such text (verified vs DuckDB in tests/test_scalars_properties.py)."""
    doc_ids: list[int] = []
    toks: list[str] = []
    for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
        if not t:
            continue
        parts = re2_tokens(t)
        # null doc_id rides as the -1 SENTINEL (ids are non-negative by
        # schema): corpus-level consumers (word counts, zipf, heavy
        # hitters) keep the anonymous docs' tokens — their SQL twins
        # count every token — while per-doc consumers (tfidf, oov_rate)
        # mask doc_ids >= 0 to match their twins' doc_id IS NOT NULL
        doc_ids.extend([did if did is not None else -1] * len(parts))
        toks.extend(parts)
    return np.asarray(doc_ids, dtype=np.int64), np.asarray(toks, dtype=object)


# -------------------------------------------------------------- heavy hitters
def _block_topk(
    ds: "ray.data.Dataset", k: int, n_col: str = "n", key_col: str = "token"
) -> "ray.data.Dataset":
    """Per-block (count desc, key asc) top-k prefilter ahead of a global
    top-k sort. After the vocabulary groupby each distinct key lives in
    exactly one block, so the union of block top-ks contains the global
    top-k — the all-to-all sort then runs over ≤ k·blocks rows instead of
    the whole vocabulary (the difference between sorting 10^8 distinct
    tokens and a few thousand rows at 100 TB)."""

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(
            batch, sort_keys=[(n_col, "descending"), (key_col, "ascending")]
        )
        return batch.take(idx[:k])

    return ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)


def q_word_count_topk(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k most frequent tokens corpus-wide (the canonical map-reduce word
    count, with the in-batch combiner that makes it scale): per batch,
    ``np.unique`` collapses the token stream to (token, count) partials;
    one groupby(token) sums them; the final sort runs over the
    vocabulary-sized aggregate only — never the corpus. Ties at the cut
    are broken lexicographically so the selected set is deterministic."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        _, toks = _batch_tokens(batch)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        u, c = np.unique(toks.astype(str), return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())})

    from metareadability_ray.util import seeded_after_limit

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = (
        _block_topk(counts, k)
        .sort(key=["n", "token"], descending=[True, False])
        .limit(k)
    )
    # an all-empty corpus is a legit 0-row result but must keep the
    # (token, n) contract — Sort drops the schema when total rows = 0
    # (hypothesis-found)
    return seeded_after_limit(out, pa.schema([("token", pa.string()), ("n", pa.int64())]))


# ----------------------------------------------------------- bottom-k sample
def q_bottomk_sample(sf_dir: str, k: int = 100) -> "ray.data.Dataset":
    """Deterministic fixed-size sample: the k documents with the smallest
    md5(doc_id) — bottom-k / priority sampling, the mergeable form of
    reservoir sampling (same result on any cluster layout, any block order,
    and under retries, unlike RNG reservoirs). Each block prunes to its
    LOCAL bottom-k first, so the global sort runs over ≤ k·blocks rows, not
    the corpus."""
    import hashlib

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pri = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        batch = batch.append_column("__pri", pa.array(pri, pa.string()))
        idx = pc.sort_indices(
            batch, sort_keys=[("__pri", "ascending"), ("doc_id", "ascending")]
        )
        return batch.take(idx[: min(k, len(idx))])

    return (
        ds.map_batches(local_bottomk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["__pri", "doc_id"])
        .limit(k)
        .drop_columns(["__pri"])
    )


# -------------------------------------------------------- train/val/test split
def q_train_test_split(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic 75/12.5/12.5 train/val/test split by content-stable
    hash (first md5 hex digit of doc_id: 0-b → train, c-d → val, e-f →
    test), reported as per-(split, lang) counts. Hash splits are the only
    splits that survive re-runs, retries, and cluster-layout changes —
    the same property as the stratified/bottom-k samplers."""
    import hashlib

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])

    from metareadability_ray.util import dec_null_key, enc_null_key

    def assign(batch: pa.Table) -> pa.Table:
        splits = []
        for i in batch.column("doc_id").to_pylist():
            if i is None:
                # SQL: md5(CAST(NULL AS VARCHAR)) is NULL, both CASE
                # comparisons are unknown, the row falls to ELSE 'test'
                splits.append("test")
                continue
            h = hashlib.md5(str(i).encode()).hexdigest()[0]
            splits.append("train" if h < "c" else ("val" if h < "e" else "test"))
        # NULL lang is a legal GROUP BY key; encoded for Ray's sort groupby
        # (null-lang strategy find)
        return pa.table(
            {"split": pa.array(splits, pa.string()), "lang": enc_null_key(batch.column("lang"))}
        )

    from ray.data.aggregate import Count

    agg = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["split", "lang"])
        .aggregate(Count(alias_name="n"))
    )

    def dec(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("lang")
        return batch.set_column(i, "lang", dec_null_key(batch.column("lang")))

    return agg.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- Misra-Gries heavy hitters
_MG_CAPACITY = 256


def _mg_prune(tokens: np.ndarray, counts: np.ndarray, cap: int):
    """Misra-Gries reduction: subtract the (cap+1)-th largest count from all
    counters and keep the positive ones (≤ cap survive). Underestimates
    only; per-prune error ≤ n_pruned/(cap+1)."""
    if len(tokens) <= cap:
        return tokens, counts
    kth = np.partition(counts, len(counts) - cap - 1)[len(counts) - cap - 1]
    keep = counts > kth
    return tokens[keep], counts[keep] - kth


def q_approx_heavy_hitters(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Approximate top-k tokens via MERGEABLE Misra-Gries summaries — the
    scale twin of q_word_count_topk for when even the vocabulary-sized
    aggregate is too wide: each batch keeps ≤256 counters (everything else
    pruned with bounded undercount), the merge is a token-sum groupby over
    ≤256·blocks rows, and the final prune restores the ≤256 bound. The
    summed estimate only ever UNDERCOUNTS, by at most n/(capacity+1)
    (Agarwal et al., "Mergeable Summaries", PODS'12) — so every token with
    frequency above that bound is guaranteed present. Rows-only for the
    driver; the guarantee is pinned in tests."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        _, toks = _batch_tokens(batch)
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "est_n": pa.array([], pa.int64())}
            )
        u, c = np.unique(toks.astype(str), return_counts=True)
        u, c = _mg_prune(u, c, _MG_CAPACITY)
        return pa.table({"token": pa.array(u, pa.string()), "est_n": pa.array(c, pa.int64())})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("est_n", alias_name="est_n"))
    )
    from metareadability_ray.util import seeded_after_limit

    # an all-null corpus legitimately yields 0 heavy hitters; keep the contract
    return seeded_after_limit(
        merged.sort(key=["est_n", "token"], descending=[True, False]).limit(k),
        pa.schema([("token", pa.string()), ("est_n", pa.int64())]),
    )
def q_tfidf_top_terms(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-document top-k TF-IDF terms with linear idf (score = tf · N/df).

    Two streaming passes over `documents`:

    1. document frequency: per batch emit each (token, doc) ONCE (the
       combiner), groupby(token) counts → a vocabulary-sized (token, df)
       table, shipped once via ``ray.put`` (bounded by vocabulary size —
       the classic broadcast small side).
    2. scoring: each doc's tf is computed wholly inside its batch (a doc is
       one row), df looked up vectorized (``pc.index_in``), and the per-doc
       top-k selected by one ``np.lexsort`` over (doc, −score, token).

    Ranking by tf·N/df is order-equivalent to ranking by tf/df; IEEE-754
    division is exactly rounded, so DuckDB and numpy order identically and
    ties fall to the lexicographic token tie-break. Output carries the
    integer (tf, df) pair — no float crosses the compare boundary."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _batch_tokens(batch)
        m = doc_ids >= 0  # per-doc op: anonymous docs skip (twin filters too)
        doc_ids, toks = doc_ids[m], toks[m]
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        # distinct (doc, token) within the batch, then count per token
        pairs = np.unique(np.rec.fromarrays([doc_ids, toks.astype(str)]))
        u, c = np.unique(pairs.f1, return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()), "df": pa.array(c, pa.int64())})

    # an all-null corpus has an EMPTY vocabulary: concat_tables([]) raises
    # (hypothesis-found crash), so fall back to a typed empty df table
    _df_schema = pa.schema([("token", pa.string()), ("df", pa.int64())])
    df_batches = [
        b
        for b in ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .iter_batches(batch_format="pyarrow")
        if b.num_columns
    ]
    df_t = (
        pa.concat_tables(df_batches) if df_batches else _df_schema.empty_table()
    )
    df_ref = lookup_ref(df_t.column("token"), df_t.column("df"))

    def score(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _batch_tokens(batch)
        m = doc_ids >= 0  # per-doc op: anonymous docs skip (twin filters too)
        doc_ids, toks = doc_ids[m], toks[m]
        if len(toks) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        toks = toks.astype(str)
        pairs, tf = np.unique(np.rec.fromarrays([doc_ids, toks]), return_counts=True)
        d, t = pairs.f0, pairs.f1
        df = np.asarray(lookup_take(df_ref, pa.array(t, pa.string()))).astype(np.int64)
        score = tf.astype(np.float64) / df  # IEEE division: engine-identical
        order = np.lexsort((t, -score, d))
        ds_, tf_, t_, df_ = d[order], tf[order], t[order], df[order]
        starts = np.r_[0, np.flatnonzero(ds_[1:] != ds_[:-1]) + 1]
        sizes = np.diff(np.r_[starts, len(ds_)])
        rank = np.arange(len(ds_)) - np.repeat(starts, sizes)
        keep = rank < k
        return pa.table(
            {
                "doc_id": pa.array(ds_[keep], pa.int64()),
                "token": pa.array(t_[keep], pa.string()),
                "tf": pa.array(tf_[keep], pa.int64()),
                "df": pa.array(df_[keep], pa.int64()),
            }
        )

    from metareadability_ray.util import with_schema_seed

    # empty/all-null corpus → 0 rows must still carry the 4-column contract
    return with_schema_seed(
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("token", pa.string()),
                ("tf", pa.int64()),
                ("df", pa.int64()),
            ]
        ),
    )


# ---------------------------------------- vocabulary coverage / OOV rate
_OOV_VOCAB = 64


def _corpus_token_counts(sf_dir: str) -> "ray.data.Dataset":
    """(token, n) corpus counts: per-batch np.unique combiner, one
    vocabulary-stream groupby — the word-count shuffle every consumer
    below shares."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        _, toks = _batch_tokens(batch)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        u, c = np.unique(toks.astype(str), return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_oov_rate(sf_dir: str, vocab_size: int = _OOV_VOCAB) -> "ray.data.Dataset":
    """Vocabulary-coverage report: build the corpus's top-``vocab_size``
    token vocabulary (count desc, token asc — deterministic at the cut) and
    score every document's out-of-vocabulary token count against it. The
    tokenizer-design / corpus-drift diagnostic: a rising OOV rate is how a
    fixed vocab (or BPE merge table) tells you the data moved.

    Scale shape: the vocabulary build is the word-count pattern (in-batch
    combiner, vocabulary-sized groupby, top-V cut on the aggregate only);
    the tiny vocab is then broadcast into a second streaming pass whose
    per-batch probe is one vectorized ``np.isin`` over the batch's token
    stream + a segment reduce per doc. Text never shuffles. Docs with no
    tokens are not rows (join-through-tokens, same as the SQL)."""
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("n_oov", pa.int64())]
    )
    top = (
        _block_topk(_corpus_token_counts(sf_dir), vocab_size)
        .sort(key=["n", "token"], descending=[True, False])
        .limit(vocab_size)
        .take_all()
    )
    vocab = np.sort(np.asarray([r["token"] for r in top], dtype=object).astype(str))
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _batch_tokens(batch)
        m = doc_ids >= 0  # per-doc output: anonymous docs skip; the corpus
        doc_ids, toks = doc_ids[m], toks[m]  # vocab above still saw them
        if len(doc_ids) == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        inv = ~np.isin(toks.astype(str), vocab)
        starts = np.flatnonzero(np.concatenate(([True], doc_ids[1:] != doc_ids[:-1])))
        ends = np.append(starts[1:], len(doc_ids))
        cum = np.concatenate(([0], np.cumsum(inv)))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[starts], pa.int64()),
                "n_tokens": pa.array(ends - starts, pa.int64()),
                "n_oov": pa.array(cum[ends] - cum[starts], pa.int64()),
            }
        )

    return with_schema_seed(
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# ------------------------------------------------- Zipf rank-frequency fit
def q_zipf_slope(sf_dir: str) -> pa.Table:
    """Zipf's-law fit of the corpus rank-frequency curve: the least-squares
    slope of ln(frequency) on ln(rank) over ALL distinct tokens (rank 1 =
    most frequent; ties ranked deterministically count desc, token asc).
    Natural text sits near slope −1 (Zipf, 1949); synthetic or heavily
    templated corpora flatten — a one-number corpus-health diagnostic.

    Scale shape: the insight is that the regression never needs per-token
    ranks — the (ln rank, ln freq) point multiset is fully determined by
    the COUNT-OF-COUNTS histogram (m tokens sharing count c occupy a
    contiguous rank run regardless of tie order). So: word-count shuffle →
    per-batch np.unique over counts → count-of-counts groupby (≤ thousands
    of rows at any corpus size). The Σln r / Σ(ln r)² work over the rank
    runs is O(n_types) — NOT histogram-bounded (the count=1 run is ~the
    whole vocabulary, a round-4 ADVICE find) — so the runs are split into
    ≤2²⁰-rank segments driver-side (segment count ≈ n_types/2²⁰ +
    n_classes, still tiny) and the log-sums run DISTRIBUTED, one vectorized
    pass per segment; the driver folds the per-segment partials in fixed
    rank order (deterministic float64 summation, bounded memory). Output
    formatted %.4f, matching DuckDB ``regr_slope`` within rounding; NULL
    when fewer than 2 distinct tokens (zero rank variance), NULL row on an
    empty corpus — both per SQL."""
    cnts = _corpus_token_counts(sf_dir)

    def cc_partial(batch: pa.Table) -> pa.Table:
        u, m = np.unique(batch.column("n").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"cnt": pa.array(u, pa.int64()), "m": pa.array(m, pa.int64())})

    hist = (
        cnts.map_batches(cc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cnt")
        .aggregate(Sum("m", alias_name="m"))
        .take_all()
    )
    from metareadability_ray.pipelines.relational import fmt_fixed

    cvals = np.array([r["cnt"] for r in hist], dtype=np.int64)
    ms = np.array([r["m"] for r in hist], dtype=np.int64)
    order = np.argsort(-cvals)  # rank runs in count-descending order
    cvals, ms = cvals[order], ms[order]
    n_types = int(ms.sum())
    n_tokens = int((cvals * ms).sum()) if n_types else None
    if n_types < 2:
        slope = None
    else:
        CH = 1 << 20
        seg_y, seg_a, seg_b = [], [], []
        r0 = 0
        for c, m in zip(cvals.tolist(), ms.tolist()):
            y = float(np.log(c))
            for s in range(0, m, CH):
                seg_y.append(y)
                seg_a.append(r0 + s + 1)
                seg_b.append(r0 + min(s + CH, m))
            r0 += m
        work = pa.table(
            {
                "y": pa.array(seg_y, pa.float64()),
                "a": pa.array(seg_a, pa.int64()),
                "b": pa.array(seg_b, pa.int64()),
            }
        )

        def seg_partial(batch: pa.Table) -> pa.Table:
            ys = batch.column("y").to_numpy(zero_copy_only=False)
            as_ = batch.column("a").to_numpy(zero_copy_only=False)
            bs = batch.column("b").to_numpy(zero_copy_only=False)
            sxs, sxxs = [], []
            for a, b in zip(as_, bs):
                x = np.log(np.arange(a, b + 1, dtype=np.float64))
                sxs.append(float(x.sum()))
                sxxs.append(float((x * x).sum()))
            return pa.table(
                {
                    "a": pa.array(as_, pa.int64()),
                    "y": pa.array(ys, pa.float64()),
                    "m": pa.array(bs - as_ + 1, pa.int64()),
                    "sx": pa.array(sxs, pa.float64()),
                    "sxx": pa.array(sxxs, pa.float64()),
                }
            )

        parts = pa.concat_tables(
            list(
                ray.data.from_arrow(work)
                .map_batches(seg_partial, batch_format="pyarrow", zero_copy_batch=True)
                .iter_batches(batch_format="pyarrow")
            ),
            promote_options="permissive",
        ).sort_by("a")  # deterministic rank-order fold
        sx = sxx = sxy = sy = 0.0
        for y, m, psx, psxx in zip(
            parts.column("y").to_pylist(),
            parts.column("m").to_pylist(),
            parts.column("sx").to_pylist(),
            parts.column("sxx").to_pylist(),
        ):
            sx += psx
            sxx += psxx
            sxy += y * psx
            sy += y * m
        denom = sxx - sx * sx / n_types
        slope = None if denom == 0.0 else (sxy - sx * sy / n_types) / denom
    slope_col = fmt_fixed(pa.array([slope], pa.float64()), 4)
    return pa.table(
        {
            "zipf_slope": slope_col,
            "n_types": pa.array([n_types if n_types else 0], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
        }
    )


# ------------------------------------ per-language char-trigram profiles
def q_char_trigram_profile(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """Per-language character-trigram profile — the Cavnar-Trenkle (1994)
    n-gram language-model building block (what a trained langid ships, vs
    ``langid``'s fixed stopword heuristic): the top-``k`` most frequent
    character trigrams of each language, ties broken lexicographically.
    Trigrams are CODEPOINT-based on the raw text (DuckDB ``substring``
    semantics; Python slicing matches exactly). NULL lang is a legal group.

    Scale shape: the word-count pattern over a denser vocabulary — each
    batch collapses its trigram stream to (lang, trigram, count) partials,
    the shuffle carries one row per distinct (lang, trigram) per block, a
    groupby sums, and the per-lang top-k runs over |langs| tiny groups
    (per-block top-k pre-cut keeps the final groups k·blocks-sized)."""
    from metareadability_ray.util import dec_null_key, enc_null_key, with_schema_seed

    out_schema = pa.schema(
        [("lang", pa.string()), ("trigram", pa.string()), ("n", pa.int64())]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        enc = enc_null_key(batch.column("lang")).to_pylist()
        for lg, t in zip(enc, batch.column("text").to_pylist()):
            if not t or len(t) < 3:
                continue
            for i in range(len(t) - 2):
                key = (lg, t[i : i + 3])
                counts[key] = counts.get(key, 0) + 1
        if not counts:
            return pa.table(
                {"lang": pa.array([], pa.string()), "tg": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        ks = list(counts)
        return pa.table(
            {
                "lang": pa.array([a for a, _ in ks], pa.string()),
                "tg": pa.array([b for _, b in ks], pa.string()),
                "n": pa.array([counts[x] for x in ks], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "tg"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def block_lang_topk(batch: pa.Table) -> pa.Table:
        # after the (lang, tg) groupby each trigram lives in exactly one
        # block, so the union of per-block PER-LANG top-ks contains the
        # global per-lang top-k — the final groups carry k·blocks rows per
        # lang instead of the full per-lang trigram vocabulary
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(
            batch,
            sort_keys=[("lang", "ascending"), ("n", "descending"), ("tg", "ascending")],
        )
        t = batch.take(idx)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], langs[1:] != langs[:-1])))
        runs = np.diff(np.append(starts, len(langs)))
        pos = np.arange(len(langs)) - np.repeat(starts, runs)
        return t.filter(pa.array(pos < k))

    counts = counts.map_batches(block_lang_topk, batch_format="pyarrow", zero_copy_batch=True)

    def per_lang_topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("n", "descending"), ("tg", "ascending")]
        )
        top = group.take(idx[:k])
        return pa.table(
            {
                "lang": dec_null_key(top.column("lang").combine_chunks() if isinstance(top.column("lang"), pa.ChunkedArray) else top.column("lang")),
                "trigram": top.column("tg"),
                "n": top.column("n"),
            }
        )

    return with_schema_seed(
        counts.groupby("lang").map_groups(per_lang_topk, batch_format="pyarrow"),
        out_schema,
    )


# --------------------------- distinct-n corpus diversity (Li et al. 2016)
def q_distinct_ngram_ratio(sf_dir: str) -> "ray.data.Dataset":
    """Per-source distinct-trigram ratio — the "distinct-n" corpus-diversity
    metric of Li et al. 2016 ("A Diversity-Promoting Objective Function"):
    ``n_distinct / n_grams`` over sliding 3-token grams. Low ratio = a
    repetitive/templated source (the pre-mix diversity audit that catches
    boilerplate farms BEFORE they dilute a training mix); NULL sources are
    excluded (the source_js_divergence contract).

    Scale shape: ONE shuffle of the per-block combined (source, gram, c)
    vocabulary stream, bucketed by gram hash so each bucket sees complete
    gram groups — exact in-bucket STRING grouping (no collision risk, the
    source_overlap shape). Each bucket emits per-source (n_distinct,
    n_grams) partials; gram-space buckets are disjoint so the final
    source-cardinality groupby sums exacts. Hot grams cost one row per
    block (combiner bound), text never shuffles. The ratio is one float
    division of two exact int64s, printed %.4f on both engines."""
    from metareadability_ray.functions.scalars import stable_hash64
    from metareadability_ray.pipelines.relational import fmt_fixed
    from metareadability_ray.pipelines.textops import _PAIR_BUCKETS
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_grams", pa.int64()),
            ("n_distinct", pa.int64()),
            ("distinct_ratio", pa.string()),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def combine_block(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        grams: list[str] = []
        for s, t in zip(batch.column("source").to_pylist(), batch.column("text").to_pylist()):
            if s is None or not t:
                continue
            toks = re2_tokens(t)
            for i in range(len(toks) - 2):
                srcs.append(s)
                grams.append(" ".join(toks[i : i + 3]))
        if not srcs:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "gram": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                    "__b": pa.array([], pa.int64()),
                }
            )
        u, c = np.unique(
            np.rec.fromarrays(
                [np.asarray(srcs, dtype=object).astype(str), np.asarray(grams, dtype=object).astype(str)]
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "source": pa.array(u.f0.astype(object), pa.string()),
                "gram": pa.array(u.f1.astype(object), pa.string()),
                "c": pa.array(c, pa.int64()),
                "__b": pa.array(
                    stable_hash64(u.f1.astype(object)) % np.int64(_PAIR_BUCKETS),
                    pa.int64(),
                ),
            }
        )

    def bucket_partial(group: pa.Table) -> pa.Table:
        srcs = group.column("source").to_numpy(zero_copy_only=False).astype(str)
        grams = group.column("gram").to_numpy(zero_copy_only=False).astype(str)
        cs = group.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.rec.fromarrays([srcs, grams])
        order = np.argsort(pairs, kind="stable")
        pairs, cs, srcs = pairs[order], cs[order], srcs[order]
        new_pair = np.concatenate(([True], pairs[1:] != pairs[:-1]))
        p_starts = np.flatnonzero(new_pair)
        # per distinct (source, gram): total occurrences; distinct counts 1
        tot = np.add.reduceat(cs, p_starts)
        s_d = srcs[p_starts]
        s_starts = np.flatnonzero(np.concatenate(([True], s_d[1:] != s_d[:-1])))
        return pa.table(
            {
                "source": pa.array(s_d[s_starts].astype(object), pa.string()),
                "nd": pa.array(
                    np.diff(np.append(s_starts, len(s_d))).astype(np.int64), pa.int64()
                ),
                "ng": pa.array(np.add.reduceat(tot, s_starts), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(combine_block, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("nd", alias_name="nd"), Sum("ng", alias_name="ng"))
    )

    def fin(batch: pa.Table) -> pa.Table:
        nd = batch.column("nd").to_numpy(zero_copy_only=False).astype(np.int64)
        ng = batch.column("ng").to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = nd.astype(np.float64) / ng.astype(np.float64)
        return pa.table(
            {
                "source": batch.column("source"),
                "n_grams": pa.array(ng, pa.int64()),
                "n_distinct": pa.array(nd, pa.int64()),
                "distinct_ratio": fmt_fixed(pa.array(ratio, pa.float64()), 4),
            }
        )

    return with_schema_seed(
        agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


def q_distinct_ngram_hll(sf_dir: str) -> "ray.data.Dataset":
    """HyperLogLog twin of :func:`q_distinct_ngram_ratio` — the 100 TB
    path. The exact op must shuffle the per-block distinct (source, gram)
    vocabulary (one row per distinct gram per block: correct, but the
    vocabulary of a web-scale source is itself TB-scale). This twin
    shuffles NO grams at all: each block emits one 4 KiB register table
    plus an exact gram COUNT per source, and the per-source merge is a
    register max + int sum — the sketch version of the same audit at
    ~1.6 % relative error (p=12; agreement vs the exact op is pinned in
    tests/test_textops2_hll.py, determinism by construction: the gram
    hash is the unsalted stable_hash64 + splitmix finalizer, so any
    cluster layout produces byte-identical registers).

    Same gram definition and NULL-source contract as the exact op (the
    two share the shingle loop's semantics; a drift here would be caught
    by the agreement test)."""
    from metareadability_ray.functions.scalars import re2_tokens, stable_hash64
    from metareadability_ray.pipelines.relational2 import _HLL_M, _HLL_P, _splitmix64
    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_grams", pa.int64()),
            ("approx_distinct", pa.int64()),
            ("approx_ratio", pa.string()),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        grams: list[str] = []
        for s, t in zip(batch.column("source").to_pylist(), batch.column("text").to_pylist()):
            if s is None or not t:
                continue
            toks = re2_tokens(t)
            for i in range(len(toks) - 2):
                srcs.append(s)
                grams.append(" ".join(toks[i : i + 3]))
        if not srcs:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "regs": pa.array([], pa.list_(pa.uint8())),
                    "n": pa.array([], pa.int64()),
                }
            )
        sa = np.asarray(srcs, dtype=object).astype(str)
        h = _splitmix64(
            stable_hash64(np.asarray(grams, dtype=object)).view(np.uint64)
        )
        idx = (h & np.uint64(_HLL_M - 1)).astype(np.int64)
        w = h >> np.uint64(_HLL_P)  # 52 significant bits → float64-exact
        _, exp = np.frexp(w.astype(np.float64))
        rank = np.where(w > 0, 52 - exp + 1, 53).astype(np.uint8)
        out_s, out_r, out_n = [], [], []
        for s in np.unique(sa):
            sel = sa == s
            regs = np.zeros(_HLL_M, dtype=np.uint8)
            np.maximum.at(regs, idx[sel], rank[sel])
            out_s.append(str(s))
            out_r.append(regs.tolist())
            out_n.append(int(sel.sum()))
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "regs": pa.array(out_r, pa.list_(pa.uint8())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(_HLL_M, dtype=np.uint8)
        for r in group.column("regs").to_pylist():
            regs = np.maximum(regs, np.asarray(r, dtype=np.uint8))
        n_grams = int(pc.sum(group.column("n")).as_py())
        est = (0.7213 / (1 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M / np.sum(
            2.0 ** -regs.astype(np.float64)
        )
        zeros = int((regs == 0).sum())
        if est <= 2.5 * _HLL_M and zeros:
            est = _HLL_M * np.log(_HLL_M / zeros)
        est_i = int(round(est))
        return pa.table(
            {
                "source": pa.array([group.column("source")[0].as_py()], pa.string()),
                "n_grams": pa.array([n_grams], pa.int64()),
                "approx_distinct": pa.array([est_i], pa.int64()),
                "approx_ratio": pa.array(
                    ["%.4f" % (est_i / n_grams if n_grams else 0.0)], pa.string()
                ),
            }
        )

    return with_schema_seed(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(merge, batch_format="pyarrow"),
        out_schema,
    )
