"""Training-data text operators over the `documents` table.

Exact dedup, n-gram Jaccard near-dup (exact, via inverted shingle index),
MinHash+LSH near-dup candidates (the 100 TB scale path), SimHash
fingerprints, token counting, quality scoring, language-ID heuristic, and
document fingerprinting — each a streaming Ray Data pipeline.

Determinism rules: NO ``hash()`` (salted per process) — all hashing is
md5/blake2 via hashlib (stable across processes/nodes), so every operator is
reproducible under retries and arbitrary block order.

Scale notes:
  * exact dedup shuffles only (hash, doc_id) pairs — never the text;
  * the inverted-index Jaccard is exact but quadratic in posting-list length;
    at 100 TB you cap/df-cut it or use the MinHash-LSH variant whose shuffle
    key is the (band, bucket) pair — both are provided;
  * all per-doc kernels are vectorized (pyarrow.compute regex counts) or
    C-speed hashlib loops; no Python-level text parsing in hot paths.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum
from metareadability_ray.functions.scalars import re2_tokens, stable_hash64
from metareadability_ray.util import auto_actor_concurrency

_TOKEN_RE = r"\S+"
I64 = pa.int64()
# Reduce-side co-location buckets for corpus-cardinality groupbys (pair
# counts, dedup hashes, attach joins). Each bucket is one vectorized reduce
# task, so size this ≈ 2-4× total cluster cores on a real deployment; 64
# saturates this sandbox's 32 CPUs.
_PAIR_BUCKETS = int(os.environ.get("MR_REDUCE_BUCKETS", "64"))
_ROUND = {"round_mode": "half_towards_infinity"}


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _docs(sf_dir: str, columns=("doc_id", "text")) -> "ray.data.Dataset":
    return ray.data.read_parquet(_p(sf_dir, "documents"), columns=list(columns))


def bucketed_distinct(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    """SELECT DISTINCT ``key`` for corpus-cardinality int keys: per-batch
    np.unique combiner, shuffle on ``key % _PAIR_BUCKETS``, per-bucket
    np.unique — one vectorized pass per bucket instead of one Ray group per
    distinct value."""

    def local_distinct(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(key).cast(I64).to_numpy(zero_copy_only=False))
        return pa.table({key: pa.array(u, I64), "__b": pa.array(u % np.int64(_PAIR_BUCKETS), I64)})

    def bucket_distinct(group: pa.Table) -> pa.Table:
        col = group.column(key)
        u = np.unique(
            (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table({key: pa.array(u, I64)})

    return (
        ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )


def bucketed_map_groups(
    ds: "ray.data.Dataset",
    key: str,
    fn,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """``ds.groupby(key).map_groups(fn)`` for corpus-cardinality int keys.

    Shuffles on ``key % num_buckets`` (default ``_PAIR_BUCKETS``) and slices
    each bucket into per-key zero-copy sub-tables with one stable argsort —
    ``fn`` sees exactly the per-key tables a plain map_groups would pass
    (intra-group row order is not pinned by either path; every caller sorts
    inside ``fn``), but Ray's per-group machinery runs once per BUCKET
    instead of once per key (~0.2 ms of Python per distinct key in Ray
    2.49's sort groupby). Key must be castable to int64 and non-null."""
    nb = num_buckets or _PAIR_BUCKETS

    def add_b(batch: pa.Table) -> pa.Table:
        kb = batch.column(key).cast(I64).to_numpy(zero_copy_only=False)
        return batch.append_column("__b", pa.array(kb % np.int64(nb), I64))

    def per_bucket(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__b"])
        k = group.column(key)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kn = k.to_numpy(zero_copy_only=False)
        order = np.argsort(kn, kind="stable")
        sorted_t = group.take(pa.array(order, I64))
        kn = kn[order]
        starts = np.flatnonzero(np.concatenate(([True], kn[1:] != kn[:-1])))
        ends = np.append(starts[1:], len(kn))
        outs = [fn(sorted_t.slice(s, e - s)) for s, e in zip(starts, ends)]
        return pa.concat_tables(outs, promote_options="permissive")

    return (
        ds.map_batches(add_b, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def reduce_side_attach(
    rows: "ray.data.Dataset",
    key: str,
    row_cols: list[tuple[str, pa.DataType]],
    attach: "ray.data.Dataset",
    attach_key: str,
    val_col: str,
    out_col: str,
    val_type: pa.DataType,
) -> "ray.data.Dataset":
    """Reduce-side inner join: ``attach[val_col]`` → ``rows[out_col]`` by key.

    Implemented as union + groupby(key) instead of ``Dataset.join``: Ray's
    acero hash join rejects list payloads and breaks on schema-less empty
    hash partitions, while a groupby reduce is robust to both. Each group
    holds one attach row (the key's payload) plus that key's data rows; the
    payload is broadcast within the group. Keys missing from ``attach``
    drop their rows (inner semantics); shuffle volume = both streams keyed
    once — the standard reduce-side-join cost.

    CONTRACT: ``attach`` must have UNIQUE keys (true for every caller —
    per-doc sizes/signatures, per-node labels), and the key column must be
    castable to non-negative int64 (true for every caller: doc ids /
    labels). With duplicates the matched payload would be the first attach
    row in intra-bucket order, which the shuffle does not pin.

    The shuffle key is ``key % _PAIR_BUCKETS``, NOT the key itself: a
    per-key groupby pays Ray's Python-level map_groups cost once per
    DISTINCT KEY (~0.2 ms/group measured — 1M-key attaches spent 200+ s
    remote), while per-bucket groups do the same join as one vectorized
    ``pc.index_in`` + ``take`` pass."""
    names = [c for c, _ in row_cols]

    def row_side(batch: pa.Table) -> pa.Table:
        # NULL join keys never match (SQL inner-join semantics — and a
        # null key crashed the int64 bucket math, r5 null-id find): drop
        # them on both sides before bucketing
        batch = batch.filter(pc.is_valid(batch.column(key)))
        cols = {c: batch.column(c).cast(t) for c, t in row_cols}
        cols[out_col] = pa.nulls(batch.num_rows, val_type)
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        kb = batch.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cols["__b"] = pa.array(kb % np.int64(_PAIR_BUCKETS), pa.int64())
        return pa.table(cols)

    def attach_side(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(attach_key)))
        n = batch.num_rows
        cols = {}
        for c, t in row_cols:
            cols[c] = batch.column(attach_key).cast(t) if c == key else pa.nulls(n, t)
        cols[out_col] = batch.column(val_col).cast(val_type)
        cols["__side"] = pa.array(np.ones(n, np.int8), pa.int8())
        kb = batch.column(attach_key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cols["__b"] = pa.array(kb % np.int64(_PAIR_BUCKETS), pa.int64())
        return pa.table(cols)

    unioned = rows.map_batches(row_side, batch_format="pyarrow", zero_copy_batch=True).union(
        attach.map_batches(attach_side, batch_format="pyarrow", zero_copy_batch=True)
    )

    def grp(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {**{c: pa.array([], t) for c, t in row_cols}, out_col: pa.array([], val_type)}
        )
        side = group.column("__side")
        att = group.filter(pc.equal(side, 1))
        data = group.filter(pc.equal(side, 0))
        if att.num_rows == 0 or data.num_rows == 0:
            return empty

        def _flat(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        pos = pc.index_in(_flat(data.column(key)), value_set=_flat(att.column(key)))
        valid = pc.is_valid(pos)
        data = data.filter(valid)
        if data.num_rows == 0:  # inner semantics: unmatched rows drop
            return empty
        vals = pc.take(_flat(att.column(out_col)), pos.filter(valid))
        return pa.table({**{c: data.column(c) for c in names}, out_col: vals.cast(val_type)})

    return unioned.groupby("__b").map_groups(grp, batch_format="pyarrow")


# ------------------------------------------------------------------ token/quality
def q_token_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-lang token counting (whitespace tokens), fully vectorized."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "text", "n_chars"])

    from metareadability_ray.util import dec_null_key, enc_null_key

    def add_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(batch.column("text"), _TOKEN_RE)
        # NULL lang is a legal GROUP BY group; Ray's sort groupby is not
        # null-safe, so the key rides encoded (null-lang strategy find)
        return pa.table(
            {
                "lang": enc_null_key(batch.column("lang")),
                "n_tokens": pc.cast(toks, pa.int64()),
                "n_chars": batch.column("n_chars"),
            }
        )

    agg = (
        ds.map_batches(add_tokens, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
            Sum("n_chars", alias_name="sum_chars"),
        )
    )

    def dec(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("lang")
        return batch.set_column(i, "lang", dec_null_key(batch.column("lang")))

    return agg.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


def q_quality_score(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc quality signals (all integer → hash-stable): token count,
    alpha-char count, mean-ish word length proxy, and a quality flag."""
    ds = _docs(sf_dir, ("doc_id", "text", "n_chars"))

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_tokens = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64())
        n_stop = pc.cast(
            pc.count_substring_regex(text, r"\b(the|a|and|of|to|in)\b"), pa.int64()
        )
        n_chars = batch.column("n_chars")
        ok = pc.and_(
            pc.and_(pc.greater_equal(n_tokens, 10), pc.greater_equal(n_chars, 50)),
            pc.greater_equal(pc.multiply(n_alpha, 2), n_chars),
        )
        # SQL CASE semantics: a NULL condition (null text) selects ELSE 0,
        # while Arrow's and_/cast would propagate null (hypothesis-found,
        # tests/test_property_conformance.py)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tokens,
                "n_alpha": n_alpha,
                "n_stopwords": n_stop,
                "quality_ok": pc.fill_null(pc.cast(ok, pa.int32()), 0),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
# GPT-2-family pretokenizer shape, simplified to the RE2 subset (no
# lookahead) so pyarrow.compute and DuckDB count identically: a token is an
# optional leading space + a letter run / digit run / symbol run.


def q_bpe_token_stats(sf_dir: str) -> "ray.data.Dataset":
    """BPE-ish subword-pretoken counting per doc (vectorized regex) — the
    'how many tokens will the tokenizer see' estimator of a training-data
    pipeline, next to the whitespace count."""
    ds = _docs(sf_dir)

    def count(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.int64()),
                "n_bpe_tokens": pc.cast(pc.count_substring_regex(text, _BPE_RE), pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------ language ID
_LANG_MARKERS = [
    # (lang, marker regex) — checked in this fixed priority order for ties
    ("en", r"\b(the|and|of|to|a)\b"),
    ("es", r"\b(el|la|de|que|los)\b"),
    ("de", r"\b(der|die|und|das|ist)\b"),
    ("fr", r"\b(le|les|des|et|une)\b"),
    ("zh", r"[一-鿿]"),
]


def q_langid(sf_dir: str) -> "ray.data.Dataset":
    """n-gram/stopword-heuristic language ID → predicted-lang counts.

    predicted = first lang (in _LANG_MARKERS order) whose marker-hit count
    equals the max; 'und' when all scores are 0.
    """
    ds = _docs(sf_dir, ("doc_id", "text"))

    def predict(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        # null text scores 0 on every marker → 'und', pinned EXPLICITLY on
        # both engines (the SQL oracle coalesces text to ''): without the
        # fill_null the null rows ride through argmax as NaN and the CASE
        # chain on the SQL side falls through to its ELSE arm instead —
        # hypothesis-found divergence on generated null-text corpora.
        scores = np.stack(
            [
                pc.fill_null(
                    pc.cast(pc.count_substring_regex(text, rx), pa.int64()), 0
                ).to_numpy(zero_copy_only=False)
                for _, rx in _LANG_MARKERS
            ]
        )  # (n_langs, n_rows)
        best = scores.argmax(axis=0)  # first max wins = registry order
        mx = scores.max(axis=0)
        langs = np.array([l for l, _ in _LANG_MARKERS])
        pred = np.where(mx > 0, langs[best], "und")
        return pa.table({"lang_pred": pa.array(pred.tolist(), pa.string())})

    return (
        ds.map_batches(predict, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang_pred")
        .aggregate(Count(alias_name="n_docs"))
    )


# ------------------------------------------------------------------ fingerprints
def q_doc_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc stable fingerprint: md5 hex + token count (SQL-checkable)."""
    ds = _docs(sf_dir)

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        # null text → null fingerprint (SQL: md5(NULL) IS NULL)
        digs = [None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        toks = pc.cast(pc.count_substring_regex(batch.column("text"), _TOKEN_RE), pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(digs, pa.string()),
                "n_tokens": toks,
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- stratified sampling
def q_stratified_sample(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic stratified sampling — the training-data MIXING op:
    keep 1/16 of 'en' docs and 8/16 of everything else, decided by the
    first hex digit of md5(text) (content-hash rates are reproducible
    across engines, block orders, and cluster sizes; null text never
    samples). Rates are per-stratum multiples of 1/16 so the SQL oracle is
    a single substring comparison."""
    import hashlib

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "text"]
    )

    def sample(batch: pa.Table) -> pa.Table:
        keep = []
        for lang, t in zip(batch.column("lang").to_pylist(), batch.column("text").to_pylist()):
            if t is None:
                keep.append(False)
                continue
            h = hashlib.md5(t.encode("utf-8")).hexdigest()[0]
            keep.append(h == "0" if lang == "en" else h <= "7")
        return batch.filter(pa.array(keep, pa.bool_())).select(["doc_id", "lang"])

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------- grouped top-k
def q_topk_docs_per_lang(sf_dir: str) -> "ray.data.Dataset":
    """Group-wise top-k (MR-O2 grouped variant): the 5 longest docs per
    lang, ties broken on doc_id. Partitioning: one lang per group."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def top5(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        return group.take(idx[:5])

    # null-safe: NULL lang is a legal group (null-lang strategy find)
    from metareadability_ray.util import null_safe_map_groups

    return null_safe_map_groups(ds, "lang", top5)


# --------------------------------------------------------- median aggregate
def q_median_doc_length(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-lang median of n_chars (even counts average the middle
    two, matching SQL ``median``). Whole-group computation inside
    map_groups — the exact-quantile pattern; at 100 TB you'd switch to a
    t-digest sketch the way HLL replaces exact distinct."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "n_chars"])

    def med(group: pa.Table) -> pa.Table:
        col = group.column("n_chars")
        # SQL median ignores NULL values; a group of only NULLs yields NULL
        v = col.drop_null().to_numpy(zero_copy_only=False)
        m = None if len(v) == 0 else f"{float(np.median(v)):.1f}"
        return pa.table(
            {
                "lang": pa.array([group.column("lang")[0].as_py()], pa.string()),
                "median_chars": pa.array([m], pa.string()),
                "n_docs": pa.array([group.num_rows], pa.int64()),
            }
        )

    # null-safe: NULL lang is a legal group (null-lang strategy find)
    from metareadability_ray.util import null_safe_map_groups

    return null_safe_map_groups(ds, "lang", med)


def q_median_hist(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-lang median, SKEW-PROOF: the hot-key-splitting twin of
    :func:`q_median_doc_length` (whose map_groups ships every row of a hot
    lang to one reducer — the classic skewed-group failure at 10^12 docs).

    Two-stage value histogram: stage 1 collapses each batch to
    (lang, n_chars, partial count) — the value acts as a built-in salt, so
    a hot lang's rows split across every block and the shuffle carries at
    most |langs|·|distinct lengths| rows per block, bounded by the value
    domain, never by the row count. Stage 2 merges the per-value counts and
    walks the cumulative histogram to the exact median (even totals average
    the two middle values, matching SQL ``median``). Identical output to
    the map_groups variant; both share one SQL oracle."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "n_chars"])

    from metareadability_ray.util import dec_null_key, enc_null_key

    def hist_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        # dropna=False + encoded key: NULL lang is a legal group, and Ray's
        # sort groupby downstream is not null-safe (null-lang strategy find)
        df = batch.to_pandas()
        g = df.groupby(["lang", "n_chars"], sort=False, dropna=False).size().reset_index(name="n")
        lang = pa.array(
            [None if isinstance(v, float) else v for v in g["lang"]], pa.string()
        )
        return pa.table(
            {
                "lang": enc_null_key(lang),
                "v": pa.array(g["n_chars"].astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].astype(np.int64), pa.int64()),
            }
        )

    merged = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "v"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def med_of_hist(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        lo_rank, hi_rank = (total - 1) // 2, total // 2  # 0-based middle(s)
        lo = v[np.searchsorted(cum, lo_rank + 1)]
        hi = v[np.searchsorted(cum, hi_rank + 1)]
        return pa.table(
            {
                # encoded 'V'+lang / 'N' — decoded below
                "lang": pa.array([group.column("lang")[0].as_py()], pa.string()),
                "median_chars": pa.array([f"{(int(lo) + int(hi)) / 2:.1f}"], pa.string()),
                "n_docs": pa.array([total], pa.int64()),
            }
        )

    out = merged.groupby("lang").map_groups(med_of_hist, batch_format="pyarrow")

    def dec(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("lang")
        return batch.set_column(i, "lang", dec_null_key(batch.column("lang")))

    return out.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------------- PII redaction
# RE2-safe patterns (no lookaround) so pyarrow.compute and DuckDB's
# regexp_replace produce byte-identical redactions.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^\s]+"


def q_redact_pii(sf_dir: str) -> "ray.data.Dataset":
    """Training-data cleaning: redact emails then URLs (fixed order — an
    email inside a URL is already gone) with typed placeholder tokens;
    emit the cleaned text + per-doc redaction counts. Fully vectorized
    (pc.replace_substring_regex / count_substring_regex), per-doc map, no
    shuffle."""
    ds = _docs(sf_dir)

    def redact(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_email = pc.cast(pc.count_substring_regex(text, _PII_EMAIL), pa.int64())
        cleaned = pc.replace_substring_regex(text, _PII_EMAIL, "<EMAIL>")
        n_url = pc.cast(pc.count_substring_regex(cleaned, _PII_URL), pa.int64())
        cleaned = pc.replace_substring_regex(cleaned, _PII_URL, "<URL>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_clean": cleaned,
                "n_emails": n_email,
                "n_urls": n_url,
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------- winnowing fingerprint
def winnow_mins(toks: list[str], k: int = 3, w: int = 4) -> set[str]:
    """The winnowing fingerprint set of one token sequence (requires
    ``len(toks) >= k``): md5-hex k-gram hashes, O(n) monotonic-deque
    sliding-window minima over windows of ``min(w, n)`` hashes (short docs
    emit the single whole-sequence window). Shared by
    :func:`q_winnow_fingerprint` and :func:`q_winnow_pairs` so the
    fingerprint definition cannot drift."""
    from collections import deque

    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode("utf-8")).hexdigest() for g in grams]
    W = min(w, len(hs))
    dq: deque[int] = deque()
    mins: set[str] = set()
    for i, h in enumerate(hs):
        while dq and hs[dq[-1]] >= h:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - W:
            dq.popleft()
        if i >= W - 1:
            mins.add(hs[dq[0]])
    return mins


def q_winnow_fingerprint(sf_dir: str, k: int = 3, w: int = 4) -> "ray.data.Dataset":
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's public
    rolling-hash scheme): hash every k-gram of the token SEQUENCE, slide a
    window of ``w`` hashes, keep each window's minimum; the distinct minima
    are the doc's fingerprints. md5-hex with lexicographic min so the
    DuckDB oracle computes the identical selection. Docs with < k tokens
    emit no row (no k-gram exists). Per-doc, fully parallel — no shuffle."""
    ds = _docs(sf_dir)

    def fp(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_min = [], [], []
        for doc_id, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            toks = re2_tokens(t)
            if len(toks) < k:
                continue
            mins = winnow_mins(toks, k, w)
            out_id.append(doc_id)
            out_n.append(len(mins))
            out_min.append(min(mins))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_fingerprints": pa.array(out_n, pa.int64()),
                "min_fingerprint": pa.array(out_min, pa.string()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def q_winnow_pairs(sf_dir: str, k: int = 3, w: int = 4) -> "ray.data.Dataset":
    """MOSS-style plagiarism candidates (Schleimer et al., 2003): document
    pairs sharing ≥1 winnowing fingerprint, with the shared-fingerprint
    count as match strength. The fingerprint kernel is the SHARED
    :func:`winnow_mins` (same k-gram hash, same window), so the pair
    search and the per-doc fingerprint report cannot drift.

    Shape: per-doc distinct (fingerprint, doc_id) rows — bounded by the
    winnow density ~2/(w+1) of the token count — shuffle ONCE bucketed by
    fingerprint hash (the minhash band machinery); inside a bucket each
    fingerprint segment expands to its doc pairs (quadratic only in docs
    sharing one fingerprint, the lsh_neardup in-bucket contract) and
    per-bucket partials pre-sum before the final (doc_a, doc_b) groupby."""
    ds = _docs(sf_dir)

    def fp_rows(batch: pa.Table) -> pa.Table:
        out_f: list[str] = []
        out_d: list[int] = []
        for doc_id, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if doc_id is None:  # pair ops skip anonymous docs (r5 contract)
                continue
            toks = re2_tokens(t)
            if len(toks) < k:
                continue
            mins = winnow_mins(toks, k, w)
            out_f.extend(mins)
            out_d.extend([doc_id] * len(mins))
        hs = (
            stable_hash64(np.asarray(out_f, dtype=object))
            if out_f
            else np.asarray([], dtype=np.int64)
        )
        return pa.table(
            {
                "fp": pa.array(out_f, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "__b": pa.array(hs % np.int64(_PAIR_BUCKETS), pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("fp", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(idx)
        fps = g.column("fp").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], fps[1:] != fps[:-1])))
        ends = np.append(starts[1:], len(fps))
        pa_l, pb_l = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            pa_l.append(ids[s:e][ai])
            pb_l.append(ids[s:e][bi])
        if not pa_l:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        key = np.rec.fromarrays([np.concatenate(pa_l), np.concatenate(pb_l)])
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_a": pa.array(u.f0, pa.int64()),
                "doc_b": pa.array(u.f1, pa.int64()),
                "n_shared": pa.array(c, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    out = (
        ds.map_batches(fp_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(_Sum("n_shared", alias_name="n_shared"))
    )
    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        out,
        pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_shared", pa.int64())]
        ),
    )


# ------------------------------------------------------------------ exact dedup
# sentinel for null text through the groupby shuffle: Ray's sort-based
# groupby cannot order null keys, and md5 hex is always 32 chars of
# [0-9a-f], so this cannot collide with a real hash.
_NULL_HASH = "\x00null"


def q_exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact text dedup: hash-partition on md5(text), keep min doc_id per
    group. Only (hash, doc_id) pairs shuffle — the text never moves.
    Null text groups as SQL NULL (md5(NULL) IS NULL, one group).

    Group count here is ~the corpus's distinct-text count, so a per-key Ray
    groupby would pay Python map-side cost per document at 10^12 scale; the
    shuffle key is instead md5%64 and each bucket aggregates with Arrow's
    C++ hash groupby (pa.TableGroupBy) in one vectorized pass."""
    ds = _docs(sf_dir)

    def to_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        digs = [
            _NULL_HASH if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in texts
        ]
        buckets = [0 if d is _NULL_HASH else int(d[:8], 16) % _PAIR_BUCKETS for d in digs]
        return pa.table(
            {
                "text_hash": pa.array(digs, pa.string()),
                "doc_id": batch.column("doc_id"),
                "__b": pa.array(buckets, I64),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        # count over text_hash, NOT doc_id: Arrow's hash "count" skips
        # nulls, but the SQL twin's count(*) counts every copy — a
        # null-id duplicate must still raise n_copies (r5 null-doc_id
        # conformance find); text_hash is sentinel-filled, never null
        t = pa.TableGroupBy(group.select(["text_hash", "doc_id"]), "text_hash").aggregate(
            [("doc_id", "min"), ("text_hash", "count")]
        )
        return pa.table(
            {
                "text_hash": t.column("text_hash"),
                "keep_doc_id": t.column("doc_id_min"),
                "n_copies": t.column("text_hash_count").cast(I64),
            }
        )

    agg = (
        ds.map_batches(to_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

    def restore_null(batch: pa.Table) -> pa.Table:
        col = batch.column("text_hash")
        fixed = pc.if_else(pc.equal(col, _NULL_HASH), pa.scalar(None, pa.string()), col)
        return batch.set_column(batch.column_names.index("text_hash"), "text_hash", fixed)

    return agg.map_batches(restore_null, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup_losers(sf_dir: str) -> "ray.data.Dataset":
    """The REMOVED-id side of :func:`q_exact_dedup`: every doc whose text
    hash has a smaller doc_id — one (doc_id) row per non-keeper, bounded by
    the dup count (what a cascade stage hands downstream; the survivor set
    is corpus-sized and never materializes). Same md5%64 bucket shuffle as
    the keeper aggregate; per bucket a vectorized sort + run-length pass
    keeps everything but each hash's first (min) doc_id."""
    ds = _docs(sf_dir)

    def to_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        digs = [
            _NULL_HASH if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in texts
        ]
        buckets = [0 if d is _NULL_HASH else int(d[:8], 16) % _PAIR_BUCKETS for d in digs]
        return pa.table(
            {
                "text_hash": pa.array(digs, pa.string()),
                "doc_id": batch.column("doc_id"),
                "__b": pa.array(buckets, I64),
            }
        )

    def per_bucket_losers(group: pa.Table) -> pa.Table:
        t = group.select(["text_hash", "doc_id"]).sort_by(
            [("text_hash", "ascending"), ("doc_id", "ascending")]
        )
        h = t.column("text_hash").to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return pa.table({"doc_id": pa.array([], I64)})
        first = np.concatenate(([True], h[1:] != h[:-1]))
        return t.filter(pa.array(~first)).select(["doc_id"])

    from metareadability_ray.util import with_schema_seed

    return with_schema_seed(
        ds.map_batches(to_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket_losers, batch_format="pyarrow"),
        pa.schema([("doc_id", I64)]),
    )


# ------------------------------------------------------- n-gram Jaccard (exact)
def _shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def ngram_jaccard_pairs(
    sf_dir: str,
    k: int = 3,
    thresh_num: int = 1,
    thresh_den: int = 2,
    df_cut: int | None = None,
    containment: bool = False,
) -> "ray.data.Dataset":
    """EXACT k-gram Jaccard near-dup pairs with jaccard ≥ num/den, via an
    inverted shingle index (no false negatives: any pair with jaccard > 0
    shares ≥1 shingle). Threshold compared in INTEGER math (inter*den ≥
    num*union) so the oracle can't diverge on float rounding.

    Fully distributed — no driver-side state: each posting row carries its
    doc's set_size (+8 bytes/row) so sizes ride THROUGH the pair emission
    and no join is needed afterwards — this removed two whole all-to-all
    attach shuffles of the pair stream (measured: 15.5 s → see commit).

    Shuffle key = shingle (posting lists), then = pair bucket. At 100 TB
    the hot shingles are quadratic; ``df_cut`` drops posting lists longer
    than the cut (logged per group), trading exactness for boundedness —
    the default (None) stays exact, the capped variant converges on
    :func:`minhash_lsh_pairs` as the scale path.
    """
    ds = _docs(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        out_s, out_d, out_z = [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            # null-id docs emit no postings: the SQL twin's doc_a < doc_b
            # pair predicate is unknown on NULL (no pair survives), while
            # the kernel's null id decayed to INT64_MIN downstream and
            # DID pair — dup_clusters then emitted phantom clusters (r5
            # null-doc_id conformance find, the MinHasher contract)
            if doc_id is None:
                continue
            sh = _shingles(re2_tokens(t), k)
            out_s.extend(sh)
            out_d.extend([doc_id] * len(sh))
            out_z.extend([len(sh)] * len(sh))
        return pa.table(
            {
                "shingle": pa.array(out_s, pa.string()),
                "doc_id": pa.array(out_d, I64),
                "set_size": pa.array(out_z, I64),
            }
        )

    def pairs_of_group(group: pa.Table) -> pa.Table:
        # vectorized emission (np.triu_indices), no per-pair Python loop.
        # A/B-measured alternatives that did NOT beat this at sf0.1 and were
        # rejected: packing (a<<32|b) into one int64 key (equal within
        # noise, adds a 2^31-id ceiling), an in-block partial count combiner
        # (pairs repeat across posting-list blocks, not within them),
        # repartition-before-groupby, and polars sort.
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = group.column("set_size").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, sizes = ids[order], sizes[order]
        if df_cut is not None and len(ids) > df_cut:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs df-cut: dropping shingle %r with %d docs (> %d)",
                group.column("shingle")[0].as_py(),
                len(ids),
                df_cut,
            )
            ids = ids[:0]
            sizes = sizes[:0]
        iu, ju = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[iu], I64),
                "doc_b": pa.array(ids[ju], I64),
                "size_a": pa.array(sizes[iu], I64),
                "size_b": pa.array(sizes[ju], I64),
            }
        )

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        # deterministic bucket per PAIR so identical pairs co-locate; the
        # downstream count then runs over _PAIR_BUCKETS groups instead of
        # one group per distinct pair — Ray's sort-based aggregate pays
        # Python-level cost PER GROUP, which at ~1M mostly-unique pairs
        # measured 200+ s of remote wall; this shape does the same count in
        # one vectorized lexsort run-length pass per bucket.
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        bucket = (a * np.int64(1_000_003) + b) % np.int64(_PAIR_BUCKETS)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def count_and_threshold(group: pa.Table) -> pa.Table:
        # one vectorized lexsort run-length pass per bucket: count identical
        # pairs (inter), take the pair's sizes from any member row (they are
        # per-doc constants), and apply the integer-math jaccard cut — no
        # further shuffle after this point.
        a = group.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], I64),
                    "doc_b": pa.array([], I64),
                    "inter": pa.array([], I64),
                    "union_size": pa.array([], I64),
                }
            )
        b = group.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        sa = group.column("size_a").to_numpy(zero_copy_only=False).astype(np.int64)
        sb = group.column("size_b").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b, sa, sb = a[order], b[order], sa[order], sb[order]
        new = np.empty(len(a), dtype=bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        inter = np.diff(np.append(starts, len(a))).astype(np.int64)
        a, b, sa, sb = a[starts], b[starts], sa[starts], sb[starts]
        union = sa + sb - inter
        keep = inter * np.int64(thresh_den) >= union * np.int64(thresh_num)
        return pa.table(
            {
                "doc_a": pa.array(a[keep], I64),
                "doc_b": pa.array(b[keep], I64),
                "inter": pa.array(inter[keep], I64),
                "union_size": pa.array(union[keep], I64),
            }
        )

    def count_and_containment(group: pa.Table) -> pa.Table:
        # containment variant of the SAME run-length pass: Broder's
        # DIRECTIONAL coefficient inter/|sub| — a pair emits up to twice,
        # once per direction that clears the cut (quote/subset detection:
        # a short doc wholly inside a long one has containment 1 but tiny
        # jaccard, which is exactly the case the jaccard cut misses).
        empty = pa.table(
            {
                "doc_sub": pa.array([], I64),
                "doc_sup": pa.array([], I64),
                "inter": pa.array([], I64),
                "sub_size": pa.array([], I64),
            }
        )
        a = group.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return empty
        b = group.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        sa = group.column("size_a").to_numpy(zero_copy_only=False).astype(np.int64)
        sb = group.column("size_b").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b, sa, sb = a[order], b[order], sa[order], sb[order]
        new = np.empty(len(a), dtype=bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        inter = np.diff(np.append(starts, len(a))).astype(np.int64)
        a, b, sa, sb = a[starts], b[starts], sa[starts], sb[starts]
        m1 = inter * np.int64(thresh_den) >= np.int64(thresh_num) * sa
        m2 = inter * np.int64(thresh_den) >= np.int64(thresh_num) * sb
        return pa.table(
            {
                "doc_sub": pa.array(np.concatenate([a[m1], b[m2]]), I64),
                "doc_sup": pa.array(np.concatenate([b[m1], a[m2]]), I64),
                "inter": pa.array(np.concatenate([inter[m1], inter[m2]]), I64),
                "sub_size": pa.array(np.concatenate([sa[m1], sb[m2]]), I64),
            }
        )

    from metareadability_ray.util import with_schema_seed

    final_fn = count_and_containment if containment else count_and_threshold
    final_schema = (
        pa.schema([("doc_sub", I64), ("doc_sup", I64), ("inter", I64), ("sub_size", I64)])
        if containment
        else pa.schema([("doc_a", I64), ("doc_b", I64), ("inter", I64), ("union_size", I64)])
    )
    # schema seed: a corpus with no near-dup pairs legitimately yields zero
    # rows, and Ray's groupby path then carries no schema (hypothesis-found)
    return with_schema_seed(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shingle")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .map_batches(add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(final_fn, batch_format="pyarrow"),
        final_schema,
    )


def q_ngram_jaccard_pairs(sf_dir: str) -> "ray.data.Dataset":
    return ngram_jaccard_pairs(sf_dir, k=3, thresh_num=1, thresh_den=5)


def q_containment_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Broder containment pairs (containment(sub→sup) = inter/|sub| ≥ 0.8):
    the asymmetric twin of :func:`q_ngram_jaccard_pairs`, from the SAME
    inverted-index kernel (shared explode/pair stages, so the shingle and
    pair definitions cannot drift) with a directional final cut — the
    quote-inclusion / subset-document detector jaccard structurally misses
    (a tweet embedded in an article: containment 1, jaccard ≈ 0)."""
    return ngram_jaccard_pairs(sf_dir, k=3, thresh_num=8, thresh_den=10, containment=True)


# ------------------------------------------------------------------ MinHash+LSH
_MERSENNE = (1 << 61) - 1
_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _token_hash_array(tokens: list[str], cache: dict[str, int]) -> np.ndarray:
    """Stable 64-bit token hashes (blake2b), memoised per actor — the token
    vocabulary is tiny relative to the corpus, so the C-hash runs once per
    distinct token instead of once per shingle occurrence."""
    out = np.empty(len(tokens), dtype=np.uint64)
    get = cache.get
    for i, tok in enumerate(tokens):
        h = get(tok)
        if h is None:
            h = struct.unpack(
                "<Q", hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest()
            )[0]
            if len(cache) < 2_000_000:
                cache[tok] = h
        out[i] = h
    return out


def _rot(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r % 64)
    return (x << r) | (x >> (np.uint64(64) - r)) if r else x


def _shingle_hashes(tokens: list[str], k: int, cache: dict[str, int]) -> np.ndarray:
    """Distinct k-gram shingle hashes, fully vectorized: position-rotated
    token hashes xor-combined per window, then np.unique for set semantics.
    Same set size/dup behaviour as _shingles (hash collisions aside)."""
    th = _token_hash_array(tokens, cache)
    n = len(th)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        h = np.uint64(0)
        for j in range(n):
            h ^= _rot(th[j : j + 1], 13 * j)[0]
        return np.asarray([h * _MIX], dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h ^= _rot(th[j : j + m], 13 * j)
    return np.unique(h * _MIX)


def _doc_minhash(
    tokens: list[str],
    a: np.ndarray,
    b: np.ndarray,
    k: int = 3,
    cache: dict[str, int] | None = None,
) -> np.ndarray:
    hv = _shingle_hashes(tokens, k, cache if cache is not None else {})
    if not len(hv):
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    # (a*x + b) on uint64 (wraps mod 2^64 — deterministic mixing), then mod p
    prod = (a[:, None] * (hv[None, :] % _MERSENNE)) % _MERSENNE
    return ((prod + b[:, None]) % _MERSENNE).min(axis=1)


class MinHasher:
    """Actor-pool stage: permutation table + token-hash cache built once per
    actor (MR-A1 style)."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 42):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.k = k
        self.num_perm = num_perm
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null doc_id rows are skipped: a near-dup PAIR is a pair of ids,
        # so an anonymous doc can neither be emitted nor survive dedup
        # (the corpus_diff / bigram_cond_entropy null-id contract; a null
        # id reaching the banding stage crashed the int64 repeat — r5
        # null-doc_id conformance find)
        ids = []
        sigs = []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None:
                continue
            ids.append(did)
            sigs.append(_doc_minhash(re2_tokens(t), self.a, self.b, self.k, self._cache))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array([s.astype(np.int64).tolist() for s in sigs], pa.list_(pa.int64())),
            }
        )


def minhash_lsh_pairs(
    sf_dir: str, num_perm: int = 64, bands: int = 16, k: int = 3
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup candidates: shingle→minhash sig→band buckets→
    groupby(bucket) pair emission → dedup pairs → signature re-join →
    estimated jaccard.

    This is the 100 TB scale path. Shuffle discipline:
      * the bucket shuffle carries ONLY (bucket:int64, doc_id:int64) — 16
        bytes per (doc, band), never the 8 KiB signature (round-1 verdict
        fix: signatures used to be replicated once per band);
      * candidate pairs dedup on (doc_a, doc_b);
      * ``est_jaccard`` is computed in a verify pass that hash-joins the
        signature table back onto the (much smaller) pair stream, twice.
    The signature table is materialized once (doc_id + 64×int64 ≈ 0.5 KiB
    per doc — the standard persisted intermediate of a minhash pipeline; at
    100 TB you'd write it to Parquet and read it in both joins instead)."""
    rows_per_band = num_perm // bands
    ds = _docs(sf_dir)
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        # kernel is ~12k docs/s/core — a small pool amortises actor startup;
        # raise the cap for genuinely large corpora
        concurrency=auto_actor_concurrency(cap=4),
        max_restarts=0,
    ).materialize()  # computed ONCE; read by the bucket pass + both verify joins

    def to_buckets(batch: pa.Table) -> pa.Table:
        """Vectorized banding: signatures → (bands × docs) int64 bucket keys
        via rotate-xor mixing (band index folded in), no per-band hashing."""
        ids = batch.column("doc_id").to_pylist()
        sig_col = batch.column("sig")
        n = len(ids)
        if n == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        S = np.asarray(
            [s for s in sig_col.to_pylist()], dtype=np.uint64
        ).reshape(n, bands, rows_per_band)
        mix = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            mix ^= _rot(S[:, :, j] * _MIX, 13 * j)
        mix ^= np.arange(bands, dtype=np.uint64)[None, :] * _MIX  # fold band idx in
        bucket = mix.astype(np.int64).ravel()  # row-major: doc0 bands, doc1 bands …
        doc_rep = np.repeat(np.asarray(ids, dtype=np.int64), bands)
        return pa.table(
            {"bucket": pa.array(bucket, pa.int64()), "doc_id": pa.array(doc_rep, pa.int64())}
        )

    def add_super_bucket(batch: pa.Table) -> pa.Table:
        # groupby over raw buckets = one Python map_groups call per bucket
        # (≈ docs × bands groups, nearly all singletons). Folding buckets
        # into _PAIR_BUCKETS super-groups keeps identical buckets together
        # while the per-group work becomes one vectorized run-length pass.
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        sb = bk % np.int64(_PAIR_BUCKETS)
        return batch.append_column("sb", pa.array(sb, pa.int64()))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        bk = group.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(bk) == 0:
            return pa.table({"doc_a": pa.array([], I64), "doc_b": pa.array([], I64)})
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        keep = np.empty(len(bk), dtype=bool)  # unique (bucket, doc_id)
        keep[0] = True
        keep[1:] = (bk[1:] != bk[:-1]) | (ids[1:] != ids[:-1])
        bk, ids = bk[keep], ids[keep]
        new = np.empty(len(bk), dtype=bool)
        new[0] = True
        new[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(bk)))
        a_out, b_out = [], []
        for s, m in zip(starts[lens > 1], lens[lens > 1]):  # dup buckets only
            iu, ju = np.triu_indices(int(m), k=1)
            a_out.append(ids[s : s + m][iu])
            b_out.append(ids[s : s + m][ju])
        if not a_out:
            return pa.table({"doc_a": pa.array([], I64), "doc_b": pa.array([], I64)})
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), I64),
                "doc_b": pa.array(np.concatenate(b_out), I64),
            }
        )

    pairs = (
        sigs.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_super_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sb")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        # candidate pairs are a tiny fraction of the corpus: coalesce so the
        # verify joins don't schedule hundreds of near-empty block tasks
        .repartition(4)
    )

    def pack(batch: pa.Table) -> pa.Table:
        """sig:list<int64> → one 512-byte binary value (compact shuffle
        payload for the verify joins)."""
        rows = batch.column("sig").to_pylist()
        packed = [np.asarray(r, dtype=np.int64).tobytes() for r in rows]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "sigb": pa.array(packed, pa.binary())}
        )

    sigsb = sigs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True).repartition(8)
    i64, bint = pa.int64(), pa.binary()
    joined = reduce_side_attach(
        pairs, "doc_a", [("doc_a", i64), ("doc_b", i64), ("n_bands", i64)],
        sigsb, "doc_id", "sigb", "sig_a", bint,
    )
    joined = reduce_side_attach(
        joined, "doc_b", [("doc_a", i64), ("doc_b", i64), ("n_bands", i64), ("sig_a", bint)],
        sigsb, "doc_id", "sigb", "sig_b", bint,
    )

    def est(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            ej = pa.array([], pa.float64())
        else:
            A = np.frombuffer(b"".join(batch.column("sig_a").to_pylist()), dtype=np.int64).reshape(n, num_perm)
            B = np.frombuffer(b"".join(batch.column("sig_b").to_pylist()), dtype=np.int64).reshape(n, num_perm)
            ej = pa.array((A == B).mean(axis=1), pa.float64())
        return pa.table(
            {
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "est_jaccard": ej,
                "n_bands": batch.column("n_bands"),
            }
        )

    from metareadability_ray.util import with_schema_seed

    # a dup-free (or empty/all-null) corpus legitimately yields 0 candidate
    # pairs; seed so the column contract survives (hypothesis-found)
    return with_schema_seed(
        joined.map_batches(est, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("est_jaccard", pa.float64()),
                ("n_bands", pa.int64()),
            ]
        ),
    )


def q_minhash_lsh_pairs(sf_dir: str) -> "ray.data.Dataset":
    return minhash_lsh_pairs(sf_dir)


# ------------------------------------------------------------------ SimHash
class SimHasher:
    """64-bit SimHash over whitespace tokens (stable blake2b token hashes,
    memoised per actor; bit voting fully vectorized via np.unpackbits).
    Values are identical to the naive per-bit formulation: token hash bits in
    little-endian bit order, bit set iff strictly more tokens have it set."""

    def __init__(self):
        self._cache: dict[str, int] = {}
        self._pow2 = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def fingerprint(self, toks: list[str]) -> int:
        """int64-encoded 64-bit SimHash of one token list (0 for no tokens)."""
        if not toks:
            return 0
        th = _token_hash_array(toks, self._cache)
        bits = np.unpackbits(
            th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )  # (n_tokens, 64), column b = bit b of each hash
        acc = 2 * bits.sum(axis=0, dtype=np.int64) - len(toks)
        sh = int(self._pow2[acc > 0].sum())
        return sh - (1 << 64) if sh >= (1 << 63) else sh  # store as int64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = [self.fingerprint(re2_tokens(t)) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(out, pa.int64())}
        )


def q_simhash(sf_dir: str) -> "ray.data.Dataset":
    return _docs(sf_dir).map_batches(
        SimHasher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_actor_concurrency(cap=4),
        max_restarts=0,
    )


# ----------------------------- SimHash Hamming near-dup pairs (Manku 2007)
_SH_BANDS = 4  # 16-bit bands over the 64-bit fingerprint
_SH_MAXH = 3  # pairs with Hamming distance <= 3 (Manku et al., 2007, k=3)
_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


class _SimhashBandExpander:
    """Fingerprint + band expansion in one actor kernel: emits one row per
    (doc, band) carrying the full fingerprint, keyed by
    ``band_id * 2^16 + band_value`` so a single int64 key co-locates every
    candidate sharing that band. Docs with no tokens are skipped (their
    SimHasher value is the 0 sentinel, not a fingerprint). Hash values are
    identical to :class:`SimHasher` (same memoised token-hash kernel)."""

    def __init__(self):
        self._h = SimHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_l: list[int] = []
        sh_l: list[int] = []
        # one tokenize per doc: the token list feeds both the empty check
        # and SimHasher.fingerprint (identical values to q_simhash)
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            toks = re2_tokens(t) if t else []
            if not toks:
                continue
            ids_l.append(did)
            sh_l.append(self._h.fingerprint(toks))
        ids = np.asarray(ids_l, dtype=np.int64)
        sh = np.asarray(sh_l, dtype=np.int64).view(np.uint64)
        n = len(ids)
        out_id = np.repeat(ids, _SH_BANDS)
        out_sh = np.repeat(sh, _SH_BANDS)
        bands = np.tile(np.arange(_SH_BANDS, dtype=np.uint64), n)
        bvals = (out_sh >> (bands * np.uint64(16))) & np.uint64(0xFFFF)
        key = (bands.astype(np.int64) << 16) | bvals.astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, I64),
                "simhash": pa.array(out_sh.view(np.int64), I64),
                "key": pa.array(key, I64),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy 1.x has no
    bitwise_count): byte-LUT over the raw view."""
    return _POPCNT8[x.view(np.uint8)].reshape(*x.shape, 8).sum(axis=-1, dtype=np.int64)


def q_simhash_hamming_pairs(sf_dir: str) -> "ray.data.Dataset":
    """All document pairs whose 64-bit SimHash fingerprints differ in at
    most ``_SH_MAXH`` = 3 bits — the fingerprint-side near-dup detector of
    Manku, Jain & Das Sarma (WWW 2007), completing the repo's SimHash path
    (``simhash`` emits fingerprints; THIS finds the close pairs). Candidate
    generation is the paper's pigeonhole band trick: with 4 disjoint 16-bit
    bands, any pair within Hamming distance 3 agrees exactly on >= 1 band,
    so only docs sharing a (band_id, band_value) key ever meet. Each
    surviving pair is emitted exactly once — at its FIRST matching band —
    so no cross-band distinct pass is needed.

    Scale shape: 4 fixed-width rows (24 B) per doc shuffle once, keyed by
    an int64 that ``bucketed_map_groups`` reduces with one vectorized pass
    per bucket; in-group verify is XOR + byte-LUT popcount in row-chunks
    (memory O(chunk x group)). Group sizes are the docs sharing a 16-bit
    band value; identical-fingerprint clusters (exact duplicates) belong to
    the upstream ``exact_dedup`` pass, same contract as minhash LSH. Docs
    with no tokens are excluded (no fingerprint), matching the other
    near-dup operators' join-through-tokens shape."""
    from metareadability_ray.util import auto_actor_concurrency, with_schema_seed

    out_schema = pa.schema(
        [("doc_a", I64), ("doc_b", I64), ("hamming", I64)]
    )
    expanded = _docs(sf_dir).map_batches(
        _SimhashBandExpander,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=auto_actor_concurrency(cap=4),
        max_restarts=0,
    )

    def per_group(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table({"doc_a": pa.array([], I64), "doc_b": pa.array([], I64), "hamming": pa.array([], I64)})
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sh = group.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        band_id = int(group.column("key")[0].as_py()) >> 16
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        CH = 2048
        for s in range(0, n, CH):
            a_sh = sh[s : s + CH, None]
            x = a_sh ^ sh[None, :]  # (chunk, n) uint64
            ham = _popcount64(x)
            ai, bj = np.nonzero((ham <= _SH_MAXH) & ((s + np.arange(len(a_sh)))[:, None] < np.arange(n)[None, :]))
            if len(ai) == 0:
                continue
            xv = x[ai, bj]
            # first-matching-band dedup: emit here only if every EARLIER
            # band of the xor is nonzero (pair not already found there)
            first = np.ones(len(ai), dtype=bool)
            for k in range(band_id):
                first &= ((xv >> np.uint64(16 * k)) & np.uint64(0xFFFF)) != 0
            if not first.any():
                continue
            out_a.append(ids[s + ai[first]])
            out_b.append(ids[bj[first]])
            out_h.append(ham[ai[first], bj[first]])
        if not out_a:
            return pa.table({"doc_a": pa.array([], I64), "doc_b": pa.array([], I64), "hamming": pa.array([], I64)})
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), I64),
                "doc_b": pa.array(np.concatenate(out_b), I64),
                "hamming": pa.array(np.concatenate(out_h), I64),
            }
        )

    return with_schema_seed(
        bucketed_map_groups(expanded, "key", per_group), out_schema
    )


# ------------------------- incremental (snapshot-delta) exact dedup
def q_incremental_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-increment dedup — the production DAILY shape of exact dedup:
    classify every document of the new snapshot slice (``doc_id % 5 == 0``)
    as ``dup`` (its md5(text) already exists in the base corpus, the
    ``% 5 != 0`` slice) or ``fresh``. This is the operator a running
    curation service executes per crawl drop: the base corpus is never
    re-deduped, only probed.

    Scale shape = q_exact_dedup's md5%64 bucket shuffle, asymmetric: the
    base side ships per-block DISTINCT hashes only (32 B/distinct text per
    block, no doc ids), the increment side ships (hash, doc_id); a bucket
    holds every base hash in its range, so the membership probe is an
    exact vectorized ``np.isin`` with no second pass and no broadcast —
    at 10^12 base docs nothing base-sized ever sits on one node or the
    driver. Null-text increment docs are always ``fresh`` (SQL: md5(NULL)
    IS NULL joins nothing): they ride the SAME shuffle as sentinel rows
    spread by ``doc_id % buckets`` — the sentinel is not a 32-hex md5 so
    no bucket can match it against a base hash, and spreading by id means
    a null-text-heavy increment adds no hot bucket (the r4 ADVICE flagged
    the earlier all-to-bucket-0 routing as an undisclosed skew). Null
    doc_ids belong to neither slice (NULL % 5 compares unknown both
    ways)."""
    ds = _docs(sf_dir)
    _SENTINEL = "__null_text__"  # not a 32-hex md5; base never ships it

    def to_rows(batch: pa.Table) -> pa.Table:
        inc_d: list[int] = []
        inc_h: list[str] = []
        base_h: set[str] = set()
        for did, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if did is None:
                continue
            if did % 5 == 0:
                inc_d.append(did)
                inc_h.append(
                    _SENTINEL if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
                )
            elif t is not None:
                base_h.add(hashlib.md5(t.encode("utf-8")).hexdigest())
        hs = inc_h + sorted(base_h)
        dids = inc_d + [None] * len(base_h)
        buckets = [
            (did % _PAIR_BUCKETS) if h is _SENTINEL else int(h[:8], 16) % _PAIR_BUCKETS
            for h, did in zip(hs, dids)
        ]
        return pa.table(
            {
                "h": pa.array(hs, pa.string()),
                "doc_id": pa.array(dids, I64),
                "__b": pa.array(buckets, I64),
            }
        )

    def probe(group: pa.Table) -> pa.Table:
        dcol = group.column("doc_id")
        is_inc = ~pc.is_null(dcol).to_numpy(zero_copy_only=False)
        hs = group.column("h").to_numpy(zero_copy_only=False).astype(str)
        if not is_inc.any():
            return pa.table(
                {"doc_id": pa.array([], I64), "status": pa.array([], pa.string())}
            )
        hit = np.isin(hs[is_inc], np.unique(hs[~is_inc]))
        return pa.table(
            {
                "doc_id": pa.array(
                    dcol.to_numpy(zero_copy_only=False)[is_inc].astype(np.int64), I64
                ),
                "status": pa.array(np.where(hit, "dup", "fresh").astype(object), pa.string()),
            }
        )

    from metareadability_ray.util import with_schema_seed

    out_schema = pa.schema([("doc_id", I64), ("status", pa.string())])
    return with_schema_seed(
        ds.map_batches(to_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(probe, batch_format="pyarrow"),
        out_schema,
    )
