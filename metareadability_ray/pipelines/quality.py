"""Corpus-hygiene audit operators: charset/mojibake profiling, raw-markup
leakage detection, hashed-feature linear scoring, and cross-stream user
overlap. These are the "is this text actually clean prose?" checks a
web-scale curation run executes between extraction and training export
(SURVEY.md §2.2/§2.5 families; no reference counterpart — scale-out
additions per the §2 "Impl" convention).

Scale discipline (matches webtext.py / curation.py): per-document kernels
are zero-shuffle vectorized Arrow passes; the only streams that shuffle are
per-block-combined partial rows (bounded by group cardinality per block,
never by corpus size). Float policy: every reported ratio is a single
double division of exact int64s printed %.4f on both engines, and the
hashed-feature score sums integer milli-units so partial-sum order can
never move a printed digit.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from metareadability_ray.functions.scalars import re2_tokens
from metareadability_ray.util import with_schema_seed

I64 = pa.int64()
STR = pa.string()

# NULL-source sentinel for groupby partials: Ray Data's hash groupby and
# SQL GROUP BY both treat NULL as its own group, but encoding it explicitly
# in the partial rows keeps the shuffle key non-null (cheap and unambiguous;
# "\x00" cannot appear in a real source name — parquet strings from the
# generator are word-like).
_NULL_KEY = "\x00"


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _empty(cols: dict[str, pa.DataType]) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in cols.items()})


# --------------------------------------------------------------- charset
def q_charset_profile(sf_dir: str) -> "ray.data.Dataset":
    """Per-document charset hygiene profile: codepoint count, non-ASCII
    count, digit count, U+FFFD replacement-character count (the decode-
    failure smoking gun), and the non-ASCII fraction. This is the mojibake
    / binary-junk audit a crawl corpus runs before language ID — a doc full
    of U+FFFD or with an implausible non-ASCII ratio for its claimed lang
    is a decode casualty, not prose.

    Scale shape: pure per-batch Arrow kernel chain (``utf8_length`` +
    ``replace_substring_regex`` + ``count_substring``), zero shuffle, zero
    Python per-row work. Per-doc contract: null-``doc_id`` rows are skipped
    on BOTH engines (no addressable output row for an anonymous doc); null
    text keeps its row with zero counts and NULL pct (the
    every-doc-classifies funnel convention, compression_ratio precedent).
    """
    out_schema = pa.schema(
        [
            ("doc_id", I64),
            ("n_chars", I64),
            ("n_non_ascii", I64),
            ("n_digits", I64),
            ("n_fffd", I64),
            ("non_ascii_pct", STR),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def profile(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column("doc_id")))
        if b.num_rows == 0:
            return _empty({f.name: f.type for f in out_schema})
        text = b.column("text")
        n_chars = pc.fill_null(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
        ascii_only = pc.replace_substring_regex(text, pattern=r"[^\x00-\x7F]", replacement="")
        n_ascii = pc.fill_null(pc.utf8_length(ascii_only), 0).to_numpy(zero_copy_only=False)
        no_digits = pc.replace_substring_regex(text, pattern="[0-9]", replacement="")
        n_nodig = pc.fill_null(pc.utf8_length(no_digits), 0).to_numpy(zero_copy_only=False)
        n_fffd = pc.fill_null(pc.count_substring(text, "�"), 0).to_numpy(
            zero_copy_only=False
        )
        n_non_ascii = (n_chars - n_ascii).astype(np.int64)
        pct = [
            None if c == 0 else "%.4f" % (na / c) for c, na in zip(n_chars, n_non_ascii)
        ]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": pa.array(n_chars.astype(np.int64), I64),
                "n_non_ascii": pa.array(n_non_ascii, I64),
                "n_digits": pa.array((n_chars - n_nodig).astype(np.int64), I64),
                "n_fffd": pa.array(n_fffd.astype(np.int64), I64),
                "non_ascii_pct": pa.array(pct, STR),
            }
        )

    return with_schema_seed(
        ds.map_batches(profile, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# --------------------------------------------------------------- markup
# Tag-like and entity-like residue: extraction output should contain
# NEITHER. Registered as a default; production passes its own bank.
_MARKUP_PAT = "(<[A-Za-z][^>]*>)|(&[a-z]+;)"


def q_markup_leakage(sf_dir: str, pattern: str = _MARKUP_PAT) -> "ray.data.Dataset":
    """Per-source raw-markup leakage audit: how many documents per source
    still contain HTML-ish residue (tags, entities) after extraction — the
    standard "did the boilerplate stripper actually run on this slice?"
    regression check over a curated corpus. A source whose flag rate jumps
    between snapshots has an extraction bug, not new content.

    Scale shape: one vectorized ``count_substring_regex`` pass per block
    collapses to a single (source, n_docs, n_flagged, n_hits) partial row
    per source per block; one source-cardinality groupby sums exact int64s.
    Text never shuffles. NULL source is its own group (SQL GROUP BY
    semantics, carried through the shuffle via an explicit sentinel); NULL
    text counts as an unflagged doc (corpus-level stats keep anonymous
    docs — grouping is by source, not doc_id)."""
    out_schema = pa.schema(
        [
            ("source", STR),
            ("n_docs", I64),
            ("n_flagged", I64),
            ("n_hits", I64),
            ("flag_pct", STR),
        ]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(
                {"__src": STR, "n_docs": I64, "n_flagged": I64, "n_hits": I64}
            )
        srcs = np.asarray(
            [_NULL_KEY if s is None else s for s in batch.column("source").to_pylist()],
            dtype=object,
        )
        hits = (
            pc.fill_null(pc.count_substring_regex(batch.column("text"), pattern), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(srcs, kind="stable")
        ss, hh = srcs[order], hits[order]
        starts = np.flatnonzero(np.concatenate(([True], ss[1:] != ss[:-1])))
        return pa.table(
            {
                "__src": pa.array(ss[starts].astype(object), STR),
                "n_docs": pa.array(np.diff(np.append(starts, len(ss))).astype(np.int64), I64),
                "n_flagged": pa.array(np.add.reduceat(hh > 0, starts).astype(np.int64), I64),
                "n_hits": pa.array(np.add.reduceat(hh, starts), I64),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        src = group.column("__src")[0].as_py()
        nd = int(pc.sum(group.column("n_docs")).as_py())
        nf = int(pc.sum(group.column("n_flagged")).as_py())
        nh = int(pc.sum(group.column("n_hits")).as_py())
        return pa.table(
            {
                "source": pa.array([None if src == _NULL_KEY else src], STR),
                "n_docs": pa.array([nd], I64),
                "n_flagged": pa.array([nf], I64),
                "n_hits": pa.array([nh], I64),
                "flag_pct": pa.array(["%.4f" % (nf / nd)], STR),
            }
        )

    return with_schema_seed(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__src")
        .map_groups(finish, batch_format="pyarrow"),
        out_schema,
    )


# ------------------------------------------------------ hashed linear model
def _token_weights_milli(tokens: np.ndarray) -> np.ndarray:
    """Integer milli-weight per token: first 8 md5 hex digits → uint32 →
    ``% 2001 - 1000`` ∈ [-1000, 1000]. A deterministic hashed-feature
    weight table (the fastText / hashing-trick layout) that needs NO
    broadcast: the "model" is the hash function itself, so every worker
    owns all weights for free. A trained model would ship its weight
    vector once via ``ray.put`` and look up by the same token hash —
    identical plumbing, identical shuffle profile (none)."""
    out = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        out[i] = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % 2001 - 1000
    return out


def q_hash_feature_score(sf_dir: str) -> "ray.data.Dataset":
    """Per-document hashed bag-of-words linear score — the shape of every
    fastText-style quality classifier run over a crawl (CCNet's LM-filter
    stand-in, the DSIR hashed-ngram feature map): tokenize, hash each token
    into a fixed weight table, average. The registered weights are
    hash-derived (deterministic, honestly a stand-in — this sandbox trains
    no model); the kernel, batching, and distribution are exactly what a
    trained hashed-linear model uses.

    Scale shape: zero shuffle — per block, ``np.unique`` collapses the
    token stream to distinct tokens (one md5 each, cached by uniqueness),
    weights map back by inverse index, and per-doc sums are one
    ``np.add.reduceat``. Weights are integer milli-units, so sums are
    exact int64 and the final ``%.4f`` is one double division on both
    engines. Per-doc contract: null-id docs skipped on both engines;
    null/empty-text docs keep their row with n_tokens=0, NULL score."""
    out_schema = pa.schema([("doc_id", I64), ("n_tokens", I64), ("score", STR)])
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column("doc_id")))
        if b.num_rows == 0:
            return _empty({f.name: f.type for f in out_schema})
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out_n = np.zeros(len(ids), dtype=np.int64)
        out_s: list = [None] * len(ids)
        all_toks: list[str] = []
        doc_idx: list[int] = []
        for i, t in enumerate(b.column("text").to_pylist()):
            toks = re2_tokens(t)
            out_n[i] = len(toks)
            all_toks.extend(toks)
            doc_idx.extend([i] * len(toks))
        if all_toks:
            toks_np = np.asarray(all_toks, dtype=object)
            uniq, inv = np.unique(toks_np, return_inverse=True)
            w = _token_weights_milli(uniq)[inv]
            di = np.asarray(doc_idx, dtype=np.int64)
            # doc_idx is nondecreasing by construction → reduceat segments
            starts = np.flatnonzero(np.concatenate(([True], di[1:] != di[:-1])))
            sums = np.add.reduceat(w, starts)
            for s, tot in zip(di[starts], sums):
                out_s[int(s)] = "%.4f" % (int(tot) / (1000.0 * out_n[int(s)]))
        return pa.table(
            {
                "doc_id": pa.array(ids, I64),
                "n_tokens": pa.array(out_n, I64),
                "score": pa.array(out_s, STR),
            }
        )

    return with_schema_seed(
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# ------------------------------------------------------- event-type overlap
_OVL_BUCKETS = 64


def q_event_type_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Pairwise audience overlap between event types: for every pair of
    types, the number of DISTINCT users who did both — the cross-feature
    engagement matrix (the events-stream analogue of ``source_overlap``'s
    contamination matrix). NULL user/type rows drop on both engines (SQL
    join-key semantics).

    Scale shape: per-block combiner collapses each block to its DISTINCT
    (user, type) pairs; only that deduped stream shuffles, bucketed by
    ``user_id % 64`` so each reduce task sees complete user groups
    (in-bucket lexsort + run-length grouping); per-user pair emission is
    O(types-per-user²) with the type universe small by construction; bucket
    partials collapse in one final groupby over ≤ buckets × |types|² rows.
    """
    out_schema = pa.schema([("type_a", STR), ("type_b", STR), ("n_users", I64)])
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(batch.column("user_id")), pc.is_valid(batch.column("event_type"))
        )
        b = batch.filter(keep)
        if b.num_rows == 0:
            return _empty({"user_id": I64, "event_type": STR, "__b": I64})
        pairs = {
            (u, t)
            for u, t in zip(
                b.column("user_id").to_pylist(), b.column("event_type").to_pylist()
            )
        }
        us = np.asarray([p[0] for p in pairs], dtype=np.int64)
        return pa.table(
            {
                "user_id": pa.array(us, I64),
                "event_type": pa.array([p[1] for p in pairs], STR),
                "__b": pa.array(us % _OVL_BUCKETS, I64),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        us = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((ts, us))
        us, ts = us[order], ts[order]
        keep = np.concatenate(([True], (us[1:] != us[:-1]) | (ts[1:] != ts[:-1])))
        us, ts = us[keep], ts[keep]
        starts = np.flatnonzero(np.concatenate(([True], us[1:] != us[:-1])))
        ends = np.append(starts[1:], len(us))
        agg: dict[tuple[str, str], int] = {}
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            tt = ts[s:e]  # sorted, distinct
            for i in range(len(tt)):
                for j in range(i + 1, len(tt)):
                    k = (tt[i], tt[j])
                    agg[k] = agg.get(k, 0) + 1
        if not agg:
            return _empty({"type_a": STR, "type_b": STR, "n_users": I64})
        ks = sorted(agg)
        return pa.table(
            {
                "type_a": pa.array([k[0] for k in ks], STR),
                "type_b": pa.array([k[1] for k in ks], STR),
                "n_users": pa.array([agg[k] for k in ks], I64),
            }
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return with_schema_seed(
        partials.groupby(["type_a", "type_b"]).aggregate(
            Sum("n_users", alias_name="n_users")
        ),
        out_schema,
    )


# ------------------------------------------------------- lexical diversity
def q_type_token_ratio(sf_dir: str) -> "ray.data.Dataset":
    """Per-document type-token ratio (distinct tokens / tokens) — the
    classic lexical-diversity quality signal (low TTR ⇒ templated or
    looping text; the smooth cousin of Gopher's repetition rules and the
    token-level complement of compression_ratio's byte-level view).

    Scale shape: zero shuffle — one ``np.unique`` per doc inside the
    batch kernel; a document's tokens never leave their block. Per-doc
    contract: null-id docs skip on both engines; null/empty text keeps
    its row with 0 counts and NULL ttr (funnel accounting)."""
    out_schema = pa.schema(
        [("doc_id", I64), ("n_tokens", I64), ("n_distinct", I64), ("ttr", STR)]
    )
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def ttr(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column("doc_id")))
        if b.num_rows == 0:
            return _empty({f.name: f.type for f in out_schema})
        nt, ndist, ratio = [], [], []
        for t in b.column("text").to_pylist():
            toks = re2_tokens(t)
            n = len(toks)
            d = len(set(toks))
            nt.append(n)
            ndist.append(d)
            ratio.append(None if n == 0 else "%.4f" % (d / n))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(nt, I64),
                "n_distinct": pa.array(ndist, I64),
                "ttr": pa.array(ratio, STR),
            }
        )

    return with_schema_seed(
        ds.map_batches(ttr, batch_format="pyarrow", zero_copy_batch=True), out_schema
    )


# --------------------------------------------------------- inverted index
_PL_BUCKETS = 64


def q_posting_lists(sf_dir: str, min_df: int = 2, n_sample: int = 3) -> "ray.data.Dataset":
    """Inverted-index construction — the core physical structure of every
    text-retrieval / dedup system (bm25_topk and ngram_jaccard_pairs both
    build one implicitly; this op materializes it as a TABLE): one row per
    token with document frequency ≥ ``min_df``, carrying the df and the
    first ``n_sample`` doc ids of its (sorted) posting list as the
    debuggable sample a search engineer actually greps.

    Scale shape: per-block combiner collapses each block to DISTINCT
    (token, doc_id) pairs before anything moves; that deduped stream
    shuffles ONCE bucketed by token hash, so each reduce task sees
    complete token groups (exact in-bucket string grouping via lexsort —
    token-space buckets are disjoint, the source_overlap contract);
    df < min_df rows are cut in-bucket, before the table ever exists.
    Posting lists themselves are never materialized beyond the sample —
    the full list lives implicitly in the sorted pair stream, which at
    100 TB you would write partitioned by bucket (the shard layout every
    search index uses). Null-id docs skip on both engines."""
    from metareadability_ray.functions.scalars import stable_hash64

    out_schema = pa.schema(
        [("tok", STR), ("df", I64), ("sample_docs", pa.list_(I64))]
    )
    nb = _PL_BUCKETS
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        seen: set[tuple[str, int]] = set()
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None or not t:
                continue
            for tok in set(re2_tokens(t)):
                seen.add((tok, did))
        if not seen:
            return _empty({"tok": STR, "doc_id": I64, "__b": I64})
        toks = np.asarray([p[0] for p in seen], dtype=object)
        h = stable_hash64(toks)
        return pa.table(
            {
                "tok": pa.array(toks, STR),
                "doc_id": pa.array([p[1] for p in seen], I64),
                "__b": pa.array(h % np.int64(nb), I64),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        toks = np.asarray(group.column("tok").to_pylist(), dtype=object)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, toks))
        toks, ids = toks[order], ids[order]
        # cross-block re-dedup of (tok, doc_id)
        keep = np.concatenate(([True], (toks[1:] != toks[:-1]) | (ids[1:] != ids[:-1])))
        toks, ids = toks[keep], ids[keep]
        starts = np.flatnonzero(np.concatenate(([True], toks[1:] != toks[:-1])))
        ends = np.append(starts[1:], len(toks))
        out_t, out_df, out_s = [], [], []
        for s, e in zip(starts, ends):
            if e - s < min_df:
                continue
            out_t.append(toks[s])
            out_df.append(int(e - s))
            out_s.append(ids[s : min(e, s + n_sample)].tolist())
        if not out_t:
            return _empty({"tok": STR, "df": I64, "sample_docs": pa.list_(I64)})
        return pa.table(
            {
                "tok": pa.array(out_t, STR),
                "df": pa.array(out_df, I64),
                "sample_docs": pa.array(out_s, pa.list_(I64)),
            }
        )

    return with_schema_seed(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow"),
        out_schema,
    )


# ------------------------------------------------------------ shingle novelty
def q_ngram_novelty(sf_dir: str) -> "ray.data.Dataset":
    """Per-document shingle novelty: the fraction of a doc's DISTINCT
    3-gram shingles whose FIRST corpus occurrence (min doc_id — the stable
    tie-proof ownership rule) is this document. The incremental-information
    curve of a crawl in doc order (Lee et al. 2022's novelty measurement):
    near-1 docs bring new text, near-0 docs restate the corpus — the
    smooth, leak-proof complement of the pairwise dup cut, sharing its
    exact shingle definition (textops._shingles) so the two views cannot
    drift.

    Scale shape: per-block kernel emits each doc's DISTINCT (shingle,
    doc_id) pairs PLUS one local (doc_id, n_shingles) total row (a doc
    lives in one block, so totals never need a merge); only the deduped
    vocabulary stream shuffles, bucketed by shingle hash — per bucket, one
    lexsort finds each shingle's min-doc owner and counts owned shingles
    per doc (each shingle credits exactly one doc); novel partials and
    totals union into a doc-cardinality groupby. Null-id docs skip both
    engines (ownership needs an id); empty docs keep their row with 0/0
    and NULL novelty."""
    from metareadability_ray.functions.scalars import stable_hash64
    from metareadability_ray.pipelines.textops import _shingles

    out_schema = pa.schema(
        [("doc_id", I64), ("n_shingles", I64), ("n_novel", I64), ("novelty", STR)]
    )
    nb = _PL_BUCKETS
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def vocab_pairs(batch: pa.Table) -> pa.Table:
        sh_s: list[str] = []
        sh_d: list[int] = []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None:
                continue
            for s in _shingles(re2_tokens(t), 3):
                sh_s.append(s)
                sh_d.append(did)
        if not sh_s:
            return _empty({"shingle": STR, "doc_id": I64, "__b": I64})
        arr = np.asarray(sh_s, dtype=object)
        return pa.table(
            {
                "shingle": pa.array(arr, STR),
                "doc_id": pa.array(sh_d, I64),
                "__b": pa.array(stable_hash64(arr) % np.int64(nb), I64),
            }
        )

    def totals(batch: pa.Table) -> pa.Table:
        ids, ns = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None:
                continue
            ids.append(did)
            ns.append(len(_shingles(re2_tokens(t), 3)))
        return pa.table(
            {
                "doc_id": pa.array(ids, I64),
                "n_shingles": pa.array(ns, I64),
                "n_novel": pa.array([0] * len(ids), I64),
            }
        )

    def owners_per_bucket(group: pa.Table) -> pa.Table:
        sh = np.asarray(group.column("shingle").to_pylist(), dtype=object)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, sh))
        sh, ids = sh[order], ids[order]
        starts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
        owners = ids[starts]  # min doc_id per shingle (sorted within group)
        own_sorted = np.sort(owners)
        s2 = np.flatnonzero(np.concatenate(([True], own_sorted[1:] != own_sorted[:-1])))
        return pa.table(
            {
                "doc_id": pa.array(own_sorted[s2], I64),
                "n_shingles": pa.array([0] * len(s2), I64),
                "n_novel": pa.array(
                    np.diff(np.append(s2, len(own_sorted))).astype(np.int64), I64
                ),
            }
        )

    novel = (
        ds.map_batches(vocab_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(owners_per_bucket, batch_format="pyarrow")
    )
    both = ds.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True).union(novel)

    def finish(group: pa.Table) -> pa.Table:
        did = group.column("doc_id")[0].as_py()
        ns = int(pc.sum(group.column("n_shingles")).as_py() or 0)
        nv = int(pc.sum(group.column("n_novel")).as_py() or 0)
        return pa.table(
            {
                "doc_id": pa.array([did], I64),
                "n_shingles": pa.array([ns], I64),
                "n_novel": pa.array([nv], I64),
                "novelty": pa.array([None if ns == 0 else "%.4f" % (nv / ns)], STR),
            }
        )

    return with_schema_seed(
        both.groupby("doc_id").map_groups(finish, batch_format="pyarrow"), out_schema
    )


# ------------------------------------------------------------- vocab growth
def q_vocab_growth(sf_dir: str, n_buckets: int = 10) -> pa.Table:
    """Vocabulary-growth (Heaps-law) curve: new distinct tokens and
    cumulative vocabulary per doc-id decile — the tokenizer-budget /
    corpus-saturation audit (a flattening curve says more crawl adds no
    new vocabulary; a linear one says the tokenizer's OOV long tail is
    still growing). Buckets are equal-WIDTH id ranges in exact integer
    math (``(id-min)*K // (max-min+1)``, identical on both engines — no
    global rank sort, which is what ntile would cost at 10^12 docs).

    Scale shape: min/max ids fold from per-block partials; each token's
    first-occurrence owner computes in the same token-hash-bucketed
    shuffle the posting-list build uses (per-block (token, local-min-id)
    combiner rows only — one row per distinct token per block); per bucket
    the owners collapse to ``n_buckets`` counter rows and the driver folds
    K integers plus one cumulative sum. Null-id docs skip on both engines
    (ownership needs an id)."""
    from metareadability_ray.functions.scalars import stable_hash64

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    # pass 0: id range (two ints) from per-block partials
    def mm_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        ids = batch.filter(pc.is_valid(ids)).column("doc_id")
        if len(ids) == 0:
            return _empty({"mn": I64, "mx": I64})
        return pa.table(
            {
                "mn": pa.array([pc.min(ids).as_py()], I64),
                "mx": pa.array([pc.max(ids).as_py()], I64),
            }
        )

    mn = mx = None
    for t in ds.map_batches(
        mm_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if t.num_rows:
            bmn = pc.min(t.column("mn")).as_py()
            bmx = pc.max(t.column("mx")).as_py()
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
    if mn is None:  # no addressable docs at all
        return pa.table(
            {
                "bucket": pa.array([], I64),
                "n_new_tokens": pa.array([], I64),
                "cum_vocab": pa.array([], I64),
            }
        )
    span = mx - mn + 1

    def tok_partial(batch: pa.Table) -> pa.Table:
        local_min: dict[str, int] = {}
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if did is None or not t:
                continue
            for tok in re2_tokens(t):
                prev = local_min.get(tok)
                if prev is None or did < prev:
                    local_min[tok] = did
        if not local_min:
            return _empty({"tok": STR, "owner": I64, "__b": I64})
        toks = np.asarray(list(local_min.keys()), dtype=object)
        return pa.table(
            {
                "tok": pa.array(toks, STR),
                "owner": pa.array(list(local_min.values()), I64),
                "__b": pa.array(stable_hash64(toks) % np.int64(_PL_BUCKETS), I64),
            }
        )

    def bucket_counts(group: pa.Table) -> pa.Table:
        toks = np.asarray(group.column("tok").to_pylist(), dtype=object)
        owners = group.column("owner").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((owners, toks))
        toks, owners = toks[order], owners[order]
        starts = np.flatnonzero(np.concatenate(([True], toks[1:] != toks[:-1])))
        own = owners[starts]  # global min owner per token (sorted run head)
        dec = np.minimum(n_buckets - 1, (own - mn) * n_buckets // span)
        cnt = np.bincount(dec, minlength=n_buckets)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets, dtype=np.int64), I64),
                "n_new": pa.array(cnt.astype(np.int64), I64),
            }
        )

    counts = np.zeros(n_buckets, dtype=np.int64)
    parts = (
        ds.map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_counts, batch_format="pyarrow")
    )
    for t in parts.iter_batches(batch_format="pyarrow"):
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        n = t.column("n_new").to_numpy(zero_copy_only=False)
        np.add.at(counts, b, n)
    # SQL twin emits only buckets that CONTAIN docs (DISTINCT bucket over
    # the doc table) — an id range with no docs has no row. Distinct
    # buckets fold DISTRIBUTED: one ≤n_buckets-row partial per block, the
    # driver merges tiny sets (never a doc-id column).
    def block_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.filter(pc.is_valid(batch.column("doc_id"))).column("doc_id")
        if len(ids) == 0:
            return _empty({"bucket": I64})
        arr = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        dec = np.unique(np.minimum(n_buckets - 1, (arr - mn) * n_buckets // span))
        return pa.table({"bucket": pa.array(dec, I64)})

    doc_bucket_set: set[int] = set()
    for t in ds.map_batches(
        block_buckets, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        doc_bucket_set.update(int(x) for x in t.column("bucket").to_pylist())
    doc_buckets = sorted(doc_bucket_set)
    cum = 0
    rows_b, rows_n, rows_c = [], [], []
    for b in doc_buckets:
        cum += int(counts[b])
        rows_b.append(b)
        rows_n.append(int(counts[b]))
        rows_c.append(cum)
    return pa.table(
        {
            "bucket": pa.array(rows_b, I64),
            "n_new_tokens": pa.array(rows_n, I64),
            "cum_vocab": pa.array(rows_c, I64),
        }
    )


# ------------------------------------------------------------ mix diversity
def q_mix_diversity(sf_dir: str) -> pa.Table:
    """One-row source-concentration audit of the corpus mix: source count,
    Shannon entropy (bits), effective source count (2^H — "how many equal
    sources is this mix worth"), and the Gini coefficient of the share
    distribution. The number a data-mixing review opens with: a 0.9-Gini
    corpus is one crawl wearing twenty source labels.

    Scale shape: per-block (source, n) combiner rows → one
    source-cardinality groupby → the driver folds |sources| counters and
    computes four scalars. Gini uses the sorted-by-(n, source) rank form
    with a FIXED deterministic order on both engines; entropy terms sum
    over ≤ |sources| values with %.4f absorbing ulps (the token_entropy
    contract). NULL-source docs are excluded (share of WHAT source?)."""
    import math

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source"])

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column("source")))
        if b.num_rows == 0:
            return _empty({"source": STR, "n": I64})
        srcs = np.asarray(b.column("source").to_pylist(), dtype=object)
        order = np.argsort(srcs, kind="stable")
        ss = srcs[order]
        starts = np.flatnonzero(np.concatenate(([True], ss[1:] != ss[:-1])))
        return pa.table(
            {
                "source": pa.array(ss[starts].astype(object), STR),
                "n": pa.array(np.diff(np.append(starts, len(ss))).astype(np.int64), I64),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
    )
    counts: list[tuple[str, int]] = []
    for t in agg.iter_batches(batch_format="pyarrow"):
        counts.extend(zip(t.column("source").to_pylist(), t.column("n").to_pylist()))
    if not counts:
        return pa.table(
            {
                "n_sources": pa.array([0], I64),
                "entropy_bits": pa.array([None], STR),
                "effective_sources": pa.array([None], STR),
                "gini": pa.array([None], STR),
            }
        )
    counts.sort(key=lambda p: (p[1], p[0]))  # the twin's ORDER BY (n, source)
    k = len(counts)
    tot = sum(n for _, n in counts)
    # + 0.0 normalizes IEEE negative zero (a one-source corpus yields -0.0
    # entropy; the twin applies the same normalization)
    ent = -sum((n / tot) * math.log2(n / tot) for _, n in counts) + 0.0
    gini = (
        sum((2 * (i + 1) - k - 1) * n for i, (_, n) in enumerate(counts)) / (k * tot)
        + 0.0
    )
    return pa.table(
        {
            "n_sources": pa.array([k], I64),
            "entropy_bits": pa.array(["%.4f" % ent], STR),
            "effective_sources": pa.array(["%.4f" % (2.0**ent)], STR),
            "gini": pa.array(["%.4f" % gini], STR),
        }
    )


# ---------------------------------------------------------------- KS drift
def q_length_ks_drift(sf_dir: str) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov statistic between the doc-length
    distributions of the corpus's two LARGEST sources (deterministic
    count-desc, name-asc pick) — the distribution-drift alarm of a
    multi-source mix ("source B's length profile no longer looks like
    source A's" — template change, truncation bug, or scraper drift).
    One row: source_a, source_b, n_a, n_b, ks (max CDF gap, %.4f), or a
    NULL row when fewer than two sources exist.

    Scale shape: per-block (source, length, count) combiner rows → one
    (source, length)-keyed groupby (cardinality = sources × distinct
    lengths, never docs) → the driver folds two histograms (bounded by
    distinct lengths), sorts once, and takes the max gap of two exact
    rational CDFs. NULL-source docs are excluded; NULL lengths count at
    position 0 on both engines (coalesce — n_chars is never null in the
    schema but adversarial tables may differ)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column("source")))
        if b.num_rows == 0:
            return _empty({"source": STR, "len": I64, "n": I64})
        srcs = np.asarray(b.column("source").to_pylist(), dtype=object)
        lens = (
            pc.fill_null(b.column("n_chars"), 0).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.lexsort((lens, srcs))
        ss, ll = srcs[order], lens[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (ss[1:] != ss[:-1]) | (ll[1:] != ll[:-1])))
        )
        return pa.table(
            {
                "source": pa.array(ss[starts].astype(object), STR),
                "len": pa.array(ll[starts], I64),
                "n": pa.array(np.diff(np.append(starts, len(ss))).astype(np.int64), I64),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "len"])
        .aggregate(Sum("n", alias_name="n"))
    )
    hists: dict[str, dict[int, int]] = {}
    for t in agg.iter_batches(batch_format="pyarrow"):
        for s, l, n in zip(
            t.column("source").to_pylist(), t.column("len").to_pylist(), t.column("n").to_pylist()
        ):
            hists.setdefault(s, {})[int(l)] = hists.setdefault(s, {}).get(int(l), 0) + int(n)
    out_null = pa.table(
        {
            "source_a": pa.array([None], STR),
            "source_b": pa.array([None], STR),
            "n_a": pa.array([None], I64),
            "n_b": pa.array([None], I64),
            "ks": pa.array([None], STR),
        }
    )
    if len(hists) < 2:
        return out_null
    totals = sorted(
        ((sum(h.values()), s) for s, h in hists.items()), key=lambda p: (-p[0], p[1])
    )
    (na, sa), (nb, sb) = totals[0], totals[1]
    ha, hb = hists[sa], hists[sb]
    vals = sorted(set(ha) | set(hb))
    ca = cb = 0
    ks = 0.0
    for v in vals:
        ca += ha.get(v, 0)
        cb += hb.get(v, 0)
        gap = abs(ca / na - cb / nb)
        if gap > ks:
            ks = gap
    return pa.table(
        {
            "source_a": pa.array([sa], STR),
            "source_b": pa.array([sb], STR),
            "n_a": pa.array([na], I64),
            "n_b": pa.array([nb], I64),
            "ks": pa.array(["%.4f" % ks], STR),
        }
    )


# --------------------------------------------------------- dup provenance
def q_dup_rate_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-source exact-duplicate exposure: how many of each source's docs
    share their EXACT text with ≥1 other doc anywhere in the corpus — the
    provenance slice of exact dedup ("which feed is mirroring content").
    A doc counts as dup-exposed wherever its copies live, so two sources
    mirroring each other both show the exposure (the actionable view; the
    keeper/loser split is a separate policy choice downstream).

    Scale shape: per-block (text-hash64, source) rows shuffle once bucketed
    by hash — all copies of a text land in one bucket, so group sizes are
    exact in-bucket (the 64-bit content hash partitions distinct texts
    exactly as the twin's md5 does — both sides group by an injective-in-
    practice content key, and only group SIZES cross engines); each bucket collapses to (source, n_docs, n_dup)
    partials and a source-cardinality groupby sums them. Null-text docs
    are excluded on both engines (md5(NULL) joins nothing); NULL source
    is its own group via the sentinel."""
    from metareadability_ray.functions.scalars import stable_hash64

    out_schema = pa.schema(
        [("source", STR), ("n_docs", I64), ("n_dup_docs", I64), ("dup_pct", STR)]
    )
    nb = _PL_BUCKETS
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def rows(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column("text")))
        if b.num_rows == 0:
            return _empty({"h": I64, "__src": STR, "__b": I64})
        texts = np.asarray(b.column("text").to_pylist(), dtype=object)
        h = stable_hash64(texts)
        srcs = np.asarray(
            [_NULL_KEY if s is None else s for s in b.column("source").to_pylist()],
            dtype=object,
        )
        return pa.table(
            {
                "h": pa.array(h, I64),
                "__src": pa.array(srcs, STR),
                "__b": pa.array(h % np.int64(nb), I64),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = np.asarray(group.column("__src").to_pylist(), dtype=object)
        order = np.lexsort((srcs, h))
        h, srcs = h[order], srcs[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        sizes = np.diff(np.append(starts, len(h)))
        is_dup = np.repeat(sizes > 1, sizes)
        sorder = np.argsort(srcs, kind="stable")
        ss, dd = srcs[sorder], is_dup[sorder]
        s2 = np.flatnonzero(np.concatenate(([True], ss[1:] != ss[:-1])))
        return pa.table(
            {
                "__src": pa.array(ss[s2].astype(object), STR),
                "n_docs": pa.array(np.diff(np.append(s2, len(ss))).astype(np.int64), I64),
                "n_dup_docs": pa.array(np.add.reduceat(dd, s2).astype(np.int64), I64),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        src = group.column("__src")[0].as_py()
        nd = int(pc.sum(group.column("n_docs")).as_py())
        du = int(pc.sum(group.column("n_dup_docs")).as_py())
        return pa.table(
            {
                "source": pa.array([None if src == _NULL_KEY else src], STR),
                "n_docs": pa.array([nd], I64),
                "n_dup_docs": pa.array([du], I64),
                "dup_pct": pa.array(["%.4f" % (du / nd)], STR),
            }
        )

    return with_schema_seed(
        ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("__src")
        .map_groups(finish, batch_format="pyarrow"),
        out_schema,
    )
