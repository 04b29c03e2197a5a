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
from ray.data.aggregate import Count, Max, Mean, Min, Sum
from metareadability_ray.util import auto_actor_concurrency

_TOKEN_RE = r"\S+"
_ROUND = {"round_mode": "half_towards_infinity"}


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _docs(sf_dir: str, columns=("doc_id", "text")) -> "ray.data.Dataset":
    return ray.data.read_parquet(_p(sf_dir, "documents"), columns=list(columns))


# ------------------------------------------------------------------ token/quality
def q_token_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-lang token counting (whitespace tokens), fully vectorized."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "text", "n_chars"])

    def add_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(batch.column("text"), _TOKEN_RE)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_tokens": pc.cast(toks, pa.int64()),
                "n_chars": batch.column("n_chars"),
            }
        )

    return (
        ds.map_batches(add_tokens, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
            Sum("n_chars", alias_name="sum_chars"),
        )
    )


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
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tokens,
                "n_alpha": n_alpha,
                "n_stopwords": n_stop,
                "quality_ok": pc.cast(ok, pa.int32()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


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
        scores = np.stack(
            [
                pc.cast(pc.count_substring_regex(text, rx), pa.int64()).to_numpy(zero_copy_only=False)
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


# ------------------------------------------------------------------ exact dedup
# sentinel for null text through the groupby shuffle: Ray's sort-based
# groupby cannot order null keys, and md5 hex is always 32 chars of
# [0-9a-f], so this cannot collide with a real hash.
_NULL_HASH = "\x00null"


def q_exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact text dedup: hash-partition on md5(text), keep min doc_id per
    group. Only (hash, doc_id) pairs shuffle — the text never moves.
    Null text groups as SQL NULL (md5(NULL) IS NULL, one group)."""
    ds = _docs(sf_dir)

    def to_hash(batch: pa.Table) -> pa.Table:
        digs = [
            _NULL_HASH if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"text_hash": pa.array(digs, pa.string()), "doc_id": batch.column("doc_id")}
        )

    agg = (
        ds.map_batches(to_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
    )

    def restore_null(batch: pa.Table) -> pa.Table:
        col = batch.column("text_hash")
        fixed = pc.if_else(pc.equal(col, _NULL_HASH), pa.scalar(None, pa.string()), col)
        return batch.set_column(batch.column_names.index("text_hash"), "text_hash", fixed)

    return agg.map_batches(restore_null, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- n-gram Jaccard (exact)
def _shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def ngram_jaccard_pairs(
    sf_dir: str, k: int = 3, thresh_num: int = 1, thresh_den: int = 2
) -> "ray.data.Dataset":
    """EXACT k-gram Jaccard near-dup pairs with jaccard ≥ num/den, via an
    inverted shingle index (no false negatives: any pair with jaccard > 0
    shares ≥1 shingle). Threshold compared in INTEGER math (inter*den ≥
    num*union) so the oracle can't diverge on float rounding.

    Shuffle key = shingle (posting lists), then = pair. At 100 TB this is
    exact-but-quadratic on hot shingles — cap with a df-cut or switch to
    :func:`minhash_lsh_pairs`; documented trade-off.
    """
    ds = _docs(sf_dir)

    # broadcast doc → |shingle set| (small: one int per doc)
    def sizes_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sizes = [
            len(_shingles((t or "").split(), k)) for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "set_size": pa.array(sizes, pa.int64())}
        )

    size_rows = (
        ds.map_batches(sizes_batch, batch_format="pyarrow", zero_copy_batch=True).take_all()
    )  # one small int row per doc — bounded driver state
    sizes_ref = ray.put({r["doc_id"]: r["set_size"] for r in size_rows})

    def explode(batch: pa.Table) -> pa.Table:
        out_s, out_d = [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for s in _shingles((t or "").split(), k):
                out_s.append(s)
                out_d.append(doc_id)
        return pa.table(
            {"shingle": pa.array(out_s, pa.string()), "doc_id": pa.array(out_d, pa.int64())}
        )

    def pairs_of_group(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a_out, pa.int64()), "doc_b": pa.array(b_out, pa.int64())}
        )

    pair_counts = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shingle")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def threshold(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref) if isinstance(sizes_ref, ray.ObjectRef) else sizes_ref
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        inter = batch.column("inter").to_pylist()
        keep, unions = [], []
        for x, y, iv in zip(a, b, inter):
            u = sz[x] + sz[y] - iv
            unions.append(u)
            keep.append(iv * thresh_den >= thresh_num * u)
        out = batch.append_column("union_size", pa.array(unions, pa.int64()))
        return out.filter(pa.array(keep, pa.bool_()))

    return pair_counts.map_batches(threshold, batch_format="pyarrow", zero_copy_batch=True)


def q_ngram_jaccard_pairs(sf_dir: str) -> "ray.data.Dataset":
    return ngram_jaccard_pairs(sf_dir, k=3, thresh_num=1, thresh_den=5)


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
        ids = batch.column("doc_id").to_pylist()
        sigs = [
            _doc_minhash((t or "").split(), self.a, self.b, self.k, self._cache)
            for t in batch.column("text").to_pylist()
        ]
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
    groupby(bucket) pair emission → dedup pairs + estimated jaccard.

    This is the 100 TB scale path: shuffle key is the (band, bucket-hash)
    pair; no posting list ever exceeds a bucket's membership."""
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
    )

    def to_buckets(batch: pa.Table) -> pa.Table:
        """Vectorized banding: signatures → (bands × docs) int64 bucket keys
        via rotate-xor mixing (band index folded in), no per-band hashing."""
        ids = batch.column("doc_id").to_pylist()
        sig_col = batch.column("sig")
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.list_(pa.int64())),
                }
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
        sig_list = sig_col.to_pylist()
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "doc_id": pa.array(doc_rep, pa.int64()),
                "sig": pa.array([sig_list[i] for i in range(n) for _ in range(bands)], pa.list_(pa.int64())),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("doc_id").to_pylist(), group.column("sig").to_pylist())
        )
        a_out, b_out, est = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                a_out.append(rows[i][0])
                b_out.append(rows[j][0])
                sa, sb = np.asarray(rows[i][1]), np.asarray(rows[j][1])
                est.append(float((sa == sb).mean()))
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )

    return (
        sigs.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"), Count(alias_name="n_bands"))
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = []
        for t in batch.column("text").to_pylist():
            toks = (t or "").split()
            if not toks:
                out.append(0)
                continue
            th = _token_hash_array(toks, self._cache)
            bits = np.unpackbits(
                th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )  # (n_tokens, 64), column b = bit b of each hash
            acc = 2 * bits.sum(axis=0, dtype=np.int64) - len(toks)
            sh = int(self._pow2[acc > 0].sum())
            out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)  # store as int64
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(out, pa.int64())}
        )


def q_simhash(sf_dir: str) -> "ray.data.Dataset":
    return _docs(sf_dir).map_batches(
        SimHasher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_actor_concurrency(cap=4),
        max_restarts=0,
    )
