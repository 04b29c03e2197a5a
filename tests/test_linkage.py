"""Unit tests for the linkage module: the vectorized Levenshtein kernel vs a
pure-Python reference, the FastSS deletion-blocking recall theorem on random
strings, and fuzzy_pairs (k=2) vs brute force through the full Ray plan."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from metareadability_ray.pipelines.linkage import (
    deletion_variants,
    fuzzy_pairs,
    levenshtein_batch,
)


def lev_ref(a: str, b: str) -> int:
    """Textbook O(len^2) single-pair DP (the oracle for the vectorized kernel)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


_STR = st.text(alphabet="abcXYZ01 é ", max_size=9)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_STR, _STR), min_size=0, max_size=20))
def test_levenshtein_batch_matches_reference(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_batch(a, b)
    want = np.array([lev_ref(x, y) for x, y in pairs], dtype=np.int64)
    assert got.tolist() == want.tolist()


def test_levenshtein_batch_edges():
    assert levenshtein_batch([], []).tolist() == []
    assert levenshtein_batch(["", ""], ["", "abc"]).tolist() == [0, 3]
    assert levenshtein_batch(["abc"], [""]).tolist() == [3]
    assert levenshtein_batch(["kitten"], ["sitting"]).tolist() == [3]


@settings(max_examples=120, deadline=None)
@given(_STR, _STR)
def test_fastss_blocking_is_recall_complete(a, b):
    # Bocek et al. 2007: lev(a,b) <= k  =>  D_k(a) ∩ D_k(b) != ∅.
    d = lev_ref(a, b)
    for k in (1, 2):
        if d <= k:
            assert deletion_variants(a, k) & deletion_variants(b, k), (a, b, k)


def test_deletion_variants_counts():
    vs = deletion_variants("abc", 1)
    assert vs == {"abc", "bc", "ac", "ab"}
    assert "a" in deletion_variants("abc", 2) and "abc" in deletion_variants("abc", 2)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_k2_matches_bruteforce():
    import ray

    names = [
        "alpha", "alPha", "alphaX", "alhpa", "beta", "betas", "bet",
        "gamma", "gamm", "gama", "delta", "DELTA", "", "a", "ab",
    ]
    t = pa.table(
        {"k": pa.array(range(len(names)), pa.int64()), "nm": pa.array(names)}
    )
    ds = ray.data.from_arrow(t)
    got = pa.concat_tables(
        ray.get(fuzzy_pairs(ds, "k", "nm", k=2).to_arrow_refs()),
        promote_options="permissive",
    )
    got_rows = sorted(map(tuple, zip(*[got.column(c).to_pylist() for c in ["key_a", "key_b", "dist"]])))
    want = sorted(
        (i, j, lev_ref(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev_ref(names[i], names[j]) <= 2
    )
    assert got_rows == want
