"""KMV bottom-k sketch properties that need no Spark session: the
hash is the portable md5-prefix (dedup._tok_hash twin), so the sketch
can be simulated exactly in Python — mergeability (union of bottom-k
sets re-truncated == bottom-k of the union) is THE property that
makes the Spark partial aggregation correct."""

from __future__ import annotations

import hashlib


def _h(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:14], 16) % 2147483647


def _bottom_k(values, k):
    return sorted({_h(v) for v in values})[:k]


def test_merge_equals_global():
    a = [f"left-{i}" for i in range(5000)]
    b = [f"right-{i}" for i in range(3000)]
    k = 64
    merged = sorted(set(_bottom_k(a, k)) | set(_bottom_k(b, k)))[:k]
    assert merged == _bottom_k(a + b, k)


def test_estimate_formula_matches_operator():
    """The closed form (k-1)/((hk+1)/P) on the bottom-k of a known
    multiset — duplicates must not perturb the sketch."""
    k = 64
    vals = [f"v{i}" for i in range(10000)] * 3  # heavy duplication
    mins = _bottom_k(vals, k)
    est = (k - 1) / ((mins[-1] + 1) / 2147483647)
    assert abs(est - 10000) / 10000 < 3.0 / (k - 2) ** 0.5
    # below-k group is lossless
    assert len(_bottom_k([f"x{i}" for i in range(7)] * 5, k)) == 7
