"""C8 distance library vs brute-force references (the reference's own
LCSTest / SparseCosineTest pattern — simil_func tests)."""

from __future__ import annotations

import numpy as np
import pytest

from flexneuart_spark.functions.distances import (
    cosine,
    euclidean,
    js_divergence,
    lcs,
    norm_scalar,
    scalar,
    sparse_norm_scalar,
    sparse_scalar,
)


def _lcs_naive(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0 or j == 0:
            return 0
        if a[i - 1] == b[j - 1]:
            return rec(i - 1, j - 1) + 1
        return max(rec(i - 1, j), rec(i, j - 1))

    return rec(len(a), len(b))


def test_lcs_golden():
    assert lcs(list("abcd"), list("bd")) == 2
    assert lcs(list("abcbdab"), list("bdcaba")) == 4
    assert lcs([], list("abc")) == 0
    assert lcs([1, 2, 3, 4], [2, 4, 5]) == 2
    assert lcs(["def", "foo", "bar"], ["foo", "def", "bar"]) == 2


def test_lcs_randomized_vs_naive():
    rng = np.random.default_rng(3)
    for _ in range(25):
        a = rng.integers(0, 5, rng.integers(0, 12)).tolist()
        b = rng.integers(0, 5, rng.integers(0, 12)).tolist()
        assert lcs(a, b) == _lcs_naive(tuple(a), tuple(b)), (a, b)


def test_dense_distances():
    a = [1.0, 2.0, 2.0]
    b = [2.0, 0.0, 1.0]
    assert euclidean(a, b) == pytest.approx(np.sqrt(1 + 4 + 1))
    assert scalar(a, b) == pytest.approx(4.0)
    assert cosine(a, b) == pytest.approx(4.0 / (3.0 * np.sqrt(5.0)))
    assert norm_scalar(a, b) == pytest.approx(cosine(a, b))
    assert cosine([0.0, 0.0], [1.0, 1.0]) == 0.0


def test_sparse_scalar_matches_dense():
    ids1, vals1 = [1, 3, 7], [0.5, 1.5, 2.0]
    ids2, vals2 = [2, 3, 7, 9], [4.0, 2.0, 0.5, 1.0]
    assert sparse_scalar(ids1, vals1, ids2, vals2) == pytest.approx(1.5 * 2.0 + 2.0 * 0.5)
    assert sparse_scalar([], [], ids2, vals2) == 0.0
    want = (1.5 * 2.0 + 2.0 * 0.5) / (np.linalg.norm(vals1) * np.linalg.norm(vals2))
    assert sparse_norm_scalar(ids1, vals1, ids2, vals2) == pytest.approx(want)


def test_js_divergence():
    # identical distributions → 0
    assert js_divergence([1, 2], [0.5, 0.5], [1, 2], [0.5, 0.5]) == pytest.approx(0.0)
    # disjoint supports → each side contributes sum(v)·ln2 ⇒ total 2·ln2·0.5·2
    got = js_divergence([1], [1.0], [2], [1.0])
    assert got == pytest.approx(2.0 * np.log(2.0))
    # brute force check on overlapping support
    ids1, v1 = [1, 2, 3], [0.2, 0.3, 0.5]
    ids2, v2 = [2, 3, 4], [0.1, 0.6, 0.3]
    d1 = {i: v for i, v in zip(ids1, v1)}
    d2 = {i: v for i, v in zip(ids2, v2)}
    want = 0.0
    for i in sorted(set(d1) | set(d2)):
        a, b = d1.get(i, 0.0), d2.get(i, 0.0)
        m = 0.5 * (a + b)
        if a > 0:
            want += a * np.log(a / m)
        if b > 0:
            want += b * np.log(b / m)
    assert js_divergence(ids1, v1, ids2, v2) == pytest.approx(want)
    with pytest.raises(ValueError):
        js_divergence([1], [1.5], [1], [0.5])
