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


def test_dist_matrix_cosine_and_nulls():
    from flexneuart_spark.functions.distances import dist_matrix

    v1 = [[1.0, 0.0], None]
    v2 = [[1.0, 0.0], [0.0, 1.0]]
    d = dist_matrix(v1, v2, metric="cosine")
    assert d[0][0] == pytest.approx(0.0) and d[0][1] == pytest.approx(1.0)
    assert np.isinf(d[1]).all()  # None vector row → +inf (reference convention)
    e = dist_matrix([[0.0, 0.0], [3.0, 4.0]], [[0.0, 0.0]], metric="euclidean")
    assert e[0][0] == pytest.approx(0.0) and e[1][0] == pytest.approx(5.0)


def test_emd_like_hand_case():
    from flexneuart_spark.functions.distances import emd_like

    d = np.array([[0.2, 0.5], [0.4, 0.1]])
    r = emd_like(d, [1, 2], [1, 1])
    # s1 = 0.2·1 + 0.1·2 = 0.4 ; s2 = 0.2 + 0.1 = 0.3
    assert r[0] == pytest.approx(0.4)
    assert r[1] == pytest.approx(0.2)
    assert r[2] == pytest.approx(0.175)
    assert r[3] == pytest.approx(0.35)
    assert emd_like(np.zeros((0, 0)), [], []) == (0.0, 0.0, 0.0, 0.0)


def _lcs_like_bruteforce(d, thresh):
    # direct (i1, i2) DP per the reference recurrence, O(n²) tables
    n1, n2 = d.shape
    res = []
    for mode in range(3):
        T = np.zeros((n1 + 1, n2 + 1))
        for i in range(n1):
            for j in range(n2):
                ds = max(0.0, 2.0 - d[i][j]) / 2.0
                if mode == 0:
                    g = 1.0 if d[i][j] <= thresh else 0.0
                elif mode == 1:
                    g = ds if d[i][j] <= thresh else 0.0
                else:
                    g = ds
                T[i + 1][j + 1] = max(T[i][j + 1], T[i + 1][j], T[i][j] + g)
        res.append(T[n1][n2])
    return tuple(res)


def test_lcs_like_hand_cases():
    from flexneuart_spark.functions.distances import lcs_like

    d = np.array([[0.0, 2.0], [2.0, 0.0]])
    assert lcs_like(d, 0.5) == (2.0, 2.0, 2.0)
    assert lcs_like(np.array([[1.0]]), 0.5) == (0.0, 0.0, 0.5)
    with pytest.raises(ValueError):
        lcs_like(d, -1.0)


def test_lcs_like_matches_bruteforce_dp():
    from flexneuart_spark.functions.distances import lcs_like

    rng = np.random.default_rng(11)
    for _ in range(20):
        n1, n2 = rng.integers(1, 8, size=2)
        d = rng.uniform(0, 2.5, size=(int(n1), int(n2)))
        got = lcs_like(d, 0.8)
        want = _lcs_like_bruteforce(d, 0.8)
        assert np.allclose(got, want)
