"""Distance / similarity function library (SURVEY.md §2.8 C8).

Numpy restatement of ``simil_func/DistanceFunctions.java``:

- :func:`euclidean`      — ``compEuclidean`` (:43)
- :func:`cosine`         — ``compCosine`` (:69)
- :func:`scalar`         — ``compScalar`` (:80, dense) / (:567, sparse via
  :func:`sparse_scalar`)
- :func:`norm_scalar`    — ``compNormScalar`` (:106, :604)
- :func:`lcs`            — ``compLCS`` (:148 string / :179 int): classic
  two-row DP, here vectorized per row (candidate = prev[j-1]+1 on match
  else prev[j], then a running max — valid because LCS rows are
  non-decreasing and adjacent cells differ by ≤1)
- :func:`js_divergence`  — ``computeJSDiv`` (:499): Jensen-Shannon over
  sparse probability vectors, merge-join semantics incl. the
  disjoint-id tails (each contributes val·ln 2)

``compEMDLike`` (:445) needs word embeddings + a transport approximation
and stays out of scope with the neural stack (SURVEY §7.0).
These are reranker-level utilities in the reference (used via feature
extractors); here they are plain numpy functions usable inside pandas
UDFs.
"""

from __future__ import annotations

import numpy as np


def euclidean(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(((a - b) ** 2).sum()))


def scalar(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(a @ b)


def cosine(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0.0 or nb == 0.0:
        return 0.0
    # clamp like the reference (compCosine caps at [-1, 1] against float error)
    return float(np.clip((a @ b) / (na * nb), -1.0, 1.0))


def norm_scalar(a, b) -> float:
    """Inner product of L2-normalized vectors (cosine without clamping —
    ``compNormScalar``)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float((a @ b) / (na * nb))


def lcs(seq1, seq2) -> int:
    """Length of the longest common subsequence (``compLCS``). Works for
    any element type numpy can compare (strings, ints)."""
    s1 = np.asarray(seq1)
    s2 = np.asarray(seq2)
    if len(s1) == 0 or len(s2) == 0:
        return 0
    prev = np.zeros(len(s2) + 1, dtype=np.int64)
    for x in s1:
        cand = np.where(s2 == x, prev[:-1] + 1, prev[1:])
        curr = np.empty_like(prev)
        curr[0] = 0
        np.maximum.accumulate(cand, out=cand)
        curr[1:] = cand
        prev = curr
    return int(prev[-1])


def sparse_scalar(ids1, vals1, ids2, vals2) -> float:
    """Sparse dot product over sorted id arrays (``compScalar`` :567)."""
    ids1 = np.asarray(ids1, dtype=np.int64)
    ids2 = np.asarray(ids2, dtype=np.int64)
    vals1 = np.asarray(vals1, dtype=np.float64)
    vals2 = np.asarray(vals2, dtype=np.float64)
    pos = np.searchsorted(ids2, ids1)
    pos_c = np.minimum(pos, len(ids2) - 1) if len(ids2) else pos
    hit = (len(ids2) > 0) & (pos < len(ids2))
    if not np.any(hit):
        return 0.0
    match = hit & (ids2[pos_c] == ids1)
    return float((vals1[match] * vals2[pos_c[match]]).sum())


def sparse_norm_scalar(ids1, vals1, ids2, vals2) -> float:
    """``compNormScalar`` (:604): sparse dot / (||v1||·||v2||)."""
    n1 = float(np.linalg.norm(np.asarray(vals1, dtype=np.float64)))
    n2 = float(np.linalg.norm(np.asarray(vals2, dtype=np.float64)))
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    return sparse_scalar(ids1, vals1, ids2, vals2) / (n1 * n2)


def js_divergence(ids1, vals1, ids2, vals2) -> float:
    """Jensen-Shannon divergence over two sparse probability vectors
    (``computeJSDiv`` :499-560): per shared id, both sides contribute
    val·ln(val/m) with m = (v1+v2)/2; an id present on one side only
    contributes val·ln 2. Values must lie in [0, 1]."""
    ids1 = np.asarray(ids1, dtype=np.int64)
    ids2 = np.asarray(ids2, dtype=np.int64)
    vals1 = np.asarray(vals1, dtype=np.float64)
    vals2 = np.asarray(vals2, dtype=np.float64)
    if ((vals1 < 0) | (vals1 > 1)).any() or ((vals2 < 0) | (vals2 > 1)).any():
        raise ValueError("probability values must be within [0, 1]")
    union = np.union1d(ids1, ids2)
    v1 = np.zeros(len(union))
    v2 = np.zeros(len(union))
    v1[np.searchsorted(union, ids1)] = vals1
    v2[np.searchsorted(union, ids2)] = vals2
    m = 0.5 * (v1 + v2)
    res = 0.0
    sel1 = np.minimum(v1, m) > np.finfo(np.float64).tiny
    sel2 = np.minimum(v2, m) > np.finfo(np.float64).tiny
    res += float((v1[sel1] * np.log(v1[sel1] / m[sel1])).sum())
    res += float((v2[sel2] * np.log(v2[sel2] / m[sel2])).sum())
    return res
