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

- :func:`dist_matrix`    — ``compDistMatrix`` (:345): pairwise distance
  matrix between two embedding lists; missing (None) vectors → +inf rows
- :func:`emd_like`       — ``compEMDLike`` (:445): the relaxed
  Word-Mover's-Distance lower bound of Kusner et al. 2015 ("From Word
  Embeddings To Document Distances") + the reference's three normalized
  variants; takes a precomputed distance matrix + per-side term counts
- :func:`lcs_like`       — ``compLCSLike`` (:268): thresholded /
  fuzzy-similarity / max-sum LCS over a distance matrix (embedding-aware
  sequence alignment family)

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


def dist_matrix(vecs1, vecs2, metric: str = "cosine") -> np.ndarray:
    """Pairwise distance matrix between two embedding lists
    (``compDistMatrix`` shape). ``metric``: 'cosine' (1 − cos) or
    'euclidean'. A None vector yields +inf in its row/column (the
    reference's null-vector convention)."""
    n1, n2 = len(vecs1), len(vecs2)
    out = np.full((n1, n2), np.inf)
    ok1 = [i for i, v in enumerate(vecs1) if v is not None]
    ok2 = [j for j, v in enumerate(vecs2) if v is not None]
    if not ok1 or not ok2:
        return out
    a = np.asarray([np.asarray(vecs1[i], dtype=np.float64) for i in ok1])
    b = np.asarray([np.asarray(vecs2[j], dtype=np.float64) for j in ok2])
    if metric == "cosine":
        na = np.linalg.norm(a, axis=1, keepdims=True)
        nb = np.linalg.norm(b, axis=1, keepdims=True)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        d = 1.0 - (a / na) @ (b / nb).T
    elif metric == "euclidean":
        d = np.sqrt(np.maximum(0.0, (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] - 2.0 * a @ b.T))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    out[np.ix_(ok1, ok2)] = d
    return out


def emd_like(dist_matr: np.ndarray, qtys1, qtys2) -> tuple[float, float, float, float]:
    """Relaxed-WMD similarity family (``compEMDLike``): for each word the
    distance to its closest counterpart, tf-weighted and summed per side;
    returns (max of the two sums — the Kusner et al. lower bound — plus
    the reference's three normalizations)."""
    d = np.asarray(dist_matr, dtype=np.float64)
    q1 = np.asarray(qtys1, dtype=np.float64)
    q2 = np.asarray(qtys2, dtype=np.float64)
    n1, n2 = d.shape
    if n1 == 0 or n2 == 0:
        return (0.0, 0.0, 0.0, 0.0)
    min1 = d.min(axis=1)
    min2 = d.min(axis=0)
    s1 = float((np.where(np.isfinite(min1), min1, 0.0) * q1).sum())
    s2 = float((np.where(np.isfinite(min2), min2, 0.0) * q2).sum())
    return (
        max(s1, s2),
        max(s1 / n1, s2 / n2),
        (s1 / n1 + s2 / n2) / 2.0,
        (s1 * n1 + s2 * n2) / (n1 + n2),
    )


def lcs_like(dist_matr: np.ndarray, dist_thresh: float) -> tuple[float, float, float]:
    """Embedding-aware LCS family (``compLCSLike``): one DP over the
    distance matrix yielding (thresholded LCS, fuzzy LCS — threshold hits
    weighted by max(0, 2−d)/2 — and the unconstrained max-sum alignment).
    Row loop with vectorized column scan (cumulative-max recurrence)."""
    if dist_thresh < 0:
        raise ValueError("distance threshold must be non-negative")
    d = np.asarray(dist_matr, dtype=np.float64)
    n1, n2 = d.shape if d.ndim == 2 else (0, 0)
    if n1 == 0 or n2 == 0:
        return (0.0, 0.0, 0.0)
    score = np.maximum(0.0, 2.0 - d) / 2.0
    hit = d <= dist_thresh
    prev = np.zeros((3, n2 + 1))
    cur = np.zeros((3, n2 + 1))
    gains = np.empty((3, n2))
    for i in range(n1):
        gains[0] = hit[i]
        gains[1] = np.where(hit[i], score[i], 0.0)
        gains[2] = score[i]
        for ch in range(3):
            # cur[j+1] = max(prev[j+1], cur[j], prev[j] + gain[j]) — the
            # cur[j] term is a running prefix max, so scan left→right
            cand = np.maximum(prev[ch][1:], prev[ch][:-1] + gains[ch])
            run = 0.0
            c = cur[ch]
            for j in range(n2):
                run = max(run, cand[j])
                c[j + 1] = run
        prev, cur = cur, prev
    return (float(prev[0][n2]), float(prev[1][n2]), float(prev[2][n2]))
