"""Numpy block-max / MaxScore top-k kernel (runs inside the per-shard
pandas UDF; no per-row Python at the Spark layer, no per-doc Python here —
loops are per term and per needed block only).

Semantics: exactly exhaustive OR-of-terms BM25 top-k (the reference's
``IndexSearcher.search(q, k)`` with BM25Similarity —
``cand_providers/LuceneCandidateProvider.java:103-178``; Lucene 8.6 prunes
with Block-Max WAND internally, we prune with the term-at-a-time MaxScore
rule + block-level skip pointers; results are identical to exhaustive
scoring, only work is saved).

Scoring formula (``simil_func/BM25SimilarityLucene.java:99-108``):
    score(d) = Σ_t qtf_t · idf_t · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))

Pruning invariants:
- partial accumulator scores only grow ⇒ the running k-th best partial
  score θ is a lower bound of the final k-th best score;
- a doc not yet admitted can gain at most the suffix sum of per-term upper
  bounds ⇒ once that suffix < θ (strictly), no new doc can enter the top-k
  and remaining terms only *update* existing candidates via binary-search
  lookups, decoding only blocks whose doc range contains a candidate
  (block_max_doc skip data).
"""

from __future__ import annotations

import numpy as np

from flexneuart_spark.config import BM25_B, BM25_K1
from flexneuart_spark.index.codec import decode_block, ub_impact


def _tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    tfs = tfs.astype(np.float64)
    return tfs / (tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl))


class TermPostings:
    """One (shard, term) posting list: payload + block sidecar + query weight
    ``weight = qtf · idf · (k1+1)``."""

    __slots__ = ("payload", "block_off", "block_n", "block_max_doc", "block_max_tf", "block_min_dl", "weight")

    def __init__(self, payload, block_off, block_n, block_max_doc, block_max_tf, block_min_dl, weight):
        self.payload = payload
        self.block_off = np.asarray(block_off, dtype=np.int64)
        self.block_n = np.asarray(block_n, dtype=np.int64)
        self.block_max_doc = np.asarray(block_max_doc, dtype=np.int64)
        self.block_max_tf = np.asarray(block_max_tf, dtype=np.int64)
        self.block_min_dl = np.asarray(block_min_dl, dtype=np.int64)
        self.weight = float(weight)

    def upper_bound(self, avgdl: float, k1: float = BM25_K1, b: float = BM25_B) -> float:
        if len(self.block_max_tf) == 0:
            return 0.0
        return self.weight * float(ub_impact(self.block_max_tf, self.block_min_dl, avgdl, k1, b).max())

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ds, ts, ls = [], [], []
        for off, n in zip(self.block_off, self.block_n):
            d, t, l = decode_block(self.payload, int(off), int(n))
            ds.append(d)
            ts.append(t)
            ls.append(l)
        if not ds:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return np.concatenate(ds), np.concatenate(ts), np.concatenate(ls)


def maxscore_topk(
    entries: list[TermPostings],
    k: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (doc_ords, scores) within one shard for one query.

    Ties broken by doc ordinal descending — ordinals are assigned in
    ascending doc_id order within a shard, so this equals the reference's
    (score desc, doc_id desc) rule (``flexneuart/io/runs.py:61-72``)
    shard-locally; the global merge re-applies it on doc_id.
    """
    if not entries or k <= 0:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.float64)

    ubs = np.array([e.upper_bound(avgdl, k1, b) for e in entries])
    order = np.argsort(-ubs, kind="stable")
    entries = [entries[i] for i in order]
    ubs = ubs[order]
    suffix = np.cumsum(ubs[::-1])[::-1]  # suffix[i] = Σ_{j≥i} ub_j

    acc_ords = np.empty(0, dtype=np.int64)
    acc_scores = np.empty(0, dtype=np.float64)
    lookup_start = len(entries)

    for i, e in enumerate(entries):
        if len(acc_scores) >= k:
            theta = float(np.partition(acc_scores, -k)[-k])
            if suffix[i] < theta:
                lookup_start = i
                break
        ords, tfs, dls = e.decode_all()
        contrib = e.weight * _tf_norm(tfs, dls, avgdl, k1, b)
        cat_ords = np.concatenate([acc_ords, ords])
        cat_scores = np.concatenate([acc_scores, contrib])
        acc_ords, inv = np.unique(cat_ords, return_inverse=True)
        acc_scores = np.zeros(len(acc_ords), dtype=np.float64)
        np.add.at(acc_scores, inv, cat_scores)

    # Lookup phase: remaining terms only refine existing candidates.
    if lookup_start < len(entries) and len(acc_ords):
        cand = acc_ords  # sorted (np.unique)
        for e in entries[lookup_start:]:
            bmax = e.block_max_doc
            if len(bmax) == 0:
                continue
            pos = np.searchsorted(bmax, cand)  # block index per candidate
            valid = pos < len(bmax)
            if not valid.any():
                continue
            for j in np.unique(pos[valid]):
                cs = cand[pos == j]
                d, t, l = decode_block(e.payload, int(e.block_off[j]), int(e.block_n[j]))
                ii = np.searchsorted(d, cs)
                ii_c = np.minimum(ii, len(d) - 1)
                hit = d[ii_c] == cs
                if not hit.any():
                    continue
                add = e.weight * _tf_norm(t[ii_c][hit], l[ii_c][hit], avgdl, k1, b)
                acc_idx = np.searchsorted(acc_ords, cs[hit])
                acc_scores[acc_idx] += add

    if len(acc_ords) == 0:
        return acc_ords, acc_scores
    kk = min(k, len(acc_ords))
    # ascending (score, ord) lexsort reversed ⇒ (score desc, ord desc)
    srt = np.lexsort((acc_ords, acc_scores))[::-1][:kk]
    return acc_ords[srt], acc_scores[srt]


def exhaustive_topk(
    entries: list[TermPostings],
    k: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference kernel: decode everything, aggregate, top-k. Used by tests
    to prove the pruned kernel is result-identical."""
    if not entries or k <= 0:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.float64)
    all_ords, all_contrib = [], []
    for e in entries:
        ords, tfs, dls = e.decode_all()
        all_ords.append(ords)
        all_contrib.append(e.weight * _tf_norm(tfs, dls, avgdl, k1, b))
    cat_ords = np.concatenate(all_ords)
    cat_scores = np.concatenate(all_contrib)
    u, inv = np.unique(cat_ords, return_inverse=True)
    s = np.zeros(len(u), dtype=np.float64)
    np.add.at(s, inv, cat_scores)
    kk = min(k, len(u))
    srt = np.lexsort((u, s))[::-1][:kk]
    return u[srt], s[srt]
