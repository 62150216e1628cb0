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

import heapq

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


class _BMWCursor:
    """Document-at-a-time cursor over one term's posting blocks, decoding
    a block only when the cursor enters it. ``cur`` is the current doc
    ordinal (None once exhausted); ``ub`` the list-wide score upper bound;
    ``block_ubs[j]`` the per-block upper bound (the Block-Max impact
    data the codec stores — ``index/codec.py`` sidecar)."""

    __slots__ = ("tp", "idx", "nb", "bi", "pos", "d", "t", "l", "ub", "block_ubs", "cur")

    def __init__(self, tp: TermPostings, idx: int, avgdl: float, k1: float, b: float):
        self.tp = tp
        self.idx = idx
        self.nb = len(tp.block_off)
        if self.nb:
            self.block_ubs = tp.weight * ub_impact(tp.block_max_tf, tp.block_min_dl, avgdl, k1, b)
            self.ub = float(self.block_ubs.max())
            self._load(0)
            self.pos = 0
            self.cur = int(self.d[0])
        else:
            self.block_ubs = np.empty(0, dtype=np.float64)
            self.ub = 0.0
            self.cur = None

    def _load(self, bi: int) -> None:
        self.bi = bi
        self.d, self.t, self.l = decode_block(
            self.tp.payload, int(self.tp.block_off[bi]), int(self.tp.block_n[bi])
        )

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc ordinal ≥ target."""
        if self.cur is None or self.cur >= target:
            return
        j = int(np.searchsorted(self.tp.block_max_doc, target))
        if j >= self.nb:
            self.cur = None
            return
        if j != self.bi:
            self._load(j)
        # block_max_doc[j] ≥ target ⇒ the block holds a doc ≥ target
        self.pos = int(np.searchsorted(self.d, target))
        self.cur = int(self.d[self.pos])

    def advance(self) -> None:
        p = self.pos + 1
        if p < len(self.d):
            self.pos = p
            self.cur = int(self.d[p])
        elif self.bi + 1 < self.nb:
            self._load(self.bi + 1)
            self.pos = 0
            self.cur = int(self.d[0])
        else:
            self.cur = None

    def contrib(self, avgdl: float, k1: float, b: float) -> float:
        # scalar twin of _tf_norm, same op order ⇒ bit-identical sums
        tf = float(self.t[self.pos])
        dl = float(self.l[self.pos])
        return self.tp.weight * (tf / (tf + k1 * (1.0 - b + b * dl / avgdl)))


def bmw_topk(
    entries: list[TermPostings],
    k: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-Max WAND top-k (Ding & Suel, SIGIR'11) — the literal
    algorithm the north rule names and the one Lucene 8 runs under the
    reference (``cand_providers/LuceneCandidateProvider.java:103-178``
    delegates to ``IndexSearcher.search``, which prunes with BMW since
    Lucene 8.0; BASELINE.md pins Lucene 8.6.0).

    Document-at-a-time over lazily-decoded blocks with a bounded min-heap
    of (score, ord):

    - sort cursors by current doc; the pivot is the shortest prefix whose
      Σ list-wide upper bounds reaches θ (the heap minimum once full) —
      ``≥ θ``, not ``>``, because the (score desc, ord desc) tie rule can
      admit an exact tie with a higher ordinal;
    - shallow check: re-bound the pivot doc with the per-block maxima of
      the blocks that contain it; if that sum is still < θ, no doc up to
      the nearest block boundary can enter, so skip the max-ub prefix
      cursor straight past the boundary without decoding;
    - otherwise, if the prefix is aligned on the pivot doc, score it
      fully (summing contributions in original entry order, bit-identical
      to the exhaustive kernel) and offer it to the heap; if not aligned,
      advance the max-ub lagging cursor to the pivot.

    Result-identical to ``exhaustive_topk`` / ``maxscore_topk``
    (equivalence-tested); work saved is whole undecoded blocks. The
    default serving kernel remains ``maxscore_topk`` — term-at-a-time
    vectorizes better in numpy — but BMW decodes strictly fewer blocks
    and is the shape a JVM/native port of this kernel would keep.
    """
    if not entries or k <= 0:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.float64)
    cursors = [
        c
        for c in (_BMWCursor(e, i, avgdl, k1, b) for i, e in enumerate(entries))
        if c.cur is not None
    ]
    heap: list[tuple[float, int]] = []  # bounded min-heap, size ≤ k
    while cursors:
        cursors = [c for c in cursors if c.cur is not None]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.cur)
        full = len(heap) >= k
        theta = heap[0][0] if full else float("-inf")
        cum = 0.0
        pivot = -1
        for i, c in enumerate(cursors):
            cum += c.ub
            if cum >= theta:
                pivot = i
                break
        if pivot == -1:
            break  # no remaining doc can reach the top-k
        pdoc = cursors[pivot].cur
        # widen the prefix to every cursor already sitting on the pivot
        # doc (their mass counts for it, and it keeps skip targets > pdoc)
        while pivot + 1 < len(cursors) and cursors[pivot + 1].cur == pdoc:
            pivot += 1
        live = cursors[: pivot + 1]
        if full:
            shallow = 0.0
            boundary = pdoc
            first = True
            for c in live:
                j = int(np.searchsorted(c.tp.block_max_doc, pdoc))
                if j >= c.nb:
                    continue  # list ends before pdoc: contributes nothing
                shallow += float(c.block_ubs[j])
                bd = int(c.tp.block_max_doc[j])
                boundary = bd if first else min(boundary, bd)
                first = False
            if shallow < theta:
                nxt = boundary + 1
                if pivot + 1 < len(cursors):
                    nxt = min(nxt, cursors[pivot + 1].cur)
                max(live, key=lambda c: c.ub).next_geq(nxt)
                continue
        if cursors[0].cur == pdoc:
            score = 0.0
            for c in sorted(live, key=lambda c: c.idx):
                score += c.contrib(avgdl, k1, b)
            for c in live:
                c.advance()
            cand = (score, pdoc)
            if not full:
                heapq.heappush(heap, cand)
            elif cand > heap[0]:
                heapq.heapreplace(heap, cand)
        else:
            max((c for c in live if c.cur < pdoc), key=lambda c: c.ub).next_geq(pdoc)
    if not heap:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.float64)
    ranked = sorted(heap, reverse=True)
    return (
        np.array([o for _, o in ranked], dtype=np.int64),
        np.array([s for s, _ in ranked], dtype=np.float64),
    )


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
