"""Pure-numpy single-process BM25 oracle (the reference stand-in).

Plays the role the reference's own pure-Python BM25 plays against its Java
engine (``flexneuart/ranker/bm25py.py:17-20`` — dual implementations checked
against each other). Implements exactly:

- ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``
  (``simil_func/BM25SimilarityLucene.java:41-44``);
- ``tfNorm = tf*(k1+1)/(tf + k1*(1 - b + b*docLen/avgDocLen))``, k1=1.2,
  b=0.75 (``BM25SimilarityLucene.java:99-108``; ``ranker/bm25py.py:120-131``);
- ``score = Σ_q qtf * idf * tfNorm`` summed in ascending term order
  (fixed accumulation order — FIXTURES.md §4);
- top-k ties broken by (score desc, doc_id desc)
  (``flexneuart/io/runs.py:61-72``).
"""

from __future__ import annotations

import math
from collections import Counter

from flexneuart_spark.config import BM25_B, BM25_K1


class Bm25Oracle:
    def __init__(self, docs: list[tuple[str, list[str]]], k1: float = BM25_K1, b: float = BM25_B):
        """docs: list of (doc_id, tokens). Empty docs are kept (docLen 0)."""
        self.k1 = k1
        self.b = b
        self.doc_ids = [d for d, _ in docs]
        self.tf = [Counter(toks) for _, toks in docs]
        self.doc_len = [len(toks) for _, toks in docs]
        self.n_docs = len(docs)
        self.total_tokens = sum(self.doc_len)
        # avgdl guard for empty corpora (cf. ForwardIndex.java:350)
        self.avg_doc_len = (self.total_tokens / self.n_docs) if self.n_docs else 1.0
        if self.avg_doc_len <= 0:
            self.avg_doc_len = 1.0
        self.df: Counter = Counter()
        for c in self.tf:
            for w in c:
                self.df[w] += 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_doc(self, query_tokens: list[str], i: int) -> float:
        qtf = Counter(query_tokens)
        dl = self.doc_len[i]
        s = 0.0
        for term in sorted(qtf):  # fixed ascending-term accumulation order
            tf = self.tf[i].get(term, 0)
            if tf == 0:
                continue
            idf = self.idf(term)
            tf_norm = tf * (self.k1 + 1.0) / (
                tf + self.k1 * (1.0 - self.b + self.b * dl / self.avg_doc_len)
            )
            s += qtf[term] * idf * tf_norm
        return s

    def search(self, query_tokens: list[str], k: int = 10) -> list[tuple[str, float]]:
        """Exhaustive top-k; only docs with ≥1 matching term are candidates
        (OR-of-terms semantics, LuceneCandidateProvider.java:154-160)."""
        qterms = set(query_tokens)
        hits = []
        for i, c in enumerate(self.tf):
            if not qterms.intersection(c):
                continue
            hits.append((self.doc_ids[i], self.score_doc(query_tokens, i)))
        # tie rule (score desc, doc_id desc) via two stable sorts
        hits.sort(key=lambda h: h[0], reverse=True)
        hits.sort(key=lambda h: h[1], reverse=True)
        return hits[:k]
