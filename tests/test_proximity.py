"""Close-pair proximity BM25 (C3): distributed positional-index scoring
vs an independent naive nested-loop oracle (the reference's own loop
shape, BM25CloseOrderPairSimilQueryNorm.java:44-120)."""

from __future__ import annotations

import numpy as np
import pytest

from flexneuart_spark.config import BM25_B, BM25_K1
from flexneuart_spark.fixtures import make_corpus, make_queries
from flexneuart_spark.functions.tokenize import code_tokenize
from flexneuart_spark.index.builder import build_index
from flexneuart_spark.oracle import Bm25Oracle
from flexneuart_spark.search.proximity import proximity_topk


def naive_close_pair_score(q_toks, d_toks, idf, avgdl, qw, dw, ordered, k1=BM25_K1, b=BM25_B):
    """Independent transcription of the reference semantics: nested loops,
    dict counting; terms not in ``idf`` are OOV."""
    def key(a, b_):
        return (a, b_) if ordered else (min(a, b_), max(a, b_))

    qp = {}
    for i in range(len(q_toks) - 1):
        for k in range(i + 1, min(len(q_toks), i + qw)):
            a, b_ = q_toks[i], q_toks[k]
            if a in idf and b_ in idf and a != b_:
                qp[key(a, b_)] = 0
    for i in range(len(d_toks) - 1):
        for k in range(i + 1, min(len(d_toks), i + dw)):
            a, b_ = d_toks[i], d_toks[k]
            if a in idf and b_ in idf and a != b_:
                kk = key(a, b_)
                if kk in qp:
                    qp[kk] += 1
    dl = len(d_toks)
    score = 0.0
    for (a, b_), tf in qp.items():
        if tf > 0:
            norm_tf = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            score += norm_tf * 0.5 * (idf[a] + idf[b_])
    norm = sum(idf[t] for t in set(q_toks) if t in idf)
    return score / norm if norm > 0 else 0.0


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    corpus = make_corpus(n_docs=250, seed=42)
    idx = str(tmp_path_factory.mktemp("prox_idx"))
    tables = build_index(
        spark, spark.createDataFrame(corpus), idx, num_shards=4, store_positions=True
    )
    docs = [
        (f"{r.repo}:{r.path}@{r.commit}", code_tokenize(r.content))
        for r in corpus.itertuples(index=False)
    ]
    oracle = Bm25Oracle(docs)
    return tables, docs, oracle


@pytest.mark.parametrize("ordered", [True, False])
def test_proximity_matches_naive_oracle(spark, setup, ordered):
    tables, docs, oracle = setup
    queries = [(r.query_id, r.text) for r in make_queries(10, seed=45).itertuples(index=False)]
    run = proximity_topk(spark, tables, queries, k=10, ordered=ordered)
    got = {}
    for r in run.collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score))

    idf = {t: oracle.idf(t) for t in oracle.df}
    for qid, text in queries:
        q_toks = code_tokenize(text)
        scores = []
        for did, d_toks in docs:
            s = naive_close_pair_score(q_toks, d_toks, idf, oracle.avg_doc_len, 4, 8, ordered)
            if s > 0:
                scores.append((did, s))
        scores.sort(key=lambda h: h[0], reverse=True)
        scores.sort(key=lambda h: h[1], reverse=True)
        want = scores[:10]
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, have, want)
        for (gd, gs), (wd, ws) in zip(have, want):
            assert gd == wd, (qid, have, want)
            assert abs(gs - ws) < 1e-9 * max(1.0, abs(ws))


def test_default_build_is_positional(spark, setup, tmp_path_factory):
    """The fwd table always stores the token sequence (parsedText mode) —
    proximity scoring works on a default build with no special flag."""
    corpus = make_corpus(n_docs=50, seed=42)
    idx = str(tmp_path_factory.mktemp("noprox_idx"))
    t = build_index(spark, spark.createDataFrame(corpus), idx, num_shards=2)
    run = proximity_topk(spark, t, [("q", "def return")], k=5).collect()
    assert len(run) > 0
