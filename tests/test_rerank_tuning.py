"""Rerank tail-adjustment (K4 semantics, BaseQueryApp.java:179-199),
run-provider (J5), and the BM25 tuning-grid harness."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flexneuart_spark.fixtures import make_corpus, make_queries
from flexneuart_spark.search.bm25 import bm25_topk_relational, tokens_df
from flexneuart_spark.search.rerank import bm25_rerank, rerank_tail_adjust, run_provider


@pytest.fixture(scope="module")
def run(spark):
    rows = [
        ("q1", "d1", 10.0, 1),
        ("q1", "d2", 9.0, 2),
        ("q1", "d3", 8.0, 3),
        ("q1", "d4", 7.0, 4),
    ]
    return spark.createDataFrame(rows, ["query_id", "doc_id", "score", "rank"])


def test_tail_adjust_preserves_tail_order_below_head(spark, run):
    rer = spark.createDataFrame([("q1", "d1", 1.0), ("q1", "d2", 2.0)], ["query_id", "doc_id", "new_score"])
    out = {r.doc_id: (r.score, r.rank) for r in rerank_tail_adjust(run, rer, top_r=2).collect()}
    # head reordered by new score: d2 > d1
    assert out["d2"][1] == 1 and out["d1"][1] == 2
    # tail below min reranked score (1.0), order d3 > d4 preserved
    assert out["d3"][0] < 1.0 and out["d4"][0] < out["d3"][0]
    assert out["d3"][1] == 3 and out["d4"][1] == 4


def test_run_provider(spark, run):
    got = [r.doc_id for r in run_provider(run, "q1", k=2).collect()]
    assert got == ["d1", "d2"]


def test_bm25_rerank_identity_when_same_params(spark):
    """Reranking top-R with the SAME (k1,b) over the full corpus stats of
    the candidate subset changes df/avgdl, so scores differ — but the
    output must still be a valid run: ranks 1..n per query, head ∪ tail
    complete."""
    corpus = make_corpus(n_docs=120, seed=42)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"{r.repo}:{r.path}" for r in corpus.itertuples(index=False)],
                      "content": corpus["content"]})
    )
    docs_tok = tokens_df(docs, "content", "doc_id", tokenizer="code")
    q_tok = tokens_df(spark.createDataFrame(make_queries(5, seed=43)), "text", "query_id", tokenizer="code")
    run = bm25_topk_relational(docs_tok, q_tok, k=10)
    out = bm25_rerank(run, docs_tok, q_tok, top_r=5, k1=0.9, b=0.4)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    orig = {}
    for r in run.collect():
        orig.setdefault(r.query_id, []).append(r.doc_id)
    for qid, rows in per_q.items():
        rows.sort()
        assert [x[0] for x in rows] == list(range(1, len(rows) + 1))
        assert {x[1] for x in rows} == set(orig[qid])
        # scores strictly descending under the tie rule
        scores = [x[2] for x in rows]
        assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))


def test_grid_eval_shapes(spark):
    from flexneuart_spark.plans.tuning import bm25_grid_eval

    corpus = make_corpus(n_docs=100, seed=42)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(corpus))], "content": corpus["content"]})
    )
    docs_tok = tokens_df(docs, "content", "doc_id", tokenizer="code")
    q_tok = tokens_df(spark.createDataFrame(make_queries(4, seed=43)), "text", "query_id", tokenizer="code")
    qrels = spark.createDataFrame([("q0", "d1", 1)], ["query_id", "doc_id", "grade"])
    grid = bm25_grid_eval(docs_tok, q_tok, qrels, k=5, k1_grid=[0.8, 1.2], b_grid=[0.5, 0.75])
    rows = grid.collect()
    assert len(rows) == 4
    assert all(0.0 <= r.p_at_k <= 1.0 for r in rows)
