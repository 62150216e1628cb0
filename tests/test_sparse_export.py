"""Sparse-export check (reference pattern: CheckSparseExportScores.java —
exported vectors' inner products must equal the similarity scores)."""

from __future__ import annotations

import math

import pandas as pd

from flexneuart_spark.fixtures import make_corpus, make_queries
from flexneuart_spark.functions.tokenize import code_tokenize
from flexneuart_spark.oracle import Bm25Oracle
from flexneuart_spark.search.bm25 import bm25_sparse_vectors, tokens_df

K = 10


def test_sparse_dot_product_equals_bm25(spark):
    corpus = make_corpus(n_docs=150, seed=42)
    queries = make_queries(n_queries=10, seed=43)
    doc_ids = [f"{r.repo}:{r.path}@{r.commit}" for r in corpus.itertuples(index=False)]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": doc_ids, "content": corpus["content"]})
    )
    docs_tok = tokens_df(docs, "content", "doc_id", tokenizer="code")
    dv = bm25_sparse_vectors(docs_tok).toPandas()
    by_doc: dict[str, dict[str, float]] = {}
    for r in dv.itertuples(index=False):
        by_doc.setdefault(r.doc_id, {})[r.term] = r.value

    oracle = Bm25Oracle([(d, code_tokenize(c)) for d, c in zip(doc_ids, corpus["content"])])
    checked = 0
    for q in queries.itertuples(index=False):
        toks = code_tokenize(q.text)
        if not toks:
            continue
        qtf: dict[str, int] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0) + 1
        for did, want in oracle.search(toks, K):
            vec = by_doc.get(did, {})
            got = sum(
                c * math.sqrt(oracle.idf(t)) * vec[t]
                for t, c in qtf.items()
                if t in vec and oracle.df.get(t)
            )
            assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (q.query_id, did, got, want)
            checked += 1
    assert checked > 20
