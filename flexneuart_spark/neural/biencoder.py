"""Bi-encoder (dual encoder) scoring: mean-pooled term embeddings,
cosine between the query vector and the doc vector.

Reference: ``flexneuart/models/biencoder/sbert.py`` — Sentence-BERT
style mean pooling over token vectors, scored by a dot/cosine between
the two pooled vectors. Here the token vectors are the deterministic
hash embeddings (or trained PPMI vectors via the Arrow path), pooled
tf-weighted over positions — the exact analogue of mean pooling over
token positions.

The relational form pools with one groupBy (8 sums) and scores with a
broadcast join — both partial-aggregated; the pooled doc table is one
row per doc (this is the shape that makes bi-encoders THE web-scale
retrieval architecture: corpus work is embarrassingly parallel, query
work is a k-NN over pooled vectors, which the ANN family in
``operators/similarity.py`` already serves).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flexneuart_spark.neural import register
from flexneuart_spark.neural.embeddings import (
    HASH_DIM,
    hash_embedding_col,
    hash_embedding_np,
    sql_embedding_cte,
)


def _pooled(tok_df: DataFrame, id_col: str) -> DataFrame:
    """Mean-pool hash embeddings over token POSITIONS (tf-weighted),
    then L2-normalize. The md5 embedding is computed once per DISTINCT
    term (vocabulary-sized) and equi-joined to the per-(id, term) tf
    rows — corpus-sized work is one join + one partial-aggregated
    groupBy, never per-position hashing."""
    cnt = (
        tok_df.select(id_col, F.explode("tokens").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    emb = cnt.select("term").distinct().withColumn("emb", hash_embedding_col("term"))
    sums = cnt.join(emb, "term").groupBy(id_col).agg(
        *[
            F.sum(F.col("tf") * F.element_at("emb", j + 1)).alias(f"s{j}")
            for j in range(HASH_DIM)
        ],
        F.sum("tf").alias("n"),
    )
    mean = [F.col(f"s{j}") / F.col("n") for j in range(HASH_DIM)]
    sq = mean[0] * mean[0]
    for m in mean[1:]:
        sq = sq + m * m
    norm = F.sqrt(sq)
    return sums.select(
        id_col, *[(m / norm).alias(f"v{j}") for j, m in enumerate(mean)]
    )


def biencoder_scores(docs_tok: DataFrame, q_tok: DataFrame) -> DataFrame:
    """(query_id, doc_id, score): cosine of the pooled unit vectors."""
    dvec = _pooled(docs_tok, "doc_id")
    qvec = _pooled(q_tok, "query_id")
    dot = F.col(f"d.v0") * F.col(f"q.v0")
    for j in range(1, HASH_DIM):
        dot = dot + F.col(f"d.v{j}") * F.col(f"q.v{j}")
    return (
        dvec.alias("d")
        .crossJoin(F.broadcast(qvec.alias("q")))
        .select("query_id", "doc_id", dot.alias("score"))
    )


def sql_biencoder() -> str:
    """CTE chain over shared tok/qtok: pooled unit vectors + cosine."""
    demb = sql_embedding_cte("(SELECT DISTINCT term FROM tok)")
    qemb = sql_embedding_cte("(SELECT DISTINCT term FROM qtok)")
    mean_d = ", ".join(f"sum(e.e{j}) / count(*) AS m{j}" for j in range(HASH_DIM))
    mean_q = ", ".join(f"sum(e.e{j}) / count(*) AS m{j}" for j in range(HASH_DIM))
    sq = " + ".join(f"m{j} * m{j}" for j in range(HASH_DIM))
    unit = ", ".join(f"m{j} / sqrt({sq}) AS v{j}" for j in range(HASH_DIM))
    dot = " + ".join(f"dv.v{j} * qv.v{j}" for j in range(HASH_DIM))
    return f"""
bdemb AS (SELECT * FROM {demb}),
bqemb AS (SELECT * FROM {qemb}),
bdvec AS (
  SELECT doc_id, {unit} FROM (
    SELECT t.doc_id, {mean_d}
    FROM tok t JOIN bdemb e ON t.term = e.term
    GROUP BY t.doc_id)
),
bqvec AS (
  SELECT query_id, {unit} FROM (
    SELECT t.query_id, {mean_q}
    FROM qtok t JOIN bqemb e ON t.term = e.term
    GROUP BY t.query_id)
),
bscore AS (
  SELECT qv.query_id, dv.doc_id, ({dot}) AS score
  FROM bdvec dv CROSS JOIN bqvec qv
)"""


def pooled_np(tokens_lists) -> np.ndarray:
    """Arrow-kernel twin of ``_pooled`` for a batch of token lists."""
    out = np.zeros((len(tokens_lists), HASH_DIM))
    for i, toks in enumerate(tokens_lists):
        if toks is None or len(toks) == 0:
            continue
        m = hash_embedding_np(list(toks)).mean(axis=0)
        n = np.linalg.norm(m)
        out[i] = m / n if n > 0 else m
    return out


@register("biencoder")
class BiEncoder:
    """Parameter-free pooled dual encoder (registry/serializer parity)."""

    def __init__(self):
        self.max_query_len = 64
        self.max_doc_len = 8192

    def model_args(self) -> dict:
        return {}

    def weights(self):
        return {}

    def set_weights(self, wts) -> None:
        pass
