"""Driver entries for the neural matching heads (``flexneuart_spark.neural``),
each with a FULL DuckDB value-hash oracle.

The cross-engine trick: term embeddings are md5-byte hash vectors
(``neural/embeddings.py``) computable bit-identically as Spark JVM
expressions, numpy kernels, and DuckDB SQL — so even the "neural"
scores get the same rounded-score + tie-rule discipline as the BM25
entries (score round 4dp; rank by rounded score desc, doc_id desc —
``flexneuart/io/runs.py:61-72``).

Entries:

- ``colbert_maxsim``  — ColBERT late interaction MaxSim top-k
                        (``models/colbert/colbert.py:124``)
- ``biencoder_topk``  — mean-pooled dual-encoder cosine top-k
                        (``models/biencoder/sbert.py``)
- ``knrm_score``      — KNRM RBF kernel pooling with fixed (committed)
                        combine weights (``models/cedr/cedr_knrm.py:28-49``)
- ``drmm_score``      — DRMM matching-histogram pooling with fixed
                        (committed) combine weights
                        (``models/cedr/cedr_drmm.py:29-48``,
                        ``models/cedr/utils.py:70-97``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flexneuart_spark.neural import drmm
from flexneuart_spark.neural.biencoder import biencoder_scores, sql_biencoder
from flexneuart_spark.neural.knrm import N_KERNELS, kernel_features, score_col, sql_kernel_features
from flexneuart_spark.neural.late_interaction import maxsim_scores, sql_maxsim
from flexneuart_spark.plans.entries import (
    SQL_QTOK,
    SQL_TOK,
    _doc_tokens,
    _queries_df,
    _rounded_topk,
)

K = 10

# Committed KNRM combine weights (the "pre-trained linear layer" for the
# deterministic entry): soft kernels get a mild monotone profile, the
# exact-match kernel (μ=1.0) dominates — the shape a trained KNRM
# converges to on keyword-ish relevance.
KNRM_W = [0.01 * (k + 1) for k in range(N_KERNELS - 1)] + [1.0]

_SQL_TOPK_TAIL = f"""
SELECT query_id, doc_id, score_r, rank FROM (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, 4) DESC, doc_id DESC) AS INT) AS rank
  FROM scored_final
) WHERE rank <= {K}
ORDER BY query_id, rank
"""


def q_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim top-k per query over hash embeddings.
    Plan: distinct-term explode, broadcast nested-loop against the query
    terms, groupBy-max + groupBy-sum (both map-side combinable)."""
    scored = maxsim_scores(_doc_tokens(spark, sf_dir), _queries_df(spark))
    return _rounded_topk(scored, "score", k=K)


SQL_COLBERT_MAXSIM = f"""
WITH {SQL_TOK}, {SQL_QTOK}, {sql_maxsim().lstrip().lstrip(',')}
, scored_final AS (SELECT * FROM mscore)
{_SQL_TOPK_TAIL}
"""


def q_biencoder_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-encoder cosine top-k: tf-weighted mean-pooled unit vectors
    per side, one broadcast product. The pooled doc table is one row per
    doc — the web-scale bi-encoder serving shape (ANN-ready)."""
    scored = biencoder_scores(_doc_tokens(spark, sf_dir), _queries_df(spark))
    return _rounded_topk(scored, "score", k=K)


SQL_BIENCODER_TOPK = f"""
WITH {SQL_TOK}, {SQL_QTOK}, {sql_biencoder().lstrip().lstrip(',')}
, scored_final AS (SELECT * FROM bscore)
{_SQL_TOPK_TAIL}
"""


def q_knrm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNRM kernel-pooled top-k with the committed combine weights."""
    phi = kernel_features(_doc_tokens(spark, sf_dir), _queries_df(spark))
    scored = phi.select(
        "query_id", "doc_id", score_col(KNRM_W).alias("score")
    )
    return _rounded_topk(scored, "score", k=K)


_KNRM_SCORE_EXPR = " + ".join(f"({w}) * phi{k}" for k, w in enumerate(KNRM_W))

SQL_KNRM_SCORE = f"""
WITH {SQL_TOK}, {SQL_QTOK}, {sql_kernel_features().lstrip().lstrip(',')}
, scored_final AS (
  SELECT query_id, doc_id, {_KNRM_SCORE_EXPR} AS score FROM kphi
)
{_SQL_TOPK_TAIL}
"""


# Committed DRMM combine weights: monotone ramp over the soft bins, the
# top (near-exact-match) bin dominates — the shape a trained DRMM
# converges to on keyword-ish relevance.
DRMM_W = [0.01 * (b + 1) for b in range(drmm.NBINS - 1)] + [1.0]


def q_drmm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRMM histogram-pooled top-k with the committed combine weights."""
    phi = drmm.histogram_features(_doc_tokens(spark, sf_dir), _queries_df(spark))
    scored = phi.select(
        "query_id", "doc_id", drmm.score_col(DRMM_W).alias("score")
    )
    return _rounded_topk(scored, "score", k=K)


_DRMM_SCORE_EXPR = " + ".join(f"({w}) * phi{b}" for b, w in enumerate(DRMM_W))

SQL_DRMM_SCORE = f"""
WITH {SQL_TOK}, {SQL_QTOK}, {drmm.sql_histogram_features().lstrip().lstrip(',')}
, scored_final AS (
  SELECT query_id, doc_id, {_DRMM_SCORE_EXPR} AS score FROM hphi
)
{_SQL_TOPK_TAIL}
"""


NEURAL_QUERIES_REG = {
    "colbert_maxsim": q_colbert_maxsim,
    "biencoder_topk": q_biencoder_topk,
    "knrm_score": q_knrm_score,
    "drmm_score": q_drmm_score,
}
NEURAL_ORACLE_SQL = {
    "colbert_maxsim": SQL_COLBERT_MAXSIM,
    "biencoder_topk": SQL_BIENCODER_TOPK,
    "knrm_score": SQL_KNRM_SCORE,
    "drmm_score": SQL_DRMM_SCORE,
}
