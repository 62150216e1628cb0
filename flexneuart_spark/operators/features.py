"""Composite feature extraction + linear fusion (SURVEY.md §2.11).

The reference assembles per-field similarity scorers into a dense feature
vector from a JSON config (``letor/FeatureExtractor.java:38-55``,
``resources/CompositeFeatureExtractor.java``) and fuses them with a
linear model (RankLib dot product — ``apps/BaseQueryApp.java:85-119``
intermediate rerank). Spark restatement: each feature is a relational
(query_id, doc_id, score) frame; the composite is a full outer join with
0-fill (a candidate missing from one scorer contributes 0, like the
reference's sparse feature vectors), and the linear model is a weighted
column sum.

Feature registry (each ``fn(docs_tok, q_tok, **params)``):

- ``bm25``       — C1 (k1/b configurable: the reference's per-field BM25
  extractors, ``letor/FeatExtrTFIDFSimilarity``)
- ``term_match`` — C6 (#shared distinct terms / #query distinct terms,
  ``simil_func/TermMatchSimilarity.java:30-50``)
- ``model1``     — C7 (pass ``tran=<translation DataFrame>``)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flexneuart_spark.config import BM25_B, BM25_K1


def _feat_bm25(docs_tok: DataFrame, q_tok: DataFrame, k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    from flexneuart_spark.search.bm25 import bm25_score_relational

    return bm25_score_relational(docs_tok, q_tok, k1=k1, b=b)


def _feat_term_match(docs_tok: DataFrame, q_tok: DataFrame) -> DataFrame:
    dterms = docs_tok.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
    qterms = q_tok.select("query_id", F.explode(F.array_distinct("tokens")).alias("term"))
    qsize = qterms.groupBy("query_id").agg(F.count("*").alias("qn"))
    return (
        dterms.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("matched"))
        .join(F.broadcast(qsize), "query_id")
        .select("query_id", "doc_id", (F.col("matched") / F.col("qn")).alias("score"))
    )


def _feat_model1(docs_tok: DataFrame, q_tok: DataFrame, tran: DataFrame = None, **kw) -> DataFrame:
    from flexneuart_spark.operators.model1 import model1_scores

    if tran is None:
        raise ValueError("model1 feature needs tran=<translation DataFrame>")
    return model1_scores(docs_tok, q_tok, tran, **kw)


FEATURES: dict[str, Callable[..., DataFrame]] = {
    "bm25": _feat_bm25,
    "term_match": _feat_term_match,
    "model1": _feat_model1,
}


def extract_features(docs_tok: DataFrame, q_tok: DataFrame, config: list[dict]) -> DataFrame:
    """config: ``[{"name": "f_bm25", "feature": "bm25", ...params}, ...]``
    → (query_id, doc_id, <name> double ...), outer-joined, 0-filled."""
    out = None
    for i, stage in enumerate(config):
        conf = dict(stage)
        name = conf.pop("name")
        feat = conf.pop("feature")
        if feat not in FEATURES:
            raise ValueError(f"feature {i}: unknown {feat!r} (known: {sorted(FEATURES)})")
        f = FEATURES[feat](docs_tok, q_tok, **conf).select(
            "query_id", "doc_id", F.col("score").alias(name)
        )
        out = f if out is None else out.join(f, ["query_id", "doc_id"], "full")
    if out is None:
        raise ValueError("empty feature config")
    names = [c for c in out.columns if c not in ("query_id", "doc_id")]
    return out.fillna({n: 0.0 for n in names})


def linear_rerank(features: DataFrame, weights: dict[str, float], k: int = 10) -> DataFrame:
    """RankLib-linear-model analogue: score = Σ w_f · feature_f, global
    top-k per query under the (score desc, doc_id desc) tie rule."""
    score = None
    for name, w in weights.items():
        term = F.lit(float(w)) * F.col(name)
        score = term if score is None else score + term
    scored = features.withColumn("score", score)
    win = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def ensemble_rerank(features: DataFrame, ensemble, feature_names: list[str], k: int = 10) -> DataFrame:
    """RankLib tree-ensemble (LambdaMART/MART) rerank: score each
    candidate with ``io/ranklib.py::TreeEnsemble`` — Σ weight·tree(x),
    descend left iff value <= threshold (Ensemble.java:113-118,
    Split.java:120-131) — then global top-k per query under the
    (score desc, doc_id desc) tie rule.

    ``feature_names[i]`` is the column holding RankLib feature id i+1
    (the same id↔config-order mapping as ``weights_for_features``).
    Scoring is ONE Arrow-batched pandas UDF: the flattened tree arrays
    ship once per executor and each batch is a vectorized numpy walk —
    no per-row Python, no shuffle beyond the final per-query window."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    max_fid = max(ensemble.feature_ids, default=0)
    if max_fid > len(feature_names):
        raise ValueError(
            f"model references feature id {max_fid} but only "
            f"{len(feature_names)} feature columns were provided"
        )
    trees = ensemble.trees  # picklable (numpy arrays), closed over once

    def _score(*cols):
        from flexneuart_spark.io.ranklib import TreeEnsemble

        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        return pd.Series(TreeEnsemble(trees).eval_matrix(X))

    # variadic signature → register explicitly (type hints don't support *args)
    score_udf = F.pandas_udf(_score, DoubleType())
    scored = features.withColumn("score", score_udf(*[F.col(n) for n in feature_names]))
    win = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
