"""NeuralRanker — the rerank wrapper for the neural heads.

Shape parity with ``flexneuart/ranker/neural.py``: a loaded model (from
the registry/serializer) re-scores the top-R candidates of a run, with
the candidate-generator score mixed in at ``cand_score_weight``
(``ranker/neural.py:52,107`` — the reference adds
``cand_score_weight * candidate_score`` to the model score). Scoring is
one Arrow-batched pandas UDF per model over the candidate (query, doc)
pair table — the forward pass is pure numpy against md5-hash
embeddings computed inside the batch, so scoring a candidate set never
shuffles anything but the candidate join itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flexneuart_spark.neural import load_model
from flexneuart_spark.neural.knrm import KNRM, knrm_score_batch
from flexneuart_spark.neural.drmm import DRMM, drmm_score_batch
from flexneuart_spark.neural.late_interaction import MaxSim, maxsim_batch
from flexneuart_spark.neural.biencoder import BiEncoder, pooled_np
from flexneuart_spark.search.rerank import rerank_tail_adjust


def _grouped_query_scorer(batch_fn, w, bias):
    """Build a score_block for heads scored per-(query group) with a
    ``batch_fn(doc_tokens_lists, q_terms, q_tfs, w, bias)`` kernel."""

    def score_block(q_tokens: pd.Series, d_tokens: pd.Series) -> pd.Series:
        out = np.empty(len(q_tokens))
        # group rows by query so each query's term matrix hashes once
        qkey = q_tokens.map(lambda ts: " ".join(ts) if ts is not None else "")
        for _, idx in pd.Series(range(len(q_tokens))).groupby(qkey.values):
            ii = idx.to_numpy()
            v = q_tokens.iloc[ii[0]]
            qts = list(v) if v is not None else []
            uq, qtf = np.unique(np.asarray(qts, dtype=object), return_counts=True)
            if len(uq) == 0:
                out[ii] = 0.0
                continue
            out[ii] = batch_fn(
                [d_tokens.iloc[i] for i in ii], list(uq), qtf.astype(float), w, bias
            )
        return pd.Series(out)

    return score_block


def _score_pairs_udf(model):
    """pandas UDF scoring (q_tokens, d_tokens) rows for a loaded model."""

    # DRMM subclasses KNRM (same convex trainer), so it MUST dispatch first:
    # its weights are histogram-bin weights, not RBF-kernel weights
    if isinstance(model, DRMM):
        score_block = _grouped_query_scorer(drmm_score_batch, model.w.copy(), model.b)

    elif isinstance(model, KNRM):
        score_block = _grouped_query_scorer(knrm_score_batch, model.w.copy(), model.b)

    elif isinstance(model, MaxSim):

        def score_block(q_tokens: pd.Series, d_tokens: pd.Series) -> pd.Series:
            out = np.empty(len(q_tokens))
            qkey = q_tokens.map(lambda ts: " ".join(ts) if ts is not None else "")
            for _, idx in pd.Series(range(len(q_tokens))).groupby(qkey.values):
                ii = idx.to_numpy()
                v = q_tokens.iloc[ii[0]]
                qts = sorted(set(v)) if v is not None else []
                if not qts:
                    out[ii] = 0.0
                    continue
                out[ii] = maxsim_batch([d_tokens.iloc[i] for i in ii], qts)
            return pd.Series(out)

    elif isinstance(model, BiEncoder):

        def score_block(q_tokens: pd.Series, d_tokens: pd.Series) -> pd.Series:
            qv = pooled_np(list(q_tokens))
            dv = pooled_np(list(d_tokens))
            return pd.Series((qv * dv).sum(axis=1))

    else:
        raise ValueError(f"unsupported model type {type(model).__name__}")

    return F.pandas_udf(score_block, T.DoubleType())


class NeuralRanker:
    """Re-score the top-R of a run with a neural head.

    :param model:              a registry model instance OR a serialized
                               model path (``ranker/neural.py:73-80``
                               loads from a path the same way)
    :param cand_score_weight:  weight of the candidate-generator score
                               added to the model score
                               (``ranker/neural.py:52``; default 0)
    """

    def __init__(self, model, cand_score_weight: float = 0.0):
        self.model = load_model(model) if isinstance(model, str) else model
        self.cand_score_weight = float(cand_score_weight)

    def score_candidates(
        self, run: DataFrame, docs_tok: DataFrame, queries_tok: DataFrame, top_r: int
    ) -> DataFrame:
        """(query_id, doc_id, new_score) for candidates with rank ≤ R —
        the ``score_candidates`` analogue (``ranker/neural.py:107``)."""
        cand = run.filter(F.col("rank") <= top_r).select("query_id", "doc_id", "score")
        pairs = (
            cand.join(docs_tok.withColumnRenamed("tokens", "d_tokens"), "doc_id")
            .join(
                F.broadcast(queries_tok.withColumnRenamed("tokens", "q_tokens")),
                "query_id",
            )
        )
        udf = _score_pairs_udf(self.model)
        scored = pairs.withColumn("model_score", udf("q_tokens", "d_tokens"))
        return scored.select(
            "query_id",
            "doc_id",
            (
                F.col("model_score")
                + F.lit(self.cand_score_weight) * F.col("score")
            ).alias("new_score"),
        )

    def rerank(
        self, run: DataFrame, docs_tok: DataFrame, queries_tok: DataFrame, top_r: int
    ) -> DataFrame:
        """Full rerank: score top-R, tail-adjust the rest (K4)."""
        new = self.score_candidates(run, docs_tok, queries_tok, top_r)
        return rerank_tail_adjust(run, new, top_r)
