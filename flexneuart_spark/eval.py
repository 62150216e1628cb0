"""IR evaluation metrics (SURVEY.md §2.4 A8; reference
``flexneuart/eval.py:84-190`` metric definitions, ``:349-404``
``internal_eval`` join+mean shape, cutoffs ``:45``).

All metrics are DataFrame aggregations over a (run ⨝ qrels) left join —
per-query metric then un-weighted mean over queries, exactly the
trec_eval-mimicking semantics the reference cross-checks to ≤2·10⁻⁴.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flexneuart_spark.config import EVAL_CUTOFFS


def _joined(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """run(query_id, doc_id, rank) ⨝ qrels(query_id, doc_id, grade)."""
    return run.join(qrels, ["query_id", "doc_id"], "left").withColumn(
        "grade", F.coalesce(F.col("grade"), F.lit(0))
    )


def precision_at(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    j = _joined(run, qrels).filter(F.col("rank") <= k)
    per_q = j.groupBy("query_id").agg(
        (F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)) / F.lit(float(k))).alias("p")
    )
    return per_q


def reciprocal_rank(run: DataFrame, qrels: DataFrame, k: int = 1000) -> DataFrame:
    j = _joined(run, qrels).filter(F.col("rank") <= k)
    return j.groupBy("query_id").agg(
        F.coalesce(F.max(F.when(F.col("grade") > 0, 1.0 / F.col("rank"))), F.lit(0.0)).alias("rr")
    )


def average_precision(run: DataFrame, qrels: DataFrame, k: int = 1000) -> DataFrame:
    """MAP components: AP = Σ_rel P@rank(rel) / n_rel_total (trec_eval
    denominator = total relevant in qrels, not retrieved)."""
    from pyspark.sql import Window

    n_rel = qrels.filter(F.col("grade") > 0).groupBy("query_id").agg(
        F.count("*").alias("n_rel")
    )
    j = _joined(run, qrels).filter(F.col("rank") <= k)
    w = Window.partitionBy("query_id").orderBy("rank")
    cum = j.withColumn("cum_rel", F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)).over(w))
    ap_num = cum.filter(F.col("grade") > 0).groupBy("query_id").agg(
        F.sum(F.col("cum_rel") / F.col("rank")).alias("ap_num")
    )
    return (
        n_rel.join(ap_num, "query_id", "left")
        .withColumn("ap", F.coalesce(F.col("ap_num"), F.lit(0.0)) / F.col("n_rel"))
        .select("query_id", "ap")
    )


def _gain(grade, gain: str):
    """Per-doc NDCG gain for a positive grade. ``linear`` is what both
    trec_eval's ndcg_cut and the reference's internal eval use
    (``flexneuart/eval.py::NormalizedDiscountedCumulativeGain._dcg``:
    rel/log(2+i)·log 2, i.e. grade/log2(rank+1), grades ≤ 0 skipped);
    ``exp`` is the Burges (2^grade − 1) variant, identical on binary
    qrels."""
    if gain == "linear":
        return grade
    if gain == "exp":
        return F.pow(F.lit(2.0), grade) - 1.0
    raise ValueError(f"unknown gain {gain!r} (expected 'linear' or 'exp')")


def ndcg_at(run: DataFrame, qrels: DataFrame, k: int = 10, gain: str = "linear") -> DataFrame:
    """NDCG@k; the ideal ranking is the qrels grades sorted descending and
    cut at the same k (reference eval.py: idcg over get_cut_rels(sorted
    qrel values))."""
    from pyspark.sql import Window

    j = _joined(run, qrels).filter(F.col("rank") <= k)
    dcg = j.groupBy("query_id").agg(
        F.sum(
            F.when(F.col("grade") > 0, _gain(F.col("grade"), gain) / F.log2(F.col("rank") + 1.0)).otherwise(F.lit(0.0))
        ).alias("dcg")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("grade"), F.asc("doc_id"))
    ideal = (
        qrels.filter(F.col("grade") > 0)
        .withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(F.sum(_gain(F.col("grade"), gain) / F.log2(F.col("irank") + 1.0)).alias("idcg"))
    )
    return (
        dcg.join(ideal, "query_id", "left")
        .withColumn("ndcg", F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(F.lit(0.0)))
        .select("query_id", "ndcg")
    )


def recall_at(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """recall@k (reference ``flexneuart/eval.py::RecallAtK``): relevant
    retrieved in the top-k ÷ TOTAL relevant in qrels; 0 when the query has
    no relevant docs."""
    n_rel = qrels.filter(F.col("grade") > 0).groupBy("query_id").agg(F.count("*").alias("n_rel"))
    j = _joined(run, qrels).filter(F.col("rank") <= k)
    hits = j.groupBy("query_id").agg(
        F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)).alias("n_hit")
    )
    return (
        hits.join(n_rel, "query_id", "left")
        .withColumn(
            "recall",
            F.when(F.coalesce(F.col("n_rel"), F.lit(0)) > 0, F.col("n_hit") / F.col("n_rel")).otherwise(F.lit(0.0)),
        )
        .select("query_id", "recall")
    )


def r_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """R-precision (reference ``flexneuart/eval.py::RPrecisionAtK``):
    relevant docs within the top-R of the run, R = total relevant for the
    query, ÷ max(R, 1)."""
    n_rel = qrels.filter(F.col("grade") > 0).groupBy("query_id").agg(F.count("*").alias("n_rel"))
    j = _joined(run, qrels).join(n_rel, "query_id", "left").withColumn(
        "n_rel", F.coalesce(F.col("n_rel"), F.lit(0))
    )
    per_q = j.filter(F.col("rank") <= F.col("n_rel")).groupBy("query_id").agg(
        F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)).alias("n_hit"),
        F.max("n_rel").alias("n_rel"),
    )
    # queries whose top-R window is empty (n_rel = 0) score 0
    all_q = run.select("query_id").distinct()
    return (
        all_q.join(per_q, "query_id", "left")
        .withColumn(
            "r_prec",
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.greatest(F.coalesce(F.col("n_rel"), F.lit(0)), F.lit(1)),
        )
        .select("query_id", "r_prec")
    )


def evaluate(
    run: DataFrame,
    qrels: DataFrame,
    cutoffs=EVAL_CUTOFFS,
    zero_rel_queries: str = "skip",
    gain: str = "linear",
) -> dict[str, float]:
    """Mean metrics over queries (internal_eval shape). Driver-friendly:
    returns plain floats.

    The evaluated query set is run ∩ qrels: run queries without any qrels
    entry are ignored, as are qrels queries missing from the run (the
    reference's internal_eval loops over the run and skips unjudged
    queries — ``flexneuart/eval.py:375-377`` — which is also what
    trec_eval does). ``zero_rel_queries`` controls queries whose qrels
    contain only grade-0 judgments: ``"skip"`` drops them from the means
    (trec_eval semantics), ``"count"`` scores them 0 and keeps them in
    the denominator (the reference internal_eval's choice —
    MeanAveragePrecision et al. return 0 when tot_rel_qty == 0). The two
    agree whenever every judged query has ≥1 relevant doc."""
    run_q = run.select("query_id").distinct()
    if zero_rel_queries == "skip":
        judged = qrels.filter(F.col("grade") > 0).select("query_id").distinct()
    elif zero_rel_queries == "count":
        judged = qrels.select("query_id").distinct()
    else:
        raise ValueError(f"unknown zero_rel_queries {zero_rel_queries!r} (expected 'skip' or 'count')")
    # the evaluated query set is small (one row per query) and reused by
    # every metric mean below — persist once instead of re-deriving the
    # run∩qrels semi-join plan 8-10 times per evaluate() call
    qset = run_q.join(judged, "query_id", "semi").persist()
    try:
        n_q = qset.count()

        def _mean(per_q: DataFrame, col: str) -> float:
            if n_q == 0:
                # keep the full metric dict (stable API shape) with 0.0
                # values — an empty dict would turn a run/qrels id
                # mismatch into downstream KeyErrors
                return 0.0
            # missing queries (no per-query row) score 0 but stay in the
            # denominator — sum over the qset-restricted frame / n_q
            s = per_q.join(qset, "query_id").agg(F.sum(col)).collect()[0][0]
            return float(s or 0.0) / n_q

        out: dict[str, float] = {}
        out["mrr"] = _mean(reciprocal_rank(run, qrels), "rr")
        out["map"] = _mean(average_precision(run, qrels), "ap")
        out["r_precision"] = _mean(r_precision(run, qrels), "r_prec")
        for k in cutoffs:
            if k <= 20:
                out[f"p@{k}"] = _mean(precision_at(run, qrels, k), "p")
                out[f"ndcg@{k}"] = _mean(ndcg_at(run, qrels, k, gain), "ndcg")
                out[f"recall@{k}"] = _mean(recall_at(run, qrels, k), "recall")
        return out
    finally:
        qset.unpersist()


def ndcg_reference(grades_in_rank_order: list[int], k: int) -> float:
    """Pure-Python oracle for tests."""
    dcg = sum((2**g - 1) / math.log2(r + 2) for r, g in enumerate(grades_in_rank_order[:k]))
    ideal = sorted(grades_in_rank_order, reverse=True)
    # note: ideal over the full qrels set is what the DataFrame impl uses;
    # tests construct qrels == retrieved grades so this matches
    idcg = sum((2**g - 1) / math.log2(r + 2) for r, g in enumerate(ideal[:k]) if g > 0)
    return dcg / idcg if idcg > 0 else 0.0
