"""Coordinate Ascent training for linear fusion weights (SURVEY.md §2.11).

Reference: the vendored RankLib trainer
``java/lemur-code-r2792-RankLib-trunk/src/ciir/umass/edu/learning/CoorAscent.java``
(restarts :88, uniform 1/m init :93-94, geometric line search :124-166,
L1 weight normalization :392-404, consecutive-fails stop :105, tolerance
stop :198-199). The reference trains fusion weights over exported feature
files; here the trainer runs directly over the (query_id, doc_id, grade,
features...) DataFrame the feature extractors produce.

Spark-first restatement: the driver only ever holds the m-float weight
vector; every metric evaluation is distributed. The expensive part —
RankLib evaluates each candidate weight vector with a full re-rank — is
batched: ONE job scores ALL candidates of a feature's line search (both
directions plus the zero-out, ≤ 2·n_max_iteration+1 vectors) by building
an array of score columns and ``posexplode``-ing it, so the per-query
window/rank/metric runs once per (candidate × query) in a single shuffle
instead of one job per step. Known deviation from RankLib: it stops at
the first direction that improves; we argmax over both directions'
candidates in the same batch (never worse, one job instead of up to
three).

At 100 TB the expansion factor is the candidate count (≤ 51 by default):
rows are (ids, grade, one double), the feature frame is persisted once
and unpersisted in a finally, and the shuffle key is (candidate, query) —
no skew beyond the per-query candidate-list length the run already has.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# CoorAscent.java:34-40 defaults
N_RESTART = 5
N_MAX_ITERATION = 25
STEP_BASE = 0.05
STEP_SCALE = 2.0
TOLERANCE = 0.001


def _candidate_metrics(
    feats: DataFrame,
    feature_cols: list[str],
    cands: list[list[float]],
    metric: str,
    k: int,
) -> list[float]:
    """Mean metric per candidate weight vector, all candidates in ONE job."""
    def score_col(wv):
        expr = F.lit(0.0)
        for w, c in zip(wv, feature_cols):
            expr = expr + F.lit(float(w)) * F.col(c)
        return expr

    e = feats.select(
        "query_id",
        "doc_id",
        "grade",
        F.posexplode(F.array(*[score_col(wv) for wv in cands])).alias("cand", "score"),
    )
    w = Window.partitionBy("cand", "query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    r = e.withColumn("rank", F.row_number().over(w))
    rel = F.when(F.col("grade") > 0, 1).otherwise(0)
    if metric == "map":
        # AP over the candidate list; denominator = relevant docs in the
        # list (RankLib's APScorer counts relevant within the RankList)
        cum = F.sum(rel).over(w.rowsBetween(Window.unboundedPreceding, 0))
        per_q = (
            r.withColumn("cum_rel", cum)
            .groupBy("cand", "query_id")
            .agg(
                (
                    F.sum(F.when(F.col("grade") > 0, F.col("cum_rel") / F.col("rank")))
                    / F.sum(rel)
                ).alias("m")
            )
            .fillna({"m": 0.0})
        )
    elif metric.startswith("p@"):
        kk = int(metric[2:]) if len(metric) > 2 else k
        per_q = (
            r.filter(F.col("rank") <= kk)
            .groupBy("cand", "query_id")
            .agg((F.sum(rel) / F.lit(float(kk))).alias("m"))
        )
    elif metric.startswith("ndcg@"):
        kk = int(metric[5:]) if len(metric) > 5 else k
        dcg = (
            r.filter(F.col("rank") <= kk)
            .groupBy("cand", "query_id")
            .agg(
                F.sum(
                    F.when(F.col("grade") > 0, F.col("grade") / F.log2(F.col("rank") + 1.0)).otherwise(0.0)
                ).alias("dcg")
            )
        )
        # ideal DCG is candidate-independent — compute it ONCE per query
        # from the unexploded frame and join, instead of re-ranking the
        # same grades once per candidate (~51x the window input)
        iw = Window.partitionBy("query_id").orderBy(F.desc("grade"), F.asc("doc_id"))
        ideal = (
            feats.filter(F.col("grade") > 0)
            .select("query_id", "doc_id", "grade")
            .withColumn("irank", F.row_number().over(iw))
            .filter(F.col("irank") <= kk)
            .groupBy("query_id")
            .agg(F.sum(F.col("grade") / F.log2(F.col("irank") + 1.0)).alias("idcg"))
        )
        per_q = dcg.join(ideal, ["query_id"], "left").select(
            "cand",
            "query_id",
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(0.0).alias("m"),
        )
    else:
        raise ValueError(f"unknown metric {metric!r} (expected 'map', 'p@K', or 'ndcg@K')")
    rows = per_q.groupBy("cand").agg(F.avg("m").alias("avg")).collect()
    by_cand = {row["cand"]: float(row["avg"]) for row in rows}
    return [by_cand.get(i, 0.0) for i in range(len(cands))]


def _line_search_steps(orig: float, n_max_iteration: float, step_base: float, step_scale: float):
    """Total-step offsets to try for one feature: geometric search in both
    directions plus the zero-out (CoorAscent.java:81 sign={1,-1,0},
    :125-166 step schedule)."""
    totals: list[float] = []
    for direction in (1.0, -1.0):
        step = 0.001 * direction
        if orig != 0.0 and abs(step) > 0.5 * abs(orig):
            step = step_base * abs(orig) * direction
        total = step
        for _ in range(n_max_iteration):
            totals.append(total)
            step *= step_scale
            total += step
    totals.append(-orig)  # sign 0: drop the feature
    return totals


def _l1_normalize(w: list[float]) -> list[float]:
    """L1-normalize (positive scale → rank- and metric-invariant,
    CoorAscent.java:392-404). Degenerate all-zero vector → reset to
    uniform 1/m, mirroring RankLib's normalize() branch."""
    s = sum(abs(x) for x in w)
    return [x / s for x in w] if s > 0 else [1.0 / len(w)] * len(w)


def coord_ascent_train(
    feats: DataFrame,
    feature_cols: list[str],
    metric: str = "map",
    k: int = 10,
    n_restart: int = 2,
    max_epochs: int = 10,
    n_max_iteration: int = N_MAX_ITERATION,
    step_base: float = STEP_BASE,
    step_scale: float = STEP_SCALE,
    tolerance: float = TOLERANCE,
    seed: int = 42,
) -> tuple[dict[str, float], float]:
    """Train L1-normalized linear fusion weights maximizing ``metric``.

    ``feats``: (query_id, doc_id, grade, <feature_cols>...). Returns
    ({feature_name: weight}, best_metric). Restarts differ by the seeded
    feature shuffle (RankLib inits every restart at uniform 1/m and only
    varies the coordinate order — CoorAscent.java:93-94, :112)."""
    m = len(feature_cols)
    if m == 0:
        raise ValueError("feature_cols must be non-empty")
    if n_restart < 1:
        raise ValueError(f"n_restart must be >= 1, got {n_restart}")
    rng = random.Random(seed)
    feats = feats.select("query_id", "doc_id", "grade", *feature_cols).persist()
    try:
        feats.count()  # materialize once; every evaluation reuses the cache
        global_best_w = None
        global_best = float("-inf")
        for _ in range(n_restart):
            w = [1.0 / m] * m
            best = _candidate_metrics(feats, feature_cols, [w], metric, k)[0]
            fails = 0
            for _ in range(max_epochs):
                epoch_start = best
                order = list(range(m))
                rng.shuffle(order)
                stop = False
                for fi in order:
                    orig = w[fi]
                    totals = _line_search_steps(orig, n_max_iteration, step_base, step_scale)
                    cands = []
                    for t in totals:
                        cw = list(w)
                        cw[fi] = orig + t
                        cands.append(cw)
                    scores = _candidate_metrics(feats, feature_cols, cands, metric, k)
                    bi = max(range(len(cands)), key=lambda i: scores[i])
                    if scores[bi] > best:
                        w = cands[bi]
                        w = _l1_normalize(w)
                        best = scores[bi]
                        fails = 0
                    else:
                        fails += 1
                        if m > 1 and fails >= m - 1:
                            stop = True
                            break
                        if m == 1:
                            stop = True
                            break
                if stop or best - epoch_start < tolerance:
                    break
            if best > global_best:
                global_best = best
                global_best_w = w
        return dict(zip(feature_cols, global_best_w)), global_best
    finally:
        feats.unpersist()
