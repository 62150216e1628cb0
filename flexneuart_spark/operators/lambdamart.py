"""LambdaMART training (SURVEY.md §2.11 — the tree half of RankLib's
trainer, complementing :mod:`coord_ascent` for the linear half).

Reference: the vendored RankLib trainer
``java/lemur-code-r2792-RankLib-trunk/src/ciir/umass/edu/learning/tree/
LambdaMART.java`` (pseudo-responses :104-150 — pairwise ρ·|ΔNDCG|
lambdas with Newton weights; regression-tree fit on the lambdas via
``RegressionTree.java``/``FeatureHistogram.java`` — variance-gain
splits over feature thresholds, leaf-wise growth to ``nTreeLeaves``;
leaf outputs :172-178 — Σλ/Σw Newton step, scaled by ``learningRate``).
Models are saved in the same ``<ensemble>`` XML that
``io/ranklib.py::parse_ranklib_ensemble`` already reads, so a trained
model round-trips through the existing oracle-checked evaluator
(``TreeEnsemble.eval_matrix`` / ``sql_ensemble_score_expr``).

Spark-first restatement (the XGBoost/LightGBM histogram recipe, which
is what makes GBDT training distributable at 100 TB):

- **Binning once.** Each feature is quantile-binned up front (exact
  ``percentile``; ≤ ``num_bins`` edges per feature live on the driver —
  m·bins floats, independent of corpus size). Split search then only
  ever touches integer bin ids; saved thresholds are the RAW edge
  values, so ``bin(v) <= t ⇔ v <= edges[t]`` keeps the trained model
  exact on unbinned features.
- **Lambdas are per-query local.** ``applyInPandas`` over query groups:
  the pairwise ρ·|ΔNDCG| loop is vectorized numpy over one candidate
  list at a time — O(list²) inside a group, never a cross-query
  shuffle. List length is the run depth (k·shards at most), the same
  bound the reference's RankList carries.
- **Split finding is one aggregation per split.** Histograms are
  ``groupBy(leaf, feature, bin) → (Σλ, Σw, n)`` — map-side combined,
  driver result ≤ leaves·m·bins rows. Leaf-wise growth re-scans only
  the SMALLER child per split (the sibling histogram is parent − child,
  LightGBM's subtraction trick), so a tree costs ≤ (num_leaves−1)
  filtered aggregations over the persisted binned frame.
- **Driver holds models, never data.** The only driver-side state is
  bin edges, histograms, and the tree node lists; per-round scores are
  a ``localCheckpoint``-ed (query, doc, score) column to truncate
  lineage, exactly like ``model1_em_train``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io.ranklib import TreeEnsemble

# LambdaMART.java:56-66 defaults (nTrees=1000 cut to a bench-honest 50)
N_TREES = 50
N_LEAVES = 10
LEARNING_RATE = 0.1
NUM_BINS = 64
MIN_LEAF = 1


# ---------------------------------------------------------------------------
# binning
# ---------------------------------------------------------------------------

def feature_bin_edges(
    feats: DataFrame, feature_cols: list[str], num_bins: int = NUM_BINS
) -> list[np.ndarray]:
    """Per-feature ascending threshold candidates (exact quantiles,
    deduplicated). Driver-held: m·num_bins floats total."""
    probs = [i / num_bins for i in range(1, num_bins)]
    row = feats.select(
        *[
            F.percentile(F.col(c), F.array(*[F.lit(p) for p in probs])).alias(c)
            for c in feature_cols
        ]
    ).collect()[0]
    return [np.unique(np.asarray(row[c], dtype=np.float64)) for c in feature_cols]


def _bin_expr(col: str, edges: np.ndarray):
    """bin(v) = #edges strictly below v's bucket = searchsorted(edges, v,
    'left'), so ``bin <= t ⇔ v <= edges[t]``. Built-in comparisons (≤64
    per feature, folded by codegen), no Python in the row path."""
    e = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        e = F.when(F.col(col) <= float(edges[i]), F.lit(i)).otherwise(e)
    return e.cast("int")


# ---------------------------------------------------------------------------
# pseudo-responses (LambdaMART.java:104-150)
# ---------------------------------------------------------------------------

_LAMBDA_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("lam", T.DoubleType()),
        T.StructField("w", T.DoubleType()),
    ]
)


def _lambda_group(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """λ/w for ONE query's candidate list (vectorized pairwise)."""
    # rank by current score desc, doc_id desc (the repo-wide tie rule):
    # ascending lexsort on (score, doc_id), reversed
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["score"].to_numpy()))[::-1]
    pdf = pdf.iloc[order].reset_index(drop=True)
    g = pdf["grade"].to_numpy(dtype=np.float64)
    s = pdf["score"].to_numpy(dtype=np.float64)
    n = len(pdf)
    gain = np.power(2.0, g) - 1.0
    ranks = np.arange(1, n + 1, dtype=np.float64)
    disc = np.where(ranks <= k, 1.0 / np.log2(ranks + 1.0), 0.0)
    ideal = np.sort(gain)[::-1]
    idcg = float(np.sum(ideal[: min(n, k)] / np.log2(np.arange(2, min(n, k) + 2))))
    lam = np.zeros(n)
    w = np.zeros(n)
    if idcg > 0:
        better = g[:, None] > g[None, :]  # pair (i, j): i more relevant
        rho = 1.0 / (1.0 + np.exp(s[:, None] - s[None, :]))
        delta = (
            np.abs((gain[:, None] - gain[None, :]) * (disc[:, None] - disc[None, :]))
            / idcg
        )
        contrib = np.where(better, rho * delta, 0.0)
        hess = np.where(better, rho * (1.0 - rho) * delta, 0.0)
        lam = contrib.sum(axis=1) - contrib.sum(axis=0)
        w = hess.sum(axis=1) + hess.sum(axis=0)
    return pd.DataFrame(
        {"query_id": pdf["query_id"], "doc_id": pdf["doc_id"], "lam": lam, "w": w}
    )


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

def lambdamart_train(
    feats: DataFrame,
    feature_cols: list[str],
    n_trees: int = N_TREES,
    num_leaves: int = N_LEAVES,
    learning_rate: float = LEARNING_RATE,
    num_bins: int = NUM_BINS,
    k: int = 10,
    min_leaf: int = MIN_LEAF,
) -> TreeEnsemble:
    """Train a LambdaMART ensemble over (query_id, doc_id, grade,
    ``feature_cols``...) rows; returns a :class:`TreeEnsemble` whose
    ``eval_matrix``/XML round-trip reproduce the training-time scores
    exactly (same thresholds, same leaf outputs, same per-tree weight =
    ``learning_rate``)."""
    m = len(feature_cols)
    edges = feature_bin_edges(feats, feature_cols, num_bins)
    binned = feats.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("grade").cast("double").alias("grade"),
        *[_bin_expr(c, edges[i]).alias(f"b{i}") for i, c in enumerate(feature_cols)],
    ).persist()
    binned.count()
    try:
        scores = binned.select("query_id", "doc_id", F.lit(0.0).alias("score"))
        scores = scores.localCheckpoint()
        trees: list[tuple[float, dict]] = []
        for _ in range(n_trees):
            lam = (
                binned.select("query_id", "doc_id", "grade")
                .join(scores, ["query_id", "doc_id"])
                .groupBy("query_id")
                .applyInPandas(lambda pdf: _lambda_group(pdf, k), _LAMBDA_SCHEMA)
            )
            work = binned.join(lam, ["query_id", "doc_id"]).persist()
            try:
                nodes, leaf_of = _fit_tree(work, m, num_leaves, min_leaf)
                gamma = _leaf_outputs(leaf_of)
                _attach_outputs(nodes, gamma, edges)
                trees.append((learning_rate, _nodes_to_arrays(nodes)))
                pred = _ensemble_delta_expr(nodes, gamma)
                scores = (
                    leaf_of.select("query_id", "doc_id", "leaf")
                    .join(scores, ["query_id", "doc_id"])
                    .select(
                        "query_id",
                        "doc_id",
                        (F.col("score") + F.lit(learning_rate) * pred).alias("score"),
                    )
                    .localCheckpoint()
                )
            finally:
                work.unpersist()
        return TreeEnsemble(trees)
    finally:
        binned.unpersist()


def _hist(df: DataFrame, m: int, leaf_filter=None) -> dict:
    """(leaf, feature, bin) → [Σλ, Σw, n] via ONE exploded aggregation."""
    d = df if leaf_filter is None else df.where(F.col("leaf").isin(leaf_filter))
    e = d.select(
        "leaf",
        "lam",
        "w",
        F.posexplode(F.array(*[F.col(f"b{i}") for i in range(m)])).alias("f", "bin"),
    )
    rows = (
        e.groupBy("leaf", "f", "bin")
        .agg(F.sum("lam").alias("sl"), F.sum("w").alias("sw"), F.count("*").alias("n"))
        .collect()
    )
    out: dict = {}
    for r in rows:
        out[(r.leaf, r.f, r.bin)] = [r.sl, r.sw, r.n]
    return out


def _best_split(hist: dict, leaf: int, m: int, min_leaf: int):
    """Max variance-gain split for one leaf from its histogram
    (FeatureHistogram.java: S²/n left + right vs parent)."""
    best = None
    for f in range(m):
        items = sorted(
            ((b, v) for (l, ff, b), v in hist.items() if l == leaf and ff == f),
            key=lambda x: x[0],
        )
        if len(items) < 2:
            continue
        tot_l, tot_n = sum(v[0] for _, v in items), sum(v[2] for _, v in items)
        parent = tot_l * tot_l / tot_n
        cl = cn = 0.0
        for b, v in items[:-1]:
            cl += v[0]
            cn += v[2]
            nr = tot_n - cn
            if cn < min_leaf or nr < min_leaf:
                continue
            gain = cl * cl / cn + (tot_l - cl) ** 2 / nr - parent
            if best is None or gain > best[0]:
                best = (gain, f, b, cn, nr)
    return best


def _fit_tree(work: DataFrame, m: int, num_leaves: int, min_leaf: int):
    """Leaf-wise regression tree over the binned λ frame. Returns the
    node list [[feat0, thr_bin, left, right] | leaf] and the DataFrame
    with a ``leaf`` column assigning every row its leaf node id."""
    work = work.withColumn("leaf", F.lit(0))
    nodes: list = [{"leaf": True}]
    hist = _hist(work, m)
    frontier = {0: _best_split(hist, 0, m, min_leaf)}
    n_leaves = 1
    while n_leaves < num_leaves:
        live = {l: s for l, s in frontier.items() if s is not None}
        if not live:
            break
        leaf = max(live, key=lambda l: live[l][0])
        gain, f, b, n_left, n_right = live[leaf]
        if gain <= 0:
            break
        li, ri = len(nodes), len(nodes) + 1
        nodes[leaf] = {"leaf": False, "f": f, "bin": b, "l": li, "r": ri}
        nodes.append({"leaf": True})
        nodes.append({"leaf": True})
        work = work.withColumn(
            "leaf",
            F.when(
                (F.col("leaf") == leaf) & (F.col(f"b{f}") <= b), F.lit(li)
            ).when(F.col("leaf") == leaf, F.lit(ri)).otherwise(F.col("leaf")),
        )
        # scan only the smaller child; sibling histogram = parent − child
        small, big = (li, ri) if n_left <= n_right else (ri, li)
        child = _hist(work, m, leaf_filter=[small])
        for (l, ff, bb), v in list(hist.items()):
            if l != leaf:
                continue
            cv = child.get((small, ff, bb), [0.0, 0.0, 0])
            big_v = [v[0] - cv[0], v[1] - cv[1], v[2] - cv[2]]
            if big_v[2] > 0:
                hist[(big, ff, bb)] = big_v
            del hist[(l, ff, bb)]
        hist.update(child)
        del frontier[leaf]
        frontier[small] = _best_split(hist, small, m, min_leaf)
        frontier[big] = _best_split(hist, big, m, min_leaf)
        n_leaves += 1
    return nodes, work


def _leaf_outputs(leaf_of: DataFrame) -> dict[int, float]:
    """Newton leaf values γ = Σλ / Σw (LambdaMART.java:172-178)."""
    rows = leaf_of.groupBy("leaf").agg(F.sum("lam").alias("sl"), F.sum("w").alias("sw")).collect()
    return {
        r.leaf: (r.sl / r.sw if r.sw and r.sw > 0 else 0.0)
        for r in rows
    }


def _attach_outputs(nodes: list, gamma: dict[int, float], edges: list[np.ndarray]):
    for i, nd in enumerate(nodes):
        if nd["leaf"]:
            nd["out"] = float(gamma.get(i, 0.0))
        else:
            nd["thr"] = float(edges[nd["f"]][nd["bin"]])


def _nodes_to_arrays(nodes: list) -> dict:
    feat = np.full(len(nodes), -1, dtype=np.int64)
    thr = np.zeros(len(nodes))
    left = np.full(len(nodes), -1, dtype=np.int64)
    right = np.full(len(nodes), -1, dtype=np.int64)
    out = np.zeros(len(nodes))
    for i, nd in enumerate(nodes):
        if nd["leaf"]:
            out[i] = nd["out"]
        else:
            feat[i] = nd["f"] + 1  # RankLib ids are 1-based
            thr[i] = nd["thr"]
            left[i] = nd["l"]
            right[i] = nd["r"]
    return {"feat": feat, "thr": thr, "left": left, "right": right, "out": out}


def _ensemble_delta_expr(nodes: list, gamma: dict[int, float]):
    """Per-row tree output as a ≤num_leaves CASE over the leaf column —
    cheaper than re-walking splits, and exactly the value the saved tree
    produces (leaf ids were assigned by the identical bin comparisons)."""
    expr = F.lit(0.0)
    for i, nd in enumerate(nodes):
        if nd["leaf"]:
            expr = F.when(F.col("leaf") == i, F.lit(float(gamma.get(i, 0.0)))).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# RankLib XML writer (inverse of io/ranklib.py::parse_ranklib_ensemble)
# ---------------------------------------------------------------------------

def write_ranklib_ensemble_text(ensemble: TreeEnsemble) -> str:
    """Serialize to RankLib's LambdaMART save format (##-header +
    <ensemble> XML; Ensemble.java:87-108). ``repr(float)`` literals keep
    the round-trip bit-exact."""

    def walk(nd, i: int, depth: int) -> str:
        pad = "\t" * depth
        f = int(nd["feat"][i])
        if f < 0:
            return f"{pad}<output> {float(nd['out'][i])!r} </output>\n"
        body = (
            f"{pad}<feature> {f} </feature>\n"
            f"{pad}<threshold> {float(nd['thr'][i])!r} </threshold>\n"
            f"{pad}<split pos=\"left\">\n"
            + walk(nd, int(nd["left"][i]), depth + 1)
            + f"{pad}</split>\n"
            f"{pad}<split pos=\"right\">\n"
            + walk(nd, int(nd["right"][i]), depth + 1)
            + f"{pad}</split>\n"
        )
        return body

    parts = ["## LambdaMART\n<ensemble>\n"]
    for tid, (w, nd) in enumerate(ensemble.trees, 1):
        parts.append(f'\t<tree id="{tid}" weight="{float(w)!r}">\n\t\t<split>\n')
        parts.append(walk(nd, 0, 3))
        parts.append("\t\t</split>\n\t</tree>\n")
    parts.append("</ensemble>\n")
    return "".join(parts)


def write_ranklib_ensemble(ensemble: TreeEnsemble, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(write_ranklib_ensemble_text(ensemble))
