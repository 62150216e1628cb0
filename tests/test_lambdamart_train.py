"""LambdaMART trainer (operators/lambdamart.lambdamart_train).

Four gates:
1. equivalence vs a brute-force pure-Python LambdaMART with identical
   semantics (same edges in, pairwise ρ·|ΔNDCG| lambdas, variance-gain
   leaf-wise histogram trees, Σλ/Σw Newton leaves);
2. ranking quality: the trained ensemble beats every single raw feature
   on NDCG@10 for a nonlinear relevance function (the case a linear
   fusion cannot represent);
3. RankLib XML round-trip is bit-exact through the existing parser;
4. the generated DuckDB SQL twin of the TRAINED model agrees with
   eval_matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flexneuart_spark.io.ranklib import parse_ranklib_ensemble, sql_ensemble_score_expr
from flexneuart_spark.operators.lambdamart import (
    feature_bin_edges,
    lambdamart_train,
    write_ranklib_ensemble_text,
)

RNG = np.random.default_rng(7)


def _make_ltr(n_queries=6, docs_per_q=14):
    rows = []
    for qi in range(n_queries):
        for di in range(docs_per_q):
            f1, f2 = RNG.uniform(size=2)
            f3 = RNG.uniform()
            # nonlinear relevance: BOTH f1 and f2 high (AND), f3 is noise
            grade = 2 if (f1 > 0.6 and f2 > 0.6) else (1 if f1 + f2 > 1.3 else 0)
            rows.append((f"q{qi}", f"d{qi}_{di:02d}", float(grade), f1, f2, f3))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "grade", "f1", "f2", "f3"])


FEATS = ["f1", "f2", "f3"]


# ---------------------------------------------------------------------------
# brute-force mirror (nested loops, no Spark)
# ---------------------------------------------------------------------------

def _py_lambdas(df, scores, k):
    lam = np.zeros(len(df))
    w = np.zeros(len(df))
    for q in df["query_id"].unique():
        idx = np.flatnonzero((df["query_id"] == q).to_numpy())
        sub = df.iloc[idx]
        order = np.lexsort((sub["doc_id"].to_numpy(), scores[idx]))[::-1]
        ridx = idx[order]
        g = df["grade"].to_numpy()[ridx]
        s = scores[ridx]
        n = len(ridx)
        gain = 2.0**g - 1.0
        disc = np.array([1.0 / np.log2(r + 1) if r <= k else 0.0 for r in range(1, n + 1)])
        ideal = np.sort(gain)[::-1]
        idcg = sum(ideal[i] / np.log2(i + 2) for i in range(min(n, k)))
        if idcg <= 0:
            continue
        for i in range(n):
            for j in range(n):
                if g[i] > g[j]:
                    rho = 1.0 / (1.0 + np.exp(s[i] - s[j]))
                    delta = abs((gain[i] - gain[j]) * (disc[i] - disc[j])) / idcg
                    lam[ridx[i]] += rho * delta
                    lam[ridx[j]] -= rho * delta
                    w[ridx[i]] += rho * (1 - rho) * delta
                    w[ridx[j]] += rho * (1 - rho) * delta
    return lam, w


def _py_best_split(bins, lam, rows, m, min_leaf):
    best = None
    for f in range(m):
        bvals = sorted(set(bins[f][rows]))
        tot_l, tot_n = lam[rows].sum(), len(rows)
        parent = tot_l * tot_l / tot_n
        for b in bvals[:-1]:
            mask = bins[f][rows] <= b
            cn, nr = int(mask.sum()), int((~mask).sum())
            if cn < min_leaf or nr < min_leaf:
                continue
            cl = lam[rows][mask].sum()
            gain = cl * cl / cn + (tot_l - cl) ** 2 / nr - parent
            if best is None or gain > best[0]:
                best = (gain, f, b)
    return best


def _py_train(df, edges, n_trees, num_leaves, lr, k, min_leaf=1):
    m = len(FEATS)
    bins = {
        i: np.searchsorted(edges[i], df[c].to_numpy(np.float64), side="left")
        for i, c in enumerate(FEATS)
    }
    scores = np.zeros(len(df))
    for _ in range(n_trees):
        lam, w = _py_lambdas(df, scores, k)
        leaf = np.zeros(len(df), dtype=int)
        nodes = [{"leaf": True}]
        frontier = {0: _py_best_split(bins, lam, np.flatnonzero(leaf == 0), m, min_leaf)}
        n_leaves = 1
        while n_leaves < num_leaves:
            live = {l: s for l, s in frontier.items() if s is not None}
            if not live:
                break
            L = max(live, key=lambda l: live[l][0])
            gain, f, b = live[L]
            if gain <= 0:
                break
            li, ri = len(nodes), len(nodes) + 1
            nodes[L] = {"leaf": False}
            nodes.append({"leaf": True})
            nodes.append({"leaf": True})
            sel = leaf == L
            go_l = sel & (bins[f] <= b)
            leaf[go_l] = li
            leaf[sel & ~go_l] = ri
            n_left, n_right = int(go_l.sum()), int((sel & ~go_l).sum())
            small, big = (li, ri) if n_left <= n_right else (ri, li)
            del frontier[L]
            frontier[small] = _py_best_split(bins, lam, np.flatnonzero(leaf == small), m, min_leaf)
            frontier[big] = _py_best_split(bins, lam, np.flatnonzero(leaf == big), m, min_leaf)
            n_leaves += 1
        gamma = {}
        for L in np.unique(leaf):
            sw = w[leaf == L].sum()
            gamma[L] = lam[leaf == L].sum() / sw if sw > 0 else 0.0
        scores = scores + lr * np.array([gamma[L] for L in leaf])
    return scores


def _ndcg10(df, scores):
    vals = []
    for q in df["query_id"].unique():
        idx = np.flatnonzero((df["query_id"] == q).to_numpy())
        sub = df.iloc[idx]
        order = np.lexsort((sub["doc_id"].to_numpy(), scores[idx]))[::-1]
        g = df["grade"].to_numpy()[idx[order]]
        gain = 2.0**g - 1.0
        dcg = sum(gain[i] / np.log2(i + 2) for i in range(min(len(g), 10)))
        ideal = np.sort(gain)[::-1]
        idcg = sum(ideal[i] / np.log2(i + 2) for i in range(min(len(g), 10)))
        if idcg > 0:
            vals.append(dcg / idcg)
    return float(np.mean(vals))


@pytest.fixture(scope="module")
def ltr(spark):
    pdf = _make_ltr()
    return pdf, spark.createDataFrame(pdf)


def test_matches_brute_force(spark, ltr):
    pdf, sdf = ltr
    edges = feature_bin_edges(sdf, FEATS, num_bins=16)
    ens = lambdamart_train(
        sdf, FEATS, n_trees=4, num_leaves=5, learning_rate=0.1, num_bins=16, k=10
    )
    want = _py_train(pdf, edges, n_trees=4, num_leaves=5, lr=0.1, k=10)
    X = pdf[FEATS].to_numpy(np.float64)
    got = ens.eval_matrix(X)
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12), np.abs(got - want).max()


def test_beats_single_features(spark, ltr):
    pdf, sdf = ltr
    ens = lambdamart_train(
        sdf, FEATS, n_trees=15, num_leaves=6, learning_rate=0.2, num_bins=16, k=10
    )
    X = pdf[FEATS].to_numpy(np.float64)
    trained = _ndcg10(pdf, ens.eval_matrix(X))
    singles = [_ndcg10(pdf, pdf[c].to_numpy(np.float64)) for c in FEATS]
    assert trained > max(singles) + 0.02, (trained, singles)


def test_xml_roundtrip_bit_exact(spark, ltr):
    pdf, sdf = ltr
    ens = lambdamart_train(sdf, FEATS, n_trees=3, num_leaves=4, num_bins=8, k=10)
    text = write_ranklib_ensemble_text(ens)
    back = parse_ranklib_ensemble(text)
    X = pdf[FEATS].to_numpy(np.float64)
    assert np.array_equal(ens.eval_matrix(X), back.eval_matrix(X))
    for (w1, n1), (w2, n2) in zip(ens.trees, back.trees):
        assert w1 == w2
        for key in ("feat", "thr", "left", "right", "out"):
            assert np.array_equal(n1[key], n2[key]), key


def test_trained_model_sql_twin(spark, ltr):
    import duckdb

    pdf, sdf = ltr
    ens = lambdamart_train(sdf, FEATS, n_trees=3, num_leaves=4, num_bins=8, k=10)
    expr = sql_ensemble_score_expr(ens, FEATS)
    con = duckdb.connect()
    con.register("ltr", pdf)
    got = con.execute(f"SELECT {expr} AS s FROM ltr ORDER BY query_id, doc_id").fetchnumpy()["s"]
    srt = pdf.sort_values(["query_id", "doc_id"])
    want = ens.eval_matrix(srt[FEATS].to_numpy(np.float64))
    assert np.allclose(got, want, rtol=1e-12, atol=1e-15)
