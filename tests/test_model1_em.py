"""IBM Model 1 EM trainer (operators/model1.model1_em_train).

Equivalence vs a brute-force pure-Python EM with identical semantics
(init uniform over support, NULL word, multiplicity-weighted posterior
counts), alignment sanity on the classic das-haus corpus, and
composition with the existing ``model1_scores`` operator.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from flexneuart_spark.operators.model1 import (
    NULL_TOKEN,
    model1_em_train,
    model1_scores,
)

PAIRS = [
    ("p1", "das haus", "the house"),
    ("p2", "das buch", "the book"),
    ("p3", "ein buch", "a book"),
    ("p4", "das haus ist klein", "the house is small"),
]


def _py_em(pairs, iterations, include_null=True):
    """Reference EM, O(pairs · |src|·|tgt|) nested loops."""
    toks = [
        (pid, s.split(), t.split()) for pid, s, t in pairs
    ]
    sup = defaultdict(set)
    for _, src, tgt in toks:
        srcw = src + ([NULL_TOKEN] if include_null else [])
        for s in srcw:
            for t in tgt:
                sup[s].add(t)
    model = {
        (s, t): 1.0 / len(ts) for s, ts in sup.items() for t in ts
    }
    for _ in range(iterations):
        cnt = defaultdict(float)
        tot = defaultdict(float)
        for _, src, tgt in toks:
            srcw = src + ([NULL_TOKEN] if include_null else [])
            scnt = defaultdict(int)
            for s in srcw:
                scnt[s] += 1
            tcnt = defaultdict(int)
            for t in tgt:
                tcnt[t] += 1
            for t, ct in tcnt.items():
                z = sum(cs * model[(s, t)] for s, cs in scnt.items())
                for s, cs in scnt.items():
                    d = ct * cs * model[(s, t)] / z
                    cnt[(s, t)] += d
                    tot[s] += d
        model = {(s, t): c / tot[s] for (s, t), c in cnt.items()}
    return model


def _spark_pairs(spark, pairs):
    return spark.createDataFrame(
        [(pid, s.split(), t.split()) for pid, s, t in pairs],
        "pair_id string, src_tokens array<string>, tgt_tokens array<string>",
    )


@pytest.mark.parametrize("iters", [1, 3])
def test_em_matches_reference(spark, iters):
    got = {
        (r.s_term, r.t_term): r.p
        for r in model1_em_train(_spark_pairs(spark, PAIRS), iterations=iters).collect()
    }
    want = _py_em(PAIRS, iters)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_em_converges_to_alignment(spark):
    """After a few iterations the classic corpus disambiguates:
    T(the|das) dominates T(house|das), and T(book|buch) dominates."""
    m = {
        (r.s_term, r.t_term): r.p
        for r in model1_em_train(_spark_pairs(spark, PAIRS), iterations=6).collect()
    }
    assert m[("das", "the")] > m[("das", "house")]
    assert m[("buch", "book")] > m[("buch", "the")]
    assert m[("haus", "house")] > m[("haus", "the")]
    # rows normalize: Σ_t T(t|s) = 1
    rows = defaultdict(float)
    for (s, _), p in m.items():
        rows[s] += p
    for s, tot in rows.items():
        assert tot == pytest.approx(1.0, abs=1e-9), s


def test_em_no_null_support_only(spark):
    m = {
        (r.s_term, r.t_term): r.p
        for r in model1_em_train(
            _spark_pairs(spark, PAIRS), iterations=2, include_null=False
        ).collect()
    }
    assert all(s != NULL_TOKEN for s, _ in m)
    want = _py_em(PAIRS, 2, include_null=False)
    for k, v in want.items():
        assert m[k] == pytest.approx(v, abs=1e-9), k


def test_trained_table_feeds_scorer(spark):
    """End-to-end C7: train → rename to the scorer's (w_term, q_term, p)
    shape → score; docs sharing translated terms score higher."""
    from pyspark.sql import functions as F

    model = model1_em_train(_spark_pairs(spark, PAIRS), iterations=4)
    tran = model.filter(F.col("s_term") != NULL_TOKEN).select(
        F.col("s_term").alias("w_term"), F.col("t_term").alias("q_term"), "p"
    )
    docs = spark.createDataFrame(
        [("d1", ["das", "haus"]), ("d2", ["ein", "buch"])],
        "doc_id string, tokens array<string>",
    )
    qs = spark.createDataFrame(
        [("q1", ["the", "house"])], "query_id string, tokens array<string>"
    )
    got = {
        r.doc_id: r.score
        for r in model1_scores(docs, qs, tran, min_prob=1e-6).collect()
    }
    assert got["d1"] > got.get("d2", float("-inf"))


def test_em_plan_has_no_window(spark):
    """De-skew guarantee: the M-step normalizes via groupBy+join, never a
    window over partitionBy(s_term) (which would funnel a hot source
    term's whole translation distribution into one task). Checked on the
    un-checkpointed normalization plan — ``localCheckpoint`` in the
    trainer would otherwise truncate the lineage and hide a window."""
    from pyspark.sql import functions as F

    from flexneuart_spark.operators.model1 import _normalize_per_source

    counts = spark.createDataFrame(
        [("s1", "t1", 2.0), ("s1", "t2", 1.0), ("s2", "t1", 3.0)],
        "s_term string, t_term string, c double",
    )
    norm = _normalize_per_source(counts, "c")
    plan = norm._jdf.queryExecution().toString()
    assert "Window" not in plan, plan
    got = {(r.s_term, r.t_term): r.p for r in norm.collect()}
    assert got[("s1", "t1")] == pytest.approx(2 / 3)
    assert got[("s1", "t2")] == pytest.approx(1 / 3)
    assert got[("s2", "t1")] == pytest.approx(1.0)
