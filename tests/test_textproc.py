"""T3/T4/T6/T8 text-processing helpers + SDM combination."""

from __future__ import annotations

import pandas as pd
import pytest

from flexneuart_spark.functions.textproc import (
    handle_case_col,
    pretokenize_url_col,
    sentencize_col,
    strip_diacritics_ascii_col,
)


def test_pretokenize_url(spark):
    rows = [
        ("https://www.example.com/a/b?q=1", "example com a b q 1"),
        ("http://sub.host.org/path_x", "sub host org path x"),
        ("ftp://x.y/z", "x y z"),
        ("no-scheme.com/pg", "no scheme com pg"),
    ]
    df = spark.createDataFrame(pd.DataFrame({"u": [r[0] for r in rows]}))
    got = [r.t for r in df.select(pretokenize_url_col("u").alias("t")).collect()]
    assert got == [r[1] for r in rows]


def test_sentencize(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["One. Two! Three? Four", "Single"]}))
    got = [r.t for r in df.select(sentencize_col("s").alias("t")).collect()]
    assert got == [["One.", "Two!", "Three?", "Four"], ["Single"]]


def test_case_and_ascii(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["MiXeD Cäse"]}))
    got = df.select(
        handle_case_col("s").alias("lo"), strip_diacritics_ascii_col("s").alias("a")
    ).collect()[0]
    assert got.lo == "mixed cäse" and got.a == "MiXeD Cse"


def test_sdm_combines_components(spark, tmp_path_factory):
    from flexneuart_spark.fixtures import make_corpus, make_queries
    from flexneuart_spark.index.builder import build_index
    from flexneuart_spark.search.proximity import sdm_topk

    corpus = make_corpus(n_docs=150, seed=42)
    idx = str(tmp_path_factory.mktemp("sdm_idx"))
    t = build_index(spark, spark.createDataFrame(corpus), idx, num_shards=4, store_positions=True)
    queries = [(r.query_id, r.text) for r in make_queries(6, seed=45).itertuples(index=False)]
    run = sdm_topk(spark, t, queries, k=5)
    per_q = {}
    for r in run.collect():
        per_q.setdefault(r.query_id, []).append((r.rank, r.score))
    assert per_q, "sdm produced no results"
    for qid, rows in per_q.items():
        rows.sort()
        assert [x[0] for x in rows] == list(range(1, len(rows) + 1))
        scores = [x[1] for x in rows]
        assert all(scores[i] >= scores[i + 1] - 1e-12 for i in range(len(scores) - 1))
