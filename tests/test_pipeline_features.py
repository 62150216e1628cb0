"""S11 config-driven pipeline + §2.11 composite feature extractor /
linear fusion."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flexneuart_spark.operators.features import extract_features, linear_rerank
from flexneuart_spark.operators.pipeline import apply_pipeline


def test_pipeline_chain(spark):
    df = spark.createDataFrame(
        [("d1", "  Hello   WorldFoo  x1 "), ("d2", "")], ["doc_id", "content"]
    )
    out = apply_pipeline(
        df,
        [
            {"op": "truncate", "col": "content", "max_bytes": 64},
            {"op": "collapse_ws", "col": "content"},
            {"op": "sha256", "col": "content", "out": "sha"},
            {"op": "code_tokens", "col": "content", "out": "tokens"},
        ],
    ).collect()
    by = {r.doc_id: r for r in out}
    assert by["d1"].content == "Hello WorldFoo x1"
    assert by["d1"].sha == hashlib.sha256(b"Hello WorldFoo x1").hexdigest()
    # code tokenizer: camel split + lowercase + alnum split
    assert list(by["d1"].tokens) == ["hello", "world", "foo", "x1"]
    assert list(by["d2"].tokens) == []


def test_pipeline_validates_config(spark):
    df = spark.createDataFrame([("d1", "x")], ["doc_id", "content"])
    with pytest.raises(ValueError, match="unknown op"):
        apply_pipeline(df, [{"op": "nope", "col": "content"}])
    with pytest.raises(ValueError, match="not in"):
        apply_pipeline(df, [{"op": "lower", "col": "missing"}])


def test_features_and_linear_rerank(spark):
    docs = spark.createDataFrame(
        [("d1", ["a", "b", "b"]), ("d2", ["a", "c"]), ("d3", ["z"])],
        ["doc_id", "tokens"],
    )
    qs = spark.createDataFrame([("q1", ["a", "b"])], ["query_id", "tokens"])
    feats = extract_features(
        docs,
        qs,
        [
            {"name": "f_bm25", "feature": "bm25"},
            {"name": "f_tm", "feature": "term_match"},
        ],
    )
    pdf = feats.toPandas().set_index("doc_id")
    # d1 matches both terms, d2 one, d3 none (absent entirely)
    assert set(pdf.index) == {"d1", "d2"}
    assert pdf.loc["d1", "f_tm"] == pytest.approx(1.0)
    assert pdf.loc["d2", "f_tm"] == pytest.approx(0.5)
    assert pdf.loc["d2", "f_bm25"] > 0

    run = linear_rerank(feats, {"f_bm25": 1.0, "f_tm": 10.0}, k=2).collect()
    assert [r.doc_id for r in sorted(run, key=lambda r: r.rank)] == ["d1", "d2"]
    # weighted sum checked exactly
    want = pdf.loc["d1", "f_bm25"] + 10.0 * pdf.loc["d1", "f_tm"]
    got = [r.score for r in run if r.doc_id == "d1"][0]
    assert got == pytest.approx(want)


def test_pipeline_krovetz_and_main_text_stages(spark):
    from flexneuart_spark.operators.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [("<div>The tested documents were running tests happily ever after today</div>",)],
        ["content"],
    )
    out = apply_pipeline(
        df,
        [
            {"op": "html_main_text", "col": "content", "out": "main"},
            {"op": "krovetz", "col": "main", "out": "stemmed", "stop_words": ["the"]},
        ],
    ).collect()[0]
    assert "tested" in out.main and "<div>" not in out.main
    assert out.stemmed == "test document were run test happily ever after today"
