"""Packed binary vectors (reference io/pack.py layout) and RankLib linear
model reading feeding the feature-fusion reranker."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flexneuart_spark.io.pack import (
    pack_dense_batch,
    pack_dense_col,
    pack_sparse_vect,
    unpack_dense,
    unpack_dense_col,
    unpack_sparse,
)
from flexneuart_spark.io.ranklib import (
    load_ranklib_linear,
    parse_ranklib_linear,
    weights_for_features,
)

FIXTURE = "tests/fixtures/ca_linear.model"


# --- byte-layout equality with the reference struct masks -------------------


def test_dense_layout_matches_reference_struct():
    # reference: struct.pack(f'<I{dim}f', 0, *row)  (io/pack.py:27-50)
    rows = [[1.5, -2.25, 3.125], [0.0, 7.0, -0.5]]
    got = pack_dense_batch(rows)
    for r, b in zip(rows, got):
        want = struct.pack("<I" + "f" * len(r), 0, *r)
        assert b == want


def test_sparse_layout_matches_reference_struct():
    # reference: struct.pack('<II' + 'If'*dim, 1, dim, *flat)  (io/pack.py:52-62)
    ids, vals = [3, 17, 250000], [0.5, -1.25, 9.0]
    flat = [x for p in zip(ids, vals) for x in p]
    want = struct.pack("<II" + "If" * 3, 1, 3, *flat)
    assert pack_sparse_vect(ids, vals) == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, width=32), min_size=1, max_size=64))
def test_dense_roundtrip(vec):
    b = pack_dense_batch([vec])[0]
    back = unpack_dense(b)
    assert np.array_equal(back, np.asarray(vec, dtype=np.float32))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**32 - 1), st.floats(-1e6, 1e6, width=32)),
        min_size=0,
        max_size=32,
        unique_by=lambda t: t[0],
    )
)
def test_sparse_roundtrip(pairs):
    ids = [p[0] for p in pairs]
    vals = [p[1] for p in pairs]
    back_ids, back_vals = unpack_sparse(pack_sparse_vect(ids, vals))
    assert back_ids.tolist() == ids
    assert np.array_equal(back_vals, np.asarray(vals, dtype=np.float32))


def test_unpack_tag_mismatch_raises():
    with pytest.raises(ValueError):
        unpack_dense(pack_sparse_vect([1], [1.0]))
    with pytest.raises(ValueError):
        unpack_sparse(pack_dense_batch([[1.0]])[0])


def test_spark_pack_unpack_columns(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").limit(50)
    packed = emb.select("vec_id", "embedding", pack_dense_col("embedding").alias("p"))
    both = packed.select("vec_id", "embedding", unpack_dense_col("p").alias("u")).collect()
    for r in both:
        assert r.u == r.embedding  # float32→float32 exact round trip


# --- RankLib linear model reader -------------------------------------------


def test_parse_ranklib_linear_fixture():
    w, intercept = load_ranklib_linear(FIXTURE)
    assert w == {1: 0.62, 2: 0.38} and intercept == 0.0
    named = weights_for_features(w, ["f_bm25", "f_tm"])
    assert named == {"f_bm25": 0.62, "f_tm": 0.38}


def test_parse_ranklib_intercept_and_errors():
    w, b = parse_ranklib_linear("## Linear Regression\n0:1.5 1:2.0\n")
    assert w == {1: 2.0} and b == 1.5
    with pytest.raises(ValueError):
        parse_ranklib_linear("## only comments\n")
    with pytest.raises(ValueError):
        parse_ranklib_linear("1:0.5 garbage\n")
    with pytest.raises(ValueError):
        weights_for_features({3: 1.0}, ["a", "b"])


def test_ranklib_model_drives_fusion(spark):
    # end-to-end: model file → named weights → linear_rerank
    from flexneuart_spark.operators.features import extract_features, linear_rerank
    from flexneuart_spark.functions.tokenize import whitespace_tokens_col

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(100)
    docs_tok = docs.select("doc_id", whitespace_tokens_col("text").alias("tokens"))
    q = spark.createDataFrame([("q1", "hash join"), ("q2", "scan filter")], ["query_id", "qtext"])
    q_tok = q.select("query_id", whitespace_tokens_col("qtext").alias("tokens"))
    config = [
        {"name": "f_bm25", "feature": "bm25"},
        {"name": "f_tm", "feature": "term_match"},
    ]
    feats = extract_features(docs_tok, q_tok, config)
    w, _ = load_ranklib_linear(FIXTURE)
    named = weights_for_features(w, [c["name"] for c in config])
    run = linear_rerank(feats, named, k=5).collect()
    assert len(run) > 0
    for r in run:
        assert r.rank <= 5 and r.score >= 0


# --- LambdaMART tree-ensemble evaluation (round-3) ---------------------------

TREE_FIXTURE = "tests/fixtures/lambdamart.model"


def _hand_score(f1, f2, f3):
    """Hand-computed reference walk of tests/fixtures/lambdamart.model
    (descend left iff value <= threshold; score = Σ weight·leaf)."""
    t1 = -2.0 if f1 <= 0.5 else (1.0 if f2 <= 3.0 else 4.0)
    t2 = (0.5 if f1 <= 1.5 else -0.5) if f3 <= 0.25 else 2.5
    return 0.1 * t1 + 0.1 * t2 + 0.05 * 1.0


def test_parse_and_eval_lambdamart_fixture():
    from flexneuart_spark.io.ranklib import load_ranklib_ensemble

    ens = load_ranklib_ensemble(TREE_FIXTURE)
    assert len(ens.trees) == 3 and ens.feature_ids == [1, 2, 3]
    # boundary rows included: f1 == 0.5 goes LEFT (<=), f3 == 0.25 goes LEFT
    rows = [(0.5, 0.0, 0.25), (0.6, 3.0, 0.3), (2.0, 4.0, 0.0), (0.0, 9.9, 9.9)]
    X = np.array(rows)
    got = ens.eval_matrix(X)
    want = np.array([_hand_score(*r) for r in rows])
    assert np.allclose(got, want), (got, want)


def test_parse_ensemble_errors():
    from flexneuart_spark.io.ranklib import parse_ranklib_ensemble

    with pytest.raises(ValueError, match="no <ensemble>"):
        parse_ranklib_ensemble("## Linear\n1:0.5 2:0.5")
    with pytest.raises(ValueError, match="empty"):
        parse_ranklib_ensemble("<ensemble></ensemble>")
    with pytest.raises(ValueError, match="malformed"):
        parse_ranklib_ensemble(
            '<ensemble><tree id="1" weight="1"><split>'
            "<feature>1</feature><threshold>0</threshold>"
            '<split pos="left"><output>1</output></split>'
            "</split></tree></ensemble>")


def test_ensemble_rerank_matches_hand_walk(spark):
    from flexneuart_spark.io.ranklib import load_ranklib_ensemble
    from flexneuart_spark.operators.features import ensemble_rerank

    ens = load_ranklib_ensemble(TREE_FIXTURE)
    rows = [
        ("q1", "d1", 0.5, 0.0, 0.25),
        ("q1", "d2", 0.6, 3.0, 0.30),
        ("q1", "d3", 2.0, 4.0, 0.00),
        ("q2", "d1", 0.0, 9.9, 9.90),
        ("q2", "d4", 2.0, 0.0, 0.50),
    ]
    feats = spark.createDataFrame(
        rows, "query_id string, doc_id string, f_bm25 double, f_tm double, f_m1 double")
    out = ensemble_rerank(feats, ens, ["f_bm25", "f_tm", "f_m1"], k=2)
    got = {(r.query_id, r.doc_id): (r.score, r.rank) for r in out.collect()}
    want_scores = {(q, d): _hand_score(f1, f2, f3) for q, d, f1, f2, f3 in rows}
    for key, (score, _) in got.items():
        assert abs(score - want_scores[key]) < 1e-12
    # top-2 per query by (score desc, doc_id desc)
    assert {d for q, d in got if q == "q1"} == {"d3", "d2"}
    assert {d for q, d in got if q == "q2"} == {"d1", "d4"}


def test_ensemble_rerank_feature_count_guard(spark):
    from flexneuart_spark.io.ranklib import load_ranklib_ensemble
    from flexneuart_spark.operators.features import ensemble_rerank

    ens = load_ranklib_ensemble(TREE_FIXTURE)
    feats = spark.createDataFrame(
        [("q", "d", 1.0)], "query_id string, doc_id string, f1 double")
    with pytest.raises(ValueError, match="feature id 3"):
        ensemble_rerank(feats, ens, ["f1"])
