"""Neural matching heads (``flexneuart_spark.neural``): hash-embedding
cross-engine twins, relational-vs-Arrow kernel agreement, registry /
serializer round-trip, trainable KNRM head, PPMI trained embeddings,
NeuralRanker rerank integration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flexneuart_spark.neural import load_model, model_registry, save_model
from flexneuart_spark.neural.biencoder import BiEncoder, biencoder_scores, pooled_np
from flexneuart_spark.neural.embeddings import (
    HASH_DIM,
    hash_embedding_col,
    hash_embedding_np,
    train_embeddings,
)
from flexneuart_spark.neural.drmm import (
    DRMM,
    NBINS,
    drmm_score_batch,
    histogram_features,
)
from flexneuart_spark.neural.drmm import score_col as drmm_score_col
from flexneuart_spark.neural.knrm import KNRM, kernel_features, knrm_score_batch, score_col
from flexneuart_spark.neural.late_interaction import MaxSim, maxsim_batch, maxsim_scores
from flexneuart_spark.neural.ranker import NeuralRanker

TERMS = ["hash", "join", "λ-calc", "ὕδωρ", "x", "", "0", "the"]


def test_hash_embedding_spark_vs_numpy(spark):
    df = spark.createDataFrame([(t,) for t in TERMS], ["term"])
    got = {
        r.term: np.array(r.emb)
        for r in df.withColumn("emb", hash_embedding_col("term")).collect()
    }
    want = hash_embedding_np(TERMS)
    for i, t in enumerate(TERMS):
        assert np.allclose(got[t], want[i], atol=1e-12), t
        assert abs(np.linalg.norm(got[t]) - 1.0) < 1e-9


def _toy(spark):
    docs = spark.createDataFrame(
        [
            ("d1", ["hash", "join", "hash"]),
            ("d2", ["join", "scan", "filter", "scan"]),
            ("d3", ["window", "agg"]),
            ("d4", ["hash"]),
        ],
        ["doc_id", "tokens"],
    )
    qs = spark.createDataFrame(
        [("q1", ["hash", "join"]), ("q2", ["scan", "scan", "agg"])],
        ["query_id", "tokens"],
    )
    return docs, qs


def test_maxsim_relational_vs_arrow_kernel(spark):
    docs, qs = _toy(spark)
    rel = {
        (r.query_id, r.doc_id): r.score
        for r in maxsim_scores(docs, qs).collect()
    }
    dd = {r.doc_id: list(r.tokens) for r in docs.collect()}
    for qid, qtoks in [("q1", ["hash", "join"]), ("q2", ["scan", "scan", "agg"])]:
        ids = sorted(dd)
        got = maxsim_batch([dd[d] for d in ids], sorted(set(qtoks)))
        for d, g in zip(ids, got):
            assert abs(rel[(qid, d)] - g) < 1e-9, (qid, d)


def test_knrm_relational_vs_arrow_kernel(spark):
    docs, qs = _toy(spark)
    w = [0.05 * (k + 1) for k in range(11)]
    phi = kernel_features(docs, qs)
    rel = {
        (r.query_id, r.doc_id): r.s
        for r in phi.select("query_id", "doc_id", score_col(w).alias("s")).collect()
    }
    dd = {r.doc_id: list(r.tokens) for r in docs.collect()}
    for qid, qtoks in [("q1", ["hash", "join"]), ("q2", ["scan", "scan", "agg"])]:
        uq, qtf = np.unique(np.asarray(qtoks, dtype=object), return_counts=True)
        ids = sorted(dd)
        got = knrm_score_batch([dd[d] for d in ids], list(uq), qtf.astype(float), w)
        for d, g in zip(ids, got):
            assert abs(rel[(qid, d)] - g) < 1e-7, (qid, d, rel[(qid, d)], g)


def test_drmm_relational_vs_arrow_kernel(spark):
    docs, qs = _toy(spark)
    w = [0.05 * (b + 1) for b in range(NBINS)]
    phi = histogram_features(docs, qs)
    rel = {
        (r.query_id, r.doc_id): r.s
        for r in phi.select(
            "query_id", "doc_id", drmm_score_col(w).alias("s")
        ).collect()
    }
    dd = {r.doc_id: list(r.tokens) for r in docs.collect()}
    for qid, qtoks in [("q1", ["hash", "join"]), ("q2", ["scan", "scan", "agg"])]:
        uq, qtf = np.unique(np.asarray(qtoks, dtype=object), return_counts=True)
        ids = sorted(dd)
        got = drmm_score_batch([dd[d] for d in ids], list(uq), qtf.astype(float), w)
        for d, g in zip(ids, got):
            assert abs(rel[(qid, d)] - g) < 1e-9, (qid, d)


def test_drmm_histogram_semantics(spark):
    """Counting semantics pinned to the reference bin rule
    (utils.py:79,97): an exact-match query term puts its doc-tf in the
    TOP bin; total histogram mass per (qterm, doc) is the doc length."""
    docs = spark.createDataFrame([("d1", ["hash", "hash", "join"])], ["doc_id", "tokens"])
    qs = spark.createDataFrame([("q1", ["hash"])], ["query_id", "tokens"])
    row = histogram_features(docs, qs).collect()[0]
    phis = np.array([row[f"phi{b}"] for b in range(NBINS)])
    # qtf=1 → phi_b = ln(h_b + 1e-5); invert
    hist = np.exp(phis) - 1e-5
    assert abs(hist[-1] - 2.0) < 1e-6  # exact match: tf("hash")=2 in top bin
    assert abs(hist.sum() - 3.0) < 1e-5  # mass = doc length


def test_drmm_training_recovers_from_adversarial_init(spark):
    """Same planted rule as the KNRM test — the positive doc repeats the
    query term — trained through the inherited convex fit_pairs."""
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(50)]
    rows_docs, rows_q, pos_neg = [], [], []
    for qi in range(30):
        qterm = vocab[int(rng.integers(0, 50))]
        filler = [vocab[int(rng.integers(0, 50))] for _ in range(6)]
        rows_q.append((f"q{qi}", [qterm]))
        rows_docs.append((f"q{qi}_pos", [qterm, qterm, qterm] + filler))
        rows_docs.append((f"q{qi}_neg", [qterm] + filler))
        pos_neg.append((f"q{qi}", f"q{qi}_pos", f"q{qi}_neg"))
    docs = spark.createDataFrame(rows_docs, ["doc_id", "tokens"])
    qs = spark.createDataFrame(rows_q, ["query_id", "tokens"])
    phi = histogram_features(docs, qs).toPandas()
    phi_map = {
        (r.query_id, r.doc_id): r[[f"phi{b}" for b in range(NBINS)]].to_numpy(float)
        for _, r in phi.iterrows()
    }
    P = np.array([phi_map[(q, p)] for q, p, _ in pos_neg])
    N = np.array([phi_map[(q, n)] for q, _, n in pos_neg])

    m = DRMM()
    m.w = np.zeros(NBINS)
    m.w[-1] = -1.0  # adversarial: prefer the NON-repeating doc
    acc0 = float(np.mean(m.score_features(P) > m.score_features(N)))
    trace = m.fit_pairs(P, N)
    acc1 = float(np.mean(m.score_features(P) > m.score_features(N)))
    assert acc0 < 0.2 and acc1 > 0.9, (acc0, acc1)
    assert trace[-1] < trace[0]


def test_registry_and_serializer_roundtrip(tmp_path):
    assert {"knrm", "maxsim", "biencoder", "cedr_drmm"} <= set(model_registry)
    m = KNRM()
    m.w = np.linspace(-1, 1, 11)
    m.b = 0.25
    p = str(tmp_path / "knrm.json")
    save_model(m, p)
    m2 = load_model(p)
    assert isinstance(m2, KNRM)
    phi = np.random.default_rng(0).standard_normal((5, 11))
    assert np.allclose(m.score_features(phi), m2.score_features(phi))
    # unknown model name rejected
    import json

    bad = dict(json.load(open(p)), model_name="nope")
    bp = str(tmp_path / "bad.json")
    json.dump(bad, open(bp, "w"))
    with pytest.raises(ValueError, match="unknown model"):
        load_model(bp)
    # DRMM round-trips through the same serializer
    dm = DRMM()
    dm.w = np.linspace(0, 1, NBINS)
    dp = str(tmp_path / "drmm.json")
    save_model(dm, dp)
    dm2 = load_model(dp)
    assert isinstance(dm2, DRMM)
    assert np.allclose(dm2.w, dm.w)


def test_knrm_training_recovers_from_adversarial_init(spark):
    """Planted rule: the positive doc repeats a query term (higher exact
    soft-TF); train from an ADVERSARIAL init (negative exact-match
    weight) and require pairwise accuracy to flip from ~0 to ~1."""
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(50)]
    rows_docs, rows_q, pos_neg = [], [], []
    for qi in range(30):
        qterm = vocab[int(rng.integers(0, 50))]
        filler = [vocab[int(rng.integers(0, 50))] for _ in range(6)]
        rows_q.append((f"q{qi}", [qterm]))
        rows_docs.append((f"q{qi}_pos", [qterm, qterm, qterm] + filler))
        rows_docs.append((f"q{qi}_neg", [qterm] + filler))
        pos_neg.append((f"q{qi}", f"q{qi}_pos", f"q{qi}_neg"))
    docs = spark.createDataFrame(rows_docs, ["doc_id", "tokens"])
    qs = spark.createDataFrame(rows_q, ["query_id", "tokens"])
    phi = kernel_features(docs, qs).toPandas()
    phi_map = {
        (r.query_id, r.doc_id): r[[f"phi{k}" for k in range(11)]].to_numpy(float)
        for _, r in phi.iterrows()
    }
    P = np.array([phi_map[(q, p)] for q, p, _ in pos_neg])
    N = np.array([phi_map[(q, n)] for q, _, n in pos_neg])

    m = KNRM()
    m.w = np.zeros(11)
    m.w[-1] = -1.0  # adversarial: prefer the NON-repeating doc
    acc0 = float(np.mean(m.score_features(P) > m.score_features(N)))
    trace = m.fit_pairs(P, N)
    acc1 = float(np.mean(m.score_features(P) > m.score_features(N)))
    assert acc0 < 0.2 and acc1 > 0.9, (acc0, acc1)
    assert trace[-1] < trace[0]


def test_biencoder_pooled_twin(spark):
    docs, qs = _toy(spark)
    rel = {
        (r.query_id, r.doc_id): r.score for r in biencoder_scores(docs, qs).collect()
    }
    dd = {r.doc_id: list(r.tokens) for r in docs.collect()}
    qq = {r.query_id: list(r.tokens) for r in qs.collect()}
    for (qid, did), s in rel.items():
        qv = pooled_np([qq[qid]])[0]
        dv = pooled_np([dd[did]])[0]
        assert abs(s - float(qv @ dv)) < 1e-9


def test_trained_embeddings_separate_cooccurrence_clusters(spark):
    """Docs alternate between an {a,b,c}-world and an {x,y,z}-world;
    PPMI+projection must place within-world terms closer."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, ["alpha", "beta", "gamma", "alpha", "beta"]))
        else:
            rows.append((i, ["xray", "yank", "zulu", "xray", "yank"]))
    docs = spark.createDataFrame(rows, ["doc_id", "tokens"])
    emb = train_embeddings(docs, dim=8, window=3, vocab_size=10, min_count=1)
    v = {r["term"]: np.array(r["vector"]) for _, r in emb.iterrows()}
    within = float(v["alpha"] @ v["beta"])
    across = float(v["alpha"] @ v["xray"])
    assert within > across + 0.3, (within, across)
    # determinism
    emb2 = train_embeddings(docs, dim=8, window=3, vocab_size=10, min_count=1)
    v2 = {r["term"]: np.array(r["vector"]) for _, r in emb2.iterrows()}
    assert np.allclose(v["alpha"], v2["alpha"])


def test_neural_ranker_rerank_and_mixing(spark):
    docs, qs = _toy(spark)
    run = spark.createDataFrame(
        [
            ("q1", "d3", 3.0, 1),
            ("q1", "d2", 2.0, 2),
            ("q1", "d1", 1.0, 3),
            ("q1", "d4", 0.5, 4),
        ],
        ["query_id", "doc_id", "score", "rank"],
    )
    out = NeuralRanker(MaxSim()).rerank(run, docs, qs, top_r=3).toPandas()
    assert set(out.columns) == {"query_id", "doc_id", "score", "rank"}
    assert sorted(out["rank"]) == [1, 2, 3, 4]
    by_rank = out.sort_values("rank")["doc_id"].tolist()
    # d1 contains both q1 terms (maxsim = 2.0 exact) — must outrank d3
    assert by_rank[0] == "d1"
    assert by_rank[3] == "d4"  # tail (rank>3) stays below reranked head

    # huge cand weight → original retrieval order preserved in the head
    out2 = (
        NeuralRanker(MaxSim(), cand_score_weight=1e6)
        .rerank(run, docs, qs, top_r=3)
        .toPandas()
        .sort_values("rank")["doc_id"]
        .tolist()
    )
    assert out2[:3] == ["d3", "d2", "d1"]

    # serialized-path constructor (ranker/neural.py:73-80 shape)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.json")
        save_model(MaxSim(), p)
        out3 = NeuralRanker(p).rerank(run, docs, qs, top_r=3).toPandas()
        assert out3.sort_values("rank")["doc_id"].tolist() == by_rank


def test_neural_ranker_dispatches_drmm_not_knrm(spark):
    """DRMM subclasses KNRM, so the ranker MUST type-dispatch DRMM first:
    its weights are histogram-bin weights. The reranked scores must equal
    drmm_score_batch, and differ from the KNRM kernel-pooled scores."""
    docs, qs = _toy(spark)
    run = spark.createDataFrame(
        [("q1", "d1", 1.0, 1), ("q1", "d2", 0.9, 2), ("q1", "d4", 0.8, 3)],
        ["query_id", "doc_id", "score", "rank"],
    )
    m = DRMM()
    m.w = np.linspace(1.0, 2.0, NBINS)  # distinct, non-degenerate weights
    m.b = 0.25
    got = {
        (r.query_id, r.doc_id): r.new_score
        for r in NeuralRanker(m).score_candidates(run, docs, qs, top_r=3).collect()
    }
    dd = {r.doc_id: r.tokens for r in docs.collect()}
    uq, qtf = np.unique(np.asarray(["hash", "join"], dtype=object), return_counts=True)
    ids = ["d1", "d2", "d4"]
    want_drmm = drmm_score_batch([dd[d] for d in ids], list(uq), qtf.astype(float), m.w, m.b)
    want_knrm = knrm_score_batch([dd[d] for d in ids], list(uq), qtf.astype(float), m.w, m.b)
    for d, wd, wk in zip(ids, want_drmm, want_knrm):
        assert got[("q1", d)] == pytest.approx(wd, rel=1e-12), d
        assert abs(wd - wk) > 1e-6, "test is vacuous: kernels agree on this input"


def test_feature_registry_neural_keys(spark):
    from flexneuart_spark.operators.features import extract_features

    docs, qs = _toy(spark)
    feats = extract_features(
        docs,
        qs,
        [
            {"name": "f_maxsim", "feature": "maxsim"},
            {"name": "f_knrm", "feature": "knrm"},
        ],
    ).toPandas()
    assert {"f_maxsim", "f_knrm"} <= set(feats.columns)
    assert len(feats) == 8  # 2 queries x 4 docs (maxsim scores all pairs)
