"""RM3 pseudo-relevance feedback (FeatExtractorRM3Similarity.java) vs a
pure-Python trace of the Java code — BOTH modes: the paper-correct
accumulate-over-top-docs relevance model (default) and the reference's
literal behavior where ``topDocTerms.clear()`` inside the per-doc loop
(FeatExtractorRM3Similarity.java:126-136) leaves only the LAST top doc's
terms in the model."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from flexneuart_spark.search.rm3 import rm3_rescore

K1, B = 1.2, 0.75

DOCS = [
    (1, "hash join build probe side hash"),
    (2, "sort merge join shuffle exchange"),
    (3, "window agg row frame bound"),
    (4, "scan filter pushdown parquet scan scan"),
    (5, "hash agg partial final merge"),
    (6, "broadcast join small side hash hash join"),
    (7, "filter value table scan predicate"),
    (8, "row batch vector column row"),
    (9, "join order optimizer cost"),
    (10, "agg window partition order row row"),
]
QUERIES = [
    ("q1", "hash join"),
    ("q2", "row window"),
    ("q3", "scan filter oovterm"),
    ("q4", "oovonly zzz"),  # no candidates at all
]
PARAMS = dict(cand_qty=6, top_doc_qty=3, top_term_qty=5, orig_weight=0.4)


def _py_rm3(docs, queries, *, cand_qty, top_doc_qty, top_term_qty, orig_weight, accumulate):
    """Literal trace of FeatExtractorRM3Similarity.getFeaturesMappedIds."""
    toks = {d: t.split() for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(term for t in toks.values() for term in set(t))

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    def term_score(did, t):  # BM25SimilarityLucene.getDocTermScore
        tf = toks[did].count(t)
        return idf(t) * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * len(toks[did]) / avgdl))

    out = {}
    for qid, qtext in queries:
        qtoks = qtext.split()
        qtf = Counter(qtoks)
        qn = sum(idf(t) for t in set(qtoks) if t in df)
        nsc = {}
        for did in toks:
            s = sum(c * term_score(did, t) for t, c in qtf.items() if t in toks[did])
            if s > 0:
                nsc[did] = s / qn if qn > 0 else s
        cand = sorted(nsc, key=lambda d: (round(nsc[d], 4), d), reverse=True)[:cand_qty]
        if not cand:
            continue
        topdocs = cand[:top_doc_qty]
        dn = sum(nsc[d] for d in topdocs)
        model_docs = topdocs if accumulate else [topdocs[-1]]
        relw = Counter()
        for did in model_docs:
            for t in set(toks[did]):
                relw[t] += nsc[did] / max(dn, 1e-9) * term_score(did, t)
        top_terms = sorted(relw, key=lambda t: (-round(relw[t], 6), t))[:top_term_qty]
        tn = sum(relw[t] for t in top_terms)
        tweight = {t: relw[t] / max(tn, 1e-9) for t in top_terms}
        for did in cand:
            rm1 = sum(w for t, w in tweight.items() if t in set(toks[did]))
            out[(qid, did)] = orig_weight * nsc[did] + (1.0 - orig_weight) * rm1
    return out


def _spark_rm3(spark, accumulate):
    docs_tok = spark.createDataFrame(
        [(d, t.split()) for d, t in DOCS], "doc_id long, tokens array<string>"
    )
    q_tok = spark.createDataFrame(
        [(q, t.split()) for q, t in QUERIES], "query_id string, tokens array<string>"
    )
    rows = rm3_rescore(docs_tok, q_tok, k1=K1, b=B, accumulate=accumulate, **PARAMS).collect()
    return {(r.query_id, r.doc_id): r.rm3_score for r in rows}


@pytest.mark.parametrize("accumulate", [True, False], ids=["rm1-accumulate", "java-last-doc-quirk"])
def test_rm3_matches_java_trace(spark, accumulate):
    got = _spark_rm3(spark, accumulate)
    want = _py_rm3(DOCS, QUERIES, accumulate=accumulate, **PARAMS)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-9), key
    # q4 is OOV-only: no candidates, no rows
    assert not any(q == "q4" for q, _ in got)


def test_rm3_modes_differ(spark):
    """The quirk mode must actually change the model (guards against the
    flag being a no-op)."""
    assert _spark_rm3(spark, True) != _spark_rm3(spark, False)


def test_rm3_orig_weight_validated(spark):
    docs_tok = spark.createDataFrame([(1, ["a"])], "doc_id long, tokens array<string>")
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_rescore(docs_tok, docs_tok, orig_weight=1.5)


def test_rm3_descriptor_round_trip():
    from flexneuart_spark.exper import dump_extractor_config, load_extractor_config

    ref = [
        {
            "type": "RM3Similarity",
            "params": {
                "queryFieldName": "text",
                "indexFieldName": "text",
                "topDocQty": "3",
                "topTermQty": "5",
                "origWeight": "0.4f",
                "k1": "1.2",
                "b": "0.75",
            },
        }
    ]
    conf = load_extractor_config(ref)
    assert conf[0]["feature"] == "rm3"
    assert conf[0]["top_doc_qty"] == 3
    assert conf[0]["top_term_qty"] == 5
    assert conf[0]["orig_weight"] == pytest.approx(0.4)
    assert dump_extractor_config(conf) == ref  # verbatim via _ref
    # hand-built config re-encodes to the reference shape
    dumped = dump_extractor_config(
        [{"name": "f1", "feature": "rm3", "top_doc_qty": 3, "orig_weight": 0.4}]
    )
    assert dumped == [
        {
            "type": "RM3Similarity",
            "params": {"indexFieldName": "text", "topDocQty": "3", "origWeight": "0.4"},
        }
    ]


def test_rm3_feature_in_registry(spark):
    from flexneuart_spark.operators.features import extract_features

    docs_tok = spark.createDataFrame(
        [(d, t.split()) for d, t in DOCS], "doc_id long, tokens array<string>"
    )
    q_tok = spark.createDataFrame(
        [("q1", ["hash", "join"])], "query_id string, tokens array<string>"
    )
    feats = extract_features(
        docs_tok, q_tok, [{"name": "f_rm3", "feature": "rm3", **PARAMS}]
    )
    got = {(r.query_id, r.doc_id): r.f_rm3 for r in feats.collect()}
    want = _py_rm3(DOCS, [("q1", "hash join")], accumulate=True, **PARAMS)
    for key, val in want.items():
        assert got[key] == pytest.approx(val, abs=1e-9)
