"""Skewed-corpus stress tests (round-3): run the index build and the
dedup candidate generators over ``make_corpus_skewed`` — a corpus whose
boilerplate head actually TRIGGERS the skew guards (``max_shingle_df``,
``max_bucket_size``) instead of merely having them configured."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flexneuart_spark.fixtures import make_corpus_skewed
from flexneuart_spark.operators import dedup

N_DOCS = 400
BOILER_FRAC = 0.30
N_BOILER = int(N_DOCS * BOILER_FRAC)
CAP = 50  # far below the ~120-doc boilerplate family, so the guards fire


@pytest.fixture(scope="module")
def skewed_docs(spark):
    pdf = make_corpus_skewed(N_DOCS, boilerplate_frac=BOILER_FRAC)
    df = (
        spark.createDataFrame(pdf)
        .select(
            F.concat_ws(":", "repo", "path").alias("doc_id"),
            F.col("content").alias("text"),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def test_boilerplate_floods_shingle_head(skewed_docs):
    # the fixture must actually create the hazard: shared shingles with
    # df ≈ the whole boilerplate family (the unperturbed ~113 of 120)
    dropped = dedup.dropped_head_shingles(skewed_docs, max_shingle_df=CAP).collect()
    assert len(dropped) > 20
    assert max(r.sdf for r in dropped) > N_BOILER * 0.8


def test_jaccard_cap_bounds_candidates_on_skew(skewed_docs):
    # with the cap the worst shingle contributes C(CAP,2) pairs; without
    # it the boilerplate family alone is C(~113,2) ≈ 6.3k pairs per shared
    # shingle expanded in ONE task's rows
    capped = dedup.jaccard_near_duplicates(
        skewed_docs, threshold=0.5, max_shingle_df=CAP
    ).count()
    uncapped = dedup.jaccard_near_duplicates(
        skewed_docs, threshold=0.5, max_shingle_df=None
    )
    # uncapped finds the boilerplate near-dup clique; the cap trades that
    # recall for the bounded task (exact dedup upstream removes identical
    # mass in a real pipeline)
    assert uncapped.count() > capped
    # candidate volume bound: every posting list entering pair expansion
    # is ≤ CAP, so no single row expands more than C(CAP,2) structs
    sh = dedup.shingles(skewed_docs)
    sizes = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= CAP))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    assert sizes <= CAP


def test_minhash_bucket_cap_fires_on_skew(skewed_docs):
    buckets = dedup.minhash_band_buckets(skewed_docs)
    over = (
        dedup.oversized_buckets(buckets, ["band_idx", "band_key"])
        .filter(F.col("bucket_size") > CAP)
        .collect()
    )
    # every band of the unperturbed boilerplate family collides
    assert len(over) >= 1
    assert max(r.bucket_size for r in over) > N_BOILER * 0.8
    cand = dedup.minhash_lsh_candidates(skewed_docs, max_bucket_size=CAP)
    n = cand.count()
    # bounded: the hot family is dropped, only small-bucket pairs remain
    assert n < CAP * (CAP - 1) // 2 * 4


def test_index_build_survives_skewed_corpus(spark, skewed_docs, tmp_path_factory):
    from flexneuart_spark.index import build_index
    from flexneuart_spark.search import Searcher

    pdf = make_corpus_skewed(N_DOCS, boilerplate_frac=BOILER_FRAC)
    idx = str(tmp_path_factory.mktemp("skew_idx"))
    t = build_index(spark, spark.createDataFrame(pdf), idx, num_shards=4, tokenizer="code")
    n_docs, n_tokens, _ = t.stats(spark)
    assert n_docs == N_DOCS and n_tokens > 0
    # the boilerplate head term has df ≈ the whole family; the build and
    # the query path must both handle that posting-list skew
    boiler_term = (
        t.dictionary(spark).orderBy(F.desc("df")).select("term", "df").first()
    )
    assert boiler_term.df >= N_BOILER * 0.8
    run = Searcher(spark, t).search([("q", boiler_term.term)], k=10).collect()
    assert len(run) == 10
