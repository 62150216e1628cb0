"""Physical-plan assertions: the scale-critical properties must be
visible in the executed plan, not just hoped for (SURVEY.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flexneuart_spark.fixtures import make_corpus
from flexneuart_spark.index.builder import build_index


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("plan_idx"))
    return build_index(spark, spark.createDataFrame(make_corpus(150, 42)), idx, num_shards=4)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_prunes_by_term(spark, tables):
    """The query path reads only the query terms' posting rows: the IN
    filter must reach the parquet scan (row-group stats apply because
    postings are written sorted by term within each shard)."""
    posts = tables.postings(spark).filter(F.col("term").isin(["def", "return"]))
    plan = _plan(posts)
    assert "FileScan parquet" in plan
    assert "term" in plan and "IN (def,return)" in plan.replace("\n", " "), plan[:2000]


def test_postings_scan_prunes_columns(spark, tables):
    proj = tables.postings(spark).select("term", "df_shard")
    plan = _plan(proj)
    # payload (the big binary) must NOT be read for a metadata projection
    scan_line = [line for line in plan.splitlines() if "FileScan" in line][0]
    assert "payload" not in scan_line.split("ReadSchema")[-1]


def test_query_side_broadcasts(spark, tables):
    from flexneuart_spark.search.engine import Searcher

    run = Searcher(spark, tables).search([("q", "def return")], k=5)
    plan = _plan(run)
    # the tiny per-shard top-k result is broadcast to label doc_ids;
    # the big forward index is never shuffled
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_shard_partition_pruning(spark, tables):
    one = tables.fwd(spark).filter(F.col("shard") == 2)
    plan = _plan(one)
    # directory-partitioned by shard → partition filter, not data filter
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1][:120]


def test_build_is_single_shuffle(spark, tmp_path_factory):
    """The whole index build shuffles exactly once: the post-tokenize
    repartition by shard. Stage 2 consumes the persisted shard-complete
    partitions (InMemoryTableScan), so its plan contains NO new Exchange
    before the kernel."""
    from flexneuart_spark.config import MAX_DOC_SIZE
    from flexneuart_spark.index.builder import (
        _POSTINGS_SCHEMA,
        _shard_postings_kernel,
        _tokens_udf,
        derive_doc_id,
    )
    from pyspark.sql import Window

    docs = derive_doc_id(spark.createDataFrame(make_corpus(80, 42)))
    docs = docs.withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int"))
    tok = _tokens_udf("code")
    fwd = (
        docs.withColumn("tokens", tok(F.substring("content", 1, MAX_DOC_SIZE)))
        .withColumn("doc_len", F.size("tokens").cast("long"))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .select("shard", "doc_id", "tokens", "doc_len", "content_sha256")
        .repartition(4, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .withColumn(
            "ord",
            F.row_number().over(Window.partitionBy("shard").orderBy("doc_id")).cast("long") - 1,
        )
    )
    # stage-1 frame: exactly one exchange (the repartition); the ordinal
    # window adds neither an exchange nor a second sort
    p1 = _plan(fwd)
    assert p1.count("Exchange") == 1, p1
    assert p1.count("Sort ") <= 1, p1

    fwdp = fwd.persist()
    try:
        fwdp.count()
        plist = fwdp.select("shard", "ord", "doc_len", "tokens").groupBy("shard").applyInPandas(
            _shard_postings_kernel, _POSTINGS_SCHEMA
        )
        p2 = _plan(plist)
        # cached partitioning satisfies the groupBy clustering: no exchange
        # ABOVE the cache scan (the InMemoryRelation's own description
        # embeds the original stage-1 exchange — that one already ran)
        assert "InMemoryTableScan" in p2, p2
        above_cache = p2.split("InMemoryTableScan")[0]
        assert "Exchange" not in above_cache, p2
    finally:
        fwdp.unpersist()


def test_warmed_query_has_no_exchange_before_kernel(spark, tables):
    """Warmed searcher: postings cached pre-partitioned by shard → the
    per-query scoring kernel stage needs no exchange over the cache."""
    from flexneuart_spark.search.engine import Searcher

    s = Searcher(spark, tables).warm()
    posts = s._posts.filter(F.col("term").isin(["def", "return"]))
    scored = posts.groupBy("shard").applyInPandas(
        lambda pdf: pdf[["shard"]].head(1), "shard int"
    )
    p = _plan(scored)
    assert "InMemoryTableScan" in p, p
    assert "Exchange" not in p.split("InMemoryTableScan")[0], p


def test_neural_entries_plan_shape(spark):
    """Neural entry plans keep the scale-safe shape: the all-pairs term
    product is a BroadcastNestedLoopJoin on the tiny query-term side
    (never a shuffled CartesianProduct), every groupBy partial-aggregates
    map-side, and the hash embedding stays a JVM expression (no
    PythonUDF / ArrowEval node anywhere in the entry plans)."""
    docs = spark.createDataFrame(
        [(f"d{i}", ["hash", "join", f"t{i}"]) for i in range(20)],
        ["doc_id", "tokens"],
    )
    qs = spark.createDataFrame([("q1", ["hash", "scan"])], ["query_id", "tokens"])

    from flexneuart_spark.neural.knrm import kernel_features
    from flexneuart_spark.neural.late_interaction import maxsim_scores
    from flexneuart_spark.neural.biencoder import biencoder_scores
    from flexneuart_spark.neural.drmm import histogram_features

    for df in (maxsim_scores(docs, qs), kernel_features(docs, qs), histogram_features(docs, qs)):
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" in plan, plan[:1500]
        assert "CartesianProduct" not in plan
        assert "partial" in plan.lower()  # map-side combine before exchange
        assert "PythonUDF" not in plan and "ArrowEval" not in plan

    plan = _plan(biencoder_scores(docs, qs))
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_rm3_plan_shape(spark):
    """RM3 keeps the candidate-bounded shape: no CartesianProduct, no
    Python in the plan, every corpus-side aggregation partial-aggregates
    map-side, and the RM3-specific joins are broadcast (the corpus is
    never shuffled for the relevance model / RM1 passes —
    search/rm3.py scale posture)."""
    from flexneuart_spark.search.rm3 import rm3_rescore

    docs = spark.createDataFrame(
        [(i, ["hash", "join", f"t{i}", f"u{i % 5}"]) for i in range(40)],
        ["doc_id", "tokens"],
    )
    qs = spark.createDataFrame([("q1", ["hash", "join"])], ["query_id", "tokens"])
    # materialize=False keeps ONE inspectable lazy plan end-to-end
    df = rm3_rescore(docs, qs, cand_qty=10, top_doc_qty=3, top_term_qty=5, materialize=False)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
    assert "partial" in plan.lower()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:1500]
    # the same result set as the materialized default
    a = sorted((r.query_id, r.doc_id, round(r.rm3_score, 9)) for r in df.collect())
    b = sorted(
        (r.query_id, r.doc_id, round(r.rm3_score, 9))
        for r in rm3_rescore(
            docs, qs, cand_qty=10, top_doc_qty=3, top_term_qty=5, materialize=True
        ).collect()
    )
    assert a == b
