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
