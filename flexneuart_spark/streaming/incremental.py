"""Incremental index ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10); its closest feature is
the append-only forward-index mode (``ForwardIndex.java:89-100``, README
"append-only mode"). This module is the Spark-native upgrade: new
documents arrive as a stream; each micro-batch is built into an
independent, fully-consistent index *segment* (the Lucene segment model)
using the SAME builder as batch mode — per-segment lineage, sha256
invariants, and resume semantics carry over unchanged.

Query-time, ``SegmentedSearcher`` merges segments with EXACT global
statistics (df summed, avgdl recomputed from totals), so incremental
results are score-identical to a monolithic rebuild (tested). Posting
payloads carry raw (tf, doc_len) and block-max metadata is
avgdl-independent precisely so that late segments can shift global stats
without invalidating earlier segments.

Segment compaction (merging many small segments into one) is the same
``build_index`` call over the union of their forward indexes — ordinals
are reassigned per shard; nothing else changes.
"""

from __future__ import annotations

import glob

from pyspark.sql import DataFrame, SparkSession

from flexneuart_spark.config import DEFAULT_NUM_SHARDS
from flexneuart_spark.index.builder import build_index


def list_segments(root: str) -> list[str]:
    return sorted(glob.glob(f"{root}/segments/*"))


def start_incremental_index(
    spark: SparkSession,
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    num_shards: int = DEFAULT_NUM_SHARDS,
    tokenizer: str = "code",
):
    """Start a streaming query that turns each micro-batch into an index
    segment under ``root/segments/<batch_id>``.

    ``foreachBatch`` gives exactly-once segment creation: the checkpoint
    records committed batch ids, and a re-delivered batch overwrites its
    own segment directory idempotently (same batch_id → same path →
    dynamic-overwrite build)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg_dir = f"{root}/segments/{batch_id:06d}"
        build_index(
            batch_df.sparkSession,
            batch_df,
            seg_dir,
            num_shards=num_shards,
            tokenizer=tokenizer,
        )

    return (
        stream_df.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
