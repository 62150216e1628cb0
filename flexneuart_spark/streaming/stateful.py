"""Structured Streaming operators: watermarked event-time aggregation and
a custom stateful streaming deduplicator.

The reference is strictly batch (SURVEY.md §2.10) — these are the
Spark-native additions a continuously-ingesting corpus pipeline needs:

- :func:`minutely_counts_stream` — the streaming twin of the batch
  ``events_minutely`` entry: event-time tumbling windows with a watermark
  bounding state and dropping too-late events (append mode emits a window
  only once it can no longer change).
- :func:`streaming_exact_dedup` — exact content dedup ACROSS micro-batches
  via ``applyInPandasWithState``: the first document per content hash
  passes through, every later duplicate (same or later batch) is
  suppressed. This is the streaming form of the batch
  ``dedup_exact`` operator (operators/dedup.py) — the state per key is one
  boolean, so state size = #distinct hashes, independent of stream length.

Both are exercised end-to-end in tests with a file source (one file per
micro-batch via maxFilesPerTrigger) and a memory sink, checked against
the equivalent batch computation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def minutely_counts_stream(
    events: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-minute event counts over event time with late-data handling.

    Append-mode semantics: a minute window is emitted exactly once, after
    the watermark (max event time − ``watermark``) passes its end; events
    arriving later than the watermark are dropped — bounded state for an
    unbounded stream."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 minute").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("minute"), "n_events")
    )


_DEDUP_OUT = T.StructType(
    [
        T.StructField("content_sha256", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
)
_DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedup_fn(key, pdfs, state: GroupState):
    """Emit only the first row ever seen for this content hash; afterwards
    the state ('seen') suppresses all duplicates, within and across
    micro-batches."""
    if state.exists:
        for _ in pdfs:  # drain; all rows are duplicates of a seen hash
            pass
        return
    # deterministic pick: smallest doc_id across ALL chunks — Spark may
    # deliver one group as several Arrow batches, so the minimum must be
    # tracked over every pdf, not taken from the first non-empty one
    first_id = None
    for pdf in pdfs:
        if len(pdf):
            m = pdf["doc_id"].min()
            if first_id is None or m < first_id:
                first_id = m
    state.update((True,))
    if first_id is not None:
        yield pd.DataFrame({"content_sha256": [key[0]], "doc_id": [first_id]})


def streaming_exact_dedup(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """First-occurrence filter per sha256(content) over a stream of
    documents (axes: training-data pipeline dedup, streaming form).

    Input must carry ``doc_id``; output is (content_sha256, doc_id) of
    each first occurrence."""
    hashed = docs.select(
        F.sha2(F.col(text_col), 256).alias("content_sha256"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    return hashed.groupBy("content_sha256").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
