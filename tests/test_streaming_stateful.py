"""Structured Streaming operators: watermarked windows drop late data;
applyInPandasWithState dedup suppresses duplicates across micro-batches.
File source with maxFilesPerTrigger=1 → deterministic batch boundaries;
memory sink checked against the equivalent batch computation."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from flexneuart_spark.streaming.stateful import minutely_counts_stream, streaming_exact_dedup


def _write_parquet(pdf: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for c in pdf.columns:  # Spark reads micro-, not nanosecond timestamps
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def _run_stream(q) -> None:
    q.awaitTermination(120)
    assert not q.isActive


def test_watermark_drops_late_events(spark, tmp_path):
    src = tmp_path / "events_src"
    os.makedirs(src)
    ts = lambda s: pd.Timestamp(f"2024-01-01 {s}")  # noqa: E731
    # batch 0: two events in minute 00:00, one at 01:00 — this max event
    # time sets the watermark to 00:50 (10-minute bound). The watermark
    # becomes EFFECTIVE one batch later (it is recomputed at batch
    # commit), hence the benign middle batch.
    _write_parquet(
        pd.DataFrame({"ts": [ts("00:00:10"), ts("00:00:20"), ts("01:00:00")]}),
        str(src / "a.parquet"),
    )
    time.sleep(1.1)  # file mtime order = processing order
    _write_parquet(pd.DataFrame({"ts": [ts("01:05:00")]}), str(src / "b.parquet"))
    time.sleep(1.1)
    # batch 2: a LATE event for minute 00:00 (older than the now-effective
    # 00:50 watermark → dropped) plus a fresh event
    _write_parquet(
        pd.DataFrame({"ts": [ts("00:00:30"), ts("01:10:00")]}),
        str(src / "c.parquet"),
    )

    events = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    counts = minutely_counts_stream(events, ts_col="ts", watermark="10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(q)
    rows = spark.sql("SELECT * FROM wm_counts").collect()
    got = {r.minute.strftime("%H:%M"): r.n_events for r in rows}
    # minute 00:00 finalized with batch-0 events ONLY — the late arrival
    # was dropped by the watermark (exactly one emission, no duplicate
    # re-open of the closed window); windows past the final watermark are
    # never emitted in append mode
    assert got.get("00:00") == 2, rows
    assert len(rows) == len(got), rows  # each window emitted at most once
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1, [p.get("stateOperators") for p in q.recentProgress]


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "docs_src"
    os.makedirs(src)
    # batch 1: X twice (within-batch dup), Y once
    _write_parquet(
        pd.DataFrame({"doc_id": ["d1", "d5", "d2"], "content": ["X", "X", "Y"]}),
        str(src / "a.parquet"),
    )
    time.sleep(1.1)
    # batch 2: X again (cross-batch dup) + fresh Z
    _write_parquet(
        pd.DataFrame({"doc_id": ["d3", "d4"], "content": ["X", "Z"]}),
        str(src / "b.parquet"),
    )

    docs = (
        spark.readStream.schema("doc_id string, content string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = streaming_exact_dedup(docs)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(q)
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    by_doc = sorted(r.doc_id for r in rows)
    # first occurrence of X is d1 (smallest doc_id in its first batch);
    # d5 (same batch) and d3 (later batch) are suppressed
    assert by_doc == ["d1", "d2", "d4"], rows
    import hashlib

    sha = {r.doc_id: r.content_sha256 for r in rows}
    assert sha["d1"] == hashlib.sha256(b"X").hexdigest()


@pytest.mark.parametrize("n", [1])
def test_dedup_batch_equivalence(spark, tmp_path, n):
    """Streaming dedup result == batch exact-dedup first-occurrence set
    (same keys), on a single-batch stream."""
    src = tmp_path / "docs_one"
    os.makedirs(src)
    pdf = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(20)], "content": [f"c{i % 7}" for i in range(20)]}
    )
    _write_parquet(pdf, str(src / "a.parquet"))
    docs = spark.readStream.schema("doc_id string, content string").parquet(str(src))
    q = (
        streaming_exact_dedup(docs)
        .writeStream.format("memory")
        .queryName("dedup_one")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_stream(q)
    got = {r.content_sha256: r.doc_id for r in spark.sql("SELECT * FROM dedup_one").collect()}
    want = pdf.assign(first=pdf.groupby("content")["doc_id"].transform("min"))
    assert len(got) == 7
    import hashlib

    for c, g in pdf.groupby("content"):
        assert got[hashlib.sha256(c.encode()).hexdigest()] == g["doc_id"].min()


def test_dedup_fn_min_across_chunks():
    # a group can arrive as SEVERAL Arrow chunks: the deterministic pick
    # must be the min doc_id over all of them, not the first chunk's min
    from flexneuart_spark.streaming.stateful import _dedup_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True

    chunks = [
        pd.DataFrame({"content_sha256": ["h"] * 2, "doc_id": ["d9", "d5"]}),
        pd.DataFrame({"content_sha256": ["h"], "doc_id": ["d2"]}),
        pd.DataFrame({"content_sha256": [], "doc_id": []}),
    ]
    out = list(_dedup_fn(("h",), iter(chunks), FakeState()))
    assert len(out) == 1 and out[0]["doc_id"].iloc[0] == "d2"
