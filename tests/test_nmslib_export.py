"""NMSLIB-style dense / dense+sparse fusion export round trips."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flexneuart_spark.io.nmslib import export_dense, export_dense_sparse_fusion, read_export

SF_DIR = "/root/testdata/sf0.01"


def test_dense_export_roundtrip(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    out = str(tmp_path / "dense")
    export_dense(emb, out)
    want = {str(r.vec_id): np.asarray(r.embedding, dtype=np.float32) for r in emb.collect()}
    got = {ide: comps[0] for ide, comps in read_export(out)}
    assert set(got) == set(want)
    for k in want:
        assert np.array_equal(got[k], want[k])


def test_dense_export_empty_input(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty input"):
        export_dense(emb, str(tmp_path / "e1"))
    # explicit dim → valid no-op export (no parts, reader yields nothing)
    out = str(tmp_path / "e2")
    export_dense(emb, out, dim=64)
    assert list(read_export(out)) == []


def test_fusion_export_roundtrip(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(40).select(
        F.col("vec_id").cast("string").alias("doc_id"), "embedding"
    )
    # synthetic sparse side: a few (term_id, value) pairs per doc
    sparse = emb.select(
        "doc_id",
        F.array(F.lit(7), F.lit(3), F.lit(11)).alias("term_ids"),
        F.array(F.lit(0.5), F.lit(1.25), F.lit(-2.0)).alias("values"),
    )
    out = str(tmp_path / "fusion")
    export_dense_sparse_fusion(emb, sparse, out)
    want_dense = {r.doc_id: np.asarray(r.embedding, dtype=np.float32) for r in emb.collect()}
    seen = 0
    for ide, (dvec, (sids, svals)) in read_export(out):
        assert np.array_equal(dvec, want_dense[ide])
        # sparse side sorted by id on export (NMSLIB requirement)
        assert sids.tolist() == [3, 7, 11]
        assert svals.tolist() == pytest.approx([1.25, 0.5, -2.0])
        seen += 1
    assert seen == 40
