"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The reference's binary-field machinery (packed float vectors,
``flexneuart/io/pack.py:21-60``; binary forward-index fields,
``ForwardIndex.java:102-108``) is the precedent: payloads are opaque
bytes + sidecar metadata. Real decode libraries (PIL/ffmpeg/torchaudio)
are NOT in this container, so the decode kernels are STUBS — but the
Spark-side plumbing (schema, Arrow batch shape, ``mapInPandas``
signature, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake payload: 16 opaque bytes (unhex of md5(text))
    plus typed metadata — stands in for a real image/audio blob column."""
    return df.select(
        F.col(id_col),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.length(F.unhex(F.md5(F.col(text_col)))).cast("long").alias("payload_len"),
    )


def decode_images(df: DataFrame, real_decode: bool = False, id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract payloads via ``mapInPandas`` (Arrow batches;
    one Python worker per partition — the correct shape for CPU-bound
    decode at scale: repartition upstream to control batch parallelism).

    ``real_decode=True`` raises NotImplementedError (no imaging libs in
    this container); the default path emits a deterministic fake decode
    (dims/features derived from payload bytes) so the plumbing is
    end-to-end testable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not available in this runtime"
                )
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": payloads.map(lambda b: 1 + b[0] % 64).astype("int32"),
                    "height": payloads.map(lambda b: 1 + b[1] % 64).astype("int32"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "feature": payloads.map(lambda b: [float(x) / 255.0 for x in b[:4]]),
                }
            )
            yield out

    return df.mapInPandas(kernel, DECODE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling stub: treat each payload byte as a 'frame', keep
    every n-th — the plumbing (explode + posexplode ordering) is what a
    real video sampler needs."""
    frames = F.transform(
        F.sequence(F.lit(0), F.length("payload").cast("int") - 1),
        lambda i: F.struct(i.alias("frame_idx"), F.substring(F.base64("payload"), 1, 4).alias("frame_ref")),
    )
    ex = df.select(F.col(id_col), F.explode(frames).alias("f")).select(
        id_col, F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame_ref").alias("frame_ref")
    )
    return ex.filter(F.col("frame_idx") % every_n == 0)
