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


def synth_png(width: int, height: int, pixels: bytes) -> bytes:
    """Synthesize a minimal VALID grayscale 8-bit PNG from raw pixel
    bytes (row-major, ``len == width*height``) using only stdlib
    zlib/struct — no imaging library needed to WRITE, so the
    ``real_decode`` Pillow kernel has a real e2e fixture wherever PIL
    exists, and the writer itself is testable everywhere."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixel bytes, got {len(pixels)}")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )  # filter 0 per scanline
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(payloads: pd.Series, id_vals: pd.Series) -> pd.DataFrame:
    """Real decode kernel, used when Pillow is importable: open each
    payload, report true dimensions and a 4-value mean-intensity feature.
    Undecodable payloads yield NULL dims (kept, not dropped — the caller
    filters)."""
    import io

    import PIL.Image

    widths, heights, feats = [], [], []
    for b in payloads:
        try:
            img = PIL.Image.open(io.BytesIO(bytes(b)))
            img.load()
            widths.append(img.width)
            heights.append(img.height)
            small = img.convert("L").resize((2, 2))
            feats.append([float(p) / 255.0 for p in small.getdata()])
        except Exception:
            widths.append(None)
            heights.append(None)
            feats.append(None)
    return pd.DataFrame(
        {
            "doc_id": id_vals.astype("int64"),
            "width": pd.array(widths, dtype="Int32"),
            "height": pd.array(heights, dtype="Int32"),
            "n_bytes": payloads.map(len).astype("int64"),
            "feature": feats,
        }
    )


def decode_images(df: DataFrame, real_decode: bool = False, id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract payloads via ``mapInPandas`` (Arrow batches;
    one Python worker per partition — the correct shape for CPU-bound
    decode at scale: repartition upstream to control batch parallelism).

    ``real_decode=True`` dispatches on library availability: uses Pillow
    when importable, raises NotImplementedError otherwise (this runtime
    ships no imaging libs). Availability is probed INSIDE the kernel — on
    the executor, where the decode actually runs — so a driver-only or
    executor-only Pillow install behaves correctly either way. The
    default path emits a deterministic fake decode (dims/features derived
    from payload bytes) so the plumbing is end-to-end testable either
    way."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _pil_available() if real_decode else False
        for pdf in batches:
            if real_decode:
                if use_pil:
                    yield _pil_decode(pdf["payload"], pdf[id_col])
                    continue
                raise NotImplementedError(
                    "real image decode requires Pillow on the EXECUTORS — "
                    "not importable in this task's Python worker"
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
