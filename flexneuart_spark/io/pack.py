"""Packed binary vector format (SURVEY.md §2; reference
``flexneuart/io/pack.py:21-60``).

Layout (little-endian throughout, matching the reference's struct masks):

- dense:  ``<I``  type tag 0, then ``dim`` float32 values;
- sparse: ``<II`` type tag 1 + dim, then ``dim`` × (uint32 id, float32 val).

The reference packs with per-row ``struct.pack``; here packing/unpacking
is numpy-vectorized (one contiguous buffer per Arrow batch) and exposed
both as plain-python/numpy functions and as Spark binary columns via
pandas UDFs, so reference-produced fields and Spark-produced fields are
byte-interchangeable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

PACKED_TYPE_DENSE = 0
PACKED_TYPE_SPARSE = 1

_U32 = np.dtype("<u4")
_F32 = np.dtype("<f4")


def pack_dense_batch(data) -> list[bytes]:
    """Pack a 2-d float array into per-row byte strings
    (tag ``<I``=0 + dim×``<f``), byte-identical to the reference's
    ``struct.pack(f'<I{dim}f', 0, *row)``."""
    mat = np.ascontiguousarray(np.asarray(data, dtype=np.float64).astype(_F32))
    n, dim = mat.shape
    out = np.empty((n, 4 + 4 * dim), dtype=np.uint8)
    out[:, :4] = np.frombuffer(
        np.full(n, PACKED_TYPE_DENSE, dtype=_U32).tobytes(), dtype=np.uint8
    ).reshape(n, 4)
    out[:, 4:] = mat.view(np.uint8).reshape(n, 4 * dim)
    return [row.tobytes() for row in out]


def unpack_dense(b: bytes) -> np.ndarray:
    """Inverse of one ``pack_dense_batch`` row → float32 array."""
    tag = int(np.frombuffer(b[:4], dtype=_U32)[0])
    if tag != PACKED_TYPE_DENSE:
        raise ValueError(f"not a dense packed vector (tag={tag})")
    return np.frombuffer(b[4:], dtype=_F32).copy()


def pack_sparse_vect(ids, vals) -> bytes:
    """Pack one sparse vector (tag ``<II``=1,dim then dim×(``<I`` id,
    ``<f`` val)) — byte layout of the reference's ``pack_sparse_vect``
    (which takes the same data as a flat alternating id/val list)."""
    ids = np.asarray(ids, dtype=_U32)
    vals = np.asarray(vals, dtype=np.float64).astype(_F32)
    if ids.shape != vals.shape:
        raise ValueError("ids and vals must have equal length")
    dim = len(ids)
    body = np.empty(dim, dtype=np.dtype([("id", _U32), ("val", _F32)]))
    body["id"] = ids
    body["val"] = vals
    head = np.array([PACKED_TYPE_SPARSE, dim], dtype=_U32)
    return head.tobytes() + body.tobytes()


def unpack_sparse(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of ``pack_sparse_vect`` → (uint32 ids, float32 vals)."""
    tag, dim = (int(x) for x in np.frombuffer(b[:8], dtype=_U32))
    if tag != PACKED_TYPE_SPARSE:
        raise ValueError(f"not a sparse packed vector (tag={tag})")
    body = np.frombuffer(b[8:], dtype=np.dtype([("id", _U32), ("val", _F32)]))
    if len(body) != dim:
        raise ValueError(f"corrupt sparse vector: header dim {dim}, payload {len(body)}")
    return body["id"].copy(), body["val"].copy()


def pack_dense_col(vec_col: str) -> Column:
    """array<float> column → packed binary column (Arrow-batched)."""

    @F.pandas_udf("binary")
    def _pack(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        return pd.Series(pack_dense_batch(np.stack(vecs.map(np.asarray))))

    return _pack(F.col(vec_col))


def unpack_dense_col(bin_col: str) -> Column:
    """packed binary column → array<float> column (Arrow-batched)."""

    @F.pandas_udf("array<float>")
    def _unpack(bs: pd.Series) -> pd.Series:
        return bs.map(lambda b: unpack_dense(b).tolist() if b is not None else None)

    return _unpack(F.col(bin_col))
