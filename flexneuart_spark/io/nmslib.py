"""NMSLIB-style dense/sparse export (SURVEY.md §2 S9 — the dense half).

The reference exports feature vectors to NMSLIB's dense/sparse fusion
space as one binary stream (``apps/ExportToNMSLIBDenseSparseFusion.java``:
int32-LE header ``entryQty, componentQty, per-component (isSparse, dim)``,
then per entry an ascii id (int32 length + bytes) followed by each
component's packed vector). This module writes the same record structure
with the *Python* reference's packed-vector layouts
(``flexneuart/io/pack.py`` — tagged little-endian dense/sparse records,
see ``flexneuart_spark.io.pack``), Spark-style: each partition emits one
self-contained part file (own header), so a 1000-executor export needs no
driver funnel and no shuffle; a consumer concatenates logically by
reading every part.

Sparse components must be pre-sorted by id (NMSLIB requirement; the
exporters here sort defensively).
"""

from __future__ import annotations

import glob
import os
import struct

import numpy as np

from pyspark.sql import DataFrame

from flexneuart_spark.io.pack import pack_dense_batch, pack_sparse_vect

_I = struct.Struct("<i")


def _write_part(rows, path: str, components: list[tuple[bool, int]]) -> int:
    """rows: iterable of (id, [comp_bytes, ...]). Returns entry count."""
    buf = bytearray()
    n = 0
    for doc_id, comps in rows:
        ide = str(doc_id).encode("ascii")
        buf += _I.pack(len(ide)) + ide
        for b in comps:
            buf += b
        n += 1
    with open(path, "wb") as f:
        f.write(_I.pack(n))
        f.write(_I.pack(len(components)))
        for is_sparse, dim in components:
            f.write(_I.pack(1 if is_sparse else 0))
            f.write(_I.pack(dim))
        f.write(bytes(buf))
    return n


def _probe_dim(df: DataFrame, vec_col: str, dim: int | None) -> int:
    """Resolve the component dimension: use the caller-supplied value
    (skips a driver job), else read the first vector — raising a clear
    error on an empty frame or NULL leading vector instead of a
    TypeError deep in ``len(None)``."""
    if dim is not None:
        return dim
    first = df.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError(
            f"cannot infer dim from {vec_col!r}: empty input or NULL first "
            "vector — pass dim= explicitly to export an empty set"
        )
    return len(first[0])


def export_dense(
    df: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Export (id, dense vector) to per-partition binary part files."""
    os.makedirs(out_dir, exist_ok=True)
    dim = _probe_dim(df, vec_col, dim)

    def part(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = list(it)
        if rows:
            packed = pack_dense_batch([r[1] for r in rows])
            _write_part(
                ((r[0], [p]) for r, p in zip(rows, packed)),
                os.path.join(out_dir, f"part-{pid:05d}.bin"),
                [(False, dim)],
            )
        return iter(())

    df.select(id_col, vec_col).rdd.mapPartitions(part).count()


def export_dense_sparse_fusion(
    dense_df: DataFrame,
    sparse_df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    ids_col: str = "term_ids",
    vals_col: str = "values",
    dim: int | None = None,
) -> None:
    """Fusion export: per entry one dense component + one sparse component
    (inner join on id; ids present in only one frame are dropped, like the
    reference's per-extractor candidate intersection)."""
    os.makedirs(out_dir, exist_ok=True)
    dim = _probe_dim(dense_df, vec_col, dim)
    joined = dense_df.select(id_col, vec_col).join(
        sparse_df.select(id_col, ids_col, vals_col), id_col
    )

    def part(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = list(it)
        if rows:
            packed_d = pack_dense_batch([r[1] for r in rows])
            entries = []
            for r, pd_ in zip(rows, packed_d):
                order = np.argsort(np.asarray(r[2]))
                ps = pack_sparse_vect(np.asarray(r[2])[order], np.asarray(r[3])[order])
                entries.append((r[0], [pd_, ps]))
            _write_part(
                entries,
                os.path.join(out_dir, f"part-{pid:05d}.bin"),
                [(False, dim), (True, 0)],
            )
        return iter(())

    joined.rdd.mapPartitions(part).count()


def read_export(out_dir: str):
    """Round-trip reader: yields (id, [component, ...]) across all part
    files; dense components come back as float32 arrays, sparse as
    (ids, vals) tuples."""
    from flexneuart_spark.io.pack import _F32, _U32, PACKED_TYPE_DENSE, PACKED_TYPE_SPARSE

    for path in sorted(glob.glob(os.path.join(out_dir, "part-*.bin"))):
        with open(path, "rb") as f:
            data = f.read()
        off = 0

        def rd_i():
            nonlocal off
            (v,) = _I.unpack_from(data, off)
            off += 4
            return v

        n_entries = rd_i()
        n_comp = rd_i()
        comps = [(rd_i() == 1, rd_i()) for _ in range(n_comp)]
        for _ in range(n_entries):
            id_len = rd_i()
            ide = data[off : off + id_len].decode("ascii")
            off += id_len
            out = []
            for is_sparse, dim in comps:
                tag = int(np.frombuffer(data[off : off + 4], dtype=_U32)[0])
                if is_sparse:
                    if tag != PACKED_TYPE_SPARSE:
                        raise ValueError(f"expected sparse record, tag={tag}")
                    n = int(np.frombuffer(data[off + 4 : off + 8], dtype=_U32)[0])
                    body = np.frombuffer(
                        data[off + 8 : off + 8 + 8 * n],
                        dtype=np.dtype([("id", _U32), ("val", _F32)]),
                    )
                    out.append((body["id"].copy(), body["val"].copy()))
                    off += 8 + 8 * n
                else:
                    if tag != PACKED_TYPE_DENSE:
                        raise ValueError(f"expected dense record, tag={tag}")
                    out.append(np.frombuffer(data[off + 4 : off + 4 + 4 * dim], dtype=_F32).copy())
                    off += 4 + 4 * dim
            yield ide, out
