"""Posting-list block codec: delta-gap + varint, with per-block max metadata.

Logical posting list (reference: Lucene ``DOCS_AND_FREQS`` postings,
``LuceneIndexer.java:59-67`` — docIDs + term frequencies, no positions):

    term → sorted [(doc_ordinal, tf, doc_len), ...]

``doc_len`` rides along so BM25 scoring is postings-self-contained (the
reference reads lengths from Lucene norms / the forward index at score
time — ``BM25SimilarityLucene.java:99-108``; we inline them, varint makes
the redundancy cheap).

Physical layout (one binary payload per (shard, term)):

    blocks of ``POSTING_BLOCK`` postings; per block:
    varint(delta-gapped doc ordinals) ++ varint(tfs) ++ varint(doc_lens).
    Sidecar arrays (parquet columns, NOT inside the binary):
      block_off     long[]   byte offset of each block in the payload
      block_n       int[]    postings per block
      block_max_doc long[]   max doc ordinal per block (skip pointers)
      block_max_tf  long[]   max tf per block
      block_min_dl  long[]   min doc_len per block

    (block_max_tf, block_min_dl) give a per-block score upper bound
    ``idf * (k1+1) * ub_impact(max_tf, min_dl, avgdl)`` valid for ANY
    current avgdl — impact is increasing in tf and decreasing in dl — so
    checkpoint-resumed builds that shift global avgdl never invalidate the
    pruning metadata. This is the Block-Max WAND impact data (mirrors
    Lucene 8's impact blocks; BASELINE.md "Lucene 8.6.0, Block-Max WAND
    top-k era").

All encode/decode paths are numpy-vectorized — no per-value Python loops
(loops run over byte *positions*, max 10 iterations).
"""

from __future__ import annotations

import numpy as np

from flexneuart_spark.config import BM25_B, BM25_K1, POSTING_BLOCK

_MAXB = 10  # max varint bytes for uint64


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint encode a uint64 array, numpy-vectorized."""
    a = np.asarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return b""
    out = np.zeros((n, _MAXB), dtype=np.uint8)
    lens = np.ones(n, dtype=np.int64)
    x = a.copy()
    for k in range(_MAXB):
        out[:, k] = (x & np.uint64(0x7F)).astype(np.uint8)
        x >>= np.uint64(7)
        more = x > 0
        if not more.any():
            break
        out[more, k] |= 0x80
        lens[more] = k + 2
    mask = np.arange(_MAXB)[None, :] < lens[:, None]
    return out[mask].tobytes()


def varint_decode(buf: bytes, offset: int = 0, count: int | None = None) -> tuple[np.ndarray, int]:
    """Decode ``count`` varints (or all remaining) starting at ``offset``.

    Returns (uint64 array, end offset)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64), offset
    b = np.frombuffer(buf, dtype=np.uint8)[offset:]
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64), offset
    ends = np.nonzero((b & 0x80) == 0)[0]
    if count is not None:
        ends = ends[:count]
    starts = np.empty(len(ends), dtype=np.int64)
    if len(starts):
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
    nb = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    maxlen = int(nb.max()) if len(nb) else 0
    for j in range(maxlen):
        sel = nb > j
        vals[sel] |= (b[starts[sel] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    end = offset + (int(ends[-1]) + 1 if len(ends) else 0)
    return vals, end


def ub_impact(max_tf: np.ndarray | float, min_dl: np.ndarray | float, avgdl: float,
              k1: float = BM25_K1, b: float = BM25_B):
    """Upper bound of the BM25 length-normalized tf term over a block:
    tf/(tf + k1*(1-b+b*dl/avgdl)) is increasing in tf, decreasing in dl."""
    max_tf = np.asarray(max_tf, dtype=np.float64)
    min_dl = np.asarray(min_dl, dtype=np.float64)
    return max_tf / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))


def encode_postings(
    doc_ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block: int = POSTING_BLOCK,
) -> dict:
    """Encode one term's postings (sorted strictly ascending by doc_ord)
    into a blocked payload + sidecar metadata (module docstring)."""
    doc_ords = np.asarray(doc_ords, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = len(doc_ords)
    assert len(tfs) == n and len(dls) == n
    if n > 1 and not (np.diff(doc_ords) > 0).all():
        raise ValueError("doc ordinals must be strictly ascending")
    payload = bytearray()
    block_off, block_n, block_max_doc, block_max_tf, block_min_dl = [], [], [], [], []
    for s in range(0, n, block):
        e = min(s + block, n)
        d = doc_ords[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = d[0]
        if e - s > 1:
            deltas[1:] = np.diff(d).astype(np.uint64)
        block_off.append(len(payload))
        payload += varint_encode(deltas)
        payload += varint_encode(tfs[s:e].astype(np.uint64))
        payload += varint_encode(dls[s:e].astype(np.uint64))
        block_n.append(e - s)
        block_max_doc.append(int(d[-1]))
        block_max_tf.append(int(tfs[s:e].max()))
        block_min_dl.append(int(dls[s:e].min()))
    return {
        "payload": bytes(payload),
        "block_off": block_off,
        "block_n": block_n,
        "block_max_doc": block_max_doc,
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
        "df": n,
    }


def decode_block(payload: bytes, off: int, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block → (doc_ords int64, tfs int64, dls int64)."""
    deltas, end = varint_decode(payload, off, n)
    tfs, end = varint_decode(payload, end, n)
    dls, _ = varint_decode(payload, end, n)
    return np.cumsum(deltas.astype(np.int64)), tfs.astype(np.int64), dls.astype(np.int64)


def decode_postings(enc: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all blocks of one encoded posting list."""
    parts = ([], [], [])
    for off, n in zip(enc["block_off"], enc["block_n"]):
        d, t, l = decode_block(enc["payload"], int(off), int(n))
        parts[0].append(d)
        parts[1].append(t)
        parts[2].append(l)
    if not parts[0]:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return tuple(np.concatenate(p) for p in parts)  # type: ignore[return-value]
