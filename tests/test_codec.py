"""Posting codec round-trips (pattern of reference
java/.../utils/CompressUtilsTest.java) + block-max metadata validity."""

from __future__ import annotations

import numpy as np
import pytest

from flexneuart_spark.index.codec import (
    decode_block,
    decode_postings,
    encode_postings,
    ub_impact,
    varint_decode,
    varint_encode,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varint_roundtrip(seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [
            rng.integers(0, 128, 100),
            rng.integers(0, 1 << 14, 100),
            rng.integers(0, 1 << 40, 100),
            np.array([0, 1, 127, 128, 16383, 16384, (1 << 63) - 1]),
        ]
    ).astype(np.uint64)
    buf = varint_encode(vals)
    out, end = varint_decode(buf, 0, len(vals))
    assert end == len(buf)
    assert (out == vals).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    out, end = varint_decode(b"", 0, None)
    assert len(out) == 0 and end == 0


@pytest.mark.parametrize("n", [1, 5, 128, 129, 1000])
def test_postings_roundtrip(n):
    rng = np.random.default_rng(n)
    ords = np.sort(rng.choice(np.arange(n * 7), size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, n).astype(np.int64)
    dls = rng.integers(1, 2000, n).astype(np.int64)
    enc = encode_postings(ords, tfs, dls)
    d, t, l = decode_postings(enc)
    assert (d == ords).all() and (t == tfs).all() and (l == dls).all()
    assert enc["df"] == n
    # per-block decode agrees
    d0, t0, l0 = decode_block(enc["payload"], enc["block_off"][0], enc["block_n"][0])
    m = enc["block_n"][0]
    assert (d0 == ords[:m]).all() and (t0 == tfs[:m]).all() and (l0 == dls[:m]).all()


def test_block_metadata_bounds():
    rng = np.random.default_rng(7)
    n = 500
    ords = np.arange(n, dtype=np.int64) * 3
    tfs = rng.integers(1, 30, n).astype(np.int64)
    dls = rng.integers(1, 500, n).astype(np.int64)
    enc = encode_postings(ords, tfs, dls)
    # block_max_doc are the skip pointers: strictly ascending, last == max ord
    bmax = np.array(enc["block_max_doc"])
    assert (np.diff(bmax) > 0).all() and bmax[-1] == ords[-1]
    # ub_impact upper-bounds the true impact for any avgdl
    for avgdl in (1.0, 50.0, 3000.0):
        true_imp = tfs / (tfs + 1.2 * (1 - 0.75 + 0.75 * dls / avgdl))
        s = 0
        for i, m in enumerate(enc["block_n"]):
            blk = slice(s, s + m)
            ub = ub_impact(enc["block_max_tf"][i], enc["block_min_dl"][i], avgdl)
            assert true_imp[blk].max() <= ub + 1e-12
            s += m


def test_strictly_ascending_required():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 3]), np.array([1, 1]), np.array([1, 1]))
