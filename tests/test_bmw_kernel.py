"""Block-Max WAND kernel (search/scoring.bmw_topk) equivalence.

The north rule names BMW explicitly ("block-max WAND posting-list
intersection with a bounded min-heap"); the reference gets it from
Lucene 8 (``cand_providers/LuceneCandidateProvider.java:103-178``).
These tests prove bmw_topk is result-identical to the exhaustive
kernel — same doc ordinals, same (score desc, ord desc) tie order,
bit-identical scores — across randomized multi-block posting sets,
skewed-weight heavy-pruning cases, and the edge shapes (empty, k=0,
k > corpus, single term, all-ties).
"""

from __future__ import annotations

import numpy as np
import pytest

from flexneuart_spark.index.codec import encode_postings
from flexneuart_spark.search.scoring import (
    TermPostings,
    bmw_topk,
    exhaustive_topk,
    maxscore_topk,
)

AVGDL = 40.0


def _term(rng, n_docs, density, weight, block=16):
    """Random posting list over doc ordinals [0, n_docs) at ~density."""
    mask = rng.random(n_docs) < density
    ords = np.flatnonzero(mask).astype(np.int64)
    if len(ords) == 0:
        ords = np.array([int(rng.integers(0, n_docs))], dtype=np.int64)
    tfs = rng.integers(1, 8, size=len(ords)).astype(np.int64)
    dls = rng.integers(5, 120, size=len(ords)).astype(np.int64)
    enc = encode_postings(ords, tfs, dls, block=block)
    return TermPostings(
        enc["payload"], enc["block_off"], enc["block_n"],
        enc["block_max_doc"], enc["block_max_tf"], enc["block_min_dl"],
        weight,
    )


def _assert_same(a, b, exact=True):
    """BMW sums per-doc contributions in entry order, so its scores are
    bit-identical to the exhaustive kernel; maxscore's lookup phase sums
    in candidate order, so it gets a 1-ulp tolerance instead."""
    (ao, asc), (bo, bsc) = a, b
    assert ao.tolist() == bo.tolist()
    if exact:
        assert asc.tolist() == bsc.tolist()
    else:
        np.testing.assert_allclose(asc, bsc, rtol=1e-12, atol=0.0)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 3, 10, 1000])
def test_bmw_matches_exhaustive_random(seed, k):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(50, 600))
    n_terms = int(rng.integers(1, 7))
    entries = [
        _term(rng, n_docs, float(rng.uniform(0.02, 0.6)), float(rng.uniform(0.2, 4.0)))
        for _ in range(n_terms)
    ]
    _assert_same(
        bmw_topk(entries, k, AVGDL), exhaustive_topk(entries, k, AVGDL)
    )
    _assert_same(
        maxscore_topk(entries, k, AVGDL), exhaustive_topk(entries, k, AVGDL),
        exact=False,
    )


def test_bmw_heavy_pruning_skewed_weights():
    """One rare high-weight term + several dense low-weight terms with
    small k — the regime where BMW actually skips blocks."""
    rng = np.random.default_rng(7)
    n_docs = 2000
    entries = [_term(rng, n_docs, 0.002, 9.0)] + [
        _term(rng, n_docs, 0.5, 0.05) for _ in range(4)
    ]
    _assert_same(bmw_topk(entries, 5, AVGDL), exhaustive_topk(entries, 5, AVGDL))


def test_bmw_all_ties_ord_desc():
    """Identical tf/dl everywhere ⇒ every doc ties; the bounded heap must
    keep the HIGHEST ordinals (score desc, ord desc tie rule)."""
    ords = np.arange(100, dtype=np.int64)
    tfs = np.full(100, 3, dtype=np.int64)
    dls = np.full(100, 40, dtype=np.int64)
    enc = encode_postings(ords, tfs, dls, block=16)
    tp = TermPostings(
        enc["payload"], enc["block_off"], enc["block_n"],
        enc["block_max_doc"], enc["block_max_tf"], enc["block_min_dl"], 1.5,
    )
    got_o, got_s = bmw_topk([tp], 10, AVGDL)
    assert got_o.tolist() == list(range(99, 89, -1))
    assert len(set(got_s.tolist())) == 1
    _assert_same((got_o, got_s), exhaustive_topk([tp], 10, AVGDL))


def test_bmw_edges():
    rng = np.random.default_rng(11)
    e = [_term(rng, 30, 0.4, 1.0)]
    z, zs = bmw_topk([], 10, AVGDL)
    assert len(z) == 0 and len(zs) == 0
    z, _ = bmw_topk(e, 0, AVGDL)
    assert len(z) == 0
    _assert_same(bmw_topk(e, 10_000, AVGDL), exhaustive_topk(e, 10_000, AVGDL))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _posting = st.tuples(
        st.integers(min_value=0, max_value=300),  # doc ord
        st.integers(min_value=1, max_value=9),    # tf
        st.integers(min_value=1, max_value=200),  # dl
    )
    _term_strategy = st.tuples(
        st.lists(_posting, min_size=1, max_size=60, unique_by=lambda p: p[0]),
        st.floats(min_value=0.01, max_value=8.0, allow_nan=False),
    )

    @given(
        terms=st.lists(_term_strategy, min_size=1, max_size=5),
        k=st.integers(min_value=1, max_value=20),
        block=st.sampled_from([2, 4, 16]),
    )
    @settings(max_examples=60, deadline=None)
    def test_bmw_property_equivalence(terms, k, block):
        """Any posting-list shape hypothesis can produce (tiny blocks,
        duplicate tfs, tied scores, singleton lists) ⇒ BMW == exhaustive
        on ords AND bit-identical scores."""
        entries = []
        for postings, weight in terms:
            postings = sorted(postings)
            o = np.array([p[0] for p in postings], dtype=np.int64)
            t = np.array([p[1] for p in postings], dtype=np.int64)
            l = np.array([p[2] for p in postings], dtype=np.int64)
            enc = encode_postings(o, t, l, block=block)
            entries.append(
                TermPostings(
                    enc["payload"], enc["block_off"], enc["block_n"],
                    enc["block_max_doc"], enc["block_max_tf"], enc["block_min_dl"],
                    weight,
                )
            )
        _assert_same(bmw_topk(entries, k, AVGDL), exhaustive_topk(entries, k, AVGDL))
except ImportError:  # pragma: no cover
    pass


def test_bmw_disjoint_and_duplicate_terms():
    """Disjoint lists (pure union) and the same term appearing twice
    (qtf folding upstream normally prevents it, the kernel must still
    sum both)."""
    def fixed(ords, weight):
        o = np.asarray(ords, dtype=np.int64)
        enc = encode_postings(
            o, np.full(len(o), 2, dtype=np.int64), np.full(len(o), 30, dtype=np.int64), block=4
        )
        return TermPostings(
            enc["payload"], enc["block_off"], enc["block_n"],
            enc["block_max_doc"], enc["block_max_tf"], enc["block_min_dl"], weight,
        )

    disjoint = [fixed(range(0, 50, 2), 1.0), fixed(range(1, 50, 2), 2.0)]
    _assert_same(bmw_topk(disjoint, 7, AVGDL), exhaustive_topk(disjoint, 7, AVGDL))
    dup = [fixed([3, 9, 12], 1.0), fixed([3, 9, 12], 1.0)]
    _assert_same(bmw_topk(dup, 3, AVGDL), exhaustive_topk(dup, 3, AVGDL))
