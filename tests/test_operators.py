"""Operator-level tests: dedup recall on the planted near-duplicates in
the driver testdata, ANN sanity vs brute force, multimodal plumbing."""

from __future__ import annotations

import itertools

import duckdb
import pytest
from pyspark.sql import functions as F

from flexneuart_spark.operators import dedup, multimodal, similarity

SF_DIR = "/root/testdata/sf0.01"


def _planted_pairs(threshold=0.8, n=3):
    rows = duckdb.sql(f"select doc_id, text from '{SF_DIR}/documents.parquet'").fetchall()

    def sh(t):
        w = t.split()
        return {tuple(w[i : i + n]) for i in range(len(w) - n + 1)}

    S = {i: sh(t) for i, t in rows}
    out = set()
    for a, b in itertools.combinations(S, 2):
        if not S[a]:
            continue
        j = len(S[a] & S[b]) / len(S[a] | S[b])
        if j >= threshold:
            out.add((min(a, b), max(a, b)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_jaccard_finds_planted_pairs(spark, docs):
    want = _planted_pairs()
    got = {(r.id_a, r.id_b) for r in dedup.jaccard_near_duplicates(docs, threshold=0.8).collect()}
    assert got == want and len(got) >= 20


def test_shingle_df_cap_keeps_high_sim_pairs(spark, docs):
    # capping ultra-common shingles must not lose the planted near-dups
    got = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_near_duplicates(docs, threshold=0.8, max_shingle_df=50).collect()
    }
    assert got == _planted_pairs()


def test_minhash_lsh_recall(spark, docs):
    want = _planted_pairs()
    cand = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_candidates(docs).collect()}
    # LSH candidates must cover (almost all of) the true near-dup pairs;
    # with 4 bands of 2 minhashes and jaccard≥0.9 recall should be total
    missed = want - cand
    assert len(missed) <= 1, f"missed {missed}"


def test_lsh_ann_subset_of_bruteforce_universe(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = similarity.cosine_topk(emb, [0, 1], k=5)
    approx = similarity.lsh_ann_topk(emb, [0, 1], k=5, nbits=4)
    # ANN returns valid neighbours with correct cosines: every approx row's
    # cosine must equal the exact cosine for that (query, vec) pair
    ex = {(r.query_vec_id, r.vec_id): r.cos_r for r in
          similarity.cosine_topk(emb, [0, 1], k=10**6).collect()}
    for r in approx.collect():
        assert (r.query_vec_id, r.vec_id) in ex
        assert abs(ex[(r.query_vec_id, r.vec_id)] - r.cos_r) < 1e-9
    assert exact.count() == 10


def test_multimodal_decode_stub(spark, docs):
    p = multimodal.attach_payload(docs.limit(20))
    out = multimodal.decode_images(p)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        assert r.n_bytes == 16
        assert len(r.feature) == 4 and all(0.0 <= x <= 1.0 for x in r.feature)


def test_multimodal_real_decode_gated(spark, docs):
    p = multimodal.attach_payload(docs.limit(2))
    with pytest.raises(Exception) as ei:
        multimodal.decode_images(p, real_decode=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real image decode" in str(ei.value)


def test_frame_sampling(spark, docs):
    p = multimodal.attach_payload(docs.limit(3))
    frames = multimodal.sample_frames(p, every_n=4)
    rows = frames.collect()
    # 16 payload bytes → frames 0,4,8,12 per doc
    assert len(rows) == 3 * 4
    assert {r.frame_idx for r in rows} == {0, 4, 8, 12}


def test_exact_duplicates_detects_injected(spark, docs):
    dup = docs.limit(5).union(docs.limit(5))
    got = dedup.exact_duplicates(dup)
    assert got.count() == 5
    assert {r.n_dups for r in got.collect()} == {2}
