"""Proximity BM25: close-pair similarities (SURVEY.md §2.8 C3).

Reference semantics (``simil_func/BM25ClosePairSimilarityQueryNormBase.java:21-70``,
``BM25CloseOrderPairSimilQueryNorm.java:44-120``,
``BM25CloseUnorderPairSimilQueryNorm.java``; an SDM-like model from
Boytsov & Belova, TREC 2011):

- query pairs: every (i, k) with i < k < i + query_window over the query
  token SEQUENCE, both words in-dictionary, words distinct; ordered
  variant keeps (w_i, w_k) as-is, unordered canonicalizes to
  (min, max) by word id;
- doc pair tf: occurrences of those pairs over the doc token sequence
  with gap < doc_window (same ordered/unordered keying);
- score = Σ_pairs tfNorm(tf) · (idf₁+idf₂)/2, tfNorm the BM25 length
  normalization with the doc's token length; normalized by Σ idf over the
  query's unique in-dictionary words.

The forward index always stores the token sequence (the reference's
parsedText/mWordIdSeq mode, ``ForwardIndex.java:102-108``), so proximity
scoring needs no special build flag.

The kernel is numpy-vectorized: for each gap g < window, pair keys are
formed by shifting the id array — no per-position Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flexneuart_spark.config import BM25_B, BM25_K1


def query_pairs(
    q_ids: np.ndarray, query_window: int, ordered: bool
) -> set[tuple[int, int]]:
    """Distinct close pairs of the query id sequence (ids < 0 = OOV)."""
    out: set[tuple[int, int]] = set()
    n = len(q_ids)
    for i in range(n - 1):
        for k in range(i + 1, min(n, i + query_window)):
            a, b = int(q_ids[i]), int(q_ids[k])
            if a < 0 or b < 0 or a == b:
                continue
            out.add((a, b) if ordered else (min(a, b), max(a, b)))
    return out


def doc_pair_counts(
    d_ids: np.ndarray, doc_window: int, ordered: bool, vocab_size: int
) -> dict[int, int]:
    """Counts of close pairs over the doc id sequence, keyed
    a*vocab_size+b. Vectorized over gaps."""
    counts: dict[int, int] = {}
    n = len(d_ids)
    V = vocab_size
    for g in range(1, doc_window):
        if g >= n:
            break
        a = d_ids[:-g]
        b = d_ids[g:]
        mask = (a >= 0) & (b >= 0) & (a != b)
        if not mask.any():
            continue
        aa, bb = a[mask], b[mask]
        if not ordered:
            lo = np.minimum(aa, bb)
            hi = np.maximum(aa, bb)
            aa, bb = lo, hi
        keys, qtys = np.unique(aa.astype(np.int64) * V + bb.astype(np.int64), return_counts=True)
        for kkey, qq in zip(keys.tolist(), qtys.tolist()):
            counts[kkey] = counts.get(kkey, 0) + qq
    return counts


def close_pair_score(
    q_ids: np.ndarray,
    d_ids: np.ndarray,
    doc_len: int,
    idf_by_id: np.ndarray,
    avgdl: float,
    query_window: int = 4,
    doc_window: int = 8,
    ordered: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> float:
    """Single (query, doc) close-pair score — the reference's `compute`."""
    V = len(idf_by_id)
    qp = query_pairs(q_ids, query_window, ordered)
    if not qp:
        return 0.0
    dc = doc_pair_counts(d_ids, doc_window, ordered, V)
    score = 0.0
    for a, bb in sorted(qp):
        tf = dc.get(a * V + bb, 0)
        if tf <= 0:
            continue
        norm_tf = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doc_len / avgdl))
        score += norm_tf * 0.5 * (idf_by_id[a] + idf_by_id[bb])
    uniq = {int(x) for x in q_ids if x >= 0}
    norm_idf = sum(idf_by_id[w] for w in uniq)
    return score / norm_idf if norm_idf > 0 else 0.0


def sdm_topk(
    spark: SparkSession,
    tables,
    queries: list[tuple[str, str]],
    k: int = 10,
    w_unigram: float = 0.8,
    w_ordered: float = 0.1,
    w_unordered: float = 0.1,
    query_window: int = 4,
    doc_window: int = 8,
    tokenizer: str = "code",
    component_k: int | None = None,
) -> DataFrame:
    """Sequential Dependence Model (SURVEY.md §2.8 C4,
    ``simil_func/SDMSimilarityAnserini.java`` shape): weighted combination
    of the unigram BM25 score and the ordered/unordered close-pair scores.
    Each component reuses its individually-oracle-tested implementation;
    missing components contribute 0 (outer join).

    ``component_k`` bounds each component's candidate depth (default
    10k-or-100, the usual rerank-pool shape); pass a value ≥ corpus size
    for the exhaustive combination (exactly SQL-expressible)."""
    from flexneuart_spark.search.engine import Searcher

    ck = component_k if component_k is not None else max(k * 10, 100)
    uni = Searcher(spark, tables, tokenizer=tokenizer).search(queries, k=ck)
    o = proximity_topk(spark, tables, queries, k=ck, query_window=query_window,
                       doc_window=doc_window, ordered=True, tokenizer=tokenizer)
    u = proximity_topk(spark, tables, queries, k=ck, query_window=query_window,
                       doc_window=doc_window, ordered=False, tokenizer=tokenizer)
    uni = uni.select("query_id", "doc_id", F.col("score").alias("s_uni"))
    o = o.select("query_id", "doc_id", F.col("score").alias("s_ord"))
    u = u.select("query_id", "doc_id", F.col("score").alias("s_unord"))
    j = (
        uni.join(o, ["query_id", "doc_id"], "full")
        .join(u, ["query_id", "doc_id"], "full")
        .fillna({"s_uni": 0.0, "s_ord": 0.0, "s_unord": 0.0})
        .withColumn(
            "score",
            F.lit(w_unigram) * F.col("s_uni")
            + F.lit(w_ordered) * F.col("s_ord")
            + F.lit(w_unordered) * F.col("s_unord"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def proximity_topk(
    spark: SparkSession,
    tables,
    queries: list[tuple[str, str]],
    k: int = 10,
    query_window: int = 4,
    doc_window: int = 8,
    ordered: bool = True,
    tokenizer: str = "code",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Distributed close-pair top-k over a positional index.

    Candidates = docs containing ≥2 distinct query terms (a pair needs
    two); their token sequences are scored shard-parallel
    (applyInPandas), then globally merged under the tie rule."""
    from flexneuart_spark.functions.tokenize import code_tokenize, whitespace_tokenize

    tok = code_tokenize if tokenizer == "code" else whitespace_tokenize
    n_docs, _total, avgdl = tables.stats(spark)

    qtoks = {qid: tok(text) for qid, text in queries if tok(text)}
    vocab = sorted({t for toks in qtoks.values() for t in toks})
    if not vocab:
        return spark.createDataFrame([], "query_id string, doc_id string, score double, rank int")
    dic = (
        tables.dictionary(spark).filter(F.col("term").isin(vocab)).select("term", "idf").collect()
    )
    term_to_id = {r.term: i for i, r in enumerate(sorted(dic, key=lambda r: r.term))}
    idf_by_id = np.array([r.idf for r in sorted(dic, key=lambda r: r.term)], dtype=np.float64)
    q_idseqs = {
        qid: np.array([term_to_id.get(t, -1) for t in toks], dtype=np.int64)
        for qid, toks in qtoks.items()
    }
    q_idseqs = {qid: s for qid, s in q_idseqs.items() if (s >= 0).sum() >= 2}
    if not q_idseqs:
        return spark.createDataFrame([], "query_id string, doc_id string, score double, rank int")

    live = [t for t in vocab if t in term_to_id]
    # the fwd table always stores the token sequence (positional mode);
    # candidate docs: ≥2 distinct query terms present
    fwd = tables.fwd(spark)
    cand = (
        fwd.select("shard", "doc_id", "doc_len", "tokens")
        .withColumn(
            "n_match",
            F.size(F.array_intersect(F.array_distinct("tokens"), F.array(*[F.lit(t) for t in live]))),
        )
        .filter(F.col("n_match") >= 2)
        .drop("n_match")
    )

    qw, dw, ordd, K1, B = query_window, doc_window, ordered, k1, b

    def score_part(pdf: pd.DataFrame) -> pd.DataFrame:
        out_q, out_d, out_s = [], [], []
        for row in pdf.itertuples(index=False):
            d_ids = np.array([term_to_id.get(t, -1) for t in row.tokens], dtype=np.int64)
            for qid, q_ids in q_idseqs.items():
                s = close_pair_score(
                    q_ids, d_ids, int(row.doc_len), idf_by_id, avgdl, qw, dw, ordd, K1, B
                )
                if s > 0:
                    out_q.append(qid)
                    out_d.append(row.doc_id)
                    out_s.append(s)
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    scored = cand.groupBy("shard").applyInPandas(
        lambda pdf: score_part(pdf), "query_id string, doc_id string, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
