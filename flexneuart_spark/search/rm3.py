"""RM3 pseudo-relevance-feedback rescoring (condensed-list / rerank-only).

Clean-room re-expression of the reference's
``java/.../letor/FeatExtractorRM3Similarity.java`` — "Re-ranking RM3
similarity (i.e., without extra retrieval step), largely as described in
'Condensed List Relevance Models', Fernando Diaz, ICTIR 2015", with BM25
scores standing in for p(w|D):

1. candidates = per-query top ``cand_qty`` docs by query-IDF-normalized
   BM25 (``BM25SimilarityLuceneNorm.java:13-40``), the reference's
   candidate-provider list;
2. the top ``top_doc_qty`` candidates form the relevance model: each
   doc's terms are weighted ``docScore/Σ(topDocScores) · termBM25``
   where ``termBM25`` is the per-term document score
   ``idf·tf(k1+1)/(tf + k1(1−b+b·dl/avgdl))``
   (``BM25SimilarityLucene.java:99-108`` ``getDocTermScore``);
3. the ``top_term_qty`` heaviest terms are kept and L1-normalized
   (``FeatExtractorRM3Similarity.java:137-152``);
4. every candidate is rescored
   ``origWeight·BM25norm + (1−origWeight)·Σ_{w∈doc∩topTerms} weight(w)``
   (``FeatExtractorRM3Similarity.java:160-182`` — the RM1 sum is over a
   doc's DISTINCT terms, presence-based, not tf-weighted).

Reference quirk, mirrored behind a flag: the Java accumulation loop calls
``topDocTerms.clear()`` INSIDE the per-top-doc loop
(``FeatExtractorRM3Similarity.java:126-136``), so the shipped extractor
builds the relevance model from the LAST top doc only (still divided by
the all-top-docs normalizer). ``accumulate=True`` (default) is the
paper-correct RM1 sum over all top docs; ``accumulate=False`` reproduces
the Java byte-for-byte behavior (verified by a hand-traced unit test).

Scale posture — NO corpus-wide shuffle anywhere: a naive formulation
builds the full (doc, term, tf) posting table (a corpus-sized groupBy,
the dominant cost at 100 TB) and re-derives it for each of RM3's three
posting reads. Instead every aggregation runs AFTER a broadcast
semi-join cut the scan down to what RM3 actually touches:

- query-term postings (scan ⋈ broadcast query terms, then groupBy —
  shuffle bounded by matching postings, the same data BM25 must move);
- top-doc postings (scan ⋈ broadcast ≤ queries·top_doc_qty doc ids —
  broadcast hash join, no shuffle of the corpus);
- corpus df of top-doc terms (scan ⋈ broadcast top-doc term set);
- candidate-doc term sets for the RM1 sum (scan ⋈ broadcast candidate
  ids ⋈ broadcast ≤ queries·top_term_qty model terms).

The tiny pivot tables the plan fans out from (candidates, top docs, top
terms) are ``localCheckpoint``-ed — they are queries·k-row small, and
cutting their lineage stops Spark re-running the whole scoring pipeline
once per downstream read (blocks reclaimed by the ContextCleaner, the
dedup.py:119-124 pattern).

Determinism: every selection boundary (candidate cut, top-doc cut,
top-term cut) ranks a ROUNDED value with a total tie order
(score desc, doc_id desc — ``flexneuart/io/runs.py:61-72`` — and
weight desc, term asc for terms), so Spark and a SQL oracle make
identical cuts despite float-summation-order noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flexneuart_spark.config import BM25_B, BM25_K1

_EPS = 1e-9  # Math.max(norm, 1e-9) guards, FeatExtractorRM3Similarity.java:123,141


def rm3_rescore(
    docs_tok: DataFrame,
    q_tok: DataFrame,
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    cand_qty: int = 20,
    top_doc_qty: int = 3,
    top_term_qty: int = 10,
    orig_weight: float = 0.5,
    accumulate: bool = True,
    materialize: bool = True,
) -> DataFrame:
    """(query_id, doc_id, nscore, rm1, rm3_score) for the per-query
    candidate pool. ``docs_tok``/``q_tok`` carry (id, tokens) like every
    feature extractor in this repo. ``materialize=False`` keeps the plan
    fully lazy (for plan-shape inspection); the default checkpoints the
    three tiny pivot tables."""
    if not 0.0 <= orig_weight <= 1.0:
        raise ValueError("orig_weight must be in [0, 1]")  # java ctor check

    def _pin(df: DataFrame) -> DataFrame:
        return df.localCheckpoint() if materialize else df

    # one corpus scan, map-side partial agg, 1-row result
    stats = docs_tok.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("tokens")).alias("avgdl")
    )
    posts = docs_tok.select(
        "doc_id", F.size("tokens").alias("doc_len"), F.explode("tokens").alias("term")
    )
    idf_col = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    # getDocTermScore (BM25SimilarityLucene.java:99-108)
    tscore_col = idf_col * F.col("tf") * F.lit(k1 + 1.0) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl"))
    )

    qt = (
        q_tok.select("query_id", F.explode("tokens").alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qtf"))
    )
    # postings restricted to query terms BEFORE any shuffle
    qposts = (
        posts.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("doc_id", "term", "doc_len")
        .agg(F.count("*").alias("tf"))
    )
    qposts = _pin(qposts)
    # corpus df of a query term == #docs carrying it == its qposts rows
    dfq = qposts.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        qposts.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qtf") * tscore_col).alias("score"))
    )
    # query-IDF normalizer (BM25SimilarityLuceneNorm.getNormIDF: distinct
    # in-vocabulary query terms; score unchanged when the sum is 0)
    qnorm = (
        qt.select("query_id", "term")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", idf_col)
        .groupBy("query_id")
        .agg(F.sum("idf").alias("qn"))
    )
    nsc = scored.join(F.broadcast(qnorm), "query_id", "left").select(
        "query_id",
        "doc_id",
        F.when(F.col("qn") > 0, F.col("score") / F.col("qn")).otherwise(F.col("score")).alias("nscore"),
    )

    cw = Window.partitionBy("query_id").orderBy(F.desc(F.round(F.col("nscore"), 4)), F.desc("doc_id"))
    cand = nsc.withColumn("crank", F.row_number().over(cw)).filter(F.col("crank") <= cand_qty)
    cand = _pin(cand)  # <= queries*cand_qty rows; every later stage fans out from it

    topdoc = cand.filter(F.col("crank") <= top_doc_qty)
    if not accumulate:
        # Java: topDocTerms.clear() per doc -> only the LAST top doc
        # (rank min(top_doc_qty, |cands|)) contributes terms; the score
        # normalizer still sums ALL top docs.
        last = topdoc.groupBy("query_id").agg(F.max("crank").alias("lrank"))
        model_docs = topdoc.join(F.broadcast(last), "query_id").filter(
            F.col("crank") == F.col("lrank")
        )
    else:
        model_docs = topdoc
    dnorm = topdoc.groupBy("query_id").agg(F.sum("nscore").alias("dn"))

    # top-doc postings: corpus scan gated by a broadcast of <= q*top_doc
    # doc ids (broadcast hash join — the corpus is never shuffled)
    td_posts = (
        posts.join(F.broadcast(model_docs.select("doc_id").distinct()), "doc_id")
        .groupBy("doc_id", "term", "doc_len")
        .agg(F.count("*").alias("tf"))
    )
    td_posts = _pin(td_posts)
    # corpus df for the top docs' terms (second gated scan)
    dftd = (
        posts.join(F.broadcast(td_posts.select("term").distinct()), "term")
        .select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    relw = (
        td_posts.join(F.broadcast(dftd), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", tscore_col)
        .join(F.broadcast(model_docs.select("query_id", "doc_id", "nscore")), "doc_id")
        .join(F.broadcast(dnorm), "query_id")
        .groupBy("query_id", "term")
        .agg(
            F.sum(
                F.col("nscore") / F.greatest(F.col("dn"), F.lit(_EPS)) * F.col("term_score")
            ).alias("w")
        )
    )
    tw = Window.partitionBy("query_id").orderBy(F.desc(F.round(F.col("w"), 6)), F.asc("term"))
    topterm = relw.withColumn("trank", F.row_number().over(tw)).filter(
        F.col("trank") <= top_term_qty
    )
    tnorm = topterm.groupBy("query_id").agg(F.sum("w").alias("tn"))
    topterm_n = topterm.join(F.broadcast(tnorm), "query_id").select(
        "query_id", "term", (F.col("w") / F.greatest(F.col("tn"), F.lit(_EPS))).alias("tweight")
    )
    topterm_n = _pin(topterm_n)  # <= queries*top_term_qty rows

    # RM1 sum over each candidate doc's DISTINCT terms present in the
    # model (third gated scan: candidate ids + model terms, both broadcast)
    cand_terms = (
        posts.select("doc_id", "term")
        .join(F.broadcast(cand.select("query_id", "doc_id")), "doc_id")
        .join(F.broadcast(topterm_n.select("query_id", "term").distinct()), ["query_id", "term"])
        .distinct()
    )
    rm1 = (
        cand_terms.join(F.broadcast(topterm_n), ["query_id", "term"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tweight").alias("rm1"))
    )
    return (
        cand.join(rm1, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            "nscore",
            F.coalesce(F.col("rm1"), F.lit(0.0)).alias("rm1"),
            (
                F.lit(orig_weight) * F.col("nscore")
                + F.lit(1.0 - orig_weight) * F.coalesce(F.col("rm1"), F.lit(0.0))
            ).alias("rm3_score"),
        )
    )
