"""Driver-contract entries pulling the remaining reference surfaces into
tested scope: IBM Model 1 scoring (§2.8 C7), the BM25 sparse-vector
export (§2.1 S9 / §2.8 C9), and bitext generation (§2.9 R3) — each with
an exact DuckDB oracle over the same parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexneuart_spark.operators.model1 import (
    MIN_MODEL1_PROB,
    MODEL1_LAMBDA,
    PROB_OOV,
    PROB_SELF_TRAN,
    first_char_tran_table,
    model1_scores,
)
from flexneuart_spark.plans.entries import (
    DOC_QUERIES,
    K,
    SQL_BM25_SCORED,
    SQL_QTOK,
    SQL_REL,
    SQL_TOK,
    _doc_tokens,
    _queries_df,
    _rel_pairs,
    _rounded_topk,
)
from flexneuart_spark.search.bm25 import bm25_sparse_vectors

# ---------------------------------------------------------------------------
# model1_score (C7)
# ---------------------------------------------------------------------------


def q_model1_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    tf = (
        docs_tok.select(F.explode("tokens").alias("term"), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qvocab = q_tok.select(F.explode("tokens").alias("term"))
    tran = first_char_tran_table(dfreq, qvocab)
    scored = model1_scores(docs_tok, q_tok, tran)
    return _rounded_topk(scored)


SQL_MODEL1_SCORE = rf"""
WITH {SQL_TOK}, {SQL_QTOK},
grp AS (SELECT term, substr(term, 1, 1) AS c, df FROM dfreq),
gsum AS (SELECT c, sum(df) AS sdf, count(*) AS n FROM grp GROUP BY 1),
qvocab AS (SELECT DISTINCT term FROM qtok),
tran AS (
  SELECT w.term AS w_term, q.term AS q_term,
         CASE WHEN w.term = q.term THEN CASE WHEN g.n = 1 THEN 1.0 ELSE {PROB_SELF_TRAN} END
              ELSE (1.0 - {PROB_SELF_TRAN}) * q.df / (g.sdf - w.df) END AS p
  FROM grp w
  JOIN gsum g USING (c)
  JOIN grp q USING (c)
  WHERE q.term IN (SELECT term FROM qvocab)
),
dl_pos AS (SELECT * FROM dl WHERE doc_len > 0),
p_src AS (
  SELECT f.doc_id, f.term AS w_term, f.tf * 1.0 / l.doc_len AS p_src
  FROM tf f JOIN dl_pos l ON f.doc_id = l.doc_id
),
ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
total AS (SELECT sum(doc_len) AS total_tokens FROM dl_pos),
cp AS (
  SELECT v.term AS q_term,
         greatest({PROB_OOV}, coalesce(c.ctf * 1.0 / t.total_tokens, 0.0)) AS cp
  FROM qvocab v LEFT JOIN ctf c ON v.term = c.term CROSS JOIN total t
),
tot AS (
  SELECT s.doc_id, tr.q_term, sum(tr.p * s.p_src) AS tot
  FROM p_src s JOIN tran tr ON s.w_term = tr.w_term
  WHERE tr.p >= {MIN_MODEL1_PROB}
  GROUP BY 1, 2
),
qnorm AS (
  SELECT query_id, CAST(greatest(1, count(DISTINCT term)) AS DOUBLE) AS qnorm
  FROM qtok GROUP BY 1
),
scored AS (
  SELECT q.query_id, t.doc_id,
         sum(q.qtf * (ln((1.0 - {MODEL1_LAMBDA}) * t.tot + {MODEL1_LAMBDA} * c.cp)
                      - ln({MODEL1_LAMBDA} * c.cp))) / any_value(n.qnorm) AS score
  FROM tot t
  JOIN qtf q ON q.term = t.q_term
  JOIN cp c ON c.q_term = t.q_term
  JOIN qnorm n ON n.query_id = q.query_id
  GROUP BY 1, 2
),
topk AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY round(score, 4) DESC, doc_id DESC) AS INT) AS rank
  FROM scored
)
SELECT query_id, doc_id, score_r, rank FROM topk WHERE rank <= {K}
"""

# ---------------------------------------------------------------------------
# sparse_export (S9 / C9)
# ---------------------------------------------------------------------------


def q_sparse_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    vec = bm25_sparse_vectors(_doc_tokens(spark, sf_dir))
    return vec.select("doc_id", "term", F.round("value", 6).alias("value_r"))


SQL_SPARSE_EXPORT = rf"""
WITH {SQL_TOK}
SELECT f.doc_id, f.term,
       round(sqrt(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)))
             * f.tf * (1.2 + 1.0) / (f.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.doc_len / s.avgdl)),
             6) AS value_r
FROM tf f
JOIN dfreq d USING (term)
JOIN dl l ON f.doc_id = l.doc_id
CROSS JOIN stats s
"""

# ---------------------------------------------------------------------------
# bitext_pairs (R3)
# ---------------------------------------------------------------------------

BITEXT_RATIO = 2  # max #doc-words per emitted chunk = ratio x #query-words
                  # (CreateBitextFromQRELs -max_doc_query_qty_ratio,
                  #  apps/CreateBitextFromQRELs.java:58,270-308)


def q_bitext_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 — parallel query↔relevant-doc text for translation-model
    training: for each (query, relevant doc) pair (relevance = the
    qrels_eval derivation: doc contains ALL distinct query terms), the
    doc token sequence is chunked into windows of ``ratio · |query|``
    words, each aligned with the full query (the reference emits one
    question/answer line pair per chunk)."""
    rel = _rel_pairs(spark, sf_dir)
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    q = q_tok.select(
        "query_id",
        F.concat_ws(" ", "tokens").alias("query_text"),
        F.greatest(F.lit(1), F.size("tokens") * BITEXT_RATIO).alias("csize"),
    )
    d = docs_tok.select("doc_id", "tokens", F.size("tokens").alias("dlen")).filter(
        F.col("dlen") > 0
    )
    j = rel.join(q, "query_id").join(d, "doc_id")
    chunks = j.select(
        "query_id",
        "doc_id",
        "query_text",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.col("dlen") / F.col("csize")).cast("int") - 1)
        ).alias("chunk_idx"),
        "tokens",
        "csize",
    )
    return chunks.select(
        "query_id",
        "doc_id",
        "chunk_idx",
        "query_text",
        F.concat_ws(
            " ", F.slice("tokens", F.col("chunk_idx") * F.col("csize") + 1, F.col("csize"))
        ).alias("chunk_text"),
    )


SQL_BITEXT_PAIRS = rf"""
WITH {SQL_TOK}, {SQL_QTOK},
{SQL_REL},
ql AS (
  SELECT query_id,
         array_to_string(list_filter(string_split_regex(qtext, '\s+'), x -> x <> ''), ' ') AS query_text,
         greatest(1, len(list_filter(string_split_regex(qtext, '\s+'), x -> x <> '')) * {BITEXT_RATIO}) AS csize
  FROM qraw
),
dlst AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
  FROM documents
),
j AS (
  SELECT r.query_id, r.doc_id, q.query_text, q.csize, d.l, len(d.l) AS dlen
  FROM rel r JOIN ql q ON r.query_id = q.query_id JOIN dlst d ON r.doc_id = d.doc_id
  WHERE len(d.l) > 0
)
SELECT query_id, doc_id, CAST(i AS INT) AS chunk_idx, query_text,
       array_to_string(list_slice(l, i * csize + 1, least((i + 1) * csize, dlen)), ' ') AS chunk_text
FROM j, unnest(range(CAST(ceil(dlen * 1.0 / csize) AS BIGINT))) AS t(i)
"""


# ---------------------------------------------------------------------------
# id_mapping (J4)
# ---------------------------------------------------------------------------


def q_id_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — IdMapperCandidateProvider: run the backend retrieval (BM25
    top-k), map every retrieved id through a (possibly one-to-many) id
    map, aggregate per mapped id (max; ``isAggregSum=false`` default),
    re-sort, truncate to k (``cand_providers/IdMapperCandidateProvider.java:
    91-129``). The map here is deterministic arithmetic over the numeric
    doc_id (parent = doc_id/10; every 7th doc also maps to parent+1000 —
    exercising the whitespace-multi-mapping path)."""
    from flexneuart_spark.plans.entries import _bm25_scored

    run = _rounded_topk(_bm25_scored(spark, sf_dir))
    base = F.floor(F.col("doc_id") / 10).cast("long")
    mapped = run.select(
        "query_id",
        "score_r",
        F.explode(
            F.when(F.col("doc_id") % 7 == 0, F.array(base, base + 1000)).otherwise(F.array(base))
        ).alias("mapped_id"),
    )
    agg = mapped.groupBy("query_id", "mapped_id").agg(F.max("score_r").alias("score_r"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.desc("mapped_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= K)
        .select("query_id", "mapped_id", "score_r", "rank")
    )


SQL_ID_MAPPING = rf"""
WITH {SQL_TOK}, {SQL_QTOK},
{SQL_BM25_SCORED},
run AS (
  SELECT * FROM (
    SELECT query_id, doc_id, round(score, 4) AS score_r,
           row_number() OVER (PARTITION BY query_id
                ORDER BY round(score, 4) DESC, doc_id DESC) AS rank
    FROM scored) WHERE rank <= {K}
),
mapped AS (
  SELECT query_id, score_r,
         unnest(CASE WHEN doc_id % 7 = 0
                     THEN [CAST(floor(doc_id / 10) AS BIGINT), CAST(floor(doc_id / 10) + 1000 AS BIGINT)]
                     ELSE [CAST(floor(doc_id / 10) AS BIGINT)] END) AS mapped_id
  FROM run
),
agg AS (SELECT query_id, mapped_id, max(score_r) AS score_r FROM mapped GROUP BY 1, 2)
SELECT query_id, mapped_id, score_r,
       CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY score_r DESC, mapped_id DESC) AS rank FROM agg)
WHERE rank <= {K}
"""


# ---------------------------------------------------------------------------
# cedr_export (S10)
# ---------------------------------------------------------------------------


def q_cedr_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 — ExportTrainCEDR line format (``apps/ExportTrainCEDR.java:
    103-160``): data-file lines ``query\\t<qid>\\t<text>`` (whitespace
    collapsed) and ``doc\\t<did>\\t<text>``, plus train-pair lines
    ``<qid>\\t<did>``. Pairs = positives (the qrels derivation) ∪ the R1
    hard negatives; doc lines are emitted once per referenced doc.
    Returned as (kind, line) rows — kind names the output file."""
    from flexneuart_spark.plans.entries import _bm25_scored

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rel = _rel_pairs(spark, sf_dir)
    run = _rounded_topk(_bm25_scored(spark, sf_dir))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    neg = (
        run.join(rel, ["query_id", "doc_id"], "left_anti")
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= 5)
        .select("query_id", "doc_id")
    )
    pairs = rel.unionByName(neg).distinct()

    ws_collapse = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731
    q_lines = (
        spark.createDataFrame(DOC_QUERIES, ["query_id", "qtext"])
        .join(pairs.select("query_id").distinct(), "query_id")
        .select(
            F.lit("data").alias("kind"),
            F.concat(F.lit("query\t"), F.col("query_id"), F.lit("\t"), ws_collapse("qtext")).alias("line"),
        )
    )
    d_lines = (
        docs.join(pairs.select("doc_id").distinct(), "doc_id")
        .select(
            F.lit("data").alias("kind"),
            F.concat(F.lit("doc\t"), F.col("doc_id").cast("string"), F.lit("\t"), ws_collapse("text")).alias("line"),
        )
    )
    p_lines = pairs.select(
        F.lit("pairs").alias("kind"),
        F.concat(F.col("query_id"), F.lit("\t"), F.col("doc_id").cast("string")).alias("line"),
    )
    return q_lines.unionByName(d_lines).unionByName(p_lines)


SQL_CEDR_EXPORT = rf"""
WITH {SQL_TOK}, {SQL_QTOK},
{SQL_REL},
{SQL_BM25_SCORED},
run AS (
  SELECT * FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                ORDER BY round(score, 4) DESC, doc_id DESC) AS rank
    FROM scored) WHERE rank <= {K}
),
neg AS (
  SELECT query_id, doc_id FROM (
    SELECT r.query_id, r.doc_id,
           row_number() OVER (PARTITION BY r.query_id ORDER BY r.rank ASC) AS neg_rank
    FROM run r LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
    WHERE rel.doc_id IS NULL)
  WHERE neg_rank <= 5
),
pairs AS (SELECT DISTINCT * FROM (SELECT * FROM rel UNION SELECT * FROM neg)),
q_lines AS (
  SELECT 'data' AS kind,
         'query' || chr(9) || query_id || chr(9) || trim(regexp_replace(qtext, '\s+', ' ', 'g')) AS line
  FROM qraw WHERE query_id IN (SELECT DISTINCT query_id FROM pairs)
),
d_lines AS (
  SELECT 'data' AS kind,
         'doc' || chr(9) || CAST(d.doc_id AS VARCHAR) || chr(9) || trim(regexp_replace(d.text, '\s+', ' ', 'g')) AS line
  FROM documents d WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM pairs)
),
p_lines AS (
  SELECT 'pairs' AS kind, query_id || chr(9) || CAST(doc_id AS VARCHAR) AS line FROM pairs
)
SELECT * FROM q_lines UNION ALL SELECT * FROM d_lines UNION ALL SELECT * FROM p_lines
"""


EXT_QUERIES_REG = {
    "model1_score": q_model1_score,
    "sparse_export": q_sparse_export,
    "bitext_pairs": q_bitext_pairs,
    "id_mapping": q_id_mapping,
    "cedr_export": q_cedr_export,
}

EXT_ORACLE_SQL = {
    "model1_score": SQL_MODEL1_SCORE,
    "sparse_export": SQL_SPARSE_EXPORT,
    "bitext_pairs": SQL_BITEXT_PAIRS,
    "id_mapping": SQL_ID_MAPPING,
    "cedr_export": SQL_CEDR_EXPORT,
}
