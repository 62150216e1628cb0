"""Driver-contract entries: one per implemented operator (SURVEY.md §2),
each as a Spark callable ``(spark, sf_dir) -> DataFrame`` plus an exactly
equivalent DuckDB SQL oracle over the same parquet tables.

Float-noise discipline (cross-engine value-hash safety):
- every float output column is ``round(x, 4..6)`` on BOTH sides;
- every ranking is computed over the ROUNDED score with the reference tie
  rule (score desc, doc_id desc — ``flexneuart/io/runs.py:61-72``), so the
  rank and the top-k cut are bitwise-stable across engines;
- every aggregate gets an explicit cast (DuckDB sum(BIGINT)→HUGEINT ≠
  Spark long otherwise).

Tokenization for the ``documents`` table is the verbatim whitespace split
(T9 — the reference's index-level tokenizer): Spark
``split(text,'\\s+')`` minus empties ≡ DuckDB
``list_filter(string_split_regex(text,'\\s+'), x -> x <> '')``.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flexneuart_spark.config import BM25_B, BM25_K1
from flexneuart_spark.functions.tokenize import whitespace_tokens_col
from flexneuart_spark.index.builder import IndexTables, build_index
from flexneuart_spark.search.engine import Searcher

K = 10
ENGINE_BUFFER = 50  # engine fetches extra, re-ranks on rounded score

# Fixed literal query set shared by Spark callables and SQL oracles
# (QuestionFields.jsonl analogue — flexneuart/io/queries.py:13-19).
DOC_QUERIES: list[tuple[str, str]] = [
    ("q1", "hash join"),
    ("q2", "window agg row"),
    ("q3", "scan filter value table"),
    ("q4", "merge batch"),
    ("q5", "the a"),
    ("q6", "spark query oovzzz"),  # includes an out-of-vocabulary term
    ("q7", "customer order line"),
    ("q8", "slow fast sort"),
]

# ---------------------------------------------------------------------------
# Shared SQL building blocks (DuckDB; tables pre-registered as views)
# ---------------------------------------------------------------------------

_QUERY_VALUES = ", ".join(f"('{qid}', '{text}')" for qid, text in DOC_QUERIES)

SQL_TOK = r"""
tokfn AS (SELECT doc_id, text FROM documents),
dl AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS doc_len
  FROM tokfn
),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS term
  FROM tokfn
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(doc_len) AS avgdl FROM dl)
"""

SQL_QTOK = rf"""
qraw AS (SELECT * FROM (VALUES {_QUERY_VALUES}) AS v(query_id, qtext)),
qtok AS (
  SELECT query_id,
         unnest(list_filter(string_split_regex(qtext, '\s+'), x -> x <> '')) AS term
  FROM qraw
),
qtf AS (SELECT query_id, term, CAST(count(*) AS BIGINT) AS qtf FROM qtok GROUP BY 1, 2)
"""

_K1, _B = BM25_K1, BM25_B

SQL_BM25_SCORED = f"""
scored AS (
  SELECT q.query_id, f.doc_id,
         sum(q.qtf
             * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * f.tf * ({_K1} + 1.0)
               / (f.tf + {_K1} * (1.0 - {_B} + {_B} * l.doc_len / s.avgdl))) AS score
  FROM tf f
  JOIN qtf q USING (term)
  JOIN dfreq d USING (term)
  JOIN dl l ON f.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
"""


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", whitespace_tokens_col("text").alias("tokens"))


def _queries_df(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(DOC_QUERIES, ["query_id", "qtext"])
    return df.select("query_id", whitespace_tokens_col("qtext").alias("tokens"))


SQL_REL = r"""
dterms AS (SELECT DISTINCT doc_id, term FROM tok),
qterms AS (SELECT DISTINCT query_id, term FROM qtok),
qsize AS (SELECT query_id, count(*) AS qn FROM qterms GROUP BY 1),
rel AS (
  SELECT m.query_id, m.doc_id
  FROM (SELECT q.query_id, d.doc_id, count(*) AS matched
        FROM dterms d JOIN qterms q USING (term) GROUP BY 1, 2) m
  JOIN qsize s ON m.query_id = s.query_id
  WHERE m.matched = s.qn
)"""


def _rel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived relevance (SQL_REL twin): doc is relevant to a query iff it
    contains ALL the query's distinct terms → (query_id, doc_id)."""
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    dterms = docs_tok.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
    qterms = q_tok.select("query_id", F.explode(F.array_distinct("tokens")).alias("term"))
    qsize = qterms.groupBy("query_id").agg(F.count("*").alias("qn"))
    return (
        dterms.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("matched"))
        .join(F.broadcast(qsize), "query_id")
        .filter(F.col("matched") == F.col("qn"))
        .select("query_id", "doc_id")
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational BM25 score per (query, matching doc) — C1 formula."""
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    dl = docs_tok.select("doc_id", F.size("tokens").cast("long").alias("doc_len"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl"))
    tf = (
        docs_tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    qtf = (
        q_tok.select("query_id", F.explode("tokens").alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qtf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tf_norm = F.col("tf") * F.lit(_K1 + 1.0) / (
        F.col("tf") + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * F.col("doc_len") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(qtf), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(qtf.select("term").distinct()), "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("partial", F.col("qtf") * idf * tf_norm)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("partial").alias("score"))
    )


def _rounded_topk(scored: DataFrame, score_col: str = "score", k: int = K) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score_r"), F.desc("doc_id"))
    return (
        scored.withColumn("score_r", F.round(F.col(score_col), 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_r", "rank")
    )


# ---------------------------------------------------------------------------
# Engine-backed index over the documents table (cached per sf_dir)
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, IndexTables] = {}


def _engine_index(spark: SparkSession, sf_dir: str) -> IndexTables:
    if sf_dir not in _INDEX_CACHE:
        idx = tempfile.mkdtemp(prefix="fxn_docs_idx_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id"), F.col("text").alias("content")
        )
        _INDEX_CACHE[sf_dir] = build_index(
            spark, docs, idx, num_shards=None,  # auto_num_shards sizing rule
            tokenizer="whitespace", text_col="content",
            store_positions=True,  # also serves the close-pair proximity entries
        )
    return _INDEX_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# Entries
# ---------------------------------------------------------------------------

def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/S6 — per-doc forward-index stats: doc_len + unique terms."""
    docs_tok = _doc_tokens(spark, sf_dir)
    return docs_tok.select(
        "doc_id",
        F.size("tokens").cast("long").alias("doc_len"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_unique_terms"),
    )


SQL_DOC_STATS = rf"""
WITH {SQL_TOK}
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS doc_len,
       CAST(count(DISTINCT term) AS BIGINT) AS n_unique_terms
FROM tok t GROUP BY 1
"""


def q_term_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4/A6 — dictionary: df per term, dense 1-based ids in term order,
    idf (BM25SimilarityLucene.java:41-44)."""
    docs_tok = _doc_tokens(spark, sf_dir)
    tf = (
        docs_tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs_tok.count()
    w = Window.orderBy("term")
    return (
        dfreq.withColumn("term_id", F.row_number().over(w).cast("long"))
        .withColumn(
            "idf",
            F.round(
                F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))),
                6,
            ),
        )
        .select("term", "term_id", "df", "idf")
    )


SQL_TERM_DICTIONARY = rf"""
WITH {SQL_TOK}
SELECT term,
       CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS term_id,
       df,
       round(ln(1.0 + ((SELECT n_docs FROM stats) - df + 0.5) / (df + 0.5)), 6) AS idf
FROM dfreq
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — docQty / totalWordQty / avgDocLen (ForwardIndex.java:350-353)."""
    docs_tok = _doc_tokens(spark, sf_dir)
    return docs_tok.select(F.size("tokens").cast("long").alias("dl")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        F.round(F.avg("dl"), 6).alias("avg_doc_len"),
    )


SQL_CORPUS_STATS = rf"""
WITH {SQL_TOK}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_len) AS BIGINT) AS total_tokens,
       round(avg(doc_len), 6) AS avg_doc_len
FROM dl
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/C1 — THE engine: sharded compressed index + MaxScore/block-max
    top-k (LuceneCandidateProvider.java:103-178 analogue). Output re-ranked
    on rounded score for cross-engine stability."""
    tables = _engine_index(spark, sf_dir)
    s = Searcher(spark, tables, tokenizer="whitespace")
    run = s.search(DOC_QUERIES, k=ENGINE_BUFFER, pruned=True)
    run = run.select("query_id", F.col("doc_id").cast("long").alias("doc_id"), "score")
    return _rounded_topk(run)


def q_bm25_topk_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 via the pure-relational formulation (dual-implementation
    cross-check, the compare_eval_tools.py pattern)."""
    return _rounded_topk(_bm25_scored(spark, sf_dir))


SQL_BM25_TOPK = rf"""
WITH {SQL_TOK}, {SQL_QTOK}, {SQL_BM25_SCORED},
topk AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id DESC) AS INT) AS rank
  FROM scored
)
SELECT query_id, doc_id, score_r, rank FROM topk WHERE rank <= {K}
"""


def q_bm25_topk_qnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — BM25 normalized by the query's total idf
    (BM25SimilarityLuceneNorm.java:13-40)."""
    scored = _bm25_scored(spark, sf_dir)
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    n_docs = docs_tok.count()
    tf = (
        docs_tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = q_tok.select("query_id", F.explode("tokens").alias("term")).distinct()
    qnorm = (
        qterms.join(dfreq, "term")
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))),
        )
        .groupBy("query_id")
        .agg(F.sum("idf").alias("qnorm"))
    )
    normed = scored.join(F.broadcast(qnorm), "query_id").withColumn(
        "nscore", F.col("score") / F.col("qnorm")
    )
    return _rounded_topk(normed, "nscore")


SQL_BM25_TOPK_QNORM = rf"""
WITH {SQL_TOK}, {SQL_QTOK}, {SQL_BM25_SCORED},
qnorm AS (
  SELECT q.query_id, sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS qnorm
  FROM (SELECT DISTINCT query_id, term FROM qtok) q
  JOIN dfreq d USING (term) CROSS JOIN stats s
  GROUP BY 1
),
topk AS (
  SELECT sc.query_id, sc.doc_id, round(sc.score / n.qnorm, 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY sc.query_id
              ORDER BY round(sc.score / n.qnorm, 4) DESC, sc.doc_id DESC) AS INT) AS rank
  FROM scored sc JOIN qnorm n ON sc.query_id = n.query_id
)
SELECT query_id, doc_id, score_r, rank FROM topk WHERE rank <= {K}
"""


def q_term_match_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 — #matching distinct query terms / #distinct query terms
    (TermMatchSimilarity.java:30-50), top-k per query."""
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    dterms = docs_tok.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
    qterms = q_tok.select("query_id", F.explode(F.array_distinct("tokens")).alias("term"))
    qsize = qterms.groupBy("query_id").agg(F.count("*").alias("qn"))
    inter = dterms.join(F.broadcast(qterms), "term").groupBy("query_id", "doc_id").agg(
        F.count("*").alias("matched")
    )
    scored = inter.join(F.broadcast(qsize), "query_id").withColumn(
        "overlap", F.col("matched") / F.col("qn")
    )
    return _rounded_topk(scored, "overlap")


SQL_TERM_MATCH_OVERLAP = rf"""
WITH {SQL_TOK}, {SQL_QTOK},
dterms AS (SELECT DISTINCT doc_id, term FROM tok),
qterms AS (SELECT DISTINCT query_id, term FROM qtok),
qsize AS (SELECT query_id, CAST(count(*) AS BIGINT) AS qn FROM qterms GROUP BY 1),
inter AS (
  SELECT q.query_id, d.doc_id, CAST(count(*) AS BIGINT) AS matched
  FROM dterms d JOIN qterms q USING (term) GROUP BY 1, 2
),
topk AS (
  SELECT i.query_id, i.doc_id, round(i.matched * 1.0 / s.qn, 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY i.query_id
              ORDER BY round(i.matched * 1.0 / s.qn, 4) DESC, i.doc_id DESC) AS INT) AS rank
  FROM inter i JOIN qsize s ON i.query_id = s.query_id
)
SELECT query_id, doc_id, score_r, rank FROM topk WHERE rank <= {K}
"""


def q_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — cosine over tf·idf vectors (CosineTextSimilarity.java /
    TFIDFSimilarity.java:24-76 analogue), top-k per query."""
    docs_tok = _doc_tokens(spark, sf_dir)
    q_tok = _queries_df(spark)
    n_docs = docs_tok.count()
    tf = (
        docs_tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    dw = tf.join(dfreq, "term").withColumn("w", F.col("tf") * idf).select("doc_id", "term", "w")
    dnorm = dw.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dnorm"))
    qtf = (
        q_tok.select("query_id", F.explode("tokens").alias("term"))
        .groupBy("query_id", "term").agg(F.count("*").alias("qtf"))
    )
    qw = qtf.join(dfreq, "term").withColumn("qw", F.col("qtf") * idf).select("query_id", "term", "qw")
    qnorm = qw.groupBy("query_id").agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qnorm"))
    dot = (
        dw.join(F.broadcast(qw), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    scored = (
        dot.join(dnorm, "doc_id")
        .join(F.broadcast(qnorm), "query_id")
        .withColumn("cos", F.col("dot") / (F.col("dnorm") * F.col("qnorm")))
    )
    return _rounded_topk(scored, "cos")


SQL_TFIDF_COSINE = rf"""
WITH {SQL_TOK}, {SQL_QTOK},
idf AS (
  SELECT term, ln(1.0 + ((SELECT n_docs FROM stats) - df + 0.5) / (df + 0.5)) AS idf
  FROM dfreq
),
dw AS (SELECT f.doc_id, f.term, f.tf * i.idf AS w FROM tf f JOIN idf i USING (term)),
dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS dnorm FROM dw GROUP BY 1),
qw AS (SELECT q.query_id, q.term, q.qtf * i.idf AS qw FROM qtf q JOIN idf i USING (term)),
qnorm AS (SELECT query_id, sqrt(sum(qw * qw)) AS qnorm FROM qw GROUP BY 1),
dot AS (
  SELECT q.query_id, d.doc_id, sum(d.w * q.qw) AS dot
  FROM dw d JOIN qw q USING (term) GROUP BY 1, 2
),
topk AS (
  SELECT t.query_id, t.doc_id, round(t.dot / (dn.dnorm * qn.qnorm), 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY t.query_id
              ORDER BY round(t.dot / (dn.dnorm * qn.qnorm), 4) DESC, t.doc_id DESC) AS INT) AS rank
  FROM dot t JOIN dnorm dn ON t.doc_id = dn.doc_id JOIN qnorm qn ON t.query_id = qn.query_id
)
SELECT query_id, doc_id, score_r, rank FROM topk WHERE rank <= {K}
"""


def q_vocab_filter_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — FrequentIndexWordFilterAndRecoder analogue: keep only the
    top-20 most frequent terms (df desc, term asc), recount doc lengths."""
    docs_tok = _doc_tokens(spark, sf_dir)
    tf = (
        docs_tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    top = dfreq.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 20).select("term")
    return (
        tf.join(F.broadcast(top), "term")
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("kept_len"), F.count("*").cast("long").alias("kept_unique"))
    )


SQL_VOCAB_FILTER_TOPN = rf"""
WITH {SQL_TOK},
top AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r FROM dfreq
  ) WHERE r <= 20
)
SELECT f.doc_id, CAST(sum(f.tf) AS BIGINT) AS kept_len, CAST(count(*) AS BIGINT) AS kept_unique
FROM tf f JOIN top USING (term) GROUP BY 1
"""


def q_collection_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — CollectionSplitterBase analogue: deterministic hash split
    (md5 of doc_id; 12/2/2 hex-bucket train/dev/test)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(c.isin("c", "d"), F.lit("dev"))
        .when(c.isin("e", "f"), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return docs.select(split.alias("split")).groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs")
    )


SQL_COLLECTION_SPLIT = """
SELECT CASE
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'dev'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
         ELSE 'train'
       END AS split,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""


def q_qrels_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/J3/J7 — derive qrels (grade 1 iff the doc contains ALL distinct
    query terms), join against the BM25 run, per-query P@10, MRR@10,
    recall@10 (hits ÷ TOTAL relevant — reference eval.py::RecallAtK) and
    R-precision over the retrieved window (hits at rank ≤ R, R = total
    relevant, ÷ max(R,1) — reference eval.py::RPrecisionAtK; the window is
    truncated at the run's k=10 like trec_eval on a depth-10 run)."""
    rel = _rel_pairs(spark, sf_dir)
    n_rel = rel.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    run = _rounded_topk(_bm25_scored(spark, sf_dir))
    j = (
        run.join(rel.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left")
        .fillna({"rel": 0})
        .join(F.broadcast(n_rel), "query_id", "left")
        .fillna({"n_rel": 0})
    )
    return (
        j.groupBy("query_id")
        .agg(
            F.round(F.sum("rel") / F.lit(float(K)), 6).alias("p_at_10"),
            F.round(
                F.coalesce(F.max(F.when(F.col("rel") == 1, 1.0 / F.col("rank"))), F.lit(0.0)), 6
            ).alias("mrr_at_10"),
            F.round(
                F.when(F.max("n_rel") > 0, F.sum("rel") / F.max("n_rel")).otherwise(F.lit(0.0)), 6
            ).alias("recall_at_10"),
            F.round(
                F.sum(F.when((F.col("rel") == 1) & (F.col("rank") <= F.col("n_rel")), 1).otherwise(0))
                / F.greatest(F.max("n_rel"), F.lit(1)),
                6,
            ).alias("r_prec"),
        )
    )


SQL_QRELS_EVAL = rf"""
WITH {SQL_TOK}, {SQL_QTOK}, {SQL_BM25_SCORED},
{SQL_REL},
nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY 1),
topk AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id DESC) AS INT) AS rank
  FROM scored
),
run AS (SELECT * FROM topk WHERE rank <= {K})
SELECT r.query_id,
       round(sum(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / {K}, 6) AS p_at_10,
       round(coalesce(max(CASE WHEN rel.doc_id IS NOT NULL THEN 1.0 / r.rank END), 0.0), 6) AS mrr_at_10,
       round(CASE WHEN coalesce(max(n.n_rel), 0) > 0
                  THEN sum(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / max(n.n_rel)
                  ELSE 0.0 END, 6) AS recall_at_10,
       round(sum(CASE WHEN rel.doc_id IS NOT NULL AND r.rank <= coalesce(n.n_rel, 0) THEN 1 ELSE 0 END)
             * 1.0 / greatest(coalesce(max(n.n_rel), 0), 1), 6) AS r_prec
FROM run r
LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
LEFT JOIN nrel n ON r.query_id = n.query_id
GROUP BY 1
"""


def q_neg_sampling_hard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 — ExportTrainNegSampleBase hard negatives: top-scored
    NON-relevant candidates per query (top-5 of the BM25 run minus qrels)."""
    rel = _rel_pairs(spark, sf_dir)
    run = _rounded_topk(_bm25_scored(spark, sf_dir))
    neg = run.join(rel, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= 5)
        .select("query_id", "doc_id", "score_r", "neg_rank")
    )


SQL_NEG_SAMPLING_HARD = rf"""
WITH {SQL_TOK}, {SQL_QTOK}, {SQL_BM25_SCORED},
{SQL_REL},
topk AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id DESC) AS INT) AS rank
  FROM scored
),
run AS (SELECT * FROM topk WHERE rank <= {K}),
neg AS (
  SELECT r.*
  FROM run r LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
  WHERE rel.doc_id IS NULL
)
SELECT query_id, doc_id, score_r,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY rank ASC) AS INT) AS neg_rank
FROM neg QUALIFY neg_rank <= 5
"""


def flagship(spark: SparkSession) -> DataFrame:
    """Driver smoke entry: engine BM25 top-k at sf0.001."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


QUERIES_REG = {
    "doc_stats": q_doc_stats,
    "term_dictionary": q_term_dictionary,
    "corpus_stats": q_corpus_stats,
    "bm25_topk": q_bm25_topk,
    "bm25_topk_relational": q_bm25_topk_relational,
    "bm25_topk_qnorm": q_bm25_topk_qnorm,
    "term_match_overlap": q_term_match_overlap,
    "tfidf_cosine": q_tfidf_cosine,
    "vocab_filter_topn": q_vocab_filter_topn,
    "collection_split": q_collection_split,
    "qrels_eval": q_qrels_eval,
    "neg_sampling_hard": q_neg_sampling_hard,
}

ORACLE_SQL = {
    "doc_stats": SQL_DOC_STATS,
    "term_dictionary": SQL_TERM_DICTIONARY,
    "corpus_stats": SQL_CORPUS_STATS,
    "bm25_topk": SQL_BM25_TOPK,
    "bm25_topk_relational": SQL_BM25_TOPK,
    "bm25_topk_qnorm": SQL_BM25_TOPK_QNORM,
    "term_match_overlap": SQL_TERM_MATCH_OVERLAP,
    "tfidf_cosine": SQL_TFIDF_COSINE,
    "vocab_filter_topn": SQL_VOCAB_FILTER_TOPN,
    "collection_split": SQL_COLLECTION_SPLIT,
    "qrels_eval": SQL_QRELS_EVAL,
    "neg_sampling_hard": SQL_NEG_SAMPLING_HARD,
}
