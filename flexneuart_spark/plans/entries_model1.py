"""Driver entry for IBM Model 1 EM training (C7, training side) with a
generated unrolled-SQL DuckDB oracle.

Reference pipeline: ``apps/CreateBitextFromQRELs.java`` emits parallel
query↔doc-chunk text, then ``scripts/giza/create_tran.sh:124-136`` runs
MGIZA for ``GIZA_ITER_QTY`` Model 1 EM iterations. Here the same bitext
derivation (``entries_ext.q_bitext_pairs``) feeds the Spark-native
relational EM (``operators/model1.model1_em_train``), and the oracle is
the SAME EM recurrence unrolled as a fixed-depth SQL CTE chain — both
sides generated against the identical formulas, the ``ivf_train`` /
``krovetz_stem`` generated-oracle pattern. Probabilities are compared at
6 dp (established cross-engine float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexneuart_spark.operators.model1 import NULL_TOKEN, model1_em_train
from flexneuart_spark.plans.entries_ext import SQL_BITEXT_PAIRS, q_bitext_pairs

EM_ITERATIONS = 2  # fixed unroll depth for the SQL twin


def _bitext_as_pairs(bp: DataFrame) -> DataFrame:
    """(query_id, doc_id, chunk_idx, query_text, chunk_text) →
    (pair_id, src_tokens, tgt_tokens): source = doc chunk, target =
    query, the direction the reference trains (answer→question)."""
    return bp.select(
        F.concat_ws(
            "|", "query_id", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")
        ).alias("pair_id"),
        F.split("chunk_text", " ").alias("src_tokens"),
        F.split("query_text", " ").alias("tgt_tokens"),
    )


def q_model1_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7-train — two EM iterations over the qrels bitext; returns the
    full translation table (s_term, t_term, p_r)."""
    pairs = _bitext_as_pairs(q_bitext_pairs(spark, sf_dir))
    model = model1_em_train(pairs, iterations=EM_ITERATIONS)
    return model.select("s_term", "t_term", F.round("p", 6).alias("p_r"))


def _sql_em_unrolled(iterations: int) -> str:
    """Generate the DuckDB twin: identical init + E/M recurrence,
    unrolled ``iterations`` times over the bitext CTE."""
    ctes = [
        f"bp AS ({SQL_BITEXT_PAIRS})",
        "pairs AS (SELECT query_id || '|' || doc_id || '|' || chunk_idx AS pair_id,"
        " chunk_text, query_text FROM bp)",
        "srcw AS (SELECT pair_id, unnest(string_split(chunk_text, ' ')) AS s_term FROM pairs)",
        "src AS (SELECT pair_id, s_term, CAST(count(*) AS DOUBLE) AS cnt_s FROM srcw GROUP BY 1, 2"
        f" UNION ALL SELECT DISTINCT pair_id, '{NULL_TOKEN}', 1.0 FROM pairs)",
        "tgtw AS (SELECT pair_id, unnest(string_split(query_text, ' ')) AS t_term FROM pairs)",
        "tgt AS (SELECT pair_id, t_term, CAST(count(*) AS DOUBLE) AS cnt_t FROM tgtw GROUP BY 1, 2)",
        "cooc AS (SELECT src.pair_id, s_term, t_term, cnt_s, cnt_t FROM src JOIN tgt USING (pair_id))",
        "sup AS (SELECT DISTINCT s_term, t_term FROM cooc)",
        "t0 AS (SELECT s_term, t_term, 1.0 / count(*) OVER (PARTITION BY s_term) AS p FROM sup)",
    ]
    for i in range(iterations):
        ctes += [
            f"sc{i} AS (SELECT c.pair_id, c.s_term, c.t_term, c.cnt_s * m.p AS score, c.cnt_t"
            f" FROM cooc c JOIN t{i} m USING (s_term, t_term))",
            f"z{i} AS (SELECT pair_id, t_term, sum(score) AS z FROM sc{i} GROUP BY 1, 2)",
            f"cn{i} AS (SELECT s_term, t_term, sum(cnt_t * score / z) AS c"
            f" FROM sc{i} JOIN z{i} USING (pair_id, t_term) GROUP BY 1, 2)",
            f"t{i + 1} AS (SELECT s_term, t_term, c / sum(c) OVER (PARTITION BY s_term) AS p"
            f" FROM cn{i})",
        ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT s_term, t_term, round(p, 6) AS p_r FROM t{iterations}"
    )


SQL_MODEL1_EM = _sql_em_unrolled(EM_ITERATIONS)

MODEL1_QUERIES_REG = {"model1_em": q_model1_em}
MODEL1_ORACLE_SQL = {"model1_em": SQL_MODEL1_EM}
