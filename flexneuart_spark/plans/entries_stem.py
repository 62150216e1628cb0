"""Driver entry for Krovetz stemming (T2) with an exact DuckDB oracle.

The oracle SQL is GENERATED from the same rule spec as the Python engine
(``functions/kstem.py::sql_stem_ctes``), so the two sides cannot drift.
Pipeline shape = reference ``KrovetzStemParser``
(``flexneuart/text_proc/parse.py:55-77``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexneuart_spark.functions.kstem import krovetz_stem_col, sql_stem_ctes

KSTEM_STOPS = ["is", "a", "the", "of", "and"]


def q_krovetz_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — Krovetz-stemmed document text (lowercase → drop non-alnum →
    stop-word removal → rule-engine stemming), one Arrow batch per pandas
    group; no per-row Python at the Spark layer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", krovetz_stem_col("text", KSTEM_STOPS).alias("stemmed"))


_STOPS_SQL = ", ".join(f"'{w}'" for w in KSTEM_STOPS)

SQL_KROVETZ_STEM = rf"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]+', ' ', 'g'),
                             '\s+', ' ', 'g')) AS s
  FROM documents
),
toks AS (
  SELECT doc_id,
         unnest(string_split(s, ' ')) AS tok,
         unnest(range(1, len(string_split(s, ' ')) + 1)) AS pos
  FROM norm WHERE s <> ''
),
toksf AS (SELECT * FROM toks WHERE tok <> '' AND tok NOT IN ({_STOPS_SQL})),
{sql_stem_ctes('toksf')},
agg AS (SELECT doc_id, string_agg(stem, ' ' ORDER BY pos) AS stemmed FROM stemmed GROUP BY 1)
SELECT n.doc_id, coalesce(a.stemmed, '') AS stemmed
FROM norm n LEFT JOIN agg a USING (doc_id)
"""

STEM_QUERIES_REG = {"krovetz_stem": q_krovetz_stem}
STEM_ORACLE_SQL = {"krovetz_stem": SQL_KROVETZ_STEM}
