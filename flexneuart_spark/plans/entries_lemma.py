"""Driver entry for the rule lemmatizer (T1 lemma view) with a
generated DuckDB oracle.

Reference: ``flexneuart/text_proc/parse.py:138-167`` (``proc_text`` —
the (lemmatized text, surface text) pair with surface-or-lemma stop-word
removal). The testdata ``documents`` table contains only base-form
tokens, so the entry lemmatizes a deterministically INFLECTED view (each
token gets a position-cycled '', 's', 'ing', 'ed' suffix) — the rule
table, exception table, and dictionary all actually fire in the driver's
hash comparison, and the oracle applies the identical cycle in SQL.
Both sides are generated from the same spec (``functions/lemma.py``),
the ``krovetz_stem`` pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flexneuart_spark.functions.lemma import (
    lemma_pair_col,
    load_lemma_dict,
    sql_lemma_query,
)

LEMMA_STOPS = ["a", "the"]
_DICT = load_lemma_dict()


def q_text_lemma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 lemma view — (doc_id, lemmas, tokens) over the inflected
    document text; one Arrow batch per pandas chunk, zero shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pair = lemma_pair_col("text", _DICT, LEMMA_STOPS, inflect=True)
    return docs.withColumn("_p", pair).select(
        "doc_id",
        F.col("_p.lemmas").alias("lemmas"),
        F.col("_p.tokens").alias("tokens"),
    )


SQL_TEXT_LEMMA = sql_lemma_query(_DICT, LEMMA_STOPS, inflect=True)

LEMMA_QUERIES_REG = {"text_lemma": q_text_lemma}
LEMMA_ORACLE_SQL = {"text_lemma": SQL_TEXT_LEMMA}
