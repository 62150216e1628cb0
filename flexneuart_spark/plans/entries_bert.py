"""Driver entry for BERT retokenization (T5) with a generated DuckDB
oracle.

Reference: ``flexneuart/text_proc/parse.py:199-223`` — re-tokenize a text
field into a space-joined WordPiece token string (``text_bert_tok``).
Both the Spark pandas-UDF side and the oracle SQL derive from the SAME
committed vocab fixture (``functions/wordpiece_vocab.txt``), the
``krovetz_stem`` generated-oracle pattern, so they cannot drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flexneuart_spark.functions.wordpiece import (
    bert_tok_col,
    load_vocab,
    sql_wordpiece_query,
)

_VOCAB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "functions", "wordpiece_vocab.txt")
_VOCAB = load_vocab(_VOCAB_PATH)


def q_bert_tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — WordPiece-retokenized document text (basic tokenize →
    greedy longest-match-first against the committed vocab), one Arrow
    batch per pandas chunk; pure map stage, zero shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", bert_tok_col("text", _VOCAB).alias("bert_tok"))


SQL_BERT_TOK = sql_wordpiece_query(_VOCAB)

BERT_QUERIES_REG = {"bert_tok": q_bert_tok}
BERT_ORACLE_SQL = {"bert_tok": SQL_BERT_TOK}
