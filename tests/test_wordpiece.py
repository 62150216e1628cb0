"""Goldens for the pure-Python WordPiece retokenizer (reference T5,
``flexneuart/text_proc/parse.py:199-223``): fixed-string expectations
computed by hand from the published BERT algorithm, plus Spark-column ↔
generated-DuckDB-oracle equivalence on the driver corpus."""

from __future__ import annotations

import duckdb
import pytest

from flexneuart_spark.functions.wordpiece import (
    WordPieceTokenizer,
    basic_tokenize,
    bert_tok_col,
    load_vocab,
    sql_wordpiece_query,
)
from flexneuart_spark.plans.entries_bert import _VOCAB_PATH

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vocab():
    return load_vocab(_VOCAB_PATH)


@pytest.fixture(scope="module")
def tk(vocab):
    return WordPieceTokenizer(vocab)


def test_basic_tokenize_punct_and_case():
    assert basic_tokenize("The Spark-stream runs!") == [
        "the", "spark", "-", "stream", "runs", "!"]
    assert basic_tokenize("x==42;") == ["x", "=", "=", "42", ";"]
    # control chars dropped, unicode accents stripped (NFD → drop Mn)
    assert basic_tokenize("café\x00\x1f bar") == ["cafe", "bar"]


GOLDENS = [
    # greedy longest-match-first with ## continuations
    ("customer filter merge", "cust ##omer fil ##ter mer ##ge"),
    ("The Spark query!", "the sp ##ark qu ##ery !"),
    # un- prefix matches; rest falls to char pieces
    ("unwanted", "un ##w ##a ##n ##t ##ed"),
    # digits split to char pieces; punctuation split to single tokens
    ("x9 == 42", "x ##9 = = 4 ##2"),
    # full-word hits stay whole
    ("join hash row scan", "join hash row scan"),
    ("", ""),
]


@pytest.mark.parametrize("text,want", GOLDENS)
def test_wordpiece_goldens(tk, text, want):
    assert tk.retokenize(text) == want


def test_unk_for_unmatchable_and_long_words(vocab):
    # a vocab without char fallbacks → unmatchable word becomes [UNK]
    small = WordPieceTokenizer(["the", "##s"])
    assert small.tokenize("the zzz") == ["the", "[UNK]"]
    # words over 100 chars are [UNK] without matching (BERT rule)
    tk = WordPieceTokenizer(vocab)
    assert tk.tokenize("a" * 101) == ["[UNK]"]
    assert tk.tokenize("a" * 100) != ["[UNK]"]


def test_spark_column_matches_generated_oracle(spark, vocab):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {r.doc_id: r.bert_tok
           for r in docs.select("doc_id", bert_tok_col("text", vocab).alias("bert_tok")).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = dict(con.execute(sql_wordpiece_query(vocab)).fetchall())
    assert got == want and len(got) == 500


def test_corpus_is_ascii_so_sql_oracle_semantics_match():
    # the generated oracle skips accent-stripping; valid iff the driver
    # corpus is pure ASCII — assert that precondition explicitly
    rows = duckdb.sql(f"select text from '{SF_DIR}/documents.parquet'").fetchall()
    assert all(t.isascii() for (t,) in rows)
