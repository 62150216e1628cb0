"""Rule-lemmatizer goldens + Spark/DuckDB twin equivalence (T1 slot).

Reference contract: ``flexneuart/text_proc/parse.py:138-167``
(``proc_text`` returns the (lemmas, surface) pair, drops a token when
the surface form OR its lemma is a stop word).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flexneuart_spark.functions.lemma import (
    EXCEPTIONS,
    lemma_pair_col,
    lemma_token,
    lemmatize_text,
    load_lemma_dict,
    sql_lemma_query,
)

DICT = load_lemma_dict()

GOLDENS = [
    # suffix rules, dictionary-validated
    ("running", "run"),
    ("joining", "join"),
    ("merging", "merge"),
    ("making", "make"),
    ("stopped", "stop"),
    ("joined", "join"),
    ("merged", "merge"),
    ("cities", "city"),
    ("classes", "class"),
    ("churches", "church"),
    ("dishes", "dish"),
    ("boxes", "box"),
    ("wolves", "wolf"),
    ("knives", "knife"),
    ("policemen", "policeman"),
    ("joins", "join"),
    ("tables", "table"),
    ("happier", "happy"),
    ("happiest", "happy"),
    ("bigger", "big"),
    ("biggest", "big"),
    ("larger", "large"),
    ("largest", "large"),
    ("faster", "fast"),
    # irregulars via the exception table
    ("went", "go"),
    ("children", "child"),
    ("better", "good"),
    ("wrote", "write"),
    ("mice", "mouse"),
    ("was", "be"),
    ("indices", "index"),
    # identity: base forms are their own lemma
    ("window", "window"),
    ("query", "query"),
    ("glass", "glass"),     # -ss guard on the bare-s rule
    ("basis", "basis"),     # -is guard
    # unknown tokens pass through unchanged
    ("zzzqx", "zzzqx"),
    ("frobnicating", "frobnicating"),
]


@pytest.mark.parametrize("tok,want", GOLDENS)
def test_lemma_goldens(tok, want):
    assert lemma_token(tok, DICT) == want


def test_proc_text_contract():
    lemmas, tokens = lemmatize_text(
        "The  children were running; wolves ATE classes!",
        DICT, frozenset({"the", "a"}), {},
    )
    # 'the' dropped (surface stop), rest lemmatized; surface keeps inflection
    assert lemmas == "child be run wolf eat class"
    assert tokens == "children were running wolves ate classes"
    # stop match on the LEMMA side also drops the token (reference checks both)
    lemmas2, tokens2 = lemmatize_text("went going", DICT, frozenset({"go"}), {})
    assert lemmas2 == "" and tokens2 == ""
    assert lemmatize_text("", DICT, frozenset(), {}) == ("", "")


def test_exceptions_map_into_dictionary():
    # every exception target should itself be a known base form
    missing = {v for v in EXCEPTIONS.values() if v not in DICT}
    assert not missing, f"exception lemmas missing from dictionary: {missing}"


def test_spark_matches_generated_sql_oracle(spark, tmp_path_factory):
    import pandas as pd

    rows = [
        ("d0", "the children were running through large cities"),
        ("d1", "wolves and mice ate classes of data"),
        ("d2", ""),
        ("d3", "spark merges sorted batches, joining streams!"),
        ("d4", "unknownzz frobnicating zzz"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("lemma_docs"))
    path = f"{d}/documents.parquet"
    pdf.to_parquet(path)

    sdf = (
        spark.read.parquet(path)
        .withColumn("_p", lemma_pair_col("text", DICT, ["a", "the"], inflect=True))
        .select("doc_id", F.col("_p.lemmas").alias("lemmas"), F.col("_p.tokens").alias("tokens"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    ddf = (
        con.execute(sql_lemma_query(DICT, ["a", "the"], inflect=True))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sdf, ddf[["doc_id", "lemmas", "tokens"]])
