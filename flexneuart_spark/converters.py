"""Named-dataset converters (SURVEY.md §2.1 S11's sibling: the
reference's per-collection ``scripts/data_convert/*`` scripts).

The reference converts each public collection with a standalone
multiprocessing script that runs the same recipe — split the raw record,
``proc_text`` (lemmatize + stop-drop) each field, assemble the JSONL
entry fields, optionally BERT-retokenize the raw text:

- MS MARCO docs: ``scripts/data_convert/msmarco/convert_docs.py:63-96``
  (4-field TSV → DOCNO/url/url_unlemm/text/title/title_unlemm/body/
  text_raw [+ text_bert_tok]);
- MS MARCO queries: ``msmarco/convert_queries.py:58-83`` (2-field TSV,
  drops queries shorter than ``min_query_tok_qty`` lemma tokens);
- Krovetz TSV queries: ``convert_tsv_queries_krovetz.py`` (2-field TSV,
  Krovetz-stemmed + stopped field plus the raw field);
- Cranfield: ``cranfield/convert_docs.py:56-74`` over
  ``flexneuart/data_convert/cranfield/utils.py:31-69``'s section parser
  (``.I``-delimited records with ``.T/.A/.B/.W`` sections).

Spark restatement: each converter is a DataFrame → DataFrame function
over ``spark.read.text`` lines — field splitting, misformat filtering
and assembly are JVM column expressions; ``proc_text`` is the T1 rule
lemmatizer (one Arrow-batched pandas UDF per converted field,
``functions/lemma.py``); BERT retokenization is the T5 WordPiece UDF.
The per-record Cranfield section walk runs in one Arrow-batched UDF
(records are small; the scan is embarrassingly parallel).

Known, deliberate delta from the reference scripts: ``spark.read.text``
strips line terminators, so ``text_raw``/``body`` never carry a trailing
``\\n`` (the reference keeps the newline of the final TSV field), and
the lemmas come from the rule lemmatizer rather than spaCy (the
documented T1 stand-in — see ``tests/test_lemma_divergence.py``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flexneuart_spark.config import MAX_DOC_SIZE
from flexneuart_spark.functions.kstem import krovetz_stem_col
from flexneuart_spark.functions.lemma import lemma_pair_col, load_lemma_dict
from flexneuart_spark.functions.textproc import pretokenize_url_col
from flexneuart_spark.functions.wordpiece import bert_tok_col

# reference field names (flexneuart/config.py:66-75)
DOCID_FIELD = "DOCNO"
TEXT_FIELD = "text"
TEXT_UNLEMM_FIELD = "text_unlemm"
TEXT_RAW_FIELD = "text_raw"
TEXT_BERT_TOK_FIELD = "text_bert_tok"
TITLE_FIELD = "title"
TITLE_UNLEMM_FIELD = "title_unlemm"
# cranfield extras (data_convert/cranfield/utils.py:19-21)
AUTHOR_FIELD = "author"
BODY_FIELD = "body"
VENUE_FIELD = "venue"


def _proc(col: Column, dictionary: frozenset[str], stops: list[str]) -> Column:
    """The converters' ``nlp.proc_text`` slot: struct(lemmas, tokens)."""
    return lemma_pair_col(col, dictionary, stops)


def _with_bert(df: DataFrame, bert_vocab: list[str] | None) -> DataFrame:
    """``add_retokenized_field`` (parse.py:208-226): optional
    ``text_bert_tok`` from ``text_raw``; no-op without a tokenizer."""
    if bert_vocab is None:
        return df
    return df.withColumn(TEXT_BERT_TOK_FIELD, bert_tok_col(TEXT_RAW_FIELD, bert_vocab))


def msmarco_docs(
    lines: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    max_doc_size: int = MAX_DOC_SIZE,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """MS MARCO document TSV (did, url, title, body) → entry frame.
    ``lines``: one raw TSV line per row in a ``value`` column
    (``spark.read.text``). Misformatted lines (≠ 4 fields after the
    size truncation) are dropped, like the reference's worker returning
    ``None`` (convert_docs.py:68-73)."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    f = F.split(F.substring(F.col("value"), 1, max_doc_size), "\t", -1)
    base = (
        lines.select(f.alias("f"))
        .where(F.size("f") == 4)
        .select(
            F.col("f")[0].alias(DOCID_FIELD),
            F.col("f")[1].alias("_url"),
            F.col("f")[2].alias("_title"),
            F.col("f")[3].alias("_body"),
        )
    )
    proc = (
        base.withColumn("_u", _proc(pretokenize_url_col("_url"), dictionary, stops))
        .withColumn("_t", _proc(F.col("_title"), dictionary, stops))
        .withColumn("_b", _proc(F.col("_body"), dictionary, stops))
    )
    out = proc.select(
        DOCID_FIELD,
        F.col("_u.lemmas").alias("url"),
        F.col("_u.tokens").alias("url_unlemm"),
        F.trim(
            F.concat_ws(" ", F.col("_u.lemmas"), F.col("_t.lemmas"), F.col("_b.lemmas"))
        ).alias(TEXT_FIELD),
        F.col("_t.lemmas").alias(TITLE_FIELD),
        F.col("_t.tokens").alias(TITLE_UNLEMM_FIELD),
        F.col("_b.tokens").alias(BODY_FIELD),
        F.concat_ws(" ", "_url", "_title", "_body").alias(TEXT_RAW_FIELD),
    )
    return _with_bert(out, bert_vocab)


def msmarco_queries(
    lines: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    min_query_tok_qty: int = 0,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """MS MARCO query TSV (qid, text) → entry frame; queries with fewer
    than ``min_query_tok_qty`` lemma tokens are dropped
    (convert_queries.py:74-80)."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    f = F.split(F.trim(F.col("value")), "\t", -1)
    base = (
        lines.where(F.trim("value") != "")
        .select(f.alias("f"))
        .where(F.size("f") == 2)
        .select(F.col("f")[0].alias(DOCID_FIELD), F.col("f")[1].alias("_q"))
    )
    proc = base.withColumn("_p", _proc(F.col("_q"), dictionary, stops))
    out = proc.select(
        DOCID_FIELD,
        F.col("_p.lemmas").alias(TEXT_FIELD),
        F.col("_p.tokens").alias(TEXT_UNLEMM_FIELD),
        F.col("_q").alias(TEXT_RAW_FIELD),
    ).where(
        # python str.split() semantics: no empty tokens (so '' counts 0)
        F.size(F.filter(F.split(TEXT_FIELD, r"\s+"), lambda s: s != F.lit("")))
        >= min_query_tok_qty
    )
    return _with_bert(out, bert_vocab)


def tsv_queries_krovetz(
    lines: DataFrame,
    stop_words: list[str] | None = None,
    stem_field: str = TEXT_FIELD,
    text_raw_field: str = TEXT_RAW_FIELD,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """Generic 2-field TSV queries with Krovetz stemming + stopping
    (convert_tsv_queries_krovetz.py)."""
    stops = stop_words or []
    f = F.split(F.trim(F.col("value")), "\t", -1)
    base = (
        lines.where(F.trim("value") != "")
        .select(f.alias("f"))
        .where(F.size("f") == 2)
        .select(F.col("f")[0].alias(DOCID_FIELD), F.col("f")[1].alias("_q"))
    )
    out = base.select(
        DOCID_FIELD,
        krovetz_stem_col("_q", stops).alias(stem_field),
        F.col("_q").alias(text_raw_field),
    )
    if bert_vocab is not None:
        out = out.withColumn(TEXT_BERT_TOK_FIELD, bert_tok_col(text_raw_field, bert_vocab))
    return out


# ---------------------------------------------------------------------------
# Cranfield
# ---------------------------------------------------------------------------

_CRAN_SCHEMA = T.StructType(
    [
        T.StructField(DOCID_FIELD, T.StringType()),
        T.StructField(TITLE_FIELD, T.StringType()),
        T.StructField(AUTHOR_FIELD, T.StringType()),
        T.StructField(VENUE_FIELD, T.StringType()),
        T.StructField(BODY_FIELD, T.StringType()),
        T.StructField(TEXT_RAW_FIELD, T.StringType()),
        # diagnostic: non-empty content lines before the first section
        # marker (discarded by the stateful walk) — nonzero signals a
        # malformed record silently losing text
        T.StructField("n_skipped_lines", T.IntegerType()),
    ]
)

_CRAN_FIELD_MAP = {".T": TITLE_FIELD, ".W": BODY_FIELD, ".B": VENUE_FIELD, ".A": AUTHOR_FIELD}


def _parse_cranfield_record(rec: str) -> tuple:
    """One ``.I``-delimited record → fields, mirroring the reference's
    stateful line walk (cranfield/utils.py:31-69): a marker line opens a
    section, everything else accumulates; ``text_raw`` is the raw record
    body including the marker lines."""
    lines = rec.split("\n")
    doc_id = lines[0].strip()
    fields = {TITLE_FIELD: "", AUTHOR_FIELD: "", VENUE_FIELD: "", BODY_FIELD: ""}
    prev = None
    buf: list[str] = []
    skipped = 0
    body_lines = lines[1:]
    for line in body_lines:
        stripped = line.strip()
        if stripped in _CRAN_FIELD_MAP:
            if prev is not None:
                fields[_CRAN_FIELD_MAP[prev]] = "\n".join(buf).strip()
            prev = stripped
            buf = []
        elif prev is None:
            if stripped:
                skipped += 1  # content before the first marker is dropped
        else:
            buf.append(line)
    if prev is not None:
        fields[_CRAN_FIELD_MAP[prev]] = "\n".join(buf).strip()
    text_raw = "\n".join(body_lines)
    return (
        doc_id,
        fields[TITLE_FIELD],
        fields[AUTHOR_FIELD],
        fields[VENUE_FIELD],
        fields[BODY_FIELD],
        text_raw,
        skipped,
    )


def read_cranfield(spark, path: str) -> DataFrame:
    """Cranfield ``.I``-record file → (DOCNO, title, author, venue,
    body, text_raw). The file is split into records on the ``.I``
    markers JVM-side (``lineSep`` scan, the ``io/xmlentries.py``
    pattern); the per-record section walk runs Arrow-batched."""
    recs = (
        spark.read.text(path, lineSep="\n.I ")
        .where(F.trim("value") != "")
        .select(F.regexp_replace("value", r"^\.I ", "").alias("rec"))
    )

    @F.pandas_udf(_CRAN_SCHEMA)
    def _parse(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_parse_cranfield_record(r) for r in s], columns=_CRAN_SCHEMA.names
        )

    return recs.select(_parse("rec").alias("e")).select("e.*")


def cranfield_docs(
    parsed: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """Cranfield entries (cranfield/convert_docs.py:56-74): lemmatize
    title/author/venue/body; ``text`` is their joined lemmas."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    proc = (
        parsed.withColumn("_t", _proc(F.col(TITLE_FIELD), dictionary, stops))
        .withColumn("_a", _proc(F.col(AUTHOR_FIELD), dictionary, stops))
        .withColumn("_v", _proc(F.col(VENUE_FIELD), dictionary, stops))
        .withColumn("_b", _proc(F.col(BODY_FIELD), dictionary, stops))
    )
    out = proc.select(
        DOCID_FIELD,
        F.col(TEXT_RAW_FIELD),
        F.concat_ws(
            " ", F.col("_t.lemmas"), F.col("_a.lemmas"), F.col("_v.lemmas"), F.col("_b.lemmas")
        ).alias(TEXT_FIELD),
        F.col("_t.lemmas").alias(TITLE_FIELD),
        F.col("_a.lemmas").alias(AUTHOR_FIELD),
        F.col("_v.lemmas").alias(VENUE_FIELD),
        F.col("_b.lemmas").alias(BODY_FIELD),
    )
    return _with_bert(out, bert_vocab)
