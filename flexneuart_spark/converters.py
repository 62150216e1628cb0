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

import json
import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flexneuart_spark.config import MAX_DOC_SIZE, MAX_PASS_SIZE
from flexneuart_spark.functions.kstem import krovetz_stem_col
from flexneuart_spark.functions.lemma import lemma_pair_col, load_lemma_dict
from flexneuart_spark.functions.textproc import pretokenize_url_col, sentencize_col
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


# ---------------------------------------------------------------------------
# Wikipedia DPR (facebookresearch/DPR data)
# ---------------------------------------------------------------------------

# reference: scripts/data_convert/wikipedia_dpr/convert_pass.py (3-field
# TSV passages) and convert_queries.py over
# flexneuart/data_convert/wikipedia_dpr/utils.py (streaming JSON-array
# reader, psg_id/passage_id key normalization).

ANSWER_LIST_FIELD = "answer_list"  # flexneuart/config.py
TITLE_RAW_FIELD = "title_raw"


def dpr_passages(
    lines: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    passage_ids: list[str] | None = None,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """DPR passage TSV (id, text, title) → entry frame
    (convert_pass.py:84-119): ``text`` = title lemmas + ' ' + passage
    lemmas, ``text_raw`` = raw title + ' ' + raw text; the ``id text
    title`` header row is skipped; an optional passage-id subset filter
    mirrors ``--passage_ids``. Delta vs the reference worker: a
    misformatted line is DROPPED (our converters' convention) where the
    reference asserts and kills the whole run (convert_pass.py:99)."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    f = F.split(F.col("value"), "\t", -1)
    base = (
        lines.where(F.trim("value") != "")
        .select(f.alias("f"))
        .where(F.size("f") == 3)
        .where(F.concat_ws(" ", "f") != "id text title")  # header (line 96)
        .select(
            F.col("f")[0].alias(DOCID_FIELD),
            F.col("f")[1].alias("_text"),
            F.col("f")[2].alias("_title"),
        )
    )
    if passage_ids is not None:
        # driver-sized subsets broadcast through isin; join a DataFrame
        # of ids instead when the subset itself is corpus-scale
        base = base.where(F.col(DOCID_FIELD).isin(list(passage_ids)))
    proc = base.withColumn("_t", _proc(F.col("_title"), dictionary, stops)).withColumn(
        "_b", _proc(F.col("_text"), dictionary, stops)
    )
    out = proc.select(
        DOCID_FIELD,
        F.concat_ws(" ", "_t.lemmas", "_b.lemmas").alias(TEXT_FIELD),
        F.col("_t.tokens").alias(TITLE_UNLEMM_FIELD),
        F.col("_b.tokens").alias(TEXT_UNLEMM_FIELD),
        F.concat_ws(" ", "_title", "_text").alias(TEXT_RAW_FIELD),
    )
    return _with_bert(out, bert_vocab)


_DPR_CTX = T.StructType(
    [
        T.StructField("passage_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

_DPR_SCHEMA = T.StructType(
    [
        T.StructField("qid_idx", T.LongType()),
        T.StructField("question", T.StringType()),
        T.StructField("answers", T.ArrayType(T.StringType())),
        T.StructField("positive_ctxs", T.ArrayType(_DPR_CTX)),
        T.StructField("negative_ids", T.ArrayType(T.StringType())),
    ]
)


def _norm_psg_id(entry: dict) -> str:
    """utils.py:19-29: some DPR dumps key the passage id ``psg_id``,
    others ``passage_id``."""
    for key in ("psg_id", "passage_id"):
        if key in entry:
            return str(entry[key])
    raise ValueError("No passage keys in the entry")


def read_dpr_queries(spark, path: str) -> DataFrame:
    """DPR raw query JSON (one pretty-printed array per file) → one row
    per question: (qid_idx, question, answers, positive_ctxs,
    negative_ids). ``qid_idx`` is the question's position within its
    file — the reference's ``enumerate(dpr_json_reader(...))`` counter
    that the query id is minted from, so it must follow FILE order, not
    partition order; each file is one (small) row of a ``wholetext``
    scan and the array parse runs Arrow-batched. Passage-scale data
    stays in ``dpr_passages``; query files are driver-sized."""
    raw = spark.read.text(path, wholetext=True)

    @F.pandas_udf(T.ArrayType(_DPR_SCHEMA))
    def _parse(texts: pd.Series) -> pd.Series:
        def one(txt: str) -> list:
            out = []
            for i, rec in enumerate(json.loads(txt)):
                out.append(
                    (
                        i,
                        rec["question"],
                        [str(a) for a in rec.get("answers", [])],
                        [
                            (_norm_psg_id(c), c.get("title"), c.get("text"))
                            for c in rec.get("positive_ctxs", [])
                        ],
                        [_norm_psg_id(c) for c in rec.get("negative_ctxs", [])],
                    )
                )
            return out

        return texts.map(one)

    return raw.select(F.explode(_parse("value")).alias("e")).select("e.*")


def dpr_queries(
    parsed: DataFrame,
    part_type: str,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    min_query_tok_qty: int = 0,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """DPR query entries (convert_queries.py:108-131): DOCNO =
    ``{part_type}_{qid_idx}`` (dropped-too-short queries still consume
    their index — the reference enumerates before filtering), ``text``
    the question lemmas, plus the raw ``answer_list``."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    proc = parsed.withColumn("_p", _proc(F.col("question"), dictionary, stops))
    out = proc.select(
        F.concat_ws("_", F.lit(part_type), "qid_idx").alias(DOCID_FIELD),
        F.col("_p.lemmas").alias(TEXT_FIELD),
        F.col("_p.tokens").alias(TEXT_UNLEMM_FIELD),
        F.col("question").alias(TEXT_RAW_FIELD),
        F.col("answers").alias(ANSWER_LIST_FIELD),
    ).where(
        F.size(F.filter(F.split(TEXT_FIELD, r"\s+"), lambda s: s != F.lit("")))
        >= min_query_tok_qty
    )
    return _with_bert(out, bert_vocab)


def dpr_qrels(
    parsed: DataFrame,
    part_type: str,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    min_query_tok_qty: int = 0,
    use_precomputed_negatives: bool = False,
) -> DataFrame:
    """(query_id, doc_id, grade): positives grade 1, precomputed
    negatives grade 0 when enabled (convert_queries.py:133-176); only
    queries that survive the min-token filter contribute (the reference
    adds qrels inside the kept-query branch). Duplicate (qid, did) pairs
    collapse to one row via max(grade) — the reference's
    ``add_qrel_entry`` ignores exact repeats and a positive should win
    over a negative duplicate."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    kept = parsed.withColumn("_p", _proc(F.col("question"), dictionary, stops)).where(
        F.size(F.filter(F.split("_p.lemmas", r"\s+"), lambda s: s != F.lit("")))
        >= min_query_tok_qty
    )
    qid = F.concat_ws("_", F.lit(part_type), "qid_idx")
    pos = kept.select(
        qid.alias("query_id"),
        F.explode("positive_ctxs").alias("_c"),
    ).select("query_id", F.col("_c.passage_id").alias("doc_id"), F.lit(1).alias("grade"))
    if not use_precomputed_negatives:
        out = pos
    else:
        neg = kept.select(qid.alias("query_id"), F.explode("negative_ids").alias("doc_id")).select(
            "query_id", "doc_id", F.lit(0).alias("grade")
        )
        out = pos.unionByName(neg)
    return out.groupBy("query_id", "doc_id").agg(F.max("grade").alias("grade"))


def dpr_bitext(
    parsed: DataFrame,
    part_type: str,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    min_query_tok_qty: int = 0,
) -> DataFrame:
    """Question↔context parallel lines (convert_queries.py:136-169), one
    row per pair: field ``title_unlemm`` pairs the query's surface tokens
    with a positive context's title tokens (skipped when the title is
    empty); fields ``text``/``text_unlemm`` pair the query with each
    positive-context SENTENCE whose lowercased text contains one of the
    answers (the reference's substring check, including its documented
    false-positive tolerance)."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    kept = parsed.withColumn("_q", _proc(F.col("question"), dictionary, stops)).where(
        F.size(F.filter(F.split("_q.lemmas", r"\s+"), lambda s: s != F.lit("")))
        >= min_query_tok_qty
    )
    qid = F.concat_ws("_", F.lit(part_type), "qid_idx")
    ctx = kept.select(
        qid.alias("query_id"),
        F.col("_q.lemmas").alias("_qlem"),
        F.col("_q.tokens").alias("_qtok"),
        F.col("answers"),
        F.explode("positive_ctxs").alias("_c"),
    )
    # title pairs: query tokens <-> title tokens, nonempty titles only
    titles = ctx.where(F.coalesce(F.col("_c.title"), F.lit("")) != "").select(
        "query_id",
        F.lit(TITLE_UNLEMM_FIELD).alias("field"),
        F.col("_qtok").alias("quest"),
        _proc(F.col("_c.title"), dictionary, stops)["tokens"].alias("answ"),
    )
    # sentence pairs: sentences of the positive context containing an answer
    sents = ctx.select(
        "query_id",
        "_qlem",
        "_qtok",
        "answers",
        F.explode(sentencize_col(F.col("_c.text"))).alias("_sent"),
    ).where(
        F.exists(
            "answers", lambda a: F.instr(F.lower(F.col("_sent")), F.lower(a)) > 0
        )
    )
    sents = sents.withColumn("_s", _proc(F.col("_sent"), dictionary, stops))
    sent_pairs = sents.select(
        "query_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(TEXT_FIELD).alias("field"),
                    F.col("_qlem").alias("quest"),
                    F.col("_s.lemmas").alias("answ"),
                ),
                F.struct(
                    F.lit(TEXT_UNLEMM_FIELD).alias("field"),
                    F.col("_qtok").alias("quest"),
                    F.col("_s.tokens").alias("answ"),
                ),
            )
        ).alias("p"),
    ).select("query_id", "p.field", "p.quest", "p.answ")
    return titles.unionByName(sent_pairs)


# ---------------------------------------------------------------------------
# Yahoo Answers
# ---------------------------------------------------------------------------

# reference: scripts/data_convert/yahoo_answers/convert_yahoo_answers.py
# over text_proc/formats.py:30-70 (proc_yahoo_answers_record) and the
# SimpleXmlRecIterator container scan (formats.py:73-115). The
# collection-splitting step (YahooAnswersCollectionSplitter.java) is the
# S8 operator (`plans/entries_ops.collection_split`).

MAX_RELEV_GRADE = 4  # flexneuart/config.py:86

_YA_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("best_answer_id", T.IntegerType()),
        T.StructField("answers", T.ArrayType(T.StringType())),
        # per-record parse failure (reference: caught + skipped with a
        # printed message, convert_yahoo_answers.py:163-164); kept as a
        # column so callers can count/audit instead of losing rows silently
        T.StructField("parse_error", T.StringType()),
    ]
)

_TAG_RE = re.compile(r"</?[a-z]+\s*/?>")  # clean.py:23-25
_BARE_AMP_RE = re.compile(r"&(?!#?\w+;)")


def remove_tags(s: str) -> str:
    """``text_proc/clean.py:23-25``: drop anything that looks like a tag
    (after entity unescaping, Yahoo bodies carry literal ``<br/>`` etc.)."""
    return _TAG_RE.sub("", s)


def parse_yahoo_answers_record(rec_str: str) -> tuple:
    """One ``<document>...</document>`` record → (uri, subject, content,
    best_answer_id, answers, parse_error), mirroring
    ``proc_yahoo_answers_record`` (formats.py:30-70): uri/subject
    required, content/bestanswer optional, ``best_answer_id`` = index of
    the LAST ``answer_item`` whose RAW text equals ``bestanswer``
    (compared before tag removal; the reference loop re-assigns on every
    match, formats.py:63-66), else -1. Two reference quirks pinned by
    tests rather than "fixed": duplicate answers leave the grade-4 row
    on the last duplicate, and a missing ``<bestanswer>`` (→ '') matches
    an EMPTY ``answer_item``. subject/content/answers get
    ``remove_tags``. Delta vs the reference: ElementTree instead of
    BeautifulSoup-lxml, with bare ``&`` pre-escaped — strictly-broken
    markup becomes a ``parse_error`` row rather than a lenient guess."""
    try:
        root = ET.fromstring(_BARE_AMP_RE.sub("&amp;", rec_str))
        by_tag = {child.tag.lower(): child for child in root.iter()}
        uri_el = by_tag.get("uri")
        if uri_el is None:
            raise ValueError("Invalid format, missing <uri> tag")
        subj_el = by_tag.get("subject")
        if subj_el is None:
            raise ValueError("Invalid format, missing <subject> tag")
        text_of = lambda el: "".join(el.itertext())  # noqa: E731  (bs4 .text)
        content_el = by_tag.get("content")
        best_el = by_tag.get("bestanswer")
        best_raw = "" if best_el is None else text_of(best_el)
        answers: list[str] = []
        best_id = -1
        nbest = by_tag.get("nbestanswers")
        if nbest is not None:
            for item in nbest.iter("answer_item"):
                raw = text_of(item)
                # reference parity (formats.py:63-66): re-assign on every
                # match (LAST duplicate wins) and compare against '' when
                # <bestanswer> is missing (an empty answer_item matches) —
                # both quirks are pinned by tests
                if raw == best_raw:
                    best_id = len(answers)
                answers.append(remove_tags(raw))
        return (
            text_of(uri_el),
            remove_tags(text_of(subj_el)).strip(),
            "" if content_el is None else remove_tags(text_of(content_el)).strip(),
            best_id,
            answers,
            None,
        )
    except Exception as e:  # the reference skips the record (line 163)
        return (None, None, None, None, None, str(e))


def read_yahoo_answers(spark, path: str) -> DataFrame:
    """Yahoo Answers container file (series of ``<document>`` records,
    optionally .gz/.bz2) → parsed frame ``(uri, subject, content,
    best_answer_id, answers, parse_error)``. JVM-side record split on the
    closing tag (the splittable ``lineSep`` scan — no whole-file
    buffering), per-record parse Arrow-batched. Records that fail to
    parse surface as ``parse_error`` rows (the downstream converters drop
    them, like the reference's per-record try/except)."""
    frags = (
        spark.read.text(path, lineSep="</document>")
        .where(F.instr("value", "<document") > 0)
        .select((F.concat(F.col("value"), F.lit("</document>"))).alias("rec"))
    )

    @F.pandas_udf(_YA_SCHEMA)
    def _parse(s: pd.Series) -> pd.DataFrame:
        # slice off anything before the opening tag (inter-record noise)
        recs = [r[r.index("<document") :] for r in s]
        return pd.DataFrame(
            [parse_yahoo_answers_record(r) for r in recs], columns=_YA_SCHEMA.names
        )

    return frags.select(_parse("rec").alias("e")).select("e.*")


def _ya_valid(parsed: DataFrame) -> DataFrame:
    """Parse-clean records with ≥1 answer (questions without answers are
    ignored, convert_yahoo_answers.py:99-100)."""
    return parsed.where(F.col("parse_error").isNull() & (F.size("answers") > 0))


def yahoo_answers_questions(
    parsed: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """Question entries (convert_yahoo_answers.py:102-121): DOCNO=uri,
    ``text_raw`` = ``(subject + ' ' + content).strip()``, ``text`` its
    lemmas, ``text_unlemm`` its kept surface tokens."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    base = _ya_valid(parsed).select(
        F.col("uri").alias(DOCID_FIELD),
        F.trim(F.concat_ws(" ", "subject", "content")).alias(TEXT_RAW_FIELD),
    )
    proc = base.withColumn("_p", _proc(F.col(TEXT_RAW_FIELD), dictionary, stops))
    out = proc.select(
        DOCID_FIELD,
        F.col("_p.lemmas").alias(TEXT_FIELD),
        F.col("_p.tokens").alias(TEXT_UNLEMM_FIELD),
        TEXT_RAW_FIELD,
    )
    return _with_bert(out, bert_vocab)


def _ya_answer_rows(parsed: DataFrame) -> DataFrame:
    """(uri, best_answer_id, pos, answer) — one row per answer."""
    return _ya_valid(parsed).select(
        "uri", "best_answer_id", F.posexplode("answers").alias("pos", "_a")
    )


def yahoo_answers_answers(
    parsed: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """Answer entries (convert_yahoo_answers.py:123-144): DOCNO =
    ``{uri}-{i}`` in answer-list order."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    base = _ya_answer_rows(parsed).select(
        F.concat_ws("-", "uri", "pos").alias(DOCID_FIELD), F.col("_a").alias(TEXT_RAW_FIELD)
    )
    proc = base.withColumn("_p", _proc(F.col(TEXT_RAW_FIELD), dictionary, stops))
    out = proc.select(
        DOCID_FIELD,
        F.col("_p.lemmas").alias(TEXT_FIELD),
        F.col("_p.tokens").alias(TEXT_UNLEMM_FIELD),
        TEXT_RAW_FIELD,
    )
    return _with_bert(out, bert_vocab)


def yahoo_answers_qrels(parsed: DataFrame) -> DataFrame:
    """(query_id, doc_id, grade): the best answer gets
    ``MAX_RELEV_GRADE`` (4), every other answer 3
    (convert_yahoo_answers.py:146-147); write with ``io/trec.py``."""
    return _ya_answer_rows(parsed).select(
        F.col("uri").alias("query_id"),
        F.concat_ws("-", "uri", "pos").alias("doc_id"),
        (F.lit(MAX_RELEV_GRADE) - (F.col("pos") != F.col("best_answer_id")).cast("int")).alias(
            "grade"
        ),
    )


def yahoo_answers_bitext(
    parsed: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
) -> DataFrame:
    """Question↔answer parallel lines for MGIZA-style Model 1 training
    (convert_yahoo_answers.py:149-154): one row per (answer, field),
    field ∈ {text, text_unlemm}. Mirrors the reference's quirk of
    writing the LEMMA line into the ``text_unlemm`` bitext files too
    (lines 150-151/153-154 both write ``*_lemmas``)."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    q = _ya_valid(parsed).select(
        "uri", F.trim(F.concat_ws(" ", "subject", "content")).alias("_q")
    )
    q = q.withColumn("quest", _proc(F.col("_q"), dictionary, stops)["lemmas"]).select(
        "uri", "quest"
    )
    a = _ya_answer_rows(parsed).withColumn(
        "answ", _proc(F.col("_a"), dictionary, stops)["lemmas"]
    )
    pairs = a.join(q, "uri").select("uri", "pos", "quest", "answ")
    fields = F.explode(F.array(F.lit(TEXT_FIELD), F.lit(TEXT_UNLEMM_FIELD))).alias("field")
    return pairs.select("uri", "pos", fields, "quest", "answ")


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


# ---------------------------------------------------------------------------
# MS MARCO v2 (scripts/data_convert/msmarco_v2/convert_docs.py,
# convert_pass.py). Raw inputs are JSONL shards (the un-tarred
# msmarco_doc_* / msmarco_passage_* files — data_convert/utils.py:30-31);
# Spark's text reader globs + gunzips them natively, replacing the
# reference's multi_file_linegen + multiprocessing pool.
# ---------------------------------------------------------------------------

ORIG_DOCID_FIELD = "orig_docid"  # convert_pass.py:27

_MARCO_V2_DOC = T.StructType(
    [
        T.StructField("docid", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("headings", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)

_MARCO_V2_PASS = T.StructType(
    [
        T.StructField("pid", T.StringType()),
        T.StructField("docid", T.StringType()),
        T.StructField("passage", T.StringType()),
    ]
)


def msmarco_v2_docs(
    lines: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    max_doc_size: int = MAX_DOC_SIZE,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """MS MARCO v2 document JSONL → entry frame
    (msmarco_v2/convert_docs.py:72-106): the worker cuts ``body`` (only)
    at ``max_doc_size`` chars, lemmatizes url/title/body/headings, and
    joins the lemmas url-headings-title-body into ``text`` /
    the raw fields into ``text_raw``. ``lines``: raw JSONL rows in a
    ``value`` column. Rows whose JSON fails to parse or lacks a docid
    are dropped (the reference worker skips empty lines and would abort
    on bad JSON; a distributed scan drops-and-continues instead)."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    base = (
        lines.where(F.trim("value") != "")
        .select(F.from_json("value", _MARCO_V2_DOC).alias("j"))
        .where(F.col("j.docid").isNotNull())
        .select(
            F.col("j.docid").alias(DOCID_FIELD),
            F.coalesce("j.url", F.lit("")).alias("_url"),
            F.coalesce("j.title", F.lit("")).alias("_title"),
            F.coalesce("j.headings", F.lit("")).alias("_headings"),
            F.substring(F.coalesce("j.body", F.lit("")), 1, max_doc_size).alias("_body"),
        )
    )
    proc = (
        base.withColumn("_u", _proc(pretokenize_url_col("_url"), dictionary, stops))
        .withColumn("_t", _proc(F.col("_title"), dictionary, stops))
        .withColumn("_b", _proc(F.col("_body"), dictionary, stops))
        .withColumn("_h", _proc(F.col("_headings"), dictionary, stops))
    )
    out = proc.select(
        DOCID_FIELD,
        F.col("_u.lemmas").alias("url"),
        F.col("_u.tokens").alias("url_unlemm"),
        F.col("_h.lemmas").alias("headings"),
        F.col("_h.tokens").alias("headings_unlemm"),
        # convert_docs.py:92-93 — join order url, headings, title, body
        F.trim(
            F.concat_ws(
                " ", F.col("_u.lemmas"), F.col("_h.lemmas"), F.col("_t.lemmas"), F.col("_b.lemmas")
            )
        ).alias(TEXT_FIELD),
        F.col("_t.lemmas").alias(TITLE_FIELD),
        F.col("_t.tokens").alias(TITLE_UNLEMM_FIELD),
        F.col("_b.tokens").alias(BODY_FIELD),
        F.concat_ws(" ", "_url", "_headings", "_title", "_body").alias(TEXT_RAW_FIELD),
    )
    return _with_bert(out, bert_vocab)


def msmarco_v2_passages(
    lines: DataFrame,
    dictionary: frozenset[str] | None = None,
    stop_words: list[str] | None = None,
    max_pass_size: int = MAX_PASS_SIZE,
    bert_vocab: list[str] | None = None,
) -> DataFrame:
    """MS MARCO v2 passage JSONL → entry frame
    (msmarco_v2/convert_pass.py:78-97): passage cut at ``max_pass_size``
    chars; entry keeps the parent document id as ``orig_docid``."""
    dictionary = dictionary if dictionary is not None else load_lemma_dict()
    stops = stop_words or []
    base = (
        lines.where(F.trim("value") != "")
        .select(F.from_json("value", _MARCO_V2_PASS).alias("j"))
        .where(F.col("j.pid").isNotNull())
        .select(
            F.col("j.pid").alias(DOCID_FIELD),
            F.coalesce("j.docid", F.lit("")).alias(ORIG_DOCID_FIELD),
            F.substring(F.coalesce("j.passage", F.lit("")), 1, max_pass_size).alias("_p"),
        )
    )
    proc = base.withColumn("_pp", _proc(F.col("_p"), dictionary, stops))
    out = proc.select(
        DOCID_FIELD,
        ORIG_DOCID_FIELD,
        F.col("_pp.lemmas").alias(TEXT_FIELD),
        F.col("_pp.tokens").alias(TEXT_UNLEMM_FIELD),
        F.col("_p").alias(TEXT_RAW_FIELD),
    )
    return _with_bert(out, bert_vocab)


def msmarco_v2_doc2pass(entries: DataFrame) -> DataFrame:
    """Document → passage-id recoding table
    (convert_pass.py:121-133: ``{DOCNO: did, pass_ids: ' '.join(set)}``).
    The reference emits Python-set order; a distributed collect has no
    stable insertion order, so the ids are deduplicated AND sorted —
    same set per document, deterministic string."""
    return (
        entries.groupBy(ORIG_DOCID_FIELD)
        .agg(
            F.concat_ws(" ", F.sort_array(F.collect_set(DOCID_FIELD))).alias("pass_ids")
        )
        .withColumnRenamed(ORIG_DOCID_FIELD, DOCID_FIELD)
    )


# ---------------------------------------------------------------------------
# Entry/query utility scripts (scripts/data_convert/add_stemmed_field.py,
# split_queries.py, filter_queries.py, merge_bsonl.py) — the small
# glue steps around the named converters, as DataFrame → DataFrame ops.
# ---------------------------------------------------------------------------

TEXT_STEMMED_FIELD = "text_stems"  # flexneuart/config.py:69


def add_stemmed_field(
    entries: DataFrame,
    stop_words: list[str] | None = None,
    src_field: str = TEXT_RAW_FIELD,
    dst_field: str = TEXT_STEMMED_FIELD,
) -> DataFrame:
    """``add_stemmed_field.py:44-49``: add a Krovetz-stemmed + stopped
    field computed from ``src_field`` to every entry (KrovetzStemParser
    lowercases, drops stops, keeps alnum tokens)."""
    return entries.withColumn(dst_field, krovetz_stem_col(src_field, stop_words or []))


def split_queries(
    queries: DataFrame,
    sizes: list[int],
    seed: int = 0,
) -> DataFrame:
    """``split_queries.py`` + ``data_convert/utils.py:38-56``: randomly
    partition queries into ``len(sizes)`` parts with EXACT sizes
    (sum(sizes) must equal the query count). The reference seeds
    ``random.shuffle`` over the id list then cuts contiguous ranges;
    the distributed restatement ranks ids by a seeded md5 (the engine's
    standard deterministic-shuffle device, same as collection_split) and
    cuts the ranked sequence at the same cumulative boundaries — exact
    sizes, deterministic, no driver-side id list. Adds a ``part`` column
    (partition ordinal, 0-based)."""
    n = queries.count()
    if sum(sizes) != n:
        raise ValueError(f"sizes sum to {sum(sizes)} but there are {n} queries")
    bounds = []
    acc = 0
    for s_ in sizes:
        acc += s_
        bounds.append(acc)
    w = Window.orderBy(F.md5(F.concat_ws("\x01", F.lit(str(seed)), F.col(DOCID_FIELD))))
    ranked = queries.withColumn("_rk", F.row_number().over(w))
    part = F.lit(len(sizes) - 1)
    for i in range(len(sizes) - 2, -1, -1):
        part = F.when(F.col("_rk") <= bounds[i], F.lit(i)).otherwise(part)
    return ranked.withColumn("part", part).drop("_rk")


def split_qrels(qrels: DataFrame, split_map: DataFrame) -> DataFrame:
    """``split_queries.py:write_qrels_files``: route each qrel row to its
    query's partition; rows whose query id is absent from the split map
    are dropped (the reference counts them as ``miss_qty``). ``split_map``
    is ``split_queries`` output (or any frame with DOCNO + part)."""
    m = split_map.select(F.col(DOCID_FIELD).alias("query_id"), "part")
    return qrels.join(F.broadcast(m), "query_id", "inner")


def filter_queries(queries: DataFrame, *ignore: DataFrame) -> DataFrame:
    """``filter_queries.py``: drop queries whose ``text`` exactly matches
    any query text in the ignore sets (train/dev leakage guard). Queries
    lacking a text field are dropped too (the reference ``continue``-s
    past them)."""
    out = queries.where(F.col(TEXT_FIELD).isNotNull())
    for ig in ignore:
        out = out.join(
            F.broadcast(ig.select(F.col(TEXT_FIELD)).where(F.col(TEXT_FIELD).isNotNull()).distinct()),
            TEXT_FIELD,
            "left_anti",
        )
    return out


def merge_entries(*frames: DataFrame) -> DataFrame:
    """``merge_bsonl.py``: merge per-id entry frames whose field sets are
    disjoint except for the id (the reference asserts matching key sets
    and loads everything in RAM; the restatement is an id-equijoin —
    inner, per the matching-keys assumption, and distributed)."""
    out = frames[0]
    for f_ in frames[1:]:
        out = out.join(f_, DOCID_FIELD, "inner")
    return out
