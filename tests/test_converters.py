"""Named-dataset converters (flexneuart_spark/converters.py) vs the
reference scripts' per-row recipes.

Each test runs the Spark converter over a small raw fixture and compares
row-by-row against a pure-Python mirror of the reference worker
(msmarco/convert_docs.py DocParseWorker, convert_queries.py main loop,
cranfield/utils.py read_cranfield_data) built on the SAME text
primitives (rule lemmatizer = the documented T1 stand-in for spaCy) —
so field wiring, misformat filtering, and min-token dropping are pinned
to the reference scripts' shapes.
"""

from __future__ import annotations

import pytest

from flexneuart_spark import converters as C
from flexneuart_spark.functions.kstem import KrovetzStemParser
from flexneuart_spark.functions.lemma import lemmatize_text, load_lemma_dict

DICT = load_lemma_dict()
STOPS = ["the", "a", "of"]


def _proc_text(text):
    return lemmatize_text(text, DICT, frozenset(STOPS), {})


def _pretok_url(url):
    import re

    u = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "", url)
    u = re.sub(r"^www\.", "", u)
    return re.sub(r"[^a-zA-Z0-9]+", " ", u).strip()


MARCO_DOC_LINES = [
    "D1\thttps://www.example.com/cats-and-dogs\tRunning Cats\tthe cats were running faster",
    "D2\thttp://site.org/a\tBooks\tshe studies old books of maps",
    "badline with no tabs",
    "D3\tonly\tthree fields",
    "D4\thttps://x.io/q?p=1\tMice & Feet\tfeet of mice went deeper",
]

MARCO_QUERY_LINES = [
    "q1\twhat is the fastest cat",
    "q2\tthe",  # lemmatizes to a stop word -> zero tokens, dropped at min_qty=1
    "misformatted",
    "q3\tmaps of running",
]


def test_msmarco_docs_matches_reference_recipe(spark):
    lines = spark.createDataFrame([(l,) for l in MARCO_DOC_LINES], "value string")
    got = {r[C.DOCID_FIELD]: r.asDict() for r in C.msmarco_docs(lines, DICT, STOPS).collect()}
    assert set(got) == {"D1", "D2", "D4"}  # misformatted lines dropped
    for line in MARCO_DOC_LINES:
        f = line.split("\t")
        if len(f) != 4:
            continue
        did, url, title, body = f
        url_lem, url_unlemm = _proc_text(_pretok_url(url))
        t_lem, t_unlemm = _proc_text(title)
        b_lem, b_unlemm = _proc_text(body)
        row = got[did]
        assert row["url"] == url_lem
        assert row["url_unlemm"] == url_unlemm
        assert row["title"] == t_lem
        assert row["title_unlemm"] == t_unlemm
        assert row["body"] == b_unlemm
        assert row["text"] == " ".join([url_lem, t_lem, b_lem]).strip()
        assert row["text_raw"] == " ".join([url, title, body])


def test_msmarco_docs_line_truncation(spark):
    long_body = "x" * 100
    line = f"T1\tu\tt\t{long_body}"
    lines = spark.createDataFrame([(line,)], "value string")
    out = C.msmarco_docs(lines, DICT, STOPS, max_doc_size=30).collect()
    # the LINE (not the field) is cut at max_doc_size, reference style
    assert len(out) == 1
    assert out[0]["text_raw"] == "u t " + long_body[: 30 - len("T1\tu\tt\t")]


def test_msmarco_queries_min_tokens(spark):
    lines = spark.createDataFrame([(l,) for l in MARCO_QUERY_LINES], "value string")
    got = {r[C.DOCID_FIELD]: r.asDict() for r in C.msmarco_queries(lines, DICT, STOPS, min_query_tok_qty=1).collect()}
    assert set(got) == {"q1", "q3"}  # q2 lemmatizes to a stop -> dropped
    lem, unlemm = _proc_text("what is the fastest cat")
    assert got["q1"]["text"] == lem
    assert got["q1"]["text_unlemm"] == unlemm
    assert got["q1"]["text_raw"] == "what is the fastest cat"


def test_tsv_queries_krovetz(spark):
    lines = spark.createDataFrame(
        [("q1\tthe running dogs walked",), ("bad",)], "value string"
    )
    got = C.tsv_queries_krovetz(lines, STOPS).collect()
    assert len(got) == 1
    want = KrovetzStemParser(STOPS)("the running dogs walked")
    assert got[0]["text"] == want
    assert got[0]["text_raw"] == "the running dogs walked"


CRAN_RAW = """.I 1
.T
experimental investigation of aerodynamics
.A
brenckman,m.
.B
j. ae. scs. 25, 1958, 324.
.W
the studies were made of running flows .
.I 2
.T
simple shear flow
.A
ting-yili
.B
some venue
.W
shear flowing books
"""


def test_read_cranfield_sections(spark, tmp_path):
    p = tmp_path / "cran.all"
    p.write_text(CRAN_RAW)
    got = {r[C.DOCID_FIELD]: r.asDict() for r in C.read_cranfield(spark, str(p)).collect()}
    assert set(got) == {"1", "2"}
    assert got["1"]["title"] == "experimental investigation of aerodynamics"
    assert got["1"]["author"] == "brenckman,m."
    assert got["1"]["venue"] == "j. ae. scs. 25, 1958, 324."
    assert got["1"]["body"] == "the studies were made of running flows ."
    assert got["2"]["title"] == "simple shear flow"
    # text_raw keeps the marker lines (reference all_text semantics)
    assert ".T" in got["1"]["text_raw"] and ".W" in got["1"]["text_raw"]
    assert "aerodynamics" in got["1"]["text_raw"]


def test_cranfield_docs_lemmas(spark, tmp_path):
    p = tmp_path / "cran.all"
    p.write_text(CRAN_RAW)
    parsed = C.read_cranfield(spark, str(p))
    got = {r[C.DOCID_FIELD]: r.asDict() for r in C.cranfield_docs(parsed, DICT, STOPS).collect()}
    t_lem, _ = _proc_text("experimental investigation of aerodynamics")
    a_lem, _ = _proc_text("brenckman,m.")
    v_lem, _ = _proc_text("j. ae. scs. 25, 1958, 324.")
    b_lem, _ = _proc_text("the studies were made of running flows .")
    row = got["1"]
    assert row["title"] == t_lem
    assert row["author"] == a_lem
    assert row["venue"] == v_lem
    assert row["body"] == b_lem
    assert row["text"] == " ".join([t_lem, a_lem, v_lem, b_lem])


def test_bert_retok_field(spark):
    vocab = ["[UNK]", "run", "##ning", "cat", "##s", "the"]
    lines = spark.createDataFrame([("q1\tthe running cats",)], "value string")
    got = C.msmarco_queries(lines, DICT, STOPS, bert_vocab=vocab).collect()[0]
    assert got["text_bert_tok"] == "the run ##ning cat ##s"


def test_cranfield_counts_skipped_prefix_lines(spark, tmp_path):
    """Content before the first section marker is discarded by the
    stateful walk (mirroring the reference) but now counted, so a
    malformed record can't silently lose text."""
    raw = ".I 1\nstray line before any marker\n.T\na title\n.W\nbody text\n"
    p = tmp_path / "cran.all"
    p.write_text(raw)
    row = C.read_cranfield(spark, str(p)).collect()[0]
    assert row["n_skipped_lines"] == 1
    assert row["title"] == "a title"
    assert row["body"] == "body text"
