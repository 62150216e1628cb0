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


# ---------------------------------------------------------------------------
# Yahoo Answers (convert_yahoo_answers.py + formats.py proc_yahoo_answers_record)
# ---------------------------------------------------------------------------

YA_RAW = """<document>
<uri>q100</uri>
<subject>Why do cats &lt;b&gt;run&lt;/b&gt; so fast?</subject>
<content>My cat keeps running &amp; jumping.</content>
<bestanswer>Because they are hunters.</bestanswer>
<nbestanswers>
<answer_item>They just like it.</answer_item>
<answer_item>Because they are hunters.</answer_item>
</nbestanswers>
</document>
<document>
<uri>q101</uri>
<subject>No answers here?</subject>
<content>this question has no answers</content>
</document>
<document>
<uri>q102</uri>
<subject>Missing content tag</subject>
<nbestanswers>
<answer_item>single answer &amp; that's it</answer_item>
</nbestanswers>
</document>
<document>
<subject>record without a uri is skipped</subject>
</document>
"""


def _ya_reference_mirror():
    """The reference worker's per-record outputs over YA_RAW, built by
    hand from convert_yahoo_answers.py:94-147 semantics: skip questions
    with no answers, question text_raw = (subject + ' ' + content).strip()
    after remove_tags, answer DOCNO = uri-i, best answer grade 4 / others
    3 (best matched on the RAW pre-remove_tags text)."""
    q100 = "Why do cats run so fast? My cat keeps running & jumping."
    q102 = "Missing content tag"
    questions = {"q100": q100, "q102": q102}  # q101: 0 answers -> ignored
    answers = {
        "q100-0": "They just like it.",
        "q100-1": "Because they are hunters.",
        "q102-0": "single answer & that's it",
    }
    qrels = {("q100", "q100-0"): 3, ("q100", "q100-1"): 4, ("q102", "q102-0"): 3}
    return questions, answers, qrels


def test_yahoo_parse_records(spark, tmp_path):
    p = tmp_path / "ya.xml"
    p.write_text(YA_RAW)
    rows = {r.uri: r.asDict() for r in C.read_yahoo_answers(spark, str(p)).collect()}
    assert rows["q100"]["subject"] == "Why do cats run so fast?"  # tags removed
    assert rows["q100"]["content"] == "My cat keeps running & jumping."
    assert rows["q100"]["best_answer_id"] == 1
    assert rows["q100"]["answers"] == [
        "They just like it.",
        "Because they are hunters.",
    ]
    assert rows["q101"]["answers"] == []
    assert rows["q102"]["content"] == ""  # missing <content> -> '' (formats.py:53)
    assert rows["q102"]["best_answer_id"] == -1  # no <bestanswer>
    errs = [r for r in rows.values() if r["parse_error"]]
    assert len(errs) == 1 and "uri" in errs[0]["parse_error"]


def test_yahoo_duplicate_best_answer_last_match_quirk(spark, tmp_path):
    """Duplicate answers: the reference loop re-assigns best_answer_id on
    EVERY match (formats.py:63-66), so the grade-4 row lands on the LAST
    duplicate. Pinned as reference parity, not 'fixed'."""
    raw = """<document>
<uri>q1</uri>
<subject>dup</subject>
<bestanswer>same text</bestanswer>
<nbestanswers>
<answer_item>same text</answer_item>
<answer_item>other</answer_item>
<answer_item>same text</answer_item>
</nbestanswers>
</document>
"""
    p = tmp_path / "dup.xml"
    p.write_text(raw)
    parsed = C.read_yahoo_answers(spark, str(p))
    row = parsed.collect()[0]
    assert row.best_answer_id == 2
    qrels = {(r.query_id, r.doc_id): r.grade for r in C.yahoo_answers_qrels(parsed).collect()}
    assert qrels[("q1", "q1-2")] == 4  # MAX_RELEV_GRADE on the LAST match
    assert qrels[("q1", "q1-0")] == 3


def test_yahoo_questions_answers_qrels_match_reference(spark, tmp_path):
    p = tmp_path / "ya.xml"
    p.write_text(YA_RAW)
    parsed = C.read_yahoo_answers(spark, str(p))
    want_q, want_a, want_qrel = _ya_reference_mirror()

    got_q = {r[C.DOCID_FIELD]: r.asDict() for r in C.yahoo_answers_questions(parsed, DICT, STOPS).collect()}
    assert set(got_q) == set(want_q)
    for qid, raw in want_q.items():
        lem, unlemm = _proc_text(raw)
        assert got_q[qid]["text_raw"] == raw
        assert got_q[qid]["text"] == lem
        assert got_q[qid]["text_unlemm"] == unlemm

    got_a = {r[C.DOCID_FIELD]: r.asDict() for r in C.yahoo_answers_answers(parsed, DICT, STOPS).collect()}
    assert set(got_a) == set(want_a)
    for aid, raw in want_a.items():
        lem, unlemm = _proc_text(raw)
        assert got_a[aid]["text_raw"] == raw
        assert got_a[aid]["text"] == lem
        assert got_a[aid]["text_unlemm"] == unlemm

    got_qrel = {(r.query_id, r.doc_id): r.grade for r in C.yahoo_answers_qrels(parsed).collect()}
    assert got_qrel == want_qrel


def test_yahoo_bitext_pairs(spark, tmp_path):
    p = tmp_path / "ya.xml"
    p.write_text(YA_RAW)
    parsed = C.read_yahoo_answers(spark, str(p))
    rows = C.yahoo_answers_bitext(parsed, DICT, STOPS).collect()
    # 3 answers x 2 fields; the reference writes the LEMMA line to both
    # the text and text_unlemm bitext files (its lines 149-154)
    assert len(rows) == 6
    q_lem, _ = _proc_text("Why do cats run so fast? My cat keeps running & jumping.")
    a0_lem, _ = _proc_text("They just like it.")
    by_key = {(r.uri, r.pos, r.field): (r.quest, r.answ) for r in rows}
    assert by_key[("q100", 0, "text")] == (q_lem, a0_lem)
    assert by_key[("q100", 0, "text_unlemm")] == (q_lem, a0_lem)
    assert set(r.field for r in rows) == {"text", "text_unlemm"}


def test_yahoo_best_answer_empty_match_quirk(spark, tmp_path):
    """No <bestanswer> means best_answer='' — an EMPTY answer_item then
    matches it (reference formats.py:56,65), so the grade-4 row can land
    on an empty answer. Pinned so the quirk is explicit."""
    raw = (
        "<document>\n<uri>z1</uri>\n<subject>s</subject>\n"
        "<nbestanswers><answer_item></answer_item>"
        "<answer_item>real text</answer_item></nbestanswers>\n</document>\n"
    )
    p = tmp_path / "ya2.xml"
    p.write_text(raw)
    parsed = C.read_yahoo_answers(spark, str(p))
    assert parsed.collect()[0].best_answer_id == 0
    grades = {r.doc_id: r.grade for r in C.yahoo_answers_qrels(parsed).collect()}
    assert grades == {"z1-0": 4, "z1-1": 3}


# ---------------------------------------------------------------------------
# Wikipedia DPR (convert_pass.py worker + convert_queries.py loop)
# ---------------------------------------------------------------------------

DPR_PASS_LINES = [
    "id\ttext\ttitle",  # header -> skipped (convert_pass.py:96)
    "18\tAaron the brother appears as the first high priest.\tAaron",
    "19\tThe cats were running fast.\tCats",
    "bad\tonly-two-fields",
]

DPR_QUERIES_JSON = """[
  {
    "question": "who is the brother of moses",
    "answers": ["Aaron"],
    "positive_ctxs": [
      {
        "title": "Aaron",
        "text": "Some intro sentence. Aaron the brother appears as the first high priest. Unrelated tail.",
        "psg_id": 18
      }
    ],
    "negative_ctxs": [
      { "passage_id": "99", "title": "x", "text": "y" }
    ]
  },
  {
    "question": "the",
    "answers": ["nothing"],
    "positive_ctxs": [ { "passage_id": "19", "title": "", "text": "no match here." } ],
    "negative_ctxs": []
  }
]
"""


def test_dpr_passages_matches_reference_recipe(spark):
    lines = spark.createDataFrame([(l,) for l in DPR_PASS_LINES], "value string")
    got = {r[C.DOCID_FIELD]: r.asDict() for r in C.dpr_passages(lines, DICT, STOPS).collect()}
    assert set(got) == {"18", "19"}  # header + misformat dropped
    t_lem, t_unlemm = _proc_text("Aaron")
    b_lem, b_unlemm = _proc_text("Aaron the brother appears as the first high priest.")
    row = got["18"]
    assert row["text"] == f"{t_lem} {b_lem}"  # title lemmas + ' ' + text lemmas
    assert row["title_unlemm"] == t_unlemm
    assert row["text_unlemm"] == b_unlemm
    assert row["text_raw"] == "Aaron Aaron the brother appears as the first high priest."


def test_dpr_passages_id_subset(spark):
    lines = spark.createDataFrame([(l,) for l in DPR_PASS_LINES], "value string")
    got = C.dpr_passages(lines, DICT, STOPS, passage_ids=["19"]).collect()
    assert [r[C.DOCID_FIELD] for r in got] == ["19"]


def test_dpr_queries_and_qrels(spark, tmp_path):
    p = tmp_path / "nq-dev.json"
    p.write_text(DPR_QUERIES_JSON)
    parsed = C.read_dpr_queries(spark, str(p))
    rows = {r.qid_idx: r.asDict() for r in parsed.collect()}
    assert rows[0]["positive_ctxs"][0]["passage_id"] == "18"  # psg_id key + int -> str
    assert rows[0]["negative_ids"] == ["99"]  # passage_id key

    # min_query_tok_qty=1: query 1 ("the") lemmatizes to a stop -> dropped,
    # but its INDEX is still consumed (reference enumerates then filters)
    q = {r[C.DOCID_FIELD]: r.asDict() for r in C.dpr_queries(parsed, "dev", DICT, STOPS, min_query_tok_qty=1).collect()}
    assert set(q) == {"dev_0"}
    lem, unlemm = _proc_text("who is the brother of moses")
    assert q["dev_0"]["text"] == lem
    assert q["dev_0"]["text_unlemm"] == unlemm
    assert q["dev_0"]["text_raw"] == "who is the brother of moses"
    assert q["dev_0"]["answer_list"] == ["Aaron"]

    # qrels: only kept queries contribute; negatives only when enabled
    qr = {(r.query_id, r.doc_id): r.grade for r in C.dpr_qrels(parsed, "dev", DICT, STOPS, min_query_tok_qty=1).collect()}
    assert qr == {("dev_0", "18"): 1}
    qr_neg = {(r.query_id, r.doc_id): r.grade
              for r in C.dpr_qrels(parsed, "dev", DICT, STOPS, min_query_tok_qty=1,
                                   use_precomputed_negatives=True).collect()}
    assert qr_neg == {("dev_0", "18"): 1, ("dev_0", "99"): 0}


def test_dpr_bitext_answer_bearing_sentences(spark, tmp_path):
    p = tmp_path / "nq-dev.json"
    p.write_text(DPR_QUERIES_JSON)
    parsed = C.read_dpr_queries(spark, str(p))
    rows = C.dpr_bitext(parsed, "dev", DICT, STOPS, min_query_tok_qty=1).collect()
    by_field = {}
    for r in rows:
        by_field.setdefault(r.field, []).append((r.quest, r.answ))
    q_lem, q_unlemm = _proc_text("who is the brother of moses")
    t_lem, t_unlemm = _proc_text("Aaron")
    s_lem, s_unlemm = _proc_text("Aaron the brother appears as the first high priest.")
    # title pair: query TOKENS <-> title TOKENS (convert_queries.py:137-140)
    assert by_field["title_unlemm"] == [(q_unlemm, t_unlemm)]
    # exactly ONE sentence of the positive ctx contains the answer "Aaron"
    # case-insensitively -> one text pair (lemmas) + one text_unlemm pair
    assert by_field["text"] == [(q_lem, s_lem)]
    assert by_field["text_unlemm"] == [(q_unlemm, s_unlemm)]


def test_dpr_passages_multifile_gz(spark, tmp_path):
    """The realistic ingest shape: the passage TSV split across several
    .gz part files read as one glob (the reference feeds a single 21M-row
    psgs_w100.tsv.gz; a cluster ingest shards it)."""
    import gzip

    d = tmp_path / "parts"
    d.mkdir()
    with gzip.open(d / "part0.tsv.gz", "wt") as f:
        f.write("id\ttext\ttitle\n18\tAaron the brother.\tAaron\n")
    with gzip.open(d / "part1.tsv.gz", "wt") as f:
        f.write("19\tThe cats were running fast.\tCats\n20\tShear flows.\tFlow\n")
    lines = spark.read.text(str(d / "*.tsv.gz"))
    got = {r[C.DOCID_FIELD] for r in C.dpr_passages(lines, DICT, STOPS).collect()}
    assert got == {"18", "19", "20"}


# --------------------------------------------------------------------------
# MS MARCO v2 (msmarco_v2/convert_docs.py, convert_pass.py)
# --------------------------------------------------------------------------

MARCO_V2_DOC_LINES = [
    '{"docid": "msmarco_doc_00_1", "url": "https://www.example.com/cats", '
    '"title": "Running Cats", "headings": "Cats Running Fast", '
    '"body": "the cats were running faster"}',
    '{"docid": "msmarco_doc_00_2", "url": "http://site.org/a", '
    '"title": "Books", "headings": "", "body": "she studies old books of maps"}',
    "",  # empty line -> worker returns None, skipped
    '{"docid": "msmarco_doc_00_3", "url": "https://x.io/q?p=1", '
    '"title": "Mice & Feet", "headings": "Deep", "body": "feet of mice went deeper"}',
]

MARCO_V2_PASS_LINES = [
    '{"pid": "msmarco_passage_00_1", "docid": "msmarco_doc_00_1", '
    '"passage": "the cats were running faster"}',
    '{"pid": "msmarco_passage_00_2", "docid": "msmarco_doc_00_1", '
    '"passage": "cats run very fast indeed"}',
    '{"pid": "msmarco_passage_00_3", "docid": "msmarco_doc_00_2", '
    '"passage": "she studies old books of maps"}',
    "",
]


def test_msmarco_v2_docs_matches_reference_recipe(spark):
    import json

    lines = spark.createDataFrame([(l,) for l in MARCO_V2_DOC_LINES], "value string")
    got = {r[C.DOCID_FIELD]: r.asDict() for r in C.msmarco_v2_docs(lines, DICT, STOPS).collect()}
    assert set(got) == {"msmarco_doc_00_1", "msmarco_doc_00_2", "msmarco_doc_00_3"}
    # pure-Python mirror of convert_docs.py:72-106
    for line in MARCO_V2_DOC_LINES:
        if not line:
            continue
        fields = json.loads(line)
        url, title, headings, body = (
            fields["url"], fields["title"], fields["headings"], fields["body"]
        )
        url_lem, url_unlemm = _proc_text(_pretok_url(url))
        h_lem, h_unlemm = _proc_text(headings)
        t_lem, t_unlemm = _proc_text(title)
        b_lem, b_unlemm = _proc_text(body)
        row = got[fields["docid"]]
        assert row["url"] == url_lem
        assert row["url_unlemm"] == url_unlemm
        assert row["headings"] == h_lem
        assert row["headings_unlemm"] == h_unlemm
        assert row["title"] == t_lem
        assert row["title_unlemm"] == t_unlemm
        assert row["body"] == b_unlemm
        # join order url, headings, title, body (convert_docs.py:92)
        assert row["text"] == " ".join([url_lem, h_lem, t_lem, b_lem]).strip()
        assert row["text_raw"] == " ".join([url, headings, title, body])


def test_msmarco_v2_docs_body_truncation(spark):
    # the v2 worker cuts the BODY field only (convert_docs.py:77), unlike
    # the v1 TSV converter which cuts the whole line
    line = (
        '{"docid": "D", "url": "u", "title": "t", "headings": "h", '
        '"body": "' + "x" * 100 + '"}'
    )
    lines = spark.createDataFrame([(line,)], "value string")
    out = C.msmarco_v2_docs(lines, DICT, STOPS, max_doc_size=30).collect()
    assert len(out) == 1
    assert out[0]["text_raw"] == "u h t " + "x" * 30


def test_msmarco_v2_passages_and_doc2pass(spark):
    import json

    lines = spark.createDataFrame([(l,) for l in MARCO_V2_PASS_LINES], "value string")
    entries = C.msmarco_v2_passages(lines, DICT, STOPS)
    got = {r[C.DOCID_FIELD]: r.asDict() for r in entries.collect()}
    assert set(got) == {f"msmarco_passage_00_{i}" for i in (1, 2, 3)}
    for line in MARCO_V2_PASS_LINES:
        if not line:
            continue
        fields = json.loads(line)
        lem, unlemm = _proc_text(fields["passage"])
        row = got[fields["pid"]]
        assert row[C.ORIG_DOCID_FIELD] == fields["docid"]
        assert row["text"] == lem
        assert row["text_unlemm"] == unlemm
        assert row["text_raw"] == fields["passage"]
    # doc2pass recoding (convert_pass.py:121-133); ids sorted for determinism
    d2p = {r[C.DOCID_FIELD]: r.pass_ids for r in C.msmarco_v2_doc2pass(entries).collect()}
    assert d2p == {
        "msmarco_doc_00_1": "msmarco_passage_00_1 msmarco_passage_00_2",
        "msmarco_doc_00_2": "msmarco_passage_00_3",
    }


def test_msmarco_v2_passage_truncation_and_badjson(spark):
    lines = spark.createDataFrame(
        [
            ('{"pid": "p1", "docid": "d1", "passage": "' + "y" * 50 + '"}',),
            ("{not json at all",),
        ],
        "value string",
    )
    out = C.msmarco_v2_passages(lines, DICT, STOPS, max_pass_size=10).collect()
    assert len(out) == 1  # bad JSON dropped
    assert out[0]["text_raw"] == "y" * 10


# --------------------------------------------------------------------------
# Utility scripts: add_stemmed_field.py / split_queries.py /
# filter_queries.py / merge_bsonl.py
# --------------------------------------------------------------------------


def test_add_stemmed_field_matches_parser(spark):
    rows = [("d1", "the Running dogs walked"), ("d2", "maps & books!")]
    entries = spark.createDataFrame(rows, f"{C.DOCID_FIELD} string, text_raw string")
    got = {r[C.DOCID_FIELD]: r.text_stems for r in C.add_stemmed_field(entries, STOPS).collect()}
    parser = KrovetzStemParser(STOPS)
    for did, raw in rows:
        assert got[did] == parser(raw)


def test_split_queries_exact_sizes_and_qrels_routing(spark):
    qs = spark.createDataFrame(
        [(f"q{i}", f"text {i}") for i in range(10)], f"{C.DOCID_FIELD} string, text string"
    )
    out = C.split_queries(qs, [6, 3, 1], seed=5)
    parts = {r[C.DOCID_FIELD]: r.part for r in out.collect()}
    from collections import Counter

    assert Counter(parts.values()) == {0: 6, 1: 3, 2: 1}
    # deterministic: same seed → same assignment; different seed differs
    again = {r[C.DOCID_FIELD]: r.part for r in C.split_queries(qs, [6, 3, 1], seed=5).collect()}
    assert again == parts
    other = {r[C.DOCID_FIELD]: r.part for r in C.split_queries(qs, [6, 3, 1], seed=6).collect()}
    assert other != parts
    with pytest.raises(ValueError):
        C.split_queries(qs, [4, 4])
    # qrels routing: unknown query ids dropped (reference miss_qty)
    qrels = spark.createDataFrame(
        [("q0", "d1", 1), ("q3", "d2", 0), ("zz", "d3", 1)],
        "query_id string, doc_id string, grade int",
    )
    routed = {(r.query_id, r.doc_id): r.part for r in C.split_qrels(qrels, out).collect()}
    assert routed == {("q0", "d1"): parts["q0"], ("q3", "d2"): parts["q3"]}


def test_filter_queries_text_match(spark):
    qs = spark.createDataFrame(
        [("q1", "what is a cat"), ("q2", "maps of rome"), ("q3", None)],
        f"{C.DOCID_FIELD} string, text string",
    )
    ig = spark.createDataFrame([("x9", "maps of rome")], f"{C.DOCID_FIELD} string, text string")
    kept = {r[C.DOCID_FIELD] for r in C.filter_queries(qs, ig).collect()}
    assert kept == {"q1"}  # q2 text-matched, q3 null text dropped


def test_merge_entries_disjoint_fields(spark):
    a = spark.createDataFrame([("d1", "t1"), ("d2", "t2")], f"{C.DOCID_FIELD} string, text string")
    b = spark.createDataFrame([("d1", "s1"), ("d2", "s2")], f"{C.DOCID_FIELD} string, text_stems string")
    got = {r[C.DOCID_FIELD]: (r.text, r.text_stems) for r in C.merge_entries(a, b).collect()}
    assert got == {"d1": ("t1", "s1"), "d2": ("t2", "s2")}
