"""Config-driven ir-datasets conversion (flexneuart_spark/irds.py) vs
the reference pipeline semantics (flexneuart/ir_datasets/pipeline.py +
the registered processors). Each test pins one reference rule: the
stage-discard semantics, the duplicate-field error, per-processor
output naming, and the DOCNO-from-original-input rule — plus an e2e
run of a beir_dbpedia_entity.json-shaped config through convert_parts.
"""

from __future__ import annotations

import pytest

from flexneuart_spark import irds
from flexneuart_spark.functions.kstem import KrovetzStemParser
from flexneuart_spark.functions.lemma import lemmatize_text, load_lemma_dict

DICT = load_lemma_dict()


def _docs(spark):
    return spark.createDataFrame(
        [("d1", "Running Cats", "the cats were running"), ("d2", "Maps", "old maps of rome")],
        "doc_id string, title string, text string",
    )


def test_stage_discards_unprocessed_fields(spark):
    # pipeline.py:131-134: each stage starts from an empty output dict
    part = {
        "part_name": "docs",
        "is_query": False,
        "src_attributes": ["title", "text"],
        "pipeline": [[{"name": "copy", "args": {"input_fields": ["text"]}}]],
    }
    out = irds.apply_part(_docs(spark), part)
    assert set(out.columns) == {"text", "DOCNO"}  # title discarded


def test_repeating_field_raises(spark):
    part = {
        "part_name": "docs",
        "is_query": False,
        "src_attributes": ["text"],
        "pipeline": [
            [
                {"name": "copy", "args": {"input_fields": ["text"]}},
                {"name": "rename", "args": {"rename_dict": {"text": "text"}}},
            ]
        ],
    }
    with pytest.raises(ValueError, match="Repeating field text stage 1 component 2"):
        irds.apply_part(_docs(spark), part)


def test_docno_from_original_even_when_dropped(spark):
    # pipeline.py:157-160: DOCNO is set from the ORIGINAL id attribute
    part = {
        "part_name": "q",
        "is_query": True,
        "src_attributes": ["text"],
        "pipeline": [[{"name": "rename", "args": {"rename_dict": {"text": "text_raw"}}}]],
    }
    qs = spark.createDataFrame([("q7", "what is a cat")], "query_id string, text string")
    rows = irds.apply_part(qs, part).collect()
    assert rows[0]["DOCNO"] == "q7" and rows[0]["text_raw"] == "what is a cat"


def test_krovetz_and_spacy_output_naming(spark):
    stops = ["the", "of"]
    part = {
        "part_name": "docs",
        "is_query": False,
        "src_attributes": ["text"],
        "pipeline": [
            [
                {"name": "krovetz_stemmer", "args": {"input_fields": ["text"], "stop_words": stops}},
                {"name": "spacy", "args": {"input_fields": ["text"], "model_name": "en", "stop_words": stops}},
                {"name": "copy", "args": {"input_fields": ["text"]}},
            ]
        ],
    }
    got = {r.doc_id if "doc_id" in r.__fields__ else r.DOCNO: r.asDict()
           for r in irds.apply_part(_docs(spark), part).collect()}
    parser = KrovetzStemParser(stops)
    for did, raw in [("d1", "the cats were running"), ("d2", "old maps of rome")]:
        row = got[did]
        assert row["text.stems"] == parser(raw)
        lem, unlemm = lemmatize_text(raw, DICT, frozenset(stops), {})
        assert row["text.lemmas"] == lem
        assert row["text.tokens"] == unlemm
        assert row["text"] == raw


def test_concat_missing_field_contributes_blank(spark):
    # concat.py:43-49: None/missing → '' but the join separator stays
    part = {
        "part_name": "docs",
        "is_query": False,
        "src_attributes": ["title", "text"],
        "pipeline": [
            [{"name": "concat", "args": {"input_fields": ["title", "nope", "text"], "output_field": "all"}}]
        ],
    }
    rows = {r.DOCNO: r["all"] for r in irds.apply_part(_docs(spark), part).collect()}
    assert rows["d1"] == "Running Cats  the cats were running"  # double space kept


def test_html_parser_branches(spark):
    df = spark.createDataFrame(
        [
            ("d1", "<html><title>T1</title><body>Hello <b>world</b></body></html>", "text/html"),
            ("d2", "plain body here", "text/plain"),
            ("d3", "%PDF-1.4 binary", "application/pdf"),
        ],
        "doc_id string, body string, body_content_type string",
    )
    part = {
        "part_name": "docs",
        "is_query": False,
        "src_attributes": ["body", "body_content_type"],
        "pipeline": [[{"name": "html_parser", "args": {}}]],
    }
    got = {r.DOCNO: (r.body, r.title) for r in irds.apply_part(df, part).collect()}
    assert got["d1"] == ("T1 Hello world", "T1")
    assert got["d2"] == ("plain body here", "")
    assert got["d3"] == ("", "")


def test_bert_tokenizer_requires_vocab(spark):
    part = {
        "part_name": "docs",
        "is_query": False,
        "src_attributes": ["text"],
        "pipeline": [[{"name": "bert_tokenizer", "args": {"input_fields": ["text"]}}]],
    }
    with pytest.raises(ValueError, match="vocab"):
        irds.apply_part(_docs(spark), part)


def test_convert_parts_dbpedia_shape(spark, tmp_path):
    """The sample beir_dbpedia_entity.json recipe shape: stage 1 stems +
    renames raw, stage 2 selects the final field names; queries and
    docs parts, written per-part."""
    config = [
        {
            "part_name": "queries_all",
            "dataset_name": "beir/x/test",
            "is_query": True,
            "src_attributes": ["text"],
            "pipeline": [
                [
                    {"name": "krovetz_stemmer", "args": {"input_fields": ["text"], "stop_words": ["the"]}},
                    {"name": "rename", "args": {"rename_dict": {"text": "text_raw"}}},
                ],
                [
                    {"name": "rename", "args": {"rename_dict": {"text_raw": "text_raw", "text.stems": "text"}}}
                ],
            ],
        },
        {
            "part_name": "docs",
            "dataset_name": "beir/x",
            "is_query": False,
            "src_attributes": ["title", "text"],
            "pipeline": [
                [
                    {"name": "krovetz_stemmer", "args": {"input_fields": ["title", "text"], "stop_words": ["the"]}},
                    {"name": "rename", "args": {"rename_dict": {"title": "title_raw", "text": "text_raw"}}},
                ],
                [
                    {
                        "name": "rename",
                        "args": {
                            "rename_dict": {
                                "title.stems": "title",
                                "text.stems": "text",
                                "title_raw": "title_raw",
                                "text_raw": "text_raw",
                            }
                        },
                    }
                ],
            ],
        },
    ]
    qs = spark.createDataFrame([("q1", "the running cats")], "query_id string, text string")
    written = irds.convert_parts(
        spark, config, {"queries_all": qs, "docs": _docs(spark)}, str(tmp_path / "out")
    )
    assert set(written) == {"queries_all", "docs"}
    qrow = spark.read.parquet(written["queries_all"]).collect()[0]
    parser = KrovetzStemParser(["the"])
    assert qrow["DOCNO"] == "q1"
    assert qrow["text_raw"] == "the running cats"
    assert qrow["text"] == parser("the running cats")
    docs = {r.DOCNO: r.asDict() for r in spark.read.parquet(written["docs"]).collect()}
    assert docs["d1"]["title"] == parser("Running Cats")
    assert set(docs["d1"]) == {"DOCNO", "title", "text", "title_raw", "text_raw"}
