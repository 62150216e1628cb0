"""BSON entry I/O: spec round trips, reference record framing, Spark
reader, and gz JSONL reading (S1 coverage)."""

from __future__ import annotations

import gzip
import io
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flexneuart_spark.io.bsonio import (
    bson_dumps,
    bson_loads,
    iter_bson_records,
    read_bson_entries,
    read_json_from_bin,
    write_json_to_bin,
)

# JSON-ish values in the subset the reference's data entries use
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**62), 2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=30),
)
_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8).filter(lambda s: "\x00" not in s), inner, max_size=4),
    ),
    max_leaves=12,
)
_doc = st.dictionaries(
    st.text(min_size=1, max_size=8).filter(lambda s: "\x00" not in s), _value, max_size=6
)


@settings(max_examples=80, deadline=None)
@given(_doc)
def test_bson_roundtrip(doc):
    assert bson_loads(bson_dumps(doc)) == doc


def test_known_bson_bytes():
    # {"a": 1} per bsonspec.org: size=12, int32 element, terminator
    b = bson_dumps({"a": 1})
    assert b == b"\x0c\x00\x00\x00\x10a\x00\x01\x00\x00\x00\x00"
    # {"hello": "world"} canonical example from the BSON spec front page
    b2 = bson_dumps({"hello": "world"})
    assert b2 == b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00"


def test_record_framing_roundtrip(tmp_path):
    docs = [
        {"DOCNO": "d1", "text": "hash join", "n": 3},
        {"DOCNO": "d2", "text": "scan filter", "nested": {"k": [1, 2, 3]}},
    ]
    f = io.BytesIO()
    for d in docs:
        write_json_to_bin(d, f)
    f.seek(0)
    back = []
    while (d := read_json_from_bin(f)) is not None:
        back.append(d)
    assert back == docs
    assert list(iter_bson_records(f.getvalue())) == docs


def test_truncated_record_raises():
    f = io.BytesIO()
    write_json_to_bin({"a": 1}, f)
    data = f.getvalue()
    with pytest.raises(ValueError):
        list(iter_bson_records(data[:-2]))
    with pytest.raises(ValueError):
        read_json_from_bin(io.BytesIO(data[:2]))


def test_spark_bson_reader(spark, tmp_path):
    p = tmp_path / "entries.bin"
    with open(p, "wb") as f:
        for i in range(20):
            write_json_to_bin({"DOCNO": f"d{i}", "text": f"doc number {i}"}, f)
    df = read_bson_entries(spark, str(p))
    rows = {r.DOCNO: r.text for r in df.collect()}
    assert len(rows) == 20 and rows["d7"] == "doc number 7"


def test_spark_reads_gz_jsonl_natively(spark, tmp_path):
    # S1: .gz JSONL needs no custom reader — Spark's codec handles it
    p = tmp_path / "entries.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for i in range(10):
            f.write(json.dumps({"DOCNO": f"d{i}", "text": f"t {i}"}) + "\n")
    df = spark.read.json(str(p))
    assert df.count() == 10 and set(df.columns) == {"DOCNO", "text"}


def test_xml_entry_reader(spark, tmp_path):
    from flexneuart_spark.io.xmlentries import read_xml_entries

    p = tmp_path / "docs.txt"
    entries = "".join(
        f"<DOC>\n<DOCNO>doc{i}</DOCNO>\n<TEXT>body text {i}</TEXT>\n</DOC>\n" for i in range(15)
    )
    p.write_text(entries)
    df = read_xml_entries(spark, str(p))
    rows = {r.DOCNO: r.TEXT for r in df.collect()}
    assert len(rows) == 15 and rows["doc3"] == "body text 3"


def test_xml_entry_reader_gz(spark, tmp_path):
    from flexneuart_spark.io.xmlentries import read_xml_entries

    p = tmp_path / "docs.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("<DOC>\n<DOCNO>a</DOCNO>\n<TEXT>alpha</TEXT>\n</DOC>\n")
        f.write("<DOC>\n<DOCNO>b</DOCNO>\n<TEXT>beta</TEXT>\n</DOC>\n")
    df = read_xml_entries(spark, str(p))
    rows = {r.DOCNO: r.TEXT for r in df.collect()}
    assert rows == {"a": "alpha", "b": "beta"}
