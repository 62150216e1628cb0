"""Krovetz stemmer (T2): reference goldens
(/root/reference/tests/test_parse.py:21-33) + rule-engine properties +
Python↔SQL twin equality on a fuzzed vocabulary."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flexneuart_spark.functions.kstem import (
    KrovetzStemParser,
    kstem_word,
    sql_stem_ctes,
)


def test_reference_goldens():
    # verbatim expectations from the reference's own test suite
    parser = KrovetzStemParser(["is", "a"])
    assert parser("This IS a simplest tests") == "this simplest test"
    assert parser("This IS a simplest teStEd") == "this simplest test"
    assert parser("This IS a simplest-teStEd") == "this simplest test"
    assert parser("This IS a simplest#teStEd") == "this simplest test"


@pytest.mark.parametrize(
    "w,want",
    [
        ("tests", "test"),
        ("tested", "test"),
        ("testing", "test"),
        ("tries", "try"),
        ("tried", "try"),
        ("classes", "class"),
        ("churches", "church"),
        ("washes", "wash"),
        ("boxes", "box"),
        ("sizes", "size"),
        ("agreed", "agree"),
        ("stopped", "stop"),
        ("hopping", "hop"),
        ("hoping", "hope"),
        ("glass", "glass"),
        ("status", "status"),
        ("this", "this"),
        ("analysis", "analysis"),
        ("children", "child"),
        ("knives", "knife"),
        ("x1", "x1"),  # digit → untouched
        ("be", "be"),  # too short
        ("simplest", "simplest"),  # -est is derivational; Krovetz keeps it
    ],
)
def test_rule_engine_words(w, want):
    assert kstem_word(w) == want


def _sql_stem_many(words: list[str]) -> list[str]:
    con = duckdb.connect()
    vals = ", ".join(f"(1, {i + 1}, '{w}')" for i, w in enumerate(words))
    q = f"""
    WITH toksf AS (SELECT * FROM (VALUES {vals}) AS v(doc_id, pos, tok)),
    {sql_stem_ctes('toksf')}
    SELECT stem FROM stemmed ORDER BY pos
    """
    return [r[0] for r in con.execute(q).fetchall()]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12), min_size=1, max_size=20))
def test_sql_twin_matches_python(words):
    got = _sql_stem_many(words)
    want = [kstem_word(w) for w in words]
    assert got == want


def test_sql_twin_on_goldens():
    words = [
        "tests", "tested", "testing", "tries", "tried", "classes", "churches",
        "washes", "boxes", "sizes", "agreed", "stopped", "hopping", "hoping",
        "glass", "status", "this", "analysis", "children", "knives", "simplest",
    ]
    assert _sql_stem_many(words) == [kstem_word(w) for w in words]
