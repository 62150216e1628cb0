"""Krovetz stemming (SURVEY.md §2 T2).

The reference wraps the C++ ``krovetzstemmer`` package inside
``KrovetzStemParser`` (``flexneuart/text_proc/parse.py:55-77``: lowercase,
drop ``[^a-z0-9\\s]``, collapse whitespace, remove stop words *before*
stemming, stem each token, join with single spaces). Golden behaviour:
``/root/reference/tests/test_parse.py:21-33``.

This module re-implements the published rule engine of the Krovetz stemmer
(R. Krovetz, "Viewing Morphology as an Inference Process", SIGIR 1993):
inflectional stemming only — plural, past tense, and -ing removal with
spelling recovery (consonant undoubling, silent-e restoration) — plus a
small irregular-form table. The full KStem head-word dictionary is
external data the algorithm consults to stop early; without it the rules
fire unconditionally, which matches the reference's behaviour on regular
inflections (all its golden tests) and differs only on dictionary
exceptions.

Every rule is expressed TWICE from one spec: in pure Python (used inside
the Arrow/pandas UDF — no per-row Python at the Spark layer, one
``str``-vectorized pass per batch) and as DuckDB SQL built by
``sql_stem_expr_ctes`` — so the driver entry has an exact oracle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

VOWELS = "aeiou"
DOUBLE_OK = "bdgmnprt"  # consonants we un-double after -ed / -ing removal

# Irregular forms applied before the rule chain (closed class; the full
# KStem dictionary generalizes this — see module docstring).
KSTEM_IRREGULAR: dict[str, str] = {
    "children": "child",
    "men": "man",
    "women": "woman",
    "feet": "foot",
    "teeth": "tooth",
    "geese": "goose",
    "mice": "mouse",
    "leaves": "leaf",
    "lives": "life",
    "knives": "knife",
    "wives": "wife",
    "wolves": "wolf",
    "calves": "calf",
    "halves": "half",
    "selves": "self",
}

_HAS_DIGIT = re.compile(r"[0-9]")


def _plural(w: str) -> str:
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith(("ches", "shes", "xes")):
        return w[:-2]
    if w.endswith("zes"):
        return w[:-1]
    if w.endswith(("ss", "us", "is")):
        return w
    if w.endswith("s") and len(w) > 3:
        return w[:-1]
    return w


def _cvc(s: str) -> bool:
    return (
        len(s) >= 3
        and s[-1] not in VOWELS
        and s[-1] not in "wxy"
        and s[-2] in VOWELS
        and s[-3] not in VOWELS
    )


def _recover(s: str) -> str:
    """Spelling recovery after suffix removal: un-double a final doubled
    consonant (hopp→hop), restore a silent e after a CVC tail (hop→hope
    for 'hoping')."""
    if len(s) >= 2 and s[-1] == s[-2] and s[-1] in DOUBLE_OK:
        return s[:-1]
    if _cvc(s):
        return s + "e"
    return s


def _past(w: str) -> str:
    if w.endswith("ied") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("eed"):
        return w[:-1]
    if w.endswith("ed") and len(w) > 4:
        return _recover(w[:-2])
    return w


def _ing(w: str) -> str:
    if w.endswith("ing") and len(w) > 5:
        return _recover(w[:-3])
    return w


def kstem_word(w: str) -> str:
    """Stem one lowercase token (rule engine — see module docstring)."""
    if len(w) < 3 or _HAS_DIGIT.search(w):
        return w
    irr = KSTEM_IRREGULAR.get(w)
    if irr is not None:
        return irr
    return _ing(_past(_plural(w)))


_DROP = re.compile(r"[^a-z0-9\s]+")
_MULTI_WS = re.compile(r"\s+")


class KrovetzStemParser:
    """API twin of the reference ``KrovetzStemParser``
    (``flexneuart/text_proc/parse.py:55-77``): lowercase → drop
    non-alphanumeric → collapse whitespace → remove stop words (before
    stemming) → stem each token → single-space join."""

    def __init__(self, stop_words):
        self.stop_words = frozenset(w.lower() for w in stop_words)

    def __call__(self, text: str) -> str:
        text = text.lower()
        s = _MULTI_WS.sub(" ", _DROP.sub(" ", text)).strip()
        return " ".join(kstem_word(t) for t in s.split() if t not in self.stop_words)


def krovetz_stem_col(text_col: str | Column, stop_words: list[str]) -> Column:
    """Arrow-batched pandas UDF column: KrovetzStemParser over a string
    column (name or Column). The rule engine is pure string ops, so one
    Python pass per Arrow batch; at the scale path, run it once per
    corpus build, not per query."""
    parser = KrovetzStemParser(stop_words)

    @F.pandas_udf("string")
    def _stem(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parser(t) if t is not None else None)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _stem(c)


# ---------------------------------------------------------------------------
# DuckDB oracle: the same rules as SQL (generated, not hand-copied)
# ---------------------------------------------------------------------------


def _sql_recover(c: str) -> str:
    vowels = "'a','e','i','o','u'"
    dbl = ", ".join(f"'{ch}'" for ch in DOUBLE_OK)
    return f"""CASE
      WHEN len({c}) >= 2 AND substr({c}, len({c}), 1) = substr({c}, len({c}) - 1, 1)
           AND substr({c}, len({c}), 1) IN ({dbl})
        THEN substr({c}, 1, len({c}) - 1)
      WHEN len({c}) >= 3 AND substr({c}, len({c}), 1) NOT IN ({vowels}, 'w', 'x', 'y')
           AND substr({c}, len({c}) - 1, 1) IN ({vowels})
           AND substr({c}, len({c}) - 2, 1) NOT IN ({vowels})
        THEN {c} || 'e'
      ELSE {c} END"""


def _sql_plural(t: str) -> str:
    return f"""CASE
      WHEN {t} LIKE '%ies' AND len({t}) > 4 THEN substr({t}, 1, len({t}) - 3) || 'y'
      WHEN {t} LIKE '%sses' THEN substr({t}, 1, len({t}) - 2)
      WHEN {t} LIKE '%ches' OR {t} LIKE '%shes' OR {t} LIKE '%xes' THEN substr({t}, 1, len({t}) - 2)
      WHEN {t} LIKE '%zes' THEN substr({t}, 1, len({t}) - 1)
      WHEN {t} LIKE '%ss' OR {t} LIKE '%us' OR {t} LIKE '%is' THEN {t}
      WHEN {t} LIKE '%s' AND len({t}) > 3 THEN substr({t}, 1, len({t}) - 1)
      ELSE {t} END"""


def _sql_irregular(t: str) -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in KSTEM_IRREGULAR.items())
    return f"CASE {t} {whens} ELSE NULL END"


def sql_stem_ctes(tok_cte: str = "toks") -> str:
    """CTE chain stemming column ``tok`` of ``tok_cte(doc_id, pos, tok)``
    → ``stemmed(doc_id, pos, stem)``. Exactly mirrors ``kstem_word``."""
    return f"""
k1 AS (
  SELECT doc_id, pos, tok,
         CASE WHEN len(tok) < 3 OR regexp_matches(tok, '[0-9]') THEN tok END AS fixed,
         {_sql_irregular('tok')} AS irr
  FROM {tok_cte}
),
k2 AS (
  SELECT doc_id, pos, fixed, irr,
         CASE WHEN fixed IS NULL AND irr IS NULL THEN {_sql_plural('tok')} END AS p
  FROM k1
),
k3 AS (
  SELECT doc_id, pos, fixed, irr,
         CASE
           WHEN p IS NULL THEN NULL
           WHEN p LIKE '%ied' AND len(p) > 4 THEN substr(p, 1, len(p) - 3) || 'y'
           WHEN p LIKE '%eed' THEN substr(p, 1, len(p) - 1)
           WHEN p LIKE '%ed' AND len(p) > 4 THEN NULL
           ELSE p
         END AS pa_done,
         CASE WHEN p LIKE '%ed' AND NOT p LIKE '%ied' AND NOT p LIKE '%eed' AND len(p) > 4
              THEN substr(p, 1, len(p) - 2) END AS ed_stem
  FROM k2
),
k4 AS (
  SELECT doc_id, pos, fixed, irr,
         coalesce(pa_done, {_sql_recover('ed_stem')}) AS pa
  FROM k3
),
k5 AS (
  SELECT doc_id, pos, fixed, irr,
         CASE WHEN pa LIKE '%ing' AND len(pa) > 5 THEN substr(pa, 1, len(pa) - 3) END AS ing_stem,
         pa
  FROM k4
),
stemmed AS (
  SELECT doc_id, pos,
         coalesce(fixed, irr,
                  CASE WHEN ing_stem IS NOT NULL THEN {_sql_recover('ing_stem')} ELSE pa END) AS stem
  FROM k5
)"""
