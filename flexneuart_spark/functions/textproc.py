"""Upstream text-processing helpers (SURVEY.md §2.3 T3/T4/T6/T8).

JVM column-expression chains — the same slot as the reference's
``flexneuart/text_proc/parse.py`` utilities.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def pretokenize_url_col(col) -> Column:
    """T4 — ``parse.py:170-189``: strip scheme and ``www.``, replace
    punctuation runs with spaces (URL %-decoding is left to ingest)."""
    c = _c(col)
    c = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"[^a-zA-Z0-9]+", " ")
    return F.trim(c)


def sentencize_col(col) -> Column:
    """T3 — rule-based sentence split (``parse.py:37-51`` slot): split on
    sentence-final punctuation followed by whitespace; drops empties."""
    c = _c(col)
    return F.filter(F.split(c, r"(?<=[.!?])\s+"), lambda s: F.trim(s) != F.lit(""))


def handle_case_col(col, lower: bool = True) -> Column:
    """T6 — optional lower-casing (``text_proc/utils.py:19-25``)."""
    c = _c(col)
    return F.lower(c) if lower else c


def strip_diacritics_ascii_col(col) -> Column:
    """T8 analogue — drop non-ASCII chars (legacy cleanup slot,
    ``utils/StringUtils.java:106-130``)."""
    return F.regexp_replace(_c(col), r"[^\x00-\x7F]+", "")
