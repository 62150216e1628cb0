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


# ---------------------------------------------------------------------------
# T7: HTML → text (basic strip path)
# ---------------------------------------------------------------------------
# The reference ships full boilerplate-stripping parsers
# (``utils/HTMLParser.java``, ``utils/CleanerUtil.java``,
# ``flexneuart/ir_datasets/html_parser.py``). Implemented here is the
# BASIC strip path: drop <script>/<style> blocks and comments, remove
# tags, decode entities, collapse whitespace. Boilerplate/main-content
# detection (the Leo cleaner) is out of scope with the external-model
# stack. Two equivalent implementations: a JVM column chain (common five
# entities) and a pandas UDF (full entity table via html.unescape) —
# equality-tested on the common subset.

_HTML_BLOCKS = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_HTML_COMMENT = r"(?s)<!--.*?-->"
_HTML_TAG = r"(?s)<[^>]+>"


def html_to_text_col(col) -> Column:
    """JVM chain: blocks/comments/tags stripped, the five predefined XML
    entities + nbsp decoded, whitespace collapsed."""
    c = _c(col)
    c = F.regexp_replace(c, _HTML_BLOCKS, " ")
    c = F.regexp_replace(c, _HTML_COMMENT, " ")
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text_pandas(s) -> "pd.Series":  # noqa: F821
    """Pandas implementation (full entity table); for UDF use."""
    import html as _html
    import re as _re

    import pandas as pd

    s = pd.Series(s).fillna("")
    s = s.str.replace(_HTML_BLOCKS, " ", regex=True)
    s = s.str.replace(_HTML_COMMENT, " ", regex=True)
    s = s.str.replace(_HTML_TAG, " ", regex=True)
    s = s.map(_html.unescape)
    return s.str.replace(r"\s+", " ", regex=True).str.strip()
