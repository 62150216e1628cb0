"""Upstream text-processing helpers (SURVEY.md §2.3 T3/T4/T6/T8).

JVM column-expression chains — the same slot as the reference's
``flexneuart/text_proc/parse.py`` utilities.
"""

from __future__ import annotations

import pandas as pd

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


# ---------------------------------------------------------------------------
# T7b: boilerplate-aware main-content extraction
# ---------------------------------------------------------------------------
# The reference's cleaners (utils/CleanerUtil.java wrapping the "Leo"
# cleaner; flexneuart/ir_datasets/html_parser.py) drop navigation /
# chrome. Restated here as the published link-density block heuristic
# (jusText, Pomikálek 2011 / Readability-style): segment on block-level
# tags, score each block by text length and anchor-text density, keep
# content-like blocks. Deterministic, dependency-free, pandas-UDF shaped.

_BLOCK_SPLIT = r"(?is)</?(?:p|div|td|th|li|ul|ol|h[1-6]|table|section|article|header|footer|nav|aside|blockquote|br)\b[^>]*>"
_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a\s*>"


def html_main_text(doc: str, min_block_chars: int = 40, max_link_density: float = 0.33) -> str:
    """Main-content text of one HTML document: blocks shorter than
    ``min_block_chars`` or with anchor-text density > ``max_link_density``
    are boilerplate (navigation, chrome, link lists) and dropped."""
    import html as _html
    import re as _re

    if not doc:
        return ""
    s = _re.sub(_HTML_BLOCKS, " ", doc)
    s = _re.sub(_HTML_COMMENT, " ", s)
    out = []
    for block in _re.split(_BLOCK_SPLIT, s):
        anchor_text = " ".join(_re.findall(_ANCHOR, block))
        anchor_len = len(_re.sub(_HTML_TAG, " ", anchor_text).strip())
        text = _html.unescape(_re.sub(_HTML_TAG, " ", block))
        text = _re.sub(r"\s+", " ", text).strip()
        if len(text) < min_block_chars:
            continue
        if anchor_len / max(len(text), 1) > max_link_density:
            continue
        out.append(text)
    return "\n".join(out)


def html_main_text_pandas(s, min_block_chars: int = 40, max_link_density: float = 0.33) -> "pd.Series":  # noqa: F821
    import pandas as pd

    return pd.Series(s).fillna("").map(
        lambda d: html_main_text(d, min_block_chars, max_link_density)
    )


def html_main_text_col(col, min_block_chars: int = 40, max_link_density: float = 0.33) -> Column:
    """Arrow-batched UDF column for main-content extraction."""

    @F.pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        return html_main_text_pandas(s, min_block_chars, max_link_density)

    return _udf(_c(col))
