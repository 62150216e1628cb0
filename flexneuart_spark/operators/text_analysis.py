"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

Reference hooks: the text-processing slot (``flexneuart/text_proc/
parse.py``) and data sanity checkers (``scripts/check_utils/``). All
JVM-side column expressions — no Python in the hot path; every operator
has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flexneuart_spark.functions.tokenize import whitespace_tokens_col

# Marker stopwords per language (deterministic heuristic; real pipelines
# plug a fastText-style model in the same slot via a pandas UDF).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + regex word count (BPE-ish pre-token count:
    maximal [a-z0-9]+ runs)."""
    return df.select(
        F.col(id_col),
        F.size(whitespace_tokens_col(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+"), 0)).cast("long").alias("n_word_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


QUALITY_STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic doc quality: avg token length, type-token ratio,
    punctuation ratio (non-alnum-non-space chars / chars) and stopword
    ratio — the standard cheap pre-filters for web-scale corpora. All JVM
    column expressions; combined score = length-saturation × TTR."""
    toks = whitespace_tokens_col(text_col)
    t = df.select(F.col(id_col), F.col(text_col).alias("_x"), toks.alias("_t"))
    n = F.size("_t")
    n_uniq = F.size(F.array_distinct("_t"))
    tok_chars = F.aggregate(F.transform("_t", F.length), F.lit(0), lambda a, x: a + x)
    avg_len = F.when(n > 0, tok_chars / n).otherwise(F.lit(0.0))
    ttr = F.when(n > 0, n_uniq / n).otherwise(F.lit(0.0))
    n_chars = F.length("_x")
    n_punct = F.length(F.regexp_replace("_x", r"[A-Za-z0-9\s]+", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    n_stop = F.size(F.filter("_t", lambda x: x.isin(QUALITY_STOPWORDS)))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    return t.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.least(F.lit(1.0), n / F.lit(100.0)) * ttr, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language ID: argmax of per-language marker hits, ties
    and zero-hits → 'unknown'. Deterministic; returns (id, pred_lang)."""
    toks = whitespace_tokens_col(text_col)
    t = df.select(F.col(id_col), toks.alias("_t"))
    hits = {
        lang: F.size(F.filter("_t", lambda x: x.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[hits[lang] for lang in langs])
    n_best = sum([F.when(hits[lang] == best, 1).otherwise(0) for lang in langs])
    expr = F.lit("unknown")
    for lang in reversed(langs):
        expr = F.when((best > 0) & (n_best == 1) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return t.select(F.col(id_col), expr.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 4) -> DataFrame:
    """Winnowing-style doc fingerprint: the minimum md5 over word n-grams
    (content-defined, shift-robust — unlike a whole-text hash)."""
    toks = whitespace_tokens_col(text_col)
    t = df.select(F.col(id_col), toks.alias("_t"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - n),
        lambda i: F.md5(F.concat_ws(" ", F.slice("_t", i + 1, n))),
    )
    return t.filter(F.size("_t") >= n).select(
        F.col(id_col), F.array_min(grams).alias("fingerprint")
    )
