"""Config-driven per-record processing pipeline (SURVEY.md §2.1 S11).

The reference's ir-datasets ingestion (``flexneuart/ir_datasets/
pipeline.py:82-220``) runs a JSON-configured chain of per-record
processors over named fields. Spark restatement: each stage is a column
expression (whole-stage codegen — no Python unless a stage genuinely
needs it), and a pipeline is a JSON-able list of stage dicts:

    [{"op": "truncate", "col": "content", "max_bytes": 32768},
     {"op": "lower", "col": "content"},
     {"op": "code_tokens", "col": "content", "out": "tokens"},
     {"op": "sha256", "col": "content", "out": "content_sha256"}]

``out`` defaults to ``col`` (in-place). Unknown ops raise — mirroring the
reference's config validation (``resources/RestrictedJsonConfig.java``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flexneuart_spark.config import MAX_DOC_SIZE
from flexneuart_spark.functions.textproc import (
    handle_case_col,
    pretokenize_url_col,
    sentencize_col,
    strip_diacritics_ascii_col,
)
from flexneuart_spark.functions.tokenize import (
    code_tokens_col,
    sha256_hex_col,
    whitespace_tokens_col,
)


def _truncate(col: Column, max_bytes: int = MAX_DOC_SIZE) -> Column:
    return F.substring(col, 1, int(max_bytes))


def _collapse_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


STAGES: dict[str, Callable[..., Column]] = {
    "truncate": _truncate,                    # F3 doc truncation
    "lower": handle_case_col,                 # T6 handle_case
    "ascii_clean": strip_diacritics_ascii_col,  # T8 cleanup
    "url_pretokenize": pretokenize_url_col,   # T4
    "sentencize": sentencize_col,             # T3
    "collapse_ws": _collapse_ws,
    "sha256": sha256_hex_col,                 # per-row invariant
    "code_tokens": code_tokens_col,           # T1 slot
    "whitespace_tokens": whitespace_tokens_col,  # T9
}


def apply_pipeline(df: DataFrame, stages: list[dict]) -> DataFrame:
    """Apply the configured stage chain; returns the transformed frame."""
    for i, stage in enumerate(stages):
        conf = dict(stage)
        op = conf.pop("op", None)
        col = conf.pop("col", None)
        out = conf.pop("out", col)
        if op not in STAGES:
            raise ValueError(f"stage {i}: unknown op {op!r} (known: {sorted(STAGES)})")
        if col is None or col not in df.columns:
            raise ValueError(f"stage {i} ({op}): input column {col!r} not in {df.columns}")
        df = df.withColumn(out, STAGES[op](F.col(col), **conf))
    return df


def _html_to_text(col: Column) -> Column:
    from flexneuart_spark.functions.textproc import html_to_text_col

    return html_to_text_col(col)


STAGES["html_to_text"] = _html_to_text  # T7 basic strip path


def _html_main_text(col: Column, min_block_chars: int = 40, max_link_density: float = 0.33) -> Column:
    from flexneuart_spark.functions.textproc import html_main_text_col

    return html_main_text_col(col, min_block_chars, max_link_density)


def _krovetz(col: Column, stop_words: list | None = None) -> Column:
    from flexneuart_spark.functions.kstem import krovetz_stem_col

    return krovetz_stem_col(col, stop_words or [])


STAGES["html_main_text"] = _html_main_text  # T7 boilerplate-aware extraction
STAGES["krovetz"] = _krovetz                # T2 stemming
