"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the real engine (sharded compressed inverted
index + MaxScore/block-max BM25 top-k) over sf0.001 documents.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (+ training-data pipeline operators), each with an exactly
equivalent DuckDB oracle. Definitions live in
``flexneuart_spark/plans/entries.py`` (Spark callables and SQL strings are
generated from shared constants so column names/semantics cannot drift).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flexneuart_spark.plans import ORACLE_SQL, QUERIES_REG, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES_REG)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)


# Entries intentionally WITHOUT a DuckDB oracle (non-SQL-expressible:
# seeded random projections etc.) — the driver records rows-only checks.
NO_ORACLE_OK = frozenset(k for k in QUERIES_REG if k not in ORACLE_SQL)
