"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01; compare row
count, column names, and order-insensitive values EXACTLY (the driver
value-hashes, so fp noise = failure — entries must be rounding-stable)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact repr — the driver value-hashes, so bitwise equality matters
        return repr(v)
    return repr(v)


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in data)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_entry_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    osql = entrymod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_data = [tuple(r) for r in sdf.collect()]
    if osql is None:
        # declared non-SQL-expressible (e.g. seeded random projection):
        # the driver records a rows-only check; mirror that here
        assert name in entrymod.NO_ORACLE_OK, f"no oracle for {name}"
        assert len(s_data) > 0, f"{name}: empty rows-only entry"
        return
    res = duck.execute(osql)
    d_cols = [d[0] for d in res.description]
    d_data = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_data) == len(d_data), f"{name}: row count {len(s_data)} vs {len(d_data)}"
    # dedup_exact is legitimately empty (no byte-identical texts in the corpus)
    if name != "dedup_exact":
        assert len(s_data) > 0, f"{name}: empty result is a weak check"
    sr, dr = _rows(s_cols, s_data), _rows(d_cols, d_data)
    mismatch = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:5]
    assert sr == dr, f"{name}: first mismatches {[(sr[i], dr[i]) for i in mismatch]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"query_id", "doc_id", "score_r", "rank"}
