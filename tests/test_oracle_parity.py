"""Local mirror of the driver's correctness gate: run every queries()
entry AND its oracle_sql() in DuckDB on the same parquet, compare
row-count + column set + order-insensitive values. Runs at sf0.001 for
speed (the driver runs sf0.01)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("NOUS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.6f}"
    return str(val)


def _rows(pdf):
    cols = sorted(pdf.columns)
    return sorted("|".join(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False))


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, ddb, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = ddb.execute(ORACLE[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        sorted(spark_df.columns), sorted(duck_df.columns)
    )
    assert len(spark_df) == len(duck_df)
    srows, drows = _rows(spark_df), _rows(duck_df)
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, mismatches[:5]


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
