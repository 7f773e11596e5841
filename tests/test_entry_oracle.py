"""Mimics the driver's correctness gate: every ``queries()`` entry runs
at sf0.01 and, where an ``oracle_sql()`` entry exists, is compared with
DuckDB on row count, column names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows_to_set(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


@pytest.mark.parametrize("name", list(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = [f.name for f in df.schema.fields]
    spark_rows = [tuple(r) for r in df.collect()]

    res = ddb.execute(ORACLES[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), \
        f"{name}: column mismatch {spark_cols} vs {ddb_cols}"
    assert len(spark_rows) == len(ddb_rows), \
        f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}"
    a = _rows_to_set(
        spark_rows, spark_cols)
    b = _rows_to_set(ddb_rows, ddb_cols)
    if a != b:
        diff_a = [r for r in a if r not in set(map(tuple, b))][:5]
        diff_b = [r for r in b if r not in set(map(tuple, a))][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_a}\n "
            f"duckdb-only: {diff_b}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(QUERIES)
