"""Shared fixtures: one SparkSession per test run + a DuckDB oracle
comparator replicating the driver's correctness gate (row count +
column names + order-insensitive value hash).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from balboa_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("balboa-tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canonical_rows(cols, rows):
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def assert_matches_oracle(spark_df, duck_con, oracle_sql, check_rows=True):
    """Driver-gate replica: same row count, same column-name set, same
    order-insensitive value multiset, AND same canonical Arrow types
    (the driver's value hash is representation-sensitive: DuckDB
    HUGEINT != Spark LongType even for equal ints — round-1 lesson)."""
    from balboa_spark.arrowcmp import type_mismatches

    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = duck_con.sql(oracle_sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    tm = type_mismatches(spark_df, duck_con.sql(oracle_sql))
    assert not tm, f"arrow type mismatch (driver hash would fail): {tm}"
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs oracle {len(d_rows)}"
    if check_rows:
        _, s_canon = canonical_rows(s_cols, [[r[c] for c in s_cols] for r in s_rows])
        _, d_canon = canonical_rows(d_cols, d_rows)
        mism = [(a, b) for a, b in zip(s_canon, d_canon) if a != b]
        assert not mism, f"value mismatch, first: {mism[0]}"
