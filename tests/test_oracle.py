"""Differential oracle tests (SURVEY §5.1): every declared query must
hash-match its DuckDB oracle on the same parquet fixtures."""

import pytest

from dataworks_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_match(spark, con, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, con, ORACLE_SQL[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_dtype_gate_catches_uncast_hugeint(spark, con):
    """The r8 q_text_stats class: identical VALUES, but DuckDB's
    SUM(int) declares HUGEINT which pandas renders float64 against
    Spark's int64 — compare() must fail BEFORE the value check, and
    the CAST fix must clear it."""
    df = spark.range(3).selectExpr("sum(id) as s")
    ok, msg = compare(df, con, "SELECT SUM(x) AS s FROM (VALUES (0),(1),(2)) t(x)")
    assert not ok and "dtype" in msg
    ok2, msg2 = compare(
        df, con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (0),(1),(2)) t(x)"
    )
    assert ok2, msg2
