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
