"""Differential comparison harness mirroring the driver's t2 gate:
run a Spark query and its DuckDB oracle on the same parquet, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from dataworks_spark.session import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / representation noise at display precision
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={spark_cols} duckdb={duck_cols}"
    # align duckdb column order to spark's
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]

    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"

    s = sorted(map(_key, spark_rows))
    d = sorted(map(_key, duck_rows))
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"value mismatch, first diffs (spark vs duckdb): {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
