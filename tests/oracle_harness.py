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
        # collapse representation noise at display precision; + 0.0
        # collapses -0.0 too (round() PRESERVES the zero sign — Spark
        # -0.0 vs DuckDB 0.0 stringified differently and false-failed;
        # r10 review)
        return round(v, 9) + 0.0
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
    """Per-cell comparison keys. Strings are TAGGED ('s:...') and NULL
    is a non-printable sentinel so cross-type coincidences cannot
    false-PASS: bare str() rendered NULL and the literal string 'None'
    identically (likewise int 1 vs VARCHAR '1', float NaN vs the
    string 'NaN') — masking exactly the divergences this harness
    exists to catch (r10 review)."""
    out = []
    for v in row:
        n = _norm(v)
        if n is None:
            out.append("\x00NULL")
        elif isinstance(v, str):
            out.append("s:" + n)
        else:
            out.append(str(n))
    return tuple(out)


def _num_class(dtype_name: str) -> str | None:
    """Classify a type name into the numeric family the driver's
    pandas-level hash distinguishes: int widths collapse (int32 vs
    int64 hash equal — verified against driver-green r8 rows) but int
    vs float does NOT (DuckDB HUGEINT -> pandas float64 rendered
    ``70.0`` against Spark int64 ``70`` broke q_text_stats in r8)."""
    d = dtype_name.lower()
    if d.startswith(("int", "uint", "long", "short", "byte", "bigint", "smallint", "tinyint")):
        return "int"
    if d.startswith(("float", "double")):
        return "float"
    return None


_DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT_TYPES = {"HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL"}


def _duck_pd_class(duck_type: str) -> str | None:
    """The pandas numeric family a DECLARED DuckDB type renders as
    through ``.df()`` (what the driver hashes): the 128-bit ints and
    DECIMAL become float64; native ints stay int64."""
    t = duck_type.upper()
    if t in _DUCK_FLOAT_TYPES or t.startswith("DECIMAL"):
        return "float"
    if t in _DUCK_INT_TYPES:
        return "int"
    return None


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={spark_cols} duckdb={duck_cols}"

    # Driver-fidelity dtype gate: the driver converts BOTH results to
    # pandas before hashing, where DuckDB's 128-bit aggregates (SUM of
    # int -> HUGEINT) and DECIMALs become float64 while Spark's ints
    # stay int64 — values identical, hashes different. The native
    # fetchall() above cannot see this (HUGEINT -> Python int), so
    # classify the oracle's DECLARED types (DESCRIBE plans the query
    # without executing it — no second oracle run) into the pandas
    # family they will render as, and compare against Spark's schema.
    duck_types = {
        r[0].lower(): r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    for f in spark_df.schema.fields:
        s_cls = _num_class(f.dataType.simpleString())
        d_cls = _duck_pd_class(duck_types.get(f.name.lower(), ""))
        if s_cls and d_cls and s_cls != d_cls:
            col_i = spark_cols.index(f.name.lower())
            if any(r[col_i] is None for r in spark_rows):
                continue  # nullable upcast: pandas floats int cols with NULLs
            return False, (
                f"pandas-dtype mismatch on '{f.name}': spark={s_cls} "
                f"duckdb={duck_types[f.name.lower()]} (renders "
                f"{d_cls}64 in pandas) — the driver's hash WILL diverge "
                "(CAST the oracle, e.g. SUM(...) -> CAST(... AS BIGINT))"
            )
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
