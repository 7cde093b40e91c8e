"""Audit pandas-level dtype parity between every oracle-checked Spark
query and its DuckDB oracle.

Why this level: the driver's t2 gate converts BOTH results to pandas
before canonicalizing/hashing, so the comparison is sensitive to the
pandas *representation*, not the logical value — r8's q_text_stats had
identical values but DuckDB's ``SUM(CASE …)`` came back HUGEINT, which
pandas renders float64 (``70.0``) against Spark's int64 (``70``) and
the value-hash diverged. The local oracle harness fetches DuckDB rows
natively (HUGEINT -> int) so it cannot see this class. This audit can.

Usage: python tools/oracle_dtype_audit.py [sf_dir]   (default sf0.001)
Prints one line per mismatched column; exits 1 if any genuine mismatch.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402

from dataworks_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def normalize(dtype: str) -> str:
    """Collapse representation noise the driver's canonicalizer is
    known to tolerate (calibrated against r8 driver-green rows):
    datetime64 tick resolution / tz, int widths (q_window_functions'
    int32 ranks hashed equal to DuckDB's int64), and date-objects vs
    midnight datetimes (q_scalar_functions.next_monday). What it does
    NOT tolerate — the class this audit exists for — is int vs float
    (r8's q_text_stats HUGEINT artifact)."""
    d = str(dtype)
    if d.startswith("datetime64"):
        return "datetime64"
    if d.startswith(("int", "uint")):
        return "int"
    if d.startswith("float"):
        return "float"
    return d


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    from tests.oracle_harness import duckdb_conn

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb_conn(sf_dir)
    bad = 0
    for name in sorted(ORACLE_SQL):
        spd = QUERIES[name](spark, sf_dir).toPandas()
        dpd = con.execute(ORACLE_SQL[name]).df()
        dpd.columns = [c.lower() for c in dpd.columns]
        spd.columns = [c.lower() for c in spd.columns]
        for c in spd.columns:
            if c not in dpd.columns:
                print(f"{name}.{c}: MISSING in oracle")
                bad += 1
                continue
            s, d = normalize(spd[c].dtype), normalize(dpd[c].dtype)
            if {s, d} == {"object", "datetime64"}:
                import datetime as _dt

                obj = spd[c] if s == "object" else dpd[c]
                vals = obj.dropna()
                if len(vals) and isinstance(vals.iloc[0], _dt.date):
                    continue  # date objects vs midnight datetimes: driver-tolerated
            if s != d:
                # nullable upcast: if either side holds NULLs pandas
                # floats an int column; only flag when no NULLs exist
                # (compare NORMALIZED families — s/d are 'int'/'float')
                if {s, d} == {"int", "float"} and (
                    spd[c].isna().any() or dpd[c].isna().any()
                ):
                    continue
                print(f"{name}.{c}: spark={s} duckdb={d}")
                bad += 1
    print(f"audit done: {bad} mismatched columns across {len(ORACLE_SQL)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
