"""Reproducible measurement of the per-action floor quoted in
BASELINE.md §5/§5b: the wall-clock cost of ONE Spark action on trivial
data, with and without AQE, next to the same probe through DuckDB.

This is the constant each of the ~44 bench queries pays at least once;
at sf0.1 it nearly equals DuckDB's entire budget, and §5b shows it is
constant in data size (30/50 queries grow <50 ms across 100× data).

Run: python tools/floor_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataworks_spark.session import get_spark  # noqa: E402


def med(fn, n: int = 9) -> float:
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def main() -> None:
    spark = get_spark("floor_probe")
    one = spark.range(1).cache()
    one.count()  # materialize + JIT
    shuffled = spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count()
    shuffled.count()

    rows = []
    orig_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        rows.append((f"cached_1row_count aqe={aqe}", med(one.count)))
        rows.append((f"one_shuffle_count aqe={aqe}", med(shuffled.count)))
    spark.conf.set("spark.sql.adaptive.enabled", orig_aqe)

    try:
        import duckdb

        con = duckdb.connect()
        rows.append(("duckdb_1row_select", med(lambda: con.execute("SELECT 1").fetchall())))
        rows.append((
            "duckdb_groupby_1k",
            med(lambda: con.execute("SELECT g%7, count(*) FROM range(1000) t(g) GROUP BY 1").fetchall()),
        ))
    except Exception:  # pragma: no cover - duckdb is in the image, but stay honest
        pass

    for name, t in rows:
        print(f"{name:32s} {t * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
