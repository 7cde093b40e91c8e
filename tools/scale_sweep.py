"""BASELINE §5c crossover sweep: run a handful of real-compute queries
at an arbitrary sf dir (e.g. the gen_scale.py-produced sf0.5 proxy) on
both engines and print per-query steady seconds + the same-run ratio.

Usage:
    python tools/gen_scale.py --mult 5 --out /root/repo/.localdata/sf0.5
    python tools/scale_sweep.py /root/repo/.localdata/sf0.5 [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

DEFAULT_QUERIES = [
    "q_dedup_ngram",
    "q_tpch_q5",
    "q_datalog_rule",
    "q_text_stats",
    "q_join_enrich",
    "q_prepare_corpus",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf0.5"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from oracle_harness import duckdb_conn

    from dataworks_spark.queries import ORACLE_SQL, QUERIES, _t
    from dataworks_spark.session import TABLES, get_spark

    spark = get_spark("scale_sweep")
    for t in TABLES:
        try:
            _t(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001 — missing optional table
            pass

    spark_s: dict[str, float] = {}
    for name in names:
        for _ in range(2):  # steady = second pass, same as bench.py
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            spark_s[name] = round(time.perf_counter() - t0, 4)

    con = duckdb_conn(sf_dir)
    duck_s: dict[str, float] = {}
    for name in names:
        if name not in ORACLE_SQL:
            continue
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(ORACLE_SQL[name]).fetchall()
            duck_s[name] = round(time.perf_counter() - t0, 4)

    out = {
        "sf_dir": sf_dir,
        "spark_steady": spark_s,
        "duckdb": duck_s,
        "ratio": {
            q: round(spark_s[q] / duck_s[q], 3) for q in duck_s if duck_s[q] > 0
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
