"""Quick per-query timing loop for iterating on bench hot spots.

Usage: python tools/timeq.py q_datalog_rule q_dedup_clusters [--passes 3]
Runs each named query against $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints cold + steady seconds, mirroring bench.py's measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataworks_spark.queries import QUERIES, _t  # noqa: E402
from dataworks_spark.session import TABLES, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
    spark = get_spark("timeq")
    for t in TABLES:
        _t(spark, SF_DIR, t).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()
    for name in names or sorted(QUERIES):
        times = []
        for _ in range(passes):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, SF_DIR).count()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: rows={n} cold={times[0]} steady={times[-1]} all={times}")
    spark.stop()


if __name__ == "__main__":
    main()
