"""Cold-pass decomposition probe (r16, VERDICT #2/#8): run the heavy
queries' COLD path exactly as bench round 0 does — fresh process, warm
fixture caches — but time each phase separately: DataFrame construction
(plan build + any driver jobs the builder runs, including the
fingerprint-keyed asset builds) vs the first count().

Per-query asset attribution comes from queries.ASSET_BUILD_SECONDS
deltas around each builder call. Usage:

    SPARK_GRAFT_SF_DIR=... python tools/cold_probe.py [query ...]

Default query set = the cold-dominant ones from BENCH records.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataworks_spark import queries as Q  # noqa: E402
from dataworks_spark.session import TABLES, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY = [
    "q_contamination_report",
    "q_embed_ann",
    "q_dedup_sketch",
    "q_semantic_dedup",
    "q_dedup_clusters",
    "q_edit_distance_join",
    "q_dedup_ngram",
    "q_multimodal",
    "q_datalog_rule",
]


def main() -> None:
    names = sys.argv[1:] or HEAVY
    spark = get_spark("dataworks_cold_probe")
    t0 = time.perf_counter()
    for t in TABLES:
        Q._t(spark, SF_DIR, t).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()
    warm = round(time.perf_counter() - t0, 3)
    out: dict = {"sf_dir": SF_DIR, "warmup_sec": warm, "queries": {}}
    for name in names:
        fn = Q.QUERIES[name]
        before = dict(Q.ASSET_BUILD_SECONDS)
        spark.sparkContext.setJobDescription(f"cold_probe build {name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(f"cold_probe count {name}")
        t0 = time.perf_counter()
        n = df.count()
        t_count = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        assets = {
            k: round(v - before.get(k, 0.0), 3)
            for k, v in Q.ASSET_BUILD_SECONDS.items()
            if v != before.get(k, 0.0)
        }
        out["queries"][name] = {
            "build_sec": t_build,
            "first_count_sec": t_count,
            "rows": n,
            "assets": assets,
        }
        print(json.dumps({name: out["queries"][name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
