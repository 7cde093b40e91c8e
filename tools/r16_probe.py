"""Round-16 probes (r15 VERDICT #7/#8).

Two decompositions, printed as JSON lines:

1. q_datalog_rule: per pass, split (a) builder call — datalog compile +
   fixpoint plan construction, zero jobs on the bound-proven path —
   (b) driver-side Catalyst work (analysis + optimization + physical
   planning, forced via queryExecution().executedPlan() without running
   a job) and (c) the one materializing count(). If (a)+(b) dominates
   (the q_dedup_clusters finding), the plan-size treatment applies; if
   (c) does, the job is the cost and the refutation is recorded.

2. q_embed_ann: with the fingerprint-keyed indexes warm (exactly the
   bench steady state), per-stage count() of the three probe branches
   and the full union — attributes the steady number to index probe vs
   union vs rank.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r16_probe.py [datalog|ann]
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
PASSES = int(os.environ.get("R16_PROBE_PASSES", "5"))


def _warm(spark) -> None:
    for t in TABLES:
        Q._t(spark, SF_DIR, t).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()


def probe_datalog(spark) -> None:
    fn = Q.QUERIES["q_datalog_rule"]
    for i in range(PASSES):
        spark.sparkContext.setJobDescription(f"r16_probe datalog pass {i}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        # forces analysis + optimization + physical planning + codegen
        # prep driver-side; no job runs (executedPlan is lazy-val'd, so
        # the later count() does not re-pay this)
        df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = df.count()
        t_count = time.perf_counter() - t0
        print(json.dumps({
            "q": "q_datalog_rule", "pass": i, "rows": n,
            "build_sec": round(t_build, 4),
            "catalyst_sec": round(t_plan, 4),
            "count_sec": round(t_count, 4),
        }), flush=True)
        spark.sparkContext.setJobDescription(None)


def probe_ann(spark) -> None:
    from pyspark.sql import functions as F

    from dataworks_spark.llm.similarity import knn_join_lsh

    # warm the memoized indexes exactly as bench's cold pass does
    Q.QUERIES["q_embed_ann"](spark, SF_DIR).count()
    e = Q._t(spark, SF_DIR, "embeddings")
    qvec = Q._query_vec(spark, SF_DIR)
    def _cached(kind):
        def _missing():
            raise RuntimeError(f"{kind} index not in memo — warm pass failed")
        return Q._ann_cached(spark, SF_DIR, kind, _missing)

    lsh, ivf, knn_idx = _cached("lsh"), _cached("ivf"), _cached("knn_lsh")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    for i in range(PASSES):
        out: dict = {"q": "q_embed_ann", "pass": i}
        spark.sparkContext.setJobDescription(f"r16_probe ann lsh_topk pass {i}")
        t0 = time.perf_counter()
        lsh.topk(qvec, k=10, id_cols=["vec_id"]).count()
        out["lsh_topk_sec"] = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobDescription(f"r16_probe ann ivf_topk pass {i}")
        t0 = time.perf_counter()
        ivf.topk(qvec, k=10, n_probe=2, id_cols=["vec_id"]).count()
        out["ivf_topk_sec"] = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobDescription(f"r16_probe ann knn_join pass {i}")
        t0 = time.perf_counter()
        knn_join_lsh(knn_idx, queries, "vec_id", k=3, n_probe=2).count()
        out["knn_join_sec"] = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobDescription(f"r16_probe ann full_union pass {i}")
        t0 = time.perf_counter()
        Q.QUERIES["q_embed_ann"](spark, SF_DIR).count()
        out["full_union_sec"] = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(out), flush=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_spark("dataworks_r16_probe")
    _warm(spark)
    if which in ("datalog", "both"):
        probe_datalog(spark)
    if which in ("ann", "both"):
        probe_ann(spark)


if __name__ == "__main__":
    main()
