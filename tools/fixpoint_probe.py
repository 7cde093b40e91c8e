"""Micro-probe: per-round cost of the closure fixpoint under different
configs (AQE on/off, shuffle partitions). Throwaway diagnostics."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("probe")
p = load_table(spark, SF_DIR, "part")
edges_df = p.filter((F.col("p_partkey") >= 2) & (F.col("p_partkey") <= 2000)).select(
    F.col("p_partkey").alias("src"), F.expr("p_partkey DIV 2").alias("dst")
).cache()
edges_df.count()


def run(tag):
    t_all = time.perf_counter()
    base = edges_df.select("src", "dst").dropDuplicates()
    seed = base.unionByName(
        base.withColumnRenamed("dst", "__mid")
        .join(base.withColumnRenamed("src", "__mid"), on="__mid")
        .select("src", "dst")
    )
    t0 = time.perf_counter()
    closure = seed.dropDuplicates().localCheckpoint(eager=False)
    prev = closure.count()
    print(f"  seed: {time.perf_counter()-t0:.3f}s n={prev}")
    for i in range(50):
        t0 = time.perf_counter()
        left = closure.withColumnRenamed("dst", "__mid")
        right = closure.withColumnRenamed("src", "__mid")
        grown = left.join(right, on="__mid").select("src", "dst")
        closure = closure.unionByName(grown).dropDuplicates().localCheckpoint(eager=False)
        cur = closure.count()
        print(f"  round {i}: {time.perf_counter()-t0:.3f}s n={cur}")
        if cur == prev:
            break
        prev = cur
    print(f"{tag}: total {time.perf_counter()-t_all:.3f}s")


for sp in ("32", "4"):
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        print(f"== aqe={aqe} shuffle.partitions={sp}")
        run(f"aqe={aqe} sp={sp}")
spark.stop()
