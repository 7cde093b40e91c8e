"""Skew and co-location tools (SURVEY §7.1 step 8; brief: "salting for
skew", "bucketing for co-located joins").

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; :func:`salted_join` is the explicit fallback for the cases AQE
can't fix — e.g. a single hot key in a shuffled-hash join, or a
broadcast-too-big dimension with a power-law key. Bucketing removes the
shuffle entirely for stable join keys (facts bucketed by the key they
are always joined on — the 100 TB play for recurring joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is power-law:
    spread each hot key over ``n_salts`` shuffle partitions.

    skewed side: salt = pmod(xxhash64(whole row), n) — deterministic,
    uniform, no rand() (reproducible across retries, which matters for
    exactly-once sinks). other side: replicated n_salts times with each
    salt value. Shuffle then distributes each hot key across n_salts
    reducers instead of one."""
    allowed = (
        "inner", "left", "leftouter", "left_outer",
        "left_semi", "leftsemi", "left_anti", "leftanti",
    )
    if how not in allowed:
        # the right side is REPLICATED once per salt below, so any join
        # type that null-extends or emits unmatched right rows (right/
        # full outer) would produce n_salts copies of each unmatched
        # right row — a silent wrong answer, rejected loudly instead
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the replicated right side would emit n_salts copies of every "
            "unmatched right-side row under right/full outer semantics"
        )
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_r = other.select("*", salts)
    out = salted_l.join(salted_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, sort_by: str | None = None
) -> None:
    """Persist hash-bucketed by the recurring join key: later equi-joins
    between tables bucketed the same way run WITHOUT a shuffle exchange
    (verified by plan assertion in tests). At 100 TB this converts the
    every-query fact⋈fact shuffle into a one-time write cost."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join_plan_has_no_exchange(spark: SparkSession, left: str, right: str, key: str) -> bool:
    """Plan check: join of two same-bucketed tables needs no Exchange."""
    df = spark.table(left).join(spark.table(right), on=key)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
