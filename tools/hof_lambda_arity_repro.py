"""Minimal repro of the PySpark HOF lambda-arity footgun that silently
degenerated this repo's MinHash signatures (fixed in llm/dedup.py
`minhash_from_hashes`; guard tests in tests/test_llm.py).

The classic Python idiom for capturing a loop variable in a lambda —
a DEFAULT ARGUMENT (``lambda h, i=i: ...``) — changes the lambda's
parameter count to 2, and PySpark binds a two-parameter array-HOF
lambda as ``(element, array_index)``. The body's ``i`` then names the
index COLUMN (``F.lit`` of a Column passes through unchanged), not the
captured Python int, so every sibling expression computes the same
index-keyed value. Nothing fails; the values are just wrong.

Run: python tools/hof_lambda_arity_repro.py
Expected output:
    default-arg capture : [a, a, a]   identical=True   <- the footgun
    closure capture     : [a, b, c]   identical=False  <- correct
    index-shadow check  : True  (footgun value == xxhash64(idx, h) minimum)
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = spark.range(1).select(
        F.array(F.lit(5).cast("long"), F.lit(9).cast("long")).alias("hs")
    )

    bad = [
        F.array_min(F.transform("hs", lambda h, i=i: F.xxhash64(F.lit(i), h))).alias(f"b{i}")
        for i in range(3)
    ]

    def mk(i):  # capture via closure -> the lambda stays single-parameter
        return F.array_min(F.transform("hs", lambda h: F.xxhash64(F.lit(i), h)))

    good = [mk(i).alias(f"g{i}") for i in range(3)]
    shadow = F.array_min(F.transform("hs", lambda h, idx: F.xxhash64(idx, h))).alias("shadow")

    row = df.select(*bad, *good, shadow).collect()[0]
    b = [row[f"b{i}"] for i in range(3)]
    g = [row[f"g{i}"] for i in range(3)]
    print("default-arg capture :", b, " identical=", len(set(b)) == 1)
    print("closure capture     :", g, " identical=", len(set(g)) == 1)
    print("index-shadow check  :", b[0] == row["shadow"])
    assert len(set(b)) == 1 and len(set(g)) == 3 and b[0] == row["shadow"]


if __name__ == "__main__":
    main()
