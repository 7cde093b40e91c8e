"""Unit tests for ops not already covered by oracle queries
(B5/B6 key-set ops, F2 take-first, G union-all, versions_with_validity)."""

from pyspark.sql import functions as F

from dataworks_spark.ops import (
    exclude_keys,
    ns_keys,
    select_keys,
    set_ns,
)
from dataworks_spark.ops.joins import versions_with_validity
from dataworks_spark.ops.setops import union_all
from dataworks_spark.ops.sort import take_first
from dataworks_spark.session import load_table


def test_key_set_projection(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], ["a", "b", "c"])
    assert select_keys(df, ["a", "c"]).columns == ["a", "c"]
    assert exclude_keys(df, ["b"]).columns == ["a", "c"]


def test_ns_keys_and_set_ns(spark):
    """ns-keys / set-ns re-namespacing (utils/common.clj:394-412)."""
    df = spark.createDataFrame([(1, "x")], ["id", "body"])
    assert set_ns(df, "user").columns == ["user/id", "user/body"]
    assert ns_keys(df, "doc", ["body"]).columns == ["id", "doc/body"]


def test_take_first(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    row = take_first(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")]).collect()
    assert len(row) == 1
    assert row[0].o_totalprice == o.agg(F.max("o_totalprice")).first()[0]


def test_union_all_keeps_duplicates(spark):
    a = spark.createDataFrame([(1,)], "x int")
    assert union_all(a, a).count() == 2


def test_versions_with_validity_partitions_timeline(spark, sf_dir):
    """Intervals from a version log tile each key's timeline with no
    overlap: valid_from[i+1] == valid_to[i]."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    v = versions_with_validity(ev, key="user_id", ts="ts")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    gaps = (
        v.withColumn("next_from", F.lead("valid_from").over(w))
        .filter(F.col("valid_to").isNotNull())
        .filter(F.col("valid_to") != F.col("next_from"))
        .count()
    )
    assert gaps == 0


def test_frequent_items_no_false_negatives(spark, sf_dir):
    """D7 heavy hitters: every value whose true frequency exceeds the
    support threshold must appear in the sketch output (the KSP
    guarantee); spot-check against exact counts."""
    from dataworks_spark.ops.aggregates import frequent_items
    from dataworks_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = frequent_items(li, ["l_returnflag"], support=0.2).first()
    sketch = set(out["l_returnflag_freqItems"])
    n = li.count()
    exact = {
        r.l_returnflag
        for r in li.groupBy("l_returnflag").count().filter(F.col("count") > 0.2 * n).collect()
    }
    assert exact <= sketch
