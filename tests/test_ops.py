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


def test_bucketized_interval_join_edges(spark):
    """Half-open boundary semantics, multi-bucket intervals, empty and
    inverted intervals, and the bucket-cap guard."""
    import datetime as dt

    import pytest as _pytest
    from pyspark.sql import functions as F

    from dataworks_spark.ops.joins import bucketized_interval_join

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    pts = spark.createDataFrame(
        [
            (1, t0),                                # == start: matches
            (2, t0 + dt.timedelta(hours=3)),        # inside, 4th bucket
            (3, t0 + dt.timedelta(hours=4)),        # == end: must NOT match
            (4, t0 - dt.timedelta(seconds=1)),      # before
        ],
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (10, t0, t0 + dt.timedelta(hours=4)),   # spans 4 one-hour buckets
            (11, t0, t0),                           # empty: dropped
            (12, t0 + dt.timedelta(hours=1), t0),   # inverted: dropped
        ],
        "window_id long, start timestamp, end timestamp",
    )
    out = bucketized_interval_join(pts, iv, "ts", bucket="1 hour")
    got = sorted((r.event_id, r.window_id) for r in out.collect())
    assert got == [(1, 10), (2, 10)]

    with _pytest.raises(Exception, match="buckets"):
        bucketized_interval_join(
            pts, iv, "ts", bucket="1 hour", max_buckets_per_interval=2
        ).collect()

    # keyed variant: containment alone is not enough — keys must match
    ptsk = pts.withColumn("user_id", F.col("event_id") % 2)
    ivk = iv.withColumn("user_id", F.lit(1))
    outk = bucketized_interval_join(ptsk, ivk, "ts", bucket="1 hour", extra_keys=("user_id",))
    assert sorted((r.event_id, r.window_id) for r in outk.collect()) == [(1, 10)]


def test_bucketized_interval_join_null_end_is_sql_semantics(spark):
    """r9 review follow-through: an open-ended interval (NULL end — a
    version log's 'current' row) matches NOTHING, per SQL comparison
    semantics (ts < NULL is never true). An in-plan assert is
    unreachable — Catalyst prunes rows that cannot satisfy the
    null-intolerant join — so the behavior is pinned here and the
    docstring directs callers to a NEVER sentinel or asof_join. The
    sentinel-closed twin of the same interval DOES match."""
    import datetime as dt

    from dataworks_spark.functions.timeops import NEVER
    from dataworks_spark.ops.joins import bucketized_interval_join

    t = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame([(t,)], "ts timestamp")
    open_iv = spark.createDataFrame(
        [(t - dt.timedelta(hours=1), None)], "start timestamp, end timestamp"
    )
    assert bucketized_interval_join(pts, open_iv, "ts").count() == 0
    closed = spark.createDataFrame(
        [(t - dt.timedelta(hours=1), t + dt.timedelta(hours=1))],
        "start timestamp, end timestamp",
    )
    assert bucketized_interval_join(pts, closed, "ts").count() == 1


def test_except_rows_is_set_difference(spark):
    """r10 review: exceptAll().dropDuplicates() computed MULTISET
    difference then deduped — a=[x,x], b=[x] leaked x into the result.
    G3 is set difference (EXCEPT DISTINCT), consistent with
    union_distinct/intersect_rows."""
    from dataworks_spark.ops.setops import except_rows

    a = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    b = spark.createDataFrame([(1,)], "v int")
    assert [r.v for r in except_rows(a, b).collect()] == [2]


def test_nil_drop_and_distinct_fold_empty_subset(spark):
    """r10 review: the falsy `if subset` coerced [] to None — nil_drop
    flipped from 'check no columns' to 'drop any row with any null',
    distinct_fold to a full-row dedup."""
    import pytest

    from dataworks_spark.ops.aggregates import distinct_fold
    from dataworks_spark.ops.projection import nil_drop

    df = spark.createDataFrame([(1, None), (2, "x")], "a int, b string")
    assert nil_drop(df, []).count() == 2      # empty subset = no-op
    assert nil_drop(df).count() == 1          # None = all columns
    with pytest.raises(ValueError, match="empty subset"):
        distinct_fold(df, [])


def test_versions_with_validity_tiebreak_deterministic(spark):
    """r10 review: same-(key, ts) version rows got shuffle-order
    validity intervals; with a unique tiebreak column the winner is a
    function of the data under any partitioning."""
    import datetime as dt

    from dataworks_spark.ops.joins import versions_with_validity

    t = dt.datetime(2024, 1, 1)
    rows = [(1, t, 10.0, 100), (1, t, 20.0, 101), (1, dt.datetime(2024, 2, 1), 30.0, 102)]
    outs = set()
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "user_id int, ts timestamp, value double, event_id int"
        ).repartition(parts)
        v = versions_with_validity(df, key="user_id", ts="ts", tiebreak=("event_id",))
        # the live row at ts is the max-event_id one; the other is degenerate
        live = [
            r.value
            for r in v.collect()
            if r.valid_from == t and (r.valid_to is None or r.valid_to != t)
        ]
        outs.add(tuple(sorted(live)))
    assert outs == {(20.0,)}
