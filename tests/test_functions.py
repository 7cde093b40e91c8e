"""Scalar function library tests (SURVEY §2 H): consume_time cases,
case conversion, EDN decode, array math."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataworks_spark.functions.arrays import cosine_similarity, dot
from dataworks_spark.functions.edn import edn_to_json_udf, parse_edn
from dataworks_spark.functions.strings import (
    camel_case_keys,
    kebab_case_keys,
    snake_case_keys,
    to_camel,
    to_kebab,
    to_snake,
)
from dataworks_spark.functions.timeops import NEVER, consume_time, millis_between


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_consume_time_instant(spark):
    t = dt.datetime(2024, 5, 1, 12, 30)
    assert _one(spark, consume_time(t)) == t


def test_consume_time_date_promotes_to_midnight(spark):
    # time.clj:61-64 date → midnight instant
    assert _one(spark, consume_time(dt.date(2024, 5, 1))) == dt.datetime(2024, 5, 1)


def test_consume_time_never_sentinel(spark):
    assert _one(spark, consume_time(":never")) == NEVER


def test_consume_time_duration_and_millis_offset(spark):
    # duration → now + d (time.clj:66-68); int millis offset (time.clj:74)
    now = _one(spark, F.current_timestamp())
    plus = _one(spark, consume_time(dt.timedelta(hours=2)))
    assert dt.timedelta(hours=1, minutes=55) < (plus - now) < dt.timedelta(hours=2, minutes=5)
    plus_ms = _one(spark, consume_time(5000))
    assert dt.timedelta(seconds=2) < (plus_ms - now) < dt.timedelta(seconds=8)


def test_consume_time_unit_keyword(spark):
    # :days → tomorrow at midnight (time.clj:76-86)
    got = _one(spark, consume_time(":days"))
    assert got.time() == dt.time(0, 0) and got.date() > dt.date.today() - dt.timedelta(days=1)


def test_consume_time_string_parse(spark):
    assert _one(spark, consume_time("2024-01-02 03:04:05")) == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_millis_between(spark):
    a = consume_time(dt.datetime(2024, 1, 1))
    b = consume_time(dt.datetime(2024, 1, 1, 0, 0, 1))
    assert _one(spark, millis_between(a, b)) == 1000


def test_case_conversions():
    # camel-snake-kebab surface (streams.clj:3-4 imports)
    assert to_snake("helloWorldFoo") == "hello_world_foo"
    assert to_kebab("hello_world_foo") == "hello-world-foo"
    assert to_camel("hello-world-foo") == "helloWorldFoo"


def test_case_conversion_on_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["userId", "eventCount"])
    assert snake_case_keys(df).columns == ["user_id", "event_count"]
    assert kebab_case_keys(df).columns == ["user-id", "event-count"]
    assert camel_case_keys(snake_case_keys(df)).columns == ["userId", "eventCount"]


def test_parse_edn_values():
    assert parse_edn('{:a 1 :b "x" :c [1 2 3] :d nil :e true}') == {
        ":a": 1,
        ":b": "x",
        ":c": [1, 2, 3],
        ":d": None,
        ":e": True,
    }
    assert parse_edn("#{3 1 2}") == [1, 2, 3]
    assert parse_edn("(:a :b)") == [":a", ":b"]
    assert parse_edn("1.5e3") == 1500.0
    with pytest.raises(ValueError):
        parse_edn('"unterminated')


def test_edn_time_tagged_literals():
    """Time-literal tagged readers (utils/common.clj:112-118): the safe
    reader converts the java.time tag family to real time values,
    passes unknown tags through, and never evaluates code."""
    import datetime as dt

    utc = dt.timezone.utc
    assert parse_edn('#inst "2024-01-01T00:00:00Z"') == dt.datetime(2024, 1, 1, tzinfo=utc)
    assert parse_edn('#time/instant "2024-01-01T12:30:00Z"') == dt.datetime(
        2024, 1, 1, 12, 30, tzinfo=utc
    )
    assert parse_edn('#time/date "2024-02-29"') == dt.date(2024, 2, 29)
    assert parse_edn('#time/time "13:45:30"') == dt.time(13, 45, 30)
    assert parse_edn('#time/duration "PT30S"') == "PT30S"  # ISO string kept
    assert parse_edn('#unknown/tag "zzz"') == "zzz"  # passthrough
    assert parse_edn('#inst "not-a-date"') == "not-a-date"  # malformed → raw
    assert parse_edn('{:at #inst "2024-01-01T00:00:00Z" :n 1}') == {
        ":at": dt.datetime(2024, 1, 1, tzinfo=utc),
        ":n": 1,
    }


def test_edn_udf_on_column(spark):
    df = spark.createDataFrame(
        [('{:k 87 :tags [:a :b]}',), (None,), ("{bad",)], "props string"
    )
    out = [r.j for r in df.select(edn_to_json_udf()(F.col("props")).alias("j")).collect()]
    assert out[0] == '{":k": 87, ":tags": [":a", ":b"]}'
    assert out[1] is None and out[2] == "{}" or out[2] is None


def test_array_math(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>")
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine_similarity(F.col("a"), F.col("a")).alias("c"),
    ).first()
    assert row.d == 11.0 and abs(row.c - 1.0) < 1e-12


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    """functions/bloom.py: every inserted value tests positive (the
    Bloom guarantee), and the measured false-positive rate on a
    disjoint probe set stays within ~4x of the requested fpp."""
    from dataworks_spark.functions.bloom import bloom_build

    from pyspark.sql import functions as F

    members = spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("v"))
    bloom = bloom_build(members, F.col("v"), n_items=2000, fpp=0.01)
    hits = members.filter(bloom.might_contain(F.col("v"))).count()
    assert hits == 2000, "false negative: Bloom must contain every member"
    # probes disjoint from members (members are 3 mod 7)
    probes = spark.range(0, 20000).select((F.col("id") * 7 + 5).alias("v"))
    fp = probes.filter(bloom.might_contain(F.col("v"))).count()
    assert fp / 20000 <= 0.04, f"fpp too high: {fp}/20000"


def test_bloom_probe_is_lambda_safe(spark):
    """might_contain composes inside higher-order-function lambdas
    (the decontaminate scan-projection use)."""
    from dataworks_spark.functions.bloom import bloom_build

    from pyspark.sql import functions as F

    members = spark.range(0, 100).select(F.col("id").alias("v"))
    bloom = bloom_build(members, F.col("v"), n_items=100, fpp=0.01)
    df = spark.createDataFrame(
        [([1, 2, 3],), ([100000, 200000],)], "xs array<bigint>"
    )
    got = [
        r.hit
        for r in df.select(
            F.exists(F.col("xs"), bloom.might_contain).alias("hit")
        ).collect()
    ]
    assert got[0] is True and got[1] in (False, True)  # fp possible, fn not


def test_edn_unterminated_and_discard():
    """r10 review: unterminated collections raised IndexError instead
    of the parser's ValueError contract; the #_ discard macro kept the
    discarded form as a phantom element."""
    import pytest

    from dataworks_spark.functions.edn import parse_edn

    for bad in ("[1 2", "{:a 1", "#{1 2", "(1"):
        with pytest.raises(ValueError):
            parse_edn(bad)
    assert parse_edn("[1 #_ 2 3]") == [1, 3]
    assert parse_edn("{:a 1 #_ :b #_ 2}") == {":a": 1}
    assert parse_edn("#{1 #_ 2 3}") == [1, 3]
    assert parse_edn("#_ 1 2") == 2
    assert parse_edn("[#_2 5]") == [5]  # form glued to the marker
    with pytest.raises(ValueError, match="odd number"):
        parse_edn("{:a 1 :b}")


def test_deterministic_uuid_null_propagates(spark):
    """r10 review: a NULL name produced "" (concat_ws skips NULLs), so
    every NULL-name row aliased onto one non-UUID id."""
    from dataworks_spark.functions.ids import deterministic_uuid

    df = spark.createDataFrame([("x",), (None,)], "name string")
    got = {r.name: r.u for r in df.select(
        "name", deterministic_uuid("ns:", F.col("name")).alias("u")
    ).collect()}
    assert got[None] is None
    assert got["x"] and len(got["x"]) == 36


def test_retain_malloc_arena_once_and_opt_out(monkeypatch):
    """r15 session 5: the arena-retention tuner must apply AT MOST once
    per process, and SPARK_GRAFT_MALLOC_RETAIN=0 must skip the libc
    call entirely (the deployment kill switch). The mallopt effect
    itself is host-dependent; what this pins is the control flow every
    Arrow kernel now runs through."""
    import ctypes

    import dataworks_spark.functions.blasctl as B

    calls = []

    class FakeLibc:
        def mallopt(self, *a):
            calls.append(a)
            return 1

    monkeypatch.setattr(ctypes, "CDLL", lambda *a, **k: FakeLibc())
    # opt-out path: no libc call, but the once-guard still latches
    monkeypatch.setattr(B, "_arena_applied", False)
    monkeypatch.setenv("SPARK_GRAFT_MALLOC_RETAIN", "0")
    B.retain_malloc_arena()
    assert calls == []
    # applied path: exactly two mallopt calls (mmap + trim thresholds),
    # and a second invocation is a no-op
    monkeypatch.setattr(B, "_arena_applied", False)
    monkeypatch.delenv("SPARK_GRAFT_MALLOC_RETAIN", raising=False)
    B.retain_malloc_arena()
    B.retain_malloc_arena()
    assert len(calls) == 2
    assert {c[0] for c in calls} == {-3, -1}
