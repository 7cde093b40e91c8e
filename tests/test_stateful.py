"""Stateful streaming operator tests (SURVEY §2 I11): state persists
across micro-batches via the state store."""

from pyspark.sql import functions as F

from dataworks_spark.session import load_table
from dataworks_spark.streaming.stateful import latest_state, seen_filter


def _run_batches(spark, events, tmp_path, build, out_name):
    """Drive a stateful op with two micro-batches from a file source."""
    src = tmp_path / "src"
    events.filter(F.col("event_id") < 500).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        build(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(out_name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    events.filter(F.col("event_id") >= 500).write.mode("append").parquet(str(src))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {out_name}")


def test_latest_state_lww_across_batches(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = _run_batches(
        spark,
        events,
        tmp_path,
        lambda s: latest_state(s, "user_id", "ts", "value"),
        "lww_out",
    )
    # last update emitted per user must equal the batch LWW answer
    from dataworks_spark.ops import latest_per_key

    expect = {
        r.user_id: (r.ts, r.value)
        for r in latest_per_key(
            events, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).collect()
    }
    rows = out.collect()
    # take each user's chronologically-latest emitted state
    got = {}
    for r in rows:
        if r.user_id not in got or r.ts >= got[r.user_id][0]:
            got[r.user_id] = (r.ts, r.value)
    assert set(got) == set(expect)
    for u in expect:
        assert got[u][0] == expect[u][0] and abs(got[u][1] - expect[u][1]) < 1e-9


def test_seen_filter_cross_batch_dedup(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = _run_batches(
        spark,
        events,
        tmp_path,
        lambda s: seen_filter(s, "user_id"),
        "seen_out",
    )
    rows = out.collect()
    users = [r.user_id for r in rows]
    # every user emitted exactly once across both batches
    assert len(users) == len(set(users))
    assert set(users) == {r.user_id for r in events.select("user_id").distinct().collect()}
