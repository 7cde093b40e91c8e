"""Kafka source/sink builders (SURVEY §2 A1-A3, I6, I8).

The reference consumes topics with group.id ``dataworks/<name>`` (work
partitioning across nodes, utils/kafka.clj:81), offset=latest,
at-least-once auto-commit (utils/kafka.clj:84-85,106-110), and produces
EDN/JSON-serialized messages (utils/kafka.clj:140-149). Spark's Kafka
source checkpoint gives exactly-once within the pipeline — a strict
upgrade (SURVEY I6) — and Kafka partitions map to Spark tasks (I8).

The test container has no Kafka broker or spark-sql-kafka jar, so these
builders are exercised for their *plans/options* in unit tests and the
full path is gated behind broker availability. The record schema the
reference uses ({key value timestamp topic}, utils/kafka.clj:93-100) is
near-isomorphic to Spark's fixed Kafka schema.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_source_options(
    topic: str,
    brokers: str,
    group_prefix: str = "dataworks",
    starting_offsets: str = "latest",
    fixed_group_id: bool = True,
) -> dict[str, str]:
    """Reference consumer-instance config (utils/kafka.clj:72-91):
    group.id dataworks/<name>, offset latest on (re)subscribe.

    ``fixed_group_id=True`` mirrors the reference exactly and matches
    brokers with group-name ACLs — but a FIXED kafka.group.id is shared
    by every query on the topic, and Spark's Kafka source docs warn two
    concurrent queries (or a restart racing its not-yet-expired old
    consumer) then interfere through broker-side group rebalancing (r10
    review). Pass ``fixed_group_id=False`` for the Spark-default-safe
    form: ``groupIdPrefix`` only, a UNIQUE group per query under the
    reference's prefix — the right setting when multiple queries or
    blue/green restarts read one topic."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if fixed_group_id:
        opts["kafka.group.id"] = f"{group_prefix}/{topic}"
    else:
        opts["groupIdPrefix"] = f"{group_prefix}-{topic}"
    return opts


def project_kafka_records(raw: DataFrame, value_schema: StructType | None = None) -> DataFrame:
    """Kafka's fixed wire schema (key/value binary, topic, partition,
    offset, timestamp, timestampType) → the reference's message shape
    {key value timestamp topic} (consume-record, utils/kafka.clj:93-100).
    JSON values decode via from_json when a schema is given. Shared by
    the streaming reader and the broker-less contract tests — the
    projection under test IS the projection shipped."""
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("timestamp"),
        F.col("topic").alias("topic"),
    )
    if value_schema is not None:
        out = out.withColumn("value", F.from_json("value", value_schema))
    return out


def read_kafka_stream(
    spark: SparkSession,
    topic: str,
    brokers: str,
    value_schema: StructType | None = None,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka topic → streaming DataFrame in the reference's message
    shape. maxOffsetsPerTrigger is the backpressure analog of the
    reference's channel buffers (I2) — bounded, but lossless."""
    opts = kafka_source_options(topic, brokers)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return project_kafka_records(reader.load(), value_schema)


def kafka_sink_payload(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Rows → Kafka producer records: all non-key columns serialized as
    one JSON value (the reference's JSON wire format,
    utils/kafka.clj:121-128), key cast to string. Shared by the
    streaming writer and the broker-less contract tests."""
    value_cols = [c for c in df.columns if c != key_col]
    return df.select(
        *([F.col(key_col).cast("string").alias("key")] if key_col else []),
        F.to_json(F.struct(*value_cols)).alias("value"),
    )


def write_kafka_stream(
    df: DataFrame, topic: str, brokers: str, checkpoint: str, key_col: str | None = None
):
    """Streaming sink → Kafka topic (produce! go-loop analog,
    utils/stream.clj:80-85)."""
    return (
        kafka_sink_payload(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def topic_admin_config(partitions: int = 6, replication: int = 3) -> dict:
    """Topic auto-create defaults (A3, utils/kafka.clj:58-70): 6
    partitions / RF 3 in prod, 1/1 embedded. Control-plane concern —
    returned as config for an external AdminClient."""
    return {"num.partitions": partitions, "replication.factor": replication}


def topics_to_create(admin, required: dict) -> dict:
    """The subset of ``required`` topics absent from the cluster
    (utils/kafka.clj:31-42 topics-to-create): ``admin`` is any object
    with ``list_topics() -> iterable[str]`` — the injectable seam that
    stands in for Kafka's AdminClient (the sandbox has no broker;
    confluent-kafka's AdminClient satisfies the duck type via a thin
    adapter)."""
    existing = set(admin.list_topics())
    return {t: cfg for t, cfg in required.items() if t not in existing}


def create_missing_topics(
    admin, required, partitions: int = 6, replication: int = 3
) -> list:
    """Idempotent topic auto-create (A3, utils/kafka.clj:26-50
    create-topics): list existing topics once, create only the missing
    ones via ``admin.create_topics([(name, partitions, replication),
    …])``. ``required`` is either a list of names (defaults applied —
    the reference's default-topic-settings 6/3) or a dict
    ``{name: {"partitions": n, "replication": r}}`` mirroring the
    reference's per-topic NewTopic settings. Returns the sorted list of
    names actually created."""
    if not isinstance(required, dict):
        required = {t: {} for t in required}
    todo = topics_to_create(admin, required)
    if todo:
        try:
            admin.create_topics(
                [
                    (
                        t,
                        (cfg or {}).get("partitions", partitions),
                        (cfg or {}).get("replication", replication),
                    )
                    for t, cfg in sorted(todo.items())
                ]
            )
        except Exception:
            # list-then-create races with a concurrently booting driver
            # (both see the topic missing, one create loses with
            # TopicExists) — idempotence means the loser verifies the
            # topics exist NOW and proceeds; anything still missing is
            # a real failure worth the original error
            if topics_to_create(admin, {t: required[t] for t in todo}):
                raise
    return sorted(todo)


def encode_json_value(record: dict) -> str:
    """Driver-side JSON encoder matching the reference's cheshire
    serializer with time encoders (utils/time.clj:8-9)."""
    return json.dumps(record, default=str, separators=(",", ":"))
