"""Thin adapters binding real Kafka client libraries to this repo's
injected duck types (SURVEY §2 A3/I7).

The engine's Kafka control-plane surfaces take INJECTED clients:

- :func:`dataworks_spark.streaming.kafka.create_missing_topics` wants
  an admin with ``list_topics() -> iterable[str]`` and
  ``create_topics([(name, partitions, replication), ...])``;
- :class:`dataworks_spark.streaming.control.KafkaControlBus` wants a
  producer with ``send(topic, value: bytes) -> offset`` + ``flush()``
  and a ``consumer_factory(topic) -> iterable`` of records with
  ``.offset``/``.value``, reading from the beginning under a fresh
  group (the broadcast trick).

This module provides those bindings for the two common Python client
libraries — ``confluent-kafka`` (librdkafka) and ``kafka-python`` —
each gated behind an import-try since the test container ships
neither. The adapter LOGIC (offset capture through the delivery
callback, fresh-UUID consumer groups, earliest reset, method→attribute
record wrapping, NewTopic argument mapping) is what the unit tests
pin, against fake client modules; the library calls themselves are the
thin part.

Reference parity: utils/kafka.clj:26-50 (create-topics via AdminClient),
utils/kafka.clj:108-118 (consumer loop), app_graph.clj:21-51 (the
random-group broadcast consume of the control topic).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass


def _require(module: str, dist: str):
    try:
        return __import__(module)
    except ImportError as exc:  # pragma: no cover - exercised via fakes
        raise RuntimeError(
            f"{dist} is not installed; `pip install {dist}` on a "
            "broker-enabled deployment (the test container has no broker)"
        ) from exc


@dataclass(frozen=True)
class Record:
    """The duck-typed record KafkaControlBus.read_from consumes —
    confluent's Message exposes offset()/value() as METHODS, so its
    consumer factory re-shapes each message into this attribute form
    (kafka-python records already match and pass through)."""

    offset: int
    value: bytes


# ── confluent-kafka (librdkafka) ─────────────────────────────────────


class ConfluentAdmin:
    """AdminClient → the ``list_topics``/``create_topics`` seam."""

    def __init__(self, conf: dict, timeout: float = 10.0):
        ck = _require("confluent_kafka.admin", "confluent-kafka")
        self._admin = ck.admin.AdminClient(conf)
        self._new_topic = ck.admin.NewTopic
        self.timeout = timeout

    def list_topics(self):
        md = self._admin.list_topics(timeout=self.timeout)
        return list(md.topics.keys())

    def create_topics(self, specs):
        futures = self._admin.create_topics(
            [
                self._new_topic(name, num_partitions=parts, replication_factor=repl)
                for name, parts, repl in specs
            ]
        )
        for fut in futures.values():
            fut.result(self.timeout)  # surface per-topic failures


class ConfluentProducer:
    """Producer → ``send(topic, value) -> offset`` + ``flush()``. The
    offset travels back through librdkafka's delivery callback, so
    ``send`` flushes synchronously — correct for a CONTROL bus (one
    small message per function deploy), wrong for a data plane (which
    goes through Spark's Kafka sink, not this)."""

    def __init__(self, conf: dict, timeout: float = 10.0):
        ck = _require("confluent_kafka", "confluent-kafka")
        self._producer = ck.Producer(conf)
        self.timeout = timeout

    def send(self, topic: str, value: bytes) -> int:
        holder: dict = {}

        def _on_delivery(err, msg):
            holder["err"], holder["offset"] = err, msg.offset() if err is None else None

        self._producer.produce(topic, value=value, on_delivery=_on_delivery)
        self._producer.flush(self.timeout)
        if holder.get("err") is not None:
            raise RuntimeError(f"control publish failed: {holder['err']}")
        if "offset" not in holder:
            # flush returned without the delivery callback firing (broker
            # unreachable/slow) — the message is NOT confirmed; returning
            # would let the engine believe the broadcast landed while
            # other drivers never see it
            raise RuntimeError(
                f"control publish to {topic!r} not delivered within "
                f"{self.timeout}s (flush timed out before the delivery report)"
            )
        return holder["offset"]

    def flush(self) -> None:
        self._producer.flush(self.timeout)


def confluent_consumer_factory(conf: dict, poll_timeout: float = 1.0, idle_polls: int = 3):
    """``(topic) -> iterable[Record]`` reading the topic from the
    beginning under a fresh UUID group (broadcast semantics — never a
    shared group offset). Drains until ``idle_polls`` consecutive empty
    polls (a single-partition control topic has no EOF marker without
    enable.partition.eof)."""
    ck = _require("confluent_kafka", "confluent-kafka")

    def factory(topic: str):
        consumer = ck.Consumer(
            {
                **conf,
                "group.id": f"dataworks-read-{uuid.uuid4()}",
                "auto.offset.reset": "earliest",
                "enable.auto.commit": False,
            }
        )
        consumer.subscribe([topic])
        try:
            idle = 0
            while idle < idle_polls:
                msg = consumer.poll(poll_timeout)
                if msg is None:
                    idle += 1
                    continue
                err = msg.error()
                if err is not None and err is not False:
                    # partition EOF is the benign end-of-data signal;
                    # everything else (authz failure, unknown topic,
                    # broker down) must RAISE — treating it as idle
                    # would make a hard failure look like an empty
                    # control log and the listener would silently
                    # apply nothing
                    code = err.code() if callable(getattr(err, "code", None)) else None
                    eof = getattr(getattr(ck, "KafkaError", None), "_PARTITION_EOF", -191)
                    if code == eof:
                        idle += 1
                        continue
                    raise RuntimeError(f"control read from {topic!r} failed: {err}")
                idle = 0
                yield Record(offset=msg.offset(), value=msg.value())
        finally:
            consumer.close()

    return factory


# ── kafka-python ─────────────────────────────────────────────────────


class KafkaPythonAdmin:
    """KafkaAdminClient → the ``list_topics``/``create_topics`` seam."""

    def __init__(self, client=None, **conf):
        ka = _require("kafka.admin", "kafka-python")
        self._admin = client or ka.admin.KafkaAdminClient(**conf)
        self._new_topic = ka.admin.NewTopic

    def list_topics(self):
        return list(self._admin.list_topics())

    def create_topics(self, specs):
        self._admin.create_topics(
            new_topics=[
                self._new_topic(name=n, num_partitions=p, replication_factor=r)
                for n, p, r in specs
            ]
        )


class KafkaPythonProducer:
    """KafkaProducer → ``send(topic, value) -> offset`` + ``flush()``
    (RecordMetadata carries the offset)."""

    def __init__(self, producer=None, timeout: float = 10.0, **conf):
        if producer is None:
            ka = _require("kafka", "kafka-python")
            producer = ka.KafkaProducer(**conf)
        self._producer = producer
        self.timeout = timeout

    def send(self, topic: str, value: bytes) -> int:
        md = self._producer.send(topic, value=value).get(timeout=self.timeout)
        return md.offset

    def flush(self) -> None:
        self._producer.flush()


def kafka_python_consumer_factory(conf: dict | None = None, drain_ms: int = 2000):
    """``(topic) -> iterable`` of records (kafka-python's records
    already expose ``.offset``/``.value`` attributes). Fresh UUID
    group + earliest reset per read; ``consumer_timeout_ms`` bounds
    the drain so a quiet topic terminates the iteration."""

    def factory(topic: str):
        ka = _require("kafka", "kafka-python")
        consumer = ka.KafkaConsumer(
            topic,
            group_id=f"dataworks-read-{uuid.uuid4()}",
            auto_offset_reset="earliest",
            enable_auto_commit=False,
            consumer_timeout_ms=drain_ms,
            **(conf or {}),
        )
        try:
            yield from consumer
        finally:
            consumer.close()

    return factory
