"""Real-broker smoke for the Kafka client bindings (SURVEY §2 A3/I7;
r9 VERDICT #7): kafka_clients.py is contract-tested against fakes in
test_kafka_clients.py — this module runs the SAME adapter contract
against a live broker when ``KAFKA_BOOTSTRAP`` is set (e.g.
``KAFKA_BOOTSTRAP=localhost:9092 pytest -m kafka``), and is skipped
otherwise (the test container ships no broker and no client libs).

ENVIRONMENT RECORD (r11, per the standing verify item): no environment
with a reachable broker has existed through rounds 10-11 — the build
container has no Kafka distribution (`/opt` carries only Spark/sbt),
no confluent-kafka, and no kafka-python, and installing packages is
out of scope for the image. This suite therefore remains the one
standing skip; it executes the moment a deployment exports
KAFKA_BOOTSTRAP against any 0.11+ broker with either client library
installed.

Covers, per available client library:
- admin: create_missing_topics creates a single-partition control
  topic and is idempotent on re-run;
- producer: publish returns the record's offset, monotonically
  increasing;
- consumer factory: a fresh-group read from offset 0 returns every
  message (broadcast semantics), and KafkaControlBus.read_from slices
  by offset correctly.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(
        not BOOTSTRAP, reason="KAFKA_BOOTSTRAP not set (no broker available)"
    ),
]


def _clients():
    """(admin, producer, consumer_factory) from whichever real client
    library is installed — confluent-kafka preferred (librdkafka)."""
    from dataworks_spark.streaming import kafka_clients as kc

    try:
        conf = {"bootstrap.servers": BOOTSTRAP}
        return (
            kc.ConfluentAdmin(conf),
            kc.ConfluentProducer(conf),
            kc.confluent_consumer_factory(conf),
        )
    except RuntimeError:
        pass
    try:
        return (
            kc.KafkaPythonAdmin(bootstrap_servers=BOOTSTRAP),
            kc.KafkaPythonProducer(bootstrap_servers=BOOTSTRAP),
            kc.kafka_python_consumer_factory({"bootstrap_servers": BOOTSTRAP}),
        )
    except RuntimeError:
        pytest.skip("neither confluent-kafka nor kafka-python installed")


def test_control_bus_round_trip_against_real_broker():
    from dataworks_spark.streaming.control import ControlListener, FunctionChanged, KafkaControlBus
    from dataworks_spark.streaming.kafka import create_missing_topics

    admin, producer, consumer_factory = _clients()
    topic = f"dataworks.test.control.{uuid.uuid4().hex[:12]}"

    # topic auto-create (A3), single partition per the control contract,
    # idempotent on the second call
    create_missing_topics(admin, {topic: {"partitions": 1}})
    create_missing_topics(admin, {topic: {"partitions": 1}})
    assert topic in set(admin.list_topics())

    bus = KafkaControlBus(topic, producer, consumer_factory)
    offsets = [
        bus.publish(FunctionChanged("transformer", f"fn{i}", {"expr": str(i)}))
        for i in range(3)
    ]
    assert offsets == sorted(offsets) and len(set(offsets)) == 3

    # broadcast read from the beginning sees all three, in order
    msgs = bus.read_from(0)
    assert [m.name for m in msgs] == ["fn0", "fn1", "fn2"]
    assert [m.seq for m in msgs] == offsets
    # offset slicing: a listener that consumed the first two resumes
    # at the third
    assert [m.name for m in bus.read_from(offsets[1] + 1)] == ["fn2"]

    # a ControlListener drains the topic exactly once per poll cycle
    seen = []
    lst = ControlListener(bus, {"transformer": lambda m: seen.append(m.name)})
    assert lst.poll() == 3
    assert seen == ["fn0", "fn1", "fn2"]
    assert lst.poll() == 0  # offset advanced; nothing redelivered
