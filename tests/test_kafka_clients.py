"""Adapter-logic tests for streaming/kafka_clients.py against FAKE
client modules (the container ships neither confluent-kafka nor
kafka-python, and no broker). What these pin is the part WE wrote:
offset capture through the delivery callback, fresh-UUID broadcast
groups + earliest reset, the method→attribute record re-shape, NewTopic
argument mapping, and that the adapters satisfy the injected duck types
end-to-end (create_missing_topics + KafkaControlBus round-trip)."""

from __future__ import annotations

import sys
import types

import pytest

from dataworks_spark.streaming.control import ControlListener, FunctionChanged, KafkaControlBus
from dataworks_spark.streaming.kafka import create_missing_topics


# ── fake confluent_kafka ─────────────────────────────────────────────


class _FakeFuture:
    def __init__(self, err=None):
        self._err = err

    def result(self, _timeout=None):
        if self._err:
            raise self._err


class _FakeTopicLog:
    """Shared in-memory broker state: topic -> list[bytes]."""

    def __init__(self):
        self.topics: dict[str, list[bytes]] = {}


class _FakeConfluentAdmin:
    def __init__(self, conf, log: _FakeTopicLog):
        self.log = log

    def list_topics(self, timeout=None):
        md = types.SimpleNamespace()
        md.topics = {t: None for t in self.log.topics}
        return md

    def create_topics(self, new_topics):
        out = {}
        for nt in new_topics:
            self.log.topics.setdefault(nt.topic, [])
            out[nt.topic] = _FakeFuture()
            # record the settings for assertion
            self.log.topics[nt.topic + "/__meta__"] = (nt.num_partitions, nt.replication_factor)
        return out


class _FakeNewTopic:
    def __init__(self, topic, num_partitions=None, replication_factor=None):
        self.topic = topic
        self.num_partitions = num_partitions
        self.replication_factor = replication_factor


class _FakeConfluentMsg:
    """confluent's Message: offset()/value() are METHODS."""

    def __init__(self, offset, value):
        self._o, self._v = offset, value

    def offset(self):
        return self._o

    def value(self):
        return self._v

    def error(self):
        return None


class _FakeConfluentProducer:
    def __init__(self, conf, log: _FakeTopicLog):
        self.log = log
        self._pending = []

    def produce(self, topic, value=None, on_delivery=None):
        self._pending.append((topic, value, on_delivery))

    def flush(self, _timeout=None):
        for topic, value, cb in self._pending:
            msgs = self.log.topics.setdefault(topic, [])
            msgs.append(value)
            if cb:
                cb(None, _FakeConfluentMsg(len(msgs) - 1, value))
        self._pending.clear()
        return 0


class _FakeConfluentConsumer:
    created_groups: list[str] = []

    def __init__(self, conf, log: _FakeTopicLog):
        self.log = log
        self.conf = conf
        self._queue: list[_FakeConfluentMsg] | None = None
        _FakeConfluentConsumer.created_groups.append(conf["group.id"])
        assert conf["auto.offset.reset"] == "earliest"
        assert conf["enable.auto.commit"] is False

    def subscribe(self, topics):
        (t,) = topics
        self._queue = [
            _FakeConfluentMsg(i, v) for i, v in enumerate(self.log.topics.get(t, []))
        ]

    def poll(self, _timeout):
        return self._queue.pop(0) if self._queue else None

    def close(self):
        pass


@pytest.fixture()
def fake_confluent(monkeypatch):
    log = _FakeTopicLog()
    ck = types.ModuleType("confluent_kafka")
    ck_admin = types.ModuleType("confluent_kafka.admin")
    ck_admin.AdminClient = lambda conf: _FakeConfluentAdmin(conf, log)
    ck_admin.NewTopic = _FakeNewTopic
    ck.admin = ck_admin
    ck.Producer = lambda conf: _FakeConfluentProducer(conf, log)
    ck.Consumer = lambda conf: _FakeConfluentConsumer(conf, log)
    monkeypatch.setitem(sys.modules, "confluent_kafka", ck)
    monkeypatch.setitem(sys.modules, "confluent_kafka.admin", ck_admin)
    _FakeConfluentConsumer.created_groups.clear()
    return log


def test_confluent_admin_satisfies_topic_seam(fake_confluent):
    from dataworks_spark.streaming.kafka_clients import ConfluentAdmin

    admin = ConfluentAdmin({"bootstrap.servers": "b:9092"})
    created = create_missing_topics(
        admin, {"input": {}, "control": {"partitions": 1, "replication": 1}}
    )
    assert created == ["control", "input"]
    # per-topic settings + 6/3 defaults reached NewTopic
    assert fake_confluent.topics["control/__meta__"] == (1, 1)
    assert fake_confluent.topics["input/__meta__"] == (6, 3)
    # idempotent second call
    assert create_missing_topics(admin, ["input", "control"]) == []


def test_confluent_control_bus_roundtrip(fake_confluent):
    """The full I7 path over the confluent adapters: publish returns
    the real offset from the delivery callback; read_from re-shapes
    method-style messages into offset/value records; each read uses a
    FRESH broadcast group."""
    from dataworks_spark.streaming.kafka_clients import (
        ConfluentProducer,
        confluent_consumer_factory,
    )

    bus = KafkaControlBus(
        "dataworks.internal.functions",
        ConfluentProducer({"bootstrap.servers": "b:9092"}),
        confluent_consumer_factory({"bootstrap.servers": "b:9092"}, idle_polls=1),
    )
    assert bus.publish(FunctionChanged("stream", "s1", {"steps": []})) == 0
    assert bus.publish(FunctionChanged("transformer", "t1", {"expr": "x"})) == 1

    applied = []
    lst = ControlListener(bus, {"stream": lambda m: applied.append(m.name),
                                "transformer": lambda m: applied.append(m.name)})
    assert lst.poll() == 2
    assert applied == ["s1", "t1"]
    assert lst.poll() == 0  # offset advanced
    # two reads -> two distinct broadcast groups
    groups = _FakeConfluentConsumer.created_groups
    assert len(groups) == len(set(groups)) >= 2


# ── fake kafka-python ────────────────────────────────────────────────


class _FakeKPFuture:
    def __init__(self, offset):
        self._offset = offset

    def get(self, timeout=None):
        return types.SimpleNamespace(offset=self._offset)


class _FakeKPProducer:
    def __init__(self, log: _FakeTopicLog):
        self.log = log

    def send(self, topic, value=None):
        msgs = self.log.topics.setdefault(topic, [])
        msgs.append(value)
        return _FakeKPFuture(len(msgs) - 1)

    def flush(self):
        pass


class _FakeKPConsumer:
    created_groups: list[str] = []

    def __init__(self, topic, log: _FakeTopicLog, **conf):
        assert conf["auto_offset_reset"] == "earliest"
        assert conf["enable_auto_commit"] is False
        _FakeKPConsumer.created_groups.append(conf["group_id"])
        self._records = [
            types.SimpleNamespace(offset=i, value=v)
            for i, v in enumerate(log.topics.get(topic, []))
        ]

    def __iter__(self):
        return iter(self._records)

    def close(self):
        pass


@pytest.fixture()
def fake_kafka_python(monkeypatch):
    log = _FakeTopicLog()
    ka = types.ModuleType("kafka")
    ka_admin = types.ModuleType("kafka.admin")

    class _Admin:
        def __init__(self, **conf):
            self.log = log

        def list_topics(self):
            return [t for t in log.topics if not t.endswith("/__meta__")]

        def create_topics(self, new_topics):
            for nt in new_topics:
                log.topics.setdefault(nt.name, [])
                log.topics[nt.name + "/__meta__"] = (nt.num_partitions, nt.replication_factor)

    class _NewTopic:
        def __init__(self, name, num_partitions, replication_factor):
            self.name, self.num_partitions, self.replication_factor = (
                name, num_partitions, replication_factor,
            )

    ka_admin.KafkaAdminClient = _Admin
    ka_admin.NewTopic = _NewTopic
    ka.admin = ka_admin
    ka.KafkaProducer = lambda **conf: _FakeKPProducer(log)
    ka.KafkaConsumer = lambda topic, **conf: _FakeKPConsumer(topic, log, **conf)
    monkeypatch.setitem(sys.modules, "kafka", ka)
    monkeypatch.setitem(sys.modules, "kafka.admin", ka_admin)
    _FakeKPConsumer.created_groups.clear()
    return log


def test_kafka_python_admin_satisfies_topic_seam(fake_kafka_python):
    from dataworks_spark.streaming.kafka_clients import KafkaPythonAdmin

    admin = KafkaPythonAdmin(bootstrap_servers="b:9092")
    assert create_missing_topics(admin, ["output"]) == ["output"]
    assert fake_kafka_python.topics["output/__meta__"] == (6, 3)
    assert create_missing_topics(admin, ["output"]) == []


def test_kafka_python_control_bus_roundtrip(fake_kafka_python):
    from dataworks_spark.streaming.kafka_clients import (
        KafkaPythonProducer,
        kafka_python_consumer_factory,
    )

    bus = KafkaControlBus(
        "dataworks.internal.functions",
        KafkaPythonProducer(bootstrap_servers="b:9092"),
        kafka_python_consumer_factory(),
    )
    assert bus.publish(FunctionChanged("stream", "s1", {"steps": []})) == 0
    got = bus.read_from(0)
    assert [(m.name, m.seq) for m in got] == [("s1", 0)]
    groups = _FakeKPConsumer.created_groups
    assert len(groups) == len(set(groups)) == 1


def test_missing_libraries_raise_directed_error(monkeypatch):
    """Without the client libs the adapters fail at CONSTRUCTION with
    install guidance, not deep inside a call."""
    monkeypatch.setitem(sys.modules, "confluent_kafka", None)
    monkeypatch.setitem(sys.modules, "confluent_kafka.admin", None)
    from dataworks_spark.streaming.kafka_clients import ConfluentAdmin

    with pytest.raises(RuntimeError, match="confluent-kafka is not installed"):
        ConfluentAdmin({})


def test_confluent_send_raises_when_delivery_unconfirmed(fake_confluent, monkeypatch):
    """Review r9: flush returning without the delivery callback firing
    (broker unreachable) must RAISE, not report offset -1 as success —
    a control broadcast the engine believes landed but no driver saw."""
    from dataworks_spark.streaming.kafka_clients import ConfluentProducer

    prod = ConfluentProducer({"bootstrap.servers": "b:9092"})
    monkeypatch.setattr(prod._producer, "flush", lambda _t=None: 1)  # never delivers
    with pytest.raises(RuntimeError, match="not delivered"):
        prod.send("ctl", b"x")


def test_confluent_read_raises_on_consumer_error(fake_confluent):
    """Review r9: a hard consumer error (authz, unknown topic) must not
    masquerade as an empty control log; partition EOF stays benign."""
    from dataworks_spark.streaming.kafka_clients import confluent_consumer_factory

    class _ErrMsg:
        def __init__(self, code):
            self._code = code

        def error(self):
            class E:
                def __init__(self, c):
                    self._c = c

                def code(self):
                    return self._c

                def __str__(self):
                    return f"KafkaError({self._c})"

            return E(self._code)

        def offset(self):
            return 0

        def value(self):
            return b""

    log = fake_confluent
    factory = confluent_consumer_factory({"bootstrap.servers": "b"}, idle_polls=1)

    class _Consumer:
        def __init__(self, queue):
            self._q = queue

        def subscribe(self, topics):
            pass

        def poll(self, _t):
            return self._q.pop(0) if self._q else None

        def close(self):
            pass

    import sys

    ck = sys.modules["confluent_kafka"]
    # hard error -> raise
    ck.Consumer = lambda conf: _Consumer([_ErrMsg(13)])
    with pytest.raises(RuntimeError, match="failed"):
        list(factory("ctl"))
    # partition EOF (-191) -> benign end-of-data
    ck.Consumer = lambda conf: _Consumer([_ErrMsg(-191)])
    assert list(factory("ctl")) == []


def test_stream_doc_republish_rewires_upstreams(spark, tmp_path):
    """Review r9: a doc republished with DIFFERENT upstreams must
    rewire the live node, not keep the old topology while the
    persisted document claims the new one."""
    from dataworks_spark.engine import Engine

    eng = Engine({"control.log": str(tmp_path / "bus.log")}, spark=spark)
    doc = {"name": "p", "steps": [], "upstreams": ["kafka-a"]}
    eng.create_function("stream", doc)
    assert eng.graph._nodes["p"].upstreams == ["kafka-a"]
    eng.create_function("stream", {**doc, "upstreams": ["kafka-b"]})
    assert eng.graph._nodes["p"].upstreams == ["kafka-b"]
