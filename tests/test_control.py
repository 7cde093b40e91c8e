"""Control-topic hot-swap propagation (I7) and streaming doc-store
ingest (§3.2) tests."""

import threading

from pyspark.sql import functions as F

from dataworks_spark.docs.sink import DocStoreSink
from dataworks_spark.docs.store import DocumentStore
from dataworks_spark.functions.timeops import NEVER
from dataworks_spark.registry.transformers import TransformerRegistry
from dataworks_spark.session import load_table
from dataworks_spark.streaming.control import ControlListener, FileControlBus, FunctionChanged
from dataworks_spark.streaming.graph import Node, StreamGraph
from dataworks_spark.streaming.transforms import OpChain


def test_control_bus_broadcast_to_all_nodes(spark, tmp_path):
    """Two independent 'drivers' (graph+registry pairs) both receive and
    apply a transformer change — the random-UUID-group broadcast
    semantics (app_graph.clj:29)."""
    bus = FileControlBus(str(tmp_path / "control.log"))

    drivers = []
    for _ in range(2):
        reg = TransformerRegistry(spark)
        reg.register_column("score", lambda c: c * 1)

        def make_handler(reg=reg):
            def on_transformer(msg: FunctionChanged):
                factor = msg.spec["factor"]
                reg.register_column(msg.name, lambda c, f=factor: c * f)

            return on_transformer

        listener = ControlListener(bus, {"transformer": make_handler()})
        drivers.append((reg, listener))

    # publish a change once; both listeners consume it
    bus.publish(FunctionChanged("transformer", "score", {"factor": 10}))
    for reg, listener in drivers:
        assert listener.poll() == 1
        df = spark.range(3).withColumnRenamed("id", "x")
        assert sorted(r.s for r in reg.apply(df, "score", "s", "x").collect()) == [0, 10, 20]
        assert reg.version("score") == 2  # hot-swapped on every node


def test_control_listener_replays_log_on_restart(spark, tmp_path):
    """A restarted driver replays the function log from offset 0 (the
    reference re-reads stored-function docs from its replica)."""
    bus = FileControlBus(str(tmp_path / "control.log"))
    bus.publish(FunctionChanged("transformer", "a", {"factor": 2}))
    bus.publish(FunctionChanged("transformer", "a", {"factor": 3}))

    reg = TransformerRegistry(spark)
    reg.register_column("a", lambda c: c)
    listener = ControlListener(
        bus,
        {"transformer": lambda m: reg.register_column(m.name, lambda c, f=m.spec["factor"]: c * f)},
    )
    assert listener.poll() == 2  # both messages applied in order
    df = spark.range(2).withColumnRenamed("id", "x")
    assert sorted(r.s for r in reg.apply(df, "a", "s", "x").collect()) == [0, 3]


def test_control_poll_loop_applies_async(spark, tmp_path):
    bus = FileControlBus(str(tmp_path / "control.log"))
    seen = []
    listener = ControlListener(bus, {"stream": seen.append})
    stop = threading.Event()
    t = threading.Thread(target=listener.poll_loop, args=(stop, 0.02), daemon=True)
    t.start()
    bus.publish(FunctionChanged("stream", "node1", {"steps": []}))
    import time

    for _ in range(100):
        if seen:
            break
        time.sleep(0.02)
    stop.set()
    t.join(timeout=2)
    assert seen and seen[0].name == "node1"


def test_declarative_spec_over_control_bus(spark, sf_dir, tmp_path):
    """End-to-end I7 with NO custom handler logic: the control message
    carries a pure-JSON op-spec; the standard deserializer
    (OpChain.from_spec) turns it into the node's new chain."""
    from dataworks_spark.streaming.transforms import OpChain

    bus = FileControlBus(str(tmp_path / "control.log"))
    events = load_table(spark, sf_dir, "events")

    reg = TransformerRegistry(spark)
    reg.register_column("half", lambda c: c / 2)

    g = StreamGraph(spark)
    g.add_source("src", lambda: events)
    g.add_node(Node("out", OpChain().select("event_id", "value"), ["src"]))

    listener = ControlListener(
        bus,
        {"stream": lambda m: g.swap_node(m.name, OpChain.from_spec(m.spec, reg))},
    )
    bus.publish(
        FunctionChanged(
            "stream",
            "out",
            {
                "steps": [
                    {"op": "filter", "expr": "event_type = 'purchase'"},
                    {"op": "map", "cols": {"v2": "value * 10"}},
                    {"op": "udf", "name": "half", "out": "h", "in": ["value"]},
                    {"op": "select", "cols": ["event_id", "v2", "h"]},
                ]
            },
        )
    )
    listener.poll()
    out = g.build("out")
    rows = out.collect()
    n_purchase = events.filter(F.col("event_type") == "purchase").count()
    assert len(rows) == n_purchase
    r0 = sorted(rows, key=lambda r: r.event_id)[0]
    src0 = events.filter(F.col("event_id") == r0.event_id).first()
    assert abs(r0.v2 - src0.value * 10) < 1e-9 and abs(r0.h - src0.value / 2) < 1e-9


def test_sql_registered_transformer(spark):
    """K1: a named transformer reachable from the SQL surface."""
    reg = TransformerRegistry(spark)
    reg.register_pandas("double_it", lambda s: s * 2, "long")
    reg.register_sql("double_it")
    spark.range(3).createOrReplaceTempView("v_nums")
    got = sorted(r.d for r in spark.sql("SELECT double_it(id) AS d FROM v_nums").collect())
    assert got == [0, 2, 4]


def test_streaming_ingest_into_doc_store(spark, sf_dir, tmp_path):
    """§3.2: events stream → foreachBatch → bitemporal store; the
    resulting latest view equals the batch LWW answer."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    src = tmp_path / "src"
    events.filter(F.col("event_id") < 100).write.mode("overwrite").parquet(str(src))

    empty = spark.createDataFrame(
        [], "id string, event_type string, value double, valid_from timestamp, "
        "valid_to timestamp, tx_from timestamp, tx_to timestamp, deleted boolean"
    )
    store = DocumentStore(empty, now_fn=None)
    sink = DocStoreSink(
        store, id_col=F.concat(F.lit("app/"), F.col("user_id").cast("string")), ts_col="ts"
    )
    q = sink.attach(
        spark.readStream.schema(events.schema).parquet(str(src))
        .select("user_id", "ts", "event_type", "value"),
        checkpoint=str(tmp_path / "ck"),
    )
    q.processAllAvailable()
    events.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200)).write.mode(
        "append"
    ).parquet(str(src))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    assert sink.batches_applied >= 2
    latest = sink.store.latest().select("id", "value").collect()
    from dataworks_spark.ops import latest_per_key

    expect = {
        "app/" + str(r.user_id): r.value
        for r in latest_per_key(
            events, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).collect()
    }
    got = {r.id: r.value for r in latest}
    assert got == expect


def test_kafka_control_bus_same_contract_as_file_bus():
    """I7 production transport (app_graph.clj:21-51): the Kafka-backed
    bus satisfies the same publish/read_from contract through injected
    duck-typed clients, so ControlListener broadcast + replay semantics
    hold unchanged over either transport."""
    from types import SimpleNamespace

    from dataworks_spark.streaming.control import KafkaControlBus

    class FakeBroker:
        def __init__(self):
            self.topics = {}

        def send(self, topic, value):
            log = self.topics.setdefault(topic, [])
            log.append(SimpleNamespace(offset=len(log), value=value))
            return len(log) - 1

        def flush(self):
            pass

        def consume(self, topic):
            # fresh consumer per call, from the beginning — the
            # random-UUID-group broadcast read
            return list(self.topics.get(topic, []))

    broker = FakeBroker()
    bus = KafkaControlBus("dataworks.internal.functions", broker, broker.consume)

    assert bus.publish(FunctionChanged("transformer", "up", {"fn": "upper"})) == 0
    assert bus.publish(FunctionChanged("stream", "s1", {"steps": []})) == 1

    # two independent listeners each see the full log (broadcast)
    seen_a, seen_b = [], []
    la = ControlListener(bus, {"transformer": seen_a.append, "stream": seen_a.append})
    lb = ControlListener(bus, {"transformer": seen_b.append})
    assert la.poll() == 2 and [m.name for m in seen_a] == ["up", "s1"]
    lb.poll()
    assert [m.name for m in seen_b] == ["up"]  # unhandled types skipped

    # offset semantics: a restarted listener replays from 0; a live one
    # only sees the suffix
    bus.publish(FunctionChanged("transformer", "low", {"fn": "lower"}))
    assert la.poll() == 1 and seen_a[-1].name == "low"
    restarted = ControlListener(bus, {"transformer": (lambda m: None)})
    assert restarted.poll() == 3  # full replay
    assert bus.read_from(2)[0].seq == 2


def test_listener_tolerates_compacted_offset_holes():
    """A compacted Kafka control topic has holes (superseded function
    versions removed). The listener must advance past the highest seq
    seen — counting messages would re-deliver the last survivor on
    every poll forever."""
    from types import SimpleNamespace

    from dataworks_spark.streaming.control import KafkaControlBus

    records = [
        SimpleNamespace(offset=0, value=FunctionChanged("transformer", "a", {}).to_json().encode()),
        # offset 1 compacted away
        SimpleNamespace(offset=2, value=FunctionChanged("transformer", "b", {}).to_json().encode()),
    ]
    bus = KafkaControlBus("t", producer=None, consumer_factory=lambda topic: list(records))
    seen = []
    lst = ControlListener(bus, {"transformer": seen.append})
    assert lst.poll() == 2 and [m.name for m in seen] == ["a", "b"]
    assert lst.poll() == 0  # no re-delivery of the offset-2 record
    assert [m.name for m in seen] == ["a", "b"]


def test_poll_isolates_handler_failures(tmp_path):
    """ADVICE r8: a handler raising (e.g. validate_buffer on a
    malformed replayed doc) propagated through poll() and killed the
    poll_loop daemon, silently halting ALL control processing. poll()
    now records the failure and keeps applying subsequent messages."""
    bus = FileControlBus(str(tmp_path / "control.log"))
    applied = []

    def handler(m):
        if m.spec.get("boom"):
            raise ValueError("malformed doc")
        applied.append(m.name)

    lst = ControlListener(bus, {"stream": handler})
    bus.publish(FunctionChanged("stream", "good1", {"steps": []}))
    bus.publish(FunctionChanged("stream", "bad", {"boom": True}))
    bus.publish(FunctionChanged("stream", "good2", {"steps": []}))
    n = lst.poll()
    assert n == 3
    assert applied == ["good1", "good2"]
    assert len(lst.errors) == 1 and lst.errors[0][0].name == "bad"
    # offset advanced past the poisoned message: no redelivery loop
    assert lst.poll() == 0
    assert len(lst.errors) == 1


def test_create_function_still_fails_loudly(spark, tmp_path):
    """The synchronous create path must surface activation errors even
    though the daemon poll isolates them (engine re-raises errors for
    the doc it just published)."""
    import pytest

    from dataworks_spark.engine import Engine

    eng = Engine({"control.log": str(tmp_path / "control.log")}, spark=spark)
    eng.listener.handlers["stream"] = lambda m: (_ for _ in ()).throw(
        RuntimeError("activation failed")
    )
    with pytest.raises(RuntimeError, match="activation failed"):
        eng.create_function(
            "stream", {"name": "s1", "steps": [], "upstreams": ["src"]}
        )
    # r9 ADVICE: activation now runs BEFORE persist/broadcast, so the
    # failed doc must leave NO global state — no app-db row (other
    # drivers re-read functions from it on boot) and no bus message
    # (other drivers would activate a doc this driver rejected)
    assert eng.app_db.latest().filter("id = 'stream/s1'").count() == 0
    assert eng.bus.read_from(0) == []


def test_create_function_retry_succeeds_after_transient_failure(spark, tmp_path):
    """Review r9: listener.errors is append-only; create_function must
    re-raise only failures from THIS publish — a name that failed once
    must not be poisoned forever."""
    import pytest

    from dataworks_spark.engine import Engine

    eng = Engine({"control.log": str(tmp_path / "bus.log")}, spark=spark)
    real = eng.listener.handlers["stream"]
    calls = {"n": 0}

    def flaky(m):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient activation failure")
        real(m)

    eng.listener.handlers["stream"] = flaky
    doc = {"name": "s1", "steps": [], "upstreams": ["src"]}
    with pytest.raises(RuntimeError, match="transient"):
        eng.create_function("stream", doc)
    # retry with the SAME name now succeeds (stale error not re-raised)
    out = eng.create_function("stream", doc)
    assert out["name"] == "s1"
    assert "s1" in eng.graph._nodes


def test_create_function_rolls_back_on_publish_failure(spark, tmp_path):
    """r10 review: if persist/broadcast fails AFTER the trial
    activation, the local graph must roll back to the exact pre-call
    state — otherwise this driver silently runs a definition no other
    driver and no durable store ever received (fleet divergence)."""
    import json

    import pytest

    from dataworks_spark.engine import Engine

    eng = Engine({"control.log": str(tmp_path / "bus.log")}, spark=spark)
    doc1 = {"name": "s1", "steps": [], "upstreams": ["a"]}
    assert not hasattr(eng.create_function("stream", doc1), "reason")
    node_v1 = eng.graph._nodes["s1"]

    def boom(msg):
        raise RuntimeError("broker down")

    eng.bus.publish = boom
    epoch_before = eng.graph._epoch
    with pytest.raises(RuntimeError, match="broker down"):
        eng.create_function("stream", {**doc1, "upstreams": ["b"]})
    # the exact v1 Node object (runtime state included) is back, and
    # the swap epoch rolled back too (r10 review: a surviving epoch
    # bump made the 'exact pre-call state' contract false)
    assert eng.graph._nodes["s1"] is node_v1
    assert eng.graph._nodes["s1"].upstreams == ["a"]
    assert eng.graph._epoch == epoch_before
    # app-db still holds v1's payload
    payload = json.loads(
        eng.app_db.latest().filter("id = 'stream/s1'").select("payload").first()[0]
    )
    assert payload["upstreams"] == ["a"]
    # a brand-new name that fails to publish leaves no node behind
    with pytest.raises(RuntimeError, match="broker down"):
        eng.create_function("stream", {"name": "s2", "steps": [], "upstreams": ["a"]})
    assert "s2" not in eng.graph._nodes
    assert eng.app_db.latest().filter("id = 'stream/s2'").count() == 0
