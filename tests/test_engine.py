"""Engine facade tests — the §3.1 stored-function lifecycle
(validate → persist → activate → propagate) and the demo-app topology
(doc/demo-app-1.org) re-expressed through one API."""

import pytest
from pyspark.sql import functions as F

from dataworks_spark.engine import Engine
from dataworks_spark.registry.validation import Invalid
from dataworks_spark.session import load_table


@pytest.fixture
def engine(spark, tmp_path):
    e = Engine(
        config={"control.log": str(tmp_path / "bus.log"), "collector.spool": str(tmp_path / "spool")},
        spark=spark,
    )
    yield e
    e.stop()


def test_create_function_validation_short_circuits(engine):
    bad = engine.create_function("stream", {"name": "Bad Name", "steps": [], "upstreams": ["s"]})
    assert isinstance(bad, Invalid) and bad.message == "invalid-name"
    missing = engine.create_function("transformer", {"name": "t"})
    assert isinstance(missing, Invalid) and missing.message == "missing-field"


def test_demo_app_topology(engine, spark, sf_dir):
    """The demo-app flow: a declarative transformer + a stream node
    using it, deployed through create_function, run over events."""
    ok = engine.create_function(
        "transformer", {"name": "usd-cents", "kind": "column", "expr": "CAST(value * 100 AS BIGINT)"}
    )
    assert not isinstance(ok, Invalid)
    ok = engine.create_function(
        "stream",
        {
            "name": "purchases",
            "upstreams": ["ingest"],
            "steps": [
                {"op": "filter", "expr": "event_type = 'purchase'"},
                {"op": "udf", "name": "usd-cents", "out": "cents", "in": ["value"]},
                {"op": "select", "cols": ["event_id", "cents"]},
            ],
        },
    )
    assert not isinstance(ok, Invalid)

    events = load_table(spark, sf_dir, "events")
    engine.graph.add_source("ingest", lambda: events)
    out = engine.graph.build("purchases")
    rows = out.collect()
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    assert len(rows) == n_purchases
    sample = events.filter(F.col("event_type") == "purchase").first()
    got = {r.event_id: r.cents for r in rows}
    assert got[sample.event_id] == int(sample.value * 100)

    # persisted as a stored-function document (added-to-db?)
    fn_ids = {r.id for r in engine.app_db.latest().select("id").collect()}
    assert {"transformer/usd-cents", "stream/purchases"} <= fn_ids


def test_cross_engine_propagation(engine, spark, sf_dir, tmp_path):
    """A second driver consuming the same control log applies the same
    functions (§3.1 step 7 / app_graph.clj broadcast)."""
    engine.create_function(
        "transformer", {"name": "doubled", "kind": "column", "expr": "value * 2"}
    )
    engine.create_function(
        "stream",
        {
            "name": "scored",
            "upstreams": ["src"],
            "steps": [{"op": "udf", "name": "doubled", "out": "d", "in": ["value"]},
                      {"op": "select", "cols": ["event_id", "d"]}],
        },
    )

    other = Engine(
        config={"control.log": str(tmp_path / "bus.log"), "collector.spool": str(tmp_path / "spool2")},
        spark=spark,
    )
    try:
        applied = other.listener.poll()
        assert applied == 2
        events = load_table(spark, sf_dir, "events").limit(50)
        other.graph.add_source("src", lambda: events)
        rows = other.graph.build("scored").collect()
        vals = {r.event_id: r.value for r in events.collect()}
        assert all(abs(r.d - 2 * vals[r.event_id]) < 1e-9 for r in rows)
    finally:
        other.stop()


def test_function_doc_payload_is_json(engine):
    """The app-db copy of a stored function must be machine-parseable
    (ADVICE r1): same JSON encoding the control bus uses."""
    import json

    ok = engine.create_function(
        "transformer", {"name": "cents", "kind": "column", "expr": "CAST(value*100 AS BIGINT)"}
    )
    assert not isinstance(ok, Invalid)
    row = engine.app_db.entity("transformer/cents").collect()[0]
    assert json.loads(row.payload)["expr"] == "CAST(value*100 AS BIGINT)"
    # applied exactly once, via the same consume path other drivers use
    assert engine.listener.offset == 1 and len(engine.listener.applied) == 1


def test_engine_user_auth_surface(engine):
    """core.clj boots the auth resources; the Engine exposes the same
    surface: register → login → role-gated authorization."""
    ok = engine.users.add_user("ops", "pw", roles=("admin",))
    assert not isinstance(ok, Invalid)
    tok = engine.users.check_cred("ops", "pw")
    assert tok and engine.users.authorize(tok, ("admin",))
    assert engine.users.check_cred("ops", "nope") is None


def test_collector_stored_function_lifecycle(engine):
    """The fourth stored-function type (collector.clj:84-112): deploying
    a collector through create_function hot-mounts its ingest route on a
    running server, and a later-booted server rebuilds routes from the
    app-db."""
    import json
    import urllib.request

    assert isinstance(engine.create_function("collector", {"name": ""}), Invalid)
    # deploy BEFORE the server exists: persisted, mounted at boot
    ok = engine.create_function("collector", {"name": "applogs"})
    assert not isinstance(ok, Invalid)
    server = engine.start_collector()
    # deploy AFTER the server exists: hot-mounted
    ok = engine.create_function("collector", {"name": "metrics"})
    assert not isinstance(ok, Invalid)

    for path in ("applogs", "metrics"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/{path}",
            data=json.dumps({"k": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
    fn_ids = {r.id for r in engine.app_db.latest().select("id").collect()}
    assert {"collector/applogs", "collector/metrics"} <= fn_ids


def test_stream_with_lossy_buffer_through_lifecycle(engine, spark, sf_dir):
    """I2 through the full deployment pipeline: a stream doc carrying
    the reference's {sliding-buffer n} spec validates, activates, and
    sheds the node input to capacity per key before the op-chain; a
    lossy spec without a buffer_key fails validation; an unknown
    buffer shape is the reference's :invalid-buffer failure."""
    ok = engine.create_function(
        "stream",
        {
            "name": "recent-clicks",
            "upstreams": ["ingest"],
            "buffer": {"sliding-buffer": 2},
            "buffer_key": ["user_id"],
            "buffer_ts": "ts",
            "steps": [{"op": "filter", "expr": "event_type = 'click'"}],
        },
    )
    assert not isinstance(ok, Invalid)

    events = load_table(spark, sf_dir, "events")
    engine.graph.add_source("ingest", lambda: events)
    out = engine.graph.build("recent-clicks")
    per_user = out.groupBy("user_id").count().collect()
    assert per_user and all(r["count"] <= 2 for r in per_user)

    missing_key = engine.create_function(
        "stream",
        {
            "name": "nokey",
            "upstreams": ["ingest"],
            "buffer": {"dropping-buffer": 3},
            "steps": [],
        },
    )
    assert isinstance(missing_key, Invalid) and missing_key.message == "invalid-buffer"
    bad = engine.create_function(
        "stream",
        {"name": "badbuf", "upstreams": ["ingest"], "buffer": {"ring-buffer": 3}, "steps": []},
    )
    assert isinstance(bad, Invalid) and bad.message == "invalid-buffer"
    fixed = engine.create_function(
        "stream",
        {"name": "fixedbuf", "upstreams": ["ingest"], "buffer": 512, "steps": []},
    )
    assert not isinstance(fixed, Invalid)


def test_stream_doc_republish_without_buffer_clears_it(spark, tmp_path):
    """ADVICE r8 end-to-end: a stream doc republished WITHOUT a buffer
    field must remove the node's lossy buffer (engine passes the parsed
    value — None — explicitly; swap_node's sentinel only preserves on
    OMITTED kwargs)."""
    import os

    from dataworks_spark.engine import Engine

    eng = Engine({"control.log": os.path.join(str(tmp_path), "bus.log")}, spark=spark)
    doc = {
        "name": "proc",
        "upstreams": ["src"],
        "steps": [{"op": "map", "cols": {"v": "v + 1"}}],
        "buffer": {"sliding-buffer": 3},
        "buffer_key": ["k"],
        "buffer_ts": "ts",
    }
    assert not hasattr(eng.create_function("stream", doc), "reason")
    assert eng.graph._nodes["proc"].buffer is not None

    redoc = {k: v for k, v in doc.items() if not k.startswith("buffer")}
    assert not hasattr(eng.create_function("stream", redoc), "reason")
    assert eng.graph._nodes["proc"].buffer is None  # cleared, not kept


def test_create_function_unknown_type_returns_invalid(spark, tmp_path):
    """r10 review: a typo'd function_type escaped as a bare KeyError
    before any check ran — the contract is doc-or-Invalid."""
    from dataworks_spark.engine import Engine
    from dataworks_spark.registry.validation import Invalid

    eng = Engine({"control.log": str(tmp_path / "bus.log")}, spark=spark)
    out = eng.create_function("collectr", {"name": "x"})
    assert isinstance(out, Invalid) and out.message == "unknown-function-type"


def test_collector_replayed_doc_survives_restart(spark, tmp_path):
    """r10 review: a collector doc replayed from the control log while
    no server was running was permanently lost (replay never persists
    to the fresh driver's in-memory app-db; start_collector read only
    the app-db). The engine now records every replayed collector name
    and mounts it on boot."""
    from dataworks_spark.engine import Engine

    log = str(tmp_path / "bus.log")
    eng_a = Engine({"control.log": log, "collector.spool": str(tmp_path / "sa")}, spark=spark)
    assert not hasattr(eng_a.create_function("collector", {"name": "ingest"}), "reason")

    # driver B: same control log, fresh (empty) app-db, no server yet
    eng_b = Engine({"control.log": log, "collector.spool": str(tmp_path / "sb")}, spark=spark)
    eng_b.listener.poll()  # replay
    srv = eng_b.start_collector()
    try:
        assert "ingest" in srv._routes
    finally:
        eng_b.stop()


def test_collector_names_rolled_back_on_failed_persist(spark, tmp_path):
    """r10 ADVICE: trial activation of a collector added msg.name to
    _collector_names but the persist/broadcast rollback never undid it
    — a later start_collector() mounted a phantom route for a function
    no other driver or the durable store ever saw."""
    from dataworks_spark.engine import Engine

    eng = Engine(
        {"control.log": str(tmp_path / "bus.log"), "collector.spool": str(tmp_path / "sp")},
        spark=spark,
    )
    try:
        orig_publish = eng.bus.publish

        def boom(msg):
            raise RuntimeError("broker down")

        eng.bus.publish = boom
        with pytest.raises(RuntimeError, match="broker down"):
            eng.create_function("collector", {"name": "ghost"})
        eng.bus.publish = orig_publish
        assert "ghost" not in eng._collector_names
        srv = eng.start_collector()
        assert "ghost" not in srv._routes
        # a live server's route is also rolled back when one is running
        eng.bus.publish = boom
        with pytest.raises(RuntimeError, match="broker down"):
            eng.create_function("collector", {"name": "ghost2"})
        assert "ghost2" not in eng._collector_names
        assert "ghost2" not in srv._routes
    finally:
        eng.bus.publish = orig_publish
        eng.stop()


def test_collector_activation_failure_restores_name_set(spark, tmp_path):
    """r11 review: when the trial activation ITSELF raises (server
    registration error), the pre-activation snapshot must be restored
    — _on_collector_change adds the name before register() can fail,
    and the persist-failure rollback alone left the phantom behind."""
    from dataworks_spark.engine import Engine

    eng = Engine(
        {"control.log": str(tmp_path / "bus.log"), "collector.spool": str(tmp_path / "sp")},
        spark=spark,
    )
    try:
        srv = eng.start_collector()

        def boom(name):
            raise OSError("spool unwritable")

        orig = srv.register
        srv.register = boom
        with pytest.raises(OSError, match="spool unwritable"):
            eng.create_function("collector", {"name": "phantom"})
        srv.register = orig
        assert "phantom" not in eng._collector_names
        assert "phantom" not in srv._routes
        # nothing persisted, nothing broadcast
        ids = {r.id for r in eng.app_db.latest().select("id").collect()}
        assert "collector/phantom" not in ids
    finally:
        eng.stop()
