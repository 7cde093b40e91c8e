"""Registry tests (SURVEY §2 K1/K2/K4, I9): transformer hot-swap,
column/pandas/python kinds, transactor fire-and-forget, alert
scheduler claim→fire→delete."""

import datetime as dt
import time

import pandas as pd
from pyspark.sql import functions as F

from dataworks_spark.docs.store import DocumentStore, version_log
from dataworks_spark.registry.alerts import AlertScheduler
from dataworks_spark.registry.transactors import TransactorRegistry
from dataworks_spark.registry.transformers import TransformerRegistry
from dataworks_spark.streaming.transforms import OpChain


def test_transformer_kinds_and_hot_swap(spark):
    reg = TransformerRegistry(spark)
    df = spark.range(3).withColumnRenamed("id", "x")

    reg.register_column("inc", lambda c: c + 1)  # ReadMe.org:44 (map inc)
    assert sorted(r.y for r in reg.apply(df, "inc", "y", "x").collect()) == [1, 2, 3]
    assert reg.version("inc") == 1

    # hot-swap: same name, new logic (transformers.clj:31-40 swap)
    reg.register_column("inc", lambda c: c + 10)
    assert sorted(r.y for r in reg.apply(df, "inc", "y", "x").collect()) == [10, 11, 12]
    assert reg.version("inc") == 2

    reg.register_pandas("double", lambda s: s * 2, "long")
    assert sorted(r.y for r in reg.apply(df, "double", "y", "x").collect()) == [0, 2, 4]

    reg.register_python("as_str", lambda v: f"v{v}", "string")
    assert sorted(r.y for r in reg.apply(df, "as_str", "y", "x").collect()) == ["v0", "v1", "v2"]


def test_opchain_udf_resolves_lazily(spark):
    """An OpChain referencing a named transformer picks up the
    hot-swapped definition on rebuild (I7 re-eval on change)."""
    reg = TransformerRegistry(spark)
    reg.register_column("score", lambda c: c * 1)
    df = spark.range(2).withColumnRenamed("id", "x")
    chain = OpChain().udf(reg, "score", "s", "x")
    assert sorted(r.s for r in chain(df).collect()) == [0, 1]
    reg.register_column("score", lambda c: c * 100)
    assert sorted(r.s for r in chain(df).collect()) == [0, 100]


def test_transactor_fire_and_forget():
    reg = TransactorRegistry()
    fired = []
    reg.register("notify", lambda *a: fired.append(a))  # Twilio demo analog
    fut = reg.transact("notify", "hello", 42)
    fut.result(timeout=5)
    assert fired == [("hello", 42)]
    assert list(reg.log) == [("notify", ("hello", 42))]


def test_transactor_foreach_batch_streaming(spark, sf_dir, tmp_path):
    """K4 streaming attachment: a transactor fires per micro-batch with
    the batch's rows (the demo app's alert/notification shape)."""
    from dataworks_spark.session import load_table
    from dataworks_spark.streaming.graph import Node, StreamGraph

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "src"
    events.filter(F.col("event_type") == "error").limit(20).write.parquet(str(src))

    reg = TransactorRegistry()
    notified = []
    reg.register("page_oncall", lambda rows, epoch: notified.extend(rows))

    g = StreamGraph(spark)
    g.add_source("errors", lambda: spark.readStream.schema(events.schema).parquet(str(src)))
    g.add_node(Node("alerts", OpChain().select("event_id", "user_id", "value"), ["errors"]))
    q = g.start_foreach_batch(
        "alerts", reg.foreach_batch_sink("page_oncall"), checkpoint=str(tmp_path / "ck")
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    import time

    time.sleep(0.3)  # transactor is async fire-and-forget
    assert len(notified) == 20
    assert reg.log and reg.log[0][0] == "page_oncall"


def test_alert_scheduler_claim_fire_delete(spark):
    """I9 (utils/alert.clj:9-51): due alerts are claimed, handlers
    fired, docs deleted; not-yet-due alerts stay."""
    t0 = dt.datetime(2024, 1, 1)
    t_due = dt.datetime(2024, 1, 2)
    t_future = dt.datetime(2024, 6, 1)
    rows = [
        ("alert/1", "alert", "notify", "params-1", False, t0),
        ("alert/2", "alert", "notify", "params-2", False, t_future),
    ]
    df = spark.createDataFrame(
        rows, "id string, doc_type string, handler string, params string, claimed boolean, ts timestamp"
    )
    store = DocumentStore(version_log(df, "id", "ts"), now_fn=lambda: t_due)
    trans = TransactorRegistry()
    fired = []
    trans.register("notify", lambda p: fired.append(p))

    sched = AlertScheduler(store, trans, now_fn=lambda: t_due)
    assert sched.tick() == 1
    time.sleep(0.2)
    assert fired == ["params-1"]
    # alert/1 deleted; alert/2 not yet visible (future valid-time J2)
    remaining = {r.id for r in sched.store.latest().collect()}
    assert "alert/1" not in remaining
    # second tick fires nothing (claim-once)
    assert sched.tick() == 0


def test_alert_failed_handler_unclaimed_and_retried(spark):
    """A transactor exception must NOT leave the alert claimed-but-
    undeleted (ADVICE r1): the failed alert is unclaimed so the next
    poll retries it, and only actually-fired alerts are deleted."""
    t0 = dt.datetime(2024, 1, 1)
    t_due = dt.datetime(2024, 1, 2)
    rows = [
        ("alert/ok", "alert", "notify", "p-ok", False, t0),
        ("alert/boom", "alert", "explode", "p-boom", False, t0),
    ]
    df = spark.createDataFrame(
        rows, "id string, doc_type string, handler string, params string, claimed boolean, ts timestamp"
    )
    store = DocumentStore(version_log(df, "id", "ts"), now_fn=lambda: t_due)
    trans = TransactorRegistry()
    fired = []
    trans.register("notify", lambda p: fired.append(p))
    calls = {"n": 0}

    def explode(p):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("downstream 500")
        fired.append(p)

    trans.register("explode", explode)
    sched = AlertScheduler(store, trans, now_fn=lambda: t_due)

    assert sched.tick() == 1  # ok fired; boom failed
    remaining = {r.id for r in sched.store.latest().collect()}
    assert "alert/ok" not in remaining  # fired → deleted
    assert "alert/boom" in remaining  # failed → kept for retry

    assert sched.tick() == 1  # retry succeeds (handler recovered)
    assert sorted(fired) == ["p-boom", "p-ok"]
    assert sched.tick() == 0  # nothing left


def test_alert_backlog_claims_in_bounded_batches(spark):
    """r11 VERDICT #5: a burst backlog (10⁵ alerts all due at once —
    the after-downtime shape) must NOT collect in one driver round.
    With the claim budget set, each tick claims/fires at most
    claim_limit alerts and the next poll continues the drain."""
    t0 = dt.datetime(2024, 1, 1)
    t_due = dt.datetime(2024, 1, 2)
    n = 100_000
    df = spark.range(n).select(
        F.concat(F.lit("alert/"), F.col("id")).alias("id"),
        F.lit("alert").alias("doc_type"),
        F.lit("notify").alias("handler"),
        F.col("id").cast("string").alias("params"),
        F.lit(False).alias("claimed"),
        F.lit(t0).alias("ts"),
    )
    store = DocumentStore(version_log(df, "id", "ts"), now_fn=lambda: t_due)
    trans = TransactorRegistry()
    fired = []
    trans.register("notify", lambda p: fired.append(p))

    sched = AlertScheduler(store, trans, now_fn=lambda: t_due, claim_limit=1024)
    assert sched.tick() == 1024  # exactly one budget's worth
    assert sched.tick() == 1024  # the drain continues where it left off
    time.sleep(0.3)
    assert len(set(fired)) == 2048  # no alert fired twice
    remaining = sched.due_alerts().count()
    assert remaining == n - 2048


def test_alert_small_backlog_drains_fully_across_ticks(spark):
    """Drain-to-zero property of the bounded claim: 50 alerts at
    claim_limit=20 finish in ⌈50/20⌉ ticks and a further tick is a
    no-op."""
    t0 = dt.datetime(2024, 1, 1)
    t_due = dt.datetime(2024, 1, 2)
    rows = [
        (f"alert/{i}", "alert", "notify", f"p-{i}", False, t0) for i in range(50)
    ]
    df = spark.createDataFrame(
        rows,
        "id string, doc_type string, handler string, params string, "
        "claimed boolean, ts timestamp",
    )
    store = DocumentStore(version_log(df, "id", "ts"), now_fn=lambda: t_due)
    trans = TransactorRegistry()
    fired = []
    trans.register("notify", lambda p: fired.append(p))

    sched = AlertScheduler(store, trans, now_fn=lambda: t_due, claim_limit=20)
    counts = [sched.tick(), sched.tick(), sched.tick(), sched.tick()]
    assert counts == [20, 20, 10, 0]
    time.sleep(0.2)
    assert sorted(fired) == sorted(f"p-{i}" for i in range(50))


def test_quality_model_as_stored_function(spark):
    """Cross-layer composition: the L17 classifier registered as a K1
    column transformer — scoreable by name from the stored-function
    surface, hot-swappable (new model table → version bump → new
    scores), and usable inside a declarative op-chain spec."""
    import math

    from dataworks_spark.llm.classify import (
        classifier_score_expr,
        collect_weights_array,
        default_hash_weights,
    )
    from dataworks_spark.registry.transformers import TransformerRegistry
    from dataworks_spark.streaming.transforms import OpChain

    reg = TransformerRegistry(spark)
    w = collect_weights_array(default_hash_weights(spark))
    reg.register_column("quality_model", lambda text: classifier_score_expr(text, w))

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")], "doc_id long, text string"
    )
    v1 = {r.doc_id: r.score for r in reg.apply(df, "quality_model", "score", "text").collect()}
    assert all(0.0 < s < 1.0 for s in v1.values())

    # hot-swap: an all-positive "retrained" model — latest version wins
    reg.register_column(
        "quality_model", lambda text: classifier_score_expr(text, [1.0] * 4096)
    )
    assert reg.version("quality_model") == 2
    v2 = {r.doc_id: r.score for r in reg.apply(df, "quality_model", "score", "text").collect()}
    expect = round(1.0 / (1.0 + math.exp(-1.0)), 6)
    assert all(s == expect for s in v2.values())

    # the same model through a declarative op-chain (stream-node shape)
    chain = OpChain().udf(reg, "quality_model", "score", "text").filter(
        F.col("score") >= 0.5
    )
    out = chain(df)
    assert out.count() == 2 and "score" in out.columns


def test_foreach_batch_sink_delivers_every_row(spark):
    """r10 review: limit(N).collect() silently DROPPED every row beyond
    N while the epoch committed — those effects were lost permanently.
    The sink now streams the whole batch in bounded chunks."""
    import time as _time

    reg = TransactorRegistry()
    got: list = []
    reg.register("collect", lambda rows, epoch: got.extend(rows))
    sink = reg.foreach_batch_sink("collect", chunk_rows=10)
    sink(spark.range(25), epoch_id=0)
    for _ in range(100):  # chunks fire async on the pool
        if len(got) == 25:
            break
        _time.sleep(0.05)
    assert sorted(r.id for r in got) == list(range(25))


def test_transactor_log_bounded_and_summarized():
    """r10 review: the audit log pinned every delivered row batch for
    the process lifetime (driver leak). Bulk args are summarized to a
    count; the log itself is a bounded deque."""
    reg = TransactorRegistry()
    reg.register("noop", lambda *a: None)
    reg.transact("noop", list(range(500))).result(timeout=5)
    assert list(reg.log) == [("noop", ("<500 rows>",))]
    assert reg.log.maxlen == TransactorRegistry.LOG_MAX


def test_alert_scheduler_clock_drives_claim(spark):
    """r10 review: the claim precondition evaluated latest() at the
    STORE's clock; with the scheduler running on a simulated/future
    clock (exactly the future-dated-alert feature), due alerts were
    visible to due_alerts but never claimable — tick() silently 0."""
    t0 = dt.datetime(2024, 1, 1)
    t_due = dt.datetime(2024, 6, 1)
    rows = [("alert/f", "alert", "notify", "p", False, t_due)]
    df = spark.createDataFrame(
        rows,
        "id string, doc_type string, handler string, params string, "
        "claimed boolean, ts timestamp",
    )
    store = DocumentStore(version_log(df, "id", "ts"), now_fn=lambda: t0)
    trans = TransactorRegistry()
    fired: list = []
    trans.register("notify", lambda p: fired.append(p))
    sched = AlertScheduler(store, trans, now_fn=lambda: t_due)
    assert sched.tick() == 1
    import time as _time

    for _ in range(50):
        if fired:
            break
        _time.sleep(0.05)
    assert fired == ["p"]


def test_validation_buffer_key_and_step_args():
    """r10 review: a bare-string buffer_key became per-character key
    columns; an int buffer_key raised TypeError out of the no-exception
    check chain; op-name-only step checking let arg-less steps through
    to crash at activation; 'then' (fluent-only, carries a callable)
    validated but was unbuildable from any spec."""
    import pytest

    from dataworks_spark.registry.validation import Invalid, parseable_steps
    from dataworks_spark.registry.validation import validate_buffer as vdoc
    from dataworks_spark.streaming.graph import validate_buffer as vb

    assert vb({"sliding-buffer": 5}, key_cols="user_id").key_cols == ("user_id",)
    with pytest.raises(ValueError, match="buffer_key"):
        vb({"sliding-buffer": 5}, key_cols=123)
    # through the doc-check chain: Invalid, never an exception
    bad = vdoc()({"buffer": {"sliding-buffer": 5}, "buffer_key": 123})
    assert isinstance(bad, Invalid)

    chk = parseable_steps()
    assert isinstance(chk({"steps": [{"op": "filter"}]}), Invalid)
    assert isinstance(chk({"steps": [{"op": "udf", "name": "f"}]}), Invalid)
    assert isinstance(chk({"steps": [{"op": "then"}]}), Invalid)
    ok = chk(
        {
            "steps": [
                {"op": "filter", "expr": "x > 0"},
                {"op": "flatmap", "col": "tags", "alias": "t"},
                {"op": "udf", "name": "f", "out": "o", "in": ["x"]},
            ]
        }
    )
    assert not isinstance(ok, Invalid)


def test_foreach_batch_sink_chunks_are_ordered_and_serial(spark):
    """r10 ADVICE: chunks fired into the shared 4-worker pool ran
    concurrently and out of order, silently breaking transactors
    written against the one-ordered-call-per-epoch contract. Chunks of
    one epoch now run serially in row order on a single pool task, and
    the sink returns only after the last effect completes."""
    import threading

    reg = TransactorRegistry()
    seen: list = []
    in_flight = []
    overlap = []
    lock = threading.Lock()

    def effect(rows, epoch):
        with lock:
            in_flight.append(1)
            if len(in_flight) > 1:
                overlap.append(1)
        time.sleep(0.02)
        seen.append([r.id for r in rows])
        with lock:
            in_flight.pop()

    reg.register("ordered", effect)
    sink = reg.foreach_batch_sink("ordered", chunk_rows=5)
    sink(spark.range(23).coalesce(1), epoch_id=0)
    # sink is synchronous now: all chunks delivered on return
    flat = [i for chunk in seen for i in chunk]
    assert flat == list(range(23)), "rows out of order or dropped"
    assert [len(c) for c in seen] == [5, 5, 5, 5, 3]
    assert not overlap, "chunks of one epoch executed concurrently"


def test_foreach_batch_sink_effect_error_fails_epoch(spark):
    """An effect error must propagate out of the sink (→ batch failure
    → epoch replay, at-least-once) instead of vanishing on the pool —
    and the producer must not hang on the bounded handoff queue when
    the consumer dies mid-epoch."""
    import pytest as _pytest

    reg = TransactorRegistry()

    def effect(rows, epoch):
        raise ValueError("effect exploded")

    reg.register("boom", effect)
    sink = reg.foreach_batch_sink("boom", chunk_rows=2)
    with _pytest.raises(ValueError, match="effect exploded"):
        sink(spark.range(50).coalesce(1), epoch_id=7)
