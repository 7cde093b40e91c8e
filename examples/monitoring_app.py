"""The reference's demo application, end-to-end on this engine.

`/root/reference/doc/demo-app-1.org` builds "a generic monitoring
application that will let you: 1. Collect logs from an arbitrary number
of apps via REST API, 2. Track whether it has started and is running,
3. Notify yourself if there's a problem." This example runs that exact
application on the Spark rebuild:

  1. hot-register a REST collector and POST app heartbeats to it
     (collector.clj:84-112 → CollectorServer spool);
  2. ingest the spool with Structured Streaming into the bitemporal
     user document store (stream.clj topology → DocStoreSink);
  3. deploy a stored-function stream through Engine.create_function
     (the §3.1 validate→persist→activate→propagate lifecycle) that
     normalizes heartbeats;
  4. schedule watchdog alerts (alert.clj:9-51) whose transactor
     handler checks each app's latest heartbeat and records a
     notification for silent apps;
  5. read the answers back: latest status per app, the notification
     log, and one app's full bitemporal history.

Run: python examples/monitoring_app.py   (finishes in ~1 min)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_spark.docs.sink import DocStoreSink  # noqa: E402
from dataworks_spark.docs.store import DocumentStore, StoreRef, version_log  # noqa: E402
from dataworks_spark.engine import Engine  # noqa: E402
from dataworks_spark.registry.alerts import AlertScheduler  # noqa: E402
from dataworks_spark.registry.validation import Invalid  # noqa: E402

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def post(port: int, path: str, doc: dict) -> None:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/{path}",
        data=json.dumps(doc).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200, resp.status


def main(workdir: str | None = None, spark=None) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="monitoring_app_")
    engine = Engine(
        config={
            "control.log": os.path.join(workdir, "bus.log"),
            "collector.spool": os.path.join(workdir, "spool"),
        },
        spark=spark,
    )
    spark = engine.spark
    out: dict = {}
    try:
        # 1. deploy the collector as a stored function (validate →
        # persist → broadcast → mount, §3.1) and send heartbeats:
        # "frontend" keeps beating, "batcher" starts then goes silent.
        ok = engine.create_function("collector", {"name": "demo-app"})
        assert not isinstance(ok, Invalid), ok
        collector = engine.start_collector()  # mounts demo-app from app-db
        beats = [
            ("frontend", "started", 0),
            ("batcher", "started", 1),
            ("frontend", "ok", 5),
            ("frontend", "ok", 10),
        ]
        for app, event, minutes in beats:
            post(
                collector.port,
                "demo-app",
                {
                    "app": app,
                    "event": event,
                    "ts": (T0 + dt.timedelta(minutes=minutes)).isoformat(),
                },
            )

        # 2. ingest spool → bitemporal user db (id = app/<name>),
        # durably: every epoch incrementally compacts to partitioned
        # parquet (only delta-touched partitions rewritten)
        stream = collector.stream(spark, "demo-app", "app string, event string, ts string")
        typed = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        sink = DocStoreSink(
            engine.user_db_ref,
            id_col=F.concat(F.lit("app/"), F.col("app")),
            ts_col="ts",
            durable_path=os.path.join(workdir, "user_db"),
        )
        q = sink.attach(typed, checkpoint=os.path.join(workdir, "ck"))
        q.processAllAvailable()
        q.stop()

        # 3. a stored-function stream (deployed like the reference's
        # stored functions — validated, persisted, broadcast) that
        # normalizes heartbeat events to a status view
        ok = engine.create_function(
            "transformer",
            {"name": "to-status", "kind": "column", "expr": "IF(event = 'started', 'up', event)"},
        )
        assert not isinstance(ok, Invalid), ok
        ok = engine.create_function(
            "stream",
            {
                "name": "statuses",
                "upstreams": ["heartbeats"],
                "steps": [
                    {"op": "udf", "name": "to-status", "out": "status", "in": ["event"]},
                    {"op": "select", "cols": ["id", "status", "valid_from"]},
                ],
            },
        )
        assert not isinstance(ok, Invalid), ok
        engine.graph.add_source("heartbeats", lambda: engine.user_db.latest())
        out["statuses"] = {
            r.id: r.status for r in engine.graph.build("statuses").collect()
        }

        # 4. watchdog alerts: one per app, due 15 minutes after start.
        # The handler checks the app's latest heartbeat and records a
        # notification if it is older than 10 minutes at alert time.
        t_check = T0 + dt.timedelta(minutes=15)
        notifications: list[str] = []

        def watchdog(app: str) -> None:
            last = (
                engine.user_db.latest()
                .filter(F.col("id") == f"app/{app}")
                .agg(F.max("valid_from"))
                .first()[0]
            )
            if last is None or (t_check - last) > dt.timedelta(minutes=10):
                notifications.append(f"ALERT {app}: silent since {last}")

        engine.register_transactor("watchdog", watchdog)
        alert_rows = [
            (f"alert/{app}", "alert", "watchdog", app, False, t_check)
            for app in ("frontend", "batcher")
        ]
        alert_df = spark.createDataFrame(
            alert_rows,
            "id string, doc_type string, handler string, params string, "
            "claimed boolean, ts timestamp",
        )
        # alerts live in their own store (the reference keeps them in
        # app-db, separate from user documents)
        alert_ref = StoreRef(DocumentStore(version_log(alert_df, "id", "ts")))
        scheduler = AlertScheduler(alert_ref, engine.transactors, now_fn=lambda: t_check)
        # before the due time nothing fires (future valid-time, J2)
        assert scheduler.tick(now=T0 + dt.timedelta(minutes=5)) == 0
        fired = scheduler.tick()  # at t_check: both alerts fire once
        out["alerts_fired"] = fired
        out["notifications"] = list(notifications)

        # 5. bitemporal audit: the batcher's full version trail
        hist = engine.user_db.history("app/batcher").select("event", "valid_from").collect()
        out["batcher_history"] = [(r.event, r.valid_from.isoformat()) for r in hist]
        return out
    finally:
        engine.stop()


if __name__ == "__main__":
    result = main()
    print(json.dumps(result, indent=2, default=str))
