"""Smoke test for examples/monitoring_app.py — the reference's demo
application (doc/demo-app-1.org) end-to-end on this engine: REST
collector → streaming ingest → bitemporal store → stored-function
stream → watchdog alert, with the silent app (and only it) notified."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_monitoring_demo_app(spark, tmp_path):
    from monitoring_app import main

    out = main(workdir=str(tmp_path), spark=spark)
    assert out["statuses"] == {"app/frontend": "ok", "app/batcher": "up"}
    assert out["alerts_fired"] == 2  # both watchdogs ran exactly once
    assert len(out["notifications"]) == 1  # only the silent app alerts
    assert "batcher" in out["notifications"][0]
    assert [e for e, _ in out["batcher_history"]] == ["started"]
