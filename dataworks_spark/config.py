"""Engine configuration source (SURVEY §2 A7).

The reference slurps ``config.edn`` for Kafka brokers, ports, and
secrets (utils/kafka.clj:15-24; example-config.edn:1-27). Here config
is a JSON or EDN file merged over defaults; ``spark.*`` keys are
applied to the session builder/conf, the rest (kafka brokers, collector
port, spool dirs) feed the runtime components."""

from __future__ import annotations

import json
import os
from typing import Any

DEFAULTS: dict[str, Any] = {
    "kafka.brokers": "localhost:9092",
    "collector.port": 0,  # 0 = ephemeral
    "collector.spool": "/tmp/dataworks_spool",
    "control.log": "/tmp/dataworks_control.log",
    "spark.sql.shuffle.partitions": None,  # None = cpu count
    "alert.poll.ms": 1000,  # utils/alert.clj:36
    # token-signing secret (auth.clj reads it from config; None means
    # mint an ephemeral per-process secret — dev-friendly, never shared)
    "auth.secret": None,
}


def load_config(path: str | None = None) -> dict[str, Any]:
    """Merge a config file (JSON, or EDN via the safe parser) over
    DEFAULTS. Missing file → defaults (the reference requires the file;
    we degrade gracefully for dev)."""
    cfg = dict(DEFAULTS)
    if path and os.path.exists(path):
        with open(path) as f:
            text = f.read()
        if path.endswith(".edn"):
            from dataworks_spark.functions.edn import parse_edn

            raw = parse_edn(text)
            # EDN keyword keys ':a/b' → 'a.b'
            parsed = {
                (k[1:].replace("/", ".") if isinstance(k, str) and k.startswith(":") else k): v
                for k, v in raw.items()
            }
        else:
            parsed = json.loads(text)
        cfg.update(parsed)
    return cfg


def apply_spark_conf(cfg: dict[str, Any], spark) -> None:
    """Apply runtime-settable spark.* keys. STATIC confs (e.g.
    spark.driver.memory — fixed once the JVM exists) cannot be set on a
    live session; they are skipped with a warning instead of killing
    engine boot (r10 review: one static key in config.json crashed
    init with CANNOT_MODIFY_CONFIG). Static keys belong in the
    spark-submit / session-builder layer, which owns JVM sizing."""
    import logging

    for k, v in cfg.items():
        if k.startswith("spark.") and v is not None:
            try:
                spark.conf.set(k, str(v))
            except Exception as exc:  # noqa: BLE001 — static/immutable conf
                logging.getLogger(__name__).warning(
                    "config key %s is not runtime-settable (%s); set it at "
                    "session build / spark-submit time",
                    k,
                    type(exc).__name__,
                )
