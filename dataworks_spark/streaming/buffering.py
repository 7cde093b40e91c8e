"""Lossy buffering policies (SURVEY §2 I2) — the honest Spark
rendering of the reference's core.async channel buffers.

Reference (`stream.clj:83-95`): a stream node's channel may carry a
fixed int buffer (block when full — pure backpressure), a
``sliding-buffer`` (drop the OLDEST item when full) or a
``dropping-buffer`` (drop the NEWEST — i.e. refuse new items while
full).

Spark's execution model has no mid-pipeline drop point: Structured
Streaming backpressure is ADMISSION control (the source hands the
trigger at most ``maxOffsetsPerTrigger`` records; nothing is lost,
consumption just lags), and everything admitted flows through the
whole graph. So the lossy semantics are rendered where Spark actually
has the choice point — the admission boundary — as explicit, opt-in
operators over each (micro)batch:

- :func:`sliding_buffer` — keep the NEWEST ``capacity`` rows per key
  (oldest dropped), exactly a core.async sliding-buffer's surviving
  contents after the batch has poured through it.
- :func:`dropping_buffer` — keep the OLDEST ``capacity`` rows per key
  (newest dropped), the dropping-buffer's surviving contents.
- :func:`admission_options` — the non-lossy fixed-buffer analog:
  per-trigger source caps (backpressure without loss).

SEMANTIC DIFFERENCE, stated plainly: a channel buffer drops relative
to CONSUMPTION timing (how full the buffer happens to be when the
producer fires); these operators drop relative to the batch/window
contents, which is deterministic and replayable. That determinism is
the point — a retried Spark task must produce the same drop set, or
exactly-once sinks would diverge. Callers who want the reference's
wall-clock flavor key the buffer by a time window (``window_col``), so
"capacity per key per window" bounds state exactly like a channel
bounds memory. Used from batch code directly, or per microbatch via
``foreachBatch``/``transform`` in a stream graph node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shed(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    capacity: int,
) -> DataFrame:
    if capacity < 0:
        raise ValueError(f"capacity must be ≥ 0: {capacity}")
    if capacity == 0:
        return df.limit(0)
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= capacity)
        .drop("__rn")
    )


def sliding_buffer(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    capacity: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep the NEWEST ``capacity`` rows per key — the sliding-buffer
    policy (oldest items displaced), `stream.clj:89`. ``tiebreak``
    names a column that makes the order total when timestamps tie
    (defaults to the timestamp alone; pass an id column for full
    determinism on tie-heavy data)."""
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    return _shed(df, key_cols, order, capacity)


def dropping_buffer(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    capacity: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep the OLDEST ``capacity`` rows per key — the dropping-buffer
    policy (new items refused while full), `stream.clj:90`."""
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return _shed(df, key_cols, order, capacity)


def admission_options(max_records_per_trigger: int, source: str = "kafka") -> dict:
    """The FIXED (non-lossy) buffer analog: cap what the source admits
    per trigger so consumption lags instead of dropping — Spark's
    native backpressure, matching the reference's plain int buffer
    (block-when-full). Returns reader options for the named source
    kind (`kafka` → maxOffsetsPerTrigger; `file` → maxFilesPerTrigger;
    `rate` → rowsPerSecond)."""
    if max_records_per_trigger <= 0:
        raise ValueError(f"cap must be positive: {max_records_per_trigger}")
    key = {
        "kafka": "maxOffsetsPerTrigger",
        "file": "maxFilesPerTrigger",
        "rate": "rowsPerSecond",
    }.get(source)
    if key is None:
        raise ValueError(f"unknown source kind: {source}")
    return {key: str(max_records_per_trigger)}
