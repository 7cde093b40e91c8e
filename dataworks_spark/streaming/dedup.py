"""Bounded-state streaming dedup (the streaming twin of SURVEY §2 L1).

Two dedup regimes exist in this engine, and they deliberately split:

- `llm/incremental.IncrementalCorpus` — dedup against ALL history: the
  state is the corpus itself (re-derived, crash-consistent), right for
  the nightly/continuous corpus build where "have we ever admitted
  this document" is the question.
- this module — dedup within a WATERMARK horizon: Spark's
  `dropDuplicatesWithinWatermark` keys the state store by content hash
  and expires entries once the event-time watermark passes, so state
  is bounded by the horizon's arrival volume, not by history. Right
  for the hot path (a collector re-POSTing on retry, an at-least-once
  upstream replaying minutes of traffic) where duplicates cluster in
  time and unbounded state is the thing to avoid.

The content key is xxhash64 of the content column (16-byte state rows,
never document text — the same shuffle discipline as
`exact_dedup_keepers`); a 64-bit collision inside one horizon can only
over-drop, at ~|horizon rows|²/2⁶⁵.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    content_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-by-value within ``horizon``: rows whose content
    hash was already seen within the watermark horizon are dropped;
    state for a hash is freed once the watermark passes its first
    arrival + horizon. Emits the input columns unchanged.

    The watermark must be attached HERE (dropDuplicatesWithinWatermark
    requires one); callers composing further event-time ops downstream
    inherit it."""
    return (
        stream.withWatermark(ts_col, horizon)
        .withColumn("__content_hash", F.xxhash64(F.col(content_col)))
        .dropDuplicatesWithinWatermark(["__content_hash"])
        .drop("__content_hash")
    )
