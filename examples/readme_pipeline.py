"""The reference ReadMe's stream-processing pipeline, end-to-end.

`/root/reference/ReadMe.org:38-63` wires three stored-function streams —
take from topic "input", apply ``(comp (map :value) (map inc))`` behind
a buffer of 5, publish to topic "output" — then HOT-SWAPS the processor
to ``dec``: "All the messages from before you changed the stream
processor will be incremented, but all the ones after you made the
change will be decremented."

This example runs that pipeline on the Spark rebuild with every I-family
surface in ONE flow:

  1. ``kafka-input`` — a streaming source (file-backed topic twin: the
     sandbox has no broker; ``streaming/kafka.py`` provides the real
     reader with identical downstream semantics), admission-capped via
     ``admission_options`` — the reference's *fixed* int buffer (I2,
     backpressure without loss).
  2. ``process`` — deployed as a stored-function stream through
     Engine.create_function (§3.1 validate → persist → broadcast →
     activate over the control bus, I7) with the ReadMe's ``inc`` step,
     PLUS a ``{"sliding-buffer": 5}`` lossy buffer (I2: keep the newest
     5 per app per microbatch) and a dead-letter quarantine (I5:
     malformed rows — null value — divert instead of poisoning the
     query).
  3. ``output`` — the sink topic twin (parquet append per microbatch
     through the graph's foreachBatch path, the only legal place for a
     row_number shed on a stream).
  4. The ReadMe's hot-swap: republish the ``process`` doc with ``dec``
     on the same control bus; the restarted query resumes from the
     checkpoint — rows ingested before the swap were incremented, rows
     after are decremented (old-before/new-after, ReadMe.org:64).

Run: python examples/readme_pipeline.py   (~40 s)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_spark.engine import Engine  # noqa: E402
from dataworks_spark.registry.validation import Invalid  # noqa: E402
from dataworks_spark.streaming.buffering import admission_options  # noqa: E402

SCHEMA = "app string, ts int, value int"


def _stream_doc(expr: str) -> dict:
    """The ReadMe's def-stream :stream/process doc, declaratively —
    ``expr`` is the transducer body ('value + 1' == (map inc))."""
    return {
        "name": "process",
        "upstreams": ["kafka-input"],
        "steps": [{"op": "map", "cols": {"value": expr}}],
        "buffer": {"sliding-buffer": 5},
        "buffer_key": ["app"],
        "buffer_ts": "ts",
        # dead-letter handler (I5) as a DECLARATIVE doc field — rows
        # matching the predicate divert to dead_letter('process');
        # deployable and replayable over the control bus like the rest
        # of the spec (r10: this previously required poking graph
        # private state after deployment)
        "quarantine": "value IS NULL",
    }


def main(workdir: str | None = None, spark=None) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="readme_pipeline_")
    in_dir = os.path.join(workdir, "topic_input")
    out_dir = os.path.join(workdir, "topic_output")
    dl_dir = os.path.join(workdir, "dead_letter")
    os.makedirs(in_dir, exist_ok=True)
    engine = Engine(config={"control.log": os.path.join(workdir, "bus.log")}, spark=spark)
    spark = engine.spark
    g = engine.graph
    out: dict = {}
    try:
        # ── 1. def-stream :kafka/input (admission-capped source) ─────
        caps = admission_options(1, "file")  # fixed-buffer analog

        def input_stream():
            reader = spark.readStream.schema(SCHEMA)
            for k, v in caps.items():
                reader = reader.option(k, v)
            return reader.parquet(in_dir)

        g.add_source("kafka-input", input_stream)

        # ── 2. def-stream :stream/process (inc) over the control bus ─
        ok = engine.create_function("stream", _stream_doc("value + 1"))
        assert not isinstance(ok, Invalid), ok

        # ── 3. :kafka/output — per-microbatch sink + DLQ ─────────────
        def to_output(df, _epoch):
            df.write.mode("append").parquet(out_dir)
            dl = g.dead_letter("process")
            if dl is not None and not dl.isEmpty():
                dl.write.mode("append").parquet(dl_dir)

        # messages before the swap: app "a" sends 7 (sliding buffer
        # keeps the newest 5), app "b" sends 2, plus one malformed row
        rows = [("a", t, 100 + t) for t in range(1, 8)]
        rows += [("b", 1, 200), ("b", 2, 201), ("bad", 99, None)]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

        ck = os.path.join(workdir, "ck")
        q = g.start_foreach_batch("process", to_output, checkpoint=ck)
        q.processAllAvailable()
        q.stop()

        # ── 4. the ReadMe hot-swap: inc → dec ─────────────────────────
        ok = engine.create_function("stream", _stream_doc("value - 1"))
        assert not isinstance(ok, Invalid), ok
        # messages after the swap
        spark.createDataFrame([("a", 10, 300), ("b", 10, 400)], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(in_dir)
        q = g.start_foreach_batch("process", to_output, checkpoint=ck)
        q.processAllAvailable()
        q.stop()

        res = spark.read.parquet(out_dir)
        out["pre_swap"] = sorted(
            (r.app, r.ts, r.value) for r in res.filter(F.col("ts") < 10).collect()
        )
        out["post_swap"] = sorted(
            (r.app, r.ts, r.value) for r in res.filter(F.col("ts") >= 10).collect()
        )
        out["dead_letters"] = sorted(
            (r.app, r.ts) for r in spark.read.parquet(dl_dir).collect()
        )
        return out
    finally:
        engine.stop()


if __name__ == "__main__":
    print(json.dumps(main(), indent=2, default=str))
