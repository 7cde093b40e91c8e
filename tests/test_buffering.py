"""I2 lossy-buffer analogs: sliding (keep newest) / dropping (keep
oldest) per key, and the fixed-buffer admission caps. Batch semantics
are the microbatch semantics (applied per trigger via transform/
foreachBatch); a streaming smoke drives sliding_buffer inside
foreachBatch to prove the composition."""

import pytest
from pyspark.sql import functions as F

from dataworks_spark.streaming.buffering import (
    admission_options,
    dropping_buffer,
    sliding_buffer,
)


@pytest.fixture()
def batch(spark):
    rows = [(k, t, f"{k}-{t}") for k in ("a", "b") for t in range(1, 6)]
    return spark.createDataFrame(rows, "key string, ts int, payload string")


def test_sliding_keeps_newest_per_key(batch):
    out = sliding_buffer(batch, ["key"], "ts", capacity=2, tiebreak="payload")
    got = sorted((r.key, r.ts) for r in out.collect())
    assert got == [("a", 4), ("a", 5), ("b", 4), ("b", 5)]


def test_dropping_keeps_oldest_per_key(batch):
    out = dropping_buffer(batch, ["key"], "ts", capacity=2, tiebreak="payload")
    got = sorted((r.key, r.ts) for r in out.collect())
    assert got == [("a", 1), ("a", 2), ("b", 1), ("b", 2)]


def test_capacity_edge_cases(batch):
    assert sliding_buffer(batch, ["key"], "ts", 0).count() == 0
    assert sliding_buffer(batch, ["key"], "ts", 99).count() == batch.count()
    with pytest.raises(ValueError):
        dropping_buffer(batch, ["key"], "ts", -1)


def test_shed_is_deterministic_under_repartition(batch):
    a = sliding_buffer(batch.repartition(1), ["key"], "ts", 3, tiebreak="payload")
    b = sliding_buffer(batch.repartition(7), ["key"], "ts", 3, tiebreak="payload")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_admission_options_per_source():
    assert admission_options(500) == {"maxOffsetsPerTrigger": "500"}
    assert admission_options(3, "file") == {"maxFilesPerTrigger": "3"}
    assert admission_options(100, "rate") == {"rowsPerSecond": "100"}
    with pytest.raises(ValueError):
        admission_options(0)
    with pytest.raises(ValueError):
        admission_options(1, "socketz")


def test_sliding_buffer_in_foreachbatch_stream(spark, tmp_path):
    """Streaming composition: each microbatch sheds to capacity before
    the sink — the per-trigger rendering of a lossy channel. Bounded
    file source + availableNow so the stream drains deterministically
    (a rate source never drains under processAllAvailable)."""
    src_dir = str(tmp_path / "in")
    rows = [(k, t, f"{k}-{t}") for k in ("a", "b") for t in range(1, 8)]
    spark.createDataFrame(rows, "key string, ts int, payload string").write.parquet(src_dir)
    stream = (
        spark.readStream.schema("key string, ts int, payload string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    kept = []

    def sink(df, epoch_id):
        out = sliding_buffer(df, ["key"], "ts", capacity=3, tiebreak="payload")
        kept.append(out.groupBy("key").count().collect())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counted = [r for batch_rows in kept for r in batch_rows]
    assert counted, "stream produced no batches"
    assert all(r["count"] <= 3 for r in counted)


def test_node_buffer_spec_applies_in_graph(spark, batch):
    """The reference attaches the buffer to the stream-node spec
    (validate-buffer, stream.clj:83-95); a graph node declared with a
    sliding-buffer sheds its merged input before the op-chain."""
    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer

    g = StreamGraph(spark)
    g.add_source("src", lambda: batch)
    g.add_node(
        Node(
            "shed",
            upstreams=["src"],
            buffer=validate_buffer(
                {"sliding-buffer": 2}, key_cols=["key"], ts_col="ts", tiebreak="payload"
            ),
        )
    )
    got = sorted((r.key, r.ts) for r in g.build("shed").collect())
    assert got == [("a", 4), ("a", 5), ("b", 4), ("b", 5)]


def test_validate_buffer_reference_shapes():
    from dataworks_spark.streaming.graph import validate_buffer

    assert validate_buffer(8).policy == "fixed"
    s = validate_buffer({"sliding-buffer": 3}, key_cols=["k"], ts_col="t")
    assert (s.policy, s.capacity, s.key_cols) == ("sliding", 3, ("k",))
    assert validate_buffer({"dropping-buffer": 1}).policy == "dropping"
    import pytest as _pytest

    for bad in (0, -1, True, {"ring-buffer": 3}, {"sliding-buffer": "x"}, "big"):
        with _pytest.raises(ValueError):
            validate_buffer(bad)


def test_validate_buffer_rejects_zero_and_bool_lossy_caps():
    """ADVICE r8: {"sliding-buffer": 0} passed validation and then
    silently dropped every row; {"sliding-buffer": True} passed
    isinstance(cap, int). Both are :invalid-buffer now, mirroring the
    fixed-buffer cap >= 1 rule."""
    from dataworks_spark.streaming.graph import validate_buffer

    for bad in (
        {"sliding-buffer": 0},
        {"dropping-buffer": 0},
        {"sliding-buffer": True},
        {"dropping-buffer": False},
    ):
        with pytest.raises(ValueError):
            validate_buffer(bad)


def test_lossy_buffer_through_streamgraph_start(spark, tmp_path):
    """The feature's nominal streaming use: a graph node declaring a
    sliding buffer, started through StreamGraph.start() on a streaming
    source. r8 built the row_number shed into the streaming plan and
    threw AnalysisException at query start; the shed now runs per
    microbatch (source wrapped in foreachBatch, node rebuilt over each
    batch's static frame)."""
    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer
    from dataworks_spark.streaming.transforms import OpChain

    src_dir = str(tmp_path / "in")
    rows = [(k, t, f"{k}-{t}") for k in ("a", "b") for t in range(1, 8)]
    spark.createDataFrame(rows, "key string, ts int, payload string").write.parquet(src_dir)

    g = StreamGraph(spark)
    g.add_source(
        "src",
        lambda: spark.readStream.schema("key string, ts int, payload string").parquet(src_dir),
    )
    g.add_node(
        Node(
            "shed",
            chain=OpChain().map(tagged=F.concat(F.col("key"), F.lit("!"))),
            upstreams=["src"],
            buffer=validate_buffer(
                {"sliding-buffer": 3}, key_cols=["key"], ts_col="ts", tiebreak="payload"
            ),
        )
    )
    out_dir = str(tmp_path / "out")
    q = g.start(
        "shed",
        sink_format="parquet",
        checkpoint=str(tmp_path / "ckpt"),
        path=out_dir,
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    counts = {r["key"]: r["count"] for r in got.groupBy("key").count().collect()}
    # single batch (one parquet file) -> shed keeps newest 3 per key
    assert counts == {"a": 3, "b": 3}
    assert sorted(r.ts for r in got.filter(F.col("key") == "a").collect()) == [5, 6, 7]
    assert got.filter(~F.col("tagged").endswith("!")).count() == 0  # chain ran post-shed


def test_lossy_buffer_streaming_build_raises_clear_error(spark, tmp_path):
    """Direct build() of a lossy-buffered node over a streaming source
    must fail with a directed message, not a deep AnalysisException."""
    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer

    src_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [("a", 1, "p")], "key string, ts int, payload string"
    ).write.parquet(src_dir)
    g = StreamGraph(spark)
    g.add_source(
        "src",
        lambda: spark.readStream.schema("key string, ts int, payload string").parquet(src_dir),
    )
    g.add_node(
        Node(
            "shed",
            upstreams=["src"],
            buffer=validate_buffer({"dropping-buffer": 2}, key_cols=["key"], ts_col="ts"),
        )
    )
    with pytest.raises(ValueError, match="start_foreach_batch"):
        g.build("shed")


def test_lossy_buffer_start_foreach_batch_sheds(spark, tmp_path):
    """start_foreach_batch on a lossy node: fn sees the SHED rows."""
    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer

    src_dir = str(tmp_path / "in")
    rows = [(k, t, f"{k}-{t}") for k in ("a", "b") for t in range(1, 6)]
    spark.createDataFrame(rows, "key string, ts int, payload string").write.parquet(src_dir)
    g = StreamGraph(spark)
    g.add_source(
        "src",
        lambda: spark.readStream.schema("key string, ts int, payload string").parquet(src_dir),
    )
    g.add_node(
        Node(
            "shed",
            upstreams=["src"],
            buffer=validate_buffer(
                {"dropping-buffer": 2}, key_cols=["key"], ts_col="ts", tiebreak="payload"
            ),
        )
    )
    seen = []

    def fn(df, epoch):
        seen.extend((r.key, r.ts) for r in df.collect())

    q = g.start_foreach_batch("shed", fn, checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert sorted(seen) == [("a", 1), ("a", 2), ("b", 1), ("b", 2)]


def test_swap_node_buffer_sentinel(spark):
    """ADVICE r8: republishing a stream doc WITHOUT a buffer field must
    REMOVE a lossy buffer (explicit None), while an omitted kwarg
    preserves it — and quarantine follows the same sentinel rule."""
    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer
    from dataworks_spark.streaming.transforms import OpChain

    g = StreamGraph(spark)
    quar = F.col("ts") < 0
    spec = validate_buffer({"sliding-buffer": 2}, key_cols=["key"], ts_col="ts")
    g.add_node(Node("n", upstreams=["src"], quarantine=quar, buffer=spec))

    g.swap_node("n", OpChain())  # omitted -> both preserved
    assert g._nodes["n"].buffer is spec
    assert g._nodes["n"].quarantine is quar

    g.swap_node("n", OpChain(), buffer=None)  # explicit None -> removed
    assert g._nodes["n"].buffer is None
    assert g._nodes["n"].quarantine is quar  # still preserved

    g.swap_node("n", OpChain(), quarantine=None)
    assert g._nodes["n"].quarantine is None


def test_lossy_shed_is_per_microbatch(spark, tmp_path):
    """Capacity bounds each TRIGGER's admission (the channel bounds
    memory per poll, not per topic lifetime): two single-file
    microbatches each shed independently to capacity, so a key keeps
    up to capacity rows PER BATCH."""
    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    b1 = [("a", t, f"b1-{t}") for t in range(1, 5)]   # 4 rows for key a
    b2 = [("a", t, f"b2-{t}") for t in range(10, 13)]  # 3 rows for key a
    spark.createDataFrame(b1, "key string, ts int, payload string").coalesce(1).write.parquet(
        str(src_dir / "f1")
    )
    spark.createDataFrame(b2, "key string, ts int, payload string").coalesce(1).write.parquet(
        str(src_dir / "f2")
    )
    g = StreamGraph(spark)
    g.add_source(
        "src",
        lambda: spark.readStream.schema("key string, ts int, payload string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir) + "/*/"),
    )
    g.add_node(
        Node(
            "shed",
            upstreams=["src"],
            buffer=validate_buffer(
                {"sliding-buffer": 2}, key_cols=["key"], ts_col="ts", tiebreak="payload"
            ),
        )
    )
    per_batch = []

    def fn(df, epoch):
        per_batch.append(sorted(r.ts for r in df.collect()))

    q = g.start_foreach_batch("shed", fn, checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert len(per_batch) == 2
    # each batch independently kept its newest 2
    assert sorted(per_batch) == [[3, 4], [11, 12]]


def test_microbatch_query_keeps_topology_snapshot(spark, tmp_path):
    """Review r9: the per-microbatch path rebuilds the plan per batch —
    from the snapshot taken at start(), NOT the live registry, so a
    concurrent swap_node cannot change a running query's logic (or its
    output schema) mid-stream. Swaps apply at restart(), per the
    documented hot-swap contract. Extra sink options must also reach
    the batch writer (compression shows up in the file names)."""
    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer
    from dataworks_spark.streaming.transforms import OpChain

    src_dir = str(tmp_path / "in")
    rows = [("a", t, f"a-{t}") for t in range(1, 6)]
    spark.createDataFrame(rows, "key string, ts int, payload string").write.parquet(src_dir)
    g = StreamGraph(spark)
    g.add_source(
        "src",
        lambda: spark.readStream.schema("key string, ts int, payload string").parquet(src_dir),
    )
    spec = validate_buffer(
        {"sliding-buffer": 2}, key_cols=["key"], ts_col="ts", tiebreak="payload"
    )
    g.add_node(Node("shed", chain=OpChain().map(v=F.lit("old")), upstreams=["src"], buffer=spec))

    out_dir = str(tmp_path / "out")
    q = g.start(
        "shed", sink_format="parquet", checkpoint=str(tmp_path / "ck"),
        path=out_dir, compression="gzip",
    )
    # swap DURING the query's lifetime: the running query must keep 'old'
    g.swap_node("shed", OpChain().map(v=F.lit("new")))
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    assert {r.v for r in got.collect()} == {"old"}
    import glob as _glob

    assert _glob.glob(out_dir + "/*.gz.parquet"), "compression option not forwarded"
    # restart picks up the swap
    q2 = g.start(
        "shed", sink_format="parquet", checkpoint=str(tmp_path / "ck"),
        path=str(tmp_path / "out2"), query_name="shed2",
    )
    q2.processAllAvailable()
    q2.stop()
    # no new input files -> out2 may be empty; the contract is the
    # snapshot mechanics, covered by build-on-snapshot below
    snap_before = dict(g._nodes)
    g.swap_node("shed", OpChain().map(v=F.lit("newer")))
    batch = spark.createDataFrame(rows, "key string, ts int, payload string")
    out_snap = g.build("shed", source_overrides={"src": batch}, nodes=snap_before)
    assert {r.v for r in out_snap.collect()} == {"new"}  # snapshot logic, not 'newer'


def test_microbatch_start_persists_dead_letters_and_epoch_ledger(spark, tmp_path):
    """r10 review pair: per-microbatch start() (a) must PERSIST each
    batch's quarantine split — it was computed and silently discarded,
    so quarantined rows vanished with no sink (I5 contract); (b) leaves
    an applied-epoch marker so a replayed foreachBatch epoch cannot
    append duplicates."""
    import os

    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer
    from dataworks_spark.streaming.transforms import OpChain

    src_dir = str(tmp_path / "in")
    rows = [(k, t, float(t)) for k in ("a", "b") for t in range(1, 6)]
    spark.createDataFrame(rows, "key string, ts int, value double").write.parquet(src_dir)

    g = StreamGraph(spark)
    g.add_source(
        "src",
        lambda: spark.readStream.schema("key string, ts int, value double").parquet(src_dir),
    )
    g.add_node(
        Node(
            "shed",
            chain=OpChain(),
            upstreams=["src"],
            quarantine=F.col("value") >= 5.0,  # ts=5 rows → dead letter
            buffer=validate_buffer(
                {"sliding-buffer": 3}, key_cols=["key"], ts_col="ts"
            ),
        )
    )
    out_dir = str(tmp_path / "out")
    q = g.start("shed", sink_format="parquet", checkpoint=str(tmp_path / "ck"), path=out_dir)
    q.processAllAvailable()
    q.stop()

    clean = spark.read.parquet(out_dir)
    assert clean.filter(F.col("value") >= 5.0).count() == 0
    dl = spark.read.parquet(os.path.join(out_dir, "_dead_letter", "shed"))
    assert sorted((r.key, r.ts) for r in dl.collect()) == [("a", 5), ("b", 5)]
    # the epoch ledger exists (one marker per processed batch)
    assert os.listdir(os.path.join(out_dir, "_epochs"))


def test_collector_seq_resumes_after_restart(tmp_path):
    """r10 review: a restarted CollectorServer reset _seq to 0 and
    os.rename'd OVER the prior run's spool files — the old doc was
    destroyed and a checkpointed file source (which never re-reads a
    seen path) skipped the new one."""
    import json
    import os

    from dataworks_spark.streaming.collector import CollectorServer

    spool = str(tmp_path / "spool")
    s1 = CollectorServer(spool)
    sub = s1.register("logs")
    p1 = s1._append(sub, {"doc": 1})
    p2 = s1._append(sub, {"doc": 2})
    assert os.path.basename(p2) > os.path.basename(p1)

    s2 = CollectorServer(spool)  # restart on the same spool
    sub2 = s2.register("logs")
    p3 = s2._append(sub2, {"doc": 3})
    names = sorted(os.listdir(sub2))
    assert len(names) == 3 and os.path.basename(p3) == names[-1]
    # the first run's docs are intact
    assert json.load(open(p1))["doc"] == 1


def test_microbatch_dead_letters_scoped_to_query_closure(spark, tmp_path):
    """r10 ADVICE: _write_batch persisted the quarantine split of EVERY
    quarantined node in the topology snapshot, read from the shared
    mutable _dead_letters dict — a quarantined node outside this query's
    upstream closure (or a stale split another query's build() left in
    the cache) got re-appended under this query's path every epoch."""
    import os

    from dataworks_spark.streaming.graph import Node, StreamGraph, validate_buffer
    from dataworks_spark.streaming.transforms import OpChain

    src_dir = str(tmp_path / "in")
    rows = [(k, t, float(t)) for k in ("a", "b") for t in range(1, 6)]
    spark.createDataFrame(rows, "key string, ts int, value double").write.parquet(src_dir)

    g = StreamGraph(spark)
    g.add_source(
        "src",
        lambda: spark.readStream.schema("key string, ts int, value double").parquet(src_dir),
    )
    g.add_node(
        Node(
            "shed",
            chain=OpChain(),
            upstreams=["src"],
            quarantine=F.col("value") >= 5.0,
            buffer=validate_buffer({"sliding-buffer": 3}, key_cols=["key"], ts_col="ts"),
        )
    )
    # a second quarantined node NOT upstream of "shed" — and poison the
    # shared cache the way a concurrent query's build() would
    batch_src = str(tmp_path / "other_in")
    spark.createDataFrame(rows, "key string, ts int, value double").write.parquet(batch_src)
    g.add_source("other_src", lambda: spark.read.parquet(batch_src))
    g.add_node(
        Node("other", chain=OpChain(), upstreams=["other_src"], quarantine=F.col("value") < 2.0)
    )
    g.build("other")  # populates the shared _dead_letters["other"] cache

    out_dir = str(tmp_path / "out")
    q = g.start("shed", sink_format="parquet", checkpoint=str(tmp_path / "ck"), path=out_dir)
    q.processAllAvailable()
    q.stop()

    dl_root = os.path.join(out_dir, "_dead_letter")
    assert os.path.isdir(os.path.join(dl_root, "shed"))
    assert not os.path.exists(os.path.join(dl_root, "other")), (
        "out-of-closure quarantine split leaked into this query's dead-letter path"
    )


def test_epoch_ledger_markers_are_pruned(spark, tmp_path):
    """r10 ADVICE: applied-epoch marker dirs grew unboundedly (one per
    epoch, never pruned) — millions of small FS entries on a
    listing-based object store. Markers older than the retention
    horizon are deleted once the new marker lands."""
    import os

    from dataworks_spark.streaming.rollup import mark_epoch_applied

    base = str(tmp_path / "table")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for epoch in range(0, 140):
        marker = jvm.org.apache.hadoop.fs.Path(f"{base}/_epochs/{epoch}")
        fs = marker.getFileSystem(hconf)
        mark_epoch_applied(fs, marker, epoch, keep=16)
    left = sorted(int(n) for n in os.listdir(os.path.join(base, "_epochs")))
    assert left[-1] == 139 and left[0] >= 139 - 16 - 1
    assert len(left) <= 18  # bounded, not one-per-epoch
