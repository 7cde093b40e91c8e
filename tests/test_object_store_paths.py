"""Non-local (object-store-shaped) filesystem paths through a REAL
in-process Hadoop FS double (r11 VERDICT #6): three r10/r11 fixes route
through the Hadoop FileSystem API specifically for hdfs://-s3a://
correctness, but until now every test ran on bare local paths, so the
non-local branches never executed.

The double is Hadoop's own ViewFileSystem: a ``viewfs://cluster/``
mount table linking to ``file:///`` — a genuinely non-``file:`` scheme
(``"://" in path`` and not ``file:``), resolved through the same
``Path.getFileSystem(hadoopConf)`` machinery s3a/hdfs use, backed by
local disk so no service is needed. Spark's parquet reader/writer and
the code under test all traverse it as they would a remote store.

(The fourth remote branch — session._ts_is_nanos' schema-inference
probe — is covered by tests/test_session_probe.py with a duck-typed
session, since its remote branch is about ANALYSIS behavior, not FS
calls.)
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def viewfs(spark, tmp_path):
    """Mount viewfs://<unique>/data onto tmp_path and yield the remote
    root. The mount-table name must be unique per test: Hadoop's
    FileSystem CACHE keys on (scheme, authority), so reusing one
    cluster name would pin every later test to the FIRST test's mount
    link."""
    hc = spark._jsc.hadoopConfiguration()
    local = str(tmp_path / "store")
    os.makedirs(local, exist_ok=True)
    cluster = f"c{abs(hash(str(tmp_path))) % 10**9}"
    hc.set(f"fs.viewfs.mounttable.{cluster}.link./data", f"file://{local}")
    return f"viewfs://{cluster}/data"


def test_rollup_fs_probe_and_epoch_ledger_on_viewfs(spark, viewfs):
    """streaming/rollup.py _fs/_exists/update: the r10 fix replaced
    os.path probes (which read every remote table as absent and
    silently OVERWROTE stored partials) with Hadoop FS calls — here
    they run against a non-file scheme end-to-end: merge across
    updates, epoch-replay skip, marker pruning path."""
    from dataworks_spark.streaming.rollup import ContinuousRollup

    t0 = dt.datetime(2024, 3, 1, 0, 10, 0)
    schema = "event_id long, ts timestamp, user_id long, value double"
    b1 = spark.createDataFrame([(1, t0, 1, 10.0), (2, t0, 2, 2.0)], schema)
    b2 = spark.createDataFrame([(3, t0, 1, 5.0)], schema)
    roll = ContinuousRollup(
        spark, f"{viewfs}/roll", ts_col="ts", bucket="1 hour",
        keys=("user_id",),
        aggs={"n": ("count", None), "sum_v": ("sum", "value")},
    )
    assert roll.read() is None  # _exists over viewfs: absent, not error
    roll.update(b1, epoch_id=0)
    roll.update(b1, epoch_id=0)  # replayed epoch: marker on viewfs skips it
    roll.update(b2, epoch_id=1)
    got = {r.user_id: (r.n, r.sum_v) for r in roll.read().collect()}
    assert got == {1: (2, 15.0), 2: (1, 2.0)}
    # the ledger lives under the remote path
    fs, p, jvm = roll._fs()
    marker = jvm.org.apache.hadoop.fs.Path(f"{viewfs}/roll/_epochs/1")
    assert fs.exists(marker)


def test_graph_microbatch_sink_on_viewfs(spark, viewfs, tmp_path):
    """streaming/graph.py _write_batch: epoch markers and dead-letter
    appends target ``<path>/_epochs`` / ``<path>/_dead_letter`` of the
    SINK path — at scale an object store. The whole per-microbatch
    protocol (clean append + quarantine split + applied-epoch marker)
    must work when that path is non-local."""
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
            buffer=validate_buffer(
                {"sliding-buffer": 3}, key_cols=["key"], ts_col="ts"
            ),
        )
    )
    out = f"{viewfs}/out"
    q = g.start("shed", sink_format="parquet", checkpoint=str(tmp_path / "ck"), path=out)
    q.processAllAvailable()
    q.stop()

    clean = spark.read.parquet(out)
    assert clean.filter(F.col("value") >= 5.0).count() == 0
    assert clean.count() == 6  # newest 3 per key, minus the quarantined ts=5
    dl = spark.read.parquet(f"{out}/_dead_letter/shed")
    assert sorted((r.key, r.ts) for r in dl.collect()) == [("a", 5), ("b", 5)]
    # epoch marker written through the viewfs FS object
    p = spark._jvm.org.apache.hadoop.fs.Path(f"{out}/_epochs")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    assert fs.exists(p) and len(list(fs.listStatus(p))) >= 1


def test_load_table_reads_viewfs_parquet(spark, viewfs):
    """session.load_table on a non-local sf_dir: the events ts
    normalization must go through the REMOTE probe branch (pyarrow
    can't open viewfs://) and still produce session-UTC timestamps."""
    import shutil

    from dataworks_spark.session import load_table
    from tests.conftest import SF_DIR

    # copy the events fixture under the mount's local backing dir
    hc = spark._jsc.hadoopConfiguration()
    cluster = viewfs.split("//")[1].split("/")[0]
    local = hc.get(f"fs.viewfs.mounttable.{cluster}.link./data")[len("file://"):]
    src = os.path.join(SF_DIR, "events.parquet")
    dst = os.path.join(local, "events.parquet")
    if not os.path.exists(dst):
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)

    ev = load_table(spark, viewfs, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() > 0


def test_table_meta_and_fingerprint_on_viewfs(spark, viewfs, tmp_path):
    """r15: the durable fingerprint stamp (session.write/verify_table_meta)
    and the fingerprint fold itself run through the Hadoop FS API — on a
    non-local scheme the stamp round-trips (atomic create+rename), the
    stamp file is invisible to the fingerprint it records, and a tamper
    planted THROUGH the local backing store is detected on the remote
    scheme."""
    import pytest as _pytest

    from dataworks_spark.session import (
        table_fingerprint,
        verify_table_meta,
        write_table_meta,
    )

    remote = f"{viewfs}/t.parquet"
    spark.range(10).write.mode("overwrite").parquet(remote)
    before = table_fingerprint(spark, remote)
    fp = write_table_meta(spark, remote, extra={"writer": "viewfs-test"})
    assert fp == before == table_fingerprint(spark, remote)
    assert verify_table_meta(spark, remote)["writer"] == "viewfs-test"

    # plant a foreign file via the LOCAL backing dir; detect via viewfs
    local = tmp_path / "store" / "t.parquet"
    (local / "part-evil.parquet").write_bytes(b"PAR1")
    with _pytest.raises(RuntimeError, match="outside the engine"):
        verify_table_meta(spark, remote)
