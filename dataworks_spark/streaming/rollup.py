"""Continuous time-bucket rollup — the hypertable/continuous-aggregate
pattern (TimescaleDB's public design): a materialized, bucketed
aggregate table maintained INCREMENTALLY as batches arrive, so readers
pay a scan over |buckets| pre-aggregated rows instead of re-aggregating
the raw stream.

Spark-first shape, mirroring `docs/store.compact_incremental`'s
partition discipline:

- the rollup table is parquet PARTITIONED BY bucket date — readers
  range-prune at the directory level;
- an update touches exactly the DATES present in the batch: stored
  partials for those dates are read back (pruned scan), merged with the
  batch's partials, and rewritten with dynamic partition overwrite —
  IO proportional to the delta's bucket span, never the table;
- only MERGEABLE aggregates are allowed (count/sum/min/max — the
  partial-aggregation algebra); avg is derived at read time from
  sum/count. That restriction is what makes merge-with-stored exact:
  merging partials is associative/commutative, so late and out-of-order
  rows land exactly where a full recompute would put them (property:
  incremental ≡ full recompute, tested).

At-least-once caveat: a REDELIVERED batch would double-count sums.
`update()` keeps an applied-epoch ledger (``<path>/_epochs/``) so a
foreachBatch epoch replayed after a crash-before-offset-commit is
skipped — foreachBatch is at-least-once, NOT exactly-once (r10 fix; an
epoch replay previously re-merged and double-counted). For non-epoch
sources compose with the dedup gates (`streaming/dedup.dedup_stream`
in the horizon, `llm/incremental` by value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: aggregate -> (partial expression builder, merge expression builder)
#: approx_distinct stores a DataSketches HLL sketch (binary) — the
#: mergeable form of COUNT DISTINCT (exact distinct is NOT mergeable
#: without keeping the value sets; the sketch is the scale trade) —
#: estimated at read time by :meth:`ContinuousRollup.read`.
_MERGEABLE = {
    "count": (
        lambda c: F.count(F.lit(1)),
        lambda col: F.sum(col),
    ),
    "sum": (lambda c: F.sum(c), lambda col: F.sum(col)),
    "min": (lambda c: F.min(c), lambda col: F.min(col)),
    "max": (lambda c: F.max(c), lambda col: F.max(col)),
    "approx_distinct": (
        lambda c: F.hll_sketch_agg(c),
        lambda col: F.hll_union_agg(col),
    ),
}


#: applied-epoch markers retained per ledger. Structured Streaming only
#: ever replays the LAST uncommitted epoch after a crash, so any bound
#: ≥2 preserves replay detection; 128 leaves generous slack for manual
#: re-runs while keeping the ledger O(1) — without pruning a
#: long-running query accumulates one marker dir per epoch forever,
#: which degrades listing-based object stores (r10 ADVICE).
EPOCH_LEDGER_KEEP = 128


def mark_epoch_applied(fs, marker, epoch_id: int, keep: int = EPOCH_LEDGER_KEEP):
    """Create the applied-epoch marker, then prune ledger entries older
    than ``epoch_id - keep``. The listing is over the bounded ledger dir
    (≤ keep+1 entries steady-state), not the data table."""
    fs.mkdirs(marker)
    ledger = marker.getParent()
    try:
        for st in fs.listStatus(ledger):
            name = st.getPath().getName()
            try:
                old = int(name)
            except ValueError:
                continue  # not an epoch marker — leave it
            if old < epoch_id - keep:
                fs.delete(st.getPath(), True)
    except Exception:
        # pruning is best-effort housekeeping: a racing reader/lister
        # failure must not fail the batch that already committed
        pass


class ContinuousRollup:
    """A materialized ``(bucket, keys…) → mergeable aggregates`` table.

    ``aggs`` maps output column → ("count"|"sum"|"min"|"max", in_col)
    (in_col ignored for count). ``update(batch)`` merges one batch;
    ``read()`` returns the current rollup; ``for_each_batch()`` adapts
    to ``writeStream.foreachBatch``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        ts_col: str = "ts",
        bucket: str = "1 hour",
        keys: tuple = (),
        aggs: dict | None = None,
    ):
        self.spark = spark
        self.path = path
        self.ts_col = ts_col
        self.bucket = bucket
        self.keys = tuple(keys)
        self.aggs = dict(aggs or {"n": ("count", None)})
        for name, (kind, _c) in self.aggs.items():
            if kind not in _MERGEABLE:
                raise ValueError(
                    f"{name}: {kind!r} is not a mergeable aggregate "
                    f"(allowed: {sorted(_MERGEABLE)}); derive ratios at read time"
                )

    # -- shared shapes ---------------------------------------------------
    def _bucketed(self, df: DataFrame) -> DataFrame:
        win = F.window(F.col(self.ts_col), self.bucket)
        return df.withColumn("bucket_start", win["start"]).withColumn(
            "bucket_date", F.to_date("bucket_start")
        )

    def _partials(self, df: DataFrame) -> DataFrame:
        exprs = [
            _MERGEABLE[kind][0](F.col(c) if c else None).alias(name)
            for name, (kind, c) in self.aggs.items()
        ]
        return (
            self._bucketed(df)
            .groupBy("bucket_date", "bucket_start", *self.keys)
            .agg(*exprs)
        )

    def _merge(self, parts: DataFrame) -> DataFrame:
        exprs = [
            _MERGEABLE[kind][1](F.col(name)).alias(name)
            for name, (kind, _c) in self.aggs.items()
        ]
        return parts.groupBy("bucket_date", "bucket_start", *self.keys).agg(*exprs)

    def _fs(self):
        """(hadoop_fs, table_path, jvm) for the table's scheme — the
        rollup path is s3a://, hdfs://, … at scale; os.path would read
        every non-local table as absent and update() would silently
        OVERWRITE stored partials instead of merging (r10 review)."""
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()), p, jvm

    def _exists(self) -> bool:
        fs, p, _ = self._fs()
        if not fs.exists(p):
            return False
        return any(
            not st.getPath().getName().startswith((".", "_"))
            for st in fs.listStatus(p)
        )

    def read(self, estimated: bool = True) -> DataFrame | None:
        """Current rollup. ``estimated=True`` (default) converts
        approx_distinct sketch columns to their bigint estimates;
        ``estimated=False`` returns the raw mergeable sketches (what a
        further downstream merge would consume).

        Read-back is FINGERPRINT-GATED (r15, extending the r14 ANN
        sidecar contract to durable streaming state): every ``update``
        stamps ``_dw_meta.json`` with the table's post-write data
        fingerprint; a reopen whose recomputed fingerprint disagrees
        refuses instead of merging over files mutated outside the
        engine (a dropped/foreign/edited part file would silently
        double-count or lose partials — the partial-merge algebra can't
        detect it). A missing stamp (pre-r15 table) is accepted. A
        crash BETWEEN the parquet write and the stamp also surfaces
        here as a mismatch — correct, because a torn dynamic-overwrite
        epoch is exactly the state that must not be merged over
        silently; recovery is re-running the writer (idempotent epochs)
        or re-baselining per the error text."""
        if not self._exists():
            return None
        from dataworks_spark.session import verify_table_meta

        verify_table_meta(self.spark, self.path, what="continuous rollup")
        df = self.spark.read.parquet(self.path)
        if estimated:
            for name, (kind, _c) in self.aggs.items():
                if kind == "approx_distinct":
                    df = df.withColumn(name, F.hll_sketch_estimate(F.col(name)))
        return df

    # -- the incremental update ------------------------------------------
    def update(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Merge one batch: stored partials for the batch's DATES are
        read back (partition-pruned scan bounded by the delta's bucket
        span), merged with the batch's partials, and the touched date
        partitions are rewritten atomically-per-partition with dynamic
        overwrite. Mergeability makes the result independent of how
        rows were split across updates.

        ``epoch_id`` (foreachBatch passes it) drives an APPLIED-EPOCH
        ledger under ``<path>/_epochs/`` (underscore-prefixed: invisible
        to the parquet reader): foreachBatch is AT-LEAST-ONCE — a crash
        between this write and Spark's offset-log commit replays the
        epoch, and re-merging already-merged partials double-counts
        (r10 review; the module previously claimed exactly-once). A
        replayed epoch whose marker exists is skipped. Residual window:
        a crash between the table write and the marker write re-merges
        that one epoch — closing it needs a transactional table format
        (Delta/Iceberg MERGE), which this image lacks. One writer per
        rollup path (epoch ids are per-query)."""
        fs = marker = None
        if epoch_id is not None:
            fs, _, jvm = self._fs()
            marker = jvm.org.apache.hadoop.fs.Path(
                f"{self.path}/_epochs/{epoch_id}"
            )
            if fs.exists(marker):
                return  # replayed epoch — already merged
        delta = self._partials(batch)
        stored = self.read(estimated=False)
        if stored is not None:
            dates = delta.select("bucket_date").dropDuplicates()
            relevant = stored.join(F.broadcast(dates), on="bucket_date", how="left_semi")
            delta = self._merge(relevant.unionByName(delta))
        # localCheckpoint: the overwrite below must not re-read the
        # partitions it is replacing mid-plan
        out = delta.localCheckpoint()
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_date")
            .parquet(self.path)
        )
        # stamp BEFORE the epoch marker: a crash after the data write
        # leaves either (no stamp update → read() flags the mismatch) or
        # (stamp but no marker → the replayed epoch re-merges over a
        # VERIFIED table and re-stamps). Both fail safe; neither serves
        # silently-corrupt partials.
        from dataworks_spark.session import write_table_meta

        write_table_meta(
            self.spark, self.path,
            extra={"writer": "continuous_rollup",
                   "epoch": epoch_id if epoch_id is not None else -1},
        )
        if marker is not None:
            mark_epoch_applied(fs, marker, epoch_id)

    def for_each_batch(self):
        def _sink(df: DataFrame, epoch_id: int) -> None:
            self.update(df, epoch_id)

        return _sink
