"""Incremental corpus ingest: streaming document arrival with
cross-batch exact dedup (the nightly/continuous half of the corpus
pipeline — `prepare_corpus` builds a corpus once; this keeps one
growing without re-admitting what it already holds).

Design: the dedup state is the corpus itself. Every batch anti-joins
its content hashes against the hash set DERIVED from the stored corpus
(16-byte xxhash64 rows — documents never shuffle), then appends only
novel rows. Because membership is re-derived from storage, there is no
dual-write inconsistency window: a crash between "append docs" and
"update hash table" can't exist when there is no separate hash table,
and at-least-once redelivery is ABSORBED rather than ledgered — a
redelivered document is already in the corpus, hashes equal, dropped.
(Contrast docs/sink.py, which needs an epoch ledger because its writes
are not idempotent by value.)

At 100 TB the derived hash set is still the scan of one slim column;
the standard accelerations — a compacted hash-only side table bucketed
by hash, or a bloom filter pushed into the anti-join — are caches of
this same derivation and can be rebuilt from the corpus at any time.
``hash_cache_path`` implements the first: an optional hash-only
parquet mirror appended per batch. The mirror re-introduces a bounded
dual-write window (corpus appended, mirror append not yet landed), so
ingest brackets it with a sync marker: a crash inside the window
leaves the marker, a marked mirror is BYPASSED (reads fall back to the
always-correct corpus derivation) and the next ingest rebuilds it from
the corpus — "rebuilt on any doubt" is enforced, not aspirational
(r10 review: a stale mirror silently re-admitted redelivered
duplicates).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataworks_spark.llm.dedup import exact_dedup_keepers, winnow_fingerprints


def non_overlapping_rows(
    batch: DataFrame,
    existing_fps: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 4,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Drop batch rows sharing ≥ ``min_shared`` winnowing fingerprints
    (see ``dedup.winnow_fingerprints``) with the existing corpus — the
    passage-level companion to :func:`novel_rows`' exact gate: a
    document that *quotes* a stored document wholesale is caught even
    though its content hash is new.

    ``existing_fps`` is a 1-column ``fp`` frame (distinct corpus
    fingerprints; None = empty corpus). The batch explodes to (id, fp)
    — batch-sized, not corpus-sized — and the inner join against the
    corpus fingerprint set counts DISTINCT shared fingerprints per
    batch doc; ≥ min_shared rejects. As with the hash gate, no
    broadcast hint: AQE sees a micro-batch probe side against a
    corpus-scale build side and picks the join strategy from runtime
    stats."""
    if existing_fps is None:
        return batch
    fps = batch.select(
        F.col(id_col), F.explode(winnow_fingerprints(F.col(text_col), shingle_n, window)).alias("fp")
    )
    overlapping = (
        fps.join(existing_fps.select("fp").dropDuplicates(), on="fp")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n_shared"))
        .filter(F.col("__n_shared") >= min_shared)
        .select(id_col)
    )
    return batch.join(overlapping, on=id_col, how="left_anti")


def novel_rows(
    batch: DataFrame,
    existing_hashes: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """In-batch exact dedup (min-id survivor) then anti-join against
    ``existing_hashes`` (a 1-column ``content_hash`` frame; None =
    empty corpus). Shuffles carry hashes, never document text."""
    keepers = exact_dedup_keepers(batch, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    kept = batch.join(keepers, on=id_col, how="left_semi")
    if existing_hashes is None:
        return kept
    # no broadcast hint: the batch side is small (one micro-batch) and
    # the hash side is the whole corpus — AQE picks the right strategy
    # from runtime stats; a driver-side guess at 100 TB could broadcast
    # a billion hashes
    return kept.join(
        existing_hashes,
        F.xxhash64(kept[text_col]) == existing_hashes["content_hash"],
        "left_anti",
    )


class IncrementalCorpus:
    """A parquet corpus directory with dedup-on-ingest.

    ``ingest(batch)`` appends only documents whose content hash is new
    (to the corpus and within the batch); returns the number appended.
    ``for_each_batch()`` adapts it to ``writeStream.foreachBatch``.
    Idempotent under redelivery BY VALUE (see module docstring), so no
    epoch ledger is needed."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        hash_cache_path: str | None = None,
        fp_cache_path: str | None = None,
        min_shared_fps: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.hash_cache_path = hash_cache_path
        #: passage-overlap gate: reject a batch doc sharing ≥ this many
        #: winnowing fingerprints with the corpus (None = exact-only).
        #: fp_cache_path mirrors the corpus fingerprint set the same
        #: way hash_cache_path mirrors hashes — a rebuildable cache,
        #: never a source of truth.
        self.fp_cache_path = fp_cache_path
        self.min_shared_fps = min_shared_fps

    def _exists(self, path: str) -> bool:
        # local-fs check mirrors the fixture environment; a cloud
        # deployment swaps in the Hadoop FS API via spark's jvm — kept
        # behind this one seam deliberately
        return os.path.exists(path) and any(
            n.endswith(".parquet") for n in os.listdir(path)
        )

    def read(self) -> DataFrame | None:
        if not self._exists(self.path):
            return None
        from dataworks_spark.session import verify_table_meta

        # fingerprint-gated (r15): refuse a corpus whose files changed
        # outside (or mid-) engine write; stampless legacy dirs load
        verify_table_meta(self.spark, self.path, what="incremental corpus")
        return self.spark.read.parquet(self.path)

    def _sync_marker(self, cache_path: str) -> str:
        return os.path.join(cache_path, "_pending_sync")

    def _cache_usable(self, cache_path: str | None) -> bool:
        """A mirror is served only when no ingest died between the
        corpus append and the mirror append: ingest leaves a sync
        marker across that window (r10 review — a crash there left the
        mirror missing the batch's hashes, and a redelivered batch
        sailed past the stale mirror straight into the corpus as
        duplicates, exactly the dual-write window the module docstring
        claims cannot exist). A marked mirror is bypassed (the corpus
        derivation is always correct) until :meth:`ingest` heals it."""
        return (
            bool(cache_path)
            and self._exists(cache_path)
            and not os.path.exists(self._sync_marker(cache_path))
        )

    def existing_hashes(self) -> DataFrame | None:
        """The corpus's content-hash set: served from the hash-cache
        mirror when configured, present and IN-SYNC, else derived from
        the corpus scan (always correct; the mirror is just cheaper)."""
        if self._cache_usable(self.hash_cache_path):
            return self.spark.read.parquet(self.hash_cache_path).dropDuplicates()
        cur = self.read()
        if cur is None:
            return None
        return cur.select(
            F.xxhash64(F.col(self.text_col)).alias("content_hash")
        ).dropDuplicates()

    def existing_fps(self) -> DataFrame | None:
        """The corpus's winnowing-fingerprint set: the mirror when
        present and in-sync, else derived from a corpus scan (correct
        but a full text pass — the mirror is the production path at
        scale)."""
        if self._cache_usable(self.fp_cache_path):
            return self.spark.read.parquet(self.fp_cache_path).dropDuplicates()
        cur = self.read()
        if cur is None:
            return None
        return (
            cur.select(
                F.explode(winnow_fingerprints(F.col(self.text_col))).alias("fp")
            ).dropDuplicates()
        )

    def _heal_caches(self) -> None:
        """Rebuild mirrors whose sync marker survived a crash — the
        mirror permanently lacks the crashed batch's entries, so only a
        full recompute from the corpus (the source of truth) makes it
        trustworthy again. Marker removal comes AFTER the rebuild."""
        stale = [
            p
            for p in (self.hash_cache_path, self.fp_cache_path)
            if p and os.path.exists(self._sync_marker(p))
        ]
        if stale:
            self.rebuild_hash_cache()  # overwrites BOTH mirrors
            for p in stale:
                try:
                    os.remove(self._sync_marker(p))
                except FileNotFoundError:
                    pass  # the overwrite wiped the directory

    def ingest(self, batch: DataFrame, epoch_id: int | None = None) -> int:
        self._heal_caches()
        fresh = novel_rows(batch, self.existing_hashes(), self.text_col, self.id_col)
        if self.min_shared_fps is not None:
            fresh = non_overlapping_rows(
                fresh,
                self.existing_fps(),
                self.text_col,
                self.id_col,
                min_shared=self.min_shared_fps,
            )
        fresh = fresh.localCheckpoint()  # stabilize: the append below must
        #                      not re-read the corpus it is appending to
        n = fresh.count()
        if n:
            # sync markers BEFORE the corpus append: a crash anywhere in
            # the corpus-append → mirror-append window leaves them in
            # place, and the mirrors are bypassed/rebuilt instead of
            # trusted stale
            markers = []
            for p in (self.hash_cache_path, self.fp_cache_path):
                if p:
                    os.makedirs(p, exist_ok=True)
                    m = self._sync_marker(p)
                    open(m, "w").close()
                    markers.append(m)
            fresh.write.mode("append").parquet(self.path)
            # stamp the corpus fingerprint right after the append (r15,
            # same contract as rollup/doc-store): a crash INSIDE the
            # append leaves partial part files that nothing else
            # detects (the sync markers guard only the mirrors) — the
            # next read() then refuses on fingerprint mismatch instead
            # of silently serving a torn corpus; out-of-band edits
            # refuse the same way
            from dataworks_spark.session import write_table_meta

            write_table_meta(
                self.spark, self.path, extra={"writer": "incremental_corpus"}
            )
            if self.hash_cache_path:
                fresh.select(
                    F.xxhash64(F.col(self.text_col)).alias("content_hash")
                ).write.mode("append").parquet(self.hash_cache_path)
            if self.fp_cache_path:
                # deduped within the batch only — a batch fp already in
                # the mirror appends a redundant row. Reads dedupe
                # (existing_fps), so this is growth slack, not a
                # correctness issue; rebuild_hash_cache() compacts.
                fresh.select(
                    F.explode(winnow_fingerprints(F.col(self.text_col))).alias("fp")
                ).dropDuplicates().write.mode("append").parquet(self.fp_cache_path)
            for m in markers:
                os.remove(m)
        return n

    def rebuild_hash_cache(self) -> None:
        """Recompute the mirrors from the corpus (the recovery path —
        a mirror is a cache, never a source of truth)."""
        cur = self.read()
        if cur is None:
            return
        if self.hash_cache_path:
            cur.select(
                F.xxhash64(F.col(self.text_col)).alias("content_hash")
            ).dropDuplicates().write.mode("overwrite").parquet(self.hash_cache_path)
        if self.fp_cache_path:
            cur.select(
                F.explode(winnow_fingerprints(F.col(self.text_col))).alias("fp")
            ).dropDuplicates().write.mode("overwrite").parquet(self.fp_cache_path)

    def for_each_batch(self):
        def _sink(df: DataFrame, epoch_id: int) -> None:
            self.ingest(df, epoch_id)

        return _sink
