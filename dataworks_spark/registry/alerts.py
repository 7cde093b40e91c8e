"""Alert scheduler (SURVEY §2 I9; reference src/dataworks/utils/alert.clj:9-51).

Reference loop: every 1000 ms, query app-db for alerts whose
`:alert/next-event` valid-time has arrived (future-dated puts become
visible when now >= vt, doc/demo-app-1.org:125-127), claim each via a
match-CAS put of `:alert/claim` (alert.clj:20-31, racing nodes lose the
match), fire the alert's transactor handler with its params, then
delete the alert doc (alert.clj:30-31).

Spark mapping: alerts are documents in a :class:`DocumentStore`; due =
as-of-now visibility; claim = match_put on the unclaimed state (same
optimistic-concurrency shape, distributed-safe because the match is a
semi-join against current versions); fire = TransactorRegistry.transact;
delete = store.delete. ``tick()`` is one poll — a control-plane
APScheduler/Trigger.ProcessingTime loop calls it every poll_ms.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import functions as F

from dataworks_spark.docs.store import DocumentStore, StoreRef
from dataworks_spark.registry.transactors import TransactorRegistry


class AlertScheduler:
    def __init__(
        self,
        store: DocumentStore | StoreRef,
        transactors: TransactorRegistry,
        poll_ms: int = 1000,  # reference timeout (alert.clj:36)
        now_fn=None,
    ):
        self.ref = store if isinstance(store, StoreRef) else StoreRef(store)
        self.transactors = transactors
        self.poll_ms = poll_ms
        self._now = now_fn or _dt.datetime.utcnow

    @property
    def store(self) -> DocumentStore:
        return self.ref.store

    def due_alerts(self, now: _dt.datetime | None = None):
        """Alerts visible as-of now and not yet claimed
        (alert.clj:9-18 query: [id :alert/timestamp] …)."""
        now = now or self._now()
        snap = self.store.as_of(now)
        return snap.filter(
            (F.col("doc_type") == "alert") & (F.col("claimed") == False)  # noqa: E712
        )

    def tick(self, now: _dt.datetime | None = None) -> int:
        """One scheduler poll: claim → fire → delete. Returns the number
        of alerts fired by THIS node (losers of the claim race fire 0 —
        the match-CAS guarantees at-most-once per alert cluster-wide)."""
        now = now or self._now()
        due = self.due_alerts(now)
        rows = due.select("id", "handler", "params").collect()
        if not rows:
            return 0

        # claim via match: precondition = currently unclaimed (J3;
        # alert.clj:20-31). Re-put the doc (with ALL its payload
        # columns — documents are schemaless) flipping claimed=True.
        ids = due.select("id").localCheckpoint()
        meta = {"valid_from", "valid_to", "tx_from", "tx_to", "deleted"}
        payload_cols = [c for c in due.columns if c not in meta]
        claim_docs = due.select(*payload_cols).withColumn("claimed", F.lit(True))
        expected = due.select("id").withColumn("claimed", F.lit(False))
        self.ref.swap(
            lambda s: s.match_put(claim_docs, expected, on_payload=["claimed"], valid_time=now)
        )

        fired = 0
        for r in rows:
            self.transactors.transact(r["handler"], r["params"])  # alert.clj:29
            fired += 1
        # delete fired alerts (alert.clj:30-31)
        self.ref.swap(lambda s: s.delete(ids, valid_time=now))
        return fired
