"""Transactor registry — named side-effecting callables (SURVEY §2 K4).

Reference: `(transact! :name args…)` looks the fn up in an atom and
fires it asynchronously in a go block, fire-and-forget
(src/dataworks/transactors.clj:15-19, transactor.clj:23-31); the demo
app's transactor calls Twilio (doc/demo-app-1.org:301-320).

Spark rule: side effects NEVER live in column expressions — they run
per micro-batch in ``foreachBatch`` (exactly-once per epoch when the
effect is idempotent/keyed by epoch_id) or driver-side via
:meth:`transact`. Effects receive plain Python rows, keeping arbitrary
I/O (HTTP, alerts) out of executor hot loops.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from concurrent.futures import Future, ThreadPoolExecutor


class TransactorRegistry:
    def __init__(self, max_workers: int = 4):
        self._fns: dict[str, Callable] = {}
        self._lock = threading.RLock()
        self._pool = ThreadPoolExecutor(max_workers=max_workers, thread_name_prefix="transactor")
        self.log: list[tuple[str, tuple]] = []  # fired effects (for tests/audit)

    def register(self, name: str, fn: Callable) -> None:
        with self._lock:
            self._fns[name] = fn  # hot-swap: latest wins

    def transact(self, name: str, *args) -> Future:
        """Fire-and-forget async call — `(transact! :name args)`
        (transactors.clj:18-19: `(go (apply f args))`)."""
        with self._lock:
            fn = self._fns[name]
            self.log.append((name, args))
        return self._pool.submit(fn, *args)

    def foreach_batch_sink(self, name: str, collect_limit: int = 10_000):
        """Adapter: a foreachBatch fn that feeds each micro-batch's rows
        to the named transactor (K4 — the streaming attachment point).
        The limit guards against accidentally shipping a huge batch to
        a driver-side side effect."""

        def sink(batch_df, epoch_id: int) -> None:
            rows = batch_df.limit(collect_limit).collect()
            if rows:
                self.transact(name, rows, epoch_id)

        return sink
