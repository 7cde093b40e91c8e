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
    #: audit-log cap — the log records WHAT fired (name, arg summary),
    #: never the row payloads, and is bounded so a long-lived streaming
    #: query cannot leak driver memory through it (r10 review: the
    #: previous unbounded list pinned every collected row batch forever)
    LOG_MAX = 10_000

    def __init__(self, max_workers: int = 4):
        self._fns: dict[str, Callable] = {}
        self._lock = threading.RLock()
        self._pool = ThreadPoolExecutor(max_workers=max_workers, thread_name_prefix="transactor")
        from collections import deque

        self.log: deque = deque(maxlen=self.LOG_MAX)  # fired effects (tests/audit)

    def register(self, name: str, fn: Callable) -> None:
        with self._lock:
            self._fns[name] = fn  # hot-swap: latest wins

    def _claim(self, name: str, args: tuple) -> Callable:
        """Shared lookup+audit step for every delivery path: resolve
        the fn and append the audit entry under ONE lock acquisition.
        The audit entry summarizes bulk args (row batches) to a count —
        pinning every delivered row in the log is the driver leak the
        LOG_MAX cap exists to prevent. One definition (r11 review: the
        sink's serial drain had copy-pasted this block, so a format or
        threshold change would silently diverge the two audit paths)."""
        with self._lock:
            fn = self._fns[name]
            logged = tuple(
                f"<{len(a)} rows>" if isinstance(a, (list, tuple)) and len(a) > 100 else a
                for a in args
            )
            self.log.append((name, logged))
            return fn

    def transact(self, name: str, *args) -> Future:
        """Fire-and-forget async call — `(transact! :name args)`
        (transactors.clj:18-19: `(go (apply f args))`)."""
        fn = self._claim(name, args)
        return self._pool.submit(fn, *args)

    def foreach_batch_sink(self, name: str, chunk_rows: int = 10_000):
        """Adapter: a foreachBatch fn that feeds each micro-batch's rows
        to the named transactor (K4 — the streaming attachment point).

        EVERY row is delivered: the batch streams to the driver through
        ``toLocalIterator`` (one partition in memory at a time) and the
        transactor fires once per ``chunk_rows`` chunk. The previous
        ``limit(N).collect()`` silently DROPPED every row beyond N —
        an arbitrary, unordered N at that — while the epoch still
        committed, losing those effects permanently (r10 review).
        Driver memory stays bounded by the chunk, not the batch.

        Delivery contract (r10 ADVICE — the first chunked version fired
        chunks into the shared pool CONCURRENTLY, silently breaking
        transactors written against the old one-ordered-call-per-epoch
        shape): chunks of one epoch run SERIALLY, in row order, on a
        single pool task; the sink returns only after the last chunk's
        effect completes, so an effect error fails the epoch and Spark
        replays it (at-least-once — effects must be idempotent or keyed
        by ``epoch_id``). A bounded handoff queue backpressures the
        iterator instead of buffering the batch."""

        def sink(batch_df, epoch_id: int) -> None:
            import queue

            chunks: queue.Queue = queue.Queue(maxsize=4)

            def drain() -> None:
                while True:
                    chunk = chunks.get()
                    if chunk is None:
                        return
                    fn = self._claim(name, (chunk, epoch_id))
                    fn(chunk, epoch_id)

            fut = self._pool.submit(drain)

            def put(item) -> bool:
                # a dead consumer (effect raised) stops get()ing; a
                # plain put on the full bounded queue would then hang
                # the epoch forever — poll the future instead and let
                # fut.result() surface the effect's error
                while not fut.done():
                    try:
                        chunks.put(item, timeout=0.1)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                chunk: list = []
                for row in batch_df.toLocalIterator():
                    chunk.append(row)
                    if len(chunk) >= chunk_rows:
                        if not put(chunk):
                            break
                        chunk = []
                else:
                    if chunk:
                        put(chunk)
            finally:
                put(None)
            fut.result()  # effect error → batch error → epoch replay

        return sink
