"""Control-topic propagation of function changes (SURVEY §2 I7).

Reference: every node consumes ``dataworks.internal.functions`` with a
random-UUID group id (= broadcast to ALL nodes, app_graph.clj:21-51);
per-type filtered channels re-read the changed stored-function document
from the local replica and re-eval/re-register it (stream.clj:164-182,
transformer.clj:82-100, transactor.clj:103-121, collector.clj:158-179).

Spark rebuild: the bus is an append-only message log. In production it
is a Kafka topic (each driver consumes with a unique group id —
broadcast, exactly the reference's trick); in the test environment it
is a file-backed log with identical consume-from-offset semantics.
Each driver runs a :class:`ControlListener` that applies messages to
its local registries/graph — the message carries the *declarative spec*
(op-chain steps / transformer code id), never evaluated code, which is
what makes the hot-swap safe to broadcast.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class FunctionChanged:
    """The reference's control message {:crux.db/id id,
    :stored-function/type type} (stream.clj:21-28)."""

    function_type: str  # 'stream' | 'transformer' | 'transactor'
    name: str
    spec: dict  # declarative payload (op-chain spec, fn id, …)
    seq: int = -1

    def to_json(self) -> str:
        return json.dumps(
            {"type": self.function_type, "name": self.name, "spec": self.spec},
            sort_keys=True,
        )


class FileControlBus:
    """Append-only control log with broadcast consume semantics (every
    consumer reads every message from its own offset — the file stand-in
    for a Kafka topic consumed with a random-UUID group id)."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        open(path, "a").close()

    def publish(self, msg: FunctionChanged) -> int:
        """Returns the message's sequence number (log position). The
        offset is counted inside the same lock as the append so two
        concurrent publishers can never observe each other's line and
        report the same sequence number."""
        with self._lock:
            with open(self.path) as f:
                seq = sum(1 for _ in f)
            with open(self.path, "a") as f:
                f.write(msg.to_json() + "\n")
            return seq

    def read_from(self, offset: int) -> list[FunctionChanged]:
        with open(self.path) as f:
            lines = f.readlines()
        out = []
        for i, line in enumerate(lines[offset:], start=offset):
            d = json.loads(line)
            out.append(FunctionChanged(d["type"], d["name"], d["spec"], seq=i))
        return out


class ControlListener:
    """Per-driver consumer applying function changes to local state —
    the analog of the reference's per-type channels
    (app_graph.clj:30-46). ``handlers`` maps function_type → callable
    receiving the message; poll() is one consume step (drive it from a
    scheduler thread or call poll_loop in a daemon thread)."""

    def __init__(self, bus: FileControlBus, handlers: dict[str, Callable[[FunctionChanged], None]]):
        self.bus = bus
        self.handlers = handlers
        self.offset = 0  # offset=latest on subscribe would skip history;
        # we start at 0 so a restarted driver replays the full function
        # log (the reference re-reads docs from its Crux replica instead)
        self.applied: list[FunctionChanged] = []
        #: per-message handler failures (message, exception) — a
        #: malformed replayed doc must not kill the poll_loop daemon
        #: and silently halt ALL further control processing; it is
        #: logged, recorded here, and skipped
        self.errors: list[tuple[FunctionChanged, Exception]] = []

    def poll(self) -> int:
        msgs = self.bus.read_from(self.offset)
        for m in msgs:
            handler = self.handlers.get(m.function_type)
            if handler is not None:
                try:
                    handler(m)
                except Exception as exc:  # noqa: BLE001 — isolate per message
                    logging.getLogger(__name__).warning(
                        "control handler failed for %s/%s: %s",
                        m.function_type, m.name, exc,
                    )
                    self.errors.append((m, exc))
                    continue
                self.applied.append(m)
        if msgs:
            # advance past the HIGHEST seq actually seen, not by count:
            # a log with holes (e.g. a compacted Kafka control topic —
            # superseded function versions removed) would otherwise
            # re-deliver its last surviving record on every poll
            self.offset = max(
                max((m.seq for m in msgs), default=-1) + 1,
                self.offset + len(msgs),
            )
        return len(msgs)

    def poll_loop(self, stop: threading.Event, interval_s: float = 0.1) -> None:
        """100 ms poll cadence, matching the reference's consumer loop
        (utils/kafka.clj:108)."""
        while not stop.is_set():
            self.poll()
            time.sleep(interval_s)


class KafkaControlBus:
    """Kafka-backed control bus — the production transport for I7
    (app_graph.clj:21-51): publish FunctionChanged JSON to the control
    topic (the reference's ``dataworks.internal.functions``); every
    reader consumes the topic from an explicit offset with its own
    fresh group — Kafka's random-UUID-group broadcast trick, which is
    exactly :class:`FileControlBus.read_from`'s contract.

    Broker clients are INJECTED (the sandbox has no broker; the unit
    test drives a fake, kafka-python/confluent-kafka satisfy the duck
    types via thin adapters):

    - ``producer``: ``send(topic, value: bytes) -> int`` returning the
      record's offset (confluent's delivery callback or kafka-python's
      ``RecordMetadata.offset`` both surface it), plus ``flush()``.
    - ``consumer_factory``: ``(topic) -> iterable`` of records with
      ``.offset``/``.value`` attributes, reading from the beginning —
      one fresh consumer per read, never a shared group offset, so a
      read can never steal messages from another driver's listener.

    CONTRACT: the control topic must be SINGLE-PARTITION (create it
    with ``create_missing_topics(admin, {topic: {"partitions": 1}})``)
    — a control log needs a total order for replay to be meaningful,
    and per-partition Kafka offsets would collide across partitions in
    ``read_from``'s filter. Offsets may still have HOLES (compaction
    removing superseded function versions); :class:`ControlListener`
    tolerates that by advancing past the highest seq it has seen
    rather than counting messages.

    Interface-compatible with :class:`FileControlBus`, so
    :class:`ControlListener` works against either transport unchanged.
    """

    def __init__(self, topic: str, producer, consumer_factory):
        self.topic = topic
        self.producer = producer
        self.consumer_factory = consumer_factory

    def publish(self, msg: FunctionChanged) -> int:
        offset = self.producer.send(self.topic, msg.to_json().encode("utf-8"))
        self.producer.flush()
        return offset if offset is not None else -1

    def read_from(self, offset: int) -> list[FunctionChanged]:
        out = []
        for rec in self.consumer_factory(self.topic):
            if rec.offset < offset:
                continue
            d = json.loads(rec.value.decode("utf-8"))
            out.append(FunctionChanged(d["type"], d["name"], d["spec"], seq=rec.offset))
        return out
