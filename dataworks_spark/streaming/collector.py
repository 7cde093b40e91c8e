"""HTTP collector shim (SURVEY §2 A6, §3.2).

The reference's collectors are user-defined HTTP resources mounted at
runtime-registered paths; a request body becomes data written to the
document store (collector.clj:84-112, routing resource/user.clj:10-35,
demo doc/demo-app-1.org:87-129). BASELINE.json scopes the REST
control plane out of the engine, so this is the minimal data-plane
shim it prescribes: **accept POST bodies → append to an ingest spool →
a Structured Streaming file source consumes them** (the Kafka-ingest
topology A1 with a directory standing in for the topic).

Paths are runtime-registerable (the atomic-routes analog): registering
a collector creates a sub-spool; unknown paths 404. Each accepted body
is one JSON file named by a monotonic sequence — the file source
provides the same at-least-once→exactly-once upgrade as the Kafka
source (checkpointed file tracking).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class CollectorServer:
    """Thin ingest server: POST /<collector>/... → spool file."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._routes: dict[str, str] = {}  # path prefix → sub-spool
        # resume the sequence past any prior run's spool files: a fresh
        # server starting at 0 would os.rename OVER file 000...001.json
        # (destroying the old doc) while a checkpointed file source —
        # which never re-reads a seen path — skips the new one: both
        # docs silently lost (r10 review)
        self._seq = self._max_existing_seq(spool_dir)
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                name = self.path.strip("/").split("/")[0]
                with outer._lock:
                    sub = outer._routes.get(name)
                if sub is None:
                    self.send_response(404)
                    self.end_headers()
                    self.wfile.write(b'{"error":"no such collector"}')
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                try:
                    doc = json.loads(body) if body else {}
                except json.JSONDecodeError:
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(b'{"error":"invalid json"}')
                    return
                path = outer._append(sub, doc)
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"status": "accepted", "spool": path}).encode())

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @staticmethod
    def _max_existing_seq(spool_dir: str) -> int:
        """Highest NNNN.json sequence already spooled under any
        collector sub-directory (one level deep, matching _append's
        layout); 0 for a fresh spool."""
        hi = 0
        try:
            for sub in os.listdir(spool_dir):
                subp = os.path.join(spool_dir, sub)
                if not os.path.isdir(subp):
                    continue
                for fn in os.listdir(subp):
                    if fn.endswith(".json") and not fn.startswith("."):
                        stem = fn[: -len(".json")]
                        if stem.isdigit():
                            hi = max(hi, int(stem))
        except OSError:
            pass
        return hi

    # -- control plane (collector.clj:98-112 atomic-routes swap) -------
    def register(self, name: str) -> str:
        """Hot-add a collector path (the reference mounts yada resources
        at runtime; here: create its spool)."""
        sub = os.path.join(self.spool_dir, name)
        os.makedirs(sub, exist_ok=True)
        with self._lock:
            self._routes[name] = sub
        return sub

    def unregister(self, name: str) -> None:
        with self._lock:
            self._routes.pop(name, None)

    def activation_snapshot(self, name: str):
        """The route entry a failed trial activation must restore
        (engine.create_function rollback), captured under the same lock
        the HTTP handler thread reads routes through."""
        with self._lock:
            return self._routes.get(name)

    def activation_restore(self, name: str, snap) -> None:
        with self._lock:
            if snap is None:
                self._routes.pop(name, None)
            else:
                self._routes[name] = snap

    def _append(self, sub: str, doc: dict) -> str:
        with self._lock:
            self._seq += 1
            seq = self._seq
        tmp = os.path.join(sub, f".{seq:012d}.json.tmp")
        final = os.path.join(sub, f"{seq:012d}.json")
        with open(tmp, "w") as f:
            f.write(json.dumps(doc) + "\n")
        os.rename(tmp, final)  # atomic publish so the file source never
        # sees a half-written body
        return final

    def start(self) -> "CollectorServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- data plane ------------------------------------------------------
    def stream(self, spark: SparkSession, name: str, schema: StructType | str) -> DataFrame:
        """The collector's ingest stream (feed it to a StreamGraph
        source or a DocStoreSink)."""
        sub = os.path.join(self.spool_dir, name)
        return spark.readStream.schema(schema).json(sub)
