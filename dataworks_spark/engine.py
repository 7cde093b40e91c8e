"""Engine facade — the system map (reference core.clj:5-30 boots
app-db, user-db, the two HTTP servers, and the stream graph; the
`create!`/`update!` lifecycle is §3.1).

One object wires every layer: SparkSession, the two document stores
(app/user — db/app_db.clj:19-26, db/user_db.clj:18-26), the stream
graph, the transformer/transactor registries, the alert scheduler, the
control bus, and (optionally) the HTTP collector server.

:meth:`create_function` re-expresses the reference's stored-function
deployment pipeline (§3.1 steps 3-7): validation chain (`->?`) →
activate in the local registry/graph → publish the declarative spec on
the control topic so every other driver applies the same change. The
stored-function document is a plain dict; code arrives as declarative
op-specs / expression strings, never as evaluated source.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dataworks_spark.config import DEFAULTS, apply_spark_conf, load_config
from dataworks_spark.docs.store import DocumentStore, StoreRef
from dataworks_spark.registry.alerts import AlertScheduler
from dataworks_spark.registry.transactors import TransactorRegistry
from dataworks_spark.registry.transformers import TransformerRegistry
from dataworks_spark.registry.validation import (
    Invalid,
    blank_field,
    missing_field,
    parseable_steps,
    thread_checks,
    valid_name,
    validate_buffer,
)
from dataworks_spark.session import get_spark
from dataworks_spark.streaming.control import ControlListener, FileControlBus, FunctionChanged
from dataworks_spark.streaming.graph import Node, StreamGraph
from dataworks_spark.streaming.transforms import OpChain

_EMPTY_DOCS_SCHEMA = (
    "id string, payload string, valid_from timestamp, valid_to timestamp, "
    "tx_from timestamp, tx_to timestamp, deleted boolean"
)


class Engine:
    """The running system (core.clj system map analog)."""

    def __init__(self, config: dict[str, Any] | str | None = None, spark: SparkSession | None = None):
        cfg = load_config(config) if isinstance(config, (str, type(None))) else {**DEFAULTS, **config}
        self.config = cfg
        self.spark = spark or get_spark("dataworks_engine")
        apply_spark_conf(cfg, self.spark)

        empty = self.spark.createDataFrame([], _EMPTY_DOCS_SCHEMA)
        self.app_db = DocumentStore(empty)  # stored-function metadata
        # user documents: one shared ref — streaming sinks and the alert
        # scheduler see the same evolving store state
        self.user_db_ref = StoreRef(DocumentStore(empty))
        self.graph = StreamGraph(self.spark)
        self.transformers = TransformerRegistry(self.spark)
        self.transactors = TransactorRegistry()
        self.alerts = AlertScheduler(self.user_db_ref, self.transactors, cfg["alert.poll.ms"])
        self.bus = FileControlBus(cfg["control.log"])
        self.listener = ControlListener(
            self.bus,
            {
                "stream": self._on_stream_change,
                "transformer": self._on_transformer_change,
                "collector": self._on_collector_change,
            },
        )
        self._collector = None
        #: every collector name seen via create_function OR control-log
        #: replay — the boot-time remount source alongside the app-db
        self._collector_names: set[str] = set()
        self._users = None

    # -- §3.1 create!/update! ------------------------------------------
    def create_function(self, function_type: str, doc: dict) -> dict | Invalid:
        """The stored-function deployment pipeline: validate → activate
        locally → persist (app-db) → propagate (control topic). Returns
        the accepted doc or the first validation failure (the `->?`
        short-circuit, §3.1 step 3). Activation runs FIRST so a doc
        that validates but fails to activate raises before anything is
        persisted or broadcast — no other driver ever sees it."""
        all_checks: dict[str, tuple] = {
            "stream": (
                missing_field("name", "steps", "upstreams"),
                blank_field("name"),
                valid_name(),
                parseable_steps(),
                validate_buffer(),
            ),
            "transformer": (
                missing_field("name", "kind", "expr"),
                blank_field("name"),
                valid_name(),
            ),
            "transactor": (missing_field("name"), valid_name()),
            # the reference's fourth stored-function type
            # (collector.clj:84-112): a runtime-mounted ingest endpoint
            "collector": (missing_field("name"), blank_field("name"), valid_name()),
        }
        checks = all_checks.get(function_type)
        if checks is None:
            # doc-or-Invalid is the documented contract; a typo'd type
            # from a user payload previously escaped as a bare KeyError
            # before any check ran (r10 review)
            return Invalid(
                "unknown-function-type",
                {"function_type": function_type, "known": sorted(all_checks)},
            )
        result = thread_checks(dict(doc), *checks)
        if isinstance(result, Invalid):
            return result

        # validate → ACTIVATE → persist → broadcast (r9 ADVICE fix: the
        # previous persist-publish-then-activate order left a doc in the
        # app-db and on the bus when local activation failed — other
        # drivers activated it while this one raised and, with its
        # listener offset already advanced, permanently skipped it).
        # Catch up on the log first so the trial activation sees the
        # same local state a replaying driver would.
        self.listener.poll()
        msg = FunctionChanged(function_type, result["name"], result)
        handler = self.listener.handlers.get(function_type)
        snapshot = self._activation_snapshot(function_type, result["name"])
        if handler is not None:
            # trial activation through the SAME handler the consume
            # path uses; a failure raises HERE, before any global side
            # effect — no app-db row, no bus message, nothing any other
            # driver could have seen. The snapshot is restored on THIS
            # failure path too (r11 review): _on_collector_change adds
            # the name to _collector_names BEFORE server registration
            # can raise, so an unrestored partial activation would
            # leave the same phantom route the persist-failure rollback
            # exists to prevent.
            try:
                handler(msg)
            except Exception:
                self._activation_restore(snapshot)
                raise

        # persist the function document (added-to-db?, db/app_db.clj:95-113)
        # as JSON — machine-parseable on reload, same encoding the bus
        # uses. If persist or broadcast FAILS, the trial activation is
        # ROLLED BACK to the pre-call snapshot before re-raising (r10
        # review): without that, this driver would silently keep running
        # a definition no other driver and no durable store ever saw —
        # fleet divergence with nothing recording the mismatch.
        prior_db = self.app_db
        try:
            fn_doc = self.spark.createDataFrame(
                [(f"{function_type}/{result['name']}", json.dumps(result, sort_keys=True))],
                "id string, payload string",
            )
            self.app_db = self.app_db.put(fn_doc)
            # broadcast (stream.clj:21-28 publish). Our own listener
            # will re-apply the message on its next poll — handlers are
            # replay-idempotent BY CONTRACT (a restarted listener
            # replays the whole log from offset 0), so the double-apply
            # is the same re-application every restart already
            # performs; a failure there is recorded in listener.errors
            # like any replay failure.
            self.bus.publish(msg)
        except Exception:
            self.app_db = prior_db
            self._activation_restore(snapshot)
            raise
        self.listener.poll()
        return result

    def _activation_snapshot(self, function_type: str, name: str):
        """The exact pre-activation local state a failed create_function
        must restore, captured BY THE OWNING REGISTRY under its own lock
        (r10 review: a hardcoded dict-entry restore bypassed the
        collector's route lock and missed the graph's swap epoch; each
        registry knows its own activation footprint). Direct entry
        restore is deliberate — replaying a prior SPEC through the
        handler would rebuild the object but lose its runtime state."""
        if function_type == "collector":
            # the collector activation footprint is TWO pieces: the
            # server's live route (when one is running) and the engine's
            # _collector_names set, which _on_collector_change always
            # appends to. The name-set must be snapshotted even with no
            # server — otherwise a failed persist leaves a phantom name
            # that start_collector later mounts as a route no other
            # driver or the durable store ever saw (r10 ADVICE).
            server_snap = (
                (self._collector, self._collector.activation_snapshot(name))
                if self._collector is not None
                else None
            )
            return ("collector", name, (name in self._collector_names, server_snap))
        target = {
            "stream": self.graph,
            "transformer": self.transformers,
        }.get(function_type)
        if target is None:
            return None
        return (target, name, target.activation_snapshot(name))

    def _activation_restore(self, snapshot) -> None:
        if snapshot is None:
            return
        target, name, snap = snapshot
        if target == "collector":
            was_present, server_snap = snap
            if not was_present:
                self._collector_names.discard(name)
            if server_snap is not None:
                server, srv_state = server_snap
                server.activation_restore(name, srv_state)
            return
        target.activation_restore(name, snap)

    def _on_collector_change(self, msg: FunctionChanged) -> None:
        """Hot-mount the collector's ingest route (the atomic-routes
        swap, collector.clj:98-112): a running collector server gets
        the path immediately; a server started later re-registers every
        collector function seen so far on boot. The name is ALWAYS
        recorded — a collector doc replayed from the control log while
        no server is running (fresh driver, in-memory app-db empty) was
        previously lost: the replay path never persisted it, so
        start_collector's app-db remount could not find it and the
        route 404'd forever (r10 review)."""
        self._collector_names.add(msg.name)
        if self._collector is not None:
            self._collector.register(msg.name)

    def _on_stream_change(self, msg: FunctionChanged) -> None:
        chain = OpChain.from_spec(msg.spec, registry=self.transformers)
        buffer = None
        if msg.spec.get("buffer") is not None:
            from dataworks_spark.streaming.graph import validate_buffer as _vb

            # already validated at create_function; re-parse here so a
            # doc replayed from the control bus activates identically
            buffer = _vb(
                msg.spec["buffer"],
                key_cols=msg.spec.get("buffer_key"),
                ts_col=msg.spec.get("buffer_ts", "ts"),
            )
        # declarative quarantine (I5): a SQL predicate string in the
        # doc — rows matching it divert to the node's dead letter. Part
        # of the spec so the feature is deployable/replayable over the
        # control bus (r10 review: it was only reachable by poking
        # graph._nodes private state); absent field = no quarantine,
        # the same republish-clears rule the buffer field follows.
        quarantine = None
        if msg.spec.get("quarantine") is not None:
            quarantine = F.expr(msg.spec["quarantine"])
        if msg.name in self.graph._nodes:
            self.graph.swap_node(
                msg.name, chain, buffer=buffer, quarantine=quarantine,
                upstreams=list(msg.spec.get("upstreams", [])),
            )
        else:
            self.graph.add_node(
                Node(
                    msg.name,
                    chain,
                    list(msg.spec.get("upstreams", [])),
                    quarantine=quarantine,
                    buffer=buffer,
                )
            )

    def _on_transformer_change(self, msg: FunctionChanged) -> None:
        """Declarative transformer = SQL-macro semantics: ``expr`` is a
        SQL expression string referencing its input columns *by name*
        (resolved by Catalyst against the applying DataFrame) — the
        no-eval replacement for the reference's quoted-fn transformers
        (transformer.clj:16-29)."""
        expr = msg.spec["expr"]

        def fn(*cols, _expr=expr):
            return F.expr(_expr)

        self.transformers.register_column(msg.name, fn)

    @property
    def user_db(self) -> DocumentStore:
        """Current user-document store state (shared with alerts and
        any attached streaming sink)."""
        return self.user_db_ref.store

    # -- convenience ------------------------------------------------------
    def register_transformer_column(self, name: str, fn) -> None:
        self.transformers.register_column(name, fn)

    def register_transactor(self, name: str, fn) -> None:
        self.transactors.register(name, fn)

    @property
    def users(self):
        """User registry / token auth (utils/auth.clj surface), lazily
        booted with the configured (or ephemeral) signing secret."""
        if self._users is None:
            import secrets

            from dataworks_spark.registry.auth import UserRegistry

            secret = self.config.get("auth.secret") or secrets.token_hex(32)
            self._users = UserRegistry(self.spark, secret=secret)
        return self._users

    def start_collector(self, spool_dir: str | None = None):
        from dataworks_spark.streaming.collector import CollectorServer

        self._collector = CollectorServer(
            spool_dir or self.config["collector.spool"], port=self.config["collector.port"]
        ).start()
        # mount every collector stored-function already in the app-db
        # (the reference rebuilds its routes from Crux on boot) PLUS
        # any seen only through control-log replay (r10 review: replay
        # does not persist to this driver's in-memory app-db)
        names = set(self._collector_names)
        for r in self.app_db.latest().filter(F.col("id").startswith("collector/")).collect():
            names.add(r.id.split("/", 1)[1])
        for name in sorted(names):
            self._collector.register(name)
        return self._collector

    def stop(self) -> None:
        self.graph.stop_all()
        if self._collector is not None:
            self._collector.stop()
