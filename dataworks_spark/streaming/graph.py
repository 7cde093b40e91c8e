"""Stream graph: named nodes + edges + fan-out + hot-swap (SURVEY §2 I).

Reference model (src/dataworks/streams.clj:15-19,
utils/stream.clj:11-17,45-53,86-102): a `nodes` map (name → channel
node with optional transducer), an `edges` vector of
[upstream downstream] pairs, wiring by tapping the upstream's `mult`
(fan-out without copy) into each downstream's input, and cluster-wide
hot-swap of a node's transducer by re-publishing its stored-function
document (stream.clj:117-152, app_graph.clj:21-51) with
old-before/new-after message semantics (ReadMe.org:64).

Spark mapping:
  node           = a named OpChain (+ optional windowed aggregation)
  edge           = DataFrame composition: downstream's input is the
                   union of its upstreams' outputs
  fan-out (I3)   = multiple downstreams referencing one node's output
                   (one source, N independent sinks — in streaming each
                   sink is its own query over the shared lineage)
  error node(I5) = per-node quarantine predicate routing bad rows to a
                   dead-letter sink instead of killing the query
  hot-swap (I1/I7) = swap the node's OpChain in the registry, stop the
                   affected queries at a batch boundary, restart from
                   checkpoint — exactly the documented
                   old-before/new-after boundary
  delivery (I6)  = checkpointed source offsets + idempotent/
                   transactional sinks = exactly-once within Spark, a
                   strict upgrade over the reference's at-least-once
                   auto-commit (utils/kafka.clj:84-85).

Batch/stream duality: `build(name, inputs)` composes pure DataFrame
transforms, so the same graph runs on static DataFrames (oracle tests)
and on readStream sources (runtime).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataworks_spark.streaming.transforms import OpChain

#: distinguishes 'argument not specified' (keep the node's current
#: value) from an explicit None (remove it) in :meth:`StreamGraph.swap_node`
_UNSET = object()


@dataclass(frozen=True)
class BufferSpec:
    """Validated node buffer (I2, reference validate-buffer
    stream.clj:83-95): ``fixed`` = plain int buffer → pure
    backpressure, rendered as source admission caps
    (:func:`dataworks_spark.streaming.buffering.admission_options`) —
    never a data drop; ``sliding``/``dropping`` = lossy policies
    rendered as deterministic per-key sheds on the node's INPUT
    (the reference buffers the channel before the transducer)."""

    policy: str  # 'fixed' | 'sliding' | 'dropping'
    capacity: int
    key_cols: tuple = ()
    ts_col: str = "ts"
    tiebreak: str | None = None


def validate_buffer(
    buffer, key_cols: list[str] | None = None, ts_col: str = "ts", tiebreak: str | None = None
) -> BufferSpec:
    """The validate-buffer analog (stream.clj:83-95): a plain int is a
    fixed buffer; ``{"sliding-buffer": n}`` / ``{"dropping-buffer": n}``
    (the reference's spec shape) select the lossy policies. Anything
    else is the reference's ``:invalid-buffer`` failure — a ValueError
    here."""
    if isinstance(buffer, BufferSpec):
        return buffer
    if isinstance(buffer, bool):
        raise ValueError(f"invalid buffer: {buffer!r}")
    if isinstance(buffer, int):
        if buffer <= 0:
            raise ValueError(f"invalid buffer: {buffer!r}")
        return BufferSpec("fixed", buffer)
    if isinstance(buffer, dict) and len(buffer) == 1:
        kind, cap = next(iter(buffer.items()))
        policy = {"sliding-buffer": "sliding", "dropping-buffer": "dropping"}.get(kind)
        # cap >= 1, mirroring the fixed-buffer check: a zero-capacity
        # lossy buffer would pass validation and then silently drop
        # every row; bools sneak through isinstance(cap, int)
        if policy is not None and isinstance(cap, int) and not isinstance(cap, bool) and cap >= 1:
            # a bare string key is ONE column, not its characters —
            # tuple('user_id') silently became per-character key_cols
            # ('u','s',...), passing validation and crashing the shed's
            # Window.partitionBy at stream start (r10 review); any
            # other non-iterable raises the same ValueError the rest of
            # this validator speaks
            if isinstance(key_cols, str):
                key_cols = [key_cols]
            try:
                keys = tuple(key_cols or ())
            except TypeError:
                raise ValueError(f"invalid buffer_key: {key_cols!r}") from None
            if not all(isinstance(k, str) and k for k in keys):
                raise ValueError(f"invalid buffer_key: {key_cols!r}")
            return BufferSpec(policy, cap, keys, ts_col, tiebreak)
    raise ValueError(f"invalid buffer: {buffer!r}")


@dataclass
class Node:
    """A stream node (reference stream.clj:117-133 stored-function doc).

    ``quarantine`` is the error-handler analog (I5): rows matching it
    are diverted to the node's dead-letter output instead of flowing
    downstream (the reference attaches an exception handler fn to the
    channel, stream.clj:50-57 — with declarative chains, failures are
    data-dependent and expressible as a predicate).

    ``buffer`` is the I2 channel-buffer analog (a :class:`BufferSpec`
    or anything :func:`validate_buffer` accepts): sliding/dropping
    sheds apply to the node's merged input before the op-chain, per
    (micro)batch; a fixed buffer is admission-time only and leaves the
    data path untouched.
    """

    name: str
    chain: OpChain = field(default_factory=OpChain)
    upstreams: list[str] = field(default_factory=list)
    quarantine: object | None = None  # Column predicate → dead-letter
    buffer: object | None = None  # BufferSpec | int | {"sliding-buffer": n} | ...


class StreamGraph:
    """Registry of nodes + edges with hot-swap (SURVEY §3.3)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._nodes: dict[str, Node] = {}
        self._sources: dict[str, Callable[[], DataFrame]] = {}
        self._queries: dict[str, object] = {}  # name → StreamingQuery
        self._dead_letters: dict[str, DataFrame] = {}
        self._lock = threading.RLock()
        self._epoch = 0  # bumped on every swap (control-topic analog)

    # -- topology (stream.clj:117-152 create/update) -------------------
    def add_source(self, name: str, df_factory: Callable[[], DataFrame]) -> None:
        """A source node: kafka readStream, rate, file, or a static
        DataFrame factory for batch twins (A1/A8)."""
        with self._lock:
            self._sources[name] = df_factory

    def add_node(self, node: Node) -> None:
        with self._lock:
            self._nodes[node.name] = node

    def swap_node(
        self, name: str, chain: OpChain, quarantine=_UNSET, buffer=_UNSET, upstreams=_UNSET
    ) -> int:
        """Hot-swap a node's logic (I1/I7). Running queries over this
        node must be restarted (see :meth:`restart`) — messages
        processed before the restart batch boundary used the old chain,
        after it the new one (ReadMe.org:64 semantics). Returns the new
        epoch (the control-topic sequence number analog,
        app_graph.clj:21-51).

        ``quarantine``/``buffer``/``upstreams`` omitted → the node's
        existing value is PRESERVED; pass a value (``None`` for the
        first two) explicitly to REPLACE it — a stream doc republished
        without a buffer field must be able to clear the buffer, and a
        doc republished with DIFFERENT upstreams must rewire the
        topology (not silently keep reading the old sources while the
        persisted document claims the new ones).

        Caveat: if the new chain changes the node's *output schema*,
        restart against a fresh sink path (or a schema-evolving sink) —
        appending a different schema to one parquet directory leaves
        mixed footers that confuse later reads."""
        with self._lock:
            old = self._nodes[name]
            self._nodes[name] = Node(
                name, chain,
                old.upstreams if upstreams is _UNSET else list(upstreams),
                old.quarantine if quarantine is _UNSET else quarantine,
                old.buffer if buffer is _UNSET else buffer,
            )
            self._epoch += 1
            return self._epoch

    def activation_snapshot(self, name: str):
        """Everything a failed stored-function trial activation must
        undo for this node (engine.create_function rollback): the live
        Node entry — or its absence — plus the swap epoch (swap_node
        bumps it). Captured under the graph lock."""
        with self._lock:
            return (self._nodes.get(name), self._epoch)

    def activation_restore(self, name: str, snap) -> None:
        node, epoch = snap
        with self._lock:
            if node is None:
                self._nodes.pop(name, None)
            else:
                self._nodes[name] = node
            self._epoch = epoch

    def downstream_subgraph(self, name: str) -> set[str]:
        """Nodes reachable from ``name`` (reference query-graph walk,
        utils/stream.clj:26-43) — the set whose queries a swap must
        restart. Walks a SNAPSHOT taken under the lock: iterating the
        live dict raced a concurrent add_node (RuntimeError mid-swap —
        r10 review; this is the one method whose caller IS the hot-swap
        path)."""
        with self._lock:
            nodes = list(self._nodes.values())
        out: set[str] = set()
        frontier = {name}
        while frontier:
            nxt = {
                n.name
                for n in nodes
                if any(u in frontier for u in n.upstreams)
            } - out
            out |= frontier
            frontier = nxt
        return out

    # -- plan building (batch + streaming twins) ------------------------
    def build(
        self,
        name: str,
        _visiting: frozenset = frozenset(),
        source_overrides: dict[str, DataFrame] | None = None,
        nodes: dict[str, Node] | None = None,
        dead_letters_out: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        """Compose the DataFrame for a node's output: union of upstream
        outputs → quarantine split → op-chain. Pure; works on both
        static and streaming inputs.

        ``source_overrides`` substitutes named sources with given
        DataFrames — the per-microbatch execution hook: lossy-buffered
        streaming nodes are rebuilt per batch with the source replaced
        by that batch's static frame (see :meth:`start`).

        ``nodes`` builds against a topology SNAPSHOT instead of the
        live registry — the per-microbatch paths pass the snapshot
        taken at start() so a concurrent swap_node cannot change a
        running query's logic mid-stream (the hot-swap contract:
        swaps take effect at restart(), a batch boundary).

        ``dead_letters_out`` collects THIS invocation's quarantine
        splits (node name → split frame), scoped to exactly the nodes
        evaluated for ``name`` over exactly these inputs. Per-batch
        callers (``start``'s foreachBatch) persist from this dict —
        the shared ``self._dead_letters`` cache is a convenience view
        for interactive ``dead_letter()`` reads and is overwritten by
        every build() of any query, so persisting from it can capture
        stale splits from other queries' batches (r10 ADVICE).
        """
        if name in _visiting:
            raise ValueError(f"cycle through node {name}")
        if source_overrides and name in source_overrides:
            return source_overrides[name]
        with self._lock:
            node_map = nodes if nodes is not None else self._nodes
            if name in self._sources and name not in node_map:
                return self._sources[name]()
            node = node_map[name]
        ups = [
            self.build(u, _visiting | {name}, source_overrides, nodes, dead_letters_out)
            for u in (node.upstreams or [])
        ]
        if not ups:
            raise ValueError(f"node {name} has no upstreams")
        df = ups[0]
        for other in ups[1:]:
            df = df.unionByName(other)  # tap/mult merge (I3)
        if node.quarantine is not None:
            split = df.filter(node.quarantine)
            self._dead_letters[name] = split
            if dead_letters_out is not None:
                dead_letters_out[name] = split
            df = df.filter(~node.quarantine)
        if node.buffer is not None:
            spec = validate_buffer(node.buffer)
            if spec.policy in ("sliding", "dropping"):
                if df.isStreaming:
                    # row_number().over(Window) / limit() are illegal on
                    # a streaming frame — the shed is a per-microbatch
                    # operator. start()/start_foreach_batch() route
                    # lossy nodes through foreachBatch automatically;
                    # reaching here means a caller built the streaming
                    # plan directly.
                    raise ValueError(
                        f"node {name!r} declares a lossy ({spec.policy}) buffer, "
                        "which cannot run inside a streaming plan — start it via "
                        "StreamGraph.start()/start_foreach_batch() (per-microbatch "
                        "shed), or build() on batch inputs"
                    )
                from dataworks_spark.streaming.buffering import (
                    dropping_buffer,
                    sliding_buffer,
                )

                shed = sliding_buffer if spec.policy == "sliding" else dropping_buffer
                df = shed(
                    df, list(spec.key_cols), spec.ts_col, spec.capacity, spec.tiebreak
                )
            # 'fixed' is admission-time (source caps) — no data-path op
        return node.chain(df)

    def _has_lossy_buffer(self, name: str, _visiting: frozenset = frozenset()) -> bool:
        """True if ``name`` or any node upstream of it declares a
        sliding/dropping buffer (those need per-microbatch execution
        on streaming inputs). Runs before build(), so it carries its
        own cycle guard (raising like build() rather than recursing
        forever)."""
        if name in _visiting:
            raise ValueError(f"cycle through node {name}")
        with self._lock:
            node = self._nodes.get(name)
            if node is None:
                return False
            if node.buffer is not None:
                if validate_buffer(node.buffer).policy in ("sliding", "dropping"):
                    return True
            return any(
                self._has_lossy_buffer(u, _visiting | {name})
                for u in (node.upstreams or [])
            )

    def _subtree_sources(self, name: str, _visiting: frozenset = frozenset()) -> list[str]:
        """Source names feeding ``name``'s subtree (dependency order
        not significant)."""
        if name in _visiting:
            raise ValueError(f"cycle through node {name}")
        with self._lock:
            if name in self._sources and name not in self._nodes:
                return [name]
            node = self._nodes[name]
        out: list[str] = []
        for u in node.upstreams or []:
            for s in self._subtree_sources(u, _visiting | {name}):
                if s not in out:
                    out.append(s)
        return out

    def _microbatch_plan(self, name: str):
        """For a lossy-buffered node over a streaming source: return
        ``(source_name, streaming_df)`` so the caller can foreachBatch
        the source and rebuild the node per batch, or ``None`` when the
        normal streaming plan works (batch source / no lossy buffer)."""
        if not self._has_lossy_buffer(name):
            return None
        srcs = self._subtree_sources(name)
        streaming = [
            (s, df) for s in srcs if (df := self._sources[s]()).isStreaming
        ]
        if not streaming:
            return None  # batch inputs: build() applies the shed inline
        if len(streaming) > 1 or len(srcs) > 1:
            raise ValueError(
                f"node {name!r} has a lossy buffer over multiple sources "
                f"({srcs}); per-microbatch shedding supports a single "
                "source — merge upstream or shed per input node"
            )
        return streaming[0]

    def dead_letter(self, name: str) -> DataFrame | None:
        """The node's dead-letter stream (I5) — route to a DLQ sink."""
        return self._dead_letters.get(name)

    # -- execution -------------------------------------------------------
    def start(
        self,
        name: str,
        sink_format: str = "memory",
        output_mode: str = "append",
        checkpoint: str | None = None,
        query_name: str | None = None,
        **sink_options,
    ):
        """Start a streaming query materializing node ``name`` (one
        query per sink = reference fan-out where each tap is an
        independent consumer, I3).

        A node whose subtree declares a lossy (sliding/dropping) buffer
        runs PER MICROBATCH: the source stream is wrapped in
        foreachBatch and the node's plan — shed included — is rebuilt
        over each batch's static frame (the only place Spark allows a
        row_number shed). File-path sinks only in that mode ('memory'
        has no batch writer — use :meth:`start_foreach_batch`)."""
        mb = self._microbatch_plan(name)
        if mb is not None:
            src_name, src_df = mb
            if output_mode != "append":
                raise ValueError(
                    f"lossy-buffered node {name!r} runs per microbatch: each "
                    "batch's shed output is APPENDED; complete/update modes "
                    "don't apply (aggregate downstream of the sink instead)"
                )
            if sink_format == "memory":
                raise ValueError(
                    f"lossy-buffered node {name!r} runs via foreachBatch; "
                    "the 'memory' sink has no batch writer — pass a file "
                    "sink (parquet/json/csv + path) or use "
                    "start_foreach_batch()"
                )
            path = sink_options.get("path")
            if not path:
                raise ValueError(
                    f"lossy-buffered node {name!r}: per-microbatch mode "
                    "needs a 'path' sink option"
                )
            extra = {k: str(v) for k, v in sink_options.items() if k != "path"}
            # topology snapshot: the running query keeps THIS logic even
            # if swap_node fires mid-stream; restart() picks up the swap
            with self._lock:
                snapshot = dict(self._nodes)

            def _write_batch(batch_df: DataFrame, epoch: int) -> None:
                # foreachBatch is AT-LEAST-ONCE: a crash after this
                # append but before the offset-log commit replays the
                # epoch and duplicated rows (r10 review — the module's
                # exactly-once claim requires the sink to be idempotent
                # BY EPOCH). Same applied-epoch ledger as
                # streaming/rollup.py: an underscore-prefixed marker
                # dir the sink's own readers ignore.
                jvm = batch_df.sparkSession._jvm
                marker = jvm.org.apache.hadoop.fs.Path(f"{path}/_epochs/{epoch}")
                fs = marker.getFileSystem(
                    batch_df.sparkSession._jsc.hadoopConfiguration()
                )
                if fs.exists(marker):
                    return  # replayed epoch — already written
                dl_splits: dict[str, DataFrame] = {}
                out = self.build(
                    name,
                    source_overrides={src_name: batch_df},
                    nodes=snapshot,
                    dead_letters_out=dl_splits,
                )
                out.write.format(sink_format).options(**extra).mode("append").save(path)
                # persist the batch's quarantine splits (I5): the normal
                # streaming path lets callers run a DLQ query over
                # dead_letter(name), but per-microbatch mode recomputes
                # and previously DISCARDED the split every batch — rows
                # matching the quarantine predicate vanished with no
                # sink and no error (r10 review). dl_splits is scoped
                # to THIS build — exactly the quarantined nodes in this
                # query's upstream closure over this batch's frame, so
                # a quarantined node elsewhere in the graph (or a split
                # another concurrent query's build left in the shared
                # cache) can never be re-appended here (r10 ADVICE).
                for qn, dl in dl_splits.items():
                    dl.write.format(sink_format).options(**extra).mode(
                        "append"
                    ).save(f"{path}/_dead_letter/{qn}")
                from dataworks_spark.streaming.rollup import mark_epoch_applied

                mark_epoch_applied(fs, marker, epoch)

            writer = src_df.writeStream.foreachBatch(_write_batch).queryName(
                query_name or name
            )
            if checkpoint:
                writer = writer.option("checkpointLocation", checkpoint)
            q = writer.start()
            with self._lock:
                self._queries[name] = q
            return q

        df = self.build(name)
        writer = (
            df.writeStream.format(sink_format)
            .outputMode(output_mode)
            .queryName(query_name or name)
        )
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        for k, v in sink_options.items():
            writer = writer.option(k, v)
        q = writer.start()
        with self._lock:
            self._queries[name] = q
        return q

    def start_foreach_batch(self, name: str, fn, checkpoint: str | None = None):
        """foreachBatch sink — the transactor attachment point (K4):
        side effects happen per micro-batch, never inside column
        expressions (reference transact! is async fire-and-forget,
        transactors.clj:15-19). Lossy-buffered nodes are rebuilt per
        batch (shed applied to each batch's static frame) before ``fn``
        sees the rows; the topology is snapshotted at start (swaps
        apply at restart, not mid-query). ``dead_letter(name)`` read
        inside ``fn`` is the CURRENT batch's quarantine split — read it
        there, not from another thread."""
        mb = self._microbatch_plan(name)
        if mb is not None:
            src_name, src_df = mb
            with self._lock:
                snapshot = dict(self._nodes)

            def _shed_then_fn(batch_df: DataFrame, epoch: int) -> None:
                fn(
                    self.build(
                        name, source_overrides={src_name: batch_df}, nodes=snapshot
                    ),
                    epoch,
                )

            writer = src_df.writeStream.foreachBatch(_shed_then_fn)
        else:
            df = self.build(name)
            writer = df.writeStream.foreachBatch(fn)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        q = writer.start()
        with self._lock:
            self._queries[name] = q
        return q

    def restart(self, name: str, **start_kwargs):
        """Stop at a batch boundary and restart from checkpoint — the
        hot-swap activation step (I1). With a checkpointed source the
        restarted query resumes at the exact offset the old logic
        stopped, giving old-before/new-after semantics."""
        with self._lock:
            q = self._queries.pop(name, None)
        if q is not None:
            q.stop()
            q.awaitTermination()
        return self.start(name, **start_kwargs)

    def stop_all(self) -> None:
        with self._lock:
            qs = list(self._queries.values())
            self._queries.clear()
        for q in qs:
            try:
                q.stop()
            except Exception:
                pass


def tumbling_window_agg(ts_col: str, duration: str, keys: list[str], aggs: list, watermark: str | None = None):
    """Graph-level event-time windowed aggregation step (I10): returns a
    DataFrame→DataFrame stage for OpChain.then(). Late data beyond the
    watermark is dropped (the reference is processing-time only and
    captures-but-ignores event time, utils/kafka.clj:97-99 — this is the
    mandated extension)."""

    def stage(df: DataFrame) -> DataFrame:
        if watermark and df.isStreaming:
            df = df.withWatermark(ts_col, watermark)
        return df.groupBy(F.window(ts_col, duration).alias("win"), *keys).agg(*aggs)

    return stage
