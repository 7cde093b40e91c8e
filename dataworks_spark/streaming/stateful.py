"""Custom stateful per-key streaming operators (SURVEY §2 I11).

The reference keeps per-key state in Crux documents (e.g. the demo
app's LWW log doc, doc/demo-app-1.org:99-104) and has no real stateful
stream operator; this is the mandated extension. Implemented with
``applyInPandasWithState`` — Spark's state store keeps per-key state
across micro-batches with checkpoint fault tolerance.

Operators:
  latest_state    — LWW current document per key (streaming twin of
                    docs.latest_snapshot / E4)
  seen_filter     — stateful exactly-once dedup by key (streaming twin
                    of L1 exact dedup: drops keys already seen in any
                    earlier batch)

Both keep state bounded by key-count (a long/timestamp per key), the
property that matters at 100 TB: state size is O(|keys|), not O(|rows|).

The state-update functions are self-contained closures (stdlib-only) —
executor Python workers may not have this package importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def latest_state(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    output_mode: str = "update",
) -> DataFrame:
    """Streaming LWW: one output row per key per batch carrying the
    latest (ts, value) seen so far (across batches, via the state
    store). Key/value types are taken from ``events.schema`` — any
    groupable key type and any atomic value type work."""
    ktype = events.schema[key_col].dataType.simpleString()
    vtype = events.schema[value_col].dataType.simpleString()
    out_schema = f"{key_col} {ktype}, {ts_col} timestamp, {value_col} {vtype}"
    state_schema = f"ts_micros long, value {vtype}"
    kc, tc, vc = key_col, ts_col, value_col

    def update(key, pdfs, state):
        import pandas as _pd

        best_ts, best_v = state.get if state.exists else (None, None)
        for pdf in pdfs:
            for ts, v in zip(pdf[tc], pdf[vc]):
                micros = int(ts.value // 1000)  # pandas ns → micros
                w = v.item() if hasattr(v, "item") else v
                # same-ts ties resolve by VALUE (max string form), not
                # batch iteration order — shuffle arrival order differs
                # across task retries, and an exactly-once sink must see
                # the same winner every time (r10 review; the same
                # nondeterminism class the store's version_log closed
                # with its payload-hash tiebreak)
                if (
                    best_ts is None
                    or micros > best_ts
                    or (micros == best_ts and str(w) > str(best_v))
                ):
                    best_ts = micros
                    best_v = w
        state.update((best_ts, best_v))
        yield _pd.DataFrame(
            {kc: [key[0]], tc: [_pd.Timestamp(best_ts * 1000)], vc: [best_v]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, output_mode, GroupStateTimeout.NoTimeout
    )


def seen_filter(events: DataFrame, key_col: str, output_mode: str = "update") -> DataFrame:
    """Stateful first-occurrence filter: emits each key's row only the
    first time the key is ever seen (cross-batch exact dedup, L1
    streaming twin). State per key: a single marker."""
    ktype = events.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {ktype}, n_suppressed long"
    state_schema = "seen long, suppressed long"
    kc = key_col

    def update(key, pdfs, state):
        import pandas as _pd

        n_rows = 0
        for pdf in pdfs:
            n_rows += len(pdf)
        if state.exists:
            (seen, suppressed) = state.get
            state.update((seen, suppressed + n_rows))
            return iter(())  # already emitted once
        state.update((1, n_rows - 1))
        yield _pd.DataFrame({kc: [key[0]], "n_suppressed": [n_rows - 1]})

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, output_mode, GroupStateTimeout.NoTimeout
    )
