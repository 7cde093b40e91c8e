"""Declarative op-chains — the transducer replacement (SURVEY §2 B1-B3, K3).

The reference attaches an arbitrary Clojure transducer to a stream node
(`(comp (map :value) (map inc))`, ReadMe.org:44-45; evaluated at
stream.clj:41-48) and always composes `(filter some?)` after it so nil
results vanish (stream.clj:47). Arbitrary `eval` is replaced by a
declarative op-spec — a list of (op, args) steps compiled onto a
DataFrame — which keeps the whole chain inside Catalyst (codegen,
pushdown) instead of a per-record Python boundary, and makes node logic
serializable (hot-swap messages carry the spec, §2 I7).

Supported ops (the reference's transducer vocabulary):
  select / map   — column projection & derivation (B1)
  filter         — predicate (B2)
  flatmap        — explode, one→many (K3 mapcat)
  rename         — key re-namespacing (B6)
  drop           — key exclusion (B5)
  udf            — a *named* registered transformer (K1) applied to
                   columns; resolved through the registry at build time
  watermark / window agg steps are composed at graph level (I10).

After every user step an implicit nil-drop is applied over the step's
output columns (B3), mirroring stream.clj:47.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Step:
    op: str
    args: tuple[Any, ...] = ()
    kwargs: dict[str, Any] = field(default_factory=dict)


class OpChain:
    """A serializable chain of declarative transform steps.

    Build with the fluent API, apply to any (batch or streaming)
    DataFrame with :meth:`__call__` — batch twins of every streaming op
    keep the oracle tests applicable (SURVEY §7.1 step 5).
    """

    def __init__(self, steps: Sequence[Step] = (), nil_drop: bool = True):
        self.steps = list(steps)
        self.nil_drop = nil_drop

    # -- declarative (de)serialization (I7 control messages) ------------
    @classmethod
    def from_spec(cls, spec: dict, registry=None) -> "OpChain":
        """Build a chain from the JSON-safe spec a control message
        carries (the reference ships quoted Clojure and eval's it,
        stream.clj:30-34 — here the payload is declarative: SQL
        expression strings compiled by Catalyst, plus named-transformer
        references resolved through the registry).

        Spec shape::

            {"steps": [
               {"op": "map",     "cols": {"out": "value * 2"}},
               {"op": "filter",  "expr": "value > 0"},
               {"op": "select",  "cols": ["a", "b"]},
               {"op": "flatmap", "col": "split(text, ' ')", "alias": "tok"},
               {"op": "rename",  "mapping": {"a": "b"}},
               {"op": "drop",    "cols": ["tmp"]},
               {"op": "udf",     "name": "score", "out": "s", "in": ["x"]},
             ],
             "nil_drop": true}
        """
        chain = cls([], spec.get("nil_drop", True))
        for s in spec.get("steps", []):
            op = s["op"]
            if op == "map":
                chain = chain.map(**{k: F.expr(v) for k, v in s["cols"].items()})
            elif op == "filter":
                chain = chain.filter(F.expr(s["expr"]))
            elif op == "select":
                chain = chain.select(*s["cols"])
            elif op == "flatmap":
                # pass the STRING through — _apply resolves it, so the
                # spec path and the fluent string path produce the same
                # schema (r10 review: F.expr here kept the source column
                # while the fluent form dropped it)
                chain = chain.flatmap(s["col"], s["alias"])
            elif op == "rename":
                chain = chain.rename(s["mapping"])
            elif op == "drop":
                chain = chain.drop(*s["cols"])
            elif op == "udf":
                if registry is None:
                    raise ValueError("udf step requires a registry")
                chain = chain.udf(registry, s["name"], s["out"], *s["in"])
            else:
                raise ValueError(f"unknown spec op {op!r}")
        return chain

    # -- fluent builders ------------------------------------------------
    def _with(self, step: Step) -> "OpChain":
        return OpChain([*self.steps, step], self.nil_drop)

    def map(self, **named_exprs: Column) -> "OpChain":
        """Derive/overwrite columns — the `(map f)` transducer (B1)."""
        return self._with(Step("map", kwargs=dict(named_exprs)))

    def select(self, *cols: str | Column) -> "OpChain":
        return self._with(Step("select", args=tuple(cols)))

    def filter(self, cond: Column) -> "OpChain":
        """`(filter pred)` (B2)."""
        return self._with(Step("filter", args=(cond,)))

    def flatmap(self, col: Column | str, alias: str) -> "OpChain":
        """`mapcat` — one message to many (K3): explode an array column."""
        return self._with(Step("flatmap", args=(col, alias)))

    def rename(self, mapping: dict[str, str]) -> "OpChain":
        return self._with(Step("rename", args=(dict(mapping),)))

    def drop(self, *cols: str) -> "OpChain":
        return self._with(Step("drop", args=tuple(cols)))

    def udf(self, registry, name: str, out_col: str, *in_cols: str) -> "OpChain":
        """Apply a named transformer from the registry (K1) — resolved
        lazily so a hot-swapped definition takes effect on restart."""
        return self._with(Step("udf", args=(registry, name, out_col, *in_cols)))

    def then(self, fn: Callable[[DataFrame], DataFrame]) -> "OpChain":
        """Escape hatch: an arbitrary DataFrame→DataFrame stage (used by
        graph-level windowing/aggregation steps)."""
        return self._with(Step("then", args=(fn,)))

    # -- application ------------------------------------------------------
    def __call__(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            df = self._apply(df, step)
            if self.nil_drop and step.op in {"map", "udf", "flatmap"}:
                # implicit (filter some?) on the derived columns (B3) —
                # including flatmap's alias: exploding array('a', NULL)
                # yields a nil element row the reference's composed
                # (filter some?) would drop (r10 review; stream.clj:47)
                if step.op == "map":
                    subset = list(step.kwargs)
                elif step.op == "udf":
                    subset = [step.args[2]]
                else:
                    subset = [step.args[1]]
                if subset:
                    df = df.dropna(how="any", subset=subset)
        return df

    @staticmethod
    def _apply(df: DataFrame, step: Step) -> DataFrame:
        if step.op == "map":
            return df.withColumns(step.kwargs)
        if step.op == "select":
            return df.select(*step.args)
        if step.op == "filter":
            return df.filter(step.args[0])
        if step.op == "flatmap":
            col, alias = step.args
            # one schema rule for BOTH construction paths (r10 review —
            # the spec path kept the source column while the fluent
            # string path dropped it): a string naming an existing
            # column is that column (and is dropped, replaced by the
            # exploded alias); any other string is a SQL expression;
            # a pre-existing column named like the alias is dropped
            # (the alias wins — never duplicate output names)
            if isinstance(col, str):
                named = col in df.columns
                src = F.col(col) if named else F.expr(col)
                drop = {col} if named else set()
            else:
                src, drop = col, set()
            others = [c for c in df.columns if c != alias and c not in drop]
            return df.select(*others, F.explode(src).alias(alias))
        if step.op == "rename":
            return df.withColumnsRenamed(step.args[0])
        if step.op == "drop":
            return df.drop(*step.args)
        if step.op == "udf":
            registry, name, out_col, *in_cols = step.args
            return registry.apply(df, name, out_col, *in_cols)
        if step.op == "then":
            return step.args[0](df)
        raise ValueError(f"unknown op {step.op}")
