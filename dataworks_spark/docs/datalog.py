"""Datalog-lite → DataFrame compiler (SURVEY §2 C1-C5, B4, B7; §4 #1).

The reference's query surface is Crux Datalog: triple patterns with
unification, predicates, parameterized args, and recursive rules —
e.g. the alert poll (utils/alert.clj:10-15)::

    {:find [id handler params]
     :where [[id :alert/timestamp]
             [id :alert/handler handler]
             [id :alert/params params]]}

the auth predicate query (utils/auth.clj:92-96), the constant-bound
collector lookup (collector.clj:74-78, db/app_db.clj:61-69), and the
recursive `depends` rule (db/app_db.clj:115-126).

This module is a pure Python **front-end**: it compiles those shapes to
declarative DataFrame plans (selects / filters / equi-joins / fixpoint
loops) and lets Catalyst do the physical planning — join reordering,
broadcast selection, predicate pushdown. No custom Catalyst rules
(SURVEY §4: "Catalyst then optimizes the emitted plan").

Data model: entity namespaces are registered as wide DataFrames with an
id column (SURVEY §1.1 mapping); an attribute ``ns/field`` is the
``field`` column of namespace ``ns``. A triple pattern is
``(entity_var, "ns/field", value)`` where value is a ``?var``, a
literal, or None (existence only). Clauses that are not triples are
predicates: ``(op, arg, ...)`` with op in a small builtin set or a
callable building a Column.

Variable unification compiles to equi-joins on the variable's column;
repeated attributes on one entity var become projections of the same
wide row (C1 "self-join" degenerates to select — exactly the wide-table
shortcut SURVEY §2 C1 prescribes).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataworks_spark.ops.recursive import transitive_closure

_PREDICATES: dict[str, Callable[..., Column]] = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "starts-with?": lambda a, b: a.startswith(b),
    "includes?": lambda a, b: a.contains(b),
}


def _is_var(x) -> bool:
    return isinstance(x, str) and x.startswith("?")


def _vcol(x: str) -> str:
    return x[1:]


@dataclass
class Rule:
    """A recursive rule in the only shape the reference exposes
    (db/app_db.clj:121-126): linear transitive closure over a binary
    edge attribute — `(depends d1 d2)` := edge(d1,d2) | edge(d1,m) ∧
    depends(m,d2)."""

    name: str
    edge_attr: str  # "ns/field" holding the destination entity id


class DatalogDB:
    """Registry of entity namespaces (the two-database model of the
    reference, app-db/user-db — db/app_db.clj:19-26 — becomes two
    instances of this class)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark
        self._tables: dict[str, tuple[DataFrame, str]] = {}

    def register(self, ns: str, df: DataFrame, id_col: str) -> None:
        self._tables[ns] = (df, id_col)

    def table(self, ns: str) -> tuple[DataFrame, str]:
        if ns not in self._tables:
            raise KeyError(f"unknown entity namespace {ns!r}")
        return self._tables[ns]

    # -- the query entry point (db/app_db.clj:33-43 arities) -----------
    def q(
        self,
        find: Sequence[str],
        where: Sequence[tuple],
        args: dict | None = None,
        rules: Sequence[Rule] = (),
    ) -> DataFrame:
        """Compile and run a Datalog query; returns a DataFrame whose
        columns are the find-vars (without '?')."""
        args = args or {}
        rule_map = {r.name: r for r in rules}
        bound: DataFrame | None = None
        filters: list[tuple] = []

        negations: list[tuple] = []
        for clause in where:
            head = clause[0]
            if isinstance(head, str) and head == "or":
                # or-clause → union of the branch bindings (each branch
                # is a triple binding the same variables)
                branches = [self._apply_triple(None, t, args) for t in clause[1:]]
                proj = branches[0]
                for b in branches[1:]:
                    proj = proj.unionByName(b)
                proj = proj.dropDuplicates()
                if bound is None:
                    bound = proj
                else:
                    shared = [c for c in proj.columns if c in bound.columns]
                    bound = bound.join(proj, on=shared) if shared else bound.crossJoin(proj)
                continue
            if isinstance(head, str) and head == "not":
                # Datalog negation → anti-join (SURVEY §2 C-notes:
                # "negation/option compiles to anti/outer")
                negations.append(clause[1])
                continue
            if isinstance(head, str) and (head in _PREDICATES or head in rule_map) or callable(head):
                if isinstance(head, str) and head in rule_map:
                    bound = self._apply_rule(bound, rule_map[head], clause[1], clause[2])
                    continue
                filters.append(clause)
                continue
            bound = self._apply_triple(bound, clause, args)

        for triple in negations:
            if bound is None:
                raise ValueError("negation requires a positive pattern first")
            bound = self._apply_negation(bound, triple, args)

        if bound is None:
            raise ValueError("query has no triple patterns")

        for clause in filters:
            bound = bound.filter(self._predicate(clause, args))

        for var, value in args.items():
            if _vcol(var) in bound.columns and not isinstance(value, DataFrame):
                bound = bound.filter(F.col(_vcol(var)) == F.lit(value))

        return bound.select(*[_vcol(v) for v in find]).dropDuplicates()

    # -- triple compilation ---------------------------------------------
    def _apply_triple(self, bound: DataFrame | None, triple: tuple, args: dict) -> DataFrame:
        evar, attr, *rest = triple
        value = rest[0] if rest else None
        ns, field = attr.split("/", 1)
        df, id_col = self.table(ns)

        cols = [F.col(id_col).alias(_vcol(evar))]
        flt = None
        if value is None:
            # existence pattern [e :ns/field] — attribute must be present
            flt = F.col(field).isNotNull()
        elif _is_var(value):
            cols.append(F.col(field).alias(_vcol(value)))
        else:
            # constant-bound pattern (C3, collector.clj:74-78)
            flt = F.col(field) == F.lit(value)
        proj = df.filter(flt).select(*cols) if flt is not None else df.select(*cols)

        if bound is None:
            return proj
        shared = [c for c in proj.columns if c in bound.columns]
        if shared:
            # unification = equi-join on shared vars (C1/C2)
            return bound.join(proj, on=shared, how="inner")
        return bound.crossJoin(proj)

    def _apply_negation(self, bound: DataFrame, triple: tuple, args: dict) -> DataFrame:
        """``("not", (e, attr, v))`` keeps bindings with NO matching
        triple — left_anti on the shared variables."""
        evar, attr, *rest = triple
        value = rest[0] if rest else None
        ns, field = attr.split("/", 1)
        df, id_col = self.table(ns)
        cols = [F.col(id_col).alias(_vcol(evar))]
        proj = df
        if value is None:
            proj = proj.filter(F.col(field).isNotNull())
        elif _is_var(value):
            cols.append(F.col(field).alias(_vcol(value)))
        else:
            proj = proj.filter(F.col(field) == F.lit(args.get(value, value)))
        proj = proj.select(*cols)
        shared = [c for c in proj.columns if c in bound.columns]
        if not shared:
            raise ValueError("negation pattern shares no variables with the query")
        return bound.join(proj, on=shared, how="left_anti")

    # -- predicates (B7, utils/auth.clj:92-96) ---------------------------
    def _predicate(self, clause: tuple, args: dict) -> Column:
        op, *operands = clause
        cols = [
            F.col(_vcol(o)) if _is_var(o) else F.lit(args.get(o, o) if isinstance(o, str) else o)
            for o in operands
        ]
        fn = op if callable(op) else _PREDICATES[op]
        return fn(*cols)

    # -- recursive rules (C5, db/app_db.clj:121-126) ---------------------
    def _apply_rule(self, bound: DataFrame | None, rule: Rule, src_var: str, dst_var: str) -> DataFrame:
        ns, field = rule.edge_attr.split("/", 1)
        df, id_col = self.table(ns)
        edges = df.select(F.col(id_col).alias("src"), F.col(field).alias("dst")).dropna()
        closure = transitive_closure(edges, "src", "dst")
        proj = closure.select(
            F.col("src").alias(_vcol(src_var)), F.col("dst").alias(_vcol(dst_var))
        )
        if bound is None:
            return proj
        shared = [c for c in proj.columns if c in bound.columns]
        return bound.join(proj, on=shared, how="inner") if shared else bound.crossJoin(proj)
