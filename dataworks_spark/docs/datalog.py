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

from dataworks_spark.ops.recursive import _lift, adaptive_rounds, transitive_closure

#: semi-naive fixpoint round cap for general recursive rules. Exhausting
#: it RAISES (ADVICE r2: a silent partial relation is a wrong answer);
#: linear rules grow derivation depth by 1/round, nonlinear ones double
#: it, so 100 rounds covers depth 100 / 2^100 respectively.
MAX_FIXPOINT_ROUNDS = 100

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


def _called_names(clauses) -> set:
    """Every clause-head name appearing in a clause list, walking
    through or/and branches (shared by the nested-self-call guard and
    the rule-call-graph builder)."""
    out = set()
    for c in clauses:
        h = c[0]
        if isinstance(h, str) and h in ("or", "and"):
            for br in c[1:]:
                out |= _called_names(
                    [br]
                    if not (isinstance(br[0], str) and br[0] == "and")
                    else list(br[1:])
                )
        elif isinstance(h, str):
            out.add(h)
    return out


def _nested_rule_calls(clauses, names: set) -> set:
    """Names from ``names`` called INSIDE or/and branches of the clause
    list (not as top-level clauses) — positions the semi-naive delta
    rewriting cannot reach."""
    out = set()
    for c in clauses:
        h = c[0]
        if isinstance(h, str) and h in ("or", "and"):
            out |= _called_names([c]) & names
    return out


@dataclass
class Rule:
    """A Datalog rule (Crux rule surface, db/app_db.clj:115-126).

    Two forms:

    * shorthand ``Rule("depends", "ns/field")`` — the linear binary
      transitive closure the reference's commented example uses
      (db/app_db.clj:121-126); compiled via the log-depth
      path-doubling fixpoint.
    * general ``Rule("reach", head=("?a", "?b"), bodies=[...])`` —
      ``head`` lists the rule's variables; each body is a list of
      clauses (triples, predicates, or rule calls — including calls to
      *itself*, possibly several times per body, i.e. nonlinear
      recursion). Non-recursive bodies seed the fixpoint; recursive
      bodies are iterated to convergence with SEMI-NAIVE evaluation
      (deltas substituted per self-call position) and per-round
      lineage checkpoints — each round is one batch of joins, so a
      depth-d graph needs ≤d driver rounds (≤⌈log₂ d⌉ for nonlinear
      bodies, which square path length like doubling does).
    """

    name: str
    edge_attr: str | None = None  # shorthand: "ns/field" destination id
    head: tuple = ()
    bodies: tuple = ()
    #: optional caller-known bound on recursion depth (longest simple
    #: path). Closure-shaped rules then skip the final no-growth probe
    #: round — the bound proves convergence instead of observing it.
    depth_bound: int | None = None


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

    #: find-spec aggregates (the Crux/Datomic `:find [(count ?e) …]`
    #: surface the reference delegates wholesale — the same delegation
    #: argument that mandated recursive rules): aggregate name →
    #: Column-builder over the bound variable column.
    _FIND_AGGS = {
        "count": lambda c: F.count(c),
        "count-distinct": lambda c: F.count_distinct(c),
        "sum": lambda c: F.sum(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "avg": lambda c: F.avg(c),
    }

    # -- the query entry point (db/app_db.clj:33-43 arities) -----------
    def q(
        self,
        find: Sequence,
        where: Sequence[tuple],
        args: dict | None = None,
        rules: Sequence[Rule] = (),
        with_: Sequence[str] = (),
    ) -> DataFrame:
        """Compile and run a Datalog query; returns a DataFrame whose
        columns are the find-vars (without '?').

        ``find`` elements are either variables (``"?v"``) or AGGREGATE
        forms ``("count"|"count-distinct"|"sum"|"min"|"max"|"avg",
        "?v")`` with an optional third element naming the output column
        (default ``<agg>_<var>``) — the Crux/Datomic
        ``:find [(count ?e) (sum ?x)]`` surface. Plain find variables
        become the grouping key; with no plain variable the aggregate
        is global (one row). SET SEMANTICS, like the engines this
        mirrors: aggregation runs over the DISTINCT bindings of the
        find (+ ``with_``) variables — a Datalog result is a relation,
        so two derivations of the same tuple count once. ``with_``
        mirrors Datomic's ``:with``: extra variables folded into the
        distinct-ness check (preserving meaningful duplicates of the
        find-tuple) but not returned — on BOTH branches: with
        aggregates it widens the set the aggregate folds over; without
        aggregates the result is a bag where each find-tuple repeats
        once per distinct with-binding (r12)."""
        args = args or {}
        rule_map = {r.name: r for r in rules}
        rule_env: dict[str, DataFrame] = {}
        bound = self._eval_clauses(where, args, rule_map, rule_env)

        for var, value in args.items():
            if isinstance(value, DataFrame):
                continue
            if _is_var(var) and _vcol(var) not in bound.columns:
                # a ?-arg that binds nothing is a typo'd :in binding —
                # silently skipping it would return the full unfiltered
                # result (Crux errors on undeclared :in; r9 review).
                # Non-? keys stay legal as named predicate constants.
                raise ValueError(
                    f"arg {var!r} binds no variable of the query "
                    f"(bound: {sorted(bound.columns)})"
                )
            if _vcol(var) in bound.columns:
                bound = bound.filter(F.col(_vcol(var)) == F.lit(value))

        group_vars: list[str] = []
        agg_specs: list[tuple[str, str, str]] = []  # (fn, var, out_name)
        for el in find:
            if isinstance(el, str):
                group_vars.append(el)
                continue
            fn, var = el[0], el[1]
            if fn not in self._FIND_AGGS:
                raise ValueError(
                    f"unknown find aggregate {fn!r} "
                    f"(known: {sorted(self._FIND_AGGS)})"
                )
            out = el[2] if len(el) > 2 else f"{fn.replace('-', '_')}_{_vcol(var)}"
            agg_specs.append((fn, var, out))

        # every projected variable — plain find vars, with_ vars, and
        # aggregated vars alike — must be bound by the :where clauses;
        # checking here keeps the module's documented error contract
        # (a friendly ValueError) instead of an opaque AnalysisException
        # from the select below (r12 ADVICE low).
        for var in list(group_vars) + list(with_):
            if _vcol(var) not in bound.columns:
                raise ValueError(
                    f"find/with variable {var!r} is not bound by the "
                    f"query (bound: {sorted(bound.columns)})"
                )
        for _, var, _ in agg_specs:
            if _vcol(var) not in bound.columns:
                raise ValueError(
                    f"aggregate over unbound variable {var!r} "
                    f"(bound: {sorted(bound.columns)})"
                )

        if not agg_specs:
            if with_:
                # Datomic's :with without aggregates switches the find
                # tuple to bag semantics: distinct-ness is judged over
                # find+with, then the with columns are dropped, so a
                # find-tuple occurs once PER distinct with-binding
                # (r12 ADVICE low — previously with_ was silently
                # ignored on this branch).
                keep = dict.fromkeys(
                    [_vcol(v) for v in find] + [_vcol(v) for v in with_]
                )
                return (
                    bound.select(*keep)
                    .dropDuplicates()
                    .select(*[_vcol(v) for v in find])
                )
            return bound.select(*[_vcol(v) for v in find]).dropDuplicates()
        # distinct FIRST (set semantics over find+with vars), then one
        # map-side-combined groupBy — both shuffles key on the same
        # columns, so at scale this is one exchange + a mostly-local agg
        keep = dict.fromkeys(
            [_vcol(v) for v in group_vars]
            + [_vcol(v) for _, v, _ in agg_specs]
            + [_vcol(v) for v in with_]
        )
        base = bound.select(*keep).dropDuplicates()
        exprs = [
            self._FIND_AGGS[fn](F.col(_vcol(var))).alias(out)
            for fn, var, out in agg_specs
        ]
        grouped = base.groupBy(*[_vcol(v) for v in group_vars]) if group_vars else base.groupBy()
        return grouped.agg(*exprs)

    # -- conjunctive clause-list evaluation ------------------------------
    def _eval_clauses(
        self,
        where: Sequence[tuple],
        args: dict,
        rule_map: dict[str, "Rule"],
        rule_env: dict[str, DataFrame],
    ) -> DataFrame:
        """Evaluate a conjunction of clauses (the body of a query, an
        `and` or-branch, or a rule body) to a binding DataFrame."""
        bound: DataFrame | None = None
        filters: list[tuple] = []
        negations: list[tuple] = []

        for clause in where:
            head = clause[0]
            if isinstance(head, str) and head == "or":
                proj = self._apply_or(clause[1:], args, rule_map, rule_env)
                bound = self._merge(bound, proj)
                continue
            if isinstance(head, str) and head == "not":
                negations.append(clause[1])
                continue
            if isinstance(head, str) and (head in rule_map or head in rule_env):
                # rule_env names cover semi-naive delta sentinels
                bound = self._apply_rule_call(bound, clause, rule_map, rule_env)
                continue
            if (isinstance(head, str) and head in _PREDICATES) or callable(head):
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
        return bound

    def _merge(self, bound: DataFrame | None, proj: DataFrame) -> DataFrame:
        """Unify a new binding set into the accumulated bindings:
        equi-join on shared variables (C1/C2), cross join if disjoint."""
        if bound is None:
            return proj
        shared = [c for c in proj.columns if c in bound.columns]
        return bound.join(proj, on=shared, how="inner") if shared else bound.crossJoin(proj)

    # -- or-clauses (Crux multi-clause branches) -------------------------
    def _apply_or(
        self,
        branches: Sequence[tuple],
        args: dict,
        rule_map: dict[str, "Rule"],
        rule_env: dict[str, DataFrame],
    ) -> DataFrame:
        """``("or", branch, ...)`` — each branch is a single clause or
        ``("and", clause, ...)`` (Crux's multi-clause branch). Branches
        must bind the same variable set; the result is the union of the
        branch bindings on those variables."""
        compiled: list[DataFrame] = []
        for br in branches:
            clauses = list(br[1:]) if (isinstance(br[0], str) and br[0] == "and") else [br]
            compiled.append(self._eval_clauses(clauses, args, rule_map, rule_env))
        varset = set(compiled[0].columns)
        for b in compiled[1:]:
            if set(b.columns) != varset:
                raise ValueError(
                    f"or-branches must bind the same variables; got {sorted(varset)} "
                    f"vs {sorted(b.columns)}"
                )
        out = compiled[0]
        for b in compiled[1:]:
            out = out.unionByName(b)
        return out.dropDuplicates()

    # -- triple compilation ---------------------------------------------
    def _apply_triple(self, bound: DataFrame | None, triple: tuple, args: dict) -> DataFrame:
        evar, attr, *rest = triple
        value = rest[0] if rest else None
        ns, field = attr.split("/", 1)
        df, id_col = self.table(ns)

        cols, flt = [], None

        def _and(c):
            nonlocal flt
            flt = c if flt is None else (flt & c)

        if _is_var(evar):
            cols.append(F.col(id_col).alias(_vcol(evar)))
        else:
            # constant ENTITY — Crux's point lookup [(const attr ?v)]:
            # filter on the id, never mangle the constant into a column
            # name (r9 review: a constant here was treated as a
            # variable, returning EVERY entity under a stripped alias)
            _and(F.col(id_col) == F.lit(evar))
        if value is None:
            # existence pattern [e :ns/field] — attribute must be present
            _and(F.col(field).isNotNull())
        elif _is_var(value):
            if _is_var(evar) and _vcol(value) == _vcol(evar):
                # repeated variable in one triple = unification filter
                # (?x attr ?x), not two same-named output columns
                # (r9 review: the duplicate alias broke downstream joins
                # with AMBIGUOUS_REFERENCE)
                _and(F.col(field) == F.col(id_col))
            else:
                cols.append(F.col(field).alias(_vcol(value)))
        else:
            # constant-bound pattern (C3, collector.clj:74-78)
            _and(F.col(field) == F.lit(value))
        proj = df.filter(flt) if flt is not None else df
        if cols:
            proj = proj.select(*cols)
        else:
            # all-constant triple = existence assertion: a 0-column,
            # ≤1-row gate (crossJoin with it keeps or empties the
            # bindings without duplication)
            proj = proj.limit(1).select()

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
        if not _is_var(evar):
            raise ValueError(
                "negation patterns need a variable entity term "
                f"(got constant {evar!r}); bind it positively first"
            )
        cols = [F.col(id_col).alias(_vcol(evar))]
        proj = df
        if value is None:
            proj = proj.filter(F.col(field).isNotNull())
        elif _is_var(value):
            if _vcol(value) == _vcol(evar):
                proj = proj.filter(F.col(field) == F.col(id_col))
            else:
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

    # -- rules (C5, db/app_db.clj:115-126) -------------------------------
    def _apply_rule_call(
        self,
        bound: DataFrame | None,
        clause: tuple,
        rule_map: dict[str, "Rule"],
        rule_env: dict[str, DataFrame],
    ) -> DataFrame:
        """Join a rule-call clause ``(name, term, ...)`` into the
        bindings: the rule's derived relation (materialized once per
        query) is projected onto the call's terms — variables rename
        head columns, constants filter them."""
        name, *terms = clause
        # a name already materialized in rule_env may be a semi-naive
        # delta sentinel ("<rule>@delta") that has no Rule object
        if name in rule_env:
            rel = rule_env[name]
        else:
            rel = self._eval_rule(rule_map[name], rule_map, rule_env)
        head_cols = rel.columns
        if len(terms) != len(head_cols):
            raise ValueError(f"rule {name} has {len(head_cols)} head vars, called with {len(terms)}")
        cols, flt, seen = [], None, {}
        for hc, term in zip(head_cols, terms):
            if _is_var(term):
                v = _vcol(term)
                if v in seen:
                    # repeated variable across call positions =
                    # unification filter, e.g. (reach ?a ?a) keeps the
                    # diagonal (r9 review: two same-named aliases broke
                    # with AMBIGUOUS_REFERENCE instead)
                    cond = F.col(hc) == F.col(seen[v])
                else:
                    seen[v] = hc
                    cols.append(F.col(hc).alias(v))
                    continue
            else:
                cond = F.col(hc) == F.lit(term)
            flt = cond if flt is None else (flt & cond)
        proj = (rel.filter(flt) if flt is not None else rel).select(*cols)
        # rel is distinct by construction; a full-width variable-only
        # projection (rename) stays distinct — only constant-filtered
        # calls project a subset of head columns and need a re-dedup
        if len(cols) < len(head_cols):
            proj = proj.dropDuplicates()
        return self._merge(bound, proj)

    def _eval_rule(
        self, rule: Rule, rule_map: dict[str, "Rule"], rule_env: dict[str, DataFrame]
    ) -> DataFrame:
        """Materialize a rule's derived relation (columns = head vars).

        Shorthand rules (edge_attr) compile to the log-depth
        path-doubling closure. General rules run a SEMI-NAIVE fixpoint
        (the standard Datalog evaluation): the union of non-recursive
        bodies seeds relation and delta; each round derives only tuples
        reachable *through the delta* — every recursive body is
        re-evaluated once per self-call position with that position
        bound to the delta and the others to the full relation (the
        nonlinear semi-naive expansion), so derivation work per round
        tracks |delta| · |rel|, not |rel|², which is what survives when
        rel is cluster-scale. New tuples are isolated with an anti-join
        (that IS the delta, so it can't be traded away); lineage is
        truncated by per-round localCheckpoint; cycles terminate because
        a revisited tuple never re-enters the delta."""
        if rule.name in rule_env:
            return rule_env[rule.name]
        # Mutual recursion (r10, VERDICT #5): rules whose static call
        # graph forms a >1-member strongly connected component are
        # evaluated as ONE joint semi-naive fixpoint — iterate every
        # member per round until no member's relation grows — because
        # materializing one member in isolation would either recurse
        # forever or cache a partner against a partial mid-fixpoint
        # snapshot (the corruption class the r9 guard raised on).
        scc = self._rule_scc(rule.name, rule_map)
        if len(scc) > 1:
            self._eval_mutual_scc(scc, rule_map, rule_env)
            return rule_env[rule.name]

        inflight: set = rule_env.setdefault("__in_flight__", set())  # type: ignore[assignment]
        if rule.name in inflight:
            # re-entry through a nested (e.g. or-branch) self-call that
            # the top-level recursion classifier cannot route through
            # the semi-naive delta — would recurse forever otherwise
            raise ValueError(
                f"rule {rule.name!r} calls itself from a nested clause "
                "(or-branch); self-recursion must be a top-level body clause"
            )
        inflight.add(rule.name)
        try:
            return self._eval_rule_inner(rule, rule_map, rule_env)
        finally:
            inflight.discard(rule.name)

    @staticmethod
    def _rule_scc(name: str, rule_map: dict[str, "Rule"]) -> set:
        """The strongly connected component of ``name`` in the static
        rule-call graph (edges R→S where a body of R calls S). Rule
        sets are tiny (hand-written query surfaces), so plain two-way
        reachability beats carrying a Tarjan implementation."""
        edges = {
            n: set().union(*(_called_names(b) for b in r.bodies)) & set(rule_map)
            if r.bodies
            else set()
            for n, r in rule_map.items()
        }

        def reach(start: str) -> set:
            seen: set = set()
            stack = [start]
            while stack:
                n = stack.pop()
                for m in edges.get(n, ()):  # successors, not start itself
                    if m not in seen:
                        seen.add(m)
                        stack.append(m)
            return seen

        fwd = reach(name)
        return {name} | {n for n in fwd if name in reach(n)}

    def _eval_mutual_scc(
        self, scc: set, rule_map: dict[str, "Rule"], rule_env: dict[str, DataFrame]
    ) -> None:
        """Joint semi-naive fixpoint over a mutually recursive rule
        group (r10, VERDICT #5; the reference's rule surface is Crux
        Datalog — app_db.clj:121-126 — which evaluates these).

        Standard stratum-internal evaluation: every member keeps a
        relation and a per-round DELTA; each round re-derives every
        SCC-calling body once per SCC-call position with that position
        bound to the callee's delta and the others to the full
        relations (the nonlinear semi-naive expansion — work tracks
        Σ|delta|·|rel|, not |rel|², the shape that survives at cluster
        scale), anti-joins out known tuples, and the round's new tuples
        become the next deltas for ALL members simultaneously
        (synchronous rounds — asynchronous per-member updates would
        make the result order-dependent). Convergence = no member grew.

        Members with no SCC-free body activate LATE: their relation
        first exists when a round derives it from the partners' seeds
        (even/odd-path is the canonical case — `odd` has no base body),
        and that first relation is their first delta. Bodies whose
        callees have no relation yet cannot fire and are skipped until
        activation. Non-SCC rule calls inside bodies materialize
        normally — the SCC is maximal, so anything they reach is a
        strictly lower stratum (a call chain leading back in would put
        the intermediary inside the SCC by definition).
        """
        members = [rule_map[n] for n in sorted(scc)]
        heads: dict[str, list[str]] = {}
        for r in members:
            if r.edge_attr is not None:
                # unreachable via the static graph (shorthand rules call
                # nothing) — guard against future Rule surface growth
                raise ValueError(
                    f"shorthand rule {r.name!r} cannot be mutually recursive"
                )
            nested = set()
            for body in r.bodies:
                nested |= _nested_rule_calls(body, scc)
            if nested:
                raise ValueError(
                    f"rule {r.name!r} calls {sorted(nested)} from a nested "
                    "clause (or-branch); recursive calls must be top-level "
                    "body clauses"
                )
            heads[r.name] = [_vcol(v) for v in r.head]

        rels: dict[str, DataFrame] = {}
        deltas: dict[str, DataFrame] = {}
        counts: dict[str, int] = {}
        for r in members:
            base: DataFrame | None = None
            for body in r.bodies:
                if _called_names(body) & scc:
                    continue
                b = self._eval_clauses(list(body), {}, rule_map, rule_env).select(
                    *heads[r.name]
                )
                base = b if base is None else base.unionByName(b)
            if base is not None:
                rel = base.dropDuplicates().localCheckpoint(eager=False)
                rels[r.name] = rel
                deltas[r.name] = rel
                counts[r.name] = rel.count()
        if not rels:
            raise ValueError(
                f"mutually recursive rules {sorted(scc)} need at least one "
                "body that calls no member of the group (a seed)"
            )

        some_rel = next(iter(rels.values()))
        factor = 2.0  # growth-tracked sizing (ops/recursive._doubling note)
        with adaptive_rounds(self.spark or some_rel.sparkSession) as rt:
            for _ in range(1, MAX_FIXPOINT_ROUNDS + 1):
                total_before = sum(counts.values())
                rt(int(total_before * factor))
                # expose this round's relations + deltas to the clause
                # compiler under the member names / delta sentinels (a
                # member may have a relation but no delta this round —
                # pop its stale sentinel rather than index into deltas)
                for n in rels:
                    rule_env[n] = rels[n]
                for r in members:
                    if r.name in deltas:
                        rule_env[f"{r.name}@delta"] = deltas[r.name]
                    else:
                        rule_env.pop(f"{r.name}@delta", None)
                # relation updates are DEFERRED to the end of the round
                # (synchronous semantics): every member derives against
                # the round-START rels/deltas, which are exactly what
                # rule_env exposes. Updating rels mid-loop desynced the
                # two — a later member's body would pass the `in rels`
                # guard, miss rule_env, fall through _apply_rule_call →
                # _eval_rule → _eval_mutual_scc and recurse unboundedly
                # (r10 review, verified live on a seedless member read
                # at a full position of a two-call body).
                new_deltas: dict[str, DataFrame] = {}
                next_rels = dict(rels)
                grew = False
                for r in members:
                    grown: DataFrame | None = None
                    for body in r.bodies:
                        positions = [
                            i
                            for i, c in enumerate(body)
                            if isinstance(c[0], str) and c[0] in scc
                        ]
                        if not positions:
                            continue  # seed body — contributed once
                        if any(body[i][0] not in rels for i in positions):
                            continue  # a callee not yet activated
                        for pos in positions:
                            callee = body[pos][0]
                            if callee not in deltas:
                                continue  # no delta this round
                            variant = list(body)
                            variant[pos] = (f"{callee}@delta", *body[pos][1:])
                            g = self._eval_clauses(
                                variant, {}, rule_map, rule_env
                            ).select(*heads[r.name])
                            grown = g if grown is None else grown.unionByName(g)
                    if grown is None:
                        continue
                    if r.name in rels:
                        new = grown.dropDuplicates().join(
                            rels[r.name], on=heads[r.name], how="left_anti"
                        )
                    else:
                        new = grown.dropDuplicates()
                    new = rt.lift(new).localCheckpoint(eager=False)
                    n_new = new.count()
                    if n_new == 0:
                        continue
                    grew = True
                    new_deltas[r.name] = new
                    if r.name in rels:
                        next_rels[r.name] = (
                            rt.lift(rels[r.name].unionByName(new))
                            .localCheckpoint(eager=False)
                        )
                        counts[r.name] += n_new
                    else:
                        next_rels[r.name] = new  # late activation
                        counts[r.name] = n_new
                rels = next_rels
                deltas = new_deltas
                if not grew:
                    break
                factor = max(
                    2.0, 2.0 * sum(counts.values()) / max(total_before, 1)
                )
            else:
                raise RuntimeError(
                    f"mutually recursive rules {sorted(scc)} did not reach "
                    f"fixpoint in {MAX_FIXPOINT_ROUNDS} rounds; raise "
                    "dataworks_spark.docs.datalog.MAX_FIXPOINT_ROUNDS or "
                    "bound the rules"
                )

        # final relations into the memo env
        for n in rels:
            rule_env[n] = _lift(rels[n], self.spark)
        # a member that never activated derives the EMPTY relation —
        # the fixpoint converged, so re-evaluating any of its bodies
        # against the FINAL partner relations is empty by construction;
        # that evaluation (limit 0 for plan cheapness) supplies the
        # correctly-typed zero-row frame downstream calls bind against.
        pending = [r for r in members if r.name not in rule_env]
        progress = True
        while pending and progress:
            progress = False
            for r in list(pending):
                for body in r.bodies:
                    called = _called_names(body) & scc
                    if all(c in rule_env for c in called):
                        empty = (
                            self._eval_clauses(list(body), {}, rule_map, rule_env)
                            .select(*heads[r.name])
                            .limit(0)
                        )
                        rule_env[r.name] = empty
                        pending.remove(r)
                        progress = True
                        break
        if pending:
            # only reachable when seedless members call ONLY each other
            # (their sub-cycle can never derive or even type a row)
            raise ValueError(
                f"rules {sorted(r.name for r in pending)} have no seed "
                "body and call only each other — their relations are "
                "untypeably empty; give one a non-recursive body"
            )
        for n in scc:
            rule_env.pop(f"{n}@delta", None)

    def _eval_rule_inner(
        self, rule: "Rule", rule_map: dict[str, "Rule"], rule_env: dict[str, DataFrame]
    ) -> DataFrame:
        if rule.edge_attr is not None:
            ns, field = rule.edge_attr.split("/", 1)
            df, id_col = self.table(ns)
            edges = df.select(F.col(id_col).alias("src"), F.col(field).alias("dst")).dropna()
            closure = transitive_closure(edges, "src", "dst", depth_bound=rule.depth_bound)
            rel = closure.toDF("d1", "d2")  # canonical head column names
            rule_env[rule.name] = rel
            return rel

        head_vars = [_vcol(v) for v in rule.head]
        base: DataFrame | None = None
        rec_bodies: list[list[tuple]] = []
        for body in rule.bodies:
            if any(isinstance(c[0], str) and c[0] == rule.name for c in body):
                rec_bodies.append(list(body))
                continue
            b = self._eval_clauses(list(body), {}, rule_map, rule_env).select(*head_vars)
            base = b if base is None else base.unionByName(b)
        if base is None:
            raise ValueError(f"rule {rule.name} needs at least one non-recursive body")
        # non-eager: for a transitive rule the closure's seed count
        # materializes this in the same action; for semi-naive it's the
        # round-0 tag's count — either way one job instead of two
        rel = base.dropDuplicates().localCheckpoint(eager=False)
        if not rec_bodies:
            rule_env[rule.name] = rel
            return rel

        if self._is_transitive_rule(rule, rec_bodies):
            # Transitive-rule recognition: R(a,b) :- <base>; R(a,m),
            # R(m,b) is exactly the transitive closure of the base
            # relation, so compile to the log-depth path-doubling
            # operator (1 join/round, ⌈log₂ depth⌉ rounds) instead of
            # the general semi-naive loop, whose per-round plan
            # re-construction through the clause compiler costs ~2× per
            # materialization. Classic Datalog engine optimization —
            # semantics are identical (proved against the general path
            # and DuckDB WITH RECURSIVE in tests).
            closure = transitive_closure(
                rel,
                head_vars[0],
                head_vars[1],
                depth_bound=rule.depth_bound,
                assume_distinct=True,  # rel is a checkpointed dropDuplicates
            )
            rel = closure.select(*head_vars)
            rule_env[rule.name] = rel
            return rel

        # ONE Spark job per fixpoint round (mirrors ops.recursive): the
        # relation-so-far and the current delta live in a single
        # round-tagged DataFrame, whose non-eager localCheckpoint is
        # materialized BY the convergence count() — so each round is one
        # action instead of the eager-checkpoint + isEmpty + second-
        # checkpoint formulation's three. Convergence = the relation
        # stopped growing (the anti-join guarantees the union only adds
        # genuinely new tuples, so |rel| is strictly monotone).
        #
        # Round 0 (the base-relation dedup) materializes OUTSIDE
        # adaptive_rounds: its size is the output of arbitrary clause
        # joins — unknown until counted — so it keeps AQE's runtime
        # sizing; the loop rounds run AQE-off under exact-count sizing
        # (same split as ops.recursive._doubling's seed vs rounds).
        tagged = rel.withColumn("__round", F.lit(0)).localCheckpoint(eager=False)
        prev = tagged.count()
        # session from the relation, not self.spark: DatalogDB() is
        # constructible session-free (every other path derives sessions
        # from the registered DataFrames) and this was the one spot
        # that dereferenced the optional attribute (r9 review:
        # AttributeError only on general recursive rules)
        with adaptive_rounds(self.spark or rel.sparkSession) as rt:
            return self._fixpoint(
                rule, rule_map, rule_env, rec_bodies, head_vars, tagged, prev, rt
            )

    @staticmethod
    def _is_transitive_rule(rule: "Rule", rec_bodies: list[list[tuple]]) -> bool:
        """True iff the only recursive body is the self-transitivity
        chain ``(R ?a ?m) (R ?m ?b)`` for head ``(?a ?b)`` with a fresh
        middle variable — the shape whose fixpoint IS transitive
        closure of the non-recursive base."""
        if len(rec_bodies) != 1 or len(rule.head) != 2:
            return False
        body = rec_bodies[0]
        if len(body) != 2:
            return False
        c1, c2 = body
        if not (c1[0] == rule.name and c2[0] == rule.name):
            return False
        if len(c1) != 3 or len(c2) != 3:
            return False
        a, b = rule.head
        mid = c1[2]
        return (
            c1[1] == a
            and c2[1] == mid
            and c2[2] == b
            and _is_var(mid)
            and mid not in rule.head
        )

    def _fixpoint(
        self, rule, rule_map, rule_env, rec_bodies, head_vars, tagged, prev, rt
    ) -> DataFrame:
        delta_name = f"{rule.name}@delta"
        factor = 2.0  # growth-tracked sizing (ops/recursive._doubling note)
        for rnd in range(1, MAX_FIXPOINT_ROUNDS + 1):
            rt(int(prev * factor))
            rule_env[rule.name] = tagged.drop("__round")
            rule_env[delta_name] = tagged.filter(
                F.col("__round") == rnd - 1
            ).drop("__round")
            grown: DataFrame | None = None
            for body in rec_bodies:
                # one evaluation per self-call position, that position
                # rewritten to the delta sentinel
                positions = [
                    i
                    for i, c in enumerate(body)
                    if isinstance(c[0], str) and c[0] == rule.name
                ]
                for pos in positions:
                    variant = list(body)
                    variant[pos] = (delta_name, *body[pos][1:])
                    g = self._eval_clauses(variant, {}, rule_map, rule_env).select(*head_vars)
                    grown = g if grown is None else grown.unionByName(g)
            new = (
                grown.dropDuplicates()
                .join(tagged, on=head_vars, how="left_anti")
                .withColumn("__round", F.lit(rnd))
            )
            # lift the round's relation onto the loop session so its
            # checkpoint+count action plans under loop-sized confs
            # without touching the caller's session (adaptive_rounds)
            tagged = rt.lift(tagged.unionByName(new)).localCheckpoint(eager=False)
            cur = tagged.count()
            if cur == prev:
                break
            factor = max(2.0, 2.0 * cur / max(prev, 1))
            prev = cur
        else:
            # a silently partial relation is a wrong answer, not a result
            raise RuntimeError(
                f"rule {rule.name!r} did not reach fixpoint in "
                f"{MAX_FIXPOINT_ROUNDS} rounds; raise "
                "dataworks_spark.docs.datalog.MAX_FIXPOINT_ROUNDS or bound the rule"
            )
        rel = _lift(tagged.drop("__round"), self.spark)
        rule_env[rule.name] = rel
        rule_env.pop(delta_name, None)
        return rel
