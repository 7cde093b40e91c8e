"""Datalog-lite compiler tests — re-expressions of the reference's
actual query call sites (SURVEY §7.1 step 4)."""

import pytest
from pyspark.sql import functions as F

from dataworks_spark.docs.datalog import DatalogDB, Rule
from dataworks_spark.session import load_table


@pytest.fixture(scope="module")
def db(spark, sf_dir):
    d = DatalogDB(spark)
    d.register("customer", load_table(spark, sf_dir, "customer"), "c_custkey")
    d.register("nation", load_table(spark, sf_dir, "nation"), "n_nationkey")
    d.register("events", load_table(spark, sf_dir, "events"), "event_id")
    return d


def test_attribute_projection_self_join(db, spark, sf_dir):
    """utils/alert.clj:10-15 shape: one entity var, three attribute
    patterns → wide-row projection (C1)."""
    out = db.q(
        find=["?id", "?name", "?bal"],
        where=[
            ("?id", "customer/c_name", "?name"),
            ("?id", "customer/c_acctbal", "?bal"),
            ("?id", "customer/c_mktsegment"),  # existence pattern
        ],
    )
    assert out.columns == ["id", "name", "bal"]
    assert out.count() == load_table(spark, sf_dir, "customer").count()


def test_constant_bound_and_predicate(db):
    """collector.clj:74-78 constant-bound + auth.clj:92-96 predicate."""
    out = db.q(
        find=["?id", "?name"],
        where=[
            ("?id", "customer/c_mktsegment", "BUILDING"),
            ("?id", "customer/c_name", "?name"),
            ("starts-with?", "?name", "Customer#00000000"),
        ],
    )
    rows = out.collect()
    assert all(r.name.startswith("Customer#00000000") for r in rows)
    assert 0 < len(rows) < 100


def test_multi_entity_unification(db, spark, sf_dir):
    """db/app_db.clj:128-132: two entities bound by a shared var (C2)."""
    out = db.q(
        find=["?c", "?nname"],
        where=[
            ("?c", "customer/c_nationkey", "?nk"),
            ("?n", "nation/n_nationkey", "?nk"),
            ("?n", "nation/n_name", "?nname"),
        ],
    )
    expect = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("c"), F.col("n_name").alias("nname"))
        .dropDuplicates()
    )
    assert out.exceptAll(expect).isEmpty() and expect.exceptAll(out).isEmpty()


def test_parameterized_args(db):
    """db/app_db.clj:117-120 :args injection (C4)."""
    out = db.q(
        find=["?name"],
        where=[("?id", "customer/c_name", "?name")],
        args={"?id": 42},
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].name == "Customer#000000042"


def test_recursive_rule(db, spark):
    """db/app_db.clj:121-126 `(depends d1 d2)` transitive closure (C5)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "fid string, dep string"
    )
    db.register("fn", edges, "fid")
    out = db.q(
        find=["?d2"],
        where=[("depends", "?d1", "?d2")],
        args={"?d1": "a"},
        rules=[Rule("depends", "fn/dep")],
    )
    assert sorted(r.d2 for r in out.collect()) == ["b", "c", "d"]


def test_negation_anti_join(db, spark, sf_dir):
    """Datalog `not` → anti-join: nations with NO customer."""
    db.register("customer2", load_table(spark, sf_dir, "customer"), "c_custkey")
    out = db.q(
        find=["?n", "?nname"],
        where=[
            ("?n", "nation/n_name", "?nname"),
            ("not", ("?c", "customer2/c_nationkey", "?n")),
        ],
    )
    cust_nations = {
        r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").select("c_nationkey").distinct().collect()
    }
    got = {r.n for r in out.collect()}
    all_nations = {
        r.n_nationkey
        for r in load_table(spark, sf_dir, "nation").select("n_nationkey").collect()
    }
    assert got == all_nations - cust_nations


def test_or_clause_union(db, spark, sf_dir):
    """`or` → union of branch bindings: customers in BUILDING or
    MACHINERY segments."""
    out = db.q(
        find=["?c"],
        where=[
            ("or",
             ("?c", "customer/c_mktsegment", "BUILDING"),
             ("?c", "customer/c_mktsegment", "MACHINERY")),
        ],
    )
    expect = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .count()
    )
    assert out.count() == expect


def test_callable_predicate(db):
    out = db.q(
        find=["?id"],
        where=[
            ("?id", "events/value", "?v"),
            (lambda v: v > 300.0, "?v"),
        ],
    )
    assert out.count() > 0


def test_or_multi_clause_branches(db, spark, sf_dir):
    """Crux multi-clause or-branches (db/app_db.clj surface): BUILDING
    customers with acctbal > 5000 OR MACHINERY customers with
    acctbal < 0 — each branch an `and` of triples + a predicate."""
    out = db.q(
        find=["?c", "?b"],
        where=[
            ("or",
             ("and",
              ("?c", "customer/c_mktsegment", "BUILDING"),
              ("?c", "customer/c_acctbal", "?b"),
              (">", "?b", 5000.0)),
             ("and",
              ("?c", "customer/c_mktsegment", "MACHINERY"),
              ("?c", "customer/c_acctbal", "?b"),
              ("<", "?b", 0.0))),
        ],
    )
    c = load_table(spark, sf_dir, "customer")
    expect = c.filter(
        ((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000))
        | ((F.col("c_mktsegment") == "MACHINERY") & (F.col("c_acctbal") < 0))
    ).count()
    assert out.count() == expect


def test_or_branches_must_bind_same_vars(db):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="same variables"):
        db.q(
            find=["?c"],
            where=[
                ("or",
                 ("?c", "customer/c_mktsegment", "BUILDING"),
                 ("and",
                  ("?c", "customer/c_mktsegment", "MACHINERY"),
                  ("?c", "customer/c_acctbal", "?b"))),
            ],
        ).collect()


def test_general_rule_nonrecursive_multiway(db, spark, sf_dir):
    """General rule with a multi-way body (no recursion): nations
    colocated in the same region."""
    n = load_table(spark, sf_dir, "nation")
    db.register("nat", n, "n_nationkey")
    colocated = Rule(
        "colocated",
        head=("?a", "?b"),
        bodies=[[
            ("?a", "nat/n_regionkey", "?r"),
            ("?b", "nat/n_regionkey", "?r"),
        ]],
    )
    out = db.q(
        find=["?b"], where=[("colocated", "?a", "?b")], args={"?a": 3}, rules=[colocated]
    )
    region_of_3 = n.filter(F.col("n_nationkey") == 3).first()["n_regionkey"]
    expect = {r.n_nationkey for r in n.filter(F.col("n_regionkey") == region_of_3).collect()}
    assert {r.b for r in out.collect()} == expect


def test_general_rule_nonlinear_recursion(db, spark):
    """Nonlinear recursive rule: reach(a,b) := edge(a,b) |
    reach(a,m) ∧ reach(m,b) — two self-calls in one body."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "fid string, dep string",
    )
    db.register("fn2", edges, "fid")
    reach = Rule(
        "reach",
        head=("?s", "?t"),
        bodies=[
            [("?s", "fn2/dep", "?t")],
            [("reach", "?s", "?m"), ("reach", "?m", "?t")],
        ],
    )
    out = db.q(find=["?t"], where=[("reach", "?s", "?t")], args={"?s": "a"}, rules=[reach])
    assert sorted(r.t for r in out.collect()) == ["b", "c", "d", "e"]


def test_general_rule_linear_recursion_not_tc_shortcut(db, spark):
    """LINEAR recursive rule — reach(a,b) := edge(a,b) | reach(a,m) ∧
    edge(m,b). The transitive-rule recognizer must NOT fire (only one
    self-call), so this pins the general semi-naive fixpoint path."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "fid string, dep string",
    )
    db.register("fn3", edges, "fid")
    reach = Rule(
        "reach3",
        head=("?s", "?t"),
        bodies=[
            [("?s", "fn3/dep", "?t")],
            [("reach3", "?s", "?m"), ("?m", "fn3/dep", "?t")],
        ],
    )
    out = db.q(find=["?t"], where=[("reach3", "?s", "?t")], args={"?s": "a"}, rules=[reach])
    assert sorted(r.t for r in out.collect()) == ["b", "c", "d", "e"]


def test_transitive_recognizer_shape_gate():
    """The recognizer fires ONLY on the exact self-transitivity chain."""
    from dataworks_spark.docs.datalog import DatalogDB

    tc = [[("r", "?a", "?m"), ("r", "?m", "?b")]]
    r = Rule("r", head=("?a", "?b"), bodies=[[("?a", "e/d", "?b")], tc[0]])
    assert DatalogDB._is_transitive_rule(r, tc)
    # middle var appearing in the head → not plain closure
    bad = [[("r", "?a", "?b"), ("r", "?b", "?b")]]
    r2 = Rule("r", head=("?a", "?b"), bodies=[[("?a", "e/d", "?b")], bad[0]])
    assert not DatalogDB._is_transitive_rule(r2, bad)
    # linear recursion (one self-call) → general path
    lin = [[("r", "?a", "?m"), ("?m", "e/d", "?b")]]
    r3 = Rule("r", head=("?a", "?b"), bodies=[[("?a", "e/d", "?b")], lin[0]])
    assert not DatalogDB._is_transitive_rule(r3, lin)


# ── r9 fourth-review regressions ─────────────────────────────────────


def _mini_db(spark):
    from dataworks_spark.docs.datalog import DatalogDB

    db = DatalogDB()
    df = spark.createDataFrame(
        [("alert-1", "h1", "alert-1"), ("alert-2", "h2", "x")],
        "id string, handler string, self_ref string",
    )
    db.register("alert", df, "id")
    return db


def test_constant_entity_term_filters_id(spark):
    """r9 review: a constant in the entity position was treated as a
    variable (first char stripped, no id filter) — the natural Crux
    point lookup returned EVERY entity."""
    db = _mini_db(spark)
    got = db.q(find=["?h"], where=[("alert-1", "alert/handler", "?h")]).collect()
    assert [r.h for r in got] == ["h1"]
    # all-constant triple = existence gate
    assert db.q(
        find=["?h"],
        where=[("?e", "alert/handler", "?h"), ("alert-1", "alert/handler", "h1")],
    ).count() == 2
    assert db.q(
        find=["?h"],
        where=[("?e", "alert/handler", "?h"), ("alert-1", "alert/handler", "nope")],
    ).count() == 0


def test_repeated_variable_unifies(spark):
    """r9 review: (?x attr ?x) produced two same-named columns
    (AMBIGUOUS_REFERENCE downstream) instead of an equality filter."""
    db = _mini_db(spark)
    got = db.q(find=["?x"], where=[("?x", "alert/self_ref", "?x")]).collect()
    assert [r.x for r in got] == ["alert-1"]


def test_unbound_qmark_arg_raises(spark):
    """r9 review: a typo'd ?arg silently returned the full unfiltered
    result; Crux errors on undeclared :in bindings."""
    import pytest

    db = _mini_db(spark)
    with pytest.raises(ValueError, match="binds no variable"):
        db.q(
            find=["?h"],
            where=[("?e", "alert/handler", "?h")],
            args={"?typo": "h1"},
        )


def test_mutual_recursion_joint_fixpoint(spark):
    """r10 (VERDICT #5): A<->B rules evaluate as one joint semi-naive
    fixpoint (r9 raised a clear error; Crux — the reference's rule
    engine, app_db.clj:121-126 — evaluates these). ra = edge ∪ rb∘edge…
    here ra/rb both converge to the transitive closure of the chain."""
    from dataworks_spark.docs.datalog import DatalogDB, Rule

    db = DatalogDB()
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "id string, next string")
    db.register("edge", edges, "id")
    rule_a = Rule(
        name="ra",
        head=("?x", "?y"),
        bodies=[
            [("?x", "edge/next", "?y")],
            [("rb", "?x", "?m"), ("ra", "?m", "?y")],
        ],
    )
    rule_b = Rule(
        name="rb",
        head=("?x", "?y"),
        bodies=[[("ra", "?x", "?y")]],
    )
    got = {
        (r.x, r.y)
        for r in db.q(
            find=["?x", "?y"],
            where=[("ra", "?x", "?y")],
            rules=[rule_a, rule_b],
        ).collect()
    }
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}


def _evenodd_rules():
    from dataworks_spark.docs.datalog import Rule

    odd = Rule(
        name="odd",
        head=("?x", "?y"),
        bodies=[
            [("?x", "edge/next", "?y")],
            [("even", "?x", "?m"), ("?m", "edge/next", "?y")],
        ],
    )
    # even has NO non-recursive body: late activation — its relation
    # first exists when round 1 derives it from odd's seed
    even = Rule(
        name="even",
        head=("?x", "?y"),
        bodies=[[("odd", "?x", "?m"), ("?m", "edge/next", "?y")]],
    )
    return odd, even


def test_mutual_recursion_even_odd_matches_duckdb(spark):
    """The judge's done-condition for VERDICT #5: even/odd path parity
    over a CYCLIC graph (4-cycle + tail — an even cycle keeps the two
    parities disjoint and the fixpoint must terminate on revisits),
    checked against a DuckDB WITH RECURSIVE parity twin."""
    import duckdb

    from dataworks_spark.docs.datalog import DatalogDB

    edge_rows = [("n0", "n1"), ("n1", "n2"), ("n2", "n3"), ("n3", "n0"), ("n3", "n4")]
    db = DatalogDB()
    edges = spark.createDataFrame(edge_rows, "id string, next string")
    db.register("edge", edges, "id")
    odd, even = _evenodd_rules()

    con = duckdb.connect()
    con.execute("CREATE TABLE edges(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edge_rows)
    oracle = {}
    for tag, cond in [("odd", "odd"), ("even", "NOT odd")]:
        oracle[tag] = set(
            map(
                tuple,
                con.execute(
                    f"""
                    WITH RECURSIVE r(src, dst, odd) AS (
                        SELECT src, dst, true FROM edges
                        UNION
                        SELECT r.src, e.dst, NOT r.odd
                        FROM r JOIN edges e ON r.dst = e.src
                    )
                    SELECT DISTINCT src, dst FROM r WHERE {cond}
                    """
                ).fetchall(),
            )
        )
    for tag in ("odd", "even"):
        got = {
            (r.x, r.y)
            for r in db.q(
                find=["?x", "?y"],
                where=[(tag, "?x", "?y")],
                rules=[odd, even],
            ).collect()
        }
        assert got == oracle[tag], tag
    # sanity: the parity classes are nonempty and disjoint on this graph
    assert oracle["odd"] and oracle["even"] and not (oracle["odd"] & oracle["even"])


def test_mutual_recursion_empty_seed_member(spark):
    """A seedless member over a derivation that never fires must come
    back as a correctly-typed EMPTY relation, not an error: odd's base
    is empty (no edges), so even never activates."""
    from dataworks_spark.docs.datalog import DatalogDB

    db = DatalogDB(spark)
    edges = spark.createDataFrame([], "id string, next string")
    db.register("edge", edges, "id")
    odd, even = _evenodd_rules()
    out = db.q(
        find=["?x", "?y"], where=[("even", "?x", "?y")], rules=[odd, even]
    )
    assert out.count() == 0 and out.columns == ["x", "y"]


def test_mutual_recursion_seedless_member_in_two_call_body(spark):
    """r10 review (verified live pre-fix): a seedless member (ra)
    consumed at a FULL position of a partner's two-recursive-call body
    drove _eval_mutual_scc into unbounded self-re-entry — mid-round rel
    updates desynced `rels` from `rule_env`, so _apply_rule_call fell
    through to _eval_rule and restarted the SCC fixpoint on identical
    state. Relations now update synchronously at round end.

    Fixpoint by hand on chain a→b→c→d: ra = rb∘edge, rb = edge ∪ ra∘rb
    → ra = {(a,c),(b,d)}, rb = edge ∪ {(a,d)}."""
    from dataworks_spark.docs.datalog import DatalogDB, Rule

    db = DatalogDB()
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "id string, next string"
    )
    db.register("edge", edges, "id")
    ra = Rule(
        name="ra",
        head=("?x", "?y"),
        bodies=[[("rb", "?x", "?m"), ("?m", "edge/next", "?y")]],
    )
    rb = Rule(
        name="rb",
        head=("?x", "?y"),
        bodies=[
            [("?x", "edge/next", "?y")],
            [("ra", "?x", "?m"), ("rb", "?m", "?y")],
        ],
    )
    got_rb = {
        (r.x, r.y)
        for r in db.q(find=["?x", "?y"], where=[("rb", "?x", "?y")], rules=[ra, rb]).collect()
    }
    assert got_rb == {("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")}
    got_ra = {
        (r.x, r.y)
        for r in db.q(find=["?x", "?y"], where=[("ra", "?x", "?y")], rules=[ra, rb]).collect()
    }
    assert got_ra == {("a", "c"), ("b", "d")}


def test_mutual_recursion_nested_call_raises(spark):
    """Recursive calls inside or-branches cannot be delta-rewritten;
    the compiler must say so instead of silently under-deriving."""
    import pytest

    from dataworks_spark.docs.datalog import DatalogDB, Rule

    db = DatalogDB()
    edges = spark.createDataFrame([("a", "b")], "id string, next string")
    db.register("edge", edges, "id")
    ra = Rule(
        name="ra",
        head=("?x", "?y"),
        bodies=[
            [("?x", "edge/next", "?y")],
            [("or", ("rb", "?x", "?y"), ("?x", "edge/next", "?y"))],
        ],
    )
    rb = Rule(name="rb", head=("?x", "?y"), bodies=[[("ra", "?x", "?y")]])
    with pytest.raises(ValueError, match="nested"):
        db.q(find=["?x", "?y"], where=[("ra", "?x", "?y")], rules=[ra, rb]).collect()


def test_transitive_closure_validates_method_and_bound(spark):
    import pytest

    from dataworks_spark.ops.recursive import transitive_closure

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="unknown method"):
        transitive_closure(edges, method="Doubling")
    with pytest.raises(ValueError, match="doubling-path"):
        transitive_closure(edges, method="semi_naive", depth_bound=8)


def test_mutual_recursion_three_member_scc(spark):
    """Three-member SCC (mod-3 path length classes over a chain +
    cycle): r0/r1/r2 call each other in a ring — r1 and r2 are
    seedless (late activation chains one round apart), and on a 3-cycle
    every class is eventually populated. Checked against a DuckDB
    WITH RECURSIVE mod-3 parity oracle."""
    import duckdb

    from dataworks_spark.docs.datalog import DatalogDB, Rule

    edge_rows = [("n0", "n1"), ("n1", "n2"), ("n2", "n0"), ("n2", "n3")]
    db = DatalogDB()
    db.register("edge", spark.createDataFrame(edge_rows, "id string, next string"), "id")
    # r0 = paths of length ≡ 1 (mod 3): edge ∪ r2∘edge; r1 = r0∘edge;
    # r2 = r1∘edge — a ring where only r0 has a seed body
    r0 = Rule(
        name="r0",
        head=("?x", "?y"),
        bodies=[
            [("?x", "edge/next", "?y")],
            [("r2", "?x", "?m"), ("?m", "edge/next", "?y")],
        ],
    )
    r1 = Rule(
        name="r1",
        head=("?x", "?y"),
        bodies=[[("r0", "?x", "?m"), ("?m", "edge/next", "?y")]],
    )
    r2 = Rule(
        name="r2",
        head=("?x", "?y"),
        bodies=[[("r1", "?x", "?m"), ("?m", "edge/next", "?y")]],
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE edges(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edge_rows)
    for tag, residue in [("r0", 1), ("r1", 2), ("r2", 0)]:
        oracle = set(
            map(
                tuple,
                con.execute(
                    f"""
                    WITH RECURSIVE r(src, dst, m) AS (
                        SELECT src, dst, 1 FROM edges
                        UNION
                        SELECT r.src, e.dst, (r.m + 1) % 3
                        FROM r JOIN edges e ON r.dst = e.src
                    )
                    SELECT DISTINCT src, dst FROM r WHERE m = {residue}
                    """
                ).fetchall(),
            )
        )
        got = {
            (r.x, r.y)
            for r in db.q(
                find=["?x", "?y"], where=[(tag, "?x", "?y")], rules=[r0, r1, r2]
            ).collect()
        }
        assert got == oracle, tag
        assert got, tag  # every class nonempty on a 3-cycle graph


def test_find_aggregates_count_sum_min_max(db, spark, sf_dir):
    """Crux/Datomic `:find [(count ?e) (sum ?v) …]` aggregates (r10
    VERDICT #4): plain find vars group, aggregate forms aggregate, all
    over the DISTINCT binding set (a Datalog result is a relation)."""
    out = db.q(
        find=[
            "?seg",
            ("count", "?c"),
            ("sum", "?bal"),
            ("min", "?bal"),
            ("max", "?bal"),
            ("avg", "?bal", "mean_bal"),
        ],
        where=[
            ("?c", "customer/c_mktsegment", "?seg"),
            ("?c", "customer/c_acctbal", "?bal"),
        ],
    )
    assert out.columns == ["seg", "count_c", "sum_bal", "min_bal", "max_bal", "mean_bal"]
    got = {r.seg: r for r in out.collect()}
    cust = load_table(spark, sf_dir, "customer")
    exp = {
        r.c_mktsegment: r
        for r in cust.groupBy("c_mktsegment")
        .agg(
            F.count("c_custkey").alias("n"),
            F.sum("c_acctbal").alias("s"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
            F.avg("c_acctbal").alias("m"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for seg, e in exp.items():
        g = got[seg]
        assert g.count_c == e.n and g.min_bal == e.lo and g.max_bal == e.hi
        assert abs(g.sum_bal - e.s) < 1e-6 and abs(g.mean_bal - e.m) < 1e-9


def test_find_aggregates_global_and_count_distinct(db, spark, sf_dir):
    """No plain find var → ONE global row; count-distinct counts the
    distinct bound values."""
    out = db.q(
        find=[("count", "?c"), ("count-distinct", "?seg")],
        where=[("?c", "customer/c_mktsegment", "?seg")],
    )
    rows = out.collect()
    cust = load_table(spark, sf_dir, "customer")
    assert len(rows) == 1
    assert rows[0].count_c == cust.count()
    assert rows[0].count_distinct_seg == cust.select("c_mktsegment").distinct().count()


def test_find_aggregates_set_semantics_and_with(db, spark, sf_dir):
    """Aggregation runs over the DISTINCT find(+with) bindings — two
    derivations of one tuple count once; Datomic's :with re-admits
    meaningful duplicates without returning the extra var."""
    d = DatalogDB(db.spark if hasattr(db, "spark") else None)
    from pyspark.sql import Row

    ev = spark.createDataFrame(
        [
            Row(eid=1, user="u1", amount=10.0),
            Row(eid=2, user="u1", amount=10.0),  # same (user, amount), different event
            Row(eid=3, user="u2", amount=5.0),
        ]
    )
    d.register("ev", ev, "eid")
    find = ["?u", ("sum", "?amt")]
    where = [("?e", "ev/user", "?u"), ("?e", "ev/amount", "?amt")]
    # set semantics: (u1, 10.0) appears once -> sum 10
    got = {r.u: r.sum_amt for r in d.q(find, where).collect()}
    assert got == {"u1": 10.0, "u2": 5.0}
    # :with ?e preserves the two distinct events -> sum 20
    got_w = {r.u: r.sum_amt for r in d.q(find, where, with_=["?e"]).collect()}
    assert got_w == {"u1": 20.0, "u2": 5.0}


def test_find_aggregates_errors(db):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown find aggregate"):
        db.q(
            find=[("median", "?bal")],
            where=[("?c", "customer/c_acctbal", "?bal")],
        )
    with _pytest.raises(ValueError, match="unbound variable"):
        db.q(
            find=[("count", "?nope")],
            where=[("?c", "customer/c_acctbal", "?bal")],
        )
    # r12 ADVICE low: plain grouping find vars and with_ vars get the
    # same friendly error, not an opaque AnalysisException
    with _pytest.raises(ValueError, match="find/with variable '\\?ghost'"):
        db.q(
            find=["?ghost", ("count", "?c")],
            where=[("?c", "customer/c_acctbal", "?bal")],
        )
    with _pytest.raises(ValueError, match="find/with variable '\\?ghost'"):
        db.q(
            find=[("count", "?c")],
            where=[("?c", "customer/c_acctbal", "?bal")],
            with_=["?ghost"],
        )
    with _pytest.raises(ValueError, match="find/with variable '\\?ghost'"):
        db.q(
            find=["?bal"],
            where=[("?c", "customer/c_acctbal", "?bal")],
            with_=["?ghost"],
        )


def test_with_without_aggregates_is_bag_semantics(spark):
    """Datomic's :with changes NON-aggregated results too: distinct-ness
    is judged over find+with, the with column is dropped, so a
    find-tuple repeats once per distinct with-binding (r12 ADVICE low —
    with_ used to be silently ignored on this branch)."""
    from pyspark.sql import Row

    from dataworks_spark.docs.datalog import DatalogDB

    d = DatalogDB(spark)
    ev = spark.createDataFrame(
        [
            Row(eid=1, user="u1", amount=10.0),
            Row(eid=2, user="u1", amount=10.0),  # same (user, amount) pair
            Row(eid=3, user="u2", amount=5.0),
        ]
    )
    d.register("ev", ev, "eid")
    where = [("?e", "ev/user", "?u"), ("?e", "ev/amount", "?amt")]
    # set semantics: (u1, 10.0) once
    plain = sorted((r.u, r.amt) for r in d.q(["?u", "?amt"], where).collect())
    assert plain == [("u1", 10.0), ("u2", 5.0)]
    # :with ?e: one row per distinct event
    bag = sorted(
        (r.u, r.amt) for r in d.q(["?u", "?amt"], where, with_=["?e"]).collect()
    )
    assert bag == [("u1", 10.0), ("u1", 10.0), ("u2", 5.0)]
    # the with column itself is not returned
    cols = d.q(["?u", "?amt"], where, with_=["?e"]).columns
    assert sorted(cols) == ["amt", "u"]
