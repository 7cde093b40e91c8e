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
