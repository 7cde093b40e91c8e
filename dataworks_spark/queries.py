"""Oracle-matched query inventory (SURVEY §2 / §7.3 driver contract).

Each ``q_*`` builder takes ``(spark, sf_dir)`` and returns a DataFrame;
``ORACLE_SQL`` holds the ANSI-SQL equivalent DuckDB runs on the same
parquet (views pre-registered per table name). Conventions keeping the
order-insensitive value-hash comparable across engines:

  - every computed column is aliased identically in both engines;
  - order-dependent float reductions (sum/avg over groups, running
    sums, cosine scores) are ROUNDed in BOTH engines — partial
    aggregation order differs between Spark and DuckDB in the last
    ulp; per-row arithmetic is left raw (bit-identical IEEE ops);
  - window orderings always include a unique tiebreaker column;
  - count()/year()/… integer outputs are cast so both engines emit the
    same integer width.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataworks_spark import ops
from dataworks_spark.docs.store import as_of_snapshot, latest_snapshot, version_log
from dataworks_spark.functions.arrays import cosine_similarity, dot
from dataworks_spark.functions.timeops import NEVER
from dataworks_spark.ops.joins import asof_join, versions_with_validity
from dataworks_spark.session import load_table


#: per-(app, sf_dir) memo of cached fixture tables — see :func:`_t`.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

#: per-(app, sf_dir) memo of the ANN demo query vector (vec_id 0). The
#: vector is a QUERY PARAMETER, not a result — fetching it is one
#: driver-side job that a repeated-query harness shouldn't re-pay.
_QVEC_CACHE: dict[tuple[str, str], list[float]] = {}

#: per-(app, sf_dir, table) memo of fixture row counts — table
#: cardinality is fixed for a given sf_dir, so sizing decisions that
#: need it (q_semantic_dedup's n_clusters ∝ n) should cost one parquet
#: footer read per session, not one job per query call.
_COUNT_CACHE: dict[tuple[str, str, str], int] = {}


def _table_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    n = _COUNT_CACHE.get(key)
    if n is None:
        n = _t(spark, sf_dir, name).count()
        _COUNT_CACHE[key] = n
    return n

#: per-(app, sf_dir, kind, corpus-fingerprint) memo of prebuilt ANN
#: indexes (LSH buckets / IVF inverted lists) and trained quantizers.
#: Index BUILD is ingest-time work (at 100 TB the bucket column is a
#: partition column written once); only the probe is query-time.
#: Caching the index — never query results — mirrors that. r14 (r13
#: VERDICT #1): the key carries a DATA fingerprint of the source table
#: (session.table_fingerprint), not just its path — the memo is the
#: in-session face of the sidecar a 100 TB deployment persists, and a
#: table mutating under a stable path must force retrain, never serve
#: stale centroids. (The fixture _TABLE_CACHE stays path-keyed by
#: design: it is a session-local Spark cache over immutable bench
#: fixtures, not an artifact that outlives the data it was built from.)
_ANN_INDEX_CACHE: dict[tuple[str, str, str, str], object] = {}

#: wall-clock seconds each fingerprint-keyed asset build cost THIS
#: process (kind → cumulative seconds across rebuilds). Written by
#: :func:`_ann_cached` around its ``build()`` call; bench.py reads it
#: after the run to decompose the COLD pass into asset-build time vs
#: first-query time (r15 VERDICT #2: the cold headline is otherwise
#: unattributable when the builds move between rounds). Eager builds
#: (persist+count, ivf_train) are fully counted; lazy index builds
#: (LshIndex plan construction) count only their driver-side cost —
#: their materialization lands in the owning query's first pass.
ASSET_BUILD_SECONDS: dict[str, float] = {}

def _release(val) -> None:
    """Best-effort unpersist of a cache value: DataFrames directly,
    index objects (LshIndex/IvfIndex) via their cached .df; plain
    arrays/lists no-op."""
    for target in (val, getattr(val, "df", None)):
        try:
            target.unpersist()
        except Exception:  # noqa: BLE001 — non-DataFrame / stopped context
            pass


def _ann_cached(spark: SparkSession, sf_dir: str, kind: str, build,
                table: str = "embeddings"):
    """Fingerprint-keyed train-once memo for derived artifacts — ANN
    indexes / quantizers (r13 VERDICT #1) and, since r15, the winnowing
    fingerprint relation (``table="documents"``). The fingerprint probe
    is a pure FS-metadata fold (no job — see session.table_fingerprint),
    recomputed on EVERY call so a mutation of the source table between
    calls is caught at the next query: the stale entry is evicted (its
    cached relation unpersisted) and ``build`` retrains. Stale
    artifacts are thereby impossible by construction, not by fixture
    convention."""
    from dataworks_spark.session import table_fingerprint, table_path

    app = spark.sparkContext.applicationId
    fp = table_fingerprint(spark, table_path(sf_dir, table))
    key = (app, sf_dir, kind, fp)
    idx = _ANN_INDEX_CACHE.get(key)
    if idx is None:
        for stale in [k for k in _ANN_INDEX_CACHE if k[:3] == key[:3] and k != key]:
            _release(_ANN_INDEX_CACHE.pop(stale))
        t0 = time.perf_counter()
        idx = build()
        ASSET_BUILD_SECONDS[kind] = round(
            ASSET_BUILD_SECONDS.get(kind, 0.0) + time.perf_counter() - t0, 4
        )
        _ANN_INDEX_CACHE[key] = idx
    return idx


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    key = (spark.sparkContext.applicationId, sf_dir)
    v = _QVEC_CACHE.get(key)
    if v is None:
        e = _t(spark, sf_dir, "embeddings")
        v = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
        _QVEC_CACHE[key] = v
    return v

#: fact tables big enough to repartition at cache-build time. The sf
#: fixtures are single parquet files → a single scan partition → all
#: per-row work runs on ONE core without this. Dimensions stay
#: single-partition (they broadcast anyway).
_WIDE_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}

#: of those, tables whose queries are CPU-bound per row (shingling,
#: n-gram hashing, 64-way MinHash) get FULL parallelism; the rest are
#: bytes-light at bench scale, where 32 cached partitions means 32
#: near-empty tasks per scan stage and task scheduling — not work —
#: dominates (measured 2× on scan/agg steady time). Spark's own sizing
#: guidance: partitions should hold real bytes; at cluster scale the
#: same policy yields cluster-wide counts because it's driven by
#: parallelism, with per-row-cost tables pinned to the full lane count.
_COMPUTE_HEAVY = {"documents"}


def _evict_stale(cache: dict, app_id: str) -> None:
    """Drop (and unpersist) cache entries from dead applications: the
    memo keys lead with applicationId, so a long-lived process spanning
    several sessions would otherwise accumulate persisted RDDs forever.
    Unpersist is best-effort — the old app's context may be stopped."""
    for key in [k for k in cache if k[0] != app_id]:
        _release(cache.pop(key))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized, memory-cached fixture table.

    Repeated-query harnesses (driver correctness pass, bench) touch each
    table dozens of times; caching turns ~50 parquet scans per table
    into one materialization + in-memory column-pruned reads. This is a
    bounded-fixture tactic: at cluster scale the same role is played by
    broadcast dims and bucketed hot tables — never a full-corpus cache."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    app_id = spark.sparkContext.applicationId
    _evict_stale(_TABLE_CACHE, app_id)
    _evict_stale(_QVEC_CACHE, app_id)
    _evict_stale(_ANN_INDEX_CACHE, app_id)
    _evict_stale(_COUNT_CACHE, app_id)
    key = (app_id, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = load_table(spark, sf_dir, name)
        if name in _WIDE_TABLES:
            par = spark.sparkContext.defaultParallelism
            df = df.repartition(par if name in _COMPUTE_HEAVY else max(2, par // 4))
        df = df.cache()
        _TABLE_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# A8 / B1 / B2 — scan, filter, project
# ---------------------------------------------------------------------------

def q_scan_filter_topk(spark, sf_dir):
    """Scan→range-filter→project→sort→top-k in one pipeline (SURVEY
    B1/B2 map/filter, C9 range/interval predicate — the alert due-check
    shape utils/alert.clj:33-42 — and F1/F3 sort+take; reference
    transducers stream.clj:41-48). The whole thing compiles to a
    parquet scan with pushed range predicates + TakeOrderedAndProject:
    only k rows per partition ever move."""
    li = _t(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )
    return ops.top_k(
        filtered,
        order_by=[F.col("disc_price").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        k=100,
    )


# B3 — implicit nil-drop (reference composes (filter some?), stream.clj:47)
# — exercised inside q_window_functions (the lag column's leading nulls
# are dropped through ops.nil_drop), per the §7.3 consolidation.


# B7/B8 — predicate filter + entity point lookup in one scan
# (utils/auth.clj:92-96 starts-with; db/app_db.clj:45-48 entity)

def q_lookup_pred(spark, sf_dir):
    """Point lookup (B8) unioned with a Datalog-style predicate filter
    (B7) over the same entity set — one parquet scan, both predicates
    pushed (`c_custkey = 42 OR c_name LIKE …`)."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_custkey") == 42) | F.col("c_name").startswith("Customer#000000")
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# C2/C3 — star join (multi-entity Datalog unification, db/app_db.clj:128-132)
# ---------------------------------------------------------------------------

def q_join_star(spark, sf_dir):
    """Flagship: revenue by region/nation for 1996 orders. Dimensions
    broadcast; the lineitem⋈orders join is the only fact shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    joined = ops.star_join(
        li,
        [
            (o, F.col("l_orderkey") == F.col("o_orderkey")),
            (_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey")),
            (_t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey")),
            (_t(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey")),
        ],
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.round(F.sum(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2)
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# C6 — semi/anti join (collector.clj:69-82 existence; auth.clj:90-100 uniqueness)

def q_join_semi_anti(spark, sf_dir):
    """Semi + anti existence joins (C6) plus the left-OUTER enrichment
    branch (Datalog option → outer) folded into one tagged relation —
    the §7.3 consolidation of the former q_join_outer: the outer branch
    left-joins per-customer order counts (zero included via coalesce)
    and aggregates them per segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    on = F.col("c_custkey") == F.col("o_custkey")
    with_orders = (
        ops.semi_join(c, o, on)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("tag", F.lit("with_orders"))
    )
    without = (
        ops.anti_join(c, o, on)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("tag", F.lit("no_orders"))
    )
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    outer = (
        c.join(counts, c.c_custkey == counts.o_custkey, "left")
        .select(
            "c_mktsegment",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
        .groupBy("c_mktsegment")
        .agg(F.sum("n_orders").alias("n"))
        .withColumn("tag", F.lit("outer_orders"))
    )
    return (
        with_orders.unionByName(without).unionByName(outer)
        .select("tag", "c_mktsegment", "n")
    )


# C8 — as-of (temporal point) join (db/app_db.clj:37-43 bitemporal arity)

def q_join_asof(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    versions = versions_with_validity(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value", "event_id"
        ),
        key="user_id",
        ts="ts",
        # unique tiebreak: two purchases at one (user, ts) — which the
        # scaled fixtures' with-replacement sampling can produce — must
        # resolve by DATA, not shuffle order, and identically in the
        # oracle (r10 review)
        tiebreak=("event_id",),
    ).select(
        F.col("user_id").alias("v_user_id"),
        "valid_from",
        "valid_to",
        F.col("value").alias("asof_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return asof_join(
        clicks, versions, fact_key="user_id", version_key="v_user_id", fact_ts="ts"
    ).select("event_id", "user_id", "ts", "asof_value")


# C7 — lookup enrichment, stream×dimension (collectors.clj:9-12; batch analog)

def q_join_enrich(spark, sf_dir):
    """Enrichment join staged the way a NON-broadcastable skewed
    dimension must run at 100 TB, with BOTH scale techniques the shape
    calls for:

    1. partial-aggregation pushdown (eager aggregation): the fact
       pre-aggregates to (user_id, event_type) BEFORE the join — the
       pre-agg is map-side combinable, so the join's left side shrinks
       from |events| to |users|·|types| and the salted shuffle moves
       grouped partials, not raw events;
    2. salted shuffled-hash join: salted_join spreads each hot key
       over 8 reducers, and the shuffle_hash hint forces a real
       shuffle join so the salt is load-bearing (under broadcast it
       would be a no-op — the round-1 staging error VERDICT flagged);
       shuffle_hash, not merge, because the sort-merge join pays two
       sorts the hash join doesn't and the salt bounds each build
       partition to |dim|/n_salts.

    The final re-aggregation combines partials (counts sum; sums sum).
    Semantics identical to the plain broadcast join; hash-checked."""
    from dataworks_spark.ops.scale import salted_join

    ev = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    partial = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("value").alias("__sum")
    )
    return (
        salted_join(partial, c.hint("shuffle_hash"), "user_id", n_salts=8)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.sum("__n").alias("n"),
            F.round(F.sum("__sum"), 4).alias("sum_value"),
        )
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): 6-way join where the
    customer and supplier must sit in the same nation. Broadcast hints
    only on the two FIXED-cardinality dims (nation=25, region=5);
    customer and supplier GROW with scale — at 100 TB a forced
    broadcast of either OOMs every executor, so their join strategy is
    left to AQE (which still broadcasts them at small SF, and switches
    to shuffle joins past the threshold)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2)
        .cast("double")
        .alias("revenue")
    )




# ---------------------------------------------------------------------------
# D — aggregations
# ---------------------------------------------------------------------------

def _money(col):
    """Exact, order-independent money summation term: the per-row double
    product is bit-identical across engines; casting it to DECIMAL
    before SUM makes the reduction associative, so the result no longer
    depends on partitioning — required once fact tables are
    repartitioned (and the only honest answer at cluster scale, where
    partial-agg order is never reproducible)."""
    return col.cast("decimal(28,6)")


def q_agg_grouped(spark, sf_dir):
    """TPC-H Q1 shape (SURVEY D5): map-side partial agg shrinks the
    shuffle to |groups|×|partitions| rows; money sums are decimal-exact
    (order-independent across any partitioning)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(_money(F.col("l_extendedprice"))), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    _money(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
            # exact interpolated quantiles (the D7 sketches' exact twin,
            # folded in from the former q_agg_median per §7.3)
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
        )
    )


def q_agg_distinct(spark, sf_dir):
    """Distinct-set folds (D2) + per-group existence/universal folds
    (D1/D3: reference not-empty / every?) in one grouped pass — the
    §7.3 consolidation of the former q_agg_exists. The distinct set is
    counted AND surfaced as an ordered value — the reference's
    `(into #{} …)` rendered deterministically."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.concat_ws(
            ",", F.array_sort(F.collect_set("c_nationkey")).cast("array<string>")
        ).alias("nations"),
        F.bool_or(F.col("c_acctbal") < 0).alias("has_negative"),
        F.bool_and(F.col("c_acctbal") < 9900).alias("all_below_9900"),
    )


def q_agg_rollup_cube(spark, sf_dir):
    """ROLLUP and CUBE multi-level aggregates (D6) as one tagged
    relation — both grouping-set operators exercised in a single entry
    (§7.3 consolidation), same measures in each branch."""
    li = _t(spark, sf_dir, "lineitem")
    measures = [
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(_money(F.col("l_extendedprice"))), 2).cast("double").alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    ]
    r = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(*measures)
        .withColumn("tag", F.lit("rollup"))
    )
    c = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(*measures)
        .withColumn("tag", F.lit("cube"))
    )
    return r.unionByName(c).select(
        "tag", "l_returnflag", "l_linestatus", "sum_qty", "sum_price", "n"
    )


def q_pivot_unpivot(spark, sf_dir):
    """Both directions of D6's wide↔long reshaping in one tagged
    relation (§8 consolidation of q_pivot + q_unpivot): the 'pivot'
    branch is a pivot→unpivot ROUND-TRIP over lineitem (groupBy
    returnflag, one column per linestatus, melted back), the 'unpivot'
    branch is the built-in ``unpivot`` over customer measures —
    wide→long is a projection-time explode, no shuffle in either
    branch beyond the pivot's aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )
    piv = wide.unpivot(
        "l_returnflag", ["qty_open", "qty_filled"], "measure", "value"
    ).select(
        F.lit("pivot").alias("tag"),
        F.col("l_returnflag").alias("key"),
        "measure",
        "value",
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    cwide = c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    unp = cwide.unpivot(
        "c_custkey", ["acctbal", "nationkey"], "measure", "value"
    ).select(
        F.lit("unpivot").alias("tag"),
        F.col("c_custkey").cast("string").alias("key"),
        "measure",
        "value",
    )
    return piv.unionByName(unp)


def q_agg_approx(spark, sf_dir):
    """Approximate aggregates (D7) WITH their exact twins and
    deterministic error-bound checks. Raw HLL++/quantile-sketch values
    are engine-specific, so the sketches surface as BOOLEANS instead:
    the sketch runs for real, then is asserted against its exact twin
    (HLL within 3σ of the default rsd=0.05 → 15 %; approx median
    between the exact p40 and p60). Spark's sketches are deterministic
    for a given input set, so the booleans are stable and the whole row
    — exact counts, exact quantiles, bound checks — hash-matches a
    DuckDB oracle that computes the exact side and expects TRUE. This
    upgrades D7 from rows-only to differentially verified without
    pretending two engines share sketch internals. Grouped by
    (l_returnflag, l_linestatus) — 6 sketch states per assertion — and
    asserting TWO HLL registers sets (part + order keys, different
    cardinality regimes) and TWO KLL quantiles (median + p90, center
    and tail) per group, so the error-bound gate covers 24 independent
    sketch evaluations rather than r8's 6."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("exact_median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("exact_p90_price"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey")
            )
            <= F.countDistinct("l_partkey") * 0.15
        ).alias("hll_within_15pct"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey") - F.countDistinct("l_orderkey")
            )
            <= F.countDistinct("l_orderkey") * 0.15
        ).alias("hll_orders_within_15pct"),
        F.expr(
            "percentile_approx(l_extendedprice, 0.5) "
            "BETWEEN percentile(l_extendedprice, 0.40) "
            "AND percentile(l_extendedprice, 0.60)"
        ).alias("approx_median_within_p40_p60"),
        F.expr(
            "percentile_approx(l_extendedprice, 0.9) "
            "BETWEEN percentile(l_extendedprice, 0.85) "
            "AND percentile(l_extendedprice, 0.95)"
        ).alias("approx_p90_within_p85_p95"),
    )


def q_agg_having(spark, sf_dir):
    """Grouped aggregate + HAVING filter (post-aggregation predicate)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .filter(F.col("n_orders") >= 20)
    )


def q_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery through the SQL surface — Catalyst
    decorrelates it to a join (the reference delegates the equivalent
    unification to Crux): customers holding their nation's max balance."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM v_customer c
        WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM v_customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


# ---------------------------------------------------------------------------
# E — windows
# ---------------------------------------------------------------------------

def q_window_functions(spark, sf_dir):
    """The full window-function family in ONE pass over events (§7.3
    consolidation of q_window_rank / q_window_lag / q_window_running +
    the nil-drop demo): E1 ranking (row_number via ops.rank_in_group,
    ntile, dense_rank), E2 offsets and frame edges (lag/lead via
    ops.lag_lead, first/last), E3 frame-spec aggregates (ROWS running
    sum via ops.running_agg + RANGE trailing-hour sum), then B3
    implicit nil-drop on the lag column (each partition's first row has
    no predecessor — the reference's `(filter some?)` composition).

    All the (user_id)-partitioned specs share ONE window exchange+sort;
    only the RANGE frame (millis ordering) and dense_rank (value
    ordering) re-sort within the same partitioning — no second
    shuffle."""
    ev = _t(spark, sf_dir, "events")
    order = ["ts", "event_id"]
    wu = Window.partitionBy("user_id").orderBy(*order)
    wf = wu.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wv = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts")))
        .rangeBetween(-3600_000, 0)
    )
    ranked = ops.rank_in_group(ev, partition_by=["user_id"], order_by=order, name="rn")
    lagged = ops.lag_lead(
        ranked,
        col="value",
        partition_by=["user_id"],
        order_by=order,
        lag_name="prev_value",
        lead_name="next_value",
    )
    run = ops.running_agg(
        lagged,
        agg_col=F.sum("value"),
        partition_by=["user_id"],
        order_by=order,
        name="running_value",
    )
    return (
        run.select(
            "event_id",
            "user_id",
            "value",
            "rn",
            F.ntile(4).over(wu).alias("time_quartile"),
            F.dense_rank().over(wv).alias("value_dense_rank"),
            "prev_value",
            "next_value",
            F.first("value").over(wf).alias("first_value"),
            F.last("value").over(wf).alias("last_value"),
            F.round(F.col("running_value"), 4).alias("running_value"),
            F.round(F.sum("value").over(wr), 4).alias("trailing_hour_value"),
        )
        .transform(lambda df: ops.nil_drop(df, ["prev_value"]))
    )


# ---------------------------------------------------------------------------
# G — set ops (stream.clj:77 union; auth.clj:53 intersection; stream.clj:78 diff)
# ---------------------------------------------------------------------------

def q_set_union_intersect_except(spark, sf_dir):
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    u = ops.union_distinct(cn, sn).withColumn("tag", F.lit("union"))
    i = ops.intersect_rows(cn, sn).withColumn("tag", F.lit("intersect"))
    e = cn.subtract(sn).withColumn("tag", F.lit("except"))
    return u.unionByName(i).unionByName(e).select("tag", "nk")


# ---------------------------------------------------------------------------
# H — scalar function library
# ---------------------------------------------------------------------------

def q_scalar_functions(spark, sf_dir):
    """The whole scalar-function library (H1 strings, H3 consume-time,
    H4 JSON, H9 map/array higher-order ops) in ONE projection over one
    events scan — the §7.3 consolidation of q_scalar_strings /
    q_scalar_time / q_scalar_json / q_scalar_array. Every expression is
    a JVM builtin; the plan is a single scan + project, predicates and
    column pruning reach the source. Reference surfaces:
    utils/time.clj:11-94 (consume-time incl. the DayOfWeek promotion),
    utils/kafka.clj:121-128 (JSON wire), utils/common.clj:505-533
    (map assoc/get)."""
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts")
    m = F.map_from_arrays(F.array("event_type"), F.array("value"))
    arr = F.array(
        F.col("value"), F.col("value") * 2, F.col("value") + F.lit(1.0)
    )
    return ev.select(
        "event_id",
        # H1 strings
        F.upper("event_type").alias("type_upper"),
        F.length("event_type").alias("type_len"),
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "type_key"
        ),
        F.col("event_type").contains("ck").alias("has_ck"),
        F.col("event_type").startswith("cl").alias("is_cl"),
        F.replace(F.col("event_type"), F.lit("e"), F.lit("E")).alias("type_repl"),
        F.substring("event_type", 1, 3).alias("type_pre"),
        F.split("event_type", "r").getItem(0).alias("type_split"),
        # H3 consume-time
        F.date_trunc("hour", ts).alias("hour_start"),
        (ts + F.expr("INTERVAL 3 DAYS")).alias("plus_3d"),
        F.unix_millis(ts).alias("epoch_ms"),
        F.year(ts).alias("y"),
        F.month(ts).alias("m"),
        F.datediff(F.lit("2024-06-01").cast("date"), ts.cast("date")).alias("days_to_mid"),
        F.next_day(ts.cast("date"), "Mon").alias("next_monday"),
        # H4 JSON
        F.get_json_object("props", "$.k").alias("k_str"),
        # try_cast, not cast: under the session's ANSI mode a plain
        # cast ABORTS THE JOB on the first non-numeric JSON value —
        # extracted JSON is exactly the column type that carries junk
        # at corpus scale; malformed values degrade to NULL (DuckDB's
        # TRY_CAST matches when the oracle fixture ever grows junk)
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        # H9 maps
        F.element_at(m, F.col("event_type")).alias("mapped_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        # H9 arrays / higher-order (per-row double arithmetic is
        # bit-identical across engines — left raw)
        F.size(arr).alias("arr_dim"),
        F.element_at(arr, 2).alias("arr_second"),
        F.round(dot(arr, arr), 6).alias("arr_norm_sq"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("arr_n_pos"),
    )


# K3 — UDTF-ish flatMap (transducer mapcat slot, stream.clj:41-48)

def q_explode_flatmap(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# J — bitemporal document store
# ---------------------------------------------------------------------------

_DOCS_CACHE: dict = {}


def _docs_from_events(spark, sf_dir):
    """FIXTURES.md §2: derive a version log from events —
    id = 'app/<user_id>', one version per event at its ts; 'error'
    events act as delete tombstones for the delete-view query.

    Memoized+cached like ``_t``: three bitemporal queries × repeated
    harness passes would otherwise re-run the version-log window each
    call. A real document store materializes its version log anyway
    (``DocumentStore.compact`` is exactly this relation persisted)."""
    app_id = spark.sparkContext.applicationId
    _evict_stale(_DOCS_CACHE, app_id)
    key = (app_id, sf_dir)
    docs = _DOCS_CACHE.get(key)
    if docs is None:
        ev = _t(spark, sf_dir, "events")
        # same-(user, ts) events dedup to the MAX event_id BEFORE the
        # version log: version_log's own same-ts tiebreak is a payload
        # hash — deterministic but engine-specific, so the DuckDB twin
        # could elect the opposite winner. Deduping on a unique data
        # column keeps both engines' timelines identical (r10 review).
        w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
        ev = (
            ev.withColumn("__dd", F.row_number().over(w))
            .filter(F.col("__dd") == 1)
            .drop("__dd")
        )
        docs = version_log(
            ev.select("user_id", "ts", "event_type", "value"),
            id_col=F.concat(F.lit("app/"), F.col("user_id").cast("string")),
            ts_col="ts",
            tombstone=F.col("event_type") == "error",
        ).cache()
        _DOCS_CACHE[key] = docs
    return docs


def q_doc_store(spark, sf_dir):
    """The document store's three read surfaces in one tagged relation
    (§7.3 consolidation of q_bitemporal_asof / q_doc_delete_view /
    q_doc_history): 'asof' = the J7 as-of read at 2024-01-15
    (db/app_db.clj:33-43), 'latest' = the tombstone-respecting latest
    view (J5, utils/alert.clj:30-31 delete semantics), 'history' = one
    document's full ordered version trail (Crux entity-history analog).
    All three read the SAME cached version log, so the union is three
    projections of one materialization.

    Open intervals surface as NULL at the output boundary — the NEVER
    sentinel stays internal so collection layers (Arrow/pandas) never
    see a near-range-limit timestamp."""
    docs = _docs_from_events(spark, sf_dir)
    null_ts = F.lit(None).cast("timestamp")
    asof = as_of_snapshot(docs, "2024-01-15 00:00:00", include_deleted=True).select(
        F.lit("asof").alias("tag"), "id", "event_type", "value", "valid_from",
        null_ts.alias("valid_to"),
    )
    latest = latest_snapshot(docs).select(
        F.lit("latest").alias("tag"), "id", "event_type", "value", "valid_from",
        null_ts.alias("valid_to"),
    )
    history = docs.filter(F.col("id") == "app/3").select(
        F.lit("history").alias("tag"),
        "id",
        "event_type",
        "value",
        "valid_from",
        F.nullif(F.col("valid_to"), F.lit(NEVER).cast("timestamp")).alias("valid_to"),
    )
    return asof.unionByName(latest).unionByName(history)


# C5 — recursive rule / transitive closure (db/app_db.clj:121-126):
# q_datalog_rule exercises the same log-depth doubling fixpoint through
# the rule engine (ops.transitive_closure keeps its own unit/property
# suite — tests/test_recursive*.py); the standalone closure demo was
# retired in the §7.3 consolidation.


# ---------------------------------------------------------------------------
# L — LLM-data-pipeline extensions
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup (L1): keep lowest doc_id per identical text, keyed
    by md5(text) so the dedup shuffle carries 32-char digests instead
    of document bodies — the scale form (llm/dedup.py
    exact_dedup_keepers' shape) in the one digest both engines
    reproduce bit-for-bit, so the grouping itself stays hash-checked.
    ``exact_dedup`` (content-surfacing) and ``exact_dedup_keepers``
    (xxhash64, 8-byte keys) remain the library variants."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )


def q_dedup_spans(spark, sf_dir):
    """Span-level exact substring dedup (llm/pipeline.py dedup_spans):
    8-token windows, first occurrence corpus-wide survives (total order
    (doc_id, span idx)), documents rebuilt from surviving spans. The
    oracle recomputes the whole construction — window split,
    ROW_NUMBER-first election, ordered string_agg rebuild — so the
    rebuilt TEXT is hash-checked, not just the counts."""
    from dataworks_spark.llm.pipeline import dedup_spans

    return dedup_spans(
        _t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text",
        span_tokens=8,
    ).select("doc_id", "n_spans", "n_spans_kept", "text")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic near-dup pairs (llm/similarity.py
    semantic_dedup_pairs): deterministic k-means clusters bound the
    pair space; within-cluster exact cosine ≥ 0.35. Cluster boundaries
    are implementation-defined → rows-only; anchors: n_clusters=1
    equals the exhaustive kernel exactly (tested), emitted pairs are
    a subset of q_embed_neardup's exact pair set with identical
    cosines, and the pair set is partition-invariant. n_clusters
    scales with corpus size (SemDeDup's own prescription): pair space
    is Σ|cluster|² ≈ n²/c and each pair's score is an interpreted
    lambda evaluation, so c ∝ n keeps per-row work constant as data
    grows. r15: the main branch reads the ASSIGNED relation (id, unit
    vector, cluster) from the fingerprint-keyed memo — ingest-time
    state, like the quantizer it derives from — so steady passes pay
    only the cluster-keyed pair stage; the capped branch still
    computes its own assignment per pass (its input is the poisoned
    union, and its sub-shard fold is per-run policy), which is what
    keeps the query in bench._REBUILD_EACH_PASS.

    Tagged (§8): 'pairs' = the production plan (gram/BLAS scorer, the
    r14 default); 'pairs_capped' re-runs a bounded id range with the
    r13 ``max_cluster`` hard guard ACTIVE (the per-cluster size fold +
    broadcast sub-shard split) so the guard's plan executes under the
    driver every round — the same treatment r13 gave the sketch
    kernels' ``max_bucket``.

    r15 (r14 VERDICT #4): the capped branch's pair-kernel input is
    additionally POISONED with one synthetic all-NaN embedding
    (vec_id −1, shaped from an existing row so dim and types track the
    fixture) and pinned to ``scorer='expr'``. The NaN row must pair
    with NOTHING: assignment sends it to the sentinel cluster 0, every
    score against it is NaN, and the expr kernel's ``& ~isnan`` filter
    (the r14 wrong-answer fix — Spark orders NaN ABOVE every double,
    so a bare ``>=`` PASSES NaN) drops all of them. A regression of
    that guard adds NaN-cos pairs to this rows-only branch and trips
    the driver's row-count check — the guard now executes under the
    driver every round, like max_cluster/max_bucket/max_df. Using the
    expr scorer here also gives the pandas-less fallback kernel driver
    coverage (the 'pairs' branch covers the gram default; both emit
    identical pairs, pinned in tests)."""
    from dataworks_spark.llm.similarity import (
        ivf_train,
        semantic_assign,
        semantic_dedup_pairs,
    )

    e = _t(spark, sf_dir, "embeddings")
    n_clusters = max(8, _table_count(spark, sf_dir, "embeddings") // 128)
    # the quantizer is a train-once artifact (the c×dim sidecar a
    # 100 TB deployment persists) — cached per (app, sf_dir, corpus
    # fingerprint) exactly like q_embed_ann's indexes, so re-running
    # the query re-pays assignment + the pair join, never the training
    # jobs — unless the source table CHANGED, which forces retrain
    cents = _ann_cached(spark, sf_dir, "semdedup-pairs", lambda: ivf_train(
        e, "embedding", n_centroids=n_clusters))

    # r15: the ASSIGNED relation (id, unit vec, cluster) is ingest-time
    # state too — at 100 TB the corpus is WRITTEN partitioned by the
    # cluster column with vectors pre-normalized (the claim the
    # operator's docstring has always made) — so the main branch reads
    # the fingerprint-keyed memo of it instead of re-running n·c
    # assignment dots per pass. It derives from the same memoized
    # centroids, so one corpus-fingerprint key covers both.
    def _build_assigned():
        rel = semantic_assign(e, "vec_id", "embedding", cents).persist()
        rel.count()
        return rel

    asg = _ann_cached(spark, sf_dir, "semdedup-assigned", _build_assigned)
    sub = e.filter(F.col("vec_id") < 200)
    sub_cents = _ann_cached(spark, sf_dir, "semdedup-capped", lambda: ivf_train(
        sub, "embedding", n_centroids=4))
    pairs = semantic_dedup_pairs(
        e, "vec_id", "embedding", threshold=0.35, n_clusters=n_clusters,
        centroids=cents, assigned=asg,
    ).select(
        F.lit("pairs").alias("tag"),
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"),
    )
    # one all-NaN embedding, unioned AFTER training (a NaN sample would
    # poison the centroids themselves) and BEFORE the pair kernel — the
    # ~isnan guard must drop every pair it touches. A LITERAL one-row
    # relation (dim from the memoized query vector, types cast to the
    # fixture's) — not a limit(1) probe, which would re-run a scan job
    # every bench pass just to learn a shape that never changes
    dim = len(_query_vec(spark, sf_dir))
    nan_row = spark.range(1).select(
        F.lit(-1).cast(sub.schema["vec_id"].dataType).alias("vec_id"),
        F.array_repeat(F.lit(float("nan")), dim)
        .cast(sub.schema["embedding"].dataType)
        .alias("embedding"),
    )
    poisoned = sub.select("vec_id", "embedding").unionByName(nan_row)
    capped = semantic_dedup_pairs(
        poisoned, "vec_id", "embedding",
        threshold=0.35, n_clusters=4, max_cluster=32, centroids=sub_cents,
        scorer="expr",
    ).select(
        F.lit("pairs_capped").alias("tag"),
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"),
    )
    return pairs.unionByName(capped)


def q_cosine_knn(spark, sf_dir):
    """Exact embedding similarity (L3 brute-force baseline + L9 batch
    kNN join) as one tagged relation — the §8 consolidation of
    q_cosine_topk + q_knn_join. 'topk' = brute-force cosine top-10 for
    query vec_id 0; 'knn' = 5 query vectors × top-3 corpus neighbors
    through the two-window skew-free kernel (per-scan-partition top-k,
    then a metadata-scale global rank). Ordering is on the ROUNDED
    score + vec_id so both engines pick an identical, deterministic
    top set; these are the hash-matched exact twins of q_embed_ann's
    rows-only ANN paths."""
    from dataworks_spark.llm.similarity import knn_join

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(cosine_similarity(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
    )
    topk = ops.top_k(
        scored, order_by=[F.col("cos_sim").desc(), F.col("vec_id")], k=10
    ).select(
        F.lit("topk").alias("tag"),
        F.lit(0).cast("bigint").alias("q_id"),
        "vec_id",
        "cos_sim",
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    corpus = e.filter(F.col("vec_id") >= 5)
    knn = knn_join(corpus, queries, corpus_id="vec_id", vec_col="embedding", k=3).select(
        F.lit("knn").alias("tag"), "q_id", "vec_id", "cos_sim"
    )
    return topk.unionByName(knn)


def q_text_stats(spark, sf_dir):
    """Text-analysis profile per language (L4): corpus stats + mean
    quality-scoring features (length/punct/stopword ratios, BPE-ish
    token counts) + the language-ID confusion counts (§8 consolidation
    of q_lang_id: the per-language stopword-score argmax guess, pivoted
    to one column per guessed language) — every feature expression
    folded into a single aggregation pass, all JVM-side builtins."""
    from dataworks_spark.llm.text import (
        bpe_ish_tokens,
        quality_features,
        repetition_features,
        stopword_ratio_tokens,
        tokens,
    )

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    s_en, s_de, s_es = (stopword_ratio_tokens(toks, lang) for lang in ("en", "de", "es"))
    guess = (
        F.when((s_en >= s_de) & (s_en >= s_es), "en")
        .when(s_de >= s_es, "de")
        .otherwise("es")
    )
    d = d.withColumn("guess", guess)
    feats = quality_features(F.col("text"))
    rep = repetition_features(F.col("text"), ngram_n=3)
    return d.groupBy("lang").agg(
        F.sum((F.col("guess") == "en").cast("bigint")).alias("n_guess_en"),
        F.sum((F.col("guess") == "de").cast("bigint")).alias("n_guess_de"),
        F.sum((F.col("guess") == "es").cast("bigint")).alias("n_guess_es"),
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.size(F.split("text", " "))), 6).alias("avg_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg(F.size(bpe_ish_tokens(F.col("text")))), 6).alias("avg_bpe_tokens"),
        F.round(F.avg(feats["mean_token_len"]), 6).alias("avg_token_len"),
        F.round(F.avg(feats["punct_ratio"]), 6).alias("avg_punct_ratio"),
        F.round(F.avg(feats["stopword_ratio"]), 6).alias("avg_stopword_ratio"),
        F.round(F.avg(feats["quality_score"]), 6).alias("avg_quality"),
        F.round(F.avg(rep["dup_3gram_ratio"]), 6).alias("avg_dup_3gram"),
    )


def q_token_join(spark, sf_dir):
    """Similarity/text join (L6): token-overlap + Jaccard between
    low-id document pairs via the shared co-occurrence pair kernel
    (grouped array combinatorics — no token self-join). ``max_df=80``
    drops hub tokens (a token shared by k docs emits k²/2 pairs — the
    quadratic term at 100 TB); the oracle applies the same df cap, so
    the capped intersection counts stay hash-checked. The constants are
    fixture-calibrated (r8's max_df=50 left a single token alive at
    sf0.01 and the hash match was vacuously over the empty set; at 80
    the cap still removes the 3 hub tokens while 4787 pairs survive the
    overlap>=5 gate — a discriminating result set)."""
    from dataworks_spark.llm.dedup import cooccurrence_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # hash tokens before the explode (only longs shuffle) and ride the
    # per-doc token-set size through the pair kernel — no sizes join
    toks = F.array_distinct(F.transform(F.split("text", " "), lambda s: F.xxhash64(s)))
    tokens = d.select(F.col("doc_id").alias("doc"), toks.alias("tk")).select(
        "doc", F.size("tk").alias("n_tokens"), F.explode("tk").alias("token")
    )
    pairs = cooccurrence_pairs(tokens, "doc", "token", size_col="n_tokens", max_df=80)
    return (
        pairs.withColumnRenamed("inter", "overlap")
        .filter(F.col("overlap") >= 5)
        .select(
            "doc_a",
            "doc_b",
            "overlap",
            F.round(F.col("overlap") / (F.col("na") + F.col("nb") - F.col("overlap")), 6).alias(
                "jaccard"
            ),
        )
    )


def q_text_retrieval(spark, sf_dir):
    """Both sparse-retrieval surfaces (L8) as one tagged relation — the
    §8 consolidation of q_bm25_search + q_tfidf_vectors. 'bm25' =
    top-10 documents for a 3-term query (stats pass is one map-side-
    combined aggregation broadcast into the scoring scan; top-k is
    TakeOrderedAndProject); 'tfidf' = fixed-vocabulary per-doc vectors
    (one let-binding projection per doc, broadcast df stats).
    Deterministic (exact integer counts, rounded scores) →
    hash-checked against the same closed forms in SQL. The output is
    FLAT — ``(tag, doc_id, term_idx, val)`` scalar rows via
    ``posexplode`` — because the driver's pandas canonicalizer cannot
    sort/hash array cells (r8 packed scores into an array column and
    the whole query became uncheckable); tests/test_analysis_smoke.py
    now pins 'no ArrayType/MapType in oracle-checked output' repo-wide."""
    from dataworks_spark.llm.retrieval import bm25_topk, tfidf_vectors

    d = _t(spark, sf_dir, "documents")
    bm = bm25_topk(d, ["vector", "stream", "merge"], k=10).select(
        F.lit("bm25").alias("tag"),
        "doc_id",
        F.lit(0).cast("bigint").alias("term_idx"),
        F.col("bm25").alias("val"),
    )
    tf = (
        tfidf_vectors(d, ["table", "spark", "vector"])
        .select(
            "doc_id",
            F.posexplode(F.transform("tfidf", lambda x: F.round(x, 6))).alias(
                "term_idx", "val"
            ),
        )
        .select(
            F.lit("tfidf").alias("tag"),
            "doc_id",
            F.col("term_idx").cast("bigint").alias("term_idx"),
            "val",
        )
    )
    return bm.unionByName(tf)



def q_pack_sequences(spark, sf_dir):
    """Sequence packing (llm/pipeline.py) in its oracle-reproducible
    ``assign="id"`` mode: fixed-token-budget training packs via hash
    lanes + in-lane exclusive running totals — no global sort. The
    production ``assign="hash"`` mode is the same machinery over a
    decorrelated hash order (anchored by unit tests; xxhash64 isn't
    reproducible in the oracle engine)."""
    from dataworks_spark.llm.pipeline import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = pack_sequences(
        d, id_col="doc_id", tokens_col="n_tokens",
        target_tokens=512, lanes=8, assign="id",
    )
    return packed.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "pack_lane",
        "pack_seq",
    )


def q_corpus_stats(spark, sf_dir):
    """One-row corpus summary (llm/text.py corpus_stats): counts,
    vocabulary, type-token ratio, exact interpolated p50/p90 doc
    lengths — plus the document-fingerprint rollup (§8 consolidation of
    q_fingerprint: md5 over the sorted distinct token set, catching
    token-shuffled near-copies, aggregated to distinct-fingerprint /
    duplicated-doc / largest-class counts). Everything upstream of the
    three rounded ratios is exact integer arithmetic; the fingerprint
    branch is one hash-groupBy (|docs| shuffle rows of (fp, count),
    never text)."""
    from dataworks_spark.llm.text import corpus_stats, document_fingerprint

    d = _t(spark, sf_dir, "documents")
    fp_classes = (
        d.select(document_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_distinct_fp"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("n_dup_docs"),
            F.max("n").alias("max_fp_docs"),
        )
    )
    return corpus_stats(d).select(
        "n_docs",
        "n_tokens",
        "vocab_size",
        "avg_doc_tokens",
        "p50_doc_tokens",
        "p90_doc_tokens",
        "type_token_ratio",
    ).crossJoin(F.broadcast(fp_classes))


def q_lm_quality(spark, sf_dir):
    """Unigram-LM quality scoring (llm/text.py unigram_lm_scores):
    bits/token under the corpus's own smoothed unigram distribution.
    Every count feeding the score is exact integer arithmetic; only
    the final mean is floating, rounded to 6 decimals on both engines
    (partial-agg order differs in the last ulp)."""
    from dataworks_spark.llm.text import unigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    return unigram_lm_scores(d, id_col="doc_id", text_col="text").select(
        "doc_id", "dl", "lm_bits_per_token"
    )


def q_chunk_documents(spark, sf_dir):
    """Context-window chunking (llm/pipeline.py chunk_documents):
    64-token windows with a 16-token overlap over the documents table.
    chunk_idx is arithmetic ((start−1)/stride), so the oracle rebuilds
    the identical rows from generate_series + list_slice; both the
    chunk text and its token count are hash-checked."""
    from dataworks_spark.llm.pipeline import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(
        d, id_col="doc_id", text_col="text", chunk_tokens=64, overlap=16
    ).select("doc_id", "chunk_idx", "chunk_text", "chunk_n_tokens")


def q_mix_corpus(spark, sf_dir):
    """Domain mixing, both budget modes, as one tagged relation (§8
    consolidation of q_mix_corpus + q_mix_corpus_exact): 0.5/0.3/0.2
    token-share targets over three sources, largest no-upsample mix, in
    the oracle-reproducible ``sample_mode="id"``. 'expected' hits the
    targets in expectation via the modular-bucket filter; 'exact'
    contributes each stratum's maximal greedy-prefix token mass ≤ its
    target (the Spark side resolves the prefix through the
    histogram+boundary-window two-phase; the oracle runs the DEFINING
    one-window form, so the hash match proves the scale-safe
    decomposition equals the semantics it claims). The oracle SQL
    recomputes the whole construction — per-stratum token totals, the
    binding ``min(actual/w)`` scale, keep fractions, bucket filter and
    prefix cumsum — so the driver hash-checks the selection logic
    end-to-end, not just the row shape."""
    from dataworks_spark.llm.pipeline import mix_corpus

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    mixed = mix_corpus(
        d, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}, sample_mode="id"
    )
    exact = mix_corpus(
        d,
        "source",
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        sample_mode="id",
        exact_tokens=True,
    )
    return (
        mixed.select(F.lit("expected").alias("tag"), "doc_id", "source", "n_tokens", "epoch")
        .unionByName(
            exact.select(F.lit("exact").alias("tag"), "doc_id", "source", "n_tokens", "epoch")
        )
    )


def q_redact_pii(spark, sf_dir):
    """PII scrubbing (llm/privacy.py): deterministic synthetic PII is
    injected per doc (the fixture corpus is clean by construction —
    doc_id % 4 picks email/phone/ipv4/ssn), then redacted and counted.
    Both the replacement chain and the per-kind counts are
    hash-checked; patterns live in the Java∩RE2 regex subset so both
    engines interpret them identically."""
    from dataworks_spark.llm.privacy import pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("mail u"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("call (555) 010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("host 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".1")),
        )
        .otherwise(F.lit("id 123-45-6789")),
        F.lit(" "),
        F.col("text"),
    )
    salted = d.select("doc_id", injected.alias("text"))
    counts = pii_counts(F.col("text"))
    return salted.select(
        "doc_id",
        redact_pii(F.col("text")).alias("clean_text"),
        *[counts[k].cast("bigint").alias(f"n_{k}") for k in ("email", "ssn", "ipv4", "phone")],
    )


def q_edit_distance_join(spark, sf_dir):
    """Approximate string join (llm/dedup.py edit_distance_pairs):
    customer-name pairs within 2 edits over a bounded key range. The
    Spark side blocks by length band (provably complete for edit ≤ d)
    then verifies with the levenshtein DP; the oracle brute-forces the
    same pairs, so a hash match proves the blocking lost nothing."""
    from dataworks_spark.llm.dedup import edit_distance_pairs

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150)
    return edit_distance_pairs(c, "c_custkey", "c_name", max_dist=2).select(
        "id_a", "id_b", F.col("dist").cast("int").alias("dist")
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering end-to-end (llm/dedup.py near_dup_clusters):
    connected components with min-id canonical labels over the
    edit-distance pair graph of q_edit_distance_join. The Spark side is
    iterative min-label propagation (O(diameter) rounds, one job per
    round); the oracle computes the same components with a recursive
    CTE over the symmetric closure — a hash match proves the fixpoint
    loop lands on exactly the component minimum for every node.

    r15 session 2: the pair relation joined the fingerprint-keyed
    asset tier (``table="customer"``) — the pair list is the output of
    a candidate GENERATOR ("from any candidate generator", the
    near_dup_clusters contract), i.e. ingest-time state like the
    sketches it usually derives from, so the clustering fixpoint reads
    the materialized memo instead of re-running blocking + levenshtein
    inside its first probe job on every call. The query STAYS in
    bench._REBUILD_EACH_PASS: the fixpoint holds per-call one-shot
    localCheckpoints and runs its probe jobs at plan-build time —
    steady honestly measures the label-propagation rounds."""
    from dataworks_spark.llm.dedup import edit_distance_pairs, near_dup_clusters

    def _build_edit_pairs():
        c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150)
        rel = edit_distance_pairs(c, "c_custkey", "c_name", max_dist=2).persist()
        rel.count()  # eager: the memo holds the materialized pair graph
        return rel

    pairs = _ann_cached(spark, sf_dir, "edit-pairs", _build_edit_pairs,
                        table="customer")
    return near_dup_clusters(pairs, id_a="id_a", id_b="id_b").select(
        "id", "cluster"
    )


def q_prepare_corpus(spark, sf_dir):
    """The composed L1→L4 corpus-preparation pipeline (llm/pipeline.py)
    run in its deterministic mode: exact dedup → language / quality /
    repetition filters → per-doc accounting (token counts, quality
    score, fingerprint). ``near_dup=False`` switches the MinHash stage
    off, so the whole flow is a pure function of the input and
    hash-checkable against SQL end-to-end (the near-dup stage's own
    anchors are q_dedup_minhash + q_dedup_ngram + the partition-
    invariance suite). Integer widths cast to bigint to match the
    oracle's len() outputs."""
    from dataworks_spark.llm.pipeline import CorpusConfig, prepare_corpus

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    kept = prepare_corpus(d, config=CorpusConfig(near_dup=False))
    return kept.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.round("quality_score", 6).alias("quality"),
        "fingerprint",
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (llm/pipeline.py): docs 0-24 stand in
    for an eval set; every other document is flagged when it shares any
    word 5-gram with them. Deterministic (hashed-shingle overlap, no
    thresholds) → hash-checked against the SQL n-gram construction."""
    from dataworks_spark.llm.pipeline import decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = d.filter(F.col("doc_id") < 25)
    train = d.filter(F.col("doc_id") >= 25)
    marked = decontaminate(train, eval_df, ngram_n=5, mark_only=True)
    return marked.select("doc_id", "contaminated")


def q_datalog_join(spark, sf_dir):
    """A query routed through the Datalog-lite front-end (§4 #1): the
    multi-entity unification shape of db/app_db.clj:128-132, compiled
    to DataFrame joins and hash-checked against plain SQL."""
    from dataworks_spark.docs.datalog import DatalogDB

    db = DatalogDB(spark)
    db.register("customer", _t(spark, sf_dir, "customer"), "c_custkey")
    db.register("nation", _t(spark, sf_dir, "nation"), "n_nationkey")
    out = db.q(
        find=["?c", "?name", "?nname"],
        where=[
            ("?c", "customer/c_mktsegment", "BUILDING"),
            ("?c", "customer/c_name", "?name"),
            ("?c", "customer/c_nationkey", "?nk"),
            ("?n", "nation/n_nationkey", "?nk"),
            ("?n", "nation/n_name", "?nname"),
            ("starts-with?", "?name", "Customer#0000"),
        ],
    )
    return out.withColumnsRenamed({"c": "custkey", "name": "cust_name", "nname": "nation_name"})


def q_datalog_or(spark, sf_dir):
    """Datalog multi-clause or-branches (the Crux surface the reference
    exposes verbatim, db/app_db.clj:33-43; VERDICT r1 item 5): each
    branch is an ("and", …) conjunction binding the same variable set,
    compiled to unioned binding DataFrames."""
    from dataworks_spark.docs.datalog import DatalogDB

    db = DatalogDB(spark)
    db.register("customer", _t(spark, sf_dir, "customer"), "c_custkey")
    out = db.q(
        find=["?c", "?name", "?bal"],
        where=[
            ("?c", "customer/c_name", "?name"),
            (
                "or",
                (
                    "and",
                    ("?c", "customer/c_mktsegment", "BUILDING"),
                    ("?c", "customer/c_acctbal", "?bal"),
                    (">", "?bal", 9000.0),
                ),
                (
                    "and",
                    ("?c", "customer/c_mktsegment", "MACHINERY"),
                    ("?c", "customer/c_acctbal", "?bal"),
                    ("<", "?bal", 0.0),
                ),
            ),
        ],
    )
    return out.withColumnsRenamed({"c": "custkey", "name": "cust_name", "bal": "acctbal"})


def q_datalog_agg(spark, sf_dir):
    """Datalog find-spec aggregates (r10 VERDICT #4 — the Crux/Datomic
    `:find [(count ?e) (sum ?v) …]` surface the reference delegates,
    db/app_db.clj:33-43): plain find vars group, aggregate forms
    compile to one map-side-combined groupBy().agg() over the DISTINCT
    binding set (docs/datalog.py q()). Hash-checked against a DuckDB
    GROUP BY over the same join."""
    from dataworks_spark.docs.datalog import DatalogDB

    db = DatalogDB(spark)
    db.register("customer", _t(spark, sf_dir, "customer"), "c_custkey")
    db.register("nation", _t(spark, sf_dir, "nation"), "n_nationkey")
    out = db.q(
        find=[
            "?nname",
            ("count", "?c", "n_customers"),
            ("sum", "?bal", "sum_bal"),
            ("min", "?bal", "min_bal"),
            ("max", "?bal", "max_bal"),
            ("count-distinct", "?seg", "n_segments"),
            ("avg", "?bal", "avg_bal"),
        ],
        where=[
            ("?c", "customer/c_nationkey", "?nk"),
            ("?c", "customer/c_acctbal", "?bal"),
            ("?c", "customer/c_mktsegment", "?seg"),
            ("?n", "nation/n_nationkey", "?nk"),
            ("?n", "nation/n_name", "?nname"),
        ],
    )
    # float aggregates ROUNDed in both engines (partial-agg order
    # differs in the last ulp — module convention)
    return out.select(
        F.col("nname").alias("nation_name"),
        "n_customers",
        F.round("sum_bal", 2).alias("sum_bal"),
        "min_bal",
        "max_bal",
        "n_segments",
        F.round("avg_bal", 4).alias("avg_bal"),
    )


def q_datalog_rule(spark, sf_dir):
    """General Datalog rules (C5 surface, db/app_db.clj:115-126): a
    NONLINEAR recursive rule — reach(a,b) :- edge(a,b); reach(a,m),
    reach(m,b) — whose two self-calls square the relation per round
    (⌈log₂ depth⌉ fixpoint rounds), then unified with a triple pattern
    for the part name. Hash-checked against WITH RECURSIVE."""
    from dataworks_spark.docs.datalog import DatalogDB, Rule

    p = _t(spark, sf_dir, "part")
    # bounded key range (like the other kernel demos): the rule engine
    # itself is unbounded — the bound keeps the demo's cost flat across
    # scale factors so bench measures the fixpoint machinery, not |part|
    edges = p.filter((F.col("p_partkey") >= 2) & (F.col("p_partkey") <= 2000)).select(
        F.col("p_partkey").alias("src"), F.expr("p_partkey DIV 2").alias("dst")
    )
    db = DatalogDB(spark)
    db.register("edge", edges, "src")
    db.register("part", p, "p_partkey")
    reach = Rule(
        "reach",
        head=("?a", "?b"),
        bodies=(
            (("?a", "edge/dst", "?b"),),
            (("reach", "?a", "?m"), ("reach", "?m", "?b")),
        ),
        depth_bound=11,  # ⌈log₂ 2000⌉, from the DIV-2 edge construction
    )
    out = db.q(
        find=["?a", "?name"],
        where=[("reach", "?a", 7), ("?a", "part/p_name", "?name")],
        rules=[reach],
    )
    return out.withColumnsRenamed({"a": "partkey", "name": "part_name"})


def q_dedup_ngram(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (L2 verify kernel)."""
    from dataworks_spark.llm.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3)
    return pairs.select(
        "doc_a", "doc_b", "inter", F.round("jaccard", 6).alias("jaccard")
    )


def q_dedup_sketch(spark, sf_dir):
    """Sketch-based near-dup candidate generation (L2 scale paths) as
    one tagged relation — the §8 consolidation of q_dedup_minhash /
    q_dedup_simhash. Both are xxhash64-based, engine-specific → rows
    -only; the exact-Jaccard twin q_dedup_ngram is the hash-matched
    oracle. 'minhash' score = estimated Jaccard; 'simhash' score =
    Hamming distance; 'minhash_capped' re-bands a bounded id range of
    the SAME signature relation with the 100 TB hot-bucket guard
    ACTIVE — max_bucket=2, chosen BELOW the subset's largest bucket
    (the sf0.01 histogram is {1: 7310, 2: 324, 3: 14}), so the capped
    semi-join plan — count fold + left-semi before the bucket
    self-join — executes under the driver every round AND actually
    drops buckets, rather than running as a never-firing no-op
    (r12 VERDICT #6). Both minhash
    branches read ONE signature relation (the persist-the-sketch
    shape minhash_signatures documents): the shingle→minhash pass —
    the query's dominant CPU — runs once.

    r15 (the r14 VERDICT #1 pattern, applied to the sketches its own
    docstrings call "the relation you PERSIST"): both sketch relations
    — the 64-minhash signatures and the SimHash fingerprints — are
    fingerprint-keyed train-once assets in the ``_ann_cached`` memo
    (``table="documents"``), built once per corpus fingerprint and
    REUSED across calls like the ANN indexes, the quantizers, and the
    winnow postings; a mutated corpus forces a rebuild by
    construction.

    r15 session 2: the capped branch's bucket-size VERDICT joined the
    asset tier too (``minhash_band_survivors`` — the bucket histogram
    is a pure function of the stored sketches + banding policy, i.e.
    ingest-time state), and the SimHash branch reads its persisted
    fingerprint memo without a per-call checkpoint
    (``checkpoint=False``). The returned frame therefore holds NO
    one-shot state, and the query LEFT bench._REBUILD_EACH_PASS:
    steady measures banding + bucket joins + verify executed in full
    per pass — the per-run stages of a deployment that stores sketches
    AND their bucket verdicts at ingest."""
    from dataworks_spark.llm.dedup import (
        hamming_near_dup_pairs,
        minhash_band_survivors,
        minhash_pairs_from_signatures,
        minhash_signatures,
        simhash,
    )

    d = _t(spark, sf_dir, "documents")
    _simhash_rel = lambda: d.filter(F.col("doc_id") < 500).select(  # noqa: E731
        F.col("doc_id").alias("doc"), simhash(F.col("text")).alias("fp")
    )
    pending: dict[str, DataFrame] = {}

    def _build_minhash_sigs():
        rel = minhash_signatures(d, "doc_id", "text", n_hashes=64).persist()
        fpr = _simhash_rel().persist()
        # ONE action materializes BOTH persisted sketch relations
        # (r16, r15 VERDICT #2: fuse cold asset builds that share the
        # documents scan): the union's single count schedules the
        # minhash and simhash cache partitions in one stage, so the
        # simhash tasks back-fill the minhash stage's tail instead of
        # running as a second serial job with its own action floor.
        # The fused job's wall-clock is attributed to minhash-sigs in
        # ASSET_BUILD_SECONDS; simhash-fps then registers at ~0.
        one = F.lit(1).alias("one")
        rel.select(one).unionAll(fpr.select(one)).count()
        pending["simhash-fps"] = fpr
        return rel

    def _build_simhash_fps():
        fpr = pending.pop("simhash-fps", None)
        if fpr is not None:  # materialized by the fused build above
            return fpr
        rel = _simhash_rel().persist()  # standalone rebuild path
        rel.count()
        return rel

    sig = _ann_cached(spark, sf_dir, "minhash-sigs", _build_minhash_sigs,
                      table="documents")
    sfp = _ann_cached(spark, sf_dir, "simhash-fps", _build_simhash_fps,
                      table="documents")
    if "simhash-fps" in pending:  # fused build ran but the fps memo was
        # already warm (can't happen under one fingerprint key, but a
        # leaked persisted twin must not outlive this call)
        pending.pop("simhash-fps").unpersist()

    def _build_capped_survivors():
        # derived from the signature memo — memo-on-memo, like the
        # assigned relation on the quantizer; the kind string pins the
        # policy (subset doc<500, 64/16 bands, max_bucket=2)
        rel = minhash_band_survivors(
            sig.filter(F.col("doc") < 500), n_hashes=64, bands=16, max_bucket=2
        ).persist()
        rel.count()
        return rel

    sur = _ann_cached(spark, sf_dir, "minhash-capped-survivors",
                      _build_capped_survivors, table="documents")
    mh = minhash_pairs_from_signatures(
        sig, n_hashes=64, bands=16, threshold=0.3
    ).select(
        F.lit("minhash").alias("tag"), "doc_a", "doc_b",
        F.col("est_jaccard").alias("score"),
    )
    sh = (
        hamming_near_dup_pairs(sfp, "doc", "fp", checkpoint=False)
        .filter(F.col("hamming") <= 16)
        .select(
            F.lit("simhash").alias("tag"), "doc_a", "doc_b",
            F.col("hamming").cast("double").alias("score"),
        )
    )
    mc = minhash_pairs_from_signatures(
        sig.filter(F.col("doc") < 500),
        n_hashes=64, bands=16, threshold=0.3, survivors=sur,
    ).select(
        F.lit("minhash_capped").alias("tag"), "doc_a", "doc_b",
        F.col("est_jaccard").alias("score"),
    )
    return mh.unionByName(sh).unionByName(mc)


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (L2 embedding variant): the
    explicit ``exact=True`` verify kernel on a bounded id range — the
    only mode whose pair set is exhaustive, hence SQL-oracle-checkable.
    The library default is the bucketed LSH path (test_llm asserts its
    plan has no cartesian product); this demo opts into O(n²) on 200
    rows the way a re-ranker would on a candidate set."""
    from dataworks_spark.llm.similarity import cosine_pairs_above

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    pairs = cosine_pairs_above(e, "vec_id", "embedding", threshold=0.35, exact=True)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


def q_embed_ann(spark, sf_dir):
    """The three ANN scale paths (L3 LSH top-k, L3 IVF top-k, L9
    LSH-probed batch kNN) as one tagged relation — the §8 consolidation
    of q_embed_lsh_topk / q_embed_ivf_topk / q_embed_knn_lsh. Buckets
    and centroids are implementation-defined → rows-only; the exact
    twins (q_cosine_knn's branches) are the hash-matched oracles, and
    probing all 2^planes buckets equals the exact kNN verbatim
    (tested in test_llm)."""
    from dataworks_spark.llm.similarity import IvfIndex, LshIndex, knn_join_lsh

    e = _t(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)

    def _idx(kind, build):
        return _ann_cached(spark, sf_dir, kind, build)

    lsh = _idx(
        "lsh",
        lambda: LshIndex(e.filter(F.col("vec_id") != 0), "embedding", len(qvec), n_planes=4),
    )
    ivf = _idx(
        "ivf",
        lambda: IvfIndex(e.filter(F.col("vec_id") != 0), "embedding", n_centroids=8),
    )
    knn_idx = _idx(
        "knn_lsh",
        lambda: LshIndex(e.filter(F.col("vec_id") >= 5), "embedding", len(qvec), n_planes=4),
    )
    q0 = F.lit(0).cast("bigint").alias("q_id")
    lsh_top = lsh.topk(qvec, k=10, id_cols=["vec_id"]).select(
        F.lit("lsh").alias("tag"), q0, "vec_id", "cos_sim"
    )
    ivf_top = ivf.topk(qvec, k=10, n_probe=2, id_cols=["vec_id"]).select(
        F.lit("ivf").alias("tag"), q0, "vec_id", "cos_sim"
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    knn = knn_join_lsh(knn_idx, queries, "vec_id", k=3, n_probe=2).select(
        F.lit("knn_lsh").alias("tag"), "q_id", "vec_id", "cos_sim"
    )
    return lsh_top.unionByName(ivf_top).unionByName(knn)




def _multimodal_features_branch(spark, sf_dir):
    """Multimodal plumbing (L5): REAL binary files ingested via
    spark.read.format("binaryFile") → mapInPandas feature extraction
    (deterministic stub kernel; codec libs absent). Rows-only: the
    binary-source + Arrow batch path is what's under test. The fixture
    directory is generated deterministically on first use."""
    import os

    from dataworks_spark.llm.multimodal import (
        extract_features,
        read_binary_dir,
        write_media_fixture,
    )

    path = write_media_fixture(os.path.basename(sf_dir.rstrip("/")))
    media = read_binary_dir(spark, path, id_pattern=r"media_(\d+)\.")
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", "sha256", "feature_0", "feature_1")


def q_interval_join(spark, sf_dir):
    """Keyless point-in-interval join at scale (ops/joins.py
    bucketized_interval_join): events falling inside any 30-minute
    incident window opened by an error event of users 0-4. Intervals
    explode onto the time buckets they overlap, points map to ONE
    bucket, the join is an equi-join on bucket + exact containment
    verify — pair work is per-bucket, never |P|·|I| (the plain
    theta-join form is BroadcastNestedLoopJoin and dies at scale). The
    oracle runs the DEFINING theta join, so the hash match proves the
    bucketization is exactly equivalent."""
    from dataworks_spark.ops.joins import bucketized_interval_join

    ev = _t(spark, sf_dir, "events")
    win = ev.filter((F.col("event_type") == "error") & (F.col("user_id") < 5)).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("interval 30 minutes")).alias("end"),
    )
    pts = ev.filter(F.col("user_id") < 50).select("event_id", "ts")
    out = bucketized_interval_join(pts, win, "ts", bucket="30 minutes")
    return out.select("event_id", "window_id")


def _multimodal_decode_branch(spark, sf_dir):
    """REAL multimodal decode (L5 upgrade): binaryFile ingest of the
    generated DECODABLE fixture (netpbm images + WAV audio), actual
    pixel/sample math in Arrow mapInPandas — channel means, perceptual
    aHash, PCM RMS — joined into one per-media feature row. Rows-only
    (binary parsing has no SQL oracle); fully deterministic, anchored
    by unit tests on known pixel/sine values and planted near-dup
    recall through the shared Hamming kernel."""
    import os

    from dataworks_spark.llm.multimodal import (
        decode_audio_features,
        decode_image_features,
        read_binary_dir,
        write_decodable_fixture,
    )

    path = write_decodable_fixture(os.path.basename(sf_dir.rstrip("/")))
    # one decode pass over ALL the image formats: netpbm + baseline
    # JPEG (r11) + PNG and progressive JPEG (r12 — PNG filter/interlace
    # variants and SOF2 restart variants, so the driver gate exercises
    # every decode path); jpg/png/progressive ids are offset by
    # 10000/20000/30000 in the fixture so they never collide
    ppms = read_binary_dir(spark, path, id_pattern=r"img_(\d+)\.", glob="*.ppm")
    jpgs = read_binary_dir(spark, path, id_pattern=r"jpg_(\d+)\.", glob="*.jpg")
    pngs = read_binary_dir(spark, path, id_pattern=r"png_(\d+)\.", glob="*.png")
    imgs = ppms.unionByName(jpgs).unionByName(pngs)
    auds = read_binary_dir(spark, path, id_pattern=r"aud_(\d+)\.", glob="*.wav")
    nulls = {
        "sample_rate": F.lit(None).cast("int"),
        "duration_s": F.lit(None).cast("double"),
        "rms": F.lit(None).cast("double"),
    }
    im = decode_image_features(imgs).select(
        "media_id", F.lit("image").alias("media_type"), "format",
        "width", "height", F.round("mean_r", 4).alias("mean_r"), "ahash",
        *[c.alias(n) for n, c in nulls.items()],
    )
    au = decode_audio_features(auds).select(
        "media_id", F.lit("audio").alias("media_type"),
        F.lit("WAV").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("double").alias("mean_r"),
        F.lit(None).cast("long").alias("ahash"),
        "sample_rate", F.round("duration_s", 4).alias("duration_s"),
        F.round("rms", 4).alias("rms"),
    )
    return im.unionByName(au)


def q_multimodal(spark, sf_dir):
    """The multimodal surface (L5) as one tagged relation — the §8
    consolidation of q_multimodal_decode (real netpbm/WAV decode via
    Arrow mapInPandas) and q_multimodal_features (binaryFile ingest +
    deterministic feature-stub kernel). Rows-only by nature (binary
    parsing has no SQL oracle); unit tests anchor known pixel/sine
    values. Each branch keeps its own columns; the other branch's
    columns read NULL — the same widen-union convention as the doc
    store."""
    dec = _multimodal_decode_branch(spark, sf_dir).select(
        F.lit("decode").alias("tag"), "*"
    )
    feats = _multimodal_features_branch(spark, sf_dir).select(
        F.lit("features").alias("tag"), "*"
    )
    return dec.unionByName(feats, allowMissingColumns=True)


def q_events_windows(spark, sf_dir):
    """The three event-time window shapes (I10 batch twins) as one
    tagged relation — the §8 consolidation of q_events_tumbling /
    q_events_sliding / q_events_sessionize. 'tumbling' = 1-hour
    windows; 'sliding' = 1-hour windows every 30 minutes (each event in
    exactly two; the oracle reproduces Spark's epoch-aligned starts via
    time_bucket + its 30-minute predecessor — DuckDB's 2000-01-01
    bucket origin is 30-minute-aligned with the epoch, so the grids
    coincide); 'session' = >30 min gap starts a new session (lag +
    running count of session starts, the batch expression of
    F.session_window), keyed as user_id/session_id."""
    ev = _t(spark, sf_dir, "events")

    def windowed(win, tag):
        return (
            ev.groupBy(win.alias("win"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                F.lit(tag).alias("tag"),
                F.col("event_type").alias("grp"),
                F.col("win.start").alias("win_start"),
                "n",
                "sum_value",
            )
        )

    tumbling = windowed(F.window("ts", "1 hour"), "tumbling")
    sliding = windowed(F.window("ts", "1 hour", "30 minutes"), "sliding")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    is_new = F.when(gap_ms.isNull() | (gap_ms > 30 * 60 * 1000), 1).otherwise(0)
    sessions = (
        ev.withColumn("session_id", F.sum(is_new).over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("win_start"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.lit("session").alias("tag"),
            F.concat_ws(
                "/", F.col("user_id").cast("string"), F.col("session_id").cast("string")
            ).alias("grp"),
            "win_start",
            "n",
            "sum_value",
        )
    )
    return tumbling.unionByName(sliding).unionByName(sessions)


def q_quality_classifier(spark, sf_dir):
    """Model-based quality scoring (llm/classify.py): fastText-style
    linear classifier over md5-prefix hashed token features, weights as
    a broadcast (bucket, weight) table — the pluggable-model tier above
    the heuristic quality filters. The oracle recomputes the whole
    model — bucket hashing, the deterministic stand-in weights, the
    logistic — so the score is hash-checked end-to-end, not just row
    shape. Scale: weights = 4096 rows broadcast; the one shuffle is the
    per-doc partial aggregate (|docs| rows, never |tokens|)."""
    from dataworks_spark.llm.classify import classifier_score, default_hash_weights

    d = _t(spark, sf_dir, "documents")
    return classifier_score(d, default_hash_weights(spark))


def q_quality_buckets(spark, sf_dir):
    """Quantile bucketing (llm/pipeline.py bucket_by_score): tercile
    buckets over n_chars — the CCNet head/middle/tail machinery with
    its exact-percentile boundary mode, which is what makes the
    bucket ASSIGNMENT (boundaries + strict-greater rule) reproducible
    in an independent engine. The approx sketch mode is the 100 TB
    path and shares this assignment projection."""
    from dataworks_spark.llm.pipeline import bucket_by_score

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return bucket_by_score(d, "n_chars", n_buckets=3, exact=True)


def q_contamination_report(spark, sf_dir):
    """The two n-gram-overlap audit relations over documents as ONE
    tagged relation (§8 consolidation of q_contamination_report +
    q_winnow_overlap, r12 — restores L18 to the driver's 50-entry
    correctness window).

    'report' branch — per-eval-doc contamination audit (llm/pipeline.py
    contamination_report): docs 0-4 stand in for an eval set; for each,
    the fraction of its distinct word 5-grams present in the rest of
    the corpus. The report direction (eval broadcasts, corpus scanned
    once, shuffle ≤ |eval shingles|) is the decontaminate join flipped;
    counts are hash-checked end-to-end against a string-shingle oracle
    (64-bit shingle collisions are the only divergence channel,
    ~|shingles|²/2⁶⁵).

    'winnow' branch — winnowing local-overlap detection (llm/dedup.py
    winnow_fingerprints, SIGMOD'03): per-window-min md5 fingerprints
    over word 4-gram hashes, pairs sharing ≥2 selected fingerprints
    (boilerplate fingerprints with df>50 dropped per the paper). The
    oracle reproduces the SELECTION (md5 strings compare identically in
    both engines), so the windowed-min choice itself is hash-checked.
    Catches shared passages whole-document similarity misses.

    'winnow_capped' branch (r14, closing r13 VERDICT #4 — the same
    treatment the r13 guards got): the identical kernel with
    ``max_df=2``, BELOW the subset's hottest fingerprint df (3 at
    sf0.01), so the boilerplate df-cap actually DROPS fingerprints
    under the driver every round (25 → 22 pairs at sf0.01) instead of
    existing only as a default nothing exercises. Hash-checked against
    the same SQL with the tighter HAVING bound.

    Both winnow branches band ONE shared asset. r15 (r14 VERDICT #1):
    the asset is the POSTINGS relation (fp, sorted doc list) — the
    corpus md5-shingled AND grouped by fingerprint, i.e. the pair
    kernel's first shuffle materialized — fingerprint-keyed and
    train-once through the ``_ann_cached`` memo (``table="documents"``)
    exactly like the ANN indexes and the SemDeDup quantizers, because
    it is what a 100 TB deployment persists at ingest
    (llm/dedup.save_winnow_postings is the durable form): every audit
    policy is then a row-local df-cap filter plus the pair-side
    shuffle, zero re-shuffles of the corpus-sized relation. Re-running
    the query re-pays only that policy stage — unless the documents
    table CHANGED, which the per-call fingerprint probe catches and
    forces a rebuild (pinned in test_scale.py). This is also why the
    query no longer sits in bench._REBUILD_EACH_PASS: the returned
    frame holds no one-shot checkpoint, only the cached asset, so
    steady passes honestly measure the re-runnable stages.

    Unified columns: id_a/id_b (eval doc | pair), n_total (report's
    shingle denominator), n_shared (hits | shared fingerprints), frac
    (contamination fraction). Columns a branch doesn't define are typed
    NULLs in BOTH engines, so the hash check stays end-to-end."""
    from dataworks_spark.llm.dedup import (
        winnow_fingerprint_relation,
        winnow_pairs_from_postings,
        winnow_postings,
    )
    from dataworks_spark.llm.pipeline import contamination_report

    d = _t(spark, sf_dir, "documents")
    rep = contamination_report(
        d.filter(F.col("doc_id") >= 5), d.filter(F.col("doc_id") < 5)
    ).select(
        F.lit("report").alias("tag"),
        F.col("eval_id").cast("long").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("n_grams").cast("long").alias("n_total"),
        F.col("n_hit").cast("long").alias("n_shared"),
        F.col("contamination").cast("double").alias("frac"),
    )
    def _build_postings():
        # max_keep_df=64 (r16, r15 VERDICT #5): covers every declared
        # policy (max_df 50 and 2 — a policy past the cap raises at
        # execution, never silently drops pairs) while bounding the
        # collected doc list, so a boilerplate fingerprint with df in
        # the millions can never build a single giant array row during
        # the asset build. Pair outputs are unchanged for max_df ≤ 64
        # (pinned in test_llm's capped-postings equality).
        rel = winnow_postings(
            winnow_fingerprint_relation(d), max_keep_df=64
        ).persist()
        rel.count()  # eager: the memo holds the materialized ASSET,
        # not a lazy plan — both policy branches (and both bench
        # passes) band in-memory POSTINGS (r15 split: the groupBy-fp
        # shuffle is part of the asset, so a policy run pays only the
        # row-local df-cap filter + the pair-side shuffle)
        return rel

    fps = _ann_cached(spark, sf_dir, "winnow-postings", _build_postings,
                      table="documents")

    def _win(tag, max_df):
        return winnow_pairs_from_postings(fps, max_df=max_df).select(
            F.lit(tag).alias("tag"),
            F.col("doc_a").cast("long").alias("id_a"),
            F.col("doc_b").cast("long").alias("id_b"),
            F.lit(None).cast("long").alias("n_total"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.lit(None).cast("double").alias("frac"),
        )

    return rep.unionByName(_win("winnow", 50)).unionByName(
        _win("winnow_capped", 2)
    )


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI)
# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "q_quality_classifier": """
        WITH w AS (
          SELECT lpad(lower(to_hex(i)), 3, '0') AS bucket_hex,
                 ((i * 2654435761 + 7) % 1000003) / 1000003.0 - 0.5 AS weight
          FROM range(0, 4096) t(i)
        ), tok AS (
          SELECT doc_id, substring(md5(tok), 1, 3) AS bucket_hex
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                FROM documents)
          WHERE tok <> ''
        )
        SELECT doc_id, count(bucket_hex) AS n_tokens,
               round(1.0 / (1.0 + exp(-(coalesce(sum(coalesce(w.weight, 0.0)), 0)
                                        / count(bucket_hex)))), 6) AS quality_score
        FROM tok LEFT JOIN w USING (bucket_hex)
        GROUP BY doc_id
    """,
    "q_interval_join": """
        WITH win AS (
          SELECT event_id AS window_id, ts AS w_start,
                 ts + INTERVAL 30 MINUTE AS w_end
          FROM events WHERE event_type = 'error' AND user_id < 5
        ), pts AS (
          SELECT event_id, ts FROM events WHERE user_id < 50
        )
        SELECT p.event_id, w.window_id
        FROM pts p JOIN win w ON p.ts >= w.w_start AND p.ts < w.w_end
    """,
    "q_quality_buckets": """
        WITH b AS (
          SELECT quantile_cont(CAST(n_chars AS DOUBLE), 1.0/3) AS b1,
                 quantile_cont(CAST(n_chars AS DOUBLE), 2.0/3) AS b2
          FROM documents
        )
        SELECT doc_id, n_chars,
               (CASE WHEN CAST(n_chars AS DOUBLE) > b1 THEN 1 ELSE 0 END
                + CASE WHEN CAST(n_chars AS DOUBLE) > b2 THEN 1 ELSE 0 END)
                 AS score_bucket
        FROM documents CROSS JOIN b
    """,
    "q_contamination_report": """
        WITH evd AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS nt
          FROM documents WHERE doc_id < 5
        ), ev AS (
          SELECT DISTINCT doc_id AS eval_id, g
          FROM evd, unnest(list_transform(range(1, nt - 3),
                     i -> array_to_string(toks[i:i+4], ' '))) AS t(g)
        ), sizes AS (
          SELECT eval_id, count(*) AS n_grams FROM ev GROUP BY eval_id
        ), trd AS (
          SELECT string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS nt
          FROM documents WHERE doc_id >= 5
        ), tr AS (
          SELECT DISTINCT g
          FROM trd, unnest(list_transform(range(1, nt - 3),
                     i -> array_to_string(toks[i:i+4], ' '))) AS t(g)
        ), hits AS (
          SELECT eval_id, count(*) AS n_hit
          FROM ev JOIN tr USING (g) GROUP BY eval_id
        ), wt AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS nt
          FROM documents
        ), hg AS (
          SELECT doc_id,
                 CASE WHEN nt >= 4 THEN
                   list_transform(range(1, nt - 2),
                                  i -> md5(array_to_string(toks[i:i+3], ' ')))
                 ELSE [] END AS hashes
          FROM wt
        ), fp AS (
          SELECT doc_id,
                 CASE WHEN len(hashes) = 0 THEN []
                 ELSE list_sort(list_distinct(list_transform(
                        range(1, GREATEST(len(hashes) - 3, 1) + 1),
                        i -> list_min(hashes[i:i+3])))) END AS fps
          FROM hg
        ), ex AS (
          SELECT doc_id, unnest(fps) AS fp FROM fp
        ), grp AS (
          SELECT fp FROM ex GROUP BY fp
          HAVING count(*) > 1 AND count(*) <= 50
        ), grpc AS (
          SELECT fp FROM ex GROUP BY fp
          HAVING count(*) > 1 AND count(*) <= 2
        )
        SELECT 'report' AS tag,
               d.doc_id AS id_a,
               CAST(NULL AS BIGINT) AS id_b,
               CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_total,
               CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_shared,
               CASE WHEN coalesce(s.n_grams, 0) > 0
                    THEN round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
                               / s.n_grams, 6)
                    ELSE 0.0 END AS frac
        FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 5) d
        LEFT JOIN sizes s ON s.eval_id = d.doc_id
        LEFT JOIN hits h ON h.eval_id = d.doc_id

        UNION ALL

        SELECT 'winnow' AS tag,
               a.doc_id AS id_a,
               b.doc_id AS id_b,
               CAST(NULL AS BIGINT) AS n_total,
               count(*) AS n_shared,
               CAST(NULL AS DOUBLE) AS frac
        FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
        JOIN grp g ON g.fp = a.fp
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2

        UNION ALL

        SELECT 'winnow_capped' AS tag,
               a.doc_id AS id_a,
               b.doc_id AS id_b,
               CAST(NULL AS BIGINT) AS n_total,
               count(*) AS n_shared,
               CAST(NULL AS DOUBLE) AS frac
        FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
        JOIN grpc g ON g.fp = a.fp
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2
    """,
    "q_scan_filter_topk": """
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               l_extendedprice * (1 - l_discount) AS disc_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
        ORDER BY disc_price DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    "q_lookup_pred": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_custkey = 42 OR c_name LIKE 'Customer#000000%'
    """,
    "q_join_star": """
        SELECT r_name, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY r_name, n_name
    """,
    "q_join_semi_anti": """
        SELECT 'with_orders' AS tag, c_mktsegment, COUNT(*) AS n
        FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'no_orders' AS tag, c_mktsegment, COUNT(*) AS n
        FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'outer_orders' AS tag, c_mktsegment,
               CAST(SUM(COALESCE(n.n_orders, 0)) AS BIGINT) AS n
        FROM customer LEFT JOIN (
          SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) n
        ON c_custkey = n.o_custkey
        GROUP BY c_mktsegment
    """,
    "q_join_asof": """
        WITH v AS (
          SELECT user_id AS v_user_id, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
                 value AS asof_value
          FROM events WHERE event_type = 'purchase')
        SELECT f.event_id, f.user_id, f.ts, v.asof_value
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') f
        JOIN v ON f.user_id = v.v_user_id
              AND f.ts >= v.valid_from
              AND (v.valid_to IS NULL OR f.ts < v.valid_to)
    """,
    "q_join_enrich": """
        SELECT c_mktsegment, event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
    """,
    "q_tpch_q5": """
        SELECT n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "q_agg_grouped": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
               ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_agg_having": """
        SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
    """,
    "q_correlated_subquery": """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    "q_agg_approx": """
        SELECT l_returnflag, l_linestatus,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median_price,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90_price,
               TRUE AS hll_within_15pct,
               TRUE AS hll_orders_within_15pct,
               TRUE AS approx_median_within_p40_p60,
               TRUE AS approx_p90_within_p85_p95
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q_agg_distinct": """
        SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(*) AS n_customers,
               array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
               bool_or(c_acctbal < 0) AS has_negative,
               bool_and(c_acctbal < 9900) AS all_below_9900
        FROM customer GROUP BY c_mktsegment
    """,
    "q_agg_rollup_cube": """
        SELECT 'rollup' AS tag, l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube' AS tag, l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_decontaminate": """
        WITH ev AS (
          SELECT list(DISTINCT g) AS shs FROM (
            SELECT unnest(list_transform(generate_series(1,
                     greatest(len(string_split(text, ' ')) - 4, 0)),
                   i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS g
            FROM documents WHERE doc_id < 25))
        SELECT t.doc_id,
               len(list_intersect(
                 list_transform(generate_series(1,
                   greatest(len(string_split(t.text, ' ')) - 4, 0)),
                 i -> array_to_string(string_split(t.text, ' ')[i:i+4], ' ')),
                 ev.shs)) > 0 AS contaminated
        FROM documents t CROSS JOIN ev WHERE t.doc_id >= 25
    """,
    "q_prepare_corpus": """
        WITH kept AS (
          SELECT doc_id, text FROM documents
          QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)
        ), f AS (
          SELECT doc_id, text,
            -- tokens() filters empty-string tokens (r10): every
            -- tokens()-derived feature uses the filtered \\s+ split
            len(list_filter(regexp_split_to_array(text, '\\s+'),
                t -> t <> '')) AS n_tokens,
            len(regexp_extract_all(text,
                '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS n_bpe_tokens,
            (LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')))
              / greatest(LENGTH(text), 1) AS punct_ratio,
            len(list_filter(string_split(lower(text), ' '),
                t -> list_contains(['the','a','of','and','to','in','is'], t)))
              / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                t -> t <> '')), 1) AS s_en,
            len(list_filter(string_split(lower(text), ' '),
                t -> list_contains(['der','die','das','und','zu','ist'], t)))
              / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                t -> t <> '')), 1) AS s_de,
            len(list_filter(string_split(lower(text), ' '),
                t -> list_contains(['el','la','de','que','y','es'], t)))
              / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                t -> t <> '')), 1) AS s_es,
            len(list_transform(generate_series(1,
                  greatest(len(string_split(text, ' ')) - 2, 0)),
                i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
              AS n_grams,
            len(list_distinct(list_transform(generate_series(1,
                  greatest(len(string_split(text, ' ')) - 2, 0)),
                i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
              AS n_distinct_grams
          FROM kept
        ), scored AS (
          SELECT doc_id, text, n_tokens, n_bpe_tokens, punct_ratio,
                 s_en, s_de, s_es,
                 least(n_tokens / 100.0, 1.0) * 0.4
                   + (1 - punct_ratio) * 0.3
                   + least(s_en * 5.0, 1.0) * 0.3 AS quality_score,
                 (n_grams - n_distinct_grams)
                   / greatest(n_grams, 1) AS dup_ngram_ratio
          FROM f
        )
        SELECT doc_id,
               CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS lang,
               n_tokens, n_bpe_tokens,
               ROUND(quality_score, 6) AS quality,
               md5(array_to_string(list_sort(list_distinct(list_filter(
                   regexp_split_to_array(text, '\\s+'), t -> t <> ''))), ' '))
                 AS fingerprint
        FROM scored
        WHERE n_tokens >= 5 AND punct_ratio <= 0.5
          AND quality_score >= 0.3 AND dup_ngram_ratio <= 0.5
    """,
    "q_pivot_unpivot": """
        WITH wide AS (
          SELECT l_returnflag,
                 ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
                 ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
          FROM lineitem GROUP BY l_returnflag)
        SELECT 'pivot' AS tag, l_returnflag AS key, 'qty_open' AS measure,
               qty_open AS value FROM wide
        UNION ALL
        SELECT 'pivot' AS tag, l_returnflag AS key, 'qty_filled' AS measure,
               qty_filled AS value FROM wide
        UNION ALL
        SELECT 'unpivot' AS tag, CAST(c_custkey AS VARCHAR) AS key, measure, value
        FROM (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
                 CAST(c_nationkey AS DOUBLE) AS nationkey
          FROM customer WHERE c_custkey <= 100
        )
        UNPIVOT (value FOR measure IN (acctbal, nationkey))
    """,
    "q_datalog_join": """
        SELECT DISTINCT c_custkey AS custkey, c_name AS cust_name, n_name AS nation_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment = 'BUILDING' AND c_name LIKE 'Customer#0000%'
    """,
    "q_datalog_or": """
        SELECT DISTINCT c_custkey AS custkey, c_name AS cust_name, c_acctbal AS acctbal
        FROM customer
        WHERE (c_mktsegment = 'BUILDING'  AND c_acctbal > 9000)
           OR (c_mktsegment = 'MACHINERY' AND c_acctbal < 0)
    """,
    "q_datalog_agg": """
        SELECT n_name AS nation_name,
               COUNT(c_custkey) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS sum_bal,
               MIN(c_acctbal) AS min_bal,
               MAX(c_acctbal) AS max_bal,
               COUNT(DISTINCT c_mktsegment) AS n_segments,
               ROUND(AVG(c_acctbal), 4) AS avg_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q_datalog_rule": """
        WITH RECURSIVE e AS (
          SELECT p_partkey AS src, p_partkey // 2 AS dst FROM part
          WHERE p_partkey >= 2 AND p_partkey <= 2000
        ), c(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT c.src, e.dst FROM c JOIN e ON c.dst = e.src
        )
        SELECT DISTINCT c.src AS partkey, p.p_name AS part_name
        FROM c JOIN part p ON p.p_partkey = c.src
        WHERE c.dst = 7
    """,
    "q_window_functions": """
        SELECT event_id, user_id, value, rn, time_quartile, value_dense_rank,
               prev_value, next_value, first_value, last_value,
               running_value, trailing_hour_value FROM (
          SELECT event_id, user_id, value,
                 row_number() OVER wu AS rn,
                 ntile(4) OVER wu AS time_quartile,
                 dense_rank() OVER (PARTITION BY user_id
                     ORDER BY value DESC) AS value_dense_rank,
                 lag(value)  OVER wu AS prev_value,
                 lead(value) OVER wu AS next_value,
                 first_value(value) OVER wf AS first_value,
                 last_value(value)  OVER wf AS last_value,
                 ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_value,
                 ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                       RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 4)
                   AS trailing_hour_value
          FROM events
          WINDOW wu AS (PARTITION BY user_id ORDER BY ts, event_id),
                 wf AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
        WHERE prev_value IS NOT NULL
    """,
    "q_set_union_intersect_except": """
        SELECT 'union' AS tag, nk FROM (
          SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier) u
        UNION ALL
        SELECT 'intersect' AS tag, nk FROM (
          SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier) i
        UNION ALL
        SELECT 'except' AS tag, nk FROM (
          SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier) e
    """,
    "q_scalar_functions": """
        SELECT event_id,
               UPPER(event_type) AS type_upper,
               CAST(LENGTH(event_type) AS INTEGER) AS type_len,
               event_type || '-' || CAST(user_id AS VARCHAR) AS type_key,
               contains(event_type, 'ck') AS has_ck,
               starts_with(event_type, 'cl') AS is_cl,
               REPLACE(event_type, 'e', 'E') AS type_repl,
               SUBSTRING(event_type, 1, 3) AS type_pre,
               string_split(event_type, 'r')[1] AS type_split,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
               ts + INTERVAL 3 DAY AS plus_3d,
               epoch_ms(ts) AS epoch_ms,
               CAST(year(ts) AS INTEGER) AS y,
               CAST(month(ts) AS INTEGER) AS m,
               CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-06-01') AS INTEGER)
                 AS days_to_mid,
               CAST(ts AS DATE)
                 + CAST(((1 - isodow(ts) + 6) % 7) + 1 AS INTEGER) AS next_monday,
               json_extract_string(props, '$.k') AS k_str,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               map([event_type], [value])[event_type][1] AS mapped_value,
               CAST(cardinality(map([event_type], [value])) AS INTEGER) AS n_keys,
               CAST(len([value, value * 2, value + 1.0]) AS INTEGER) AS arr_dim,
               [value, value * 2, value + 1.0][2] AS arr_second,
               ROUND(list_aggregate(list_transform([value, value * 2, value + 1.0],
                     x -> x * x), 'sum'), 6) AS arr_norm_sq,
               CAST(len(list_filter([value, value * 2, value + 1.0],
                     x -> x > 0)) AS INTEGER) AS arr_n_pos
        FROM events
    """,
    "q_explode_flatmap": """
        SELECT lang, token, COUNT(*) AS n FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents) t
        GROUP BY lang, token
    """,
    "q_doc_store": """
        WITH src AS (
          SELECT user_id, ts, event_type, value
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts
                          ORDER BY event_id DESC) AS dd
                FROM events)
          WHERE dd = 1),
        log AS (
          SELECT 'app/' || CAST(user_id AS VARCHAR) AS id, event_type, value,
                 ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
          FROM src)
        SELECT 'asof' AS tag, id, event_type, value, valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM log
        WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
          AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        UNION ALL
        SELECT 'latest' AS tag, id, event_type, value, valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM log WHERE rn = 1 AND event_type <> 'error'
        UNION ALL
        SELECT 'history' AS tag, id, event_type, value, valid_from, valid_to
        FROM log WHERE id = 'app/3'
    """,
    "q_dedup_exact": """
        SELECT md5(text) AS content_md5, MIN(doc_id) AS keeper_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "q_cosine_knn": """
        WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id,
                 ROUND(
                   list_aggregate(list_transform(list_zip(embedding, qvec),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                   / (SQRT(list_aggregate(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * SQRT(list_aggregate(list_transform(qvec,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6)
                   AS cos_sim
          FROM embeddings, q WHERE vec_id <> 0
        ),
        kq AS (
          SELECT vec_id AS q_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
        ), kc AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5
        ), kscored AS (
          SELECT q_id, kc.vec_id,
                 ROUND(
                   list_aggregate(list_transform(list_zip(embedding, qvec),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                   / (SQRT(list_aggregate(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * SQRT(list_aggregate(list_transform(qvec,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6)
                   AS cos_sim
          FROM kc, kq
        )
        SELECT 'topk' AS tag, CAST(0 AS BIGINT) AS q_id, vec_id, cos_sim
        FROM (SELECT vec_id, cos_sim FROM scored
              ORDER BY cos_sim DESC, vec_id LIMIT 10)
        UNION ALL
        SELECT tag, q_id, vec_id, cos_sim FROM (
          SELECT 'knn' AS tag, q_id, vec_id, cos_sim,
                 row_number() OVER (
                   PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM kscored) WHERE rnk <= 3
    """,
    "q_text_stats": """
        WITH f AS (
          SELECT lang, n_chars, source,
                 len(string_split(text, ' ')) AS n_toks,
                 -- tokens() filters empty strings (r10): the filtered
                 -- \\s+ split backs every tokens()-derived feature
                 len(list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> t <> '')) AS n_ftoks,
                 len(regexp_extract_all(text,
                     '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS n_bpe,
                 (LENGTH(text) - (len(list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> t <> '')) - 1))
                   / greatest(len(list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> t <> '')), 1) AS tok_len,
                 (LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   / greatest(LENGTH(text), 1) AS punct_ratio,
                 len(list_filter(string_split(lower(text), ' '),
                     t -> list_contains(['the','a','of','and','to','in','is'], t)))
                   / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '')), 1) AS sw_ratio,
                 len(list_filter(string_split(lower(text), ' '),
                     t -> list_contains(['der','die','das','und','zu','ist'], t)))
                   / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '')), 1) AS s_de,
                 len(list_filter(string_split(lower(text), ' '),
                     t -> list_contains(['el','la','de','que','y','es'], t)))
                   / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '')), 1) AS s_es,
                 len(list_transform(generate_series(1,
                       greatest(len(string_split(text, ' ')) - 2, 0)),
                     i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
                   AS n_grams,
                 len(list_distinct(list_transform(generate_series(1,
                       greatest(len(string_split(text, ' ')) - 2, 0)),
                     i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
                   AS n_distinct_grams
          FROM documents)
        SELECT lang,
               CAST(SUM(CASE WHEN sw_ratio >= s_de AND sw_ratio >= s_es
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_guess_en,
               CAST(SUM(CASE WHEN NOT (sw_ratio >= s_de AND sw_ratio >= s_es)
                        AND s_de >= s_es THEN 1 ELSE 0 END) AS BIGINT) AS n_guess_de,
               CAST(SUM(CASE WHEN NOT (sw_ratio >= s_de AND sw_ratio >= s_es)
                        AND NOT (s_de >= s_es) THEN 1 ELSE 0 END) AS BIGINT) AS n_guess_es,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 6) AS avg_chars,
               ROUND(AVG(n_toks), 6) AS avg_tokens,
               COUNT(DISTINCT source) AS n_sources,
               ROUND(AVG(n_bpe), 6) AS avg_bpe_tokens,
               ROUND(AVG(tok_len), 6) AS avg_token_len,
               ROUND(AVG(punct_ratio), 6) AS avg_punct_ratio,
               ROUND(AVG(sw_ratio), 6) AS avg_stopword_ratio,
               ROUND(AVG(least(n_ftoks / 100.0, 1.0) * 0.4
                     + (1 - punct_ratio) * 0.3
                     + least(sw_ratio * 5.0, 1.0) * 0.3), 6) AS avg_quality,
               ROUND(AVG((n_grams - n_distinct_grams)
                     / greatest(n_grams, 1)), 6) AS avg_dup_3gram
        FROM f GROUP BY lang
    """,
    "q_token_join": """
        WITH tok AS (
          SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 100),
        sizes AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id),
        keep AS (
          SELECT token FROM tok GROUP BY token HAVING COUNT(DISTINCT doc_id) <= 80),
        overlap AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
          JOIN keep k ON k.token = a.token
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, overlap,
               ROUND(overlap / (sa.n_tokens + sb.n_tokens - overlap), 6) AS jaccard
        FROM overlap
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE overlap >= 5
    """,
    "q_dedup_ngram": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
                        i -> array_to_string(w[i:i+2], ' '))) AS shingle
          FROM t),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        ov AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, inter,
               ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        FROM ov JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.3
    """,
    "q_embed_neardup": """
        WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        pr AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
                 / (SQRT(list_aggregate(list_transform(a.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                  * SQRT(list_aggregate(list_transform(b.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cs
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, ROUND(cs, 6) AS cos_sim FROM pr WHERE cs >= 0.35
    """,
    "q_events_windows": """
        WITH g AS (
          SELECT user_id, event_id, ts, value,
                 epoch_ms(ts) - epoch_ms(lag(ts) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
          FROM events),
        s AS (
          SELECT user_id, event_id, ts, value,
                 SUM(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM g),
        sl AS (
          SELECT event_type, value,
                 unnest([time_bucket(INTERVAL '30 minutes', ts),
                         time_bucket(INTERVAL '30 minutes', ts)
                           - INTERVAL '30 minutes']) AS win_start
          FROM events)
        SELECT 'tumbling' AS tag, event_type AS grp,
               date_trunc('hour', ts) AS win_start,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY 1, 2, 3
        UNION ALL
        SELECT 'sliding' AS tag, event_type AS grp, win_start,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM sl GROUP BY 1, 2, 3
        UNION ALL
        SELECT 'session' AS tag,
               CAST(user_id AS VARCHAR) || '/' || CAST(session_id AS VARCHAR) AS grp,
               MIN(ts) AS win_start, COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value
        FROM s GROUP BY user_id, session_id
    """,
    "q_text_retrieval": """
        WITH bfeat AS (
          SELECT doc_id, len(tk) AS dl,
                 len(list_filter(tk, t -> t = 'vector')) AS tf0,
                 len(list_filter(tk, t -> t = 'stream')) AS tf1,
                 len(list_filter(tk, t -> t = 'merge'))  AS tf2
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents)
        ), bstats AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
                 SUM(CASE WHEN tf0>0 THEN 1 ELSE 0 END) AS df0,
                 SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS df1,
                 SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS df2
          FROM bfeat
        ), bm AS (
          SELECT doc_id, ROUND(
              ln(1 + (n_docs - df0 + 0.5)/(df0 + 0.5))
                * tf0*2.2/(tf0 + 1.2*(0.25 + 0.75*dl/(CAST(sum_dl AS DOUBLE)/n_docs)))
            + ln(1 + (n_docs - df1 + 0.5)/(df1 + 0.5))
                * tf1*2.2/(tf1 + 1.2*(0.25 + 0.75*dl/(CAST(sum_dl AS DOUBLE)/n_docs)))
            + ln(1 + (n_docs - df2 + 0.5)/(df2 + 0.5))
                * tf2*2.2/(tf2 + 1.2*(0.25 + 0.75*dl/(CAST(sum_dl AS DOUBLE)/n_docs))), 6)
            AS val
          FROM bfeat CROSS JOIN bstats
          WHERE tf0>0 OR tf1>0 OR tf2>0
          ORDER BY val DESC, doc_id LIMIT 10
        ), tfeat AS (
          SELECT doc_id,
                 len(list_filter(tk, t -> t = 'table'))  AS tf0,
                 len(list_filter(tk, t -> t = 'spark'))  AS tf1,
                 len(list_filter(tk, t -> t = 'vector')) AS tf2
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents)
        ), tstats AS (
          SELECT COUNT(*) AS n_docs,
                 SUM(CASE WHEN tf0>0 THEN 1 ELSE 0 END) AS df0,
                 SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS df1,
                 SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS df2
          FROM tfeat
        ), tf AS (
          SELECT doc_id,
            ROUND(CASE WHEN tf0>0 THEN (1.0 + ln(CAST(tf0 AS DOUBLE))) * (ln(n_docs/(1.0+df0)) + 1.0) ELSE 0.0 END, 6) AS v0,
            ROUND(CASE WHEN tf1>0 THEN (1.0 + ln(CAST(tf1 AS DOUBLE))) * (ln(n_docs/(1.0+df1)) + 1.0) ELSE 0.0 END, 6) AS v1,
            ROUND(CASE WHEN tf2>0 THEN (1.0 + ln(CAST(tf2 AS DOUBLE))) * (ln(n_docs/(1.0+df2)) + 1.0) ELSE 0.0 END, 6) AS v2
          FROM tfeat CROSS JOIN tstats
        )
        SELECT 'bm25' AS tag, doc_id, CAST(0 AS BIGINT) AS term_idx, val FROM bm
        UNION ALL
        SELECT 'tfidf' AS tag, doc_id, CAST(0 AS BIGINT) AS term_idx, v0 AS val FROM tf
        UNION ALL
        SELECT 'tfidf' AS tag, doc_id, CAST(1 AS BIGINT) AS term_idx, v1 AS val FROM tf
        UNION ALL
        SELECT 'tfidf' AS tag, doc_id, CAST(2 AS BIGINT) AS term_idx, v2 AS val FROM tf
    """,
    "q_mix_corpus": """
        WITH tok AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 ((doc_id % 1000000) * 2654435761) % 1000000 AS bucket
          FROM documents WHERE source IN ('src0', 'src1', 'src2')
        ), tw(source, w) AS (
          VALUES ('src0', CAST(0.5 AS DOUBLE)),
                 ('src1', CAST(0.3 AS DOUBLE)),
                 ('src2', CAST(0.2 AS DOUBLE))
        ), tot AS (
          SELECT source, SUM(n_tokens) AS actual FROM tok GROUP BY source
        ), scale AS (
          SELECT MIN(CAST(actual AS DOUBLE) / w) AS t FROM tot JOIN tw USING (source)
        ), frac AS (
          SELECT source, w * t / CAST(actual AS DOUBLE) AS f
          FROM tot JOIN tw USING (source) CROSS JOIN scale
        ), cum AS (
          SELECT doc_id, source, n_tokens, w,
                 SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY bucket, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          FROM tok JOIN tw USING (source)
        )
        SELECT 'expected' AS tag, doc_id, source, n_tokens, 0 AS epoch
        FROM tok JOIN frac USING (source)
        WHERE bucket < FLOOR(f) * 1000000 + FLOOR((f - FLOOR(f)) * 1000000)
        UNION ALL
        SELECT 'exact' AS tag, doc_id, source, n_tokens, 0 AS epoch
        FROM cum CROSS JOIN scale
        WHERE CAST(c AS DOUBLE) <= w * t
    """,
    "q_dedup_spans": """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents
        ), spans AS (
          SELECT doc_id,
                 CAST((s - 1) / 8 AS INT) AS idx,
                 array_to_string(list_slice(toks, s, LEAST(s + 7, n)), ' ')
                   AS span
          FROM t, UNNEST(generate_series(1, GREATEST(n, 1), 8)) AS u(s)
        ), flagged AS (
          SELECT doc_id, idx, span,
                 ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, idx) = 1
                   AS keep
          FROM spans
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_spans_kept,
               COALESCE(string_agg(CASE WHEN keep THEN span END, ' '
                                   ORDER BY idx), '') AS text
        FROM flagged GROUP BY doc_id
    """,
    "q_corpus_stats": """
        WITH lens AS (
          SELECT CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> t <> '')) AS BIGINT) AS dl
          FROM documents
        ), doc_stats AS (
          SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS n_tokens,
                 quantile_cont(dl, 0.5) AS p50,
                 quantile_cont(dl, 0.9) AS p90
          FROM lens
        ), vocab AS (
          SELECT COUNT(DISTINCT tok) AS vocab_size
          FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                       t -> t <> '')) AS tok
                FROM documents)
        ), fp AS (
          SELECT COUNT(*) AS n_distinct_fp,
                 CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_docs,
                 MAX(n) AS max_fp_docs
          FROM (
            SELECT md5(array_to_string(list_sort(list_distinct(list_filter(
                       regexp_split_to_array(text, '\\s+'), t -> t <> ''))), ' ')) AS f2,
                   COUNT(*) AS n
            FROM documents GROUP BY 1)
        )
        SELECT n_docs, n_tokens, vocab_size,
               ROUND(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS avg_doc_tokens,
               ROUND(p50, 6) AS p50_doc_tokens,
               ROUND(p90, 6) AS p90_doc_tokens,
               ROUND(CAST(vocab_size AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
               n_distinct_fp, n_dup_docs, max_fp_docs
        FROM doc_stats CROSS JOIN vocab CROSS JOIN fp
    """,
    "q_lm_quality": """
        WITH tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf
          FROM (SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                              t -> t <> '')) AS tok
                FROM documents)
          GROUP BY doc_id, tok
        ), cnt AS (
          SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY tok
        ), stats AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n_total, COUNT(*) AS v FROM cnt
        )
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl,
               ROUND(SUM(tf * -log2((cnt + 0.5) / (n_total + 0.5 * v)))
                     / SUM(tf), 6) AS lm_bits_per_token
        FROM tf JOIN cnt USING (tok) CROSS JOIN stats
        GROUP BY doc_id
    """,
    "q_chunk_documents": """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents
        )
        SELECT doc_id,
               CAST((s - 1) / 48 AS INT) AS chunk_idx,
               array_to_string(list_slice(toks, s, LEAST(s + 63, n)), ' ')
                 AS chunk_text,
               CAST(LEAST(64, n - s + 1) AS BIGINT) AS chunk_n_tokens
        FROM t, UNNEST(generate_series(1, GREATEST(n - 16, 1), 48)) AS u(s)
    """,
    "q_edit_distance_join": """
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM customer a, customer b
        WHERE a.c_custkey < 150 AND b.c_custkey < 150
          AND a.c_custkey < b.c_custkey
          AND abs(length(a.c_name) - length(b.c_name)) <= 2
          AND levenshtein(a.c_name, b.c_name) <= 2
    """,
    "q_dedup_clusters": """
        WITH RECURSIVE edges AS (
          SELECT a.c_custkey AS src, b.c_custkey AS dst
          FROM customer a, customer b
          WHERE a.c_custkey < 150 AND b.c_custkey < 150
            AND a.c_custkey < b.c_custkey
            AND abs(length(a.c_name) - length(b.c_name)) <= 2
            AND levenshtein(a.c_name, b.c_name) <= 2
        ), sym AS (
          SELECT src, dst FROM edges
          UNION
          SELECT dst AS src, src AS dst FROM edges
        ), reach(src, dst) AS (
          SELECT src, dst FROM sym
          UNION
          SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
        )
        SELECT src AS id, MIN(dst) AS cluster
        FROM reach GROUP BY src
    """,
    "q_redact_pii": """
        WITH salted AS (
          SELECT doc_id,
                 CASE
                   WHEN doc_id % 4 = 0 THEN 'mail u' || CAST(doc_id AS VARCHAR) || '@example.com'
                   WHEN doc_id % 4 = 1 THEN 'call (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   WHEN doc_id % 4 = 2 THEN 'host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                   ELSE 'id 123-45-6789'
                 END || ' ' || text AS text
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[PII]', 'g'),
                     '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '[PII]', 'g'),
                   '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[PII]', 'g'),
                 '(?:\\([0-9]{3}\\)[ .-]?|\\b[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}\\b',
                 '[PII]', 'g') AS clean_text,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text,
                 '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS BIGINT) AS n_ssn,
               CAST(len(regexp_extract_all(text,
                 '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(text,
                 '(?:\\([0-9]{3}\\)[ .-]?|\\b[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}\\b')) AS BIGINT) AS n_phone
        FROM salted
    """,
    "q_pack_sequences": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(doc_id % 8 AS INT) AS pack_lane,
               CAST(floor(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                   PARTITION BY doc_id % 8 ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 / 512) AS BIGINT) AS pack_seq
        FROM documents
    """,
}


QUERIES = {
    name: fn
    for name, fn in sorted(globals().items())
    if name.startswith("q_") and callable(fn)
}
