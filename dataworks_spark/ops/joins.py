"""Join operators (SURVEY §2 C).

The reference joins only through Datalog unification (shared logic
variables across :where triple patterns, e.g.
src/dataworks/utils/alert.clj:10-15, db/app_db.clj:128-132); the
physical join choice was Crux's. Here the logical plan is declared with
DataFrame joins and Catalyst/AQE picks broadcast / shuffled-hash /
sort-merge, splits skewed partitions, and reorders with CBO.

Scale notes (100 TB):
  - dimension tables (region/nation/customer at TPC-H shape) are
    broadcast — no shuffle of the fact table for enrichment joins;
  - fact⋈fact equi-joins shuffle on the key once; chained joins on the
    same key reuse the exchange;
  - as-of joins avoid a cross-product by computing validity intervals
    with one window pass, then a range-predicate join that AQE can
    still broadcast when the versioned side is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column | str]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Chain fact ⋈ dim1 ⋈ dim2 … (reference: multi-entity unification,
    db/app_db.clj:128-132). Dimensions are broadcast by default so the
    fact side never shuffles for enrichment."""
    out = fact
    for dim, on in dims:
        right = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(right, on=on, how="inner")
    return out


def semi_join(left: DataFrame, right: DataFrame, on: Column | str | list[str]) -> DataFrame:
    """EXISTS — reference ``not-empty`` on a query result
    (collector.clj:69-82)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | str | list[str]) -> DataFrame:
    """NOT EXISTS — reference uniqueness check before insert
    (utils/auth.clj:90-100, db/app_db.clj:71-77)."""
    return left.join(right, on=on, how="left_anti")


def point_lookup(df: DataFrame, id_col: str, key) -> DataFrame:
    """Entity point lookup, ``crux/entity db eid``
    (reference db/app_db.clj:45-48). The literal equality predicate is
    pushed into the parquet scan (min/max + dictionary pruning)."""
    return df.filter(F.col(id_col) == F.lit(key))


def range_join(
    left: DataFrame, right: DataFrame, condition: Column, how: str = "inner"
) -> DataFrame:
    """Theta/range-predicate join (reference: alert due-check range
    predicate, utils/alert.clj:33-42 + demo-app-1.org:125-127)."""
    return left.join(right, on=condition, how=how)


def versions_with_validity(
    df: DataFrame,
    key: str,
    ts: str,
    end_name: str = "valid_to",
    start_name: str = "valid_from",
    tiebreak: tuple = (),
) -> DataFrame:
    """Turn an append-only version log into interval rows:
    valid_from = ts, valid_to = next version's ts (open-ended NULL for
    the latest). One window pass — no self-join.

    ``tiebreak`` names extra order columns for rows sharing (key, ts):
    without one, which duplicate gets the degenerate [ts, ts) interval
    — and therefore every downstream as-of answer — depends on shuffle
    arrival order (r10 review; the repo convention is that window
    orderings always carry a unique tiebreaker). Pass a unique column
    (an event id) so the result is layout-invariant AND reproducible by
    a SQL oracle (unlike a hash tiebreak, which is engine-specific)."""
    w = Window.partitionBy(key).orderBy(
        F.col(ts).asc(), *[F.col(c).asc() for c in tiebreak]
    )
    return df.withColumn(start_name, F.col(ts)).withColumn(
        end_name, F.lead(F.col(ts)).over(w)
    )


def asof_join(
    fact: DataFrame,
    versions: DataFrame,
    fact_key: str,
    version_key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Temporal point (as-of) join: for each fact row pick the dimension
    version whose validity interval contains the fact timestamp —
    the bitemporal arity of reference queries (db/app_db.clj:37-43).

    Implemented as an equi-join on the entity key (shuffle on key, AQE
    may broadcast the versioned side) plus interval containment, which
    selects exactly one version per fact row because intervals produced
    by :func:`versions_with_validity` partition the timeline."""
    cond = (
        (fact[fact_key] == versions[version_key])
        & (fact[fact_ts] >= versions[valid_from])
        & (versions[valid_to].isNull() | (fact[fact_ts] < versions[valid_to]))
    )
    return fact.join(versions, on=cond, how=how)


def bucketized_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "1 hour",
    extra_keys: tuple = (),
    max_buckets_per_interval: int | None = 10_000,
) -> DataFrame:
    """Scalable point-in-interval (range) join: the keyless form of
    :func:`range_join` that does NOT degrade to a nested-loop compare
    of every point against every interval.

    Construction (the standard time-bucketization of interval joins —
    Flink's interval-join partitioning, DuckDB/Postgres range-join
    bucketing): each interval is EXPLODED onto every ``bucket`` it
    overlaps, each point maps to its single bucket, the join becomes an
    equi-join on (bucket, *extra_keys) and the original containment
    predicate ``start <= ts < end`` verifies exactly. Every true pair
    meets in precisely the point's bucket, so no dedup is needed; pair
    work is Σ_bucket |points_b|·|intervals_b| instead of |P|·|I|.

    Choose ``bucket`` near the median interval length: shorter buckets
    replicate long intervals (bounded by ``max_buckets_per_interval``,
    enforced at execution — a cap breach raises rather than silently
    exploding), longer buckets put unrelated rows in one bucket.
    Half-open semantics: a point with ``ts == end`` does not match.

    Intervals must be BOUNDED. A NULL start/end (the open-ended
    'current' row of a version log) follows SQL comparison semantics:
    ``ts < NULL`` is never true, so the row matches NOTHING — every
    point after the last closed version silently joins to no interval
    (r9 review). An in-plan assert cannot catch this (Catalyst rightly
    prunes rows that cannot satisfy the null-intolerant join
    condition), so the contract is stated here instead: close open
    intervals with a far-future sentinel (functions.timeops.NEVER)
    before calling, or use :func:`asof_join`, which supports open
    validity natively."""
    bstep = F.expr(f"interval {bucket}")
    p = points.withColumn("__b", F.window(F.col(point_ts), bucket)["start"])
    istart = F.window(F.col(start_col), bucket)["start"]
    # last bucket containing any instant < end: floor(end - 1 microsecond)
    iend = F.window(F.col(end_col) - F.expr("interval 1 microsecond"), bucket)["start"]
    seq = F.sequence(istart, iend, bstep)
    if max_buckets_per_interval is not None:
        guard = F.assert_true(
            F.size(seq) <= max_buckets_per_interval,
            F.lit(
                f"interval spans more than {max_buckets_per_interval} "
                f"'{bucket}' buckets; raise bucket or the cap"
            ),
        )
        seq = F.when(guard.isNull(), seq)
    # NULL start/end rows are unreachable for any in-plan guard: the
    # join condition is null-intolerant, so Catalyst infers
    # isnotnull(start/end) and prunes such rows below any assert
    # (verified against the physical plan). SQL semantics — a NULL
    # bound matches nothing — are therefore the behavior, documented
    # loudly above.
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__b", F.explode(seq)
    )
    on = [p["__b"] == iv["__b"]] + [p[k] == iv[k] for k in extra_keys]
    # point side qualified explicitly: an unqualified F.col(point_ts) is
    # ambiguous when the intervals frame carries a same-named column
    # (common when both sides derive from one events table)
    cond = (
        (p[point_ts] >= iv[start_col])
        & (p[point_ts] < iv[end_col])
    )
    joined = p.join(iv, on=[*on, cond], how="inner")
    return joined.drop(p["__b"]).drop(iv["__b"]).drop(
        *[iv[k] for k in extra_keys]
    )
