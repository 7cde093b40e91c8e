"""Set operations (SURVEY §2 G).

Reference surface: `clojure.set/union` on stream edge-sets
(stream.clj:77), `st/intersection` of auth roles (utils/auth.clj:53),
filter-difference (stream.clj:78, utils/kafka.clj:31-42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set-semantics union (G1)."""
    return a.unionByName(b).dropDuplicates()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set intersection (G2)."""
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set difference (G3): EXCEPT DISTINCT. ``exceptAll().
    dropDuplicates()`` computed MULTISET difference then deduped, so a
    row present in both inputs survived whenever the left held more
    copies than the right (a=[x,x], b=[x] → [x], not ∅) — inconsistent
    with union_distinct/intersect_rows' set semantics (r10 review)."""
    return a.subtract(b)
