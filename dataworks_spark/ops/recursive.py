"""Recursive rule evaluation — transitive closure (SURVEY §2 C5).

The reference exposes recursive Datalog rules through Crux
(`(depends d1 d2)` over stored-function dependency edges,
db/app_db.clj:121-126). Spark has no recursive CTE, so this is a
driver-side **semi-naive fixpoint**: each iteration joins only the
frontier (paths discovered last round) against the edge set, unions
into the closure, and stops when the frontier is empty.

Scale notes (100 TB):
  - semi-naive (frontier ⋈ edges, not closure ⋈ edges) keeps each
    iteration's join input minimal;
  - `localCheckpoint()` per iteration truncates the lineage so the plan
    doesn't grow exponentially with depth;
  - edges are re-used across iterations → cache them;
  - max_iterations caps runaway recursion (the reference ships cycle
    detection for the same reason, utils/common.clj:461-484); cycle
    safety itself comes from the anti-join of new paths against the
    closure (a revisited pair produces no new frontier row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """All (src, dst) pairs connected by ≥1 edge-hops."""
    edges = edges.select(src, dst).dropDuplicates().cache()
    closure = edges
    frontier = edges
    for _ in range(max_iterations):
        # extend each frontier path by one edge: (s, m) ⋈ (m, d) → (s, d)
        grown = (
            frontier.withColumnRenamed(dst, "__mid")
            .join(edges.withColumnRenamed(src, "__mid"), on="__mid")
            .select(src, dst)
            .dropDuplicates()
        )
        new = grown.join(closure, on=[src, dst], how="left_anti").localCheckpoint()
        if new.isEmpty():
            break
        closure = closure.unionByName(new).localCheckpoint()
        frontier = new
    edges.unpersist()
    return closure
