"""Recursive rule evaluation — transitive closure (SURVEY §2 C5).

The reference exposes recursive Datalog rules through Crux
(`(depends d1 d2)` over stored-function dependency edges,
db/app_db.clj:121-126). Spark has no recursive CTE, so closure is a
driver-side fixpoint loop. Two strategies:

  doubling (default) — path doubling / repeated squaring:
      R ← R ∪ (R ∘ R)
    reaches paths of length 2^k after k rounds, so a depth-d graph
    needs ⌈log₂ d⌉ driver round-trips instead of d. Each round is one
    self-join + anti-join + union. At 100 TB scale, driver round-trips
    (scheduler barriers, lineage checkpoints) dominate over join work,
    so log-depth wins decisively for deep graphs.

  semi_naive — classic frontier ⋈ edges per round; minimal per-round
    join input, d rounds. Better when the closure is shallow but huge
    (doubling's R∘R join quadratically exceeds frontier⋈edges).

Shared mechanics:
  - `localCheckpoint()` per round truncates lineage so the plan doesn't
    grow exponentially;
  - cycle safety: the anti-join against the accumulated closure means a
    revisited pair never re-enters the frontier (the reference ships
    cycle detection for the same reason, utils/common.clj:461-484);
  - `max_iterations` caps runaway recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    method: str = "doubling",
) -> DataFrame:
    """All (src, dst) pairs connected by ≥1 edge-hops."""
    if method == "doubling":
        return _doubling(edges, src, dst, max_iterations)
    return _semi_naive(edges, src, dst, max_iterations)


def _doubling(edges: DataFrame, src: str, dst: str, max_iterations: int) -> DataFrame:
    # One shuffle-dedup + one checkpoint + one (cheap, in-memory) count
    # per round; convergence = the closure stopped growing. This does
    # strictly less per round than the anti-join formulation (one
    # materialization instead of two) at the cost of counting the
    # checkpointed result — a scan of already-materialized partitions.
    # (Chaining rounds lazily to save job launches was measured SLOWER:
    # analysis/codegen of the nested self-join plans dominates.)
    closure = edges.select(src, dst).dropDuplicates().localCheckpoint()
    prev = closure.count()
    for _ in range(max_iterations):
        # R ∪ R∘R: (s, m) ⋈ (m, d) → (s, d)
        left = closure.withColumnRenamed(dst, "__mid")
        right = closure.withColumnRenamed(src, "__mid")
        grown = left.join(right, on="__mid").select(src, dst)
        closure = closure.unionByName(grown).dropDuplicates().localCheckpoint()
        cur = closure.count()
        if cur == prev:
            break
        prev = cur
    return closure


def _semi_naive(edges: DataFrame, src: str, dst: str, max_iterations: int) -> DataFrame:
    edges = edges.select(src, dst).dropDuplicates().cache()
    closure = edges
    frontier = edges
    for _ in range(max_iterations):
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
