"""Property-based test for transitive closure (SURVEY §2 C5).

Random sparse digraphs — including cycles, self-loops, diamonds, and
disconnected nodes — closed by a brute-force Python reachability
interpreter; both distributed strategies (path-doubling and semi-naive)
must produce the identical pair set. Protects the count-based
convergence rewrite in ops/recursive.py.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataworks_spark.ops.recursive import transitive_closure


def _brute_closure(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out: set[tuple[int, int]] = set()
    for start in adj:
        seen: set[int] = set()
        stack = list(adj[start])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        out.update((start, n) for n in seen)
    return out


edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=14, unique=True
)


@pytest.mark.parametrize("method", ["doubling", "semi_naive"])
@given(edges=edges_strategy)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_closure_matches_bruteforce(spark, method, edges):
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        (r.src, r.dst)
        for r in transitive_closure(df, "src", "dst", method=method).collect()
    }
    assert got == _brute_closure(edges), f"method={method} edges={edges}"


def test_depth_bound_clamped_by_max_iterations_still_strict(spark):
    """depth_bound proves convergence only if the loop actually runs the
    bound-derived number of rounds; when max_iterations clamps below it,
    strict mode must raise instead of returning a partial closure."""
    # chain 0->1->...->40: depth 40 needs ceil(log2(40/4)) = 4 rounds
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src int, dst int")
    with pytest.raises(RuntimeError, match="did not converge"):
        transitive_closure(df, "src", "dst", depth_bound=40, max_iterations=1)
    # unclamped, the same bound closes the chain without a probe round
    got = {
        (r.src, r.dst)
        for r in transitive_closure(df, "src", "dst", depth_bound=40).collect()
    }
    assert got == _brute_closure(edges)


def test_depth_bound_loose_is_still_exact(spark):
    """A depth_bound far above the true depth must not change results
    (extra rounds are no-growth; early cur==prev exit fires)."""
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        (r.src, r.dst)
        for r in transitive_closure(df, "src", "dst", depth_bound=1000).collect()
    }
    assert got == _brute_closure(edges)


def test_fixpoint_confs_isolated_from_caller_session(spark):
    """The fixpoint loop must never mutate the caller's session confs
    (VERDICT r4 item 8): rounds size their shuffles and suspend AQE on
    a dedicated child session, so a query planned concurrently on the
    caller's session sees its own settings throughout."""
    before = {
        k: spark.conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    }
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "src int, dst int")
    for method in ("doubling", "semi_naive"):
        got = {
            (r.src, r.dst)
            for r in transitive_closure(df, "src", "dst", method=method).collect()
        }
        assert got == _brute_closure(edges)
        after = {k: spark.conf.get(k) for k in before}
        assert after == before, f"caller confs mutated by {method}: {after}"
    # the child session exists, is cached, and carries the loop confs
    fs = getattr(spark, "_dataworks_fixpoint_session", None)
    assert fs is not None and fs is not spark
    assert (
        fs.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst")
        == "false"
    )
