"""Aggregation operators (SURVEY §2 D).

The reference aggregates by Clojure collection folding over query
results (`empty?`/`not-empty` utils/auth.clj:91-97; `(into #{} …)`
utils/function.clj:26-32; `every?` transformer.clj:77; `reduce`
utils/stream.clj:47-53). On Spark these become hash aggregates with
map-side partial aggregation — at 100 TB the partial agg shrinks the
shuffle to |groups| × |partitions| rows, which is why everything here
stays in `groupBy().agg()` form rather than collecting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """groupBy + agg (SURVEY D5). Partial (map-side) aggregation and
    hash-agg strategy are Catalyst-internal."""
    return df.groupBy(*keys).agg(*aggs)


def exists_by(df: DataFrame, keys: Sequence[str], cond: Column, name: str = "has_match") -> DataFrame:
    """Per-group existence (SURVEY D1/D3): reference `not-empty` /
    `every?` folds. bool_or is a streaming-friendly partial agg."""
    return df.groupBy(*keys).agg(F.bool_or(cond).alias(name))


def distinct_fold(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Set fold `(into #{} xform results)` (utils/function.clj:26-32):
    dropDuplicates is a hash aggregate on the subset columns."""
    # empty subset = fold on no columns → every row is one group;
    # the old truthy coercion turned [] into a FULL-ROW dedup instead
    # (r10 review). dropDuplicates([]) keeps exactly one row, matching
    # `(into #{} (map (constantly k)) …)` semantics — but that is
    # almost certainly a caller bug, so reject it loudly.
    if subset is not None and len(list(subset)) == 0:
        raise ValueError("distinct_fold with an empty subset is ambiguous; pass None for full-row dedup")
    return df.dropDuplicates(list(subset) if subset is not None else None)


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Multi-level aggregates (SURVEY D6)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def approx_aggs(df: DataFrame, keys: Sequence[str], col: str, quantiles: Sequence[float]) -> DataFrame:
    """Approximate aggregates for 100 TB interactive use (SURVEY D7):
    HLL++ distinct and t-digest-style quantiles — constant memory per
    group, no exact shuffle of distinct values."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col).alias(f"approx_distinct_{col}"),
        F.percentile_approx(col, list(quantiles)).alias(f"approx_quantiles_{col}"),
    )


def frequent_items(df: DataFrame, cols: Sequence[str], support: float = 0.01) -> DataFrame:
    """Approximate heavy hitters (D7 family): single-pass frequent-item
    sketch (Karp-Shenker-Papadimitriou, the construction behind
    ``df.stat.freqItems``) — every value with frequency > ``support``
    is guaranteed present (no false negatives; false positives
    possible, as with any counter-based sketch). Constant memory
    ~1/support counters per column, no shuffle of the value space —
    the exact-twin verification (count + filter) is the test's job."""
    return df.stat.freqItems(list(cols), support)
