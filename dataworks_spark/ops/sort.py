"""Sorts / limits / top-k (SURVEY §2 F).

Reference surface: `sort-by` (utils/common.clj:494-503), take-first
(utils/stream.clj:75). Spark's orderBy+limit compiles to
TakeOrderedAndProject — each partition keeps a k-row heap and only k
rows per partition reach the driver, so top-k never global-sorts
100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def sorted_by(df: DataFrame, order_by: Sequence[Column | str]) -> DataFrame:
    """Global sort (F1). Range-partitioned sample-based exchange."""
    return df.orderBy(*order_by)


def take_first(df: DataFrame, order_by: Sequence[Column | str]) -> DataFrame:
    """First matching result (F2)."""
    return df.orderBy(*order_by).limit(1)


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """Order + limit (F3) → TakeOrderedAndProject, not a full sort."""
    return df.orderBy(*order_by).limit(k)
