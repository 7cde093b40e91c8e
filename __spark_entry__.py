"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented SURVEY §2 operator to a (spark, sf_dir) → DataFrame
builder; ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
differential correctness gate. Implementation lives in
``dataworks_spark`` (see SURVEY.md §7.0 for the layer map).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataworks_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by
    region/nation with customer enrichment (SURVEY §7.1)."""
    return QUERIES["q_join_star"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each hash-checkable query; entries
    absent here (e.g. q_agg_approx — sketch values are engine-specific)
    get the driver's weaker rows-only check."""
    return dict(ORACLE_SQL)
