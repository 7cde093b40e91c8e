"""Window / analytic operators (SURVEY §2 E).

The reference has no window functions; the closest surface is the
per-entity "latest state" last-write-wins document pattern
(doc/demo-app-1.org:99-104, ReadMe.org:34) — reproduced here as
:func:`latest_per_key`.

Scale note: a window partitioned by a key shuffles once on that key;
order columns must include a unique tiebreaker or results are
nondeterministic across engines and across runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(partition_by: Sequence[str], order_by: Sequence[Column | str]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def rank_in_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    name: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """row_number / rank / dense_rank / ntile over a group (E1)."""
    fn = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
    }[method]
    return df.withColumn(name, fn().over(_window(partition_by, order_by)))


def lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    offset: int = 1,
    lag_name: str | None = None,
    lead_name: str | None = None,
) -> DataFrame:
    """lag/lead analytic (E2)."""
    w = _window(partition_by, order_by)
    out = df
    if lag_name:
        out = out.withColumn(lag_name, F.lag(col, offset).over(w))
    if lead_name:
        out = out.withColumn(lead_name, F.lead(col, offset).over(w))
    return out


def running_agg(
    df: DataFrame,
    agg_col: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    name: str = "running",
) -> DataFrame:
    """Running (unbounded-preceding) frame aggregate (E3)."""
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(name, agg_col.over(w))


def latest_per_key(
    df: DataFrame, key: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Last-write-wins per key (E4): the reference's per-entity latest
    document (each new log doc overwrites the doc id,
    doc/demo-app-1.org:99-104). order_by must be DESC on the version
    timestamp plus a unique tiebreaker."""
    w = _window(key, order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
