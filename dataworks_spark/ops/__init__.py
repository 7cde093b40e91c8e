"""Relational operator core (SURVEY.md §2 B–G).

Thin, composable DataFrame functions — each one declarative so Catalyst
handles pushdown, pruning, join selection, and codegen. Nothing here
collects to the driver or drops to RDDs.
"""

from dataworks_spark.ops.projection import (
    exclude_keys,
    nil_drop,
    ns_keys,
    select_keys,
    set_ns,
)
from dataworks_spark.ops.joins import (
    anti_join,
    asof_join,
    bucketized_interval_join,
    point_lookup,
    range_join,
    semi_join,
    star_join,
)
from dataworks_spark.ops.aggregates import exists_by, grouped_agg
from dataworks_spark.ops.windows import lag_lead, latest_per_key, rank_in_group, running_agg
from dataworks_spark.ops.sort import top_k
from dataworks_spark.ops.setops import except_rows, intersect_rows, union_distinct
from dataworks_spark.ops.recursive import transitive_closure

__all__ = [
    "select_keys",
    "exclude_keys",
    "ns_keys",
    "set_ns",
    "nil_drop",
    "star_join",
    "semi_join",
    "anti_join",
    "asof_join",
    "bucketized_interval_join",
    "range_join",
    "point_lookup",
    "grouped_agg",
    "exists_by",
    "rank_in_group",
    "lag_lead",
    "running_agg",
    "latest_per_key",
    "top_k",
    "union_distinct",
    "intersect_rows",
    "except_rows",
    "transitive_closure",
]
