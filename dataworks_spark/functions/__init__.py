"""Scalar function library (SURVEY §2 H): strings, case conversion,
time, JSON, arrays. Everything JVM-side (`pyspark.sql.functions`) so it
stays inside whole-stage codegen; the only Python-side helpers are
name-case conversions applied to *column names* (driver-side metadata,
not data)."""

from dataworks_spark.functions.strings import (
    camel_case_keys,
    kebab_case_keys,
    snake_case_keys,
    to_camel,
    to_kebab,
    to_snake,
)
from dataworks_spark.functions.timeops import consume_time
from dataworks_spark.functions.arrays import cosine_similarity, dot
from dataworks_spark.functions.ids import deterministic_uuid, uuid_col

__all__ = [
    "uuid_col",
    "deterministic_uuid",
    "to_camel",
    "to_snake",
    "to_kebab",
    "camel_case_keys",
    "snake_case_keys",
    "kebab_case_keys",
    "consume_time",
    "dot",
    "cosine_similarity",
]
