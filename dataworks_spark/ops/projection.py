"""Projections, key-set selection, renaming, nil-drop (SURVEY §2 B).

Reference semantics re-expressed on DataFrames:
  - select-keys / select-ns-keys / exclude-ns-keys
    (reference: src/dataworks/utils/common.clj:382-392,414-424)
  - ns-keys / set-ns key re-namespacing
    (reference: src/dataworks/utils/common.clj:394-412)
  - implicit nil-drop: the engine composes (filter some?) after every
    user transducer so nil results vanish
    (reference: src/dataworks/stream.clj:47, utils/stream.clj:97)

All of these are pure column operations: Catalyst prunes the unused
columns at the parquet scan, so at 100 TB a 2-column projection reads
2 columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keep only ``keys`` columns (reference select-keys, common.clj:382)."""
    return df.select(*keys)


def exclude_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Drop ``keys`` columns (reference exclude-ns-keys, common.clj:414-424)."""
    return df.drop(*keys)


def ns_keys(df: DataFrame, ns: str, keys: Sequence[str] | None = None) -> DataFrame:
    """Prefix column names with a namespace, ``ns/col``
    (reference ns-keys, common.clj:394-403)."""
    keys = list(keys) if keys is not None else df.columns
    mapping = {k: f"{ns}/{k}" for k in keys}
    return df.withColumnsRenamed(mapping)


def set_ns(df: DataFrame, ns: str) -> DataFrame:
    """Re-namespace every column (reference set-ns, common.clj:405-412)."""
    return ns_keys(df, ns, None)


def nil_drop(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop rows whose (subset of) columns are null — the engine's
    implicit ``(filter some?)`` after every transform
    (reference stream.clj:47)."""
    # `subset is not None`, not truthiness: an EMPTY subset means
    # "check no columns" (keep everything), while coercing [] to None
    # flipped it to "check ALL columns" and silently dropped any row
    # with any null anywhere (r10 review)
    if subset is not None and len(list(subset)) == 0:
        return df
    return df.dropna(how="any", subset=list(subset) if subset is not None else None)


def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Datalog ``:find`` clause projection (reference db/app_db.clj:61-63)."""
    return df.select(*cols)
