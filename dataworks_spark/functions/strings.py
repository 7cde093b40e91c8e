"""String helpers incl. camel/snake/kebab case conversion (SURVEY §2 H1/H2).

The reference imports camel-snake-kebab converters into every user-code
namespace (src/dataworks/streams.clj:3-4, transformers.clj:3-4,
collectors.clj:3-4) and uses them to normalize document keys between
wire formats. Here key-case conversion operates on **column names**
(driver-side, free); data-side string ops use built-in
`pyspark.sql.functions`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SPLIT = re.compile(r"[_\-\s]+|(?<=[a-z0-9])(?=[A-Z])")


def _words(name: str) -> list[str]:
    return [w for w in _SPLIT.split(name) if w]


def to_snake(name: str) -> str:
    return "_".join(w.lower() for w in _words(name))


def to_kebab(name: str) -> str:
    return "-".join(w.lower() for w in _words(name))


def to_camel(name: str) -> str:
    ws = _words(name)
    return ws[0].lower() + "".join(w.capitalize() for w in ws[1:]) if ws else name


def _rename_all(df: DataFrame, fn) -> DataFrame:
    return df.withColumnsRenamed({c: fn(c) for c in df.columns})


def snake_case_keys(df: DataFrame) -> DataFrame:
    return _rename_all(df, to_snake)


def kebab_case_keys(df: DataFrame) -> DataFrame:
    return _rename_all(df, to_kebab)


def camel_case_keys(df: DataFrame) -> DataFrame:
    return _rename_all(df, to_camel)
