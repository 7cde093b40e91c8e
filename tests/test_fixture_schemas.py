"""Fixture schema pin (VERDICT r3 §Next-round 3).

The driver regenerates /root/testdata between rounds and has already
changed physical types once (events.ts: timestamp[ns] in r1-r2 →
timestamp[us] since r3), which silently broke two queries and crashed
the r3 bench. These tests turn the next drift into a one-line
diagnostic instead of a lost round:

- ``test_timestamp_physical_types_supported`` reads parquet footers with
  pyarrow (no Spark — runs in milliseconds) and asserts every
  timestamp-ish column carries a physical type the loader knows how to
  normalize, failing with "fixture regenerated with X, expected one
  of Y".
- ``test_loader_normalizes_events_ts`` asserts the *loaded* events.ts is
  session-UTC TimestampType (analysis only, no job) at every sf dir, so
  ``unix_millis``-consuming queries (q_window_running,
  q_events_sessionize) can never fail analysis on a raw fixture type
  again.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from dataworks_spark.session import TABLES, load_table, table_path

SF_DIRS = [d for d in sorted(glob.glob("/root/testdata/sf*")) if os.path.isdir(d)]


def test_sf_dirs_exist():
    """Unparametrized guard: if the driver moves/renames the fixture
    root, the parametrized tests below would be generated over an empty
    list and pass vacuously — exactly the silent drift this module
    exists to catch. This test cannot be skipped by an empty glob."""
    assert SF_DIRS, "no /root/testdata/sf* dirs found — fixture root moved or empty"

#: physical parquet types load_table can normalize for events.ts
#: (keep in sync with dataworks_spark/session.py::load_table)
SUPPORTED_TS_TYPES = {
    "timestamp[ns]",        # read nanos-as-long, floored to micros
    "timestamp[us]",        # TIMESTAMP_NTZ → cast to session-UTC TIMESTAMP
    "timestamp[ms]",
    "timestamp[us, tz=UTC]",  # already Spark TIMESTAMP
    "timestamp[ms, tz=UTC]",
    "timestamp[ns, tz=UTC]",
}


def _timestamp_columns(arrow_schema):
    for name in arrow_schema.names:
        typ = str(arrow_schema.field(name).type)
        if typ.startswith("timestamp"):
            yield name, typ


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_timestamp_physical_types_supported(sf_dir):
    problems = []
    for table in TABLES:
        path = table_path(sf_dir, table)
        if not os.path.exists(path):
            problems.append(f"{table}: fixture file missing at {path}")
            continue
        for col, typ in _timestamp_columns(pq.read_schema(path)):
            if typ not in SUPPORTED_TS_TYPES:
                problems.append(
                    f"{table}.{col}: fixture regenerated with physical type "
                    f"{typ!r}, expected one of {sorted(SUPPORTED_TS_TYPES)}; "
                    "teach dataworks_spark/session.py::load_table to "
                    "normalize it and update FIXTURES.md"
                )
    assert not problems, "\n".join(problems)


#: full expected column/type pins, read from the r4 sf0.001 footers.
#: Semantics: every pinned column must EXIST with the pinned type —
#: except timestamp-family columns, which may be any SUPPORTED_TS_TYPES
#: variant (the driver has already drifted events.ts ns→us once; the
#: loader normalizes those). ADDED columns pass: every query projects
#: explicitly, so additions cannot break them (and the analysis smoke
#: proves it); a rename/removal/type-change fails with a named diff.
EXPECTED_SCHEMAS = {
    "customer": [("c_custkey", "int64"), ("c_name", "string"), ("c_nationkey", "int32"), ("c_acctbal", "double"), ("c_mktsegment", "string")],
    "documents": [("doc_id", "int64"), ("text", "string"), ("lang", "string"), ("source", "string"), ("n_chars", "int64")],
    "embeddings": [("vec_id", "int64"), ("embedding", "list<element: float>"), ("label", "int32")],
    "events": [("event_id", "int64"), ("ts", "timestamp[us]"), ("user_id", "int64"), ("event_type", "string"), ("value", "double"), ("props", "string")],
    "lineitem": [("l_orderkey", "int64"), ("l_partkey", "int64"), ("l_suppkey", "int64"), ("l_linenumber", "int32"), ("l_quantity", "double"), ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"), ("l_returnflag", "string"), ("l_linestatus", "string"), ("l_shipdate", "timestamp[us]")],
    "nation": [("n_nationkey", "int32"), ("n_name", "string"), ("n_regionkey", "int32")],
    "orders": [("o_orderkey", "int64"), ("o_custkey", "int64"), ("o_orderstatus", "string"), ("o_totalprice", "double"), ("o_orderdate", "timestamp[us]"), ("o_orderpriority", "string")],
    "part": [("p_partkey", "int64"), ("p_name", "string"), ("p_brand", "string"), ("p_type", "string"), ("p_size", "int32"), ("p_retailprice", "double")],
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "supplier": [("s_suppkey", "int64"), ("s_name", "string"), ("s_nationkey", "int32"), ("s_acctbal", "double")],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_full_schema_pin(sf_dir):
    problems = []
    for table, expected in EXPECTED_SCHEMAS.items():
        path = table_path(sf_dir, table)
        if not os.path.exists(path):
            problems.append(f"{table}: fixture file missing at {path}")
            continue
        arrow = pq.read_schema(path)
        actual = {n: str(arrow.field(n).type) for n in arrow.names}
        for col, typ in expected:
            got = actual.get(col)
            if got is None:
                problems.append(
                    f"{table}.{col}: column removed/renamed "
                    f"(fixture now has {sorted(actual)})"
                )
            elif got != typ and not (
                typ.startswith("timestamp") and got in SUPPORTED_TS_TYPES
            ):
                problems.append(
                    f"{table}.{col}: fixture regenerated with type {got!r}, "
                    f"pinned {typ!r}; audit every query touching it, then "
                    "update EXPECTED_SCHEMAS and FIXTURES.md"
                )
    assert not problems, "\n".join(problems)


def test_loader_normalizes_events_ts(spark):
    from pyspark.sql.types import TimestampType

    assert SF_DIRS, "no /root/testdata/sf* dirs found"
    for sf_dir in SF_DIRS:
        ts_type = load_table(spark, sf_dir, "events").schema["ts"].dataType
        assert isinstance(ts_type, TimestampType), (
            f"{sf_dir}/events.parquet: loader produced {ts_type} for ts; "
            "must be session-UTC TimestampType or unix_millis-consuming "
            "queries (q_window_running, q_events_sessionize) fail analysis"
        )
