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
