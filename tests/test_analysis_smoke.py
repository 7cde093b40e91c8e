"""Analysis smoke for every declared query (VERDICT r3 §Next-round 4).

Building the DataFrame and touching ``.schema`` forces full Catalyst
analysis (column resolution, type checking, UDF signatures) for every
query at every scale factor, so a plan-level breakage anywhere
(exactly what the r3 fixture drift caused: AnalysisException on
``unix_millis(TIMESTAMP_NTZ)``) is caught by plain pytest instead of
surfacing mid-bench.

Honest contract note: most queries are fully lazy here (no jobs), but
a handful execute bounded construction-time work by design — the
fixpoint queries run their driver loop at build time (the result
relation IS materialized state), and the ANN queries build/cache their
index and query vector. Whole-module wall-clock is ~1 min; a runtime
failure in those construction jobs also fails this test, which is
acceptable — it is still the earliest, cheapest signal.
"""

from __future__ import annotations

import glob
import os

import pytest

from dataworks_spark.queries import ORACLE_SQL, QUERIES

SF_DIRS = [d for d in sorted(glob.glob("/root/testdata/sf*")) if os.path.isdir(d)]


def test_sf_dirs_exist():
    """Guard against vacuous passes if the fixture root moves (see
    test_fixture_schemas.test_sf_dirs_exist)."""
    assert SF_DIRS, "no /root/testdata/sf* dirs found — fixture root moved or empty"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes(spark, name):
    for sf_dir in SF_DIRS:
        df = QUERIES[name](spark, sf_dir)
        assert df.schema.fields, f"{name} produced an empty schema at {sf_dir}"


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_checked_output_is_scalar(spark, name):
    """Driver-canon constraint (r8 lesson): the driver's pandas
    canonicalizer sorts every output column with ``sort_values`` before
    hashing, and list/map cells are unhashable — an ArrayType or
    MapType column in an oracle-checked query's output makes the whole
    query UNCHECKABLE at the gate (r8's q_text_retrieval lost its
    verification this way, silently). Flat scalar rows only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = QUERIES[name](spark, SF_DIRS[0])
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} is ORACLE_SQL-checked but emits non-scalar columns {bad}; "
        "flatten (posexplode / per-field columns) or drop the oracle"
    )


def test_oracle_harness_key_distinguishes_cross_type_coincidences():
    """r10 review: bare str() rendered NULL and the string 'None'
    identically (likewise int 1 vs '1', float NaN vs 'NaN') — the
    harness could false-PASS a genuine engine divergence; and round()
    preserves -0.0's sign, false-FAILING numerically equal zeros."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from oracle_harness import _key

    assert _key((None,)) != _key(("None",))
    assert _key((1,)) != _key(("1",))
    assert _key((float("nan"),)) != _key(("NaN",))
    assert _key((-0.0,)) == _key((0.0,))
    assert _key((1.0000000001,)) == _key((1.0,))  # display-precision collapse
