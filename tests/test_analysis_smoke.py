"""Analysis smoke for every declared query (VERDICT r3 §Next-round 4).

Building the DataFrame and touching ``.schema`` forces full Catalyst
analysis (column resolution, type checking, UDF signatures) without
executing a single job — seconds for the whole suite. A plan-level
breakage in ANY query at ANY scale factor (exactly what the r3 fixture
drift caused: AnalysisException on ``unix_millis(TIMESTAMP_NTZ)``) is
caught here by plain pytest instead of surfacing mid-bench.
"""

from __future__ import annotations

import glob
import os

import pytest

from dataworks_spark.queries import QUERIES

SF_DIRS = [d for d in sorted(glob.glob("/root/testdata/sf*")) if os.path.isdir(d)]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes(spark, name):
    for sf_dir in SF_DIRS:
        df = QUERIES[name](spark, sf_dir)
        assert df.schema.fields, f"{name} produced an empty schema at {sf_dir}"
