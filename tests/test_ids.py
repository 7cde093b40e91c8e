"""H8 UUID surfaces: v4 format/uniqueness (nondeterministic — excluded
from the oracle by design), v3 deterministic pinned byte-for-byte
against CPython's RFC 4122 construction."""

import hashlib
import re
import uuid

from pyspark.sql import functions as F

from dataworks_spark.functions.ids import deterministic_uuid, uuid_col

UUID_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-([0-9a-f])[0-9a-f]{3}-([0-9a-f])[0-9a-f]{3}-[0-9a-f]{12}$"
)


def test_uuid_v4_format_and_per_row_uniqueness(spark):
    rows = (
        spark.range(500)
        .select(uuid_col().alias("u"))
        .collect()
    )
    vals = [r["u"] for r in rows]
    assert len(set(vals)) == 500  # fresh per row
    for v in vals[:20]:
        m = UUID_RE.match(v)
        assert m, v
        assert m.group(1) == "4" and m.group(2) in "89ab", v


def test_deterministic_uuid_matches_cpython_rfc4122_v3(spark):
    ns = "dataworks/"
    got = {
        r["name"]: r["u"]
        for r in spark.createDataFrame(
            [("alpha",), ("beta",), ("unicode-é",), ("",)], ["name"]
        )
        .select("name", deterministic_uuid(ns, F.col("name")).alias("u"))
        .collect()
    }
    for name, u in got.items():
        digest = hashlib.md5((ns + name).encode("utf-8")).digest()
        expected = str(uuid.UUID(bytes=digest, version=3))
        assert u == expected, (name, u, expected)
        m = UUID_RE.match(u)
        assert m and m.group(1) == "3" and m.group(2) in "89ab"


def test_deterministic_uuid_is_stable_and_injective_on_fixture(spark, sf_dir):
    from dataworks_spark.session import load_table

    c = load_table(spark, sf_dir, "customer").select(
        deterministic_uuid("cust/", F.col("c_custkey")).alias("u")
    )
    a = sorted(r["u"] for r in c.collect())
    b = sorted(r["u"] for r in c.collect())
    assert a == b  # deterministic across runs
    assert len(set(a)) == len(a)  # distinct keys -> distinct ids
