"""Bloom filter as pure Spark column expressions (no UDF, no internal
functions).

Spark's own runtime-filter Bloom (`BloomFilterAggregate` /
`BloomFilterMightContain`) is not exposed in the public function
registry, so this module builds the same capability from first
principles on public primitives:

- **build** is distributed: each value hashes to ``k`` bit positions
  (seeded ``xxhash64`` probes), positions pack into 64-bit words via a
  ``groupBy(word) → bit_or`` aggregation — shuffle rows are at most
  ``m/64`` (the filter's own size, never the data's) — and the packed
  words collect into one bounded ``array<long>`` literal. The collect
  is control-plane, proportional to the FILTER size (MBs at a 10⁸-item
  / 1e-3 fpp corpus-scale build), exactly like collecting Spark's own
  built-in Bloom.
- **membership** is ``k`` ``element_at``+shift probes against that
  literal array, a constant-folded JVM expression usable anywhere a
  Column is — including inside higher-order lambdas (``F.exists`` over
  an array of shingle hashes), where a scalar subquery would be
  rejected.

Standard sizing (public construction, Bloom 1970): for ``n`` items at
false-positive rate ``p``, bits ``m = -n·ln p / ln²2`` and probes
``k = (m/n)·ln 2``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_probes) for ``n_items`` at false-positive rate
    ``fpp``; m is rounded up to a whole word so the packed array has no
    partial tail."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1): {fpp}")
    n = max(n_items, 1)
    m = max(int(-n * math.log(fpp) / (math.log(2) ** 2)), 64)
    m = ((m + 63) // 64) * 64
    k = max(int(round(m / n * math.log(2))), 1)
    return m, k


def _positions(value: Column, m: int, k: int) -> list[Column]:
    """The k probe positions of ``value``: pmod(xxhash64(value, j), m).
    Seeding via an extra hashed literal column gives k decorrelated
    64-bit streams from the one public hash primitive."""
    return [
        F.pmod(F.xxhash64(value, F.lit(j)), F.lit(m)) for j in range(k)
    ]


@dataclass(frozen=True)
class BloomFilter:
    """A built filter: packed 64-bit words + its (m, k) geometry."""

    words: tuple[int, ...]
    m_bits: int
    k_probes: int

    def might_contain(self, value: Column) -> Column:
        """True iff every probe bit is set — the standard Bloom
        guarantee: no false negatives, false positives at ≈fpp. The
        word array rides as ONE array literal; each probe is an
        element_at + shift + mask, all JVM-side and legal inside
        higher-order-function lambdas."""
        bits = F.lit(list(self.words)).cast("array<bigint>")
        checks = []
        for pos in _positions(value, self.m_bits, self.k_probes):
            word = F.element_at(bits, (pos / F.lit(64)).cast("int") + F.lit(1))
            # bit_get takes a Column position (shiftright's count must
            # be a plain int, so it can't express a per-row shift)
            checks.append(F.bit_get(word, (pos % F.lit(64)).cast("int")) == 1)
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return out


def bloom_build(
    df: DataFrame, value: Column, n_items: int, fpp: float = 1e-3
) -> BloomFilter:
    """Distributed Bloom build over ``value`` (any hashable column).

    Plan shape: project k probe positions per row → explode →
    ``groupBy(pos / 64) → bit_or(1 << pos%64)`` — partial aggregation
    makes the shuffle ≤ m/64 rows of (long, long) regardless of input
    size — then one bounded collect of the packed words."""
    m, k = bloom_params(n_items, fpp)
    pos = F.explode(F.array(*_positions(value, m, k))).alias("__pos")
    words = (
        df.select(pos)
        .select(
            (F.col("__pos") / F.lit(64)).cast("long").alias("__w"),
            # shiftleft's count param is int-only in the DataFrame API;
            # the SQL form takes an expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
                "__b"
            ),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .collect()
    )
    arr = [0] * (m // 64)
    for r in words:
        arr[r["__w"]] = r["__bits"]
    return BloomFilter(words=tuple(arr), m_bits=m, k_probes=k)
