"""Property-based test for the approximate-string join (SURVEY §2 L6
support; llm/dedup.edit_distance_pairs).

Two claims the docstring states as THEOREMS, checked here against a
driver brute force on random inputs instead of only the crafted
stressor set (tests/test_llm.py):

- length-band blocking is COMPLETE: the banded equi-join finds exactly
  the brute-force pair set at every ``max_dist`` — no candidate that
  blocking dropped was a true pair;
- the Gravano multiset q-gram prefilter is PURE PRUNING:
  ``qgram_filter=True`` returns the identical result, including for
  strings at or below q chars (the vacuous-bound bypass), repetitive
  strings (multiset vs distinct-gram counts), and empty strings.

A two-letter alphabet makes the near-dup space DENSE (many true pairs
per example), which is exactly where a broken band boundary or an
over-tight count bound would lose pairs.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataworks_spark.llm.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


texts_strategy = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=10), min_size=2, max_size=12
)


@given(texts=texts_strategy, d=st.integers(0, 3))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_edit_distance_pairs_complete_and_qgram_pure(spark, texts, d):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "id long, name string")
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= d
    }
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_pairs(df, "id", "name", max_dist=d).collect()
    }
    assert got == want, f"blocking lost/invented pairs at d={d}"
    filtered = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_pairs(
            df, "id", "name", max_dist=d, qgram_filter=True
        ).collect()
    }
    assert filtered == want, f"qgram prefilter changed the result at d={d}"
