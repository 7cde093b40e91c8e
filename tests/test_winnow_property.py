"""Property-based test for winnowing fingerprints (SURVEY §2 L18).

Random small corpora against a brute-force Python implementation of
Schleimer et al.'s selection (k-gram md5, window minimum, distinct):
identical fingerprint SETS per document — exercising the short-text
(< k tokens), single-window (< w hashes), and tie (repeated shingle)
paths — and identical overlap pairs end-to-end.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataworks_spark.llm.dedup import winnow_fingerprints, winnow_overlap_pairs

K, W = 4, 4


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _brute_fps(text: str) -> set[str]:
    toks = text.split(" ")
    if len(toks) < K:
        return set()
    hashes = [_md5(" ".join(toks[i : i + K])) for i in range(len(toks) - K + 1)]
    n_windows = max(len(hashes) - W + 1, 1)
    return {min(hashes[i : i + W]) for i in range(n_windows)}


# small vocab so shared runs and repeated shingles actually occur
word = st.sampled_from([f"w{i}" for i in range(6)])
doc = st.lists(word, min_size=0, max_size=14).map(" ".join)


@given(texts=st.lists(doc, min_size=1, max_size=8))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_winnow_matches_bruteforce(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), K, W).alias("fps")
        ).collect()
    }
    want = {i: _brute_fps(t) for i, t in rows}
    assert got == want

    # end-to-end pairs vs brute force (min_shared=1, no df cap in play
    # at this corpus size unless a fingerprint is genuinely common)
    max_df = 50
    df_count: dict[str, int] = {}
    for fps in want.values():
        for fp in fps:
            df_count[fp] = df_count.get(fp, 0) + 1
    want_pairs = {}
    for a, b in combinations(sorted(want), 2):
        shared = {
            fp for fp in want[a] & want[b] if df_count[fp] <= max_df
        }
        if shared:
            want_pairs[(a, b)] = len(shared)
    got_pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_overlap_pairs(df, min_shared=1, max_df=max_df).collect()
    }
    assert got_pairs == want_pairs


# distinct vocabularies so the ONLY shared shingles are in the planted run
_va = st.lists(st.sampled_from([f"a{i}" for i in range(8)]), min_size=0, max_size=6)
_vb = st.lists(st.sampled_from([f"b{i}" for i in range(8)]), min_size=0, max_size=6)
_run = st.lists(st.sampled_from([f"r{i}" for i in range(8)]),
                min_size=W + K - 1, max_size=W + K + 4)


@given(pre_a=_va, post_a=_va, pre_b=_vb, post_b=_vb, run=_run)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_winnow_guarantee_shared_run_is_caught(
    spark, pre_a, post_a, pre_b, post_b, run
):
    """The paper's GUARANTEE (Schleimer et al. §2, the property that
    makes winnowing better than sampling): any shared token run of
    length ≥ w + k − 1 between two documents yields at least one
    SHARED selected fingerprint — whatever surrounds the run. The two
    documents here share ONLY the planted run (disjoint vocabularies
    elsewhere), so the shared fingerprint must come from it; r15 pins
    the guarantee end-to-end through the postings split the engine
    actually runs."""
    from dataworks_spark.llm.dedup import (
        winnow_fingerprint_relation,
        winnow_pairs_from_postings,
        winnow_postings,
    )

    doc_a = " ".join(pre_a + run + post_a)
    doc_b = " ".join(pre_b + run + post_b)
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)], "doc_id long, text string"
    )
    pairs = winnow_pairs_from_postings(
        winnow_postings(winnow_fingerprint_relation(df, shingle_n=K, window=W)),
        min_shared=1,
        max_df=50,
    ).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(0, 1)], (
        f"guarantee violated: run={run!r} a={doc_a!r} b={doc_b!r}"
    )
    # and the shared count is bounded by the run's own fingerprints
    assert pairs[0].n_shared >= 1
