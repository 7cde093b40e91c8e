"""Property-based test for context-window chunking (SURVEY §2 L11).

Random (doc length, chunk_tokens, overlap) triples against a
brute-force Python chunker: identical chunk ids, texts, and token
counts — including the short-doc single-chunk path and the final
short-window rule.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataworks_spark.llm.pipeline import chunk_documents


def _brute(toks: list[str], c: int, o: int) -> list[tuple[int, str, int]]:
    stride = c - o
    out = []
    start, k = 0, 0
    while True:
        window = toks[start : start + c]
        out.append((k, " ".join(window), len(window)))
        k += 1
        start += stride
        if start > max(len(toks) - o - 1, 0):
            break
    return out


params_strategy = st.tuples(
    st.integers(1, 30),  # token count
    st.integers(1, 8),   # chunk_tokens
    st.integers(0, 7),   # overlap (clamped below chunk_tokens)
)


@given(cases=st.lists(params_strategy, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunking_matches_bruteforce(spark, cases):
    rows, want = [], {}
    for i, (n, c, o) in enumerate(cases):
        o = min(o, c - 1)
        toks = [f"w{i}_{j}" for j in range(n)]
        rows.append((i, " ".join(toks), c, o))
        want[i] = _brute(toks, c, o)
    for i, text, c, o in rows:
        df = spark.createDataFrame([(i, text)], "doc_id long, text string")
        got = sorted(
            (r.chunk_idx, r.chunk_text, r.chunk_n_tokens)
            for r in chunk_documents(
                df, chunk_tokens=c, overlap=o
            ).collect()
        )
        assert got == want[i], f"case doc={i} c={c} o={o}"


def _brute_span_dedup(docs: dict[int, str], span: int):
    """First-occurrence span election in (doc_id, idx) order."""
    seen = set()
    out = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id].split(" ")
        spans = [
            " ".join(toks[s : s + span]) for s in range(0, max(len(toks), 1), span)
        ]
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        out[doc_id] = (len(spans), len(kept), " ".join(kept))
    return out


@given(
    data=st.lists(
        st.lists(st.integers(0, 6), min_size=0, max_size=12), min_size=1, max_size=8
    ),
    span=st.integers(1, 5),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_dedup_spans_matches_bruteforce_property(spark, data, span):
    """Random corpora from a tiny vocabulary (forcing cross- and
    within-doc span collisions) against a Python first-occurrence
    interpreter: identical counts AND identical rebuilt text."""
    from dataworks_spark.llm.pipeline import dedup_spans

    docs = {i: " ".join(f"w{t}" for t in toks) for i, toks in enumerate(data)}
    rows = [(i, text) for i, text in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_spans_kept, r.text)
        for r in dedup_spans(df, span_tokens=span).collect()
    }
    assert got == _brute_span_dedup(docs, span)
