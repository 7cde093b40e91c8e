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
