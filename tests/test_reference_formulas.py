"""Independent pure-Python reference pins for the r9-repaired oracle
families (SURVEY §5 defense-in-depth).

The driver hash-compares Spark against a DuckDB oracle — but both
sides are OUR translations of the same closed form, so a shared
mistake (wrong idf smoothing, off-by-one in the df cap, a dropped
log-normalization) would hash-match anyway. These tests break that
symmetry: tiny fixtures, the formulas computed in plain Python from
the documented definitions, byte-level (1e-9) agreement required."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _toks(text: str) -> list[str]:
    return text.lower().split(" ")


DOCS = [
    (0, "the quick brown fox jumps over the dog"),
    (1, "the the the lazy dog sat"),
    (2, "quantum fox theory the entangled fox"),
    (3, "completely unrelated text here now"),
]


def test_bm25_matches_pure_python(spark):
    """BM25 with k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)),
    avgdl from exact integer totals — recomputed from scratch."""
    from dataworks_spark.llm.retrieval import bm25_topk

    terms = ["fox", "the"]
    k1, b = 1.2, 0.75
    toks = {i: _toks(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    expected = {}
    for i, tk in toks.items():
        score, hit = 0.0, False
        for t in terms:
            tf = tk.count(t)
            hit = hit or tf > 0
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if hit:
            expected[i] = score
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_topk(df, terms, k=10).collect()}
    assert set(got) == set(expected)
    for i in expected:
        assert got[i] == pytest.approx(round(expected[i], 6), abs=1e-9)
    # ordering property: doc 2 (two 'fox' hits, rare term) outranks 1
    top = bm25_topk(df, terms, k=1).collect()[0]
    assert top.doc_id == max(expected, key=expected.get)


def test_tfidf_matches_pure_python(spark):
    """log-normalized tf (1+ln tf) × smooth idf (ln(N/(1+df))+1),
    zeros for absent terms, fixed vocab order."""
    from dataworks_spark.llm.retrieval import tfidf_vectors

    vocab = ["fox", "dog", "absent"]
    toks = {i: _toks(t) for i, t in DOCS}
    n = len(DOCS)
    dfreq = {t: sum(1 for tk in toks.values() if t in tk) for t in vocab}
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: list(r.tfidf) for r in tfidf_vectors(df, vocab).collect()}
    for i, tk in toks.items():
        for j, t in enumerate(vocab):
            tf = tk.count(t)
            want = (
                (1.0 + math.log(tf)) * (math.log(n / (1.0 + dfreq[t])) + 1.0)
                if tf > 0
                else 0.0
            )
            assert got[i][j] == pytest.approx(want, abs=1e-9), (i, t)


def test_cooccurrence_pairs_match_pure_python(spark):
    """The grouped-combinatorics pair kernel vs brute-force set
    intersection, including max_df semantics (a token shared by MORE
    than max_df docs emits NO pairs — the q_token_join hub cap)."""
    from dataworks_spark.llm.dedup import cooccurrence_pairs

    sets = {
        0: {"a", "b", "c", "hub"},
        1: {"a", "b", "hub"},
        2: {"b", "c", "d", "hub"},
        3: {"e", "hub"},
    }
    max_df = 3  # 'hub' is in 4 docs -> contributes nothing
    rows = [(i, len(s), t) for i, s in sets.items() for t in sorted(s)]
    df = spark.createDataFrame(rows, "doc long, n_tokens int, token string")
    got = {
        (r.doc_a, r.doc_b): (r.na, r.nb, r.inter)
        for r in cooccurrence_pairs(
            df, "doc", "token", size_col="n_tokens", max_df=max_df
        ).collect()
    }
    capped_df = {
        t: sum(1 for s in sets.values() if t in s)
        for t in {t for s in sets.values() for t in s}
    }
    expected = {}
    for i in sets:
        for j in sets:
            if i < j:
                inter = sum(
                    1
                    for t in sets[i] & sets[j]
                    if capped_df[t] <= max_df
                )
                if inter:
                    expected[(i, j)] = (len(sets[i]), len(sets[j]), inter)
    assert got == expected
    # sanity: the cap actually removed signal (hub intersects all pairs)
    assert (1, 3) not in got and ("hub" in (sets[1] & sets[3]))


def test_lang_guess_matches_pure_python(spark):
    """q_text_stats' language-ID argmax (en/de/es stopword ratios with
    the documented tie-break order en > de > es) on crafted docs."""
    from dataworks_spark.llm.text import stopword_ratio_tokens, tokens

    sw = {
        "en": ["the", "a", "of", "and", "to", "in", "is"],
        "de": ["der", "die", "das", "und", "zu", "ist"],
        "es": ["el", "la", "de", "que", "y", "es"],
    }
    docs = [
        (0, "the cat is of the house"),        # en
        (1, "der hund ist und das haus"),      # de
        (2, "el gato es de la casa"),          # es
        (3, "nothing matches anywhere here"),  # all-zero -> en tie-break
        (4, "de de de"),                       # es-only stopword ('de' not in en list)
    ]

    def guess_py(text):
        tk = text.lower().split(" ")
        r = {
            lang: sum(1 for t in tk if t in words) / max(len(tk), 1)
            for lang, words in sw.items()
        }
        if r["en"] >= r["de"] and r["en"] >= r["es"]:
            return "en"
        return "de" if r["de"] >= r["es"] else "es"

    df = spark.createDataFrame(docs, "doc_id long, text string")
    tk = tokens(F.lower(F.col("text")))
    s_en, s_de, s_es = (stopword_ratio_tokens(tk, lang) for lang in ("en", "de", "es"))
    guess = (
        F.when((s_en >= s_de) & (s_en >= s_es), "en")
        .when(s_de >= s_es, "de")
        .otherwise("es")
    )
    got = {r.doc_id: r.g for r in df.select("doc_id", guess.alias("g")).collect()}
    assert got == {i: guess_py(t) for i, t in docs}
    assert got[3] == "en" and got[4] == "es"
