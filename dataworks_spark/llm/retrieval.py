"""Lexical retrieval over a document corpus (SURVEY §2 L4/L6 adjunct):
TF-IDF / BM25 scoring and top-k keyword search.

The reference's query surface is Datalog + full scans; a training-data
engine additionally needs keyword retrieval for corpus forensics
("which documents mention X", quality-slice inspection, dedup triage).
BM25 (Robertson/Spärck Jones, the public Okapi construction) is the
standard choice, and it maps cleanly onto two map-side-combined passes:

  1. corpus statistics — one aggregation producing N, avg doc length,
     and per-query-term document frequencies (the only shuffled bytes
     are ONE row of longs; the per-term tf columns are computed inside
     the scan projection, so no (doc, term) explode ever shuffles);
  2. scoring — a second scan projects per-doc tf columns, crossJoins
     the broadcast one-row stats, and computes the closed-form score;
     top-k goes through TakeOrderedAndProject (no global sort).

At 100 TB the statistics pass amortizes: df/avgdl are ingest-time
corpus metadata (computed once per corpus build, stored with the
table), and only the scoring scan runs per query. The two-pass shape
here IS that split — pass 1 is exactly the ingest-time job.

Tokenization is lowercase whitespace split, matching the L4 text tier
(llm/text.py `tokens`); scores are deterministic (exact integer tf/df
counts, exact long-sum avgdl) so results are SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _term_tf(toks: Column, term: str) -> Column:
    """Occurrences of ``term`` in the bound token-array column."""
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def _norm_terms(terms: list[str], what: str) -> list[str]:
    """Lowercase terms to match the tokenizer — tokens are lowercased
    (module doc: lowercase whitespace split), so a mixed-case term
    could NEVER match and silently scored/selected nothing (r10
    review). Duplicates are checked AFTER lowering ('Spark'/'spark'
    would double-count just like an exact duplicate)."""
    if not terms:
        raise ValueError(f"{what} must be non-empty")
    low = [t.lower() for t in terms]
    if len(set(low)) != len(low):
        raise ValueError(f"duplicate {what} (case-insensitive): {terms}")
    return low


def _feat_struct(text_col: str, terms: list[str]) -> Column:
    """``struct(dl, tf0..tfN)`` for a document, with the tokenization
    evaluated ONCE: the single-element ``transform`` is a let-binding
    (codegen does no CSE across higher-order lambdas, and
    CollapseProject re-inlines a projected alias into every reference
    — so without the binding each tf column would re-run the split;
    same trick as llm/dedup.shingle_hashes)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    return F.transform(
        F.array(toks),
        lambda tk: F.struct(
            F.size(tk).alias("dl"),
            *[_term_tf(tk, t).alias(f"tf{i}") for i, t in enumerate(terms)],
        ),
    ).getItem(0)


def corpus_term_stats(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """One-row DataFrame of the BM25 corpus statistics for
    ``query_terms``: ``n_docs``, ``sum_dl`` (exact long token total —
    avgdl is derived as ``sum_dl / n_docs`` so both engines divide the
    same exact integers; a float ``avg`` would carry partial-order
    ulps), and ``df_i`` per term.

    This is the ingest-time half of BM25 at scale: one
    map-side-combined aggregation over the scan, one row out."""
    query_terms = _norm_terms(query_terms, "query_terms")
    feat = df.select(_feat_struct(text_col, query_terms).alias("__s"))
    return feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__s.dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"__s.tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Score every document containing ≥1 query term: columns
    ``(id_col, bm25)``. ``stats`` accepts a precomputed
    :func:`corpus_term_stats` frame (the ingest-time path); by default
    it is derived lazily from ``df`` and broadcast — either way the
    corpus is scanned, never shuffled.

    idf uses the +1 smoothing form ``ln(1 + (N - df + .5)/(df + .5))``
    (Lucene's variant of the Robertson idf — never negative for terms
    in more than half the corpus)."""
    query_terms = _norm_terms(query_terms, "query_terms")
    feat = df.select(
        F.col(id_col), _feat_struct(text_col, query_terms).alias("__s")
    ).select(
        # field extraction from the one materialized struct column —
        # cheap refs, the split has already run exactly once
        id_col,
        F.col("__s.dl").alias("__dl"),
        *[F.col(f"__s.tf{i}").alias(f"__tf{i}") for i in range(len(query_terms))],
    )
    st = stats if stats is not None else corpus_term_stats(df, query_terms, text_col)
    scored = feat.crossJoin(F.broadcast(st))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    parts = []
    for i in range(len(query_terms)):
        tf = F.col(f"__tf{i}")
        dfreq = F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        parts.append(
            idf
            * tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl))
        )
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    matched = None
    for i in range(len(query_terms)):
        hit = F.col(f"__tf{i}") > 0
        matched = hit if matched is None else (matched | hit)
    return scored.filter(matched).select(
        F.col(id_col), F.round(score, 6).alias("bm25")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25 — deterministic ordering (rounded
    score desc, then id). TakeOrderedAndProject: per-partition heaps,
    k rows to the driver, no global sort."""
    from dataworks_spark.ops.sort import top_k

    scored = bm25_score(df, query_terms, id_col, text_col, k1, b, stats)
    return top_k(scored, order_by=[F.col("bm25").desc(), F.col(id_col)], k=k)


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    n: int = 1000,
    min_df: int = 2,
) -> list[str]:
    """The ``n`` most-frequent corpus terms (by document frequency,
    ties broken alphabetically for determinism), for use as a
    :func:`tfidf_vectors` vocabulary. One explode + two shuffles over
    (term, doc) pairs; the result is bounded by construction (``n``
    strings to the driver). ``min_df`` drops hapax noise. At 100 TB
    this is the ingest-time vocabulary job; hash the terms before the
    explode only if term strings dominate the shuffle (they rarely do
    — the distinct-per-doc projection keeps rows at |doc|·|distinct|)."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
    counts = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("term") != ""))
        .orderBy(F.col("df").desc(), F.col("term"))
        .limit(n)
        .collect()
    )
    return [r["term"] for r in counts]


def tfidf_vectors(
    df: DataFrame,
    vocab_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document TF-IDF vector over a FIXED vocabulary (columns
    ``(id_col, tfidf array<double>)``) — the classic featurizer for
    downstream cosine/kNN work over lexical space. tf is
    log-normalized (``1 + ln tf``), idf is the smooth
    ``ln(N / (1 + df)) + 1`` form. The vocabulary is explicit and
    bounded (the caller picks it — e.g. top-k corpus terms), so the
    vector is a fixed-width array built inside the scan projection:
    no explode, no per-term shuffle, composable with the L3 similarity
    tier (cosine_similarity over the returned array)."""
    vocab_terms = _norm_terms(vocab_terms, "vocab_terms")
    feat = df.select(
        F.col(id_col), _feat_struct(text_col, vocab_terms).alias("__s")
    ).select(
        id_col,
        *[F.col(f"__s.tf{i}").alias(f"__tf{i}") for i in range(len(vocab_terms))],
    )
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(vocab_terms))
        ],
    )
    out = feat.crossJoin(F.broadcast(stats))
    comps = []
    for i in range(len(vocab_terms)):
        tf = F.col(f"__tf{i}")
        idf = F.log(F.col("n_docs") / (F.lit(1.0) + F.col(f"df{i}"))) + F.lit(1.0)
        comps.append(
            F.when(tf > 0, (F.lit(1.0) + F.log(tf.cast("double"))) * idf).otherwise(
                F.lit(0.0)
            )
        )
    return out.select(F.col(id_col), F.array(*comps).alias("tfidf"))
