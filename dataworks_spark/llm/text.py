"""Text analysis operators (SURVEY §2 L4): tokenization, token counts,
language-ID heuristic, quality scoring, document fingerprinting.
Everything is JVM-side column expressions — at 100 TB these run inside
whole-stage codegen over the scan, no Python boundary."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword-ratio
#: language heuristic (real deployments plug in full lists; the
#: operator structure — score per language, argmax — is the point).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "zu", "ist"],
    "es": ["el", "la", "de", "que", "y", "es"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization. Empty-string tokens are FILTERED:
    Java's split keeps a leading "" for leading whitespace (and
    trailing ones under limit -1), which inflated every downstream
    count, entered vocabularies as a phantom term, and broke
    document_fingerprint's reorder-invariance ("a b" vs "a b ") — r10
    review. The oracle SQL twins carry the matching list_filter."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, single
    punctuation — the classic pre-tokenizer split."""
    return F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)


def token_count(text: Column, bpe: bool = False) -> Column:
    # BPE branch: regexp_count counts the same non-overlapping matches
    # bpe_ish_tokens extracts, without materializing the token-string
    # array (r15 — verified count-equal over every fixture corpus)
    if bpe:
        return F.regexp_count(
            text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])")
        )
    return F.size(tokens(text))


def stopword_ratio_tokens(toks: Column, lang: str = "en") -> Column:
    """Fraction of ``toks`` in the language's stopword list — takes an
    already-tokenized column so multi-language scoring tokenizes ONCE
    (codegen does not CSE across higher-order function lambdas, so
    repeating the split per language triples both compile and run
    cost)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens in the language's stopword list."""
    return stopword_ratio_tokens(tokens(F.lower(text)), lang)


def language_scores(text: Column) -> Column:
    """Language-ID heuristic: per-language stopword-hit score as a map;
    argmax is the guess. Deterministic, shippable as a single
    projection. The tokenization is LET-BOUND (single-element transform)
    so all languages score one token array — per-language
    stopword_ratio(text) calls re-ran the split per language, the exact
    cost stopword_ratio_tokens exists to avoid (r10 review)."""
    return F.transform(
        F.array(tokens(F.lower(text))),
        lambda tk: F.map_from_arrays(
            F.array(*[F.lit(lang) for lang in STOPWORDS]),
            F.array(*[stopword_ratio_tokens(tk, lang) for lang in STOPWORDS]),
        ),
    ).getItem(0)


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features (length / punctuation / stopword
    ratios) + a combined score in [0,1] — the standard pretraining
    corpus filter shape."""
    toks = tokens(text)
    n_toks = F.size(toks)
    n_chars = F.length(text)
    mean_tok_len = (n_chars - (n_toks - 1)) / F.greatest(n_toks, F.lit(1))
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    ) / F.greatest(n_chars, F.lit(1))
    sw_ratio = stopword_ratio(text)
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - punct_ratio) * 0.3
        + F.least(sw_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return {
        "n_tokens": n_toks,
        "mean_token_len": mean_tok_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": sw_ratio,
        "quality_score": score,
    }


def document_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — identical under token reordering/duplication, so it
    catches shuffled near-copies exact hashing misses. md5 (not
    xxhash64) keeps it reproducible by any engine."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(canon)


def rolling_hash_shingle_min(text: Column, shingle_n: int = 3) -> Column:
    """Winnowing-style fingerprint: min xxhash64 over word shingles —
    one long per doc, stable under small edits away from the minimum."""
    from dataworks_spark.llm.dedup import word_ngrams

    return F.array_min(F.transform(word_ngrams(text, shingle_n), lambda s: F.xxhash64(s)))


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """Unigram language-model quality score per document: mean
    cross-entropy in bits/token under the corpus's own add-k-smoothed
    unigram distribution — the CCNet-style "how typical is this text"
    signal (public construction: Wenzek et al. 2019 score against an LM;
    the unigram variant needs no external model, the corpus IS the
    model). Output (id, dl, lm_bits_per_token); LOW bits = stereotypical
    text, HIGH bits = rare-token noise — both tails are the filter
    candidates.

    Scale shape: ONE expensive lineage — per-(doc, token) tf (a shuffle
    whose rows are DISTINCT doc-term pairs, not token occurrences).
    Corpus term counts are a GROUPED AGGREGATE rejoined onto tf, not a
    window sum partitioned by term: a window partition for a stop word
    is |docs containing it| rows — at corpus scale that IS the corpus,
    and a skewed window partition cannot be split. A skewed JOIN key
    can (AQE skew-join splits the hot partition and replicates the
    matching counts row), and the counts aggregate itself is map-side
    combined, so no single task scales with corpus size. The
    shuffle_hash hint skips the two sort passes a sort-merge join would
    pay. tf has two consumers (join left, counts) and the one-row
    (N, V) totals fold from counts rather than opening a third tf
    lineage; the tf (doc, tok) aggregate exchange and the counts (tok)
    exchange are each canonically IDENTICAL across their consumers, so
    AQE's stage reuse (ReusedExchange) serves both from one physical
    shuffle each — the corpus is scanned and exploded exactly once
    (plan-asserted: test_plans.test_lm_quality_single_tf_lineage). The
    stats row broadcasts in
    as a crossJoin like the BM25 stats row. The mean is ROUNDed to 6
    decimals — partial-agg float order is engine-specific; everything
    upstream of the mean is exact integer arithmetic, so the score is
    oracle-checkable."""
    tf = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("__id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    counts = tf.groupBy("tok").agg(F.sum("tf").alias("cnt"))
    with_cnt = tf.join(counts.hint("shuffle_hash"), on="tok")
    # (N, V) totals fold FROM counts (|vocab| rows), not from a third
    # tf lineage: Σcnt = Σtf and |counts| = count_distinct(tok), and
    # deriving them here is what lets AQE's stage reuse serve the tf
    # exchange once — a direct tf.agg() canonicalizes differently and
    # re-exploded the corpus (measured; see test_plans).
    stats = counts.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    bits = -F.log2(
        (F.col("cnt") + F.lit(k)) / (F.col("n_total") + F.lit(k) * F.col("v"))
    )
    return (
        with_cnt.crossJoin(F.broadcast(stats))
        .groupBy("__id")
        .agg(
            F.sum("tf").alias("dl"),
            F.round(
                F.sum(F.col("tf") * bits) / F.sum("tf"), 6
            ).alias("lm_bits_per_token"),
        )
        .select(F.col("__id").alias(id_col), "dl", "lm_bits_per_token")
    )


def corpus_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus summary — the sanity dashboard every corpus build
    prints before training: document count, total/average token counts,
    vocabulary size, type-token ratio, and exact p50/p90 document
    lengths. Two aggregation passes (doc-level lengths; token-level
    vocabulary over the distinct (doc, token) relation re-aggregated),
    joined as one-row broadcasts — nothing here scales with corpus size
    except the scans. Exact percentiles use the interpolating
    ``percentile`` on integer lengths; both engines interpolate
    linearly, and ratios are rounded (float division is the only
    non-integer step)."""
    lengths = df.select(
        F.col(id_col).alias("__id"),
        F.size(tokens(F.col(text_col))).alias("dl"),
    )
    doc_stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("n_tokens"),
        F.percentile(F.col("dl"), F.lit(0.5)).alias("__p50"),
        F.percentile(F.col("dl"), F.lit(0.9)).alias("__p90"),
    )
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.count_distinct("tok").alias("vocab_size"))
    )
    return (
        doc_stats.crossJoin(F.broadcast(vocab))
        .select(
            "n_docs",
            "n_tokens",
            "vocab_size",
            F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias("avg_doc_tokens"),
            F.round(F.col("__p50"), 6).alias("p50_doc_tokens"),
            F.round(F.col("__p90"), 6).alias("p90_doc_tokens"),
            F.round(F.col("vocab_size") / F.col("n_tokens"), 6).alias(
                "type_token_ratio"
            ),
        )
    )


def repetition_features(text: Column, ngram_n: int = 3) -> dict[str, Column]:
    """Within-document repetition ratios — the standard pretraining
    corpus filters for templated/spammy text (the public Gopher/C4
    filter family): fraction of duplicate lines and fraction of
    duplicate word n-grams. Pure higher-order column expressions; at
    100 TB these run inside codegen over the scan like the other
    quality features.

    r15: the n-gram ratio counts HASHED n-grams (word_ngram_hashes —
    only fixed-width longs are built and deduplicated), never the
    concat_ws shingle strings whose construction dominated this
    projection (measured 0.92 → 0.19 s over 52 k docs). String and
    token-hash trigrams are in bijection (tokens contain no spaces),
    so the distinct counts — and hence the ratio — are equal up to
    within-document 64-bit collisions (~k²/2⁶⁵ — the trade every
    shingle kernel in dedup.py already makes), verified exactly equal
    over every fixture corpus. The tokenization is let-bound (the
    single-element transform) so it evaluates once, not once per
    window. Line dedup stays on strings: a document has few lines."""
    from dataworks_spark.llm.dedup import token_hashes, word_ngram_hashes

    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    dup_line_ratio = (n_lines - F.size(F.array_distinct(lines))) / F.greatest(
        n_lines, F.lit(1)
    )
    grams = F.flatten(
        F.transform(
            F.array(token_hashes(text)), lambda th: word_ngram_hashes(th, ngram_n)
        )
    )
    n_grams = F.size(grams)
    dup_ngram_ratio = (n_grams - F.size(F.array_distinct(grams))) / F.greatest(
        n_grams, F.lit(1)
    )
    return {
        "dup_line_ratio": dup_line_ratio,
        f"dup_{ngram_n}gram_ratio": dup_ngram_ratio,
    }
