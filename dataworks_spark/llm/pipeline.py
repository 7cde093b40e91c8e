"""End-to-end training-corpus preparation (SURVEY §2 L1-L6 composed).

``prepare_corpus`` chains the repo's LLM primitives into the standard
pretraining-data flow — the shape a user of this engine runs nightly at
corpus scale:

    exact dedup  →  near-dup dedup (MinHash-LSH candidates, canonical
    survivor per connected component)  →  language filter  →  quality
    filter (length/punct/stopword + repetition)  →  per-doc accounting
    (token counts, fingerprint)

Every stage is pure DataFrame expressions over the existing operators;
nothing here introduces a new shuffle shape. 100 TB notes per stage:

- exact dedup groups on the content hash (shuffle is |distinct|, not
  |rows|) and keeps the lowest id — deterministic under any layout;
- near-dup candidates come from banded MinHash (pair space is band
  collisions, never O(n²)); the canonical-survivor decision is
  min-label propagation over the pair graph (O(component diameter)
  rounds, one job each);
- the language / quality / repetition features are JVM higher-order
  expressions — a single projection pass, no Python boundary;
- the returned frame carries the accounting columns a downstream
  tokenizer shard-writer needs (token counts, fingerprint), so the
  pipeline composes with a partitioned write without another scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataworks_spark.llm.dedup import (
    dedup_keep_canonical,
    exact_dedup,
    minhash_near_dup_pairs,
)
from dataworks_spark.llm.text import (
    document_fingerprint,
    language_scores,
    quality_features,
    repetition_features,
    token_count,
)


@dataclass(frozen=True)
class CorpusConfig:
    """Thresholds for :func:`prepare_corpus` (defaults follow the
    common C4/Gopher-family ranges; tune per corpus)."""

    near_dup_threshold: float = 0.5    # MinHash est. Jaccard to call a dup
    min_tokens: int = 5
    max_punct_ratio: float = 0.5
    min_quality_score: float = 0.3
    max_dup_ngram_ratio: float = 0.5   # repetition cut (dup 3-gram share)
    languages: tuple[str, ...] = ()    # () = keep every language


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CorpusConfig = CorpusConfig(),
) -> DataFrame:
    """Run the full preparation flow; returns the kept documents with
    ``lang`` (argmax language guess), ``n_tokens``, ``n_bpe_tokens``,
    ``quality_score`` and ``fingerprint`` columns appended.

    Stage order matters and is deliberate: dedup FIRST (cheap hash
    work shrinks the corpus before per-doc feature extraction), then
    the per-doc filters in one fused projection pass."""
    # L1 — exact dedup: keep the deterministic (min-id) survivor row
    keepers = exact_dedup(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    deduped = df.join(keepers, on=id_col, how="left_semi")

    # L2 — near-dup dedup: banded MinHash candidates → connected
    # components → canonical survivor (min id per component)
    pairs = minhash_near_dup_pairs(
        deduped, id_col, text_col, threshold=config.near_dup_threshold
    )
    surviving = dedup_keep_canonical(deduped, id_col, pairs)

    # L4 — language, quality, repetition, accounting: ONE projection
    text = F.col(text_col)
    q = quality_features(text)
    rep = repetition_features(text)
    scores = language_scores(text)
    langs = F.map_keys(scores)
    lang = F.get(
        langs,
        F.array_position(
            F.map_values(scores), F.array_max(F.map_values(scores))
        ).cast("int") - 1,
    )
    featured = surviving.withColumns(
        {
            "lang": lang,
            "n_tokens": q["n_tokens"],
            "n_bpe_tokens": token_count(text, bpe=True),
            "punct_ratio": q["punct_ratio"],
            "quality_score": q["quality_score"],
            "dup_ngram_ratio": rep["dup_3gram_ratio"],
            "fingerprint": document_fingerprint(text),
        }
    )
    kept = featured.filter(
        (F.col("n_tokens") >= config.min_tokens)
        & (F.col("punct_ratio") <= config.max_punct_ratio)
        & (F.col("quality_score") >= config.min_quality_score)
        & (F.col("dup_ngram_ratio") <= config.max_dup_ngram_ratio)
    )
    if config.languages:
        kept = kept.filter(F.col("lang").isin(*config.languages))
    return kept.drop("punct_ratio", "dup_ngram_ratio")
