"""LLM-data-pipeline operators (SURVEY §2 L; BASELINE.json mandate).

Everything here is designed scale-first: exact dedup is a hash
aggregate; near-dup avoids the O(n²) pair space via MinHash banding /
SimHash buckets; similarity search has a brute-force baseline and an
LSH-bucketed scale path; text analysis stays in JVM expressions;
multimodal decode is the one place Pandas UDFs are warranted (opaque
binary payloads), with the decode kernel stubbed where codecs aren't
installed.
"""

from dataworks_spark.llm.dedup import (
    cooccurrence_pairs,
    dedup_keep_canonical,
    edit_distance_pairs,
    exact_dedup,
    hamming_near_dup_pairs,
    minhash_near_dup_pairs,
    minhash_signature,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash,
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from dataworks_spark.llm.classify import (
    classifier_score,
    classifier_score_expr,
    collect_weights_array,
    default_hash_weights,
    token_buckets,
    train_classifier,
    weights_from_terms,
)
from dataworks_spark.llm.incremental import (
    IncrementalCorpus,
    non_overlapping_rows,
    novel_rows,
)
from dataworks_spark.llm.privacy import PII_PATTERNS, pii_counts, redact_pii
from dataworks_spark.llm.retrieval import (
    bm25_score,
    bm25_topk,
    corpus_term_stats,
    tfidf_vectors,
    top_terms,
)
from dataworks_spark.llm.similarity import (
    IvfIndex,
    LshIndex,
    brute_force_cosine_topk,
    cosine_pairs_above,
    ivf_build_centroids_distributed,
    ivf_cosine_topk,
    knn_join,
    knn_join_lsh,
    lsh_cosine_topk,
    semantic_dedup_keepers,
    semantic_dedup_pairs,
)
from dataworks_spark.llm.pipeline import (
    CorpusConfig,
    bucket_by_score,
    contamination_report,
    chunk_documents,
    decontaminate,
    dedup_spans,
    hash_split,
    mix_corpus,
    pack_sequences,
    prepare_corpus,
    select_token_budget,
    stratified_sample_by_hash,
    write_corpus_shards,
)
from dataworks_spark.llm.text import (
    corpus_stats,
    document_fingerprint,
    language_scores,
    quality_features,
    token_count,
    tokens,
    unigram_lm_scores,
)

__all__ = [
    "exact_dedup",
    "hamming_near_dup_pairs",
    "minhash_signature",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cooccurrence_pairs",
    "near_dup_clusters",
    "dedup_keep_canonical",
    "dedup_spans",
    "semantic_dedup_pairs",
    "semantic_dedup_keepers",
    "brute_force_cosine_topk",
    "cosine_pairs_above",
    "ivf_build_centroids_distributed",
    "ivf_cosine_topk",
    "lsh_cosine_topk",
    "tokens",
    "token_count",
    "language_scores",
    "quality_features",
    "document_fingerprint",
    "CorpusConfig",
    "chunk_documents",
    "corpus_stats",
    "unigram_lm_scores",
    "prepare_corpus",
    "hash_split",
    "stratified_sample_by_hash",
    "select_token_budget",
    "decontaminate",
    "contamination_report",
    "bucket_by_score",
    "mix_corpus",
    "pack_sequences",
    "write_corpus_shards",
    "edit_distance_pairs",
    "knn_join",
    "knn_join_lsh",
    "bm25_score",
    "bm25_topk",
    "corpus_term_stats",
    "tfidf_vectors",
    "top_terms",
    "pii_counts",
    "redact_pii",
    "PII_PATTERNS",
    "IncrementalCorpus",
    "IvfIndex",
    "LshIndex",
    "novel_rows",
    "non_overlapping_rows",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "classifier_score",
    "classifier_score_expr",
    "collect_weights_array",
    "train_classifier",
    "weights_from_terms",
    "default_hash_weights",
    "token_buckets",
]
