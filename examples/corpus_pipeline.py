"""End-to-end training-corpus build — the LLM-pipeline tier composed
the way a data team would run it nightly at 100 TB:

    raw documents
      → PII scrub (privacy tier — BEFORE dedup, so masked twins
        become exact duplicates)
      → prepare_corpus (exact + near dedup, language/quality/
        repetition filters, model-based quality scoring, per-doc
        accounting)
      → decontaminate (drop docs sharing 5-grams with an eval set)
      → semantic dedup (SemDeDup tier: embedding-space clusters bound
        the pair space; one deterministic keeper per component)
      → mix_corpus (domain token-share targets)
      → hash_split (layout-stable train/val/test)
      → select_token_budget (keep best-quality docs under budget)
      → chunk_documents (overlapping context-window chunks)
      → pack_sequences (fixed-token training packs over the chunks)
      → write_corpus_shards (partitioned, hash-spread parquet)
      → corpus_stats (the one-row sanity summary)

Run directly (``python examples/corpus_pipeline.py``) against the
sf0.001 fixtures, or import :func:`main` (the smoke test does).
Every stage is a pure DataFrame transform; the only actions are the
bounded control-plane aggregations (domain totals, quality histogram)
and the final write.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(workdir: str, spark=None, sf_dir: str = "/root/testdata/sf0.001"):
    from dataworks_spark.llm.pipeline import (
        CorpusConfig,
        chunk_documents,
        hash_split,
        mix_corpus,
        pack_sequences,
        prepare_corpus,
        select_token_budget,
        write_corpus_shards,
    )
    from dataworks_spark.llm.pipeline import decontaminate
    from dataworks_spark.llm.privacy import redact_pii
    from dataworks_spark.llm.text import corpus_stats
    from dataworks_spark.session import get_spark, load_table

    spark = spark or get_spark("corpus_pipeline_demo")
    docs = load_table(spark, sf_dir, "documents")

    # 1. scrub: masked PII must not survive into dedup hashes
    scrubbed = docs.withColumn("text", redact_pii(F.col("text")))

    # 2. dedup + quality filters + accounting (one fused projection) —
    # including the model tier: a (bucket, weight) table (here the
    # deterministic stand-in; a trained fastText-style model drops in
    # with the same schema) rides as one array literal, so model
    # scoring adds a column, not a join
    from dataworks_spark.llm.classify import (
        collect_weights_array,
        default_hash_weights,
    )

    weights = tuple(collect_weights_array(default_hash_weights(spark)))
    prepared = prepare_corpus(
        scrubbed,
        config=CorpusConfig(
            near_dup=True,
            min_tokens=5,
            model_weights=weights,
            min_model_score=0.4,  # mild cut: the stand-in scores ~N(0.5)
        ),
    )

    # 3. benchmark decontamination: first 5 docs stand in for evals;
    # bloom_fpp turns on the Bloom scan-prefilter tier (results are
    # byte-identical to the exact path — the Bloom only prunes work)
    eval_set = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    clean = decontaminate(
        prepared.filter(F.col("doc_id") >= 5), eval_set, ngram_n=5,
        bloom_fpp=1e-3,
    )
    # the audit companion: per-eval-doc residual overlap AFTER the cut
    # (should be ~0 for 5-gram containment — the number an eval owner
    # checks before trusting the benchmark)
    from dataworks_spark.llm.pipeline import contamination_report

    residual = contamination_report(clean, eval_set, ngram_n=5)
    max_contamination = residual.agg(F.max("contamination")).first()[0] or 0.0

    # 3b. semantic tier (SemDeDup, llm/similarity.py): the exact/ngram
    # tiers inside prepare_corpus catch literal twins; this one catches
    # MEANING-level duplicates via the embedding column. k-means
    # clusters bound the pair space (Σ|cluster|², never O(n²)); the
    # survivor rule (min id per connected component) is the same one
    # every other near-dup family uses. The fixture embeddings are
    # synthetic (max cos ≈ 0.5), so the demo threshold sits where it
    # actually fires — a real corpus runs ~0.95+.
    from dataworks_spark.llm.similarity import semantic_dedup_keepers

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = clean.select("doc_id").join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    components = semantic_dedup_keepers(
        vecs, "doc_id", "embedding", threshold=0.45, n_clusters=8
    )
    sem_losers = components.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias("doc_id")
    )
    sem_clean = clean.join(sem_losers, "doc_id", "left_anti")

    # 4. domain mixing: equal token shares from the first four sources
    mixed = mix_corpus(
        sem_clean,
        "source",
        {s: 1.0 for s in ("src0", "src1", "src2", "src3")},
    )

    # 5. deterministic splits, 6. token budget on the train split
    split = hash_split(mixed, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    train = split.filter(F.col("split") == "train")
    budgeted = select_token_budget(train, budget_tokens=2000)

    # 7. chunk to the context window, then pack the CHUNKS into
    # 512-token training sequences (chunk ids are synthesized from
    # (doc, chunk_idx) so packing stays a single-key operator)
    chunks = chunk_documents(
        budgeted, id_col="doc_id", text_col="text",
        chunk_tokens=256, overlap=32,
    ).withColumn(
        "chunk_id",
        F.col("doc_id") * F.lit(10_000) + F.col("chunk_idx"),
    )
    packed = pack_sequences(
        chunks, id_col="chunk_id", tokens_col="chunk_n_tokens",
        target_tokens=512, lanes=4,
    ).withColumn("doc_id", (F.col("chunk_id") / F.lit(10_000)).cast("long"))
    out_path = os.path.join(workdir, "corpus")
    write_corpus_shards(
        split.join(
            packed.select("doc_id", "pack_lane", "pack_seq")
            .dropDuplicates(["doc_id"]),
            "doc_id",
            "left",
        ),
        out_path,
        files_per_partition=2,
    )

    # 8. the nightly INGEST gate (llm/incremental.py): the next batch
    # enters the durable corpus through dedup-on-ingest — only new
    # content hashes append, so a redelivered batch (at-least-once
    # upstream) is a no-op by VALUE, no epoch ledger needed
    from dataworks_spark.llm.incremental import IncrementalCorpus

    ingest = IncrementalCorpus(
        spark, os.path.join(workdir, "ingest"), text_col="text", id_col="doc_id"
    )
    batch = budgeted.select("doc_id", "text")
    n_ingested = ingest.ingest(batch)
    n_redelivered = ingest.ingest(batch)  # same batch again → 0 appended

    summary = corpus_stats(budgeted).first()
    stats = {
        "n_raw": docs.count(),
        "n_prepared": prepared.count(),
        "n_clean": clean.count(),
        "n_semantic": sem_clean.count(),
        "n_mixed": mixed.count(),
        "n_ingested": n_ingested,
        "n_redelivered": n_redelivered,
        "n_train_budgeted": budgeted.count(),
        "n_chunks": chunks.count(),
        "n_packs": packed.select("pack_lane", "pack_seq").dropDuplicates().count(),
        "eval_residual_contamination": max_contamination,
        "train_vocab": summary["vocab_size"],
        "train_p90_dl": summary["p90_doc_tokens"],
        "out_path": out_path,
    }
    return stats


if __name__ == "__main__":
    import tempfile

    print(main(tempfile.mkdtemp(prefix="corpus_demo_")))
