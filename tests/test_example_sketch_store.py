"""Smoke test for examples/sketch_store.py — the persist-the-sketch
MinHash workflow (r13): one signature pass → parquet → three re-banding
analyses off the stored sketch → keeper clusters."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)


def test_sketch_store_demo(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from sketch_store import main

    out = main(workdir=str(tmp_path), spark=spark, sf_dir=sf_dir)
    assert out["pairs"] > 0, "fixture should contain near-dups at 0.5"
    assert out["guarded_pairs"] == out["pairs"]  # generous cap = no-op
    assert out["dup_families"] <= out["dup_family_members"]
    assert out["dup_family_members"] >= 2 * out["dup_families"]

    # the stored sketch must reproduce the one-shot composed function
    # exactly at the same operating point
    from dataworks_spark.llm.dedup import minhash_near_dup_pairs
    from dataworks_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    direct = {
        (r.doc_a, r.doc_b): round(r.est_jaccard, 6)
        for r in minhash_near_dup_pairs(
            docs, "doc_id", "text", n_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    stored = spark.read.parquet(os.path.join(str(tmp_path), "minhash_sketch"))
    from dataworks_spark.llm.dedup import minhash_pairs_from_signatures

    replay = {
        (r.doc_a, r.doc_b): round(r.est_jaccard, 6)
        for r in minhash_pairs_from_signatures(
            stored, n_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    assert replay == direct and len(direct) == out["pairs"]
