"""Smoke test for examples/corpus_pipeline.py — the full LLM-pipeline
tier (scrub → dedup/filter → decontaminate → mix → split → budget →
pack → shard) composed end-to-end on the sf fixtures."""

import glob
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)


def test_corpus_pipeline_demo(spark, tmp_path, sf_dir):
    from corpus_pipeline import main

    out = main(workdir=str(tmp_path), spark=spark, sf_dir=sf_dir)
    # monotone funnel: each stage can only keep or drop
    assert (
        out["n_raw"]
        >= out["n_prepared"]
        >= out["n_clean"]
        >= out["n_semantic"]
        >= out["n_mixed"]
    )
    assert out["n_mixed"] > 0, "mixing must keep something"
    # ingest gate: the first batch appends, an identical redelivery is
    # a no-op by value (dedup-on-ingest)
    assert out["n_ingested"] > 0 and out["n_redelivered"] == 0
    assert out["n_train_budgeted"] > 0 and out["n_packs"] > 0
    # decontaminate dropped every doc sharing a 5-gram with the eval
    # set, so the residual audit must read zero
    assert out["eval_residual_contamination"] == 0.0
    # sharded layout on disk: split directories with parquet inside
    dirs = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(out["out_path"], "split=*"))
    )
    assert "split=train" in dirs
    back = spark.read.parquet(out["out_path"])
    assert back.count() == out["n_mixed"]
    assert {"doc_id", "split", "pack_lane", "pack_seq"} <= set(back.columns)
