"""Persist-the-sketch dedup workflow — the 100 TB operating shape for
MinHash near-dedup (r13; llm/dedup.py `minhash_signatures` /
`minhash_pairs_from_signatures`):

    documents
      → minhash_signatures          (the expensive shingle→minhash
                                     pass — run ONCE per corpus drop)
      → write parquet               (the sketch table: ~n_hashes longs
                                     per doc — tiny next to the text)
      → reload                      (any later session, any cluster)
      → re-band at will             (different bands/threshold =
                                     different similarity operating
                                     points; max_bucket = the hot-
                                     bucket guard — each re-band is
                                     LINEAR over the stored sketch)
      → near_dup_clusters           (connected components → one
                                     deterministic keeper per family)

The point: banding parameters are a QUERY-time choice, not an
ingest-time commitment. A parameter sweep (recall/precision tuning,
threshold audits, a capped re-run after a boilerplate incident) costs
one banding pass each — never a second pass over the corpus text.

Run directly (``python examples/sketch_store.py``) against the
sf0.001 fixtures, or import :func:`main` (the smoke test does).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(workdir: str, spark=None, sf_dir: str = "/root/testdata/sf0.001"):
    from dataworks_spark.llm.dedup import (
        minhash_pairs_from_signatures,
        minhash_signatures,
        near_dup_clusters,
    )
    from dataworks_spark.session import get_spark, load_table

    spark = spark or get_spark()
    docs = load_table(spark, sf_dir, "documents")

    # 1. The sketch pass — once per corpus drop. At 100 TB this is the
    #    job you schedule; everything below is interactive-scale.
    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=64)

    # 2. Persist. The sketch table is 64 longs + an id per doc; write
    #    it hash-spread (re-banding shuffles on band hashes anyway, so
    #    no layout commitment is useful here).
    sketch_path = os.path.join(workdir, "minhash_sketch")
    sig.write.mode("overwrite").parquet(sketch_path)

    # 3. Reload in a "later session" and run THREE different analyses
    #    off the one stored sketch — each linear, none re-reads text.
    stored = spark.read.parquet(sketch_path)

    # 3a. The production operating point.
    pairs = minhash_pairs_from_signatures(
        stored, n_hashes=64, bands=16, threshold=0.5
    )

    # 3b. A higher-recall audit sweep (more, smaller bands → the
    #     S-curve shifts left; threshold loosened to match).
    audit = minhash_pairs_from_signatures(
        stored, n_hashes=64, bands=32, threshold=0.3
    )

    # 3c. The same production point with the hot-bucket guard active —
    #     what you re-run after a boilerplate family lands.
    guarded = minhash_pairs_from_signatures(
        stored, n_hashes=64, bands=16, threshold=0.5, max_bucket=64
    )

    # 4. Keeper decision from the production pairs: connected
    #    components, min-id survivor per family.
    clusters = near_dup_clusters(pairs, id_a="doc_a", id_b="doc_b")

    n_pairs = pairs.count()
    n_audit = audit.count()
    n_guarded = guarded.count()
    n_members = clusters.count()
    n_families = clusters.select("cluster").distinct().count()

    # the guard with a generous cap must be a no-op here (the fixture
    # has no over-cap families)
    assert n_guarded == n_pairs

    return {
        "pairs": n_pairs,
        "audit_pairs": n_audit,
        "guarded_pairs": n_guarded,
        "dup_family_members": n_members,
        "dup_families": n_families,
    }


if __name__ == "__main__":
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = main(td)
        print(out)
