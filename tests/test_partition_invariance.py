"""Partition-invariance of the engine-specific (rows-only) operators.

The driver's rows-only checks have no DuckDB oracle, so the only
correctness anchor is that these operators are DETERMINISTIC functions
of their input SET — never of its physical layout. Each case runs the
same library call on the same rows under two different partitionings
and asserts identical results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_spark.llm.dedup import minhash_near_dup_pairs, simhash_near_dup_pairs
from dataworks_spark.llm.similarity import IvfIndex, LshIndex
from dataworks_spark.session import load_table


def _docs(spark, sf_dir, n_parts):
    return load_table(spark, sf_dir, "documents").repartition(n_parts)


def _emb(spark, sf_dir, n_parts):
    return load_table(spark, sf_dir, "embeddings").repartition(n_parts)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_pairs_partition_invariant(spark, sf_dir):
    a = minhash_near_dup_pairs(_docs(spark, sf_dir, 1), "doc_id", "text", threshold=0.3)
    b = minhash_near_dup_pairs(_docs(spark, sf_dir, 7), "doc_id", "text", threshold=0.3)
    assert _rows(a) == _rows(b)


def test_minhash_capped_pairs_partition_invariant(spark, sf_dir):
    """The capped plan (max_bucket semi-join, the q_dedup_sketch
    'minhash_capped' branch) must drop the SAME buckets under any
    layout: bucket sizes are map-side-combined counts, a pure function
    of the input set."""
    a = minhash_near_dup_pairs(
        _docs(spark, sf_dir, 1), "doc_id", "text", threshold=0.3, max_bucket=8
    )
    b = minhash_near_dup_pairs(
        _docs(spark, sf_dir, 7), "doc_id", "text", threshold=0.3, max_bucket=8
    )
    assert _rows(a) == _rows(b)


def test_semantic_dedup_capped_partition_invariant(spark, sf_dir):
    """max_cluster sub-sharding hashes ids, never partitions: the
    capped semantic pair set is layout-independent too."""
    from dataworks_spark.llm.similarity import semantic_dedup_pairs

    def run(n_parts):
        return semantic_dedup_pairs(
            _emb(spark, sf_dir, n_parts), "vec_id", "embedding",
            threshold=0.35, n_clusters=8, max_cluster=40,
        )

    assert _rows(run(1)) == _rows(run(7))


def test_simhash_pairs_partition_invariant(spark, sf_dir):
    a = simhash_near_dup_pairs(_docs(spark, sf_dir, 1), "doc_id", "text")
    b = simhash_near_dup_pairs(_docs(spark, sf_dir, 7), "doc_id", "text")
    assert _rows(a) == _rows(b)


def test_ivf_centroids_and_topk_partition_invariant(spark, sf_dir):
    """A bare limit() sample would make the trained centroids a function
    of partition order; the hash-ordered sample must not be."""
    q = [float(i % 7) / 7.0 for i in range(64)]
    idx1 = IvfIndex(_emb(spark, sf_dir, 1), "embedding", cache=False)
    idx7 = IvfIndex(_emb(spark, sf_dir, 7), "embedding", cache=False)
    assert (idx1.centroids == idx7.centroids).all()
    t1 = idx1.topk(q, k=10, id_cols=["vec_id"])
    t7 = idx7.topk(q, k=10, id_cols=["vec_id"])
    assert _rows(t1.select("vec_id")) == _rows(t7.select("vec_id"))


def test_lsh_topk_partition_invariant(spark, sf_dir):
    q = [float(i % 5) / 5.0 for i in range(64)]
    i1 = LshIndex(_emb(spark, sf_dir, 1), "embedding", dim=64, cache=False)
    i7 = LshIndex(_emb(spark, sf_dir, 7), "embedding", dim=64, cache=False)
    t1 = i1.topk(q, k=10, n_probe=2, id_cols=["vec_id"])
    t7 = i7.topk(q, k=10, n_probe=2, id_cols=["vec_id"])
    assert _rows(t1.select("vec_id")) == _rows(t7.select("vec_id"))


def test_knn_join_lsh_partition_invariant(spark, sf_dir):
    """The ANN-composed batch kNN (the knn_lsh branch of the
    rows-only driver entry q_embed_ann) must be a function of the input SET: same probes,
    same candidates, same ranks under different corpus layouts."""
    from dataworks_spark.llm.similarity import knn_join_lsh

    queries = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec"))
    )

    def run(n_parts):
        corpus = _emb(spark, sf_dir, n_parts).filter(F.col("vec_id") >= 5)
        idx = LshIndex(corpus, "embedding", dim=64, n_planes=4, cache=False)
        return knn_join_lsh(idx, queries, "vec_id", k=3, n_probe=2)

    assert _rows(run(1)) == _rows(run(7))
