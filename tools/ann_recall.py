"""Measured ANN recall@k vs the exact kNN twin (r12 VERDICT #3).

The three rows-only ANN paths of q_embed_ann — LSH top-k, IVF top-k,
and the LSH-probed batch kNN join — have exact-twin and planted-recall
unit anchors, but a 100 TB user sizing ``n_probe`` / ``n_planes`` /
``n_centroids`` needs a RECORDED recall number at bench scale. This
tool measures recall@k per path against :func:`knn_join` (the exact
brute-force batch kernel, itself hash-checked through q_cosine_knn)
and prints one JSON line; BASELINE.md records the sf0.1 / sf0.5 runs,
and tests/test_llm.py gates the floors so a regression in bucketing,
probing, or training trips CI rather than silently eroding recall.

Recall@k here is the standard macro average: |ANN top-k ∩ exact
top-k| / k, averaged over queries. Ties at the k-boundary are broken
identically in both kernels (cos desc, id asc via the shared
_rank_scored), so the metric is deterministic.

Usage:
    python tools/ann_recall.py [sf_dir] [--queries N] [--k K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def _topk(df, qid_col, cid_col, cos_col="cos_sim"):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r[qid_col], []).append((r[cid_col], float(r[cos_col])))
    for ids in out.values():
        ids.sort(key=lambda t: (-t[1], t[0]))
    return out


def _metrics(exact: dict, got: dict, k: int) -> dict:
    """recall@k, recall@1, and sim_ratio = mean retrieved cosine /
    mean exact top-k cosine (how good the retrieved neighbors are even
    when they are not the exact ties — the metric that matters when the
    k-boundary is a near-tie, as it is on a near-uniform corpus)."""
    r_k, r_1, ratios = [], [], []
    for q, ex in exact.items():
        g = got.get(q, [])
        ex_ids = [i for i, _ in ex[:k]]
        g_ids = [i for i, _ in g[:k]]
        r_k.append(len(set(g_ids) & set(ex_ids)) / float(k))
        r_1.append(1.0 if g_ids and ex_ids and g_ids[0] == ex_ids[0] else 0.0)
        ex_mean = sum(c for _, c in ex[:k]) / max(len(ex[:k]), 1)
        g_mean = sum(c for _, c in g[:k]) / max(len(g[:k]), 1)
        if ex_mean > 0:
            ratios.append(g_mean / ex_mean)
    n = len(exact)
    if n == 0:
        # n_queries=0 or an empty embeddings table gives nothing to
        # score — a descriptive error beats a ZeroDivisionError here
        raise ValueError(
            "no exact top-k results to compare against: the query set is "
            "empty (n_queries=0, or the embeddings table has no rows)"
        )
    return {
        "recall": round(sum(r_k) / n, 4),
        "recall1": round(sum(r_1) / n, 4),
        "sim_ratio": round(sum(ratios) / max(len(ratios), 1), 4),
    }


def measure(spark, sf_dir: str, k: int = 10, n_queries: int = 20) -> dict:
    """Recall@k of every ANN path on the embeddings table: queries are
    the first ``n_queries`` vec_ids, the corpus is everything else (so
    a query never retrieves itself). Returns {path: {setting: recall}}
    plus the corpus size."""
    from dataworks_spark.llm.similarity import (
        IvfIndex,
        LshIndex,
        knn_join,
        knn_join_lsh,
    )
    from dataworks_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec"))
    )
    corpus = emb.filter(F.col("vec_id") >= n_queries).localCheckpoint()
    n_corpus = corpus.count()
    dim = len(queries.first()["qvec"])

    exact = _topk(
        knn_join(corpus, queries, "vec_id", "embedding", k=k), "q_id", "vec_id"
    )

    out: dict = {"k": k, "n_queries": n_queries, "n_corpus": n_corpus}
    qrows = queries.collect()

    def _single(index, n_probe):
        got = {}
        for r in qrows:
            got[r["q_id"]] = [
                (x["vec_id"], float(x["cos_sim"]))
                for x in index.topk(r["qvec"], k=k, n_probe=n_probe,
                                    id_cols=["vec_id"]).collect()
            ]
        return got

    # LSH top-k: the q_embed_ann setting (n_planes=4 → 16 buckets)
    lsh = LshIndex(corpus, "embedding", dim, n_planes=4)
    for n_probe in (1, 2, 4, 8):
        out[f"lsh_p4_probe{n_probe}"] = _metrics(exact, _single(lsh, n_probe), k)

    # IVF top-k: the library default geometry (n_centroids=16)
    ivf = IvfIndex(corpus, "embedding", n_centroids=16)
    for n_probe in (1, 2, 4):
        out[f"ivf_c16_probe{n_probe}"] = _metrics(exact, _single(ivf, n_probe), k)

    # LSH-probed batch kNN join (the q_embed_ann knn_lsh branch)
    for n_probe in (2, 4):
        got = _topk(
            knn_join_lsh(lsh, queries, "vec_id", k=k, n_probe=n_probe),
            "q_id", "vec_id",
        )
        out[f"knn_lsh_p4_probe{n_probe}"] = _metrics(exact, got, k)

    # planted-twin regime — the near-dup workload ANN exists for here
    # (SemDeDup / embedding near-dedup): for each query, a cos≈0.998
    # twin is planted in the corpus; the metric is whether each path's
    # top-1 finds it. On the near-uniform base corpus this is the
    # number that transfers to 100 TB dedup, where true duplicates are
    # high-cosine, not k-boundary near-ties.
    import numpy as np

    rng = np.random.default_rng(13)
    twins, twin_cos = [], {}
    for r in qrows:
        v = np.asarray(r["qvec"], dtype=np.float64)
        t = v + 0.05 * np.linalg.norm(v) / np.sqrt(dim) * rng.normal(size=dim)
        twins.append((100_000 + int(r["q_id"]), [float(x) for x in t]))
        twin_cos[r["q_id"]] = float(
            (v @ t) / (np.linalg.norm(v) * np.linalg.norm(t))
        )
    tw = spark.createDataFrame(twins, "vec_id long, embedding array<double>")
    corpus2 = corpus.select("vec_id", "embedding").unionByName(tw).localCheckpoint()

    def _twin_hit_rate(got: dict) -> float:
        # a hit = the planted twin is retrieved in the top-k, OR the
        # path retrieved something at least as cosine-close (corpora
        # with exact duplicates of the query — the sf0.5 proxy — can
        # legitimately outrank a cos≈0.999 twin)
        hits = 0.0
        for r in qrows:
            g = got.get(r["q_id"]) or []
            if any(cid == 100_000 + int(r["q_id"]) for cid, _ in g):
                hits += 1.0
            elif g and g[0][1] >= twin_cos[r["q_id"]] - 1e-6:
                hits += 1.0
        return round(hits / len(qrows), 4)

    lsh2 = LshIndex(corpus2, "embedding", dim, n_planes=4)
    ivf2 = IvfIndex(corpus2, "embedding", n_centroids=16)
    for n_probe in (1, 2):
        out[f"twin_lsh_p4_probe{n_probe}"] = _twin_hit_rate(_single(lsh2, n_probe))
        out[f"twin_ivf_c16_probe{n_probe}"] = _twin_hit_rate(_single(ivf2, n_probe))
    out["twin_knn_lsh_p4_probe2"] = _twin_hit_rate(
        _topk(knn_join_lsh(lsh2, queries, "vec_id", k=k, n_probe=2),
              "q_id", "vec_id")
    )

    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ann-recall")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = measure(spark, args.sf_dir, k=args.k, n_queries=args.queries)
    res["sf_dir"] = args.sf_dir
    json.dump(res, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
