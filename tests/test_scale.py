"""Scale-tool tests: validation pipeline (B9), config source (A7),
salted join correctness, bucketed join shuffle elimination."""

import json

from pyspark.sql import functions as F

from dataworks_spark.config import DEFAULTS, apply_spark_conf, load_config
from dataworks_spark.ops.scale import (
    bucketed_join_plan_has_no_exchange,
    salted_join,
    write_bucketed,
)
from dataworks_spark.registry.validation import (
    Invalid,
    blank_field,
    function_already_exists,
    missing_field,
    parseable_steps,
    thread_checks,
    valid_name,
    validate_buffer,
)
from dataworks_spark.session import load_table


def test_validation_chain_short_circuits():
    """->? semantics (utils/common.clj:8-27): first failure wins."""
    # step args must be well-formed since r10 (an arg-less {'op':'map'}
    # passed op-name-only validation, then crashed at activation)
    doc = {"name": "my-stream", "steps": [{"op": "map", "cols": {"y": "x + 1"}}], "buffer": 5}
    ok = thread_checks(
        doc,
        missing_field("name", "steps"),
        blank_field("name"),
        valid_name(),
        parseable_steps(),
        validate_buffer(),
        function_already_exists(lambda n: False),
    )
    assert ok == doc

    bad = thread_checks(
        {"steps": []},
        missing_field("name", "steps"),
        valid_name(),  # never reached
    )
    assert isinstance(bad, Invalid) and bad.message == "missing-field"
    assert bad.details == {"fields": ["name"]}

    assert thread_checks({"name": "BadName", "steps": []}, valid_name()).message == "invalid-name"
    assert (
        thread_checks({"name": "x", "steps": [{"op": "evil"}]}, parseable_steps()).message
        == "unparseable-step"
    )
    dup = thread_checks({"name": "x"}, function_already_exists(lambda n: n == "x"))
    assert dup.message == "function-already-exists"


def test_buffer_validation_accepts_reference_shapes():
    """Since r8 the lossy policies are SUPPORTED (SURVEY I2 analog):
    the reference's {sliding-buffer n} shape validates when the doc
    names a shed key; malformed shapes stay :invalid-buffer."""
    ok = thread_checks(
        {"buffer": {"sliding-buffer": 5}, "buffer_key": ["user_id"]}, validate_buffer()
    )
    assert not isinstance(ok, Invalid)
    no_key = thread_checks({"buffer": {"dropping-buffer": 5}}, validate_buffer())
    assert isinstance(no_key, Invalid) and no_key.message == "invalid-buffer"
    bad = thread_checks({"buffer": {"kind": "sliding", "n": 5}}, validate_buffer())
    assert isinstance(bad, Invalid) and bad.message == "invalid-buffer"
    assert thread_checks({"buffer": 10}, validate_buffer()) == {"buffer": 10}


def test_config_json_and_edn(tmp_path):
    assert load_config(None) == DEFAULTS
    j = tmp_path / "c.json"
    j.write_text(json.dumps({"kafka.brokers": "b1:9092", "alert.poll.ms": 500}))
    cfg = load_config(str(j))
    assert cfg["kafka.brokers"] == "b1:9092" and cfg["alert.poll.ms"] == 500
    e = tmp_path / "c.edn"
    e.write_text('{:kafka/brokers "b2:9092" :collector/port 8080}')
    cfg = load_config(str(e))
    assert cfg["kafka.brokers"] == "b2:9092" and cfg["collector.port"] == 8080


def test_apply_spark_conf(spark):
    apply_spark_conf({"spark.sql.shuffle.partitions": 7, "kafka.brokers": "x"}, spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # restore test default


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change join semantics."""
    ev = load_table(spark, sf_dir, "events")  # user_id is skew-shaped enough
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = ev.join(cust, on="user_id").groupBy("c_mktsegment").count()
    salted = salted_join(ev, cust, "user_id", n_salts=8).groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # left join: unmatched LEFT rows survive exactly once
    evx = ev.withColumn("user_id", F.col("user_id") + F.lit(10_000_000))
    lp = evx.join(cust, on="user_id", how="left").count()
    ls = salted_join(evx, cust, "user_id", n_salts=8, how="left").count()
    assert lp == ls == evx.count()


def test_salted_join_rejects_right_and_full(spark, sf_dir):
    """The replicated right side would emit n_salts copies of every
    unmatched right-side row under right/full outer semantics — the API
    must refuse rather than silently multiply rows (VERDICT r2)."""
    import pytest

    ev = load_table(spark, sf_dir, "events").limit(10)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(ev, cust, "user_id", n_salts=4, how=how)


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join without an Exchange —
    the co-location play for recurring 100 TB fact joins."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        )
        write_bucketed(li, "t_li_bucketed", "l_orderkey", 8)
        write_bucketed(o, "t_o_bucketed", "l_orderkey", 8)
        assert bucketed_join_plan_has_no_exchange(spark, "t_li_bucketed", "t_o_bucketed", "l_orderkey")
        # sanity: the join actually returns rows
        n = spark.table("t_li_bucketed").join(spark.table("t_o_bucketed"), "l_orderkey").count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_lsh_index_save_load_partition_prunes(spark, sf_dir, tmp_path):
    """A persisted LshIndex round-trips exactly, and a probe against the
    loaded index PRUNES AT THE DIRECTORY LEVEL: the scan's partition
    filter carries lsh_bucket, so only the probed buckets' files are
    read — the mechanism that makes ANN probes touch ~n_probe/2^planes
    of a 100 TB table."""
    from dataworks_spark.llm.similarity import LshIndex

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.first()["embedding"])
    built = LshIndex(emb, "embedding", dim=dim, n_planes=4, cache=False)
    path = str(tmp_path / "lsh_idx")
    built.save(path)
    loaded = LshIndex.load(spark, path)
    q = [float(x) for x in emb.first()["embedding"]]

    def key(df):
        return [(r.vec_id, r.cos_sim) for r in df.select("vec_id", "cos_sim").collect()]

    assert key(loaded.topk(q, k=5, n_probe=2, id_cols=["vec_id"])) == key(
        built.topk(q, k=5, n_probe=2, id_cols=["vec_id"])
    )
    # plan-level: the bucket filter reaches the scan as a PartitionFilter
    probed = loaded.df.filter(F.col("lsh_bucket").isin([1, 2]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    from tests.test_plans import _partition_filters

    assert any(pf and "lsh_bucket" in pf for pf in _partition_filters(plan)), plan


def test_ivf_index_save_load_round_trip(spark, sf_dir, tmp_path):
    from dataworks_spark.llm.similarity import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    built = IvfIndex(emb, "embedding", n_centroids=4, cache=False)
    path = str(tmp_path / "ivf_idx")
    built.save(path)
    loaded = IvfIndex.load(spark, path)
    assert (loaded.centroids == built.centroids).all()
    q = [float(x) for x in emb.first()["embedding"]]

    def key(df):
        return [(r.vec_id, r.cos_sim) for r in df.select("vec_id", "cos_sim").collect()]

    assert key(loaded.topk(q, k=5, n_probe=2, id_cols=["vec_id"])) == key(
        built.topk(q, k=5, n_probe=2, id_cols=["vec_id"])
    )
    probed = loaded.df.filter(F.col("__ivf").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    from tests.test_plans import _partition_filters

    assert any(pf and "__ivf" in pf for pf in _partition_filters(plan)), plan


def test_table_fingerprint_tracks_mutation(spark, tmp_path):
    """r14 (r13 VERDICT #1): the corpus fingerprint is stable while the
    table is untouched, changes when the table is rewritten under the
    SAME path, and ignores hidden/underscore bookkeeping files."""
    from dataworks_spark.session import table_fingerprint

    p = str(tmp_path / "t.parquet")
    spark.range(10).write.mode("overwrite").parquet(p)
    fp1 = table_fingerprint(spark, p)
    assert fp1 == table_fingerprint(spark, p)
    (tmp_path / "t.parquet" / "_extra_marker").write_text("x")
    (tmp_path / "t.parquet" / ".hidden").write_text("x")
    assert table_fingerprint(spark, p) == fp1
    spark.range(20).write.mode("overwrite").parquet(p)
    assert table_fingerprint(spark, p) != fp1


def test_ann_cache_retrains_on_table_mutation(spark, tmp_path):
    """r14 (r13 VERDICT #1 done-criterion): mutate the table under the
    cache's path and observe a RETRAIN — stale centroids are impossible
    by construction. Also: the stale entry is evicted, not retained."""
    import numpy as np

    from dataworks_spark import queries as Q

    rng = np.random.default_rng(7)
    sfd = str(tmp_path)

    def write(n):
        rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(n)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).write.mode("overwrite").parquet(f"{sfd}/embeddings.parquet")

    write(32)
    calls = []

    def build():
        calls.append(1)
        return np.ones((2, 8)) * len(calls)

    a = Q._ann_cached(spark, sfd, "fp-test", build)
    b = Q._ann_cached(spark, sfd, "fp-test", build)
    assert len(calls) == 1 and a is b  # memo hit while data unchanged
    write(40)  # the mutation the path-keyed r13 cache would have missed
    c = Q._ann_cached(spark, sfd, "fp-test", build)
    assert len(calls) == 2 and c is not a
    live = [k for k in Q._ANN_INDEX_CACHE if k[1] == sfd and k[2] == "fp-test"]
    assert len(live) == 1  # stale-fingerprint key evicted


def test_index_sidecar_fingerprint_guard(spark, sf_dir, tmp_path):
    """r14 (r13 VERDICT #1): a sidecar saved with a source fingerprint
    refuses to load against a different (or absent) expectation; a
    matching expectation or a None (legacy trust-the-path) load works.
    Covers both index kinds — they share the guard."""
    import pytest

    from dataworks_spark.llm.similarity import IvfIndex, LshIndex
    from dataworks_spark.session import table_fingerprint, table_path

    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    fp = table_fingerprint(spark, table_path(sf_dir, "embeddings"))
    dim = len(emb.first()["embedding"])

    ivf = IvfIndex(emb, "embedding", n_centroids=4, cache=False)
    p1 = str(tmp_path / "ivf_fp")
    ivf.save(p1, source_fingerprint=fp)
    loaded = IvfIndex.load(spark, p1, expect_fingerprint=fp)
    assert (loaded.centroids == ivf.centroids).all()
    with pytest.raises(ValueError, match="stale index"):
        IvfIndex.load(spark, p1, expect_fingerprint="0" * 32)

    lsh = LshIndex(emb, "embedding", dim=dim, n_planes=4, cache=False)
    p2 = str(tmp_path / "lsh_fp")
    lsh.save(p2, source_fingerprint=fp)
    assert LshIndex.load(spark, p2, expect_fingerprint=fp).planes.shape == (4, dim)
    with pytest.raises(ValueError, match="stale index"):
        LshIndex.load(spark, p2, expect_fingerprint="0" * 32)

    # legacy sidecar (saved without a fingerprint): None loads, an
    # expectation refuses — unverifiable counts as stale
    p3 = str(tmp_path / "ivf_nofp")
    ivf.save(p3)
    IvfIndex.load(spark, p3)
    with pytest.raises(ValueError, match="stale index"):
        IvfIndex.load(spark, p3, expect_fingerprint=fp)


def test_ivf_assign_large_c_is_arrow_vectorized(spark, sf_dir):
    """r10: above IVF_LITERAL_MAX the assignment must plan as an
    Arrow-batched pandas UDF (ArrowEvalPython — one numpy matmul per
    batch), never a row-at-a-time BatchEvalPython, and the small-c
    literal kernel must stay pure-JVM (no Python node at all)."""
    import numpy as np

    from dataworks_spark.llm.similarity import IVF_LITERAL_MAX, ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    rng = np.random.default_rng(3)
    big = rng.normal(size=(IVF_LITERAL_MAX + 1, 64))
    plan = (
        emb.select(ivf_assign(F.col("embedding"), big).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan, plan[:800]
    assert "BatchEvalPython" not in plan

    small = rng.normal(size=(8, 64))
    jvm_plan = (
        emb.select(ivf_assign(F.col("embedding"), small).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in jvm_plan  # pure JVM expression


def test_fingerprint_provider_seam(spark, tmp_path):
    """r15 (r14 VERDICT #5): transactional-table deployments key
    artifacts by SNAPSHOT id instead of the FS listing — both seams
    (per-call snapshot_id, session-global provider) fold into the same
    hex key space, short-circuit the listing, and restore cleanly."""
    from dataworks_spark.session import (
        set_fingerprint_provider,
        table_fingerprint,
    )

    p = str(tmp_path / "t.parquet")
    spark.range(5).write.mode("overwrite").parquet(p)
    fs_fp = table_fingerprint(spark, p)

    # per-call override: deterministic on the id, independent of files
    a = table_fingerprint(spark, p, snapshot_id=41)
    assert a == table_fingerprint(spark, "/nonexistent/elsewhere", snapshot_id=41)
    assert a != table_fingerprint(spark, p, snapshot_id=42) != fs_fp

    # session-global provider: consulted for every path; None falls
    # through to the FS fold (mixed plain-parquet deployments)
    seen = []

    def provider(_s, path):
        seen.append(path)
        return "v7" if path == p else None

    prev = set_fingerprint_provider(provider)
    try:
        assert prev is None
        pa = table_fingerprint(spark, p)
        assert pa == table_fingerprint(spark, p, snapshot_id="v7") != fs_fp
        assert table_fingerprint(spark, str(tmp_path / "t.parquet")) == pa
        other = str(tmp_path / "u.parquet")
        spark.range(3).write.mode("overwrite").parquet(other)
        assert table_fingerprint(spark, other) == table_fingerprint(
            spark, other
        )  # fell through to the FS fold — still works
        assert p in seen and other in seen
    finally:
        assert set_fingerprint_provider(prev) is provider
    assert table_fingerprint(spark, p) == fs_fp  # provider cleared


def test_table_meta_stamp_and_verify(spark, tmp_path):
    """r15 (r14 VERDICT #2): the durable `_dw_meta.json` stamp verifies
    on an untouched table, is invisible to the fingerprint it records,
    tolerates stampless (legacy/foreign) paths, and REFUSES a path
    whose data files changed outside the engine."""
    import pytest

    from dataworks_spark.session import (
        read_table_meta,
        table_fingerprint,
        verify_table_meta,
        write_table_meta,
    )

    p = str(tmp_path / "t.parquet")
    spark.range(10).write.mode("overwrite").parquet(p)
    assert verify_table_meta(spark, p) is None  # stampless: accepted
    before = table_fingerprint(spark, p)
    fp = write_table_meta(spark, p, extra={"writer": "test"})
    # the stamp itself must not perturb the fingerprint it records
    assert fp == before == table_fingerprint(spark, p)
    meta = verify_table_meta(spark, p)
    assert meta == {"fingerprint": fp, "writer": "test"}
    assert read_table_meta(spark, p) == meta
    # re-stamp overwrites atomically
    write_table_meta(spark, p, extra={"writer": "test2"})
    assert verify_table_meta(spark, p)["writer"] == "test2"
    # out-of-band mutation: plant a foreign data file
    (tmp_path / "t.parquet" / "part-evil.parquet").write_bytes(b"PAR1")
    with pytest.raises(RuntimeError, match="outside the engine"):
        verify_table_meta(spark, p)


def test_winnow_fps_asset_rebuilds_on_corpus_mutation(spark, tmp_path):
    """r15 (r14 VERDICT #1 done-criterion): the shared winnowing
    (doc, fp) relation is a fingerprint-keyed train-once asset — a
    second call reuses the SAME materialized relation (no rebuild),
    and mutating the documents table under its path forces a rebuild
    whose output reflects the new corpus (stale entry evicted)."""
    from dataworks_spark import queries as Q

    sfd = str(tmp_path)
    common = "the quick brown fox jumps over the lazy dog again and again today "

    def write(texts):
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{sfd}/documents.parquet")
        # the path-keyed fixture table cache is a bench tactic over
        # immutable fixtures — drop it so the ARTIFACT memo (the thing
        # under test) sees the rewritten files
        for k in [k for k in Q._TABLE_CACHE if k[1] == sfd]:
            Q._TABLE_CACHE.pop(k)

    uniq = [f"doc {i} speaks only of topic {i} in its own words number {i} " * 2
            for i in range(5)]
    write(uniq + [common * 2, common * 2, "something else entirely here now ok " * 3])
    n1 = Q.QUERIES["q_contamination_report"](spark, sfd).count()
    keys1 = [k for k in Q._ANN_INDEX_CACHE if k[2] == "winnow-postings" and k[1] == sfd]
    assert len(keys1) == 1
    rel1 = Q._ANN_INDEX_CACHE[keys1[0]]
    assert Q.QUERIES["q_contamination_report"](spark, sfd).count() == n1
    assert Q._ANN_INDEX_CACHE[keys1[0]] is rel1  # memo hit, same asset

    # mutate: three identical docs now — more winnow pairs
    write(uniq + [common * 2, common * 2, common * 2])
    n2 = Q.QUERIES["q_contamination_report"](spark, sfd).count()
    keys2 = [k for k in Q._ANN_INDEX_CACHE if k[2] == "winnow-postings" and k[1] == sfd]
    assert len(keys2) == 1 and keys2[0] != keys1[0]  # stale key evicted
    assert n2 != n1  # the rebuilt relation reflects the new corpus


def test_session2_assets_rebuild_on_mutation(spark, tmp_path):
    """r15 session 2 memo kinds follow the same fingerprint-keyed
    contract as the postings: the edit-distance pair graph
    (q_dedup_clusters, table='customer') and the capped-branch bucket
    survivors (q_dedup_sketch) memo-hit while the source is unchanged
    and rebuild to reflect an under-the-path mutation."""
    from dataworks_spark import queries as Q

    sfd = str(tmp_path)

    def write_customers(names):
        spark.createDataFrame(
            list(enumerate(names)), "c_custkey long, c_name string"
        ).write.mode("overwrite").parquet(f"{sfd}/customer.parquet")
        for k in [k for k in Q._TABLE_CACHE if k[1] == sfd]:
            Q._TABLE_CACHE.pop(k)

    write_customers(["alpha onex", "alpha oney", "gamma something else"])
    out1 = {
        (r.id, r.cluster)
        for r in Q.QUERIES["q_dedup_clusters"](spark, sfd).collect()
    }
    assert out1 == {(0, 0), (1, 0)}  # the pair clusters; the loner is unpaired
    keys1 = [k for k in Q._ANN_INDEX_CACHE if k[2] == "edit-pairs" and k[1] == sfd]
    assert len(keys1) == 1
    again = {
        (r.id, r.cluster)
        for r in Q.QUERIES["q_dedup_clusters"](spark, sfd).collect()
    }
    assert again == out1
    assert [
        k for k in Q._ANN_INDEX_CACHE if k[2] == "edit-pairs" and k[1] == sfd
    ] == keys1  # memo hit, no rebuild
    write_customers(["alpha onex", "alpha oney", "alpha onez"])
    out2 = {
        (r.id, r.cluster)
        for r in Q.QUERIES["q_dedup_clusters"](spark, sfd).collect()
    }
    assert out2 == {(0, 0), (1, 0), (2, 0)}  # rebuilt graph joins the third
    keys2 = [k for k in Q._ANN_INDEX_CACHE if k[2] == "edit-pairs" and k[1] == sfd]
    assert len(keys2) == 1 and keys2[0] != keys1[0]  # stale key evicted

    def write_docs(texts):
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{sfd}/documents.parquet")
        for k in [k for k in Q._TABLE_CACHE if k[1] == sfd]:
            Q._TABLE_CACHE.pop(k)

    dup = "the quick brown fox jumps over the lazy dog again and again today "
    other = "completely different words about spark shuffles and parquet footers here "
    write_docs([dup * 2, dup * 2, other * 2])
    n1 = Q.QUERIES["q_dedup_sketch"](spark, sfd).count()
    skeys1 = [
        k for k in Q._ANN_INDEX_CACHE
        if k[2] == "minhash-capped-survivors" and k[1] == sfd
    ]
    assert len(skeys1) == 1
    assert Q.QUERIES["q_dedup_sketch"](spark, sfd).count() == n1
    assert [
        k for k in Q._ANN_INDEX_CACHE
        if k[2] == "minhash-capped-survivors" and k[1] == sfd
    ] == skeys1  # memo hit
    # three identical docs: their buckets exceed max_bucket=2, so the
    # rebuilt survivor set DROPS them from the capped branch while the
    # uncapped branch still pairs them — the count must change
    write_docs([dup * 2, dup * 2, dup * 2])
    n2 = Q.QUERIES["q_dedup_sketch"](spark, sfd).count()
    skeys2 = [
        k for k in Q._ANN_INDEX_CACHE
        if k[2] == "minhash-capped-survivors" and k[1] == sfd
    ]
    assert len(skeys2) == 1 and skeys2[0] != skeys1[0]
    assert n2 != n1


def test_generic_artifact_sidecar_for_sketches(spark, sf_dir, tmp_path):
    """r15: save/load_artifact_table is the generic sidecar for sketch
    relations — a MinHash signature table round-trips with the same
    staleness/tamper contract, and banding a LOADED sidecar emits the
    exact pair set of banding the fresh relation."""
    import pytest

    from dataworks_spark.llm.dedup import (
        minhash_pairs_from_signatures,
        minhash_signatures,
    )
    from dataworks_spark.session import (
        load_artifact_table,
        load_table,
        save_artifact_table,
        table_fingerprint,
        table_path,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    sig = minhash_signatures(d, "doc_id", "text", n_hashes=64)
    fp = table_fingerprint(spark, table_path(sf_dir, "documents"))
    p = str(tmp_path / "sigs")
    save_artifact_table(sig, p, source_fingerprint=fp, writer="minhash_signatures")

    loaded = load_artifact_table(spark, p, expect_fingerprint=fp)

    def key(df):
        return sorted(
            (r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in df.collect()
        )

    assert key(
        minhash_pairs_from_signatures(loaded, n_hashes=64, bands=16, threshold=0.3)
    ) == key(
        minhash_pairs_from_signatures(sig, n_hashes=64, bands=16, threshold=0.3)
    )
    with pytest.raises(ValueError, match="stale index"):
        load_artifact_table(spark, p, expect_fingerprint="f" * 32)
