"""SparkSession factory and fixture loaders.

Local test harness runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
configs below are chosen so the same code scales to a multi-executor
cluster: AQE for runtime re-planning (skew joins, partition coalescing),
shuffle partitions sized to the environment, Arrow enabled for the few
Pandas-UDF code paths, and UTC session time so results are comparable
with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

#: every fixture table (TESTDATA.md); one parquet file per table.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "dataworks_spark", cpus: int | None = None) -> SparkSession:
    """Create (or get) the engine SparkSession.

    At cluster scale the same settings apply; only ``master`` changes.
    AQE is load-bearing for the 100 TB design: runtime skew-join
    splitting and post-shuffle coalescing replace hand-tuned partition
    counts.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", os.environ.get("SPARK_GRAFT_AQE", "true"))
        # Byte-based advisory coalescing (parallelismFirst=false, the
        # setting Spark's own docs recommend) with the advisory size
        # tuned to PER-PARTITION WORK, not the 64 MB scan-oriented
        # default. Two measurements drove this: (a) with the 64 MB
        # default, byte-small but CPU-heavy post-shuffle stages — the
        # n-gram pair explosion shuffles ~MBs of longs then expands
        # them combinatorially — collapsed to 1-2 partitions and ran
        # the whole explosion on one core (12 s vs 1.5 s at sf0.1),
        # which is why earlier rounds kept parallelismFirst=true;
        # (b) with a 1 MB advisory, those same kernels KEEP their
        # parallelism (1 MB of compressed shingle longs ≈ 50-100 ms of
        # pair work — a healthy task), while the dozens of tiny
        # aggregates in a mixed workload stop paying 32 reducer tasks
        # for 100 KB shuffles (measured ~12% off a 12-query mixed
        # subset, no kernel regressions). The advisory size is a
        # deployment knob (SPARK_GRAFT_ADVISORY): the 1m default is
        # sized for this engine's compute-dense kernels; a cluster
        # deployment doing scan-heavy work at 100 TB should raise it
        # (64-256m) the same way it raises shuffle.partitions.
        # Codegen class cache sized to the engine's whole query set
        # (static conf; default 100 entries). The bench's round-robin
        # rounds — and any resident engine serving a mixed workload —
        # cycle through ~70 queries × several codegen stages between
        # two executions of the same plan; at the default size every
        # re-execution pays full janino recompilation (~50-200 ms per
        # stage — measured 27.4 s → 18.8 s steady total across the
        # query set when raised). Generated classes are small; 10k
        # entries is a few hundred MB ceiling against a 24g heap.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "1m"),
        )
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[32] puts driver + all executor threads + every cached
        # table + accumulated localCheckpoint blocks in ONE heap; 8g
        # produced intermittent multi-second full-GC stalls on heavy
        # kernels mid-bench (the image has 128 GiB — headroom is free)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_shipped_ctx: set[str] = set()
_pkg_zip_path: str | None = None
_ns_probe_cache: dict[tuple[str, str], bool] = {}


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make ``dataworks_spark`` importable on executor Python workers.

    Cloudpickle serializes NESTED functions by value but references to
    MODULE-LEVEL functions by name — an executor-side kernel that calls
    a helper from this package (the Arrow MinHash XXH64 primitives, the
    baseline-JPEG decoder) therefore needs the package on the worker's
    sys.path. That holds when the driver runs from the repo root (the
    worker inherits the cwd) but NOT for an embedding harness running
    from elsewhere — the exact driver-contract shape, where the failure
    is a task-time ``ModuleNotFoundError: dataworks_spark``.

    Idempotent per SparkContext, keyed by ``applicationId`` — NOT by
    ``id(sc)``, which CPython reuses after a stopped context is GC'd,
    silently skipping the ship on the replacement context (r11
    review). The zip is built once per PROCESS and reused across
    contexts (rebuilding per context leaked one tempfile each).
    ``addPyFile`` ships a few hundred KB of metadata with the
    application — the same mechanism any PySpark deployment uses for
    its own code; executors that can already import the package just
    gain a redundant sys.path entry with identical code."""
    global _pkg_zip_path
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _shipped_ctx:
        return
    if _pkg_zip_path is None or not os.path.exists(_pkg_zip_path):
        import tempfile
        import zipfile

        import dataworks_spark

        pkg_dir = os.path.dirname(os.path.abspath(dataworks_spark.__file__))
        fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="dataworks_spark_pkg_")
        os.close(fd)
        with zipfile.ZipFile(zpath, "w") as z:
            for root, dirs, files in os.walk(pkg_dir):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        _pkg_zip_path = zpath
    sc.addPyFile(_pkg_zip_path)
    _shipped_ctx.add(key)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _ts_is_nanos(path: str, spark: SparkSession | None = None) -> bool:
    """True iff the parquet footer declares a timestamp[ns] ``ts``
    column. Local paths use a pyarrow footer probe (one footer read, no
    Spark job). NON-local paths (hdfs://, s3a://, …) can't be read by
    local pyarrow — for those, Spark's own schema inference is the
    probe: with ``nanosAsLong`` unset Spark REJECTS ns-typed parquet at
    analysis ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,…))"), and
    that rejection is exactly the ns signal (r10 ADVICE: the os.path
    probe read every remote table as 'not nanos', so a remote ns-era
    events table failed analysis with the conf never flipped). Fails
    closed on any other error so the legacy conf is never flipped
    speculatively."""
    remote = "://" in path and not path.startswith("file:")
    if remote and spark is not None:
        # keyed by (applicationId, path), NOT path alone: a False can
        # mean "conf already set in the probing session", and a LATER
        # fresh session in this process reading the same path must
        # re-probe or it never flips nanosAsLong and fails analysis
        # (r12 ADVICE low)
        key = (spark.sparkContext.applicationId, path)
        if key in _ns_probe_cache:
            return _ns_probe_cache[key]
        conf_set = (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            == "true"
        )
        try:
            # one remote schema inference per PATH per session — the
            # probe result is memoized because load_table immediately
            # re-reads the same path for real and a remote listing is
            # the expensive part (r11 review)
            spark.read.parquet(path).schema
            out = False  # schema inferred fine — not ns (or conf already set)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            out = "NANOS" in msg or "nanosAsLong" in msg
        if not (out is False and conf_set):
            # a False observed WITH the conf set is ambiguous (the conf
            # masks the ns rejection) — don't memoize it, so the probe
            # re-runs if the conf is ever unset in this session
            _ns_probe_cache[key] = out
        return out
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            inner = [n for n in os.listdir(path) if n.endswith(".parquet")]
            if not inner:
                return False
            target = os.path.join(path, inner[0])
        field = pq.read_schema(target).field("ts")
        return pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    except Exception:  # noqa: BLE001 — unknown layout: don't flip the conf
        return False


#: session-global fingerprint provider seam (r15, r14 VERDICT #5).
#: ``None`` → the FS-metadata fold below. Deployments on transactional
#: tables (Delta/Iceberg) install a callable ``(spark, path) ->
#: snapshot_id | None`` via :func:`set_fingerprint_provider`; a
#: non-None snapshot id replaces the O(#files) listing with the
#: format's own version probe (one catalog/log read) while every
#: consumer — the query-layer memos, the ANN sidecars, the durable
#: ``_dw_meta.json`` stamps — keeps the exact same stale-detection
#: contract. Returning None for a path (e.g. a plain-parquet table in
#: a mixed deployment) falls through to the FS fold.
_FINGERPRINT_PROVIDER = None


def set_fingerprint_provider(provider):
    """Install (or clear, with ``None``) the snapshot-id fingerprint
    provider consulted by :func:`table_fingerprint`. Returns the
    previous provider so tests/scoped callers can restore it."""
    global _FINGERPRINT_PROVIDER
    prev = _FINGERPRINT_PROVIDER
    _FINGERPRINT_PROVIDER = provider
    return prev


def table_fingerprint(
    spark: SparkSession, path: str, snapshot_id=None
) -> str:
    """Cheap content fingerprint of a table path — the cache/sidecar
    key that makes every train-once artifact stale-proof by
    construction (r13 VERDICT #1): an MD5 fold of every data file's
    (relative path, length, modification time) under ``path``.

    Scale shape: this is a FileSystem LISTING, the same metadata op
    scan planning already performs — O(#files) namenode/object-store
    RPCs, zero data reads — routed through the Hadoop FS API so
    s3a://, hdfs://, … resolve like the other durable-path probes in
    this repo (streaming/rollup.py:_fs, docs/sink.py). Entries with any
    hidden/underscore PATH COMPONENT (_SUCCESS, .crc, _epochs/…,
    _dw_meta.json) are skipped — the same visibility rule Spark's own
    readers apply — so engine metadata toggles without changing the
    data fingerprint. Including mtime is deliberately CONSERVATIVE — a
    byte-identical rewrite changes the fingerprint and forces a
    retrain, which costs a bounded training job; the inverse failure
    (serving centroids trained on rows that no longer exist) corrupts
    every downstream dedup/ANN answer silently. Known blind spot
    (r14 ADVICE): on filesystems with coarse (1 s) mtime granularity an
    in-place SAME-SIZE rewrite of a file that keeps its name within the
    same second fingerprints identically. Spark/Hadoop writers are safe
    (part-file names carry fresh UUIDs every job), as are object stores
    (immutable objects); only a non-Spark writer that rewrites files
    in place under a stable name can hit it — such deployments should
    install a snapshot provider (below) or key on a content checksum.

    Transactional tables (Delta/Iceberg) get the cheaper exact probe
    through either seam (r14 VERDICT #5): pass ``snapshot_id=`` per
    call, or install a session-global provider via
    :func:`set_fingerprint_provider` — a non-None snapshot/version id
    is folded into the same hex-key space and replaces the listing."""
    import hashlib

    if snapshot_id is None and _FINGERPRINT_PROVIDER is not None:
        snapshot_id = _FINGERPRINT_PROVIDER(spark, path)
    if snapshot_id is not None:
        return hashlib.md5(f"snapshot\x00{snapshot_id}".encode()).hexdigest()
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        raise FileNotFoundError(f"cannot fingerprint missing table path: {path}")
    base = fs.getFileStatus(p).getPath().toString()
    entries = []
    it = fs.listFiles(p, True)  # recursive: parquet dirs nest partitions
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toString()
        rel = rel[len(base):] if rel.startswith(base) else rel
        if any(c.startswith((".", "_")) for c in rel.split("/") if c):
            continue
        entries.append(f"{rel}\x00{st.getLen()}\x00{st.getModificationTime()}")
    entries.sort()  # listing order is FS-dependent; the fold must not be
    return hashlib.md5("\x01".join(entries).encode()).hexdigest()


#: durable-table fingerprint stamp filename (r15, r14 VERDICT #2).
#: Underscore-prefixed: invisible to parquet readers AND to the
#: fingerprint fold above, so stamping never perturbs the fingerprint
#: it records.
TABLE_META_NAME = "_dw_meta.json"


def write_table_meta(spark: SparkSession, path: str, extra: dict | None = None) -> str:
    """Stamp ``<path>/_dw_meta.json`` with the table's CURRENT data
    fingerprint (plus any ``extra`` fields) — the durable-state face of
    the r14 sidecar contract (similarity.py ``_check_sidecar_fingerprint``):
    an engine-managed table (streaming rollup, compacted doc store)
    records what its files looked like when the engine last wrote them,
    so a later reopen can detect out-of-band mutation instead of
    trusting the path. Atomic create-then-rename through the Hadoop FS
    API (scheme-correct on s3a://, hdfs://, …). Cost: ONE recursive
    listing per stamp/verify — the same metadata op the parquet
    reader's file index performs on every open, so the gate at most
    doubles per-epoch metadata cost and adds zero data reads;
    transactional-table deployments skip the listing entirely via the
    snapshot provider seam (:func:`set_fingerprint_provider`). Returns
    the stamped fingerprint."""
    import json

    fp = table_fingerprint(spark, path)
    jvm = spark._jvm
    base = path.rstrip("/")
    fs = jvm.org.apache.hadoop.fs.Path(base).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{base}/.{TABLE_META_NAME}.{os.getpid()}.tmp"
    )
    meta = jvm.org.apache.hadoop.fs.Path(f"{base}/{TABLE_META_NAME}")
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps({"fingerprint": fp, **(extra or {})}).encode()))
    out.close()
    fs.delete(meta, False)  # HDFS rename refuses an existing destination
    fs.rename(tmp, meta)
    return fp


def read_table_meta(spark: SparkSession, path: str) -> dict | None:
    """The parsed ``_dw_meta.json`` stamp under ``path``, or None if the
    table was never stamped (pre-r15 layout, or foreign data)."""
    import json

    jvm = spark._jvm
    meta = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{TABLE_META_NAME}")
    fs = meta.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(meta):
        return None
    stream = fs.open(meta)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(raw.decode())


def save_artifact_table(
    df: DataFrame,
    path: str,
    source_fingerprint: str | None = None,
    writer: str = "artifact",
) -> None:
    """Persist a derived train-once relation (MinHash/SimHash sketch
    table, winnow postings, any ingest-time asset) as a
    fingerprint-guarded sidecar: parquet at ``path`` plus the
    ``_dw_meta.json`` stamp carrying the files' own fingerprint
    (tamper evidence) and ``source_fingerprint`` — the fingerprint of
    the table the artifact was DERIVED from — so a later load can
    refuse artifacts whose source moved (r15; the generic form of the
    LshIndex/IvfIndex sidecar contract)."""
    df.write.mode("overwrite").parquet(path)
    extra = {"writer": writer}
    if source_fingerprint is not None:
        extra["source_fingerprint"] = source_fingerprint
    write_table_meta(df.sparkSession, path, extra=extra)


def load_artifact_table(
    spark: SparkSession,
    path: str,
    expect_fingerprint: str | None = None,
    what: str = "artifact table",
) -> DataFrame:
    """Reopen a :func:`save_artifact_table` sidecar. File-level tamper
    always refuses (``_dw_meta.json`` check). ``expect_fingerprint``
    (the CURRENT source-table fingerprint) additionally enforces the
    staleness contract: a mismatch — or a sidecar with no recorded
    source fingerprint — refuses, because unverifiable counts as stale
    (an artifact derived from data that no longer exists silently
    corrupts every downstream answer). ``None`` skips the staleness
    check (legacy trust-the-path)."""
    meta = verify_table_meta(spark, path, what=what) or {}
    if expect_fingerprint is not None and meta.get("source_fingerprint") != expect_fingerprint:
        raise ValueError(
            f"stale index: {what} at {path} was built from source "
            f"fingerprint {meta.get('source_fingerprint')}, caller expects "
            f"{expect_fingerprint}; rebuild and re-save the artifact "
            "(unverifiable sidecars count as stale)"
        )
    return spark.read.parquet(path)


def verify_table_meta(spark: SparkSession, path: str, what: str = "table") -> dict | None:
    """Read-back gate for engine-managed durable tables: recompute the
    data fingerprint and compare against the ``_dw_meta.json`` stamp.
    Mismatch ⇒ the files changed OUTSIDE the engine since the last
    engine write — refuse loudly (merging/serving silently would
    corrupt every downstream answer, the exact failure mode the ANN
    sidecars refuse). A missing stamp is accepted (None returned):
    legacy tables and foreign parquet stay readable; they simply carry
    no tamper evidence yet. Returns the verified stamp dict."""
    meta = read_table_meta(spark, path)
    if meta is None:
        return None
    fp = table_fingerprint(spark, path)
    if fp != meta.get("fingerprint"):
        raise RuntimeError(
            f"{what} at {path} changed outside the engine since its last "
            f"engine write (stamped fingerprint {meta.get('fingerprint')}, "
            f"current {fp}). Refusing to read: out-of-band edits make the "
            "stored state unreconstructable (rollup partials would "
            "double-count or drop; doc-store versions would lie). Rebuild "
            "the table through the engine, or delete "
            f"{TABLE_META_NAME} to accept the files as a new baseline."
        )
    return meta


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan (SURVEY §2 A8): Catalyst pushes filters and
    prunes columns, so callers should express predicates declaratively
    rather than pre-materializing.

    ``events.ts`` is normalized to session-UTC ``TimestampType`` whatever
    the physical parquet type, mirroring the reference's consume-time
    coercion (utils/time.clj:11-86 accepts every wire representation and
    yields one Instant):

    - ``timestamp[ns]`` → read nanos-as-long, floor to micros (same
      truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so
      oracle comparisons stay exact);
    - ``timestamp[us]`` (no tz → Spark TIMESTAMP_NTZ) → cast to
      TIMESTAMP — exact under the UTC session timezone;
    - ``timestamp[us, tz=...]`` (Spark TIMESTAMP) → already normalized.

    Without this, downstream epoch math (``unix_millis`` in window
    frames / sessionization) fails analysis on NTZ inputs. Other tables'
    date-ish columns (o_orderdate, l_shipdate) deliberately stay NTZ:
    literal comparisons on them are exact and push down to the parquet
    scan, and a cast wrapper would block that pushdown.

    The ``nanosAsLong`` legacy conf is SESSION-GLOBAL; it is flipped
    only when the events footer actually carries timestamp[ns] (the
    r1-r2 fixture era), never as a blanket side effect of every table
    load — previously ANY load_table changed how every later parquet
    read in the session decoded ns timestamps (r10 review)."""
    path = table_path(sf_dir, name)
    if name == "events" and _ts_is_nanos(path, spark):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
