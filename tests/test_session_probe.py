"""The non-local (hdfs://, s3a://) branch of session._ts_is_nanos,
exercised with a duck-typed session double (VERDICT r11 #6: the remote
branches exist for object-store correctness but every test ran on local
paths; ADVICE r11 low: the probe cache must not pin a conf-masked False
across sessions)."""

import dataworks_spark.session as S

NS_ERR = (
    "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,false)); consider "
    "spark.sql.legacy.parquet.nanosAsLong"
)


class _FakeReader:
    def __init__(self, sess):
        self._sess = sess

    def parquet(self, path):
        self._sess.probe_calls += 1
        if self._sess.raises_nanos and not self._sess.confs.get(
            "spark.sql.legacy.parquet.nanosAsLong"
        ) == "true":
            raise Exception(NS_ERR)

        class _Schemaed:
            schema = "struct<ts:long>"

        return _Schemaed()


class _FakeConf:
    def __init__(self, sess):
        self._sess = sess

    def get(self, k, default=None):
        return self._sess.confs.get(k, default)

    def set(self, k, v):
        self._sess.confs[k] = v


class _FakeSC:
    def __init__(self, app_id):
        self.applicationId = app_id


class FakeSession:
    """Just enough surface for _ts_is_nanos' remote branch: reading an
    ns-typed remote table raises the NANOS analysis error unless the
    legacy conf is set — exactly Spark's observable behavior."""

    def __init__(self, app_id, raises_nanos):
        self.sparkContext = _FakeSC(app_id)
        self.raises_nanos = raises_nanos
        self.confs = {}
        self.probe_calls = 0
        self.read = _FakeReader(self)
        self.conf = _FakeConf(self)


def _clear_cache():
    S._ns_probe_cache.clear()


def test_remote_ns_table_probes_true_and_memoizes():
    _clear_cache()
    sess = FakeSession("app-1", raises_nanos=True)
    path = "hdfs://nn/warehouse/events.parquet"
    assert S._ts_is_nanos(path, sess) is True
    assert S._ts_is_nanos(path, sess) is True
    assert sess.probe_calls == 1  # memoized per (appId, path)


def test_remote_us_table_probes_false_and_memoizes():
    _clear_cache()
    sess = FakeSession("app-1", raises_nanos=False)
    path = "s3a://bucket/events.parquet"
    assert S._ts_is_nanos(path, sess) is False
    assert S._ts_is_nanos(path, sess) is False
    assert sess.probe_calls == 1


def test_conf_masked_false_is_not_cached():
    """With nanosAsLong already set, inference succeeds on an ns table —
    that False is ambiguous and must NOT be memoized, so the probe
    re-runs (and flips to True) once the conf is unset."""
    _clear_cache()
    sess = FakeSession("app-1", raises_nanos=True)
    sess.confs["spark.sql.legacy.parquet.nanosAsLong"] = "true"
    path = "hdfs://nn/events.parquet"
    assert S._ts_is_nanos(path, sess) is False  # masked — reads work anyway
    assert S._ns_probe_cache == {}
    del sess.confs["spark.sql.legacy.parquet.nanosAsLong"]
    assert S._ts_is_nanos(path, sess) is True
    assert sess.probe_calls == 2


def test_fresh_session_reprobes_same_path():
    """The r11 bug shape: session A (conf set) cached False for a path;
    a FRESH session in the same process must re-probe, not inherit the
    masked result."""
    _clear_cache()
    a = FakeSession("app-A", raises_nanos=True)
    a.confs["spark.sql.legacy.parquet.nanosAsLong"] = "true"
    path = "hdfs://nn/events.parquet"
    assert S._ts_is_nanos(path, a) is False
    b = FakeSession("app-B", raises_nanos=True)  # fresh session, conf unset
    assert S._ts_is_nanos(path, b) is True
    assert b.probe_calls == 1


def test_local_paths_never_hit_remote_branch(tmp_path):
    _clear_cache()
    sess = FakeSession("app-1", raises_nanos=True)
    missing = str(tmp_path / "nope.parquet")
    assert S._ts_is_nanos(missing, sess) is False  # pyarrow branch, fails closed
    assert sess.probe_calls == 0
