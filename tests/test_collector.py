"""HTTP collector shim tests (SURVEY §2 A6, §3.2): POST → spool →
streaming source → document store."""

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from dataworks_spark.docs.sink import DocStoreSink
from dataworks_spark.docs.store import DocumentStore
from dataworks_spark.streaming.collector import CollectorServer


def _post(url: str, doc: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(doc).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_collector_post_to_stream_to_docstore(spark, tmp_path):
    """The demo-app flow (doc/demo-app-1.org:87-129): POST a log doc →
    collector spool → streaming ingest → bitemporal store."""
    srv = CollectorServer(str(tmp_path / "spool")).start()
    try:
        srv.register("applog")
        url = f"http://127.0.0.1:{srv.port}/applog"
        for i, (uid, val) in enumerate([(1, 10.0), (2, 20.0), (1, 30.0)]):
            out = _post(url, {"user_id": uid, "value": val, "ts": f"2024-01-0{i+1}T00:00:00Z"})
            assert out["status"] == "accepted"

        schema = "user_id long, value double, ts timestamp"
        empty = spark.createDataFrame(
            [],
            "id string, user_id long, value double, valid_from timestamp, "
            "valid_to timestamp, tx_from timestamp, tx_to timestamp, deleted boolean",
        )
        sink = DocStoreSink(
            DocumentStore(empty),
            id_col=F.concat(F.lit("app/"), F.col("user_id").cast("string")),
            ts_col="ts",
        )
        q = sink.attach(srv.stream(spark, "applog", schema), str(tmp_path / "ck"))
        q.processAllAvailable()

        # a late POST lands in the next micro-batch (hot path stays up)
        _post(url, {"user_id": 2, "value": 40.0, "ts": "2024-01-09T00:00:00Z"})
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

        latest = {r.id: r.value for r in sink.store.latest().collect()}
        assert latest == {"app/1": 30.0, "app/2": 40.0}  # LWW per doc id
    finally:
        srv.stop()


def test_collector_unknown_path_404_and_bad_json_400(tmp_path):
    srv = CollectorServer(str(tmp_path / "spool")).start()
    try:
        srv.register("known")
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://127.0.0.1:{srv.port}/nope", {})
        assert e.value.code == 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/known", data=b"{not json"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
        # hot-remove (atomic-routes swap analog)
        srv.unregister("known")
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://127.0.0.1:{srv.port}/known", {})
        assert e.value.code == 404
    finally:
        srv.stop()


def test_udaf_registry(spark):
    """K5: grouped-aggregate pandas UDAF through the registry."""
    import numpy as np

    from dataworks_spark.registry.transformers import TransformerRegistry

    reg = TransformerRegistry(spark)
    reg.register_pandas_agg("geo_mean", lambda s: float(np.exp(np.log(s).mean())), "double")
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", 4.0), ("b", 9.0)], "k string, v double"
    )
    out = {r.k: r.gm for r in reg.apply_agg(df, "geo_mean", "gm", ["k"], "v").collect()}
    assert abs(out["a"] - 10.0) < 1e-9 and abs(out["b"] - 6.0) < 1e-9
