"""transformWithStateInPandas (streaming/pipeline.stateful_user_summary_tws):
the Spark 4.1 stateful API must produce exactly the running aggregates of
the batch rebuild — the same convergence invariant the suite already pins
for the applyInPandasWithState twin (test_streaming.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.sources.tables import table
from yelpdatawarehouse_spark.streaming.pipeline import (
    batch_user_summary,
    event_file_stream,
    stateful_user_summary_tws,
)

SF = "/root/testdata/sf0.001"


def _protobuf_available() -> bool:
    """transformWithState's Python driver worker speaks protobuf to the
    JVM (StatefulProcessorHandle state server). Probe the exact import it
    performs; this container ships a broken google.protobuf, so the leg
    is optional here the same way delta/PIL legs are (test_merge,
    test_multimodal)."""
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf unavailable: transformWithState runner cannot start",
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_provider(spark):
    """transformWithState requires the RocksDB provider; restore the
    session's previous provider afterwards so other streaming tests keep
    their default."""
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(_PROVIDER_CONF)
    else:
        spark.conf.set(_PROVIDER_CONF, prev)


def test_tws_converges_to_batch(spark, tmp_path, rocksdb_provider):
    src = tmp_path / "incoming"
    src.mkdir()
    ev = table(spark, SF, "events")
    for i in range(3):
        chunk = ev.filter(F.col("event_id") % 3 == i).toPandas()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        chunk.to_json(src / f"chunk_{i}.json", orient="records", lines=True)

    q = (
        stateful_user_summary_tws(event_file_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("tws_summary")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    updates = spark.sql("SELECT * FROM tws_summary").collect()
    assert updates, "stream emitted no rows"
    last: dict = {}
    for r in updates:
        if r["user_id"] not in last or r["event_cnt"] > last[r["user_id"]]["event_cnt"]:
            last[r["user_id"]] = r
    got = {
        uid: (r["event_cnt"], round(r["value_sum"], 6), round(r["value_avg"], 6))
        for uid, r in last.items()
    }
    want = {
        r["user_id"]: (r["event_cnt"], round(r["value_sum"], 6), round(r["value_avg"], 6))
        for r in batch_user_summary(table(spark, SF, "events")).collect()
    }
    assert got == want
