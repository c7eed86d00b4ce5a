"""State data source (streaming/introspect.py): the checkpoint's internal
key/value state, read back as a batch DataFrame, must agree exactly with
the batch equivalent of the streaming aggregation — the strongest possible
check that the reader surfaces the REAL buffers, not a reconstruction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.sources.tables import table
from yelpdatawarehouse_spark.streaming.introspect import (
    state_operator_metadata,
    state_partition_profile,
    state_rows,
)
from yelpdatawarehouse_spark.streaming.pipeline import (
    event_file_stream,
    windowed_type_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def windowed_ckpt(spark, tmp_path_factory):
    """Run the windowed-counts stream over the full events table (3 file
    chunks -> 3 micro-batches) and hand back its checkpoint dir."""
    tmp = tmp_path_factory.mktemp("state_introspect")
    src = tmp / "incoming"
    src.mkdir()
    ev = table(spark, SF, "events")
    for i in range(3):
        chunk = ev.filter(F.col("event_id") % 3 == i).toPandas()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        chunk.to_json(src / f"chunk_{i}.json", orient="records", lines=True)
    ckpt = str(tmp / "ckpt")
    q = (
        windowed_type_counts(event_file_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("introspect_wc")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return ckpt


def test_metadata_lists_the_aggregation_operator(spark, windowed_ckpt):
    meta = state_operator_metadata(spark, windowed_ckpt).collect()
    assert len(meta) == 1
    row = meta[0]
    assert row["operatorId"] == 0
    assert row["numPartitions"] > 0
    assert row["maxBatchId"] >= row["minBatchId"] >= 0


def test_state_buffers_equal_batch_aggregation(spark, windowed_ckpt):
    """Flattened state (key.window.start, key.event_type, value.count,
    value.sum) == the batch groupBy over the same events."""
    st = state_rows(spark, windowed_ckpt).select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("event_cnt"),
        F.col("value.sum").alias("total_value"),
    )
    got = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], round(r["total_value"], 6))
        for r in st.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], round(r["total_value"], 6))
        for r in windowed_type_counts(table(spark, SF, "events")).collect()
    }
    assert got == want


def test_state_time_travel_first_batch_is_partial(spark, windowed_ckpt):
    """batchId=0 must expose strictly less accumulated state than the
    final batch (3 chunks streamed one per micro-batch), and its counts
    must equal the batch aggregation of chunk 0 alone."""
    first = state_rows(spark, windowed_ckpt, batch_id=0).select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("event_cnt"),
    )
    got = {
        (r["window_start"], r["event_type"]): r["event_cnt"] for r in first.collect()
    }
    ev0 = table(spark, SF, "events").filter(F.col("event_id") % 3 == 0)
    want = {
        (r["window_start"], r["event_type"]): r["event_cnt"]
        for r in windowed_type_counts(ev0).collect()
    }
    assert got == want
    last_n = state_rows(spark, windowed_ckpt).count()
    assert len(got) < last_n


def test_partition_profile_accounts_for_every_key(spark, windowed_ckpt):
    prof = state_partition_profile(spark, windowed_ckpt).collect()
    total_keys = sum(r["n_keys"] for r in prof)
    assert total_keys == state_rows(spark, windowed_ckpt).count()
    ratios = {r["global_skew_ratio"] for r in prof}
    assert len(ratios) == 1
    assert ratios.pop() >= 1.0
    for r in prof:
        assert r["n_keys"] > 0
