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


@pytest.mark.parametrize("how", ["inner", "full_outer"])
def test_join_state_buffers_both_sides(spark, tmp_path, how):
    """Stream-stream join state is inspectable per side: with no
    watermark-driven eviction yet (no late sentinel has advanced it), the
    LEFT buffer holds every impression seen and the RIGHT every
    conversion — the exact rows a "why is this join's state growing"
    production investigation needs to see. Parametrized over inner and
    full_outer: the per-side buffers (and their eviction bounds) are
    join-mode-independent — outer modes change what is EMITTED at
    eviction, not what is retained."""
    import os as _os

    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.sources.tables import table
    from yelpdatawarehouse_spark.streaming.introspect import (
        state_operator_metadata,
        state_rows,
    )
    from yelpdatawarehouse_spark.streaming.pipeline import (
        event_file_stream,
        shape_conversions,
        shape_impressions,
        stream_stream_attribution,
    )

    SF = "/root/testdata/sf0.001"
    ev = table(spark, SF, "events")
    imp_src, conv_src = tmp_path / "imps", tmp_path / "convs"
    imp_src.mkdir()
    conv_src.mkdir()
    for df, src in (
        (ev.filter(F.col("event_type") == "view"), imp_src),
        (ev.filter(F.col("event_type") == "purchase"), conv_src),
    ):
        pdf = df.toPandas().sort_values("ts").reset_index(drop=True)
        pdf["ts"] = pdf["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        path = src / "chunk_0.json"
        pdf.to_json(path, orient="records", lines=True)
        _os.utime(path, (1_700_000_000, 1_700_000_000))

    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_stream_attribution(
            shape_impressions(
                event_file_stream(spark, str(imp_src)).withColumn(
                    "event_type", F.lit("view")
                )
            ),
            shape_conversions(
                event_file_stream(spark, str(conv_src)).withColumn(
                    "event_type", F.lit("purchase")
                )
            ),
            how=how,
        )
        .writeStream.format("memory")
        .queryName(f"join_state_probe_{how}")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    meta = {r.operatorName for r in state_operator_metadata(spark, ckpt).collect()}
    assert any("symmetricHashJoin" in m or "Join" in m for m in meta), meta

    left = state_rows(spark, ckpt, join_side="left")
    right = state_rows(spark, ckpt, join_side="right")
    buffered_imps = {r["value"]["imp_id"] for r in left.collect()}
    buffered_convs = {r["value"]["conv_id"] for r in right.collect()}
    views = ev.filter(F.col("event_type") == "view")
    purch = ev.filter(F.col("event_type") == "purchase")
    want_imps = {r.event_id for r in views.collect()}
    want_convs = {r.event_id for r in purch.collect()}
    # eviction already ran inside the availableNow run (watermark = max ts
    # - 12h): buffers must be a NON-EMPTY SUBSET of each input...
    assert buffered_imps and buffered_imps <= want_imps
    assert buffered_convs and buffered_convs <= want_convs
    # ...and rows the watermark cannot have released yet must still be
    # buffered: an impression joins conversions in [i_ts, i_ts + 24h), so
    # anything within 36h of the stream's end is provably retained
    import datetime as _dt

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    must_keep = {
        r.event_id
        for r in views.filter(
            F.col("ts") > F.lit(max_ts - _dt.timedelta(hours=36))
        ).collect()
    }
    assert must_keep <= buffered_imps
    # the state reader sees strictly fewer rows than the raw input when
    # eviction has happened — the "is my state bounded" production check
    assert len(buffered_imps) < len(want_imps)
