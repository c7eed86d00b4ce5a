"""No-broker coverage for the Kafka source leg (VERDICT r9 #8).

The container has neither a Kafka broker nor the spark-sql-kafka connector
jar, so ``kafka_event_stream`` can't run end-to-end here. What CAN be
pinned without a connection:

* the option map itself (brokers/subscribe/startingOffsets) — previously
  the one untested string in the streaming stack;
* the decode plan, exercised on a BATCH frame with the exact Kafka wire
  schema (binary key/value, topic/partition/offset/timestamp metadata) —
  DataFrame transformations are source-agnostic, so this is the same plan
  the streaming leg runs;
* the failure mode at the connector boundary: building the real stream
  must fail ONLY because the kafka data source is absent, proving the
  option assembly executes all the way to ``.load()``.
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import types as S

from yelpdatawarehouse_spark.streaming.pipeline import (
    decode_kafka_events,
    kafka_event_stream,
    kafka_source_options,
)

# The wire schema every Kafka source batch carries (Spark docs, Structured
# Streaming + Kafka integration guide).
KAFKA_WIRE_SCHEMA = S.StructType(
    [
        S.StructField("key", S.BinaryType()),
        S.StructField("value", S.BinaryType()),
        S.StructField("topic", S.StringType()),
        S.StructField("partition", S.IntegerType()),
        S.StructField("offset", S.LongType()),
        S.StructField("timestamp", S.TimestampType()),
        S.StructField("timestampType", S.IntegerType()),
    ]
)


def test_kafka_source_options_land():
    opts = kafka_source_options("broker1:9092,broker2:9092", "events,checkins")
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events,checkins"
    assert opts["startingOffsets"] == "earliest"
    assert kafka_source_options("b:9092", "t", "latest")["startingOffsets"] == "latest"


def test_decode_kafka_events_on_wire_frame(spark):
    good = json.dumps(
        {"event_id": 7, "ts": "2024-03-01T10:00:00", "user_id": 42,
         "event_type": "view", "value": 1.5, "props": "{}"}
    ).encode()
    rows = [
        (b"k1", good, "events", 0, 100,
         datetime.datetime(2024, 3, 1, 10, 0, 1), 0),
        (None, b"not json at all", "events", 0, 101,
         datetime.datetime(2024, 3, 1, 10, 0, 2), 0),
    ]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    out = decode_kafka_events(raw)
    assert out.columns == ["topic", "event_id", "ts", "user_id",
                           "event_type", "value", "props"]
    got = {r["event_id"]: r for r in out.collect()}
    assert got[7]["user_id"] == 42 and got[7]["event_type"] == "view"
    assert got[7]["topic"] == "events"
    assert None in got  # malformed value -> null event columns, row kept


def test_kafka_stream_fails_only_at_connector_boundary(spark):
    """Option assembly + format selection execute all the way to .load();
    in this container the ONLY acceptable failure is the missing kafka
    data source (if a connector jar ever appears, the stream must build)."""
    try:
        df = kafka_event_stream(spark, "localhost:9092", "events")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        assert "kafka" in msg.lower() and (
            "Failed to find" in msg or "FAILED_TO_LOAD" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ), f"unexpected failure class: {msg[:500]}"
    else:
        assert df.isStreaming
        assert df.columns == ["topic", "event_id", "ts", "user_id",
                              "event_type", "value", "props"]
