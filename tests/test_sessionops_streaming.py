"""Stream ≡ batch for the phase-8 sessionops library (r12).

``latest_state`` is a plain struct-MAX aggregation, so the SAME library
call runs unchanged on a streaming DataFrame — complete-mode output after
consuming all micro-batches must equal the batch call on the same data
(state is key-cardinality-bounded, which is what justifies complete mode
here). This is the CDC latest-wins compaction running live: a change
stream folded into current state with no separate streaming code path.

``sessionize`` (two window passes) is NOT streamable as written — its
streaming twin is F.session_window, covered by
tests/test_streaming.py::test_sessionized_stats_stream_converges_to_batch.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from yelpdatawarehouse_spark.operators import sessionops

SCHEMA = StructType([
    StructField("sensor", StringType()),
    StructField("at", TimestampType()),
    StructField("seq", LongType()),
    StructField("reading", StringType()),
])


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


ROWS = [
    # s1's latest lands in batch 1, then batch 2 delivers an OLDER row —
    # the fold must keep the max, not the last-arrived
    ("s1", _ts("2024-01-02 00:00:00"), 2, "warm"),
    ("s1", _ts("2024-01-01 00:00:00"), 1, "cold"),
    # s2: equal timestamps across batches, seq tie-break decides
    ("s2", _ts("2024-01-01 00:00:00"), 7, "a"),
    ("s2", _ts("2024-01-01 00:00:00"), 9, "b"),
    # s3 appears only in the final batch
    ("s3", _ts("2024-01-03 00:00:00"), 1, "new"),
]


def _compact(df):
    return sessionops.latest_state(
        df, keys=("sensor",), order_cols=("at", "seq"),
        payload_cols=("reading",), struct_col="last",
    ).select("sensor", "last.at", "last.seq", "last.reading")


def test_latest_state_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "cdc")
    for i, lo in enumerate(range(0, len(ROWS), 2)):
        spark.createDataFrame(ROWS[lo:lo + 2], SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(src, f"chunk{i}"))

    stream = spark.readStream.schema(SCHEMA).parquet(
        os.path.join(src, "chunk*"))
    q = (
        _compact(stream)
        .writeStream.format("memory")
        .queryName("latest_state_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_latest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM latest_state_stream").collect()))

    batch = spark.read.schema(SCHEMA).parquet(os.path.join(src, "chunk*"))
    want = sorted(map(tuple, _compact(batch).collect()))
    assert got == want
    assert [r[0] for r in got] == ["s1", "s2", "s3"]
    by_key = {r[0]: r for r in got}
    # out-of-order arrival kept the max, tie broke on seq
    assert by_key["s1"][3] == "warm" and by_key["s2"][2] == 9


def test_latest_state_stream_restart_resumes(spark, tmp_path):
    """Crash-safety shape: consume chunk0 only, stop, add chunk1, restart
    from the SAME checkpoint — the folded state must equal the batch
    compaction of everything (no double-count, no loss)."""
    src = str(tmp_path / "cdc2")
    os.makedirs(src)
    spark.createDataFrame(ROWS[:2], SCHEMA).coalesce(1).write.parquet(
        os.path.join(src, "chunk0"))

    def run_once(name):
        stream = spark.readStream.schema(SCHEMA).parquet(
            os.path.join(src, "chunk*"))
        q = (
            _compact(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_restart"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once("latest_restart_a")
    spark.createDataFrame(ROWS[2:], SCHEMA).coalesce(1).write.parquet(
        os.path.join(src, "chunk1"))
    run_once("latest_restart_b")

    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM latest_restart_b").collect()))
    batch = spark.read.schema(SCHEMA).parquet(os.path.join(src, "chunk*"))
    want = sorted(map(tuple, _compact(batch).collect()))
    assert got == want and len(got) == 3
