"""Streaming tests: the batch/stream convergence invariant (SURVEY §5.5).

Feed a deterministic event sequence through the streaming path in chunks,
then assert the incrementally maintained summary equals the batch rebuild
over the full input — the invariant the reference's consumer is supposed to
satisfy (streaming/consumer.py:417-441 vs init/mysql_loader.py:1080-1104)
but breaks with its read-modify-write running average.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.sources.tables import table
from yelpdatawarehouse_spark.streaming import (
    batch_user_summary,
    event_file_stream,
    read_summary,
    run_incremental_summary,
    windowed_type_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def event_chunks_dir(spark, tmp_path):
    """testdata events split into 3 JSON-lines files (micro-batch chunks)."""
    src = tmp_path / "incoming"
    src.mkdir()
    ev = table(spark, SF, "events")
    for i in range(3):
        chunk = ev.filter(F.col("event_id") % 3 == i).toPandas()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        chunk.to_json(src / f"chunk_{i}.json", orient="records", lines=True)
    return str(src)


def test_incremental_summary_converges_to_batch(spark, tmp_path, event_chunks_dir):
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state_dir)

    stream = event_file_stream(spark, event_chunks_dir)
    q = run_incremental_summary(spark, stream, state_dir, ckpt)
    q.awaitTermination(120)

    got = {
        r["user_id"]: (r["event_cnt"], round(r["value_sum"], 6), round(r["value_avg"], 6))
        for r in read_summary(spark, state_dir).collect()
    }
    want = {
        r["user_id"]: (r["event_cnt"], round(r["value_sum"], 6), round(r["value_avg"], 6))
        for r in batch_user_summary(table(spark, SF, "events")).collect()
    }
    assert got == want


def test_incremental_summary_is_restart_safe(spark, tmp_path, event_chunks_dir):
    """Second run over the same checkpoint must not double-count."""
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state_dir)

    q = run_incremental_summary(spark, event_file_stream(spark, event_chunks_dir), state_dir, ckpt)
    q.awaitTermination(120)
    first = {r["user_id"]: r["event_cnt"] for r in read_summary(spark, state_dir).collect()}

    # restart: same source, same checkpoint → no new batches → unchanged state
    q2 = run_incremental_summary(spark, event_file_stream(spark, event_chunks_dir), state_dir, ckpt)
    q2.awaitTermination(120)
    second = {r["user_id"]: r["event_cnt"] for r in read_summary(spark, state_dir).collect()}
    assert first == second


def test_stateful_operator_converges_to_batch(spark, tmp_path, event_chunks_dir):
    """applyInPandasWithState running aggregate: after all batches, the last
    update emitted per key equals the batch rebuild (arrival-order and
    batching independence — the property the reference's stored running
    average lacks, SURVEY §8)."""
    from yelpdatawarehouse_spark.streaming import stateful_user_summary

    stream = event_file_stream(spark, event_chunks_dir)
    q = (
        stateful_user_summary(stream)
        .writeStream.format("memory")
        .queryName("stateful_summary")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # memory sink in update mode appends every emitted update; the final
    # state per key is the row with the highest event_cnt
    updates = spark.sql("SELECT * FROM stateful_summary").collect()
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


def test_windowed_counts_stream_equals_batch(spark, tmp_path, event_chunks_dir):
    stream = event_file_stream(spark, event_chunks_dir)
    windowed = windowed_type_counts(stream)
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], round(r["total_value"], 6))
        for r in windowed_type_counts(table(spark, SF, "events")).collect()
    }
    assert got == want


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same event_id arriving in later
    micro-batches (within the watermark) is emitted exactly once."""
    import json

    from yelpdatawarehouse_spark.streaming import deduped_event_stream, event_file_stream

    src = tmp_path / "dup_src"
    src.mkdir()
    base = {"user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"}
    batch0 = [
        {"event_id": 1, "ts": "2024-01-01T10:00:00", **base},
        {"event_id": 2, "ts": "2024-01-01T10:01:00", **base},
        {"event_id": 1, "ts": "2024-01-01T10:00:00", **base},  # in-batch dup
    ]
    batch1 = [
        {"event_id": 2, "ts": "2024-01-01T10:01:00", **base},  # cross-batch dup
        {"event_id": 3, "ts": "2024-01-01T10:02:00", **base},
    ]
    for i, b in enumerate([batch0, batch1]):
        with open(src / f"b{i}.json", "w") as f:
            for e in b:
                f.write(json.dumps(e) + "\n")

    q = (
        deduped_event_stream(event_file_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_out").collect())
    assert ids == [1, 2, 3]


def test_sessionized_stats_stream_converges_to_batch(spark, tmp_path):
    """Append-mode session windows with watermark eviction must converge to
    the batch computation: time-ordered micro-batches stream in, a far-
    future sentinel event pushes the watermark past every real session,
    and the no-data flush batch emits them all finalized."""
    import os as _os
    import pandas as pd

    from yelpdatawarehouse_spark.streaming.pipeline import sessionized_stats

    src = tmp_path / "incoming_sess"
    src.mkdir()
    ev = table(spark, SF, "events")
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    sentinel_ts = pdf["ts"].max() + pd.Timedelta(days=30)
    chunks = [pdf.iloc[: len(pdf) // 3], pdf.iloc[len(pdf) // 3 : 2 * len(pdf) // 3],
              pdf.iloc[2 * len(pdf) // 3 :]]
    chunks.append(
        pd.DataFrame([{"event_id": 10**9, "ts": sentinel_ts, "user_id": 999999,
                       "event_type": "view", "value": 0.0, "props": "{}"}])
    )
    for i, chunk in enumerate(chunks):
        chunk = chunk.copy()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        path = src / f"chunk_{i}.json"
        chunk.to_json(path, orient="records", lines=True)
        _os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))  # order file pickup

    stream = event_file_stream(spark, str(src))
    q = (
        sessionized_stats(stream)
        .writeStream.format("memory")
        .queryName("sess_stats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def key(rows):
        return {
            (r["user_id"], r["session_start"].isoformat()): (
                r["n_events"],
                r["n_purchases"],
                round(r["total_value"], 6),
            )
            for r in rows
            if r["user_id"] != 999999
        }

    got = key(spark.table("sess_stats").collect())
    want = key(sessionized_stats(ev).collect())
    assert got == want and len(want) > 0


def test_stream_stream_interval_join_converges_to_batch(spark, tmp_path):
    """The watermarked view⋈purchase interval join over micro-batches must
    produce exactly the pairs the batch range join produces. Chunks are
    TIME-ordered: a watermark is a bounded-disorder contract, so state
    eviction is only correct for arrivals within the tolerance — the
    event_id-sharded fixture violates it by a month and rows would be
    (correctly) dropped as late."""
    import os as _os

    from yelpdatawarehouse_spark.streaming.pipeline import attributed_purchases

    src = tmp_path / "incoming_join"
    src.mkdir()
    pdf = table(spark, SF, "events").toPandas().sort_values("ts").reset_index(drop=True)
    for i, chunk in enumerate(
        (pdf.iloc[: len(pdf) // 3], pdf.iloc[len(pdf) // 3 : 2 * len(pdf) // 3],
         pdf.iloc[2 * len(pdf) // 3 :])
    ):
        chunk = chunk.copy()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        path = src / f"chunk_{i}.json"
        chunk.to_json(path, orient="records", lines=True)
        _os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = event_file_stream(spark, str(src))
    q = (
        attributed_purchases(stream)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_j"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def key(rows):
        return {(r["view_id"], r["purchase_id"]) for r in rows}

    got = key(spark.table("attrib").collect())
    want = key(attributed_purchases(table(spark, SF, "events")).collect())
    assert got == want and len(want) > 0


def test_windowed_approx_uniques_stream_equals_batch(spark, tmp_path, event_chunks_dir):
    """HLL sketches merge register-wise (order-insensitive), so the
    micro-batched stream must produce bit-identical window sketches to one
    batch pass — and land within the 1% rsd envelope of the exact count."""
    from yelpdatawarehouse_spark.streaming.pipeline import windowed_approx_uniques

    stream = event_file_stream(spark, event_chunks_dir)
    q = (
        windowed_approx_uniques(stream)
        .writeStream.format("memory")
        .queryName("win_uniq")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_u"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["window_start"]: (r["approx_users"], r["event_cnt"])
        for r in spark.sql("SELECT * FROM win_uniq").collect()
    }
    batch = table(spark, SF, "events")
    want = {
        r["window_start"]: (r["approx_users"], r["event_cnt"])
        for r in windowed_approx_uniques(batch).collect()
    }
    assert got == want

    exact = {
        r["w"]["start"]: r["exact"]
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for ws, (approx, _) in got.items():
        assert abs(approx - exact[ws]) <= max(1, 0.05 * exact[ws])


def test_stream_static_enrichment_matches_batch(spark, tmp_path, event_chunks_dir):
    """Broadcast stream-static left join: streamed result equals the batch
    join, and events without a dimension row survive with nulls."""
    from yelpdatawarehouse_spark.streaming.pipeline import enriched_event_stream

    # user dimension covering only even user ids — odd ids exercise the
    # late-arriving-dimension (null) path
    dim = (
        table(spark, SF, "events")
        .select("user_id")
        .distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("tier", F.when(F.col("user_id") % 4 == 0, "gold").otherwise("basic"))
    )
    stream = event_file_stream(spark, event_chunks_dir)
    q = (
        enriched_event_stream(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_e"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_id"], r["tier"])
        for r in spark.sql("SELECT event_id, tier FROM enriched").collect()
    }
    want = {
        (r["event_id"], r["tier"])
        for r in enriched_event_stream(table(spark, SF, "events"), dim).collect()
    }
    assert got == want
    assert any(t is None for _, t in got)  # odd ids kept with null tier
    assert any(t == "gold" for _, t in got)


def test_pointintime_enrichment_stream_converges_to_batch(spark, tmp_path, event_chunks_dir):
    """Point-in-time (versioned-dimension) enrichment: per-micro-batch
    foreachBatch application equals the batch backfill over all events,
    and each event gets the version in force AT ITS OWN TIMESTAMP."""
    import datetime as dt

    from yelpdatawarehouse_spark.streaming.pipeline import (
        event_file_stream,
        pointintime_enriched_stream,
    )

    ev = table(spark, SF, "events")
    b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    mid = b.lo + (b.hi - b.lo) / 2
    # two versions per user: v1 from the epoch start, v2 from mid-range
    users = ev.select("user_id").distinct()
    dim = users.select(
        "user_id", F.lit(b.lo).cast("timestamp").alias("valid_from"), F.lit("v1").alias("ver")
    ).unionByName(
        users.select(
            "user_id", F.lit(mid).cast("timestamp").alias("valid_from"), F.lit("v2").alias("ver")
        )
    )

    out_dir = str(tmp_path / "pit_out")

    def apply(batch_df, batch_id):
        pointintime_enriched_stream(batch_df, dim).select(
            "event_id", F.col("dim.ver").alias("ver")
        ).write.mode("append").parquet(out_dir)

    q = (
        event_file_stream(spark, event_chunks_dir)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt_pit"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.event_id, r.ver) for r in spark.read.parquet(out_dir).collect()}
    want = {
        (r.event_id, r.ver)
        for r in pointintime_enriched_stream(ev, dim)
        .select("event_id", F.col("dim.ver").alias("ver"))
        .collect()
    }
    assert got == want
    # version correctness: events strictly before mid got v1, at/after mid v2
    sample = pointintime_enriched_stream(ev, dim).select("ts", F.col("dim.ver").alias("ver"))
    assert sample.filter((F.col("ts") < F.lit(mid)) & (F.col("ver") != "v1")).count() == 0
    assert sample.filter((F.col("ts") >= F.lit(mid)) & (F.col("ver") != "v2")).count() == 0


def test_pointintime_duplicate_version_timestamps_deterministic(spark):
    """A versioned dim with DUPLICATE (key, valid_from) rows — two versions
    published at the same instant — must enrich deterministically (the
    greatest payload struct wins via asof_join's tie-break), not return an
    arbitrary version per run/partitioning (ADVICE r3)."""
    import datetime as dt

    from yelpdatawarehouse_spark.streaming.pipeline import pointintime_enriched_stream

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=2)), (1, base + dt.timedelta(hours=9))],
        ["user_id", "ts"],
    )
    dim = spark.createDataFrame(
        [
            (1, base + dt.timedelta(hours=1), 1, "tier_a"),
            (1, base + dt.timedelta(hours=1), 2, "tier_b"),  # same valid_from
            (1, base + dt.timedelta(hours=8), 3, "tier_c"),
        ],
        ["user_id", "valid_from", "ver", "tier"],
    )
    for _ in range(3):
        rows = {
            r.ts: (r.dim.ver, r.dim.tier)
            for r in pointintime_enriched_stream(ev, dim).collect()
        }
        assert rows[base + dt.timedelta(hours=2)] == (2, "tier_b")
        assert rows[base + dt.timedelta(hours=9)] == (3, "tier_c")


def test_bloom_filtered_stream_drops_history(spark, event_chunks_dir):
    """History-dedup via the broadcast Bloom bitmap: events whose key is in
    the historical set are dropped across micro-batches; with the default
    sizing the surviving set equals the exact anti-join (FP ~ 0 at this
    cardinality), and no false negatives means nothing historical leaks
    through regardless of sizing."""
    from yelpdatawarehouse_spark.streaming import bloom_filtered_stream

    ev = table(spark, SF, "events")
    seen = ev.filter(F.col("event_id") % 4 == 0).select("event_id")

    stream = event_file_stream(spark, event_chunks_dir)
    q = (
        bloom_filtered_stream(stream, seen, key="event_id")
        .writeStream.format("memory")
        .queryName("bloom_filtered")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.sql("SELECT event_id FROM bloom_filtered").collect()}

    expect = {
        r["event_id"]
        for r in ev.join(seen, "event_id", "left_anti").select("event_id").collect()
    }
    historical = {r["event_id"] for r in seen.collect()}
    assert got & historical == set()  # no false negatives ever
    assert got == expect  # default sizing: exact at this scale


def test_parse_events_with_dlq(spark, tmp_path):
    """Malformed JSON and contract-violating events land on the DLQ
    verbatim; well-formed events parse once and stream on — across
    micro-batches."""
    from yelpdatawarehouse_spark.streaming import parse_events_with_dlq

    src = tmp_path / "raw"
    src.mkdir()
    lines = [
        '{"event_id": 1, "user_id": 10, "event_type": "view", "value": 1.5, "ts": "2024-01-01T00:00:00.000"}',
        "garbage not json",
        '{"event_id": 2, "event_type": "view"}',  # violates user_id NOT NULL
        '{"event_id": 3, "user_id": 30, "event_type": "purchase", "value": 9.0, "ts": "2024-01-01T01:00:00.000"}',
    ]
    (src / "a.txt").write_text("\n".join(lines[:2]) + "\n")
    (src / "b.txt").write_text("\n".join(lines[2:]) + "\n")

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .withColumnRenamed("value", "raw")
    )
    good, dlq = parse_events_with_dlq(raw)
    q1 = (
        good.writeStream.format("memory").queryName("dlq_good")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2 = (
        dlq.writeStream.format("memory").queryName("dlq_bad")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    good_ids = {r.event_id for r in spark.sql("SELECT * FROM dlq_good").collect()}
    bad_lines = {r.raw_line for r in spark.sql("SELECT * FROM dlq_bad").collect()}
    assert good_ids == {1, 3}
    assert bad_lines == {"garbage not json", lines[2]}


def test_incremental_coverage_converges_to_batch(spark, tmp_path, event_chunks_dir):
    """Streaming sweep-line ≡ batch sweep-line: fold day deltas per
    micro-batch, derive the curve at read time, compare against the same
    +1/-1 prefix sum computed in one batch pass."""
    from pyspark.sql import Window

    from yelpdatawarehouse_spark.streaming.pipeline import (
        read_coverage,
        run_incremental_coverage,
    )

    state_dir = str(tmp_path / "cov_state")
    ckpt = str(tmp_path / "cov_ckpt")
    os.makedirs(state_dir)

    q = run_incremental_coverage(
        spark, event_file_stream(spark, event_chunks_dir), state_dir, ckpt
    )
    q.awaitTermination(120)

    got = {r["day"]: r["open_intervals"] for r in read_coverage(spark, state_dir).collect()}

    ev = table(spark, SF, "events")
    dur = F.greatest(F.coalesce(F.col("value").cast("long"), F.lit(0)), F.lit(0))
    iv = ev.select(
        F.to_date("ts").alias("d_start"),
        F.date_add(F.to_date("ts"), dur.cast("int")).alias("d_end"),
    )
    deltas = (
        iv.select(F.col("d_start").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            iv.select(F.date_add("d_end", 1).alias("d"), F.lit(-1).alias("delta"))
        )
        .groupBy("d")
        .agg(F.sum("delta").alias("delta"))
    )
    bounds = deltas.agg(F.min("d").alias("lo"), F.max("d").alias("hi")).collect()[0]
    spine = spark.sql(
        f"SELECT explode(sequence(DATE '{bounds['lo']}', DATE '{bounds['hi']}', "
        "interval 1 day)) AS d"
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["day"]: r["n"]
        for r in spine.join(deltas, "d", "left")
        .select("d", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.sum("delta").over(w).cast("long").alias("n"),
        )
        .collect()
    }
    assert got == want
    assert list(got.values())[-1] == 0 or min(got.values()) >= 0


def test_incremental_coverage_restart_is_noop(spark, tmp_path, event_chunks_dir):
    from yelpdatawarehouse_spark.streaming.pipeline import (
        read_coverage,
        run_incremental_coverage,
    )

    state_dir = str(tmp_path / "cov_state2")
    ckpt = str(tmp_path / "cov_ckpt2")
    os.makedirs(state_dir)

    q = run_incremental_coverage(
        spark, event_file_stream(spark, event_chunks_dir), state_dir, ckpt
    )
    q.awaitTermination(120)
    first = {r["day"]: r["open_intervals"] for r in read_coverage(spark, state_dir).collect()}

    # restart with the same checkpoint and no new data: curve unchanged
    q2 = run_incremental_coverage(
        spark, event_file_stream(spark, event_chunks_dir), state_dir, ckpt
    )
    q2.awaitTermination(120)
    second = {r["day"]: r["open_intervals"] for r in read_coverage(spark, state_dir).collect()}
    assert second == first


def _write_time_ordered_chunks(df_pdf, src, n_chunks, sentinel_base_id=None):
    """Write a pandas frame as time-ordered JSON-lines chunk files; with
    sentinel_base_id, append two far-future single-event chunks that march
    the watermark past every real impression's join window (the outer-join
    flush: batch N's watermark only evicts/emits in batch N+1, so TWO
    sentinels guarantee a batch runs after the advanced watermark)."""
    import os as _os

    import pandas as pd

    pdf = df_pdf.sort_values("ts").reset_index(drop=True)
    step = max(1, len(pdf) // n_chunks)
    chunks = [pdf.iloc[i : i + step] for i in range(0, len(pdf), step)]
    if sentinel_base_id is not None:
        far = pdf["ts"].max() + pd.Timedelta(days=90)
        for j in range(2):
            chunks.append(
                pd.DataFrame(
                    [{
                        "event_id": sentinel_base_id + j,
                        "ts": far + pd.Timedelta(days=30 * j),
                        "user_id": 999_999_999,
                        "event_type": pdf["event_type"].iloc[0],
                        "value": 0.0,
                        "props": "{}",
                    }]
                )
            )
    for i, chunk in enumerate(chunks):
        chunk = chunk.copy()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        path = src / f"chunk_{i:03d}.json"
        chunk.to_json(path, orient="records", lines=True)
        _os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))


@pytest.mark.parametrize("how", ["inner", "left_outer", "right_outer", "full_outer"])
def test_two_source_stream_stream_join_converges_to_batch(spark, tmp_path, how):
    """TWO independent file streams (impressions / conversions), each with
    its own watermark, interval-joined — final output must equal the batch
    join over the same rows. The outer modes additionally require every
    unmatched row on the outer side(s) to surface null-padded exactly once
    after the watermark closes its interval (sentinel events flush the
    tail): left = unmatched impressions, right = unmatched conversions,
    full = both."""
    from yelpdatawarehouse_spark.streaming.pipeline import (
        shape_conversions,
        shape_impressions,
        stream_stream_attribution,
    )

    ev = table(spark, SF, "events")
    imp_pdf = (
        ev.filter(F.col("event_type") == "view").toPandas()
    )
    conv_pdf = (
        ev.filter(F.col("event_type") == "purchase").toPandas()
    )
    imp_src = tmp_path / "imps"
    conv_src = tmp_path / "convs"
    imp_src.mkdir()
    conv_src.mkdir()
    sentinel = 1_000_000_000
    _write_time_ordered_chunks(imp_pdf, imp_src, 3, sentinel_base_id=sentinel)
    _write_time_ordered_chunks(conv_pdf, conv_src, 3, sentinel_base_id=sentinel + 10)

    imps = shape_impressions(
        event_file_stream(spark, str(imp_src)).withColumn(
            "event_type", F.lit("view")
        )
    )
    convs = shape_conversions(
        event_file_stream(spark, str(conv_src)).withColumn(
            "event_type", F.lit("purchase")
        )
    )
    name = f"two_src_{how}"
    q = (
        stream_stream_attribution(imps, convs, how=how)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{how}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    def key(rows):
        return {
            (r["imp_id"], r["conv_id"])
            for r in rows
            if (r["imp_id"] is None or r["imp_id"] < sentinel)
            and (r["conv_id"] is None or r["conv_id"] < sentinel)
        }

    got = key(spark.table(name).collect())
    want = key(
        stream_stream_attribution(
            shape_impressions(ev), shape_conversions(ev), how=how
        ).collect()
    )
    assert got == want and len(want) > 0
    # outer rows actually exercised per mode
    if how in ("left_outer", "full_outer"):
        assert any(i is not None and c is None for (i, c) in want)
    if how in ("right_outer", "full_outer"):
        assert any(i is None and c is not None for (i, c) in want)


def test_two_source_join_restart_resumes_from_checkpoint(spark, tmp_path):
    """Checkpoint recovery for the two-source stream-stream join: process
    only the EARLY chunks, stop, add the late chunks, restart with the
    same checkpoint + sink — the union of both runs' appends must equal
    the batch join over all events (no duplicates from re-processing, no
    holes from the restart)."""
    from yelpdatawarehouse_spark.streaming.pipeline import (
        shape_conversions,
        shape_impressions,
        stream_stream_attribution,
    )

    ev = table(spark, SF, "events")
    imp_pdf = ev.filter(F.col("event_type") == "view").toPandas()
    conv_pdf = ev.filter(F.col("event_type") == "purchase").toPandas()
    imp_src = tmp_path / "imps_r"
    conv_src = tmp_path / "convs_r"
    imp_src.mkdir()
    conv_src.mkdir()

    def write_chunks(pdf, src, lo, hi):
        import os as _os

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        step = max(1, len(pdf) // 4)
        chunks = [pdf.iloc[i : i + step] for i in range(0, len(pdf), step)]
        for i, chunk in enumerate(chunks[lo:hi], start=lo):
            chunk = chunk.copy()
            chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
            path = src / f"chunk_{i:03d}.json"
            chunk.to_json(path, orient="records", lines=True)
            _os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    def run_once():
        imps = shape_impressions(
            event_file_stream(spark, str(imp_src)).withColumn(
                "event_type", F.lit("view")
            )
        )
        convs = shape_conversions(
            event_file_stream(spark, str(conv_src)).withColumn(
                "event_type", F.lit("purchase")
            )
        )
        q = (
            stream_stream_attribution(imps, convs)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt_r"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    # run 1: first half of each stream
    write_chunks(imp_pdf, imp_src, 0, 2)
    write_chunks(conv_pdf, conv_src, 0, 2)
    run_once()
    mid = spark.read.parquet(str(tmp_path / "sink")).count()
    # run 2: late chunks arrive, restart from the same checkpoint
    write_chunks(imp_pdf, imp_src, 2, 99)
    write_chunks(conv_pdf, conv_src, 2, 99)
    run_once()

    got = {
        (r["imp_id"], r["conv_id"])
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    want = {
        (r["imp_id"], r["conv_id"])
        for r in stream_stream_attribution(
            shape_impressions(ev), shape_conversions(ev)
        ).collect()
    }
    assert got == want and len(want) > 0
    assert mid < len(want)  # restart actually added the late matches


def test_two_source_full_outer_restart_resumes_from_checkpoint(spark, tmp_path):
    """Checkpoint recovery for the FULL OUTER stream-stream join — the most
    state-sensitive mode: both sides buffer unmatched candidates until the
    watermark closes their interval, and a restart must neither re-emit an
    already-evicted outer row (duplicate) nor lose one buffered at stop
    (hole). Run early chunks, stop, add the late chunks + far-future
    sentinels (flush the outer tail), restart with the same checkpoint —
    the union of appends must equal the batch full-outer join."""
    import pandas as pd

    from yelpdatawarehouse_spark.streaming.pipeline import (
        shape_conversions,
        shape_impressions,
        stream_stream_attribution,
    )

    ev = table(spark, SF, "events")
    imp_pdf = ev.filter(F.col("event_type") == "view").toPandas()
    conv_pdf = ev.filter(F.col("event_type") == "purchase").toPandas()
    imp_src = tmp_path / "imps_fo"
    conv_src = tmp_path / "convs_fo"
    imp_src.mkdir()
    conv_src.mkdir()
    sentinel = 1_000_000_000

    def write_chunks(pdf, src, lo, hi, with_sentinels=False):
        import os as _os

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        step = max(1, len(pdf) // 4)
        chunks = [pdf.iloc[i : i + step] for i in range(0, len(pdf), step)]
        if with_sentinels:
            far = pdf["ts"].max() + pd.Timedelta(days=90)
            for j in range(2):
                chunks.append(
                    pd.DataFrame(
                        [{
                            "event_id": sentinel + j,
                            "ts": far + pd.Timedelta(days=30 * j),
                            "user_id": 999_999_999,
                            "event_type": pdf["event_type"].iloc[0],
                            "value": 0.0,
                            "props": "{}",
                        }]
                    )
                )
            hi = len(chunks)
        for i, chunk in enumerate(chunks[lo:hi], start=lo):
            chunk = chunk.copy()
            chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
            path = src / f"chunk_{i:03d}.json"
            chunk.to_json(path, orient="records", lines=True)
            _os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    def run_once():
        imps = shape_impressions(
            event_file_stream(spark, str(imp_src)).withColumn(
                "event_type", F.lit("view")
            )
        )
        convs = shape_conversions(
            event_file_stream(spark, str(conv_src)).withColumn(
                "event_type", F.lit("purchase")
            )
        )
        q = (
            stream_stream_attribution(imps, convs, how="full_outer")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink_fo"))
            .option("checkpointLocation", str(tmp_path / "ckpt_fo"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    write_chunks(imp_pdf, imp_src, 0, 2)
    write_chunks(conv_pdf, conv_src, 0, 2)
    run_once()
    mid = spark.read.parquet(str(tmp_path / "sink_fo")).count()
    write_chunks(imp_pdf, imp_src, 2, 99, with_sentinels=True)
    write_chunks(conv_pdf, conv_src, 2, 99, with_sentinels=True)
    run_once()

    def key(rows):
        return {
            (r["imp_id"], r["conv_id"])
            for r in rows
            if (r["imp_id"] is None or r["imp_id"] < sentinel)
            and (r["conv_id"] is None or r["conv_id"] < sentinel)
        }

    rows = spark.read.parquet(str(tmp_path / "sink_fo")).collect()
    got = key(rows)
    want = key(
        stream_stream_attribution(
            shape_impressions(ev), shape_conversions(ev), how="full_outer"
        ).collect()
    )
    assert got == want and len(want) > 0
    assert mid < len(want)  # the restart contributed rows
    # exactly-once across restart: no (imp, conv) pair appended twice
    seen = [
        (r["imp_id"], r["conv_id"])
        for r in rows
        if (r["imp_id"] is None or r["imp_id"] < sentinel)
        and (r["conv_id"] is None or r["conv_id"] < sentinel)
    ]
    assert len(seen) == len(got)
