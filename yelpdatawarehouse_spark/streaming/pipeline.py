"""Structured Streaming ingestion + incremental aggregate maintenance.

Reference semantics being re-expressed (SURVEY.md §2.9):

* T1 topic demux            — consumer.py:132-171 routes by Kafka topic;
                              here: one stream filtered per event_type, or
                              per-topic readStream.
* T2/T3 upsert/append       — consumer.py:197-414 INSERT per event;
                              here: idempotent additive MERGE in foreachBatch.
* T4/T5 incremental counters & running average
                            — consumer.py:417-441 does read-modify-write
                              (`avg = (avg*n + stars)/(n+1)`) with an
                              order-of-evaluation bug (SURVEY §8). We keep
                              (sum, count) state and derive avg — associative,
                              idempotent per batch, and convergent with the
                              batch rebuild (test_streaming.py asserts it).
* T7 event-time handling    — the reference applies events immediately with
                              no late-data story (consumer.py:31-32 drops or
                              re-applies on restart). We add watermarked
                              tumbling windows + checkpointed exactly-once
                              foreachBatch.

The summary store is plain parquet (no Delta in this environment): each
micro-batch folds its partial aggregate into the previous state additively
and atomically swaps the state directory. On a cluster with Delta/Iceberg
the fold becomes `MERGE WHEN MATCHED UPDATE SET cnt = t.cnt + s.cnt ...` —
same algebra, same convergence proof.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as S

EVENT_SCHEMA = S.StructType(
    [
        S.StructField("event_id", S.LongType()),
        S.StructField("ts", S.TimestampType()),
        S.StructField("user_id", S.LongType()),
        S.StructField("event_type", S.StringType()),
        S.StructField("value", S.DoubleType()),
        S.StructField("props", S.StringType()),
    ]
)


def event_file_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of JSON-lines events (the test/dev source; swap in
    kafka_event_stream in production — identical downstream plan)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )


def kafka_source_options(
    brokers: str, topics: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The Kafka source option map — split out as a pure function so the
    no-broker container can still unit-test that the subscribe/broker
    options land (tests/test_kafka_options.py; VERDICT r9 #8)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }


def decode_kafka_events(raw: DataFrame) -> DataFrame:
    """JSON-decode the Kafka wire frame (binary key/value + topic/partition/
    offset metadata) into (topic, event columns). Works identically on a
    batch DataFrame with the same wire schema — that twin is the no-broker
    test path, the same discipline as event_file_stream."""
    return raw.select(
        F.col("topic"),
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e"),
    ).select("topic", "e.*")


def kafka_event_stream(spark: SparkSession, brokers: str, topics: str) -> DataFrame:
    """Kafka source (S6): subscribe + JSON-decode into the event schema.

    Reference: consumer.py:27-33 subscribes yelp-reviews/-checkins/
    -businesses/-users; the topic column is the demux key (T1).
    The broker leg needs the spark-sql-kafka connector + a live broker
    (absent in this container); the option assembly and the decode plan
    are unit-tested batch-side, and the file stream above drives the same
    downstream plan in the streaming tests.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(brokers, topics).items():
        reader = reader.option(k, v)
    return decode_kafka_events(reader.load())


def parse_events_with_dlq(
    raw_lines: DataFrame, schema=None
) -> tuple[DataFrame, DataFrame]:
    """Split a stream of raw JSON strings into (parsed events, dead-letter
    queue): lines that fail from_json — or parse but violate the NOT-NULL
    event contract (event_id/user_id present) — survive VERBATIM on the
    DLQ side for alerting and replay instead of becoming silent nulls.

    The streaming twin of sources/yelp.read_entity_with_quarantine: both
    branches are lazy filters over the SAME parse expression, so a
    micro-batch is decoded once; each side can be routed to its own sink
    (facts vs dead-letter topic/table) from one foreachBatch. Works
    identically on a batch frame. ``raw_lines`` must have a string column
    named ``raw``. Reference analog: the consumer's bare try/except that
    drops bad payloads on the floor (streaming/consumer.py:128-139).
    """
    schema = schema or EVENT_SCHEMA
    parsed = raw_lines.withColumn("e", F.from_json(F.col("raw"), schema))
    ok = F.col("e").isNotNull() & F.col("e.event_id").isNotNull() & F.col(
        "e.user_id"
    ).isNotNull()
    good = parsed.filter(ok).select("e.*")
    dlq = parsed.filter(~ok).select(F.col("raw").alias("raw_line"))
    return good, dlq


# ---------------------------------------------------------------------------
# Incremental summary maintenance (T2-T5)
# ---------------------------------------------------------------------------

_SUMMARY_AGGS = lambda: [  # noqa: E731  (sum,count) state — avg is DERIVED
    F.count("*").alias("event_cnt"),
    F.sum("value").alias("value_sum"),
    F.min("ts").alias("first_ts"),
    F.max("ts").alias("last_ts"),
]


def batch_user_summary(events: DataFrame) -> DataFrame:
    """The batch rebuild (A14 analog): ground truth for convergence."""
    return (
        events.groupBy("user_id")
        .agg(*_SUMMARY_AGGS())
        .withColumn("value_avg", F.col("value_sum") / F.col("event_cnt"))
    )


def _fold_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Additive fold of a batch partial into the previous state — the
    associative form of the reference's read-modify-write counters."""
    u = state.unionByName(delta)
    return (
        u.groupBy("user_id")
        .agg(
            F.sum("event_cnt").alias("event_cnt"),
            F.sum("value_sum").alias("value_sum"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
    )


def _read_state_pointer(state_dir: str) -> tuple[int, str] | None:
    """(last folded batch_id, absolute path of its state dir), or None."""
    ptr = os.path.join(state_dir, "CURRENT")
    try:
        with open(ptr) as fh:
            bid, name = fh.read().split("\n")[:2]
        return int(bid), os.path.join(state_dir, name)
    except (OSError, ValueError):
        return None


def _swap_state_pointer(state_dir: str, batch_id: int, name: str) -> None:
    """Atomically point CURRENT at a fully-written version dir
    (write-tmp + os.replace — a crash leaves either the old or the new
    pointer, never a torn one), then best-effort-drop orphaned versions."""
    ptr = os.path.join(state_dir, "CURRENT")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{batch_id}\n{name}\n")
    os.replace(tmp, ptr)
    for entry in os.listdir(state_dir):
        if entry.startswith("state_v") and entry != name:
            shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)


def _fold_versioned(spark, state_dir: str, batch_id: int, fold) -> None:
    """Exactly-once foreachBatch fold under a versioned-dir + pointer-file
    protocol.

    foreachBatch is AT-LEAST-once: if the process dies after the state
    swap but before the streaming checkpoint commits, restart re-delivers
    the same batch_id. Counter addition is associative/commutative but
    NOT idempotent, so the fold must dedupe on batch_id itself: the
    pointer file records the last folded id, and a replay of
    ``batch_id <= last`` is a no-op. Crash-atomicity: the new state is
    fully written to ``state_v{batch_id}`` BEFORE one atomic
    ``os.replace`` of the pointer — a crash at any instant leaves a
    readable state (old or new), never the rmtree+rename gap of the
    previous two-dir swap. A replayed batch that crashed mid-write
    simply overwrites its own version dir.

    ``fold(prev_state_df_or_None) -> DataFrame`` builds the new state.
    """
    prev = _read_state_pointer(state_dir)
    if prev is not None and batch_id <= prev[0]:
        return  # at-least-once replay of an already-folded batch
    folded = fold(spark.read.parquet(prev[1]) if prev is not None else None)
    name = f"state_v{batch_id}"
    folded.write.mode("overwrite").parquet(os.path.join(state_dir, name))
    _swap_state_pointer(state_dir, batch_id, name)


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    ptr = _read_state_pointer(state_dir)
    if ptr is None:
        raise FileNotFoundError(f"no committed state under {state_dir}")
    return spark.read.parquet(ptr[1])


def run_incremental_summary(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain a per-user summary table from a stream via foreachBatch.

    Exactly-once effect via ``_fold_versioned``: the pointer file makes
    the fold idempotent per batch_id (an at-least-once replay no-ops) and
    the single os.replace makes the state swap crash-atomic — restarts
    neither drop nor double-count, unlike the reference's
    auto_offset_reset='latest' consumer (SURVEY §2.9).
    """

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy("user_id").agg(*_SUMMARY_AGGS())

        def fold(state):
            return delta if state is None else _fold_state(state, delta)

        _fold_versioned(spark, state_dir, batch_id, fold)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_summary(spark: SparkSession, state_dir: str) -> DataFrame:
    state = _read_state(spark, state_dir)
    return state.withColumn("value_avg", F.col("value_sum") / F.col("event_cnt"))


def run_incremental_cms(
    spark: SparkSession,
    stream: DataFrame,
    key: str,
    state_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
):
    """Maintain a count-min sketch of a stream key via foreachBatch —
    streaming heavy-hitter / frequency tracking with O(d·W) state no
    matter how many distinct keys flow past (the exact groupBy state the
    incremental summary keeps is per-key and unbounded on a
    high-cardinality key; the sketch is the bounded-state alternative).

    Each micro-batch is sketched with ``cms_build`` and folded into the
    persisted sketch by counter addition (``cms_merge``) under the
    ``_fold_versioned`` protocol. Addition is associative/commutative but
    NOT idempotent — batch boundaries cannot change the final counters,
    but an at-least-once REPLAY would double-count without the pointer
    file's batch_id dedupe (pinned by
    tests/test_advice_regressions.py::test_cms_fold_replay_is_noop); the
    suite also pins stream-final ≡ batch-built sketch equality
    (tests/test_cms.py).
    """
    from ..operators.cms import cms_build, cms_merge

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = cms_build(batch_df, key, depth=depth, width=width)

        def fold(state):
            return delta if state is None else cms_merge(state, delta)

        _fold_versioned(spark, state_dir, batch_id, fold)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms(spark: SparkSession, state_dir: str) -> DataFrame:
    return _read_state(spark, state_dir)


def run_incremental_coverage(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    duration_col: str = "value",
):
    """Streaming sweep-line interval coverage (the incremental twin of
    a_open_orders_per_day): each event opens an interval at to_date(ts)
    lasting ``duration_col`` whole days, folded into a persisted
    per-day DELTA table (+1 at the start day, -1 the day after the end)
    under the ``_fold_versioned`` exactly-once protocol. The coverage
    curve itself is DERIVED at read time by a prefix sum over the
    calendar spine (``read_coverage``) — state stays day-keyed deltas
    (calendar-bounded, mergeable, idempotent per batch_id), never the
    materialized curve, so folds are pure counter addition like the CMS.
    """

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        dur = F.greatest(
            F.coalesce(F.col(duration_col).cast("long"), F.lit(0)), F.lit(0)
        )
        iv = batch_df.select(
            F.to_date("ts").alias("d_start"),
            F.date_add(F.to_date("ts"), dur.cast("int")).alias("d_end"),
        )
        delta = (
            iv.select(F.col("d_start").alias("d"), F.lit(1).alias("delta"))
            .unionByName(
                iv.select(
                    F.date_add("d_end", 1).alias("d"), F.lit(-1).alias("delta")
                )
            )
            .groupBy("d")
            .agg(F.sum("delta").alias("delta"))
        )

        def fold(state):
            if state is None:
                return delta
            return (
                state.unionByName(delta)
                .groupBy("d")
                .agg(F.sum("delta").alias("delta"))
            )

        _fold_versioned(spark, state_dir, batch_id, fold)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_coverage(spark: SparkSession, state_dir: str) -> DataFrame:
    """(day STRING, open_intervals BIGINT): the coverage curve derived
    from the persisted day deltas by a calendar-spine prefix sum —
    identical arithmetic to a_open_orders_per_day's batch form."""
    from pyspark.sql import Window

    by_day = _read_state(spark, state_dir)
    bounds = F.broadcast(
        by_day.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("dmin"), F.col("dmax"), F.expr("interval 1 day"))
        ).alias("d")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(F.broadcast(by_day), "d", "left")
        .select("d", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.sum("delta").over(w).cast("long").alias("open_intervals"),
        )
    )


def run_gated_ingest(
    spark: SparkSession,
    stream: DataFrame,
    rules,
    out_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
):
    """Quality-gated ingestion: each micro-batch is audited against a
    declarative rule suite (operators/quality.Rule) DURING its own write
    via ``observe_rules`` — a clean batch appends to the live table, a
    batch with ANY violation is diverted wholesale to quarantine for
    repair-and-replay. Composes the row-level DLQ (parse_events_with_dlq:
    per-ROW malformedness) with batch-level contract enforcement
    (per-BATCH statistical violations a single row can't express, e.g.
    "this feed suddenly ships NULL dates").

    Write-then-audit ordering: the batch lands in a staging dir first
    (the observation is collected by that write — zero extra pass), then
    one directory rename routes it. Batch id in the staging path makes a
    replayed batch overwrite its own staging, and a replay clears the
    batch's previous copy from BOTH routing destinations before the
    rename — a batch whose routing outcome changed between runs (rule
    suite edited, upstream data repaired) moves rather than duplicates
    across out/quarantine. A crash between that cleanup and the rename
    leaves the batch absent from both tables but still intact in
    staging; the next replay re-routes it, so data is delayed, never
    lost or doubled.

    At 100 TB the audit costs a few counters per task; the routing cost
    is a metadata move. The convergence + routing invariants are pinned
    by tests/test_quality.py.
    """
    from ..operators.quality import observe_rules

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        staging = os.path.join(out_dir, f"_staging_{batch_id}")
        observed, obs = observe_rules(batch_df, rules, name=f"gate_{batch_id}")
        observed.write.mode("overwrite").parquet(staging)
        metrics = obs.get
        violations = sum(v for k, v in metrics.items() if k != "n_rows")
        dest_root = out_dir if violations == 0 else quarantine_dir
        os.makedirs(dest_root, exist_ok=True)
        # Replay hygiene: clear this batch from BOTH destinations, not just
        # the one it routes to now — if the routing outcome changed since
        # the previous delivery, the stale copy in the other table would
        # otherwise survive as a duplicate.
        for root in (out_dir, quarantine_dir):
            stale = os.path.join(root, f"batch_{batch_id}")
            if os.path.exists(stale):
                shutil.rmtree(stale)
        dest = os.path.join(dest_root, f"batch_{batch_id}")
        os.rename(staging, dest)

    return (
        stream.writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming dedup (exactly-once ingestion for training-data pipelines)
# ---------------------------------------------------------------------------


def deduped_event_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate events by event_id across micro-batches.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes — bounded state at any throughput, unlike a plain
    dropDuplicates whose state grows forever on a stream. This is the
    ingestion-side dedup of a training-data pipeline (the streaming
    counterpart of dedup_exact_groups); the reference has no dedup at all
    on its consumer (at-least-once re-application, SURVEY §2.9).
    """
    if stream.isStreaming:
        return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return stream.dropDuplicates(["event_id"])


# ---------------------------------------------------------------------------
# Custom stateful operator (T4/T5 as arbitrary per-key state)
# ---------------------------------------------------------------------------

_STATE_SCHEMA = S.StructType(
    [
        S.StructField("event_cnt", S.LongType()),
        S.StructField("value_sum", S.DoubleType()),
    ]
)

_STATEFUL_OUT_SCHEMA = S.StructType(
    [
        S.StructField("user_id", S.LongType()),
        S.StructField("event_cnt", S.LongType()),
        S.StructField("value_sum", S.DoubleType()),
        S.StructField("value_avg", S.DoubleType()),
    ]
)


def _update_user_state(key, pdf_iter, state):
    """Per-key state update: fold the batch's rows into (count, sum) state
    and emit the refreshed running aggregate. Arbitrary-state analog of the
    reference's per-event counter updates (consumer.py:417-441) — but the
    state is (sum, count), so the derived average is exact regardless of
    arrival order or batching."""
    import pandas as pd  # noqa: PLC0415 — runs on executors

    cnt, vsum = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        cnt += len(pdf)
        vsum += float(pdf["value"].sum())
    state.update((cnt, vsum))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_cnt": [cnt],
            "value_sum": [vsum],
            "value_avg": [vsum / cnt if cnt else None],
        }
    )


def stateful_user_summary(stream: DataFrame) -> DataFrame:
    """T4/T5 via ``applyInPandasWithState``: true incremental per-key state
    kept by the streaming engine (RocksDB/HDFS state store on a cluster),
    emitting updated running aggregates each micro-batch. The foreachBatch
    fold (run_incremental_summary) maintains a TABLE; this maintains
    OPERATOR STATE — both converge to batch_user_summary."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=_STATEFUL_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_summary_tws(stream: DataFrame) -> DataFrame:
    """The same T4/T5 per-key running aggregate on Spark 4.1's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (kept above as ``stateful_user_summary``;
    both converge to ``batch_user_summary``, and the suite asserts all
    three agree).

    Why a second implementation of the same semantics earns its keep:
    the new API is where stateful streaming is headed at scale —
    named/composite state variables (ValueState/ListState/MapState
    instead of one opaque tuple), native TTL per state variable, event-
    and processing-time timers, and first-class schema evolution of
    state. It also REQUIRES the RocksDB state-store provider, which is
    the right provider at 100 TB anyway (bounded executor heap, state
    spills to local SSD + changelog checkpointing) — the caller must set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` before starting the query
    (see tests/test_tws.py; the HDFS-backed default cannot run this
    operator).
    """
    import pandas as pd  # noqa: PLC0415 — pickled to executors
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningSummary(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            cnt, vsum = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                cnt += len(pdf)
                vsum += float(pdf["value"].sum())
            self._agg.update((cnt, vsum))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_cnt": [cnt],
                    "value_sum": [vsum],
                    "value_avg": [vsum / cnt if cnt else None],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningSummary(),
        outputStructType=_STATEFUL_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Watermarked windowed aggregation (T7)
# ---------------------------------------------------------------------------


def windowed_type_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"):
    """Tumbling event-time window counts with late-data tolerance. Works on
    both a stream (with watermark state eviction) and a batch DataFrame
    (watermark is a no-op) — the same plan as t7_hourly_tumbling_window."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("event_cnt"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_cnt", "total_value")
    )


def enriched_event_stream(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each event decorated with dimension
    attributes via a broadcast hash join — the lookup-table pattern (user
    profile, product catalog) every event pipeline needs.

    The static side is re-read per micro-batch by Structured Streaming
    (picking up slowly-changing dimension updates between batches) and
    broadcast, so the stream side never shuffles — the join is stateless,
    works in append mode with no watermark, and at 100 TB/day event rates
    adds only the dimension's broadcast cost per batch. Left join keeps
    events whose key has no dimension row yet (late-arriving dimension —
    the reference's consumer silently drops those,
    streaming/consumer.py:361-414 fact insert after failed lookup).
    """
    return events.join(F.broadcast(dim), key, "left")


def bloom_filtered_stream(
    events: DataFrame,
    seen: DataFrame,
    key: str = "event_id",
    n_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Drop stream rows whose key is APPROXIMATELY already in a (large)
    historical key set, using the Bloom bitmap operator
    (`operators/bloom.py`): the history is compressed once per micro-batch
    into a ~16 KB one-row bitmap and broadcast, so the stream side never
    shuffles and keeps NO state — the history-dedup complement of
    `deduped_event_stream` (which dedups within the stream's own
    watermark but cannot hold a multi-year key history in state).

    Bloom semantics on a stream: no false negatives means every truly-new
    event survives; false positives (rate ≈ (1-e^(-k·n/n_bits))^k) drop a
    tiny fraction of new events — acceptable for training-data ingestion,
    where the alternative at 100 TB of history is an unboundedly growing
    state store or a full shuffle per batch. Size n_bits to the history
    (~10 bits/key for ~1% FP). The static side is re-read per micro-batch,
    picking up newly-committed history between batches.
    """
    from ..operators.bloom import _might_contain, bloom_bitmap

    bitmap = bloom_bitmap(seen, key, n_bits, k)
    return (
        events.join(F.broadcast(bitmap))
        .where(~_might_contain(F.col("__bloom"), F.col(key), n_bits, k))
        .drop("__bloom")
    )


def pointintime_enriched_stream(
    events: DataFrame,
    versioned_dim: DataFrame,
    key: str = "user_id",
    event_time: str = "ts",
    valid_from: str = "valid_from",
) -> DataFrame:
    """Point-in-time-correct enrichment: each event gets the dimension
    VERSION that was in effect at the event's own timestamp (as-of join on
    ``valid_from``), not the latest snapshot — the leakage-free feature
    join a training-data pipeline needs (a feature computed tomorrow must
    not decorate yesterday's event).

    Built on ``operators.asof.asof_join`` (backward, inclusive): one
    shuffle on the key per micro-batch, no inequality-join explosion.
    Streaming use is per micro-batch via foreachBatch (the version table
    is re-read each batch, so dimension updates land between batches);
    the identical call on a batch frame is the backfill path the
    convergence test compares against. Events whose key has no version
    at-or-before their time keep a null ``dim`` struct (late-arriving
    dimension, same policy as enriched_event_stream).
    """
    from ..operators.asof import asof_join

    return asof_join(
        events,
        versioned_dim,
        on=key,
        left_time=event_time,
        right_time=valid_from,
        direction="backward",
        asof_col="dim",
    )


def windowed_approx_uniques(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Approximate distinct users per tumbling event-time window via
    HyperLogLog++ (rsd=0.01).

    An EXACT streaming count-distinct would have to keep every user id seen
    per open window in state; the HLL sketch keeps a fixed few-KB register
    set per window regardless of cardinality, merges order-insensitively
    across micro-batches (register-wise max — the same result as one batch
    pass over the same rows), and the watermark evicts window state. This
    is the streaming face of a_approx_distinct_check's scale argument.
    Works identically on a batch frame (watermark no-op) for backfill.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.count("*").alias("event_cnt"),
        )
        .select(
            F.col("w.start").alias("window_start"), "approx_users", "event_cnt"
        )
    )


# ---------------------------------------------------------------------------
# Session windows (T8)
# ---------------------------------------------------------------------------


def sessionized_stats(
    events: DataFrame, gap: str = "6 hours", watermark: str = "12 hours"
) -> DataFrame:
    """Gap-based session aggregation via F.session_window — the streaming
    twin of queries/sessions.t8_sessionization. A session closes once a
    user is idle for ``gap``; with a watermark, closed sessions are
    finalized and their state evicted, so state size tracks only the
    OPEN sessions — the property that makes sessionization feasible on
    an unbounded stream. Works on a batch DataFrame too (watermark no-op),
    which is what the convergence test compares against.

    Run the stream in **append** (or update) mode: in complete mode Spark
    does NOT merge a batch's sessions with prior state (observed on 4.1:
    each micro-batch's sessions land as separate rows), so cross-batch
    sessions only assemble correctly under watermark-driven finalization.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("sw.start").alias("session_start"),
            "n_events",
            "n_purchases",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join (T8b — streaming twin of j12_range_join_bucketed)
# ---------------------------------------------------------------------------


def attributed_purchases(
    events: DataFrame, window_hours: int = 24, watermark: str = "12 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same-user
    views in the preceding ``window_hours``.

    Both sides carry a watermark and the join condition bounds purchase.ts
    to [view.ts, view.ts + window], so Spark can expire buffered view state
    once the watermark passes the window bound — state stays O(open window),
    the property that makes stream-stream joins runnable indefinitely. On a
    batch DataFrame the same plan degrades to the (bucketable) range join.
    """
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    if events.isStreaming:
        views = views.withWatermark("v_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") < F.col("v_ts") + F.expr(f"INTERVAL {window_hours} HOURS"))
    )
    return views.join(purchases, cond).select(
        "view_id", "purchase_id", F.col("v_user").alias("user_id"), "v_ts", "p_ts", "p_value"
    )

# ---------------------------------------------------------------------------
# Two-source stream-stream join: inner / left_outer / right_outer / full_outer
# ---------------------------------------------------------------------------


def shape_impressions(events: DataFrame) -> DataFrame:
    """Shape the event schema into the impression side of
    :func:`stream_stream_attribution` (view events; distinct column names
    so the two sides of the self-describing join condition never clash)."""
    return events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("i_user"),
        F.col("event_id").alias("imp_id"),
        F.col("ts").alias("i_ts"),
    )


def shape_conversions(events: DataFrame) -> DataFrame:
    """Conversion side of :func:`stream_stream_attribution` (purchases)."""
    return events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )


def stream_stream_attribution(
    impressions: DataFrame,
    conversions: DataFrame,
    window_hours: int = 24,
    watermark: str = "12 hours",
    how: str = "inner",
) -> DataFrame:
    """General TWO-SOURCE watermarked stream-stream interval join — the
    impression↔conversion attribution shape: each conversion matches the
    same-user impressions in the preceding ``window_hours``.

    Unlike :func:`attributed_purchases` (two filters of ONE stream), the
    two sides here are independent streams (e.g. two Kafka topics / two
    file sources), each carrying its OWN watermark; Spark takes the min
    as the global watermark, so a lagging side correctly holds back state
    eviction on both.

    ``how='inner'`` emits matches as they form. The outer modes emit each
    UNMATCHED row exactly once, null-padded, when the watermark proves no
    future partner can join it (Spark buffers outer candidates until the
    interval condition is provably closed; without the time bound in the
    join condition the state would be unbounded and Spark rejects the
    plan):

    * ``left_outer`` — unmatched impressions, evicted once the watermark
      passes ``i_ts + window`` (no later conversion can land inside the
      window).
    * ``right_outer`` — unmatched conversions, evicted once the watermark
      passes ``c_ts`` (a matching impression would have to carry
      ``i_ts <= c_ts``, already below the watermark).
    * ``full_outer`` — both, each side under its own eviction bound.

    State per side stays O(open window) in every mode. On batch DataFrames
    the identical call degrades to the plain (range) join — the convergence
    oracle the tests compare against.

    Reference analog: streaming/consumer.py:417-441 applies review events
    against business state one row at a time; this is that lookup
    generalized to two unbounded sides with bounded disorder.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"stream_stream_attribution: unsupported how={how!r}")
    if impressions.isStreaming:
        impressions = impressions.withWatermark("i_ts", watermark)
    if conversions.isStreaming:
        conversions = conversions.withWatermark("c_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("i_user"))
        & (F.col("c_ts") >= F.col("i_ts"))
        & (F.col("c_ts") < F.col("i_ts") + F.expr(f"INTERVAL {window_hours} HOURS"))
    )
    return impressions.join(conversions, cond, how).select(
        "imp_id",
        F.col("i_user").alias("user_id"),
        "i_ts",
        "conv_id",
        "c_ts",
        "c_value",
    )
