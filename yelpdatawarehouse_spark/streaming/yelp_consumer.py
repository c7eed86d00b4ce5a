"""The reference's Kafka consumer (streaming/consumer.py) re-expressed as one
Structured Streaming pipeline over the Yelp warehouse.

Reference flow being reproduced (SURVEY.md §2.9, §3.3): producer emits
weighted events on 4 topics — yelp-reviews / yelp-checkins / yelp-businesses /
yelp-users (streaming/producer.py:328-357) — and the consumer applies each to
the stores plus incremental summary maintenance
(streaming/consumer.py:128-179, 417-441).

Spark-first design, one foreachBatch instead of per-event handlers:

* T1 demux        — filter on the event's topic column (consumer.py:132-171);
* T2 dim upsert   — anti-join against existing dim, append only unseen ids
                    (insert-if-absent, consumer.py:197-349);
* T3 fact append  — reviews/checkins appended after an anti-join on the PK:
                    a replayed or duplicated review event is a no-op, which
                    upgrades the reference's at-least-once consumer
                    (auto_offset_reset='latest', consumer.py:31-32) to an
                    exactly-once effect;
* T4/T5 counters  — the summary keeps ADDITIVE state (review_cnt, stars_sum,
                    checkin_sum, tip_cnt) and derives avg_rating at read,
                    avoiding the reference's off-by-one read-modify-write
                    running average (consumer.py:434-441, SURVEY.md §8).

Convergence invariant (tested): after any sequence of events, the maintained
summary equals the batch rebuild (sources/etl.business_summary) over
(initial ∪ streamed) facts. State storage is parquet with an atomic directory
swap per micro-batch; on Delta/Iceberg the fold becomes a MERGE with the same
algebra.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as S

# Unified envelope: topic + the union of the four producers' payload fields
# (streaming/producer.py:147-264). A Kafka deployment maps topic() + from_json
# to exactly this shape (see pipeline.kafka_event_stream for the pattern).
YELP_EVENT_SCHEMA = S.StructType(
    [
        S.StructField("topic", S.StringType()),
        # review (producer.py:232-251)
        S.StructField("review_id", S.StringType()),
        S.StructField("business_id", S.StringType()),
        S.StructField("user_id", S.StringType()),
        S.StructField("stars", S.DoubleType()),
        S.StructField("date", S.StringType()),  # ISO timestamp (producer.py:243)
        S.StructField("text", S.StringType()),
        S.StructField("useful", S.IntegerType()),
        S.StructField("funny", S.IntegerType()),
        S.StructField("cool", S.IntegerType()),
        # checkin extra (producer.py:253-264)
        S.StructField("count", S.IntegerType()),
        # business extras (producer.py:147-195)
        S.StructField("name", S.StringType()),
        S.StructField("city", S.StringType()),
        S.StructField("state", S.StringType()),
        S.StructField("postal_code", S.StringType()),
        S.StructField("review_count", S.IntegerType()),
        S.StructField("is_open", S.IntegerType()),
        # user extras (producer.py:197-230)
        S.StructField("yelping_since", S.StringType()),
        S.StructField("fans", S.IntegerType()),
        S.StructField("average_stars", S.DoubleType()),
    ]
)

TOPICS = ("yelp-reviews", "yelp-checkins", "yelp-businesses", "yelp-users")

_STATE_COLS = ("total_reviews", "stars_sum", "total_checkins", "total_tips")


class YelpStreamApplier:
    """Applies a demuxed Yelp event stream to a parquet warehouse directory
    with tables fact_review / fact_checkin / dim_business / dim_user and an
    additive summary_state."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.dir = warehouse_dir

    def _path(self, table: str) -> str:
        return os.path.join(self.dir, table)

    def _read(self, table: str) -> DataFrame | None:
        p = self._path(table)
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    def _append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self._path(table))

    def _swap(self, df: DataFrame, table: str) -> None:
        nxt = self._path(table + ".next")
        df.write.mode("overwrite").parquet(nxt)
        cur = self._path(table)
        if os.path.exists(cur):
            shutil.rmtree(cur)
        os.rename(nxt, cur)

    # -- per-topic handlers (T2/T3) ----------------------------------------

    def _new_reviews(self, batch: DataFrame) -> DataFrame:
        r = (
            batch.filter(F.col("topic") == "yelp-reviews")
            .na.drop(subset=["review_id", "business_id", "user_id", "stars", "date"])
            .dropDuplicates(["review_id"])
            .select(
                "review_id",
                "business_id",
                "user_id",
                F.col("stars").cast("int").alias("stars"),
                F.to_date(F.substring("date", 1, 10)).alias("review_date"),
                F.col("useful").alias("useful_votes"),
                F.col("funny").alias("funny_votes"),
                F.col("cool").alias("cool_votes"),
                "text",
            )
        )
        existing = self._read("fact_review")
        if existing is not None:  # idempotent MERGE WHEN NOT MATCHED
            r = r.join(existing.select("review_id"), "review_id", "left_anti")
        return r

    def _new_checkins(self, batch: DataFrame) -> DataFrame:
        """Checkin events carry (business_id, ts, count) — pre-counted
        multi-checkin bursts (producer.py:253-264); grouped to the fact's
        per-(business, day) grain."""
        return (
            batch.filter(F.col("topic") == "yelp-checkins")
            .na.drop(subset=["business_id", "date"])
            .groupBy(
                "business_id", F.to_date(F.substring("date", 1, 10)).alias("checkin_date")
            )
            .agg(F.sum(F.coalesce("count", F.lit(1))).alias("checkin_count"))
        )

    def _new_dims(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        biz = (
            batch.filter(F.col("topic") == "yelp-businesses")
            .na.drop(subset=["business_id", "name"])
            .dropDuplicates(["business_id"])
            .select(
                "business_id",
                F.col("name").alias("business_name"),
                "city",
                "state",
                "postal_code",
                "stars",
                "review_count",
                (F.col("is_open") == 1).alias("is_open"),
            )
        )
        usr = (
            batch.filter(F.col("topic") == "yelp-users")
            .na.drop(subset=["user_id"])
            .dropDuplicates(["user_id"])
            .select(
                "user_id",
                F.coalesce("name", F.lit("Unknown")).alias("name"),
                "review_count",
                F.to_date(F.substring("yelping_since", 1, 10)).alias("yelping_since"),
                "fans",
                "average_stars",
            )
        )
        eb = self._read("dim_business")
        if eb is not None:
            biz = biz.join(eb.select("business_id"), "business_id", "left_anti")
        eu = self._read("dim_user")
        if eu is not None:
            usr = usr.join(eu.select("user_id"), "user_id", "left_anti")
        return biz, usr

    # -- summary maintenance (T4/T5) ---------------------------------------

    def _fold_summary(self, reviews: DataFrame, checkins: DataFrame) -> None:
        rd = reviews.groupBy("business_id").agg(
            F.count("*").cast("long").alias("total_reviews"),
            F.sum("stars").cast("double").alias("stars_sum"),
            F.lit(0).cast("long").alias("total_checkins"),
            F.lit(0).cast("long").alias("total_tips"),
        )
        cd = checkins.groupBy("business_id").agg(
            F.lit(0).cast("long").alias("total_reviews"),
            F.lit(0.0).alias("stars_sum"),
            F.sum("checkin_count").cast("long").alias("total_checkins"),
            F.lit(0).cast("long").alias("total_tips"),
        )
        delta = rd.unionByName(cd)
        state = self._read("summary_state")
        if state is not None:
            delta = state.unionByName(delta)
        folded = delta.groupBy("business_id").agg(
            *[F.sum(c).alias(c) for c in _STATE_COLS]
        )
        self._swap(folded, "summary_state")

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """One micro-batch: demux → dim upserts → idempotent fact appends →
        additive summary fold. Mirrors consumer.py:128-179 minus the
        per-event round-trips: each arrow is one distributed job."""
        batch = batch.cache()
        new_biz, new_usr = self._new_dims(batch)
        if not new_biz.isEmpty():
            self._append(new_biz, "dim_business")
        if not new_usr.isEmpty():
            self._append(new_usr, "dim_user")
        # localCheckpoint (eager) pins the anti-joined deltas BEFORE the
        # append below changes the parquet they were anti-joined against —
        # a lazily re-evaluated plan would see its own write and produce an
        # empty summary delta
        reviews = self._new_reviews(batch).localCheckpoint()
        checkins = self._new_checkins(batch).localCheckpoint()
        if not reviews.isEmpty():
            self._append(reviews, "fact_review")
        if not checkins.isEmpty():
            self._append(checkins, "fact_checkin")
        self._fold_summary(reviews, checkins)
        batch.unpersist()

    def start(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def summary(self) -> DataFrame:
        """summary_business_performance view over the additive state:
        avg_rating derived from (stars_sum, total_reviews) — never stored
        (the reference's stored running average is the §8 bug)."""
        state = self._read("summary_state")
        biz = self._read("dim_business")
        if biz is not None:
            # every business appears (like the reference's summary table,
            # init/mysql_loader.py:1080-1104), zero-filled when no facts yet;
            # IFNULL(avg, b.stars) parity with the batch build
            state = biz.select("business_id", "stars").join(state, "business_id", "left")
        return state.select(
            "business_id",
            F.coalesce("total_reviews", F.lit(0)).alias("total_reviews"),
            F.coalesce(
                F.when(
                    F.col("total_reviews") > 0,
                    F.col("stars_sum") / F.col("total_reviews"),
                ),
                F.col("stars") if biz is not None else F.lit(None),
            ).alias("avg_rating"),
            F.coalesce("total_checkins", F.lit(0)).alias("total_checkins"),
            F.coalesce("total_tips", F.lit(0)).alias("total_tips"),
        )


def yelp_event_file_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of enveloped Yelp events (test/dev source; a Kafka
    deployment swaps in pipeline.kafka_event_stream semantics — the
    downstream foreachBatch plan is identical)."""
    return (
        spark.readStream.schema(YELP_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )
