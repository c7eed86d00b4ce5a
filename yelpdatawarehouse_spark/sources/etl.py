"""Batch ETL: raw Yelp JSON → star-schema DataFrames (SURVEY.md §3.2).

Re-expression of init/mysql_loader.py's imperative loaders as one declarative
Spark job graph. Key differences from the reference, by design:

* Surrogate keys (location_id/category_id/time_id dictionaries held in
  driver memory, init/mysql_loader.py:334,592-594) are replaced by natural
  keys — every query in the reference groups/joins on the natural key
  anyway, and natural keys need no driver-side state at any scale.
* INSERT IGNORE first-writer-wins (init/mysql_loader.py:435-439) becomes
  dropDuplicates on the primary key.
* The load-time semi-join filter (facts only for loaded businesses,
  init/mysql_loader.py:606-609) is a LEFT SEMI join (S3/J3).
* dim_time (init/mysql_loader.py:243-288) is generated distributively with
  sequence()+explode for the full 2004-2023 range — on-demand inserts for
  unseen dates (init/mysql_loader.py:644-668) are impossible by construction.
* The polymorphic checkin `date` (string of timestamps OR {day: times} map,
  init/mysql_loader.py:791-802) is branch-parsed with JVM expressions.

Physical layout for scale: facts are written partitioned by year (partition
pruning for every time-ranged query) and sorted within files by business_id
(min/max row-group skipping on the hottest join/filter key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .yelp import read_entity

# reference load defaults, init/init.py:22-27
DEFAULT_LIMITS = {"business": 10_000, "review": 100_000, "user": 50_000}


def dim_time(spark: SparkSession, start: str = "2004-01-01", end: str = "2023-12-31") -> DataFrame:
    """Calendar dimension for every day in [start, end] (7,305 rows for the
    default range — init/mysql_loader.py:246-247)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("INTERVAL 1 DAY"))
        ).alias("date_actual")
    )
    return days.select(
        "date_actual",
        F.date_format("date_actual", "EEEE").alias("day_of_week"),
        F.dayofmonth("date_actual").alias("day_of_month"),
        F.month("date_actual").alias("month_actual"),
        F.date_format("date_actual", "MMMM").alias("month_name"),
        F.quarter("date_actual").alias("quarter_actual"),
        F.year("date_actual").alias("year_actual"),
    )


def dim_location(business: DataFrame) -> DataFrame:
    """Deduped location dimension, natural key (city, state, postal_code)
    (init/mysql_loader.py:137-147)."""
    return (
        business.select("city", "state", "postal_code", "latitude", "longitude")
        .dropDuplicates(["city", "state", "postal_code"])
    )


def dim_business(business: DataFrame) -> DataFrame:
    return business.dropDuplicates(["business_id"]).select(
        "business_id",
        F.col("name").alias("business_name"),
        "city",
        "state",
        "postal_code",
        "stars",
        "review_count",
        (F.col("is_open") == 1).alias("is_open"),
    )


def business_category(business: DataFrame) -> DataFrame:
    """M:N bridge: split + trim the comma-separated categories string
    (init/mysql_loader.py:425-429; init/mongodb_loader.py:152-153)."""
    cats = F.transform(F.split(F.col("categories"), ","), lambda c: F.trim(c))
    return (
        business.filter(F.col("categories").isNotNull() & (F.col("categories") != ""))
        .select("business_id", F.explode(cats).alias("category_name"))
        .filter(F.col("category_name") != "")
        .distinct()
    )


def dim_user(user: DataFrame) -> DataFrame:
    """yelping_since parsed with optional time suffix
    (init/mysql_loader.py:521-526); null names default 'Unknown' (:531)."""
    return user.dropDuplicates(["user_id"]).select(
        "user_id",
        F.coalesce("name", F.lit("Unknown")).alias("name"),
        "review_count",
        F.to_date(F.split("yelping_since", " ")[0]).alias("yelping_since"),
        "fans",
        "average_stars",
    )


def review_facts(review: DataFrame, business: DataFrame) -> DataFrame:
    """fact_review: required-field validation (S2), semi-join business filter
    (S3), date truncated to day (init/mysql_loader.py:641-642), dedup on PK."""
    b = business.select("business_id")
    return (
        review.na.drop(subset=["review_id", "business_id", "user_id", "stars", "date"])
        .join(b, "business_id", "left_semi")
        .dropDuplicates(["review_id"])
        .select(
            "review_id",
            "business_id",
            "user_id",
            "stars",
            F.to_date(F.split("date", " ")[0]).alias("review_date"),
            F.col("useful").alias("useful_votes"),
            F.col("funny").alias("funny_votes"),
            F.col("cool").alias("cool_votes"),
            "text",
        )
    )


def checkin_timestamps(checkin: DataFrame, business: DataFrame) -> DataFrame:
    """Per-timestamp checkin rows (business_id, checkin_ts) from the
    polymorphic date payload (init/mysql_loader.py:791-802;
    init/mongodb_loader.py:328-349).

    Branch-parse: if the raw string is a JSON object ({day: "times"}),
    take its values; else treat it as a comma-joined timestamp list.
    Timestamp grain is kept (like the reference's MongoDB path) so hour
    histograms are computed from real data — the reference's MySQL path
    fabricates them (SURVEY.md §8, webapp/mysql_routes.py:231-280).
    """
    is_map = F.col("date").startswith("{")
    map_times = F.concat_ws(
        ",", F.map_values(F.from_json("date", "map<string,string>"))
    )
    flat = F.when(is_map, map_times).otherwise(F.col("date"))
    ts = F.explode(F.transform(F.split(flat, ","), lambda t: F.trim(t))).alias("ts_raw")
    b = business.select("business_id")
    return (
        checkin.na.drop(subset=["business_id", "date"])
        .join(b, "business_id", "left_semi")
        .select("business_id", ts)
        .filter(F.col("ts_raw") != "")
        .select("business_id", F.to_timestamp("ts_raw").alias("checkin_ts"))
        .filter(F.col("checkin_ts").isNotNull())
    )


def checkin_facts(checkin: DataFrame, business: DataFrame) -> DataFrame:
    """fact_checkin: per-(business, day) counts over the exploded timestamps
    (init/mysql_loader.py:804-811)."""
    return (
        checkin_timestamps(checkin, business)
        .groupBy("business_id", F.col("checkin_ts").cast("date").alias("checkin_date"))
        .agg(F.count("*").alias("checkin_count"))
    )


def tip_facts(tip: DataFrame, business: DataFrame) -> DataFrame:
    b = business.select("business_id")
    return (
        tip.na.drop(subset=["business_id", "user_id", "date"])
        .join(b, "business_id", "left_semi")
        .select(
            "business_id",
            "user_id",
            "text",
            F.to_date(F.split("date", " ")[0]).alias("tip_date"),
            "compliment_count",
        )
    )


def business_summary(
    business: DataFrame, reviews: DataFrame, checkins: DataFrame, tips: DataFrame
) -> DataFrame:
    """summary_business_performance rebuild (A14): per-business totals via
    aggregate-then-left-join (init/mysql_loader.py:1080-1104). Null avg
    falls back to the business's own stars (IFNULL, :1086-1087)."""
    r = reviews.groupBy("business_id").agg(
        F.count("*").alias("total_reviews"), F.avg("stars").alias("avg_rating")
    )
    c = checkins.groupBy("business_id").agg(F.sum("checkin_count").alias("total_checkins"))
    t = tips.groupBy("business_id").agg(F.count("*").alias("total_tips"))
    return (
        business.select("business_id", "stars")
        .join(r, "business_id", "left")
        .join(c, "business_id", "left")
        .join(t, "business_id", "left")
        .select(
            "business_id",
            F.coalesce("total_reviews", F.lit(0)).alias("total_reviews"),
            F.coalesce("avg_rating", F.col("stars")).alias("avg_rating"),
            F.coalesce("total_checkins", F.lit(0)).alias("total_checkins"),
            F.coalesce("total_tips", F.lit(0)).alias("total_tips"),
        )
    )


def build_warehouse(
    spark: SparkSession, raw_dir: str, limits: dict | None = None
) -> dict[str, DataFrame]:
    """Full batch ETL graph (init/init.py:17-51 order: businesses, users,
    reviews, checkins, tips, summaries) as lazy DataFrames."""
    limits = DEFAULT_LIMITS if limits is None else limits
    business = read_entity(spark, raw_dir, "business", limits.get("business"))
    user = read_entity(spark, raw_dir, "user", limits.get("user"))
    review = read_entity(spark, raw_dir, "review", limits.get("review"))
    checkin = read_entity(spark, raw_dir, "checkin")
    tip = read_entity(spark, raw_dir, "tip")

    fact_review = review_facts(review, business)
    fact_checkin_ts = checkin_timestamps(checkin, business)
    fact_checkin = (
        fact_checkin_ts.groupBy(
            "business_id", F.col("checkin_ts").cast("date").alias("checkin_date")
        ).agg(F.count("*").alias("checkin_count"))
    )
    fact_tip = tip_facts(tip, business)
    return {
        "dim_time": dim_time(spark),
        "dim_location": dim_location(business),
        "dim_business": dim_business(business),
        "business_category": business_category(business),
        "dim_user": dim_user(user),
        "fact_review": fact_review,
        "fact_checkin": fact_checkin,
        "fact_checkin_ts": fact_checkin_ts,
        "fact_tip": fact_tip,
        "summary_business_performance": business_summary(
            business, fact_review, fact_checkin, fact_tip
        ),
        # raw documents — the "MongoDB collections" of the reference's
        # document model (init/mongodb_loader.py:68-93); consumed by the
        # document-flavored endpoints (attributes/schema/array analysis)
        "raw_business": business,
        "raw_user": user,
        "raw_review": review,
        "raw_checkin": checkin,
        "raw_tip": tip,
    }


def write_warehouse(tables: dict[str, DataFrame], out_dir: str) -> None:
    """Persist as parquet; facts partitioned by year for partition pruning.
    (S4 batched sink — batching/commit is Spark-internal; S5 dedup-upsert
    handled upstream via dropDuplicates.)"""
    for name, df in tables.items():
        if name.startswith("raw_"):
            continue  # raw documents stay at their source; only derived tables persist
        path = os.path.join(out_dir, name)
        if name == "fact_checkin_ts":
            df.withColumn("checkin_year", F.year("checkin_ts")).sortWithinPartitions(
                "business_id"
            ).write.mode("overwrite").partitionBy("checkin_year").parquet(path)
        elif name == "fact_review":
            df.withColumn("review_year", F.year("review_date")).sortWithinPartitions(
                "business_id"
            ).write.mode("overwrite").partitionBy("review_year").parquet(path)
        elif name == "fact_checkin":
            df.withColumn("checkin_year", F.year("checkin_date")).sortWithinPartitions(
                "business_id"
            ).write.mode("overwrite").partitionBy("checkin_year").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)
