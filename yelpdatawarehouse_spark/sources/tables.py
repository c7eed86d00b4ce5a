"""Harness table catalog.

The driver materializes deterministic synthetic parquet at
``/root/testdata/sf{0.001,0.01,0.1}/<table>.parquet`` (TESTDATA.md). Parquet
carries its own schema, so no inference is involved; the vectorized parquet
reader + predicate pushdown/column pruning are Catalyst built-ins.

Reference analog: the five Yelp JSON entity loads at
``init/mysql_loader.py:354-365`` (scan S1) — for the raw-JSON path with
explicit StructTypes see :mod:`yelpdatawarehouse_spark.sources.yelp`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables we always hint broadcastable in joins against facts.
DIMENSIONS = ("region", "nation", "supplier", "part", "customer")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The engine's canonical session timezone is UTC (presentation layer
    # renders ISO strings; oracles read tz-naive parquet values). Pinned here
    # — the single data entry point — because the driver may hand us a
    # session with any JVM-default timezone. Without this, every LTZ
    # timestamp rendering (date_format/dayname/window) would shift.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Some SF dirs store ts as timestamp[us] with no timezone; PySpark 4.1
    # would read that as TIMESTAMP_NTZ, which epoch functions (unix_micros)
    # reject. With the session pinned to UTC, plain TIMESTAMP is
    # value-identical, so disable NTZ inference at the same choke point.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name != "events":
        return spark.read.parquet(path)
    # events.ts is physically TIMESTAMP(NANOS), which Spark's vectorized
    # reader rejects. Read nanos as long, floor-convert to microseconds —
    # byte-identical to how nanos-unaware engines (e.g. DuckDB) read it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql path."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin rebalance a CPU-heavy NARROW stage whose source layout
    under-parallelizes it.

    Same argument as j5's documented pre-expansion rebalance: the scan
    sizes its tasks by input BYTES, so a small-but-CPU-dense input (one
    parquet row group of documents feeding heavy regex / codec kernels)
    runs the whole stage on one core — neither AQE nor
    files.maxPartitionBytes can split below a row-group boundary. One
    exchange of the compact source rows buys full-cluster parallelism for
    the expensive expressions downstream. No-op when the source already
    has enough splits (the 100 TB case — thousands of row groups), so the
    rebalance never costs an exchange where the layout is healthy.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
