"""SparkSession factory with scale-oriented defaults.

The reference delegates execution to MySQL/MongoDB/Neo4j (SURVEY.md §4);
our engine delegates to Catalyst/Tungsten. This module centralizes the
session configuration so every entry point (tests, bench, driver contract)
runs with the same tuned settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the harness box (local[32], 128 GiB) but expressed so
# they scale: AQE owns runtime partition sizing, broadcast threshold covers
# every dimension table (region/nation/supplier/part are all tiny relative
# to facts), shuffle partitions match core count and AQE coalesces down.
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    # testdata parquet stores timestamps as timestamp[us] with no tz; without
    # this, PySpark 4.1 reads them as TIMESTAMP_NTZ and epoch functions
    # (unix_micros & co.) reject the column. With the session pinned to UTC,
    # reading as TIMESTAMP is value-identical to DuckDB's semantics.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": "16g",
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
}


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "yelpdatawarehouse-spark",
    cpus: int | None = None,
    **overrides: str,
) -> SparkSession:
    """Create (or reuse) the engine session.

    ``overrides`` are raw Spark conf key/values and win over defaults.
    """
    cpus = cpus or default_cpus()
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(cpus)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally provided session
    (the driver passes us its own SparkSession)."""
    for k, v in _DEFAULTS.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # some confs are not runtime-settable; fine
    return spark
