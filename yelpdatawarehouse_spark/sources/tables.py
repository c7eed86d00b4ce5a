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


# (applicationId, path) -> base DataFrame. The harness tables are immutable
# parquet and DataFrames are immutable plans, so the base frame can be built
# once per session: each fresh spark.read.parquet costs ~90 ms of driver
# time (file listing + footer schema read), which multiplied across a
# many-query session is pure overhead. Session confs are still (re)pinned on
# every call — they are the correctness contract, the cache only skips the
# plan construction. ASSUMPTION: each sf dir is immutable for the
# application lifetime; tools that regenerate/compact a table path
# in-session must call invalidate_table_cache() first.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The engine's canonical session timezone is UTC (presentation layer
    # renders ISO strings; oracles read tz-naive parquet values). Pinned here
    # — the single data entry point, on EVERY call (anything between queries
    # may have flipped the conf; tests/test_event_time_types.py guards this)
    # — because the driver may hand us a session with any JVM-default
    # timezone. Without this, every LTZ timestamp rendering
    # (date_format/dayname/window) would shift.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Some SF dirs store ts as timestamp[us] with no timezone; PySpark 4.1
    # would read that as TIMESTAMP_NTZ, which epoch functions (unix_micros)
    # reject. With the session pinned to UTC, plain TIMESTAMP is
    # value-identical, so disable NTZ inference at the same choke point.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        # events.ts is physically TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; the nanos conf must be set before the first read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, path)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name != "events":
        df = spark.read.parquet(path)
        df._ydw_scan_key = key
        _TABLE_CACHE[key] = df
        return df
    # Read nanos as long, floor-convert to microseconds — byte-identical to
    # how nanos-unaware engines (e.g. DuckDB) read it.
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df._ydw_scan_key = key
    _TABLE_CACHE[key] = df
    return df


def invalidate_table_cache(path_prefix: str | None = None) -> None:
    """Drop memoized frames/partition probes whose path starts with
    ``path_prefix`` (all entries when None). The caches assume each sf dir
    is immutable for the application lifetime; any tool that rewrites or
    compacts a table path in-session must call this first, or the stale
    file index surfaces as FileNotFoundException / stale rows.
    """
    for cache in (_TABLE_CACHE, _SCAN_PARTS):
        for key in [k for k in cache if path_prefix is None or k[1].startswith(path_prefix)]:
            del cache[key]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql path."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


# (applicationId, path) -> scan partition count, so repeated spread() calls
# on the same immutable table don't pay the DataFrame→RDD plan conversion
# (~90 ms of driver time per call) more than once per session.
_SCAN_PARTS: dict[tuple[str, str], int] = {}


def inherit_scan_key(derived: DataFrame, source: DataFrame) -> DataFrame:
    """Carry a table()'s memo key onto a derived frame whose scan layout is
    unchanged (projection/cast), so spread() can still skip the probe."""
    key = getattr(source, "_ydw_scan_key", None)
    if key is not None:
        derived._ydw_scan_key = key
    return derived


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

    The partition-count probe is memoized per (session, path) for frames
    produced by :func:`table` — the harness tables are immutable, and the
    probe costs a full plan→RDD conversion on the driver otherwise.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    key = getattr(df, "_ydw_scan_key", None)
    if key is not None and key in _SCAN_PARTS:
        n = _SCAN_PARTS[key]
    else:
        n = df.rdd.getNumPartitions()
        if key is not None:
            _SCAN_PARTS[key] = n
    if n >= target:
        return df
    return df.repartition(target)


def read_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVED schema (columns added over
    time) into one unified frame: ``mergeSchema`` unions the per-file
    schemas and rows from files that predate a column read it as NULL —
    the append-only schema-evolution contract every long-lived lake table
    relies on (adding a column never rewrites history). Renames/drops/type
    changes are NOT handled by parquet merging and need a real table
    format (Delta/Iceberg) — callers should treat this as the additive
    path only.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
