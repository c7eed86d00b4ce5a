"""Streaming state introspection via the Spark 4 state data source.

Long-running stateful streams (the T4/T5 incremental counters, windowed
aggregations, dedup watermark state in pipeline.py) accumulate opaque
per-key state inside the checkpoint. At production scale the questions an
operator actually asks — "how many keys is this query carrying?", "is the
state skewed onto one shuffle partition?", "what does the buffer for THIS
key currently hold?" — cannot be answered from the output stream. Spark 4
ships a batch data source over the checkpoint for exactly this:

* ``spark.read.format("state-metadata")`` — one row per stateful operator
  (operator id/name, partition count, batch id range);
* ``spark.read.format("statestore")`` — the live key/value state rows of
  one operator at one batch, as typed structs.

These are thin, declarative readers (a parquet-like scan over the
checkpoint's delta/snapshot files) — no query restart, no state rebuild,
and read-only, so they are safe against a checkpoint a live query is
still writing (they read committed batch versions).

Scale: the reader parallelises over state partitions (one task per
shuffle partition of the stateful operator), so profiling 10k-partition
production state is itself a distributed job, and the skew profile below
aggregates map-side — nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_operator_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator-level view of a checkpoint: operator id/name, state store
    name(s), partition count, min/max batch id with retained state."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def state_rows(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Key/value state of one stateful operator as a batch DataFrame
    (columns: ``key`` struct, ``value`` struct, ``partition_id``).

    Defaults to the latest committed batch; pass ``batch_id`` to time
    travel to any retained version (the debugging move for "when did this
    key's buffer go wrong"). ``join_side`` ("left"/"right") selects a
    stream-stream join's buffers; ``store_name`` a named store.
    """
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    if join_side is not None:
        r = r.option("joinSide", join_side)
    return r.load(checkpoint_dir)


def state_partition_profile(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
) -> DataFrame:
    """Per-state-partition key counts plus a global skew ratio
    (``max_keys / avg_keys``) — the diagnostic that tells an operator
    whether a stateful query needs key salting or more shuffle partitions
    BEFORE it falls over, computed distributed (map-side combine on
    ``partition_id``, then a broadcast of the 1-row global stats).
    """
    per = (
        state_rows(spark, checkpoint_dir, operator_id)
        .groupBy("partition_id")
        .agg(F.count("*").cast("long").alias("n_keys"))
    )
    totals = per.agg(
        F.max("n_keys").alias("_max"),
        F.avg("n_keys").alias("_avg"),
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "partition_id",
            "n_keys",
            F.round(F.col("n_keys") / F.col("_avg"), 4).alias("vs_avg"),
            F.round(F.col("_max") / F.col("_avg"), 4).alias("global_skew_ratio"),
        )
        .orderBy("partition_id")
    )
