"""Bucketed physical layout: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of fact⋈fact joins and repeated same-key
aggregations is the shuffle. Hive-style bucketing pre-partitions data by
``hash(key) % n_buckets`` AT WRITE TIME, so every subsequent join or groupBy
on that key reads co-located buckets and skips the Exchange entirely —
one write-time shuffle amortized over every downstream query.

The reference's analog is secondary indexing (SURVEY.md §4: MongoDB/Neo4j
indexes on business_id) — the "organize data by access key once" idea,
re-expressed as Spark physical layout.

Usage pattern (tested in tests/test_bucketing.py):

    write_bucketed(facts, "fact_review_b", key="business_id", n_buckets=32)
    write_bucketed(summary, "summary_b", key="business_id", n_buckets=32)
    joined = spark.table("fact_review_b").join(spark.table("summary_b"), "business_id")
    # .explain(): SortMergeJoin with NO Exchange on either side

Both sides must use the same bucket count (or a divisor, with
`spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) table — external at
    ``path`` if given, else managed in the session warehouse dir. Sorting
    within buckets additionally removes the Sort from sort-merge joins and
    enables row-group min/max skipping on the sort key."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE Exchange (hash/range/
    single-partition repartitioning) — the assertion primitive for
    co-location tests. BroadcastExchange does not count: it replicates a
    small relation, it does not repartition the big one."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.search(r"(?<!Broadcast)Exchange", plan) is not None


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (no Exchange)."""
    return spark.table(left_table).join(spark.table(right_table), key)
