"""Table-maintenance operators: small-file compaction and layout stats.

The silent killer of 100 TB parquet lakes is file-count explosion:
streaming micro-batches and over-parallel writes leave thousands of
KB-sized files per partition, and every downstream scan then pays one
file-open + footer-read per file (driver-side listing grows linearly
too). The fix is periodic compaction: rewrite each table partition's
files into ~target-sized outputs.

Reference analog: none — the reference's stores (MySQL/MongoDB/Neo4j)
manage their own pages. This is the lake-format counterpart every Spark
warehouse needs (Delta/Iceberg expose it as OPTIMIZE / rewrite_data_files;
plain parquet directories need it hand-rolled like this).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class LayoutStats:
    n_files: int
    total_bytes: int

    @property
    def avg_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def layout_stats(path: str) -> LayoutStats:
    """File-count / size profile of a parquet directory (recursive)."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return LayoutStats(n_files=n, total_bytes=total)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> LayoutStats:
    """Rewrite a parquet directory into ~target-sized files.

    The output file count is computed from the CURRENT on-disk bytes (the
    honest predictor of rewritten size — same codec, same data), then the
    data is rewritten through a single repartition: round-robin when no
    sort is requested, or a range-partitioned sortWithinPartitions when
    ``sort_by`` is given — the latter restores clustering (min/max file
    skipping) that incremental appends destroy, at the cost of one range
    exchange instead of a cheap coalesce.

    Writes to a sibling temp dir, then swaps via two renames. Crash
    safety: stale ``._compacting`` / ``._old`` dirs from an interrupted
    run are cleaned up (or recovered) on entry — a crash after the first
    rename leaves the data intact in ``._old``, and the next invocation
    restores it before proceeding — so data is never lost and the
    operator is re-runnable after any interruption. (True single-rename
    atomicity needs a manifest/table format — Delta/Iceberg — which is
    where this operator points at production scale.)

    At cluster scale this runs per table-partition (e.g. per day), so the
    unit of rewrite is bounded and compactions parallelize across
    partitions; this single-directory form IS that per-partition unit.
    """
    import shutil

    tmp = path.rstrip("/") + "._compacting"
    old = path.rstrip("/") + "._old"
    # recover/clean up any interrupted previous run
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)  # crashed between the two renames
        else:
            shutil.rmtree(old)  # crashed before the final cleanup
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # incomplete rewrite, redo from source

    before = layout_stats(path)
    if before.n_files == 0:
        return before
    n_out = max(1, round(before.total_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(tmp)

    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return layout_stats(path)


def write_partitioned(
    df,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write (`path/col=value/...`) — the
    layout that turns a 100 TB fact scan with a partition-key predicate
    into a directory-listing problem: the reader prunes whole partitions
    BEFORE opening a single file (PartitionFilters in the scan node, as
    opposed to PushedFilters which still reads footers). Partition columns
    should be low-cardinality (date, region, event type); high-cardinality
    keys belong in bucketing (operators/bucketing.py) or range layout
    (compact_parquet sort_by) instead, or the write itself recreates the
    small-file problem this module's compactor exists to fix.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def partition_pruned_scan(spark: SparkSession, path: str, **equals):
    """Read a partitioned table with partition-key equality predicates
    applied immediately, so Catalyst turns them into PartitionFilters
    (verified by tests/test_maintenance.py against the executed plan)."""
    from functools import reduce

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if equals:
        cond = reduce(
            lambda a, b: a & b, (F.col(k) == v for k, v in equals.items())
        )
        df = df.filter(cond)
    return df
