"""Small-file compaction: correctness (bag-identical data), file-count
reduction, and clustering restoration."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.maintenance import compact_parquet, layout_stats
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _bag(df):
    return sorted(repr(sorted(r.asDict().items())) for r in df.collect())


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    target = str(tmp_path / "orders_frag")
    # simulate micro-batch fragmentation: 40 tiny files
    table(spark, SF, "orders").repartition(40).write.parquet(target)
    before = layout_stats(target)
    assert before.n_files >= 40

    want = _bag(spark.read.parquet(target))
    after = compact_parquet(spark, target, target_file_bytes=1 << 30)

    assert after.n_files < before.n_files
    assert after.n_files == 1  # everything fits one target-sized file
    assert after.total_bytes > 0
    assert _bag(spark.read.parquet(target)) == want


def test_compact_sorted_restores_clustering(spark, tmp_path):
    target = str(tmp_path / "orders_sorted")
    table(spark, SF, "orders").repartition(16).write.parquet(target)

    compact_parquet(
        spark, target, target_file_bytes=8 * 1024, sort_by=["o_orderdate"]
    )
    after = layout_stats(target)
    assert after.n_files > 1  # range-partitioned into multiple files

    # clustering: per-file [min, max] o_orderdate ranges must not overlap
    ranges = (
        spark.read.parquet(target)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next

    # data unchanged
    assert (
        spark.read.parquet(target).count()
        == table(spark, SF, "orders").count()
    )


def test_compact_recovers_from_interrupted_swap(spark, tmp_path):
    """Crash between the two swap renames leaves data in '._old'; the next
    invocation must restore it and complete a normal compaction."""
    import os

    target = str(tmp_path / "orders_crash")
    table(spark, SF, "orders").repartition(8).write.parquet(target)
    want = _bag(spark.read.parquet(target))

    # simulate: crashed after os.rename(path, old), before tmp -> path
    os.rename(target, target + "._old")
    # plus a stale partial rewrite
    os.makedirs(target + "._compacting")

    after = compact_parquet(spark, target, target_file_bytes=1 << 30)
    assert after.n_files == 1
    assert _bag(spark.read.parquet(target)) == want
    assert not os.path.exists(target + "._old")
    assert not os.path.exists(target + "._compacting")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """The partition-key predicate must become a PartitionFilter (pruned
    before any file opens), not merely a pushed data filter."""
    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.operators.maintenance import (
        partition_pruned_scan,
        write_partitioned,
    )
    from yelpdatawarehouse_spark.sources.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, ["event_type"])

    import os

    subdirs = [d for d in os.listdir(out) if d.startswith("event_type=")]
    assert len(subdirs) >= 2  # actually hive-partitioned on disk

    pruned = partition_pruned_scan(spark, out, event_type="purchase")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the equality must appear in the partition filters, not only pushed
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "purchase" in pf or "event_type" in pf
    # values survive the round trip
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert pruned.count() == expected


def test_schema_evolution_read(spark, tmp_path):
    """Files written before a column existed read as NULL for it; the
    merged schema is the union, and old rows keep their values."""
    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.sources.tables import read_evolved, table

    old = table(spark, "/root/testdata/sf0.001", "nation").select(
        "n_nationkey", "n_name"
    )
    new = table(spark, "/root/testdata/sf0.001", "nation").select(
        "n_nationkey", "n_name", F.lit("extra").alias("n_comment2")
    )
    p_old, p_new = str(tmp_path / "v1"), str(tmp_path / "v2")
    old.write.parquet(p_old)
    new.write.parquet(p_new)

    merged = read_evolved(spark, p_old, p_new)
    assert set(merged.columns) == {"n_nationkey", "n_name", "n_comment2"}
    assert merged.count() == old.count() + new.count()
    # pre-evolution rows surface the new column as NULL, new rows keep it
    assert merged.filter(F.col("n_comment2").isNull()).count() == old.count()
    assert merged.filter(F.col("n_comment2") == "extra").count() == new.count()
