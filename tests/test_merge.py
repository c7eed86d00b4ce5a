"""merge_upsert (operators/merge.py): fallback-path semantics — replace vs
insert-only, in-batch duplicate resolution, crash-remnant recovery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.merge import merge_upsert


def _read(spark, d):
    return {
        (r.k,): (r.v, r.tag) for r in spark.read.parquet(d).collect()
    }


def test_merge_replaces_matched_and_inserts_new(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], ["k", "v", "tag"]).write.parquet(d)
    upd = spark.createDataFrame([(2, 99, "B"), (3, 30, "c")], ["k", "v", "tag"])
    merge_upsert(spark, d, upd, keys=["k"])
    assert _read(spark, d) == {(1,): (10, "a"), (2,): (99, "B"), (3,): (30, "c")}


def test_merge_insert_only_keeps_existing(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.createDataFrame([(1, 10, "a")], ["k", "v", "tag"]).write.parquet(d)
    upd = spark.createDataFrame([(1, 99, "X"), (2, 20, "b")], ["k", "v", "tag"])
    merge_upsert(spark, d, upd, keys=["k"], insert_only=True)
    assert _read(spark, d) == {(1,): (10, "a"), (2,): (20, "b")}


def test_merge_resolves_in_batch_duplicates_deterministically(spark, tmp_path):
    d = str(tmp_path / "t")
    upd = spark.createDataFrame(
        [(1, 5, "x"), (1, 7, "y"), (1, 6, "z")], ["k", "v", "tag"]
    )
    merge_upsert(spark, d, upd, keys=["k"])
    # max-struct resolution: (7, "y") wins regardless of partition order
    assert _read(spark, d) == {(1,): (7, "y")}


def test_merge_creates_table_and_recovers_stale_old_dir(spark, tmp_path):
    d = str(tmp_path / "t")
    merge_upsert(spark, d, spark.createDataFrame([(1, 1, "a")], ["k", "v", "tag"]), ["k"])
    # simulate a crash between the two renames: data sits in ._old only
    os.rename(d, d + "._old")
    merge_upsert(spark, d, spark.createDataFrame([(2, 2, "b")], ["k", "v", "tag"]), ["k"])
    assert _read(spark, d) == {(1,): (1, "a"), (2,): (2, "b")}


def test_merge_key_only_updates(spark, tmp_path):
    """Pure key-set upsert: updates with ONLY key columns (no payload) must
    not fail at analysis time (regression: F.struct() of zero columns) and
    must behave as DISTINCT-key insert."""
    d = str(tmp_path / "t")
    spark.createDataFrame([(1,), (2,)], ["k"]).write.parquet(d)
    upd = spark.createDataFrame([(2,), (2,), (3,), (3,)], ["k"])
    merge_upsert(spark, d, upd, keys=["k"])
    assert {r.k for r in spark.read.parquet(d).collect()} == {1, 2, 3}
    assert spark.read.parquet(d).count() == 3  # no duplicate keys inserted
