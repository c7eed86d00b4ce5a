"""Count-min sketch operator (operators/cms.py): one-sided error,
mergeability, and unseen-key behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _exact(df, key):
    return {
        r[key]: r["n"]
        for r in df.groupBy(key).agg(F.count("*").alias("n")).collect()
    }


def test_estimate_never_undercounts(spark):
    li = table(spark, SF, "lineitem").select("l_partkey")
    sketch = cms_build(li, "l_partkey")
    keys = li.distinct()
    est = {
        r["l_partkey"]: r["cms_est"]
        for r in cms_estimate(sketch, keys, "l_partkey").collect()
    }
    exact = _exact(li, "l_partkey")
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_small_width_forces_overcount_but_never_under(spark):
    """With W far below key cardinality, collisions are guaranteed: some
    key must overcount, none may undercount — the CMS contract exactly."""
    li = table(spark, SF, "lineitem").select("l_partkey")
    sketch = cms_build(li, "l_partkey", width=8)
    est = {
        r["l_partkey"]: r["cms_est"]
        for r in cms_estimate(sketch, li.distinct(), "l_partkey", width=8).collect()
    }
    exact = _exact(li, "l_partkey")
    assert all(est[k] >= exact[k] for k in exact)
    assert any(est[k] > exact[k] for k in exact)


def test_merge_equals_single_build(spark):
    """Sketch(A) + Sketch(B) must equal Sketch(A union B) counter-for-
    counter — the re-aggregatability that makes incremental corpus
    sketching possible."""
    li = table(spark, SF, "lineitem").select("l_orderkey")
    a = cms_build(li.filter(F.col("l_orderkey") % 2 == 0), "l_orderkey")
    b = cms_build(li.filter(F.col("l_orderkey") % 2 == 1), "l_orderkey")
    merged = {
        (r["seed"], r["bucket"]): r["c"] for r in cms_merge(a, b).collect()
    }
    full = {
        (r["seed"], r["bucket"]): r["c"]
        for r in cms_build(li, "l_orderkey").collect()
    }
    assert merged == full


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """A sketch folded micro-batch by micro-batch over the event stream
    must equal the sketch built in one pass over the full table —
    counter addition is associative, so batching cannot show through."""
    from yelpdatawarehouse_spark.streaming.pipeline import (
        event_file_stream,
        read_cms,
        run_incremental_cms,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    ev = table(spark, SF, "events")
    for i in range(3):
        chunk = ev.filter(F.col("event_id") % 3 == i).toPandas()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        chunk.to_json(src / f"chunk_{i}.json", orient="records", lines=True)

    q = run_incremental_cms(
        spark,
        event_file_stream(spark, str(src)),
        "user_id",
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    streamed = {
        (r["seed"], r["bucket"]): r["c"]
        for r in read_cms(spark, str(tmp_path / "state")).collect()
    }
    batch = {
        (r["seed"], r["bucket"]): r["c"]
        for r in cms_build(ev.select("user_id"), "user_id").collect()
    }
    assert streamed == batch


def test_unseen_key_estimates_zero_or_collision(spark):
    """A key never observed gets 0 unless EVERY one of its d buckets
    collides with observed keys; with d=4 x W=256 over ~60 keys the
    all-collide probability is negligible, so assert 0."""
    nat = table(spark, SF, "nation").select("n_nationkey")
    sketch = cms_build(nat, "n_nationkey")
    ghost = spark.range(900000, 900001).select(
        F.col("id").alias("n_nationkey")
    )
    est = cms_estimate(sketch, ghost, "n_nationkey").collect()
    assert est[0]["cms_est"] == 0
