"""tune_existing must land the correctness-critical conf trio — session
timezone (UTC), parquet NTZ inference off, AQE on — on a FOREIGN
SparkSession (the external driver supplies its own session; VERDICT r3 #6).
It silently skips non-settable confs, so this guards against the trio
silently not landing."""

from __future__ import annotations

from yelpdatawarehouse_spark.session import tune_existing

_TRIO = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
}

_FOREIGN = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.adaptive.enabled": "false",
}


def test_tune_existing_lands_critical_trio(spark):
    orig = {k: spark.conf.get(k) for k in _TRIO}
    try:
        for k, v in _FOREIGN.items():  # simulate a driver-configured session
            spark.conf.set(k, v)
        ret = tune_existing(spark)
        assert ret is spark
        for k, v in _TRIO.items():
            assert spark.conf.get(k) == v, f"{k} did not land"
    finally:
        for k, v in orig.items():
            spark.conf.set(k, v)


def test_tune_existing_idempotent(spark):
    tune_existing(tune_existing(spark))
    for k, v in _TRIO.items():
        assert spark.conf.get(k) == v


def test_table_cache_reuses_base_frame(spark):
    """table() memoizes the base frame per (applicationId, path) — the
    ~90ms parquet plan construction must happen once — while different
    paths stay distinct and confs are still re-pinned every call."""
    from yelpdatawarehouse_spark.sources.tables import spread, table

    a = table(spark, "/root/testdata/sf0.001", "documents")
    b = table(spark, "/root/testdata/sf0.001", "documents")
    assert a is b
    c = table(spark, "/root/testdata/sf0.01", "documents")
    assert c is not a
    # conf armor still applies on cached calls
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    table(spark, "/root/testdata/sf0.001", "documents")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # spread() probe is memoized too, and still rebalances the 1-row-group scan
    assert spread(a).rdd.getNumPartitions() >= a.rdd.getNumPartitions()
