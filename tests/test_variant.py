"""VARIANT storage semantics (queries/variantq.py's scale claims):
binary-encoded VARIANT columns must round-trip through parquet with
typed path access intact, and malformed input must degrade to NULL under
try_parse_json instead of failing the job."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_variant_parquet_roundtrip(spark, tmp_path):
    ev = table(spark, SF, "events").limit(200)
    v = ev.select("event_id", F.parse_json("props").alias("pv"))
    out = str(tmp_path / "variant.parquet")
    v.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["pv"] == "variant"
    want = {
        r["event_id"]: r["k"]
        for r in ev.select(
            "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
        ).collect()
    }
    got = {
        r["event_id"]: r["k"]
        for r in back.select(
            "event_id", F.variant_get("pv", "$.k", "long").alias("k")
        ).collect()
    }
    assert got == want


def test_malformed_json_degrades_to_null(spark):
    df = spark.createDataFrame(
        [('{"k": 1}',), ("not json at all",), (None,)], "props string"
    )
    out = df.select(
        F.try_variant_get(F.try_parse_json("props"), "$.k", "long").alias("k")
    ).collect()
    assert [r["k"] for r in out] == [1, None, None]
