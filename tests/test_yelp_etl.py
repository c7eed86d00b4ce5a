"""Yelp-shaped ETL tests (FIXTURES.md family A/B): polymorphic checkin dates,
dangling FK semi-join drops, category split/trim, PK dedup, summary totals.
Fixtures (raw_dir, wh) live in conftest.py, shared with test_endpoints.py."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dim_time_range(wh):
    t = wh["dim_time"]
    assert t.count() == 7305  # 2004-01-01..2023-12-31, init/mysql_loader.py:246-247
    row = t.filter(F.col("date_actual") == "2019-01-15").collect()[0]
    assert row.day_of_week == "Tuesday" and row.quarter_actual == 1


def test_dims(wh):
    assert wh["dim_business"].count() == 4
    assert wh["dim_location"].count() == 2  # (Springfield, Shelbyville)
    cats = {
        (r.business_id, r.category_name) for r in wh["business_category"].collect()
    }
    assert cats == {
        ("b1", "Restaurants"), ("b1", "Cafes"),
        ("b2", "Bars"), ("b2", "Restaurants"),
        ("b4", "Diners"), ("b4", "Cafes"),
    }
    u2 = wh["dim_user"].filter(F.col("user_id") == "u2").collect()[0]
    assert u2.name == "Unknown" and str(u2.yelping_since) == "2018-07-01"


def test_review_facts_semijoin_dedup_truncation(wh):
    fr = wh["fact_review"]
    # dangling + dup dropped
    assert {r.review_id for r in fr.collect()} == {"r1", "r2", "r4", "r5", "r6"}
    r1 = fr.filter(F.col("review_id") == "r1").collect()[0]
    assert str(r1.review_date) == "2019-01-15"  # day truncation


def test_checkin_polymorphic_explode(wh):
    fc = wh["fact_checkin"]
    got = {(r.business_id, str(r.checkin_date)): r.checkin_count for r in fc.collect()}
    assert got == {
        ("b1", "2019-01-15"): 2,
        ("b1", "2019-01-16"): 1,
        ("b2", "2020-06-01"): 1,
        ("b2", "2020-06-08"): 1,
        ("b2", "2020-06-02"): 1,
        ("b4", "2021-04-11"): 1,
    }
    # timestamp grain retained for real hour histograms (SURVEY.md §8)
    hours = {
        r.h
        for r in wh["fact_checkin_ts"]
        .filter(F.col("business_id") == "b1")
        .select(F.hour("checkin_ts").alias("h"))
        .collect()
    }
    assert hours == {10, 22, 9}


def test_summary_totals(wh):
    s = {r.business_id: r for r in wh["summary_business_performance"].collect()}
    assert s["b1"].total_reviews == 2 and s["b1"].avg_rating == 4.0
    assert s["b1"].total_checkins == 3 and s["b1"].total_tips == 1
    assert s["b2"].total_reviews == 2 and s["b2"].total_checkins == 3
    # no reviews → avg falls back to business stars (IFNULL semantics)
    assert s["b3"].total_reviews == 0 and s["b3"].avg_rating == 3.0
    assert s["b4"].total_reviews == 1 and s["b4"].avg_rating == 5.0


def test_write_warehouse_roundtrip(spark, wh, tmp_path_factory):
    """Persisted layout: facts partitioned by year (partition pruning) and
    sorted by business_id within files; raw_* not persisted; every derived
    table round-trips value-identical."""
    import os

    from yelpdatawarehouse_spark.sources.etl import write_warehouse

    out = str(tmp_path_factory.mktemp("wh_out"))
    write_warehouse(wh, out)
    assert not any(d.startswith("raw_") for d in os.listdir(out))
    # year partition dirs exist for facts
    assert any(d.startswith("review_year=") for d in os.listdir(os.path.join(out, "fact_review")))
    for name, df in wh.items():
        if name.startswith("raw_"):
            continue
        back = spark.read.parquet(os.path.join(out, name))
        cols = df.columns  # partition column ordering may differ; compare on source cols
        a = df.select(cols)
        b = back.select(cols)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), name


def test_read_entity_with_quarantine(spark, tmp_path):
    """PERMISSIVE read splits one scan into typed good rows + verbatim
    quarantined lines (the audit-trail upgrade over the reference's silent
    line skips, init/mysql_loader.py:358-364)."""
    from yelpdatawarehouse_spark.sources.yelp import read_entity_with_quarantine

    p = tmp_path / "tip.json"
    p.write_text(
        '{"business_id": "b1", "user_id": "u1", "text": "ok", "date": "2020-01-01", "compliment_count": 1}\n'
        "this is not json at all\n"
        '{"business_id": "b2", "user_id": "u2", "text": "also ok", "date": "2020-01-02", "compliment_count": 0}\n'
        '{"business_id": "b3", "unterminated": \n'
    )
    good, bad = read_entity_with_quarantine(spark, str(tmp_path), "tip")
    rows = good.collect()
    assert {r.business_id for r in rows} == {"b1", "b2"}
    assert "_corrupt_record" not in good.columns
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "this is not json at all" in bad_lines
