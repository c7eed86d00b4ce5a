"""Yelp-shaped ETL tests (FIXTURES.md family A/B): polymorphic checkin dates,
dangling FK semi-join drops, category split/trim, PK dedup, summary totals."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.sources.etl import build_warehouse


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("yelp_raw")
    biz = [
        {"business_id": "b1", "name": "Cafe One", "city": "Springfield", "state": "IL",
         "postal_code": "62701", "latitude": 39.8, "longitude": -89.6, "stars": 4.5,
         "review_count": 10, "is_open": 1, "categories": "Restaurants, Cafes",
         "attributes": {"GoodForKids": "True", "BusinessParking": "{'lot': True}"},
         "hours": {}},
        {"business_id": "b2", "name": "Bar Two", "city": "Springfield", "state": "IL",
         "postal_code": "62701", "latitude": 39.8, "longitude": -89.6, "stars": 2.0,
         "review_count": 3, "is_open": 0, "categories": "Bars,Restaurants",
         "attributes": None, "hours": None},
        {"business_id": "b3", "name": "No Cat", "city": "Shelbyville", "state": "IL",
         "postal_code": "62565", "latitude": None, "longitude": None, "stars": 3.0,
         "review_count": 0, "is_open": 1, "categories": None, "attributes": None,
         "hours": None},
    ]
    users = [
        {"user_id": "u1", "name": "Ann", "review_count": 5,
         "yelping_since": "2015-03-04", "fans": 2, "average_stars": 4.0,
         "friends": ["u2"]},
        {"user_id": "u2", "name": None, "review_count": 1,
         "yelping_since": "2018-07-01 12:30:00", "fans": 0, "average_stars": 3.0,
         "friends": []},
    ]
    reviews = [
        {"review_id": "r1", "business_id": "b1", "user_id": "u1", "stars": 5,
         "date": "2019-01-15 08:00:00", "text": "great", "useful": 1, "funny": 0, "cool": 0},
        {"review_id": "r2", "business_id": "b1", "user_id": "u2", "stars": 3,
         "date": "2019-02-20", "text": "ok", "useful": 0, "funny": 0, "cool": 0},
        {"review_id": "r2", "business_id": "b1", "user_id": "u2", "stars": 3,
         "date": "2019-02-20", "text": "dup pk", "useful": 0, "funny": 0, "cool": 0},
        {"review_id": "r3", "business_id": "GONE", "user_id": "u1", "stars": 1,
         "date": "2019-03-01", "text": "dangling biz", "useful": 0, "funny": 0, "cool": 0},
        {"review_id": "r4", "business_id": "b2", "user_id": "u1", "stars": 4,
         "date": "2020-06-10 19:45:12", "text": "fine", "useful": 2, "funny": 1, "cool": 1},
    ]
    checkins = [
        # vintage 1: comma-joined timestamps (two on the same day)
        {"business_id": "b1",
         "date": "2019-01-15 10:00:00, 2019-01-15 22:10:00, 2019-01-16 09:00:00"},
        # vintage 2: {day: times} object — raw-string branch parse
        {"business_id": "b2",
         "date": {"Mon": "2020-06-01 08:00:00, 2020-06-08 08:30:00", "Tue": "2020-06-02 09:00:00"}},
        {"business_id": "GONE", "date": "2020-01-01 00:00:00"},
    ]
    tips = [
        {"business_id": "b1", "user_id": "u1", "text": "try the pie",
         "date": "2019-05-05", "compliment_count": 2},
        {"business_id": "GONE", "user_id": "u1", "text": "dangling",
         "date": "2019-05-06", "compliment_count": 0},
    ]
    for name, rows in [("business", biz), ("user", users), ("review", reviews),
                       ("checkin", checkins), ("tip", tips)]:
        with open(d / f"{name}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return str(d)


@pytest.fixture(scope="module")
def wh(spark, raw_dir):
    tables = build_warehouse(spark, raw_dir, limits={})
    return {k: v.cache() for k, v in tables.items()}


def test_dim_time_range(wh):
    t = wh["dim_time"]
    assert t.count() == 7305  # 2004-01-01..2023-12-31, init/mysql_loader.py:246-247
    row = t.filter(F.col("date_actual") == "2019-01-15").collect()[0]
    assert row.day_of_week == "Tuesday" and row.quarter_actual == 1


def test_dims(wh):
    assert wh["dim_business"].count() == 3
    assert wh["dim_location"].count() == 2  # (Springfield, Shelbyville)
    cats = {
        (r.business_id, r.category_name) for r in wh["business_category"].collect()
    }
    assert cats == {("b1", "Restaurants"), ("b1", "Cafes"), ("b2", "Bars"), ("b2", "Restaurants")}
    u2 = wh["dim_user"].filter(F.col("user_id") == "u2").collect()[0]
    assert u2.name == "Unknown" and str(u2.yelping_since) == "2018-07-01"


def test_review_facts_semijoin_dedup_truncation(wh):
    fr = wh["fact_review"]
    assert {r.review_id for r in fr.collect()} == {"r1", "r2", "r4"}  # dangling + dup dropped
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
    }


def test_summary_totals(wh):
    s = {r.business_id: r for r in wh["summary_business_performance"].collect()}
    assert s["b1"].total_reviews == 2 and s["b1"].avg_rating == 4.0
    assert s["b1"].total_checkins == 3 and s["b1"].total_tips == 1
    assert s["b2"].total_reviews == 1 and s["b2"].total_checkins == 3
    # no reviews → avg falls back to business stars (IFNULL semantics)
    assert s["b3"].total_reviews == 0 and s["b3"].avg_rating == 3.0
