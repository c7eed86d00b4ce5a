from __future__ import annotations

import json

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running guard (scale-regression probe); runs in the "
        "default suite, deselectable with -m 'not slow'",
    )


@pytest.fixture(scope="session")
def spark():
    from yelpdatawarehouse_spark.session import get_spark

    s = get_spark(app_name="ydw-tests", cpus=8, **{"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def raw_dir(tmp_path_factory):
    """Yelp-shaped raw fixtures (FIXTURES.md family A): polymorphic checkin
    encodings, dangling FKs, duplicate PKs, mixed attribute encodings, plus
    enough cross-review structure for the graph/recommendation endpoints."""
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
        {"business_id": "b4", "name": "Diner Four", "city": "Shelbyville", "state": "IL",
         "postal_code": "62565", "latitude": 39.4, "longitude": -88.8, "stars": 4.0,
         "review_count": 5, "is_open": 1, "categories": "Diners, Cafes",
         "attributes": {"HasTV": "False", "GoodForKids": "True"}, "hours": {}},
    ]
    users = [
        {"user_id": "u1", "name": "Ann", "review_count": 5,
         "yelping_since": "2015-03-04", "fans": 2, "average_stars": 4.0,
         "friends": ["u2"]},
        {"user_id": "u2", "name": None, "review_count": 1,
         "yelping_since": "2018-07-01 12:30:00", "fans": 0, "average_stars": 3.0,
         "friends": []},
        {"user_id": "u3", "name": "Cal", "review_count": 2,
         "yelping_since": "2019-01-01", "fans": 1, "average_stars": 3.5,
         "friends": ["u1", "u2"]},
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
        {"review_id": "r5", "business_id": "b2", "user_id": "u3", "stars": 2,
         "date": "2021-03-05", "text": "meh", "useful": 0, "funny": 0, "cool": 0},
        {"review_id": "r6", "business_id": "b4", "user_id": "u3", "stars": 5,
         "date": "2021-04-10 12:00:00", "text": "best diner", "useful": 3, "funny": 0, "cool": 2},
    ]
    checkins = [
        # vintage 1: comma-joined timestamps (two on the same day)
        {"business_id": "b1",
         "date": "2019-01-15 10:00:00, 2019-01-15 22:10:00, 2019-01-16 09:00:00"},
        # vintage 2: {day: times} object — raw-string branch parse
        {"business_id": "b2",
         "date": {"Mon": "2020-06-01 08:00:00, 2020-06-08 08:30:00", "Tue": "2020-06-02 09:00:00"}},
        {"business_id": "b4", "date": "2021-04-11 13:30:00"},
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


@pytest.fixture(scope="session")
def wh(spark, raw_dir):
    from yelpdatawarehouse_spark.sources.etl import build_warehouse

    tables = build_warehouse(spark, raw_dir, limits={})
    return {k: v.cache() for k, v in tables.items()}
