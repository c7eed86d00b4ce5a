"""API façade: every endpoint's payload must be plain-JSON serializable and
shaped like the reference's response (pagination envelopes, dense chart
arrays, label/data pairs)."""

from __future__ import annotations

import json

import pytest

from yelpdatawarehouse_spark.api import YelpWarehouseAPI


@pytest.fixture(scope="module")
def api(wh):
    return YelpWarehouseAPI(wh)


def _json_roundtrips(payload):
    return json.loads(json.dumps(payload)) == json.loads(json.dumps(payload))


def test_all_payloads_json_serializable(api):
    payloads = [
        api.overview_stats(),
        api.top_businesses(category="Cafes"),
        api.business_checkins("b1"),
        api.city_ratings(),
        api.business_performance("b1"),
        api.business_reviews("b1"),
        api.search_businesses(query="cafe"),
        api.review_trends(now="2021-06-01"),
        api.monthly_distribution(),
        api.year_comparison(now="2021-12-31"),
        api.category_ratings(),
        api.category_volumes(),
        api.state_stats(),
        api.category_trends("Cafes"),
        api.top_users(),
        api.document_size_stats(),
        api.business_attributes(),
        api.schema_analysis(),
        api.array_field_analysis(),
        api.document_structure(),
        api.graph_overview_stats(),
        api.graph_search_businesses(user_reviewed="u3"),
        api.business_network("b1"),
        api.business_recommendations("b1"),
        api.user_recommendations("u2"),
        api.connection_path("b1", "b4"),
        api.graph_analytics(),
        api.debug(),
        api.health(),
    ]
    for p in payloads:
        assert _json_roundtrips(p)


def test_reference_payload_shapes(api):
    tb = api.top_businesses(category="Cafes", limit=1, page=1)
    assert set(tb) == {"businesses", "pagination"}
    assert set(tb["pagination"]) == {"total", "page", "limit", "pages"}

    ck = api.business_checkins("b1")
    assert len(ck["day_distribution"]) == 7
    assert len(ck["month_distribution"]) == 12
    assert len(ck["hour_distribution"]) == 24

    yc = api.year_comparison(now="2021-12-31")
    assert len(yc["labels"]) == 12
    assert all(len(v) == 12 for v in yc["data"].values())

    tr = api.review_trends(now="2021-06-01")
    assert tr["dates"] == ["2020-06-01", "2021-03-01", "2021-04-01"]

    ds = api.document_size_stats()
    assert ds["size_ranges"][0] == "<1KB" and sum(ds["document_counts"]) == 18


def test_register_views_sql_access(api, spark):
    api.register_views(spark, prefix="ydw_")
    n = spark.sql("SELECT count(*) AS c FROM ydw_fact_review").collect()[0]["c"]
    assert n == 5


def test_date_coercion(api):
    reviews = api.business_reviews("b1")["reviews"]
    assert all(isinstance(r["review_date"], str) and "-" in r["review_date"] for r in reviews)
