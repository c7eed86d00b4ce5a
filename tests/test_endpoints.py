"""Endpoint-layer tests: every SURVEY.md Appendix A endpoint runs against the
Yelp fixture warehouse, with exact expectations derived by hand from the
fixture (the strongest available oracle at this scale — the reference has no
tests, SURVEY.md §5)."""

from __future__ import annotations

from yelpdatawarehouse_spark.queries import endpoints as E


# --- relational family ------------------------------------------------------


def test_overview_stats(wh):
    r = E.overview_stats(wh)
    assert r["business_count"] == 4
    assert r["review_count"] == 5
    assert r["user_count"] == 3
    cats = {(x.category_name, x["count"]) for x in r["category_stats"].collect()}
    assert cats == {("Cafes", 2), ("Restaurants", 2), ("Bars", 1), ("Diners", 1)}
    stars = {(x.stars, x["count"]) for x in r["star_distribution"].collect()}
    assert stars == {(2, 1), (3, 1), (4, 1), (5, 2)}


def test_top_businesses_pagination(wh):
    r = E.top_businesses(wh, category="Cafes", limit=1, page=1)
    rows = r["businesses"].collect()
    assert [x.business_id for x in rows] == ["b1"]  # 4.5 stars beats 4.0
    assert r["pagination"] == {"total": 2, "page": 1, "limit": 1, "pages": 2}
    page2 = E.top_businesses(wh, category="Cafes", limit=1, page=2)
    assert [x.business_id for x in page2["businesses"].collect()] == ["b4"]


def test_business_checkins_real_hours(wh):
    r = E.business_checkins(wh, "b1")
    day = E.present_distribution(r["day_distribution"], "day_of_week", "checkin_count", 7)
    # 2019-01-15 = Tuesday (index 2 Sunday-first), 16th = Wednesday
    assert day == [0, 0, 2, 1, 0, 0, 0]
    hour = E.present_distribution(r["hour_distribution"], "hour", "checkin_count", 24, base=0)
    assert hour[10] == 1 and hour[22] == 1 and hour[9] == 1 and sum(hour) == 3


def test_city_ratings(wh):
    rows = E.city_ratings(wh, min_businesses=0).collect()
    by_city = {r.city: r for r in rows}
    sp = by_city["Springfield"]
    assert sp.business_count == 2 and sp.five_star_count == 1  # b1 at 4.5
    assert sp.two_star_count == 1  # b2 at 2.0
    assert abs(sp.avg_rating - 3.25) < 1e-9
    # state filter
    assert E.city_ratings(wh, state="ZZ", min_businesses=0).count() == 0


def test_business_performance_summary_join(wh):
    r = E.business_performance(wh, "b1")
    b = r["business"].collect()[0]
    assert b.total_reviews == 2 and b.total_checkins == 3
    months = [(x.year, x.month, x.review_count) for x in r["reviews_by_month"].collect()]
    assert months == [(2019, 1, 1), (2019, 2, 1)]


def test_business_reviews_sorts(wh):
    r = E.business_reviews(wh, "b1", sort="stars_desc")
    assert [x.review_id for x in r["reviews"].collect()] == ["r1", "r2"]
    assert r["pagination"]["total"] == 2
    r2 = E.business_reviews(wh, "b1", sort="date_asc")
    assert [x.review_id for x in r2["reviews"].collect()] == ["r1", "r2"]
    assert r2["reviews"].collect()[0].user_name == "Ann"


def test_business_reviews_cursor_scroll_with_cached_total(wh):
    """A scrolling client echoes next_cursor AND the first page's total:
    pages 2+ must return the same rows as offset pagination while reusing
    the cached count instead of re-scanning (ADVICE r7)."""
    from yelpdatawarehouse_spark.operators.pagination import page_cursor

    first = E.business_reviews(wh, "b1", sort="date_asc", limit=1)
    total = first["pagination"]["total"]
    assert total == 2
    cur = page_cursor(first["reviews"].collect(), first["order"])
    second = E.business_reviews(
        wh, "b1", sort="date_asc", limit=1, cursor=cur, total=total
    )
    assert second["pagination"]["total"] == total  # echoed, not recounted
    got = [x.review_id for x in second["reviews"].collect()]
    want = [
        x.review_id
        for x in E.business_reviews(
            wh, "b1", sort="date_asc", limit=1, page=2, use_offset=True
        )["reviews"].collect()
    ]
    assert got == want


def test_search_businesses_dynamic_predicates(wh):
    # substring, case-insensitive
    r = E.search_businesses(wh, query="cafe")
    assert [x.business_id for x in r["businesses"].collect()] == ["b1"]
    # location OR, category semi-join, min_rating
    r2 = E.search_businesses(wh, location="shelby", category="Cafes", min_rating=3.5)
    assert [x.business_id for x in r2["businesses"].collect()] == ["b4"]
    # sort by name
    r3 = E.search_businesses(wh, sort_by="name")
    assert [x.business_name for x in r3["businesses"].collect()] == [
        "Bar Two", "Cafe One", "Diner Four", "No Cat",
    ]


def test_review_trends_window(wh):
    # anchored just after the last review: only reviews within 12 months
    rows = E.review_trends(wh, now="2021-06-01").collect()
    assert [(r.date, r.review_count) for r in rows] == [
        ("2020-06-01", 1), ("2021-03-01", 1), ("2021-04-01", 1),
    ]


def test_monthly_distribution(wh):
    rows = {(r.month, r.month_name): r.review_count for r in E.monthly_distribution(wh).collect()}
    assert rows[(1, "January")] == 1 and rows[(6, "June")] == 1


def test_year_comparison_pivot(wh):
    df = E.year_comparison(wh, now="2021-12-31")
    rows = {r.year: r for r in df.collect()}
    assert set(rows) == {2019, 2020, 2021}
    assert rows[2019]["1"] == 1 and rows[2019]["2"] == 1  # Jan + Feb 2019
    assert rows[2021]["3"] == 1 and rows[2021]["4"] == 1
    assert rows[2021]["12"] == 0  # dense 1..12 domain, zero-filled


def test_category_ratings_and_volumes(wh):
    ratings = {r.category_name: r.avg_rating for r in E.category_ratings(wh, min_businesses=0).collect()}
    assert abs(ratings["Cafes"] - 4.25) < 1e-9  # (4.5 + 4.0)/2
    vols = {r.category_name: r.review_count for r in E.category_volumes(wh).collect()}
    # Restaurants: b1 (2 reviews) + b2 (2 reviews); Cafes: b1 (2) + b4 (1)
    assert vols["Restaurants"] == 4 and vols["Cafes"] == 3


def test_state_stats(wh):
    rows = E.state_stats(wh, min_businesses=0).collect()
    assert len(rows) == 1 and rows[0].state == "IL" and rows[0].business_count == 4


def test_category_trends_fallback(wh):
    rows = E.category_trends(wh, "Cafes").collect()
    assert [(r.period, r.review_count) for r in rows] == [
        ("2019-Q1", 2), ("2021-Q2", 1),
    ]
    # min_year beyond all data → fallback to unfiltered (reference :1131-1151)
    fallback = E.category_trends(wh, "Cafes", min_year=2030).collect()
    assert len(fallback) == 2


def test_top_users_window_not_loop(wh):
    rows = E.top_users(wh).collect()
    assert [r.user_id for r in rows] == ["u1", "u3", "u2"]  # 2, 2, 1 reviews
    u1 = rows[0]
    assert u1.unique_businesses == 2
    assert str(u1.first_review_date) == "2019-01-15"
    # u1 reviewed b1 (Restaurants, Cafes) + b2 (Bars, Restaurants)
    assert u1.top_categories == "Restaurants, Bars, Cafes"  # count desc, name asc
    assert u1.unique_categories == 3


# --- document family --------------------------------------------------------


def test_document_size_stats(wh):
    rows = E.document_size_stats(wh).collect()
    # all fixture docs are tiny
    # 4 business + 7 review (incl. dup/dangling raw lines) + 3 user + 4 checkin
    assert [(r.size_range, r.document_count) for r in rows] == [("<1KB", 18)]


def test_business_attributes(wh):
    rows = {r.attribute: r["count"] for r in E.business_attributes(wh).collect()}
    assert rows == {"GoodForKids": 2, "BusinessParking": 1, "HasTV": 1}


def test_schema_analysis(wh):
    rows = {r.collection: r for r in E.schema_analysis(wh).collect()}
    assert set(rows) == {"businesses", "reviews", "users", "checkins"}
    b = rows["businesses"]
    # b2: 12 of 14 top-level fields non-null, no attribute/hour keys → min
    assert b.min_field_count < b.max_field_count
    assert b.total_unique_fields >= 14 + 3  # 14 columns + {GoodForKids, BusinessParking, HasTV}


def test_array_field_analysis(wh):
    rows = {r.field: r for r in E.array_field_analysis(wh).collect()}
    assert rows["friends"].max_length == 2  # u3 has 2 friends
    assert rows["categories"].max_length == 2
    assert rows["dates"].max_length == 3  # b1/b2 have 3 checkin timestamps


def test_document_structure(wh):
    s = E.document_structure(wh, "business")
    assert s["type"] == "Object"
    assert s["fields"]["business_id"]["type"] == "string"
    assert s["fields"]["attributes"]["type"] == "Object"


# --- graph family -----------------------------------------------------------


def test_graph_overview_stats(wh):
    r = E.graph_overview_stats(wh)
    rels = {x.relationship_type: x["count"] for x in r["relationship_stats"].collect()}
    assert rels["WROTE"] == 5 and rels["IN_CATEGORY"] == 6 and rels["LOCATED_IN"] == 4
    assert rels["HAD_CHECKIN"] == 3  # month-granular: b1@2019-01, b2@2020-06, b4@2021-04
    d = r["density_metrics"].collect()[0]
    assert d.max_categories_per_business == 2 and abs(d.avg_categories_per_business - 1.5) < 1e-9


def test_graph_search_businesses(wh):
    # user_reviewed: businesses u3 reviewed
    r = E.graph_search_businesses(wh, user_reviewed="u3")
    assert {x.business_id for x in r["businesses"].collect()} == {"b2", "b4"}
    # common_category_with b1 (Restaurants, Cafes) → b2, b4 (and b1 itself)
    r2 = E.graph_search_businesses(wh, common_category_with="b1", min_rating=3.0)
    assert {x.business_id for x in r2["businesses"].collect()} == {"b1", "b4"}


def test_business_network(wh):
    r = E.business_network(wh, "b1")
    cat_rel = {x.business_id: x.common_categories for x in r["category_related"].collect()}
    assert cat_rel == {"b2": 1, "b4": 1}
    user_rel = {x.business_id: x.common_users for x in r["user_related"].collect()}
    assert user_rel == {"b2": 1}  # u1 reviewed b1 and b2
    shared = {x.category_name: x.business_count for x in r["shared_categories"].collect()}
    assert shared == {"Restaurants": 1, "Cafes": 1}
    conn = {x.user_id: x.business_count for x in r["connected_users"].collect()}
    assert conn == {"u1": 1}


def test_business_recommendations(wh):
    r = E.business_recommendations(wh, "b1")
    similar = {x.business_id for x in r["similar_businesses"].collect()}
    assert similar == {"b4"}  # shares Cafes, stars 4.0 ≥ 4.0; b2 too low
    # complementary: co-reviewed with NO shared category → none in fixture
    assert r["complementary_businesses"].count() == 0
    also = {x.business_id: x.common_reviewers for x in r["also_reviewed"].collect()}
    assert also == {"b2": 1}


def test_user_recommendations(wh):
    r = E.user_recommendations(wh, "u2")  # u2 reviewed only b1
    prefs = {x.category: x.category_count for x in r["preferred_categories"].collect()}
    assert prefs == {"Cafes": 1, "Restaurants": 1}
    recs = [x.business_id for x in r["category_recommendations"].collect()]
    assert recs == ["b4", "b2"]  # stars desc; b1 excluded (already reviewed)
    collab = {x.business_id: x.common_users for x in r["collaborative_recommendations"].collect()}
    assert collab == {"b2": 1}  # u1 co-reviewed b1, also reviewed b2


def test_connection_path_bfs(wh):
    r = E.connection_path(wh, "b1", "b4", path_type="user")
    assert r["paths"].count() == 0  # no single user reviewed both
    path = [x.node for x in r["shortest_path"].collect()]
    # b1 and b4 connect within 6 hops (e.g. via Cafes category in 2 hops)
    assert path[0] == "B:b1" and path[-1] == "B:b4" and len(path) == 3
    r2 = E.connection_path(wh, "b1", "b2", path_type="category")
    cats = {x.connection for x in r2["paths"].collect()}
    assert cats == {"Restaurants"}


def test_graph_analytics(wh):
    r = E.graph_analytics(wh)
    central = [x.business_id for x in r["central_businesses"].collect()]
    # b1: 2 reviews + 1 tip + 2 cats + 1 loc + 2 checkin-months = 8 edges → top
    assert central[0] == "b1"
    pairs = {(x.category1, x.category2): x.business_count for x in r["category_pairs"].collect()}
    assert pairs == {
        ("Cafes", "Restaurants"): 1,
        ("Bars", "Restaurants"): 1,
        ("Cafes", "Diners"): 1,
    }
    infl = [x.user_id for x in r["influential_users"].collect()]
    assert infl[0] == "u1"  # 2 reviews + 1 tip


def test_debug_counts(wh):
    c = E.debug_counts(wh)
    assert c["fact_review"] == 5 and c["dim_business"] == 4
