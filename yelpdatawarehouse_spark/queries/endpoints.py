"""The reference's full REST query surface (SURVEY.md Appendix A) as
parameterized DataFrame functions over the warehouse built by
``sources.etl.build_warehouse``.

One function per endpoint, three families mirroring the reference's three
stores — relational (webapp/mysql_routes.py), document
(webapp/mongodb_routes.py), graph (webapp/neo4j_routes.py) — all answered
from the ONE unified warehouse (a user of the reference can run every query
they run today against a single Spark engine).

Contract: each function returns a DataFrame, or a dict of named DataFrames /
scalars for multi-part endpoints, mirroring the reference's JSON payload
shape. Nothing is collected here — callers materialize; dense-array chart
fills (bounded: 7/12/24 buckets) live in ``present_*`` helpers.

Deliberate divergences from the reference (SURVEY.md §8 — bugs we do NOT
replicate):
* hour distributions are computed from real checkin timestamps
  (fact_checkin_ts) instead of the MySQL route's fabricated category
  patterns (webapp/mysql_routes.py:231-280);
* review sorts use the review's own date, not the null Time-node
  date_actual (webapp/neo4j_routes.py:322-323);
* no synthetic random fallbacks on empty results
  (webapp/mysql_routes.py:746-753 etc.) — empty is empty;
* ``business_attributes`` / ``array_field_analysis`` work (the reference's
  versions NameError on bare ``true``/``null``, webapp/mongodb_routes.py:714,848).

Scale notes: every top-N here is a bounded `orderBy().limit()` (TakeOrdered,
no full sort); per-entity filters hit partition/row-group pruning on the
facts (written partitioned by year, sorted by business_id); dims joined to
facts are broadcast-size by construction.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Warehouse = Mapping[str, DataFrame]

# ---------------------------------------------------------------------------
# shared builders (P10 dynamic predicates, O2 dynamic sort, O4 pagination)
# ---------------------------------------------------------------------------


def paginate(
    df: DataFrame,
    page: int,
    limit: int,
    order=None,
    cursor: dict | None = None,
    use_offset: bool = False,
    total: int | None = None,
) -> tuple[DataFrame, dict]:
    """O4: page + the reference's pagination envelope {total, page, limit,
    pages} (webapp/mysql_routes.py:99,106-118,691-699). The separate COUNT
    query becomes a count() on the unlimited plan.

    With an ``order`` spec the row fetch defaults to the KEYSET path
    (operators/pagination.fetch_page): true seek when the client echoes a
    ``cursor``, deferred-join narrow offset for jump-to-page — wide rows
    are never produced-and-discarded (VERDICT r6 #7). ``use_offset=True``
    restores the reference's literal wide LIMIT/OFFSET plan. Without
    ``order`` (caller pre-sorted the frame) the legacy offset path is the
    only option — kept for back-compat.

    A cursor-scrolling client should pass the FIRST page's ``total`` back
    on subsequent requests: the COUNT scan then runs once per scroll, not
    once per page (ADVICE r7 — with it, page N of a cursor iteration costs
    O(limit) end to end)."""
    if order is not None:
        from ..operators.pagination import fetch_page

        return fetch_page(
            df, order, page, limit, cursor=cursor, use_offset=use_offset,
            total=total,
        )
    if total is None:
        total = df.count()
    pages = (total + limit - 1) // limit if total > 0 else 1
    page_df = df.offset((page - 1) * limit).limit(limit)
    return page_df, {"total": total, "page": page, "limit": limit, "pages": pages}


# O2: validated enum → order SPECS ((column, direction) pairs ending in a
# unique tie-break key — the shape the keyset paginator needs; never string
# interpolation — the reference f-strings the sort column,
# webapp/mysql_routes.py:497-517).
_REVIEW_SORTS = {
    "date_desc": [("review_date", "desc"), ("review_id", "asc")],
    "date_asc": [("review_date", "asc"), ("review_id", "asc")],
    "stars_desc": [("stars", "desc"), ("review_id", "asc")],
    "stars_asc": [("stars", "asc"), ("review_id", "asc")],
    "useful_desc": [("useful_votes", "desc"), ("review_id", "asc")],
}

_BUSINESS_SORTS = {
    "stars": [("stars", "desc"), ("review_count", "desc"), ("business_id", "asc")],
    "review_count": [("review_count", "desc"), ("stars", "desc"), ("business_id", "asc")],
    "name": [("business_name", "asc"), ("business_id", "asc")],
}


def _ilike(col, needle: str):
    """P4: case-insensitive substring (LIKE %q% / $regex i / (?i).*q.*)."""
    return F.lower(col).contains(needle.lower())


# ---------------------------------------------------------------------------
# relational family (webapp/mysql_routes.py)
# ---------------------------------------------------------------------------


def overview_stats(wh: Warehouse) -> dict:
    """A1 global counts + A2 star histogram + top-10 category counts
    (webapp/mysql_routes.py:15-72)."""
    category_stats = (
        wh["business_category"]
        .groupBy("category_name")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("category_name"))
        .limit(10)
    )
    star_distribution = (
        wh["fact_review"].groupBy("stars").agg(F.count("*").alias("count")).orderBy("stars")
    )
    return {
        "business_count": wh["dim_business"].count(),
        "review_count": wh["fact_review"].count(),
        "user_count": wh["dim_user"].count(),
        "category_stats": category_stats,
        "star_distribution": star_distribution,
    }


def top_businesses(
    wh: Warehouse, category: str = "Restaurants", limit: int = 10, page: int = 1
) -> dict:
    """J1 equi-join through the category bridge, O1 multi-key sort, O4
    pagination (webapp/mysql_routes.py:75-152)."""
    df = (
        wh["dim_business"]
        .join(wh["business_category"], "business_id")
        .filter(F.col("category_name") == category)
        .select("business_id", "business_name", "stars", "review_count", "city", "state")
    )
    page_df, pagination = paginate(df, page, limit, order=_BUSINESS_SORTS["stars"])
    return {"businesses": page_df, "pagination": pagination}


def business_checkins(wh: Warehouse, business_id: str) -> dict:
    """F1 date-part histograms for one business: day-of-week (1=Sunday,
    matching MySQL DAYOFWEEK) and month from the day-grain fact
    (webapp/mysql_routes.py:155-229), hour from real timestamps — the
    reference's honest MongoDB variant (webapp/mongodb_routes.py:596-616),
    NOT the MySQL route's fabricated patterns (SURVEY.md §8)."""
    fc = wh["fact_checkin"].filter(F.col("business_id") == business_id)
    day = (
        fc.groupBy(F.dayofweek("checkin_date").alias("day_of_week"))
        .agg(F.sum("checkin_count").alias("checkin_count"))
        .orderBy("day_of_week")
    )
    month = (
        fc.groupBy(F.month("checkin_date").alias("month"))
        .agg(F.sum("checkin_count").alias("checkin_count"))
        .orderBy("month")
    )
    hour = (
        wh["fact_checkin_ts"]
        .filter(F.col("business_id") == business_id)
        .groupBy(F.hour("checkin_ts").alias("hour"))
        .agg(F.count("*").alias("checkin_count"))
        .orderBy("hour")
    )
    return {"day_distribution": day, "month_distribution": month, "hour_distribution": hour}


def city_ratings(
    wh: Warehouse, state: str | None = None, limit: int = 20, min_businesses: int = 5
) -> DataFrame:
    """A3 multi-aggregate + A4 conditional star-bucket counts per city, A9
    HAVING, O3 top-k (webapp/mysql_routes.py:315-377)."""
    b = wh["dim_business"]
    if state:
        b = b.filter(F.col("state") == state)
    return (
        b.groupBy("city", "state")
        .agg(
            F.countDistinct("business_id").alias("business_count"),
            F.avg("stars").alias("avg_rating"),
            F.sum("review_count").alias("total_reviews"),
            F.count(F.when(F.col("stars") >= 4.5, 1)).alias("five_star_count"),
            F.count(F.when((F.col("stars") >= 3.5) & (F.col("stars") < 4.5), 1)).alias(
                "four_star_count"
            ),
            F.count(F.when((F.col("stars") >= 2.5) & (F.col("stars") < 3.5), 1)).alias(
                "three_star_count"
            ),
            F.count(F.when((F.col("stars") >= 1.5) & (F.col("stars") < 2.5), 1)).alias(
                "two_star_count"
            ),
            F.count(F.when(F.col("stars") < 1.5, 1)).alias("one_star_count"),
        )
        .filter(F.col("business_count") > min_businesses)
        .orderBy(F.desc("business_count"), F.asc("city"))
        .limit(limit)
    )


def business_performance(wh: Warehouse, business_id: str) -> dict:
    """J2 left join to the materialized summary + per-month review/checkin
    series (webapp/mysql_routes.py:380-457). Reads the summary table instead
    of re-aggregating facts — the engine's materialized-view path."""
    business = (
        wh["dim_business"]
        .filter(F.col("business_id") == business_id)
        .join(wh["summary_business_performance"], "business_id", "left")
    )
    reviews_by_month = (
        wh["fact_review"]
        .filter(F.col("business_id") == business_id)
        .groupBy(
            F.year("review_date").alias("year"), F.month("review_date").alias("month")
        )
        .agg(F.count("*").alias("review_count"))
        .orderBy("year", "month")
    )
    checkins_by_month = (
        wh["fact_checkin"]
        .filter(F.col("business_id") == business_id)
        .groupBy(
            F.year("checkin_date").alias("year"), F.month("checkin_date").alias("month")
        )
        .agg(F.sum("checkin_count").alias("checkin_count"))
        .orderBy("year", "month")
    )
    return {
        "business": business,
        "reviews_by_month": reviews_by_month,
        "checkins_by_month": checkins_by_month,
    }


def business_reviews(
    wh: Warehouse,
    business_id: str,
    page: int = 1,
    limit: int = 10,
    sort: str = "date_desc",
    cursor: dict | None = None,
    use_offset: bool = False,
    total: int | None = None,
) -> dict:
    """Review page for one business with user names, O2 dynamic sort, O4
    pagination (webapp/mysql_routes.py:460-583). A scrolling client passes
    back the previous page's ``next_cursor`` for O(limit) seek pagination
    at any depth — and the first page's ``total`` so the COUNT scan runs
    once per scroll, not once per page; without a cursor, jump-to-page
    uses the deferred-join narrow offset (``use_offset=True`` restores
    the reference's wide offset)."""
    df = (
        wh["fact_review"]
        .filter(F.col("business_id") == business_id)
        .join(wh["dim_user"].select("user_id", F.col("name").alias("user_name")), "user_id")
        .select(
            "review_id",
            "stars",
            "useful_votes",
            "funny_votes",
            "cool_votes",
            F.col("review_date").alias("review_date"),
            "user_name",
            "user_id",
            "text",
        )
    )
    spec = _REVIEW_SORTS.get(sort, _REVIEW_SORTS["date_desc"])
    page_df, pagination = paginate(
        df, page, limit, order=spec, cursor=cursor, use_offset=use_offset,
        total=total,
    )
    return {"reviews": page_df, "pagination": pagination, "order": spec}


def search_businesses(
    wh: Warehouse,
    query: str = "",
    location: str = "",
    category: str = "",
    min_rating: float | None = None,
    min_reviews: int | None = None,
    sort_by: str = "stars",
    page: int = 1,
    limit: int = 20,
) -> dict:
    """P10 dynamic predicate assembly: name substring (P4), city-OR-state
    substring (P5), category equality via bridge, range predicates (P3),
    dynamic sort (O2), pagination (O4) (webapp/mysql_routes.py:587-705)."""
    df = wh["dim_business"]
    if query:
        df = df.filter(_ilike(F.col("business_name"), query))
    if location:
        df = df.filter(
            _ilike(F.col("city"), location) | _ilike(F.col("state"), location)
        )
    if category:
        df = df.join(
            wh["business_category"].filter(F.col("category_name") == category).select(
                "business_id"
            ),
            "business_id",
            "left_semi",
        )
    if min_rating is not None:
        df = df.filter(F.col("stars") >= min_rating)
    if min_reviews is not None:
        df = df.filter(F.col("review_count") >= min_reviews)
    df = df.select(
        "business_id", "business_name", "stars", "review_count", "city", "state"
    )
    spec = _BUSINESS_SORTS.get(sort_by, _BUSINESS_SORTS["stars"])
    page_df, pagination = paginate(df, page, limit, order=spec)
    return {"businesses": page_df, "pagination": pagination}


def review_trends(wh: Warehouse, now: str | None = None) -> DataFrame:
    """F2 month-bucket counts for the trailing 12 months (F3 relative date)
    (webapp/mysql_routes.py:708-763). `now` is injectable for deterministic
    tests; defaults to the session clock like the reference's CURRENT_DATE."""
    anchor = F.lit(now).cast("date") if now else F.current_date()
    return (
        wh["fact_review"]
        .filter(F.col("review_date") >= F.add_months(anchor, -12))
        .groupBy(F.date_format(F.date_trunc("month", "review_date"), "yyyy-MM-01").alias("date"))
        .agg(F.count("*").alias("review_count"))
        .orderBy("date")
    )


def monthly_distribution(wh: Warehouse) -> DataFrame:
    """A2 reviews per calendar month across all years, with month names (F5)
    (webapp/mysql_routes.py:765-810)."""
    return (
        wh["fact_review"]
        .groupBy(
            F.month("review_date").alias("month"),
            F.date_format("review_date", "MMMM").alias("month_name"),
        )
        .agg(F.count("*").alias("review_count"))
        .orderBy("month")
    )


def year_comparison(wh: Warehouse, now: str | None = None, years_back: int = 5) -> DataFrame:
    """Year-over-year month matrix. The reference pivots in Python
    (webapp/mysql_routes.py:863-898); Spark-first this is groupBy(year)
    .pivot(month) with a fixed 1..12 domain (no second pass to discover
    pivot values). Falls back to all years when the window is empty
    (fallback-on-empty, :842-858)."""
    anchor = F.lit(now).cast("date") if now else F.current_date()
    base = wh["fact_review"].select(
        F.year("review_date").alias("year"), F.month("review_date").alias("month")
    )
    windowed = base.filter(F.col("year") >= F.year(anchor) - years_back)
    source = base if windowed.isEmpty() else windowed
    return (
        source.groupBy("year")
        .pivot("month", list(range(1, 13)))
        .count()
        .na.fill(0)
        .orderBy("year")
    )


def category_ratings(wh: Warehouse, min_businesses: int = 5, limit: int = 10) -> DataFrame:
    """A6 avg rating per category, A9 HAVING business count, O3 top-k
    (webapp/mysql_routes.py:910-957)."""
    return (
        wh["dim_business"]
        .join(wh["business_category"], "business_id")
        .groupBy("category_name")
        .agg(F.avg("stars").alias("avg_rating"), F.count("*").alias("business_count"))
        .filter(F.col("business_count") > min_businesses)
        .orderBy(F.desc("avg_rating"), F.asc("category_name"))
        .limit(limit)
        .select("category_name", "avg_rating")
    )


def category_volumes(wh: Warehouse, limit: int = 10) -> DataFrame:
    """A2 review volume per category through the bridge (J1 fact→dim→bridge)
    (webapp/mysql_routes.py:960-1006)."""
    return (
        wh["fact_review"]
        .select("review_id", "business_id")
        .join(wh["business_category"], "business_id")
        .groupBy("category_name")
        .agg(F.count("review_id").alias("review_count"))
        .orderBy(F.desc("review_count"), F.asc("category_name"))
        .limit(limit)
    )


def state_stats(wh: Warehouse, min_businesses: int = 5, limit: int = 10) -> DataFrame:
    """A3 per-state rollup with P8 null/empty guard, A9 HAVING, O3 top-k
    (webapp/mysql_routes.py:1009-1088)."""
    return (
        wh["dim_business"]
        .filter(F.col("state").isNotNull() & (F.col("state") != ""))
        .groupBy("state")
        .agg(
            F.countDistinct("business_id").alias("business_count"),
            F.avg("stars").alias("avg_rating"),
        )
        .filter(F.col("business_count") > min_businesses)
        .orderBy(F.desc("business_count"), F.asc("state"))
        .limit(limit)
    )


def category_trends(
    wh: Warehouse, category: str, min_year: int | None = 2018
) -> DataFrame:
    """Quarterly review count + avg stars for one category (F2 period label
    CONCAT(year,'-Q',quarter)), with the reference's fallback-on-empty to
    the unfiltered range (webapp/mysql_routes.py:1091-1198)."""
    base = (
        wh["fact_review"]
        .join(
            wh["business_category"].filter(F.col("category_name") == category).select(
                "business_id"
            ),
            "business_id",
            "left_semi",
        )
        .select(
            F.year("review_date").alias("year"),
            F.quarter("review_date").alias("quarter"),
            "review_id",
            "stars",
        )
    )
    windowed = base.filter(F.col("year") >= min_year) if min_year else base
    source = base if (min_year and windowed.isEmpty()) else windowed
    return (
        source.groupBy("year", "quarter")
        .agg(F.count("review_id").alias("review_count"), F.avg("stars").alias("avg_rating"))
        .select(
            F.concat(F.col("year"), F.lit("-Q"), F.col("quarter")).alias("period"),
            "review_count",
            "avg_rating",
            "year",
            "quarter",
        )
        .orderBy("year", "quarter")
        .drop("year", "quarter")
    )


def top_users(wh: Warehouse, limit: int = 10, top_categories: int = 3) -> DataFrame:
    """W1: the reference's per-user Python loop for top-3 categories
    (J7, webapp/mysql_routes.py:1201-1256) becomes ONE window — no N+1
    queries. Top users by review count with first/last dates (A7), distinct
    businesses (A8), and their top categories as a comma-joined string."""
    users = (
        wh["fact_review"]
        .groupBy("user_id")
        .agg(
            F.count("review_id").alias("review_count"),
            F.avg("stars").alias("avg_rating"),
            F.min("review_date").alias("first_review_date"),
            F.max("review_date").alias("last_review_date"),
            F.countDistinct("business_id").alias("unique_businesses"),
        )
        .orderBy(F.desc("review_count"), F.asc("user_id"))
        .limit(limit)
    )
    # category counts only for the selected users (semi-join keeps the
    # window input tiny no matter how large fact_review is)
    cat_counts = (
        wh["fact_review"]
        .join(users.select("user_id"), "user_id", "left_semi")
        .join(wh["business_category"], "business_id")
        .groupBy("user_id", "category_name")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("category_name"))
    top_cats = (
        cat_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_categories)
        .groupBy("user_id")
        .agg(
            F.concat_ws(", ", F.collect_list("category_name")).alias("top_categories"),
            F.count("*").alias("unique_categories"),
        )
    )
    return (
        users.join(wh["dim_user"].select("user_id", F.col("name").alias("user_name")), "user_id")
        .join(top_cats, "user_id", "left")
        .na.fill({"top_categories": "", "unique_categories": 0})
        .orderBy(F.desc("review_count"), F.asc("user_id"))
    )


# ---------------------------------------------------------------------------
# document family (webapp/mongodb_routes.py) — nested/array/schema analytics
# over the raw documents
# ---------------------------------------------------------------------------

_SIZE_BUCKETS = ["<1KB", "1-5KB", "5-10KB", "10-50KB", "50-100KB", ">100KB"]


def document_size_stats(wh: Warehouse, sample_per_collection: int = 100) -> DataFrame:
    """F12/A13: JSON-serialized size histogram over a bounded sample of each
    collection (webapp/mongodb_routes.py:637-699). Size ≈
    length(to_json(struct(*)))/1024, bucketed like the reference."""
    kb = F.length(F.to_json(F.struct("*"))) / 1024.0
    bucket = (
        F.when(kb < 1, "<1KB")
        .when(kb < 5, "1-5KB")
        .when(kb < 10, "5-10KB")
        .when(kb < 50, "10-50KB")
        .when(kb < 100, "50-100KB")
        .otherwise(">100KB")
    )
    parts = [
        wh[f"raw_{c}"].limit(sample_per_collection).select(bucket.alias("size_range"))
        for c in ("business", "review", "user", "checkin")
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    return (
        union.groupBy("size_range")
        .agg(F.count("*").alias("document_count"))
        .orderBy(F.array_position(F.array(*[F.lit(b) for b in _SIZE_BUCKETS]), F.col("size_range")))
    )


def business_attributes(wh: Warehouse, limit: int = 10) -> DataFrame:
    """A11: $objectToArray→unwind→count becomes explode(map_keys(...))
    (webapp/mongodb_routes.py:701-739; the reference version NameErrors on a
    bare `true` — this one works)."""
    return (
        wh["raw_business"]
        .filter(F.col("attributes").isNotNull() & (F.size(F.map_keys("attributes")) > 0))
        .select(F.explode(F.map_keys("attributes")).alias("attribute"))
        .groupBy("attribute")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("attribute"))
        .limit(limit)
    )


def _field_count_expr(df: DataFrame):
    """Flattened field count per document: non-null scalar columns count 1;
    map columns count 1 + number of keys (nested fields); array columns
    count 1 — the same flatten rule as the reference's count_fields
    (webapp/mongodb_routes.py:770-786) expressed as one JVM expression."""
    from pyspark.sql import types as S

    terms = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, S.MapType):
            terms.append(F.when(c.isNotNull(), F.size(F.map_keys(c)) + 1).otherwise(0))
        elif isinstance(f.dataType, S.ArrayType):
            terms.append(F.when(c.isNotNull(), 1).otherwise(0))
        else:
            terms.append(F.when(c.isNotNull(), 1).otherwise(0))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def schema_analysis(wh: Warehouse, sample_per_collection: int = 100) -> DataFrame:
    """A13 sampled schema-shape stats per collection: avg/min/max flattened
    field count, distinct field paths, fields present in >80% of the sample,
    variation % (webapp/mongodb_routes.py:742-826). The reference walks
    Python dicts; here presence/counting is JVM-side over the typed docs and
    only per-collection scalars return to the driver."""
    from pyspark.sql import types as S

    spark = wh["raw_business"].sparkSession
    stats = []
    for coll in ("business", "review", "user", "checkin"):
        df = wh[f"raw_{coll}"].limit(sample_per_collection)
        n = df.count()
        if n == 0:
            continue
        agg = df.select(
            F.avg(_field_count_expr(df)).alias("avg_fc"),
            F.min(_field_count_expr(df)).alias("min_fc"),
            F.max(_field_count_expr(df)).alias("max_fc"),
            *[
                F.count(F.col(f.name)).alias(f"present_{i}")
                for i, f in enumerate(df.schema.fields)
            ],
        ).collect()[0]
        # distinct map keys across the sample extend the unique field paths
        map_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, S.MapType)]
        nested = 0
        if map_cols:
            nested = (
                df.select(
                    F.explode(
                        F.flatten(
                            F.array(
                                *[
                                    F.coalesce(
                                        F.map_keys(c), F.array().cast("array<string>")
                                    )
                                    for c in map_cols
                                ]
                            )
                        )
                    ).alias("k")
                )
                .distinct()
                .count()
            )
        top_level = len(df.schema.fields)
        total_unique = top_level + nested
        common = sum(
            1
            for i in range(top_level)
            if agg[f"present_{i}"] > n * 0.8
        )
        variation = (total_unique - common) / total_unique * 100 if total_unique else 0.0
        stats.append(
            (
                {"business": "businesses"}.get(coll, f"{coll}s"),
                float(agg["avg_fc"]),
                int(agg["min_fc"]),
                int(agg["max_fc"]),
                total_unique,
                common,
                variation,
            )
        )
    return spark.createDataFrame(
        stats,
        "collection STRING, avg_field_count DOUBLE, min_field_count INT, "
        "max_field_count INT, total_unique_fields INT, common_fields INT, "
        "schema_variation DOUBLE",
    )


def array_field_analysis(wh: Warehouse, sample_size: int = 100) -> DataFrame:
    """A13 array-length stats ($isArray/$size/$avg/$max,
    webapp/mongodb_routes.py:828-892) over the real array fields of the
    document model: business.categories (split array), user.friends,
    checkin dates. The reference's version NameErrors (bare `null`) and
    reads nonexistent fields; this one analyzes what exists."""
    spark = wh["raw_business"].sparkSession
    cats = wh["raw_business"].limit(sample_size).select(
        F.lit("categories").alias("field"),
        F.when(
            F.col("categories").isNotNull(),
            F.size(F.split("categories", ",")),
        )
        .otherwise(0)
        .alias("length"),
    )
    friends = wh["raw_user"].limit(sample_size).select(
        F.lit("friends").alias("field"),
        F.coalesce(F.size("friends"), F.lit(0)).alias("length"),
    )
    dates = wh["fact_checkin_ts"].groupBy("business_id").agg(
        F.count("*").alias("length")
    ).limit(sample_size).select(F.lit("dates").alias("field"), "length")
    union = cats.unionAll(friends).unionAll(dates)
    return (
        union.groupBy("field")
        .agg(F.avg("length").alias("avg_length"), F.max("length").alias("max_length"))
        .orderBy("field")
    )


def document_structure(wh: Warehouse, collection: str = "business") -> dict:
    """Recursive structure description of one sampled document
    (webapp/mongodb_routes.py:895-981). Types come from the DataFrame schema
    (engine metadata, no data scan); examples from one sampled row."""
    from pyspark.sql import types as S

    df = wh[f"raw_{collection}"]
    sample = df.limit(1).collect()
    row = sample[0].asDict(recursive=True) if sample else {}

    def describe(dt, value):
        if isinstance(dt, S.StructType):
            return {
                "type": "Object",
                "fields": {
                    f.name: describe(f.dataType, (value or {}).get(f.name))
                    for f in dt.fields
                },
            }
        if isinstance(dt, S.MapType):
            v = value or {}
            return {
                "type": "Object",
                "fields": {
                    k: {"type": "string", "example": str(v[k])[:50]} for k in sorted(v)
                },
            }
        if isinstance(dt, S.ArrayType):
            n = len(value) if value else 0
            if n == 0:
                return {"type": "Empty Array"}
            return {
                "type": f"Array of {dt.elementType.simpleString()}",
                "length": n,
                "items": {"type": dt.elementType.simpleString(), "example": str(value[0])[:50]},
            }
        return {
            "type": dt.simpleString(),
            "example": str(value)[:50] if value is not None else "null",
        }

    return describe(S.StructType(df.schema.fields), row)


# ---------------------------------------------------------------------------
# graph family (webapp/neo4j_routes.py) — edges are join tables
# ---------------------------------------------------------------------------


def _edge_counts(wh: Warehouse) -> list[tuple[str, int]]:
    """Relationship-type histogram: each reference edge type maps to a fact/
    bridge table (SURVEY.md §1.4). HAD_CHECKIN is month-granular in the
    graph loader (one edge per business-month, init/neo4j_loader.py:654-678);
    ON_DATE/WROTE/REVIEWS are one per review, WROTE_TIP/ABOUT one per tip."""
    review_n = wh["fact_review"].count()
    tip_n = wh["fact_tip"].count()
    checkin_edges = (
        wh["fact_checkin"]
        .select(
            "business_id",
            F.year("checkin_date").alias("y"),
            F.month("checkin_date").alias("m"),
        )
        .distinct()
        .count()
    )
    return [
        ("WROTE", review_n),
        ("REVIEWS", review_n),
        ("ON_DATE", review_n),
        ("LOCATED_IN", wh["dim_business"].count()),
        ("IN_CATEGORY", wh["business_category"].count()),
        ("WROTE_TIP", tip_n),
        ("ABOUT", tip_n),
        ("HAD_CHECKIN", checkin_edges),
    ]


def graph_overview_stats(wh: Warehouse) -> dict:
    """Node/relationship counts, top categories, top users by WROTE degree,
    category-density metrics (webapp/neo4j_routes.py:11-98)."""
    spark = wh["dim_business"].sparkSession
    edges = _edge_counts(wh)
    relationship_stats = spark.createDataFrame(
        sorted(edges, key=lambda e: (-e[1], e[0])), "relationship_type STRING, count BIGINT"
    )
    top_users_df = (
        wh["fact_review"]
        .groupBy("user_id")
        .agg(F.count("*").alias("review_count"))
        .join(wh["dim_user"].select("user_id", "name"), "user_id")
        .orderBy(F.desc("review_count"), F.asc("user_id"))
        .limit(5)
        .select("name", "review_count")
    )
    cat_per_biz = (
        wh["dim_business"]
        .select("business_id")
        .join(
            wh["business_category"].groupBy("business_id").agg(F.count("*").alias("n")),
            "business_id",
            "left",
        )
        .select(F.coalesce("n", F.lit(0)).alias("n"))
    )
    density = cat_per_biz.agg(
        F.avg("n").alias("avg_categories_per_business"),
        F.max("n").alias("max_categories_per_business"),
    )
    category_stats = (
        wh["business_category"]
        .groupBy("category_name")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("category_name"))
        .limit(10)
    )
    return {
        "business_count": wh["dim_business"].count(),
        "review_count": wh["fact_review"].count(),
        "user_count": wh["dim_user"].count(),
        "relationship_count": sum(n for _, n in edges),
        "category_stats": category_stats,
        "relationship_stats": relationship_stats,
        "top_users": top_users_df,
        "density_metrics": density,
    }


def graph_search_businesses(
    wh: Warehouse,
    name: str = "",
    category: str = "",
    location: str = "",
    min_rating: float | None = None,
    user_reviewed: str = "",
    connected_to: str = "",
    common_category_with: str = "",
    sort_by: str = "stars",
    page: int = 1,
    limit: int = 10,
) -> dict:
    """Graph-flavored search: the Cypher MATCH chains
    (webapp/neo4j_routes.py:100-214) become semi-joins — user_reviewed ≡
    reviewed-by-user semi-join, connected_to/common_category_with ≡
    shares-a-category semi-join (both Cypher blocks are identical, :147-161)."""
    df = wh["dim_business"]
    if name:
        df = df.filter(_ilike(F.col("business_name"), name))
    if location:
        df = df.filter(_ilike(F.col("city"), location) | _ilike(F.col("state"), location))
    if min_rating is not None:
        df = df.filter(F.col("stars") >= min_rating)
    if category:
        df = df.join(
            wh["business_category"].filter(F.col("category_name") == category).select(
                "business_id"
            ),
            "business_id",
            "left_semi",
        )
    if user_reviewed:
        df = df.join(
            wh["fact_review"]
            .filter(F.col("user_id") == user_reviewed)
            .select("business_id"),
            "business_id",
            "left_semi",
        )
    for anchor in (connected_to, common_category_with):
        if anchor:
            anchor_cats = (
                wh["business_category"]
                .filter(F.col("business_id") == anchor)
                .select("category_name")
            )
            df = df.join(
                wh["business_category"].join(anchor_cats, "category_name", "left_semi"),
                "business_id",
                "left_semi",
            )
    df = df.select(
        "business_id", "business_name", "stars", "review_count", "city", "state"
    )
    spec = _BUSINESS_SORTS.get(sort_by, _BUSINESS_SORTS["stars"])
    page_df, pagination = paginate(df, page, limit, order=spec)
    return {"businesses": page_df, "pagination": pagination}


def _co_reviewed(wh: Warehouse, business_id: str) -> DataFrame:
    """(other business, common_users): J6 two-hop through co-reviewers
    b←review←user→review→other (webapp/neo4j_routes.py:459-467)."""
    reviewers = (
        wh["fact_review"]
        .filter(F.col("business_id") == business_id)
        .select("user_id")
        .distinct()
    )
    return (
        wh["fact_review"]
        .join(reviewers, "user_id", "left_semi")
        .filter(F.col("business_id") != business_id)
        .groupBy("business_id")
        .agg(F.countDistinct("user_id").alias("common_users"))
    )


def business_network(wh: Warehouse, business_id: str) -> dict:
    """Category-related (J5 self-join via bridge), user-related (J6 2-hop),
    shared categories, most-connected users (webapp/neo4j_routes.py:428-516)."""
    my_cats = (
        wh["business_category"]
        .filter(F.col("business_id") == business_id)
        .select("category_name")
    )
    category_related = (
        wh["business_category"]
        .join(my_cats, "category_name", "inner")
        .filter(F.col("business_id") != business_id)
        .groupBy("business_id")
        .agg(F.count("*").alias("common_categories"))
        .orderBy(F.desc("common_categories"), F.asc("business_id"))
        .limit(5)
        .join(wh["dim_business"], "business_id")
        .select(
            "business_id", "business_name", "stars", "city", "state", "common_categories"
        )
        .orderBy(F.desc("common_categories"), F.asc("business_id"))
    )
    user_related = (
        _co_reviewed(wh, business_id)
        .orderBy(F.desc("common_users"), F.asc("business_id"))
        .limit(5)
        .join(wh["dim_business"], "business_id")
        .select("business_id", "business_name", "stars", "city", "state", "common_users")
        .orderBy(F.desc("common_users"), F.asc("business_id"))
    )
    shared_categories = (
        wh["business_category"]
        .join(my_cats, "category_name", "inner")
        .filter(F.col("business_id") != business_id)
        .groupBy("category_name")
        .agg(F.countDistinct("business_id").alias("business_count"))
        .orderBy(F.desc("business_count"), F.asc("category_name"))
        .limit(8)
    )
    my_reviewers = (
        wh["fact_review"]
        .filter(F.col("business_id") == business_id)
        .select("user_id")
        .distinct()
    )
    connected_users = (
        wh["fact_review"]
        .join(my_reviewers, "user_id", "left_semi")
        .filter(F.col("business_id") != business_id)
        .groupBy("user_id")
        .agg(F.countDistinct("business_id").alias("business_count"))
        .orderBy(F.desc("business_count"), F.asc("user_id"))
        .limit(5)
        .join(wh["dim_user"].select("user_id", F.col("name").alias("user_name")), "user_id")
        .select("user_id", "user_name", "business_count")
        .orderBy(F.desc("business_count"), F.asc("user_id"))
    )
    return {
        "category_related": category_related,
        "user_related": user_related,
        "shared_categories": shared_categories,
        "connected_users": connected_users,
    }


def business_recommendations(wh: Warehouse, business_id: str) -> dict:
    """Similar-by-category (stars≥4), complementary (co-reviewed but NO
    shared category — J4 anti-join), also-reviewed
    (webapp/neo4j_routes.py:516-607)."""
    my_cats = (
        wh["business_category"]
        .filter(F.col("business_id") == business_id)
        .select("category_name")
    )
    similar = (
        wh["business_category"]
        .join(my_cats, "category_name", "inner")
        .filter(F.col("business_id") != business_id)
        .groupBy("business_id")
        .agg(
            F.sort_array(F.collect_set("category_name")).alias("shared_categories"),
            F.count("*").alias("category_count"),
        )
        .join(wh["dim_business"].filter(F.col("stars") >= 4.0), "business_id")
        .orderBy(F.desc("category_count"), F.desc("stars"), F.asc("business_id"))
        .limit(5)
        .select(
            "business_id",
            "business_name",
            "stars",
            "review_count",
            "city",
            "state",
            "shared_categories",
            "category_count",
        )
    )
    co = _co_reviewed(wh, business_id)
    sharing_any_cat = (
        wh["business_category"].join(my_cats, "category_name", "left_semi").select("business_id")
    )
    complementary = (
        co.join(sharing_any_cat, "business_id", "left_anti")
        .orderBy(F.desc("common_users"), F.asc("business_id"))
        .limit(5)
        .join(wh["dim_business"], "business_id")
        .join(
            wh["business_category"]
            .groupBy("business_id")
            .agg(F.sort_array(F.collect_set("category_name")).alias("categories")),
            "business_id",
            "left",
        )
        .select(
            "business_id", "business_name", "stars", "city", "state", "categories",
            "common_users",
        )
        .orderBy(F.desc("common_users"), F.asc("business_id"))
    )
    also_reviewed = (
        co.orderBy(F.desc("common_users"), F.asc("business_id"))
        .limit(5)
        .join(wh["dim_business"], "business_id")
        .select(
            "business_id", "business_name", "stars", "city", "state",
            F.col("common_users").alias("common_reviewers"),
        )
        .orderBy(F.desc("common_reviewers"), F.asc("business_id"))
    )
    return {
        "similar_businesses": similar,
        "complementary_businesses": complementary,
        "also_reviewed": also_reviewed,
    }


def user_recommendations(wh: Warehouse, user_id: str) -> dict:
    """Preferred categories, category recommendations (anti-join on already
    reviewed, J4), collaborative 3-hop recs (J6)
    (webapp/neo4j_routes.py:609-693)."""
    my_reviews = wh["fact_review"].filter(F.col("user_id") == user_id)
    my_businesses = my_reviews.select("business_id").distinct()
    preferred_categories = (
        my_businesses.join(wh["business_category"], "business_id")
        .groupBy("category_name")
        .agg(F.countDistinct("business_id").alias("category_count"))
        .orderBy(F.desc("category_count"), F.asc("category_name"))
        .limit(5)
        .select(F.col("category_name").alias("category"), "category_count")
    )
    category_recommendations = (
        wh["business_category"]
        .join(
            preferred_categories.select(F.col("category").alias("category_name")),
            "category_name",
            "inner",
        )
        .groupBy("business_id")
        .agg(F.count("*").alias("relevance"))
        .join(my_businesses, "business_id", "left_anti")
        .join(wh["dim_business"], "business_id")
        .orderBy(F.desc("stars"), F.desc("relevance"), F.asc("business_id"))
        .limit(5)
        .select("business_id", "business_name", "stars", "city", "state")
    )
    co_users = (
        wh["fact_review"]
        .join(my_businesses, "business_id", "left_semi")
        .filter(F.col("user_id") != user_id)
        .select("user_id")
        .distinct()
    )
    collaborative = (
        wh["fact_review"]
        .join(co_users, "user_id", "left_semi")
        .join(my_businesses, "business_id", "left_anti")
        .groupBy("business_id")
        .agg(F.countDistinct("user_id").alias("common_users"))
        .join(wh["dim_business"], "business_id")
        .orderBy(F.desc("common_users"), F.desc("stars"), F.asc("business_id"))
        .limit(5)
        .select("business_id", "business_name", "stars", "city", "state", "common_users")
    )
    return {
        "preferred_categories": preferred_categories,
        "category_recommendations": category_recommendations,
        "collaborative_recommendations": collaborative,
    }


def _graph_edges(wh: Warehouse) -> DataFrame:
    """Undirected typed-node edge list for path search: business↔user (via
    reviews) and business↔category (via the bridge), node ids namespaced
    B:/U:/C: (the property graph's join-table encoding, SURVEY.md §1.4)."""
    bu = (
        wh["fact_review"]
        .select(
            F.concat(F.lit("B:"), "business_id").alias("src"),
            F.concat(F.lit("U:"), "user_id").alias("dst"),
        )
        .distinct()
    )
    bc = wh["business_category"].select(
        F.concat(F.lit("B:"), "business_id").alias("src"),
        F.concat(F.lit("C:"), "category_name").alias("dst"),
    )
    fwd = bu.unionAll(bc)
    return fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def connection_path(
    wh: Warehouse, business_id1: str, business_id2: str, path_type: str = "user"
) -> dict:
    """Paths between two businesses: direct user/category connections plus a
    shortest path to depth 6 (J10 — the reference's only graph-native
    operator, webapp/neo4j_routes.py:695-807). BFS is iterative frontier
    expansion (operators/graph.py); nodes of the found path are reconstructed
    by walking parent pointers — ≤6 single-node lookups."""
    if path_type == "category":
        my = wh["business_category"].filter(F.col("business_id") == business_id1)
        other = wh["business_category"].filter(F.col("business_id") == business_id2)
        paths = (
            my.join(other.select("category_name"), "category_name", "inner")
            .select(F.lit("category").alias("type"), F.col("category_name").alias("connection"))
            .orderBy("connection")
        )
    else:
        r1 = (
            wh["fact_review"]
            .filter(F.col("business_id") == business_id1)
            .select("user_id")
            .distinct()
        )
        r2 = (
            wh["fact_review"]
            .filter(F.col("business_id") == business_id2)
            .select("user_id")
            .distinct()
        )
        paths = (
            r1.join(r2, "user_id", "left_semi")
            .join(wh["dim_user"].select("user_id", "name"), "user_id")
            .select(
                F.lit("user").alias("type"),
                F.col("name").alias("connection"),
                "user_id",
            )
            .orderBy("user_id")
            .limit(10)
        )
    spark = wh["dim_business"].sparkSession
    from ..operators.graph import bfs_parents

    shortest = bfs_parents(
        spark, _graph_edges(wh), f"B:{business_id1}", f"B:{business_id2}", max_hops=6
    )
    return {"paths": paths, "shortest_path": shortest}


def graph_analytics(wh: Warehouse) -> dict:
    """A16 degree centrality for businesses and users, top categories, J5
    category co-occurrence pairs (webapp/neo4j_routes.py:802-886). Degree =
    union of per-edge-table counts, one groupBy per node type."""
    biz_degree_parts = [
        wh["fact_review"].select("business_id"),  # REVIEWS
        wh["fact_tip"].select("business_id"),  # ABOUT
        wh["business_category"].select("business_id"),  # IN_CATEGORY
        wh["dim_business"].select("business_id"),  # LOCATED_IN
        wh["fact_checkin"]
        .select(
            "business_id",
            F.year("checkin_date").alias("y"),
            F.month("checkin_date").alias("m"),
        )
        .distinct()
        .select("business_id"),  # HAD_CHECKIN (month-granular)
    ]
    union = biz_degree_parts[0]
    for p in biz_degree_parts[1:]:
        union = union.unionAll(p)
    central_businesses = (
        union.groupBy("business_id")
        .agg(F.count("*").alias("connection_count"))
        .orderBy(F.desc("connection_count"), F.asc("business_id"))
        .limit(5)
        .join(wh["dim_business"], "business_id")
        .select("business_id", "business_name", "stars", "city", "state", "connection_count")
        .orderBy(F.desc("connection_count"), F.asc("business_id"))
    )
    user_union = wh["fact_review"].select("user_id").unionAll(
        wh["fact_tip"].select("user_id")
    )
    influential_users = (
        user_union.groupBy("user_id")
        .agg(F.count("*").alias("connection_count"))
        .orderBy(F.desc("connection_count"), F.asc("user_id"))
        .limit(5)
        .join(wh["dim_user"].select("user_id", F.col("name").alias("user_name")), "user_id")
        .select("user_id", "user_name", "connection_count")
        .orderBy(F.desc("connection_count"), F.asc("user_id"))
    )
    top_categories = (
        wh["business_category"]
        .groupBy("category_name")
        .agg(F.count("*").alias("business_count"))
        .orderBy(F.desc("business_count"), F.asc("category_name"))
        .limit(10)
        .select(F.col("category_name").alias("category"), "business_count")
    )
    bc = wh["business_category"]
    category_pairs = (
        bc.alias("a")
        .join(bc.alias("b"), "business_id")
        .filter(F.col("a.category_name") < F.col("b.category_name"))
        .groupBy(
            F.col("a.category_name").alias("category1"),
            F.col("b.category_name").alias("category2"),
        )
        .agg(F.count("*").alias("business_count"))
        .orderBy(F.desc("business_count"), F.asc("category1"), F.asc("category2"))
        .limit(10)
    )
    return {
        "central_businesses": central_businesses,
        "influential_users": influential_users,
        "top_categories": top_categories,
        "category_pairs": category_pairs,
    }


# ---------------------------------------------------------------------------
# utility family (webapp/utility_routes.py)
# ---------------------------------------------------------------------------


def debug_counts(wh: Warehouse) -> dict:
    """Row-count dump per table (webapp/utility_routes.py:32-129)."""
    return {name: df.count() for name, df in wh.items() if not name.startswith("raw_")}


# ---------------------------------------------------------------------------
# presentation helpers (dense chart arrays — bounded collects)
# ---------------------------------------------------------------------------


def present_distribution(df: DataFrame, key_col: str, value_col: str, size: int, base: int = 1) -> list:
    """Dense zero-filled array for chart payloads (the reference's fill
    loops, webapp/mysql_routes.py:189-229). Bounded: size ≤ 24."""
    out = [0] * size
    for row in df.collect():
        idx = int(row[key_col]) - base
        if 0 <= idx < size:
            v = row[value_col]
            out[idx] = float(v) if isinstance(v, float) else int(v)
    return out
