"""API façade (SURVEY.md §3.1/§7 step 7): the reference's REST JSON
contracts over the endpoint query layer.

The reference's webapp turns each query into a JSON payload — pagination
envelopes {total, page, limit, pages}, dense chart arrays, Decimal→float and
date→ISO coercion (webapp/db_utils.py:37-43, webapp/mysql_routes.py:691-699).
This module is that thin presentation shell on top of
``queries/endpoints.py``: every method returns plain JSON-serializable
Python, shaped like the reference's response for the same endpoint, so a
client of the reference can point at this engine unchanged.

Everything heavy stays in the endpoint layer's DataFrames; this file only
materializes bounded results (top-N pages, ≤24-bucket distributions).
"""

from __future__ import annotations

import datetime as _dt
import os
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from .queries import endpoints as E
from .sources.etl import build_warehouse


def _coerce(v):
    """webapp/db_utils.py:37-43 analog: Decimal→float, temporal→ISO."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, list):
        return [_coerce(x) for x in v]
    if isinstance(v, dict):
        return {k: _coerce(x) for k, x in v.items()}
    return v


def rows(df: DataFrame) -> list[dict]:
    return [{k: _coerce(v) for k, v in r.asDict(recursive=True).items()} for r in df.collect()]


class YelpWarehouseAPI:
    """One engine, all three of the reference's API families."""

    def __init__(self, wh: dict[str, DataFrame]):
        self.wh = wh

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_raw(cls, spark: SparkSession, raw_dir: str, limits: dict | None = None):
        return cls(build_warehouse(spark, raw_dir, limits))

    @classmethod
    def from_warehouse_dir(cls, spark: SparkSession, wh_dir: str):
        wh = {
            name: spark.read.parquet(os.path.join(wh_dir, name))
            for name in os.listdir(wh_dir)
            if os.path.isdir(os.path.join(wh_dir, name))
        }
        return cls(wh)

    def register_views(self, spark: SparkSession, prefix: str = "") -> None:
        """Expose every warehouse table to ``spark.sql`` users."""
        for name, df in self.wh.items():
            df.createOrReplaceTempView(prefix + name)

    # -- relational family -------------------------------------------------

    def overview_stats(self) -> dict:
        r = E.overview_stats(self.wh)
        return {
            "business_count": r["business_count"],
            "review_count": r["review_count"],
            "user_count": r["user_count"],
            "category_stats": rows(r["category_stats"]),
            "star_distribution": rows(r["star_distribution"]),
        }

    def top_businesses(self, category: str = "Restaurants", limit: int = 10, page: int = 1) -> dict:
        r = E.top_businesses(self.wh, category, limit, page)
        return {"businesses": rows(r["businesses"]), "pagination": r["pagination"]}

    def business_checkins(self, business_id: str) -> dict:
        r = E.business_checkins(self.wh, business_id)
        return {
            "day_distribution": E.present_distribution(
                r["day_distribution"], "day_of_week", "checkin_count", 7
            ),
            "month_distribution": E.present_distribution(
                r["month_distribution"], "month", "checkin_count", 12
            ),
            "hour_distribution": E.present_distribution(
                r["hour_distribution"], "hour", "checkin_count", 24, base=0
            ),
        }

    def city_ratings(self, state: str | None = None, limit: int = 20) -> list[dict]:
        return rows(E.city_ratings(self.wh, state, limit))

    def business_performance(self, business_id: str) -> dict:
        r = E.business_performance(self.wh, business_id)
        biz = rows(r["business"])
        return {
            "business": biz[0] if biz else None,
            "reviews_by_month": rows(r["reviews_by_month"]),
            "checkins_by_month": rows(r["checkins_by_month"]),
        }

    def business_reviews(
        self, business_id: str, page: int = 1, limit: int = 10, sort: str = "date_desc"
    ) -> dict:
        r = E.business_reviews(self.wh, business_id, page, limit, sort)
        return {"reviews": rows(r["reviews"]), "pagination": r["pagination"]}

    def search_businesses(self, **params) -> dict:
        r = E.search_businesses(self.wh, **params)
        return {"businesses": rows(r["businesses"]), "pagination": r["pagination"]}

    def review_trends(self, now: str | None = None) -> dict:
        data = rows(E.review_trends(self.wh, now))
        return {
            "dates": [d["date"] for d in data],
            "review_counts": [d["review_count"] for d in data],
        }

    def monthly_distribution(self) -> dict:
        data = rows(E.monthly_distribution(self.wh))
        return {
            "labels": [d["month_name"] for d in data],
            "data": [d["review_count"] for d in data],
        }

    def year_comparison(self, now: str | None = None) -> dict:
        data = rows(E.year_comparison(self.wh, now))
        month_names = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                       "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
        return {
            "labels": month_names,
            "data": {str(d["year"]): [d[str(m)] for m in range(1, 13)] for d in data},
        }

    def category_ratings(self) -> dict:
        data = rows(E.category_ratings(self.wh))
        return {
            "categories": [d["category_name"] for d in data],
            "avg_ratings": [d["avg_rating"] for d in data],
        }

    def category_volumes(self) -> dict:
        data = rows(E.category_volumes(self.wh))
        return {
            "categories": [d["category_name"] for d in data],
            "review_counts": [d["review_count"] for d in data],
        }

    def state_stats(self) -> dict:
        data = rows(E.state_stats(self.wh))
        return {
            "states": [d["state"] for d in data],
            "business_counts": [d["business_count"] for d in data],
            "avg_ratings": [d["avg_rating"] for d in data],
        }

    def category_trends(self, category: str) -> dict:
        data = rows(E.category_trends(self.wh, category))
        return {
            "periods": [d["period"] for d in data],
            "categories": [category],
            "data": {category: [d["review_count"] for d in data]},
        }

    def top_users(self) -> list[dict]:
        return rows(E.top_users(self.wh))

    # -- document family ---------------------------------------------------

    def document_size_stats(self) -> dict:
        data = {d["size_range"]: d["document_count"] for d in rows(E.document_size_stats(self.wh))}
        return {
            "size_ranges": E._SIZE_BUCKETS,
            "document_counts": [data.get(b, 0) for b in E._SIZE_BUCKETS],
        }

    def business_attributes(self) -> dict:
        data = rows(E.business_attributes(self.wh))
        return {
            "attribute_names": [d["attribute"] for d in data],
            "attribute_counts": [d["count"] for d in data],
        }

    def schema_analysis(self) -> list[dict]:
        return rows(E.schema_analysis(self.wh))

    def array_field_analysis(self) -> dict:
        return {"array_fields": rows(E.array_field_analysis(self.wh))}

    def document_structure(self, collection: str = "business") -> dict:
        return E.document_structure(self.wh, collection)

    # -- graph family ------------------------------------------------------

    def graph_overview_stats(self) -> dict:
        r = E.graph_overview_stats(self.wh)
        density = rows(r["density_metrics"])
        return {
            "business_count": r["business_count"],
            "review_count": r["review_count"],
            "user_count": r["user_count"],
            "relationship_count": r["relationship_count"],
            "category_stats": rows(r["category_stats"]),
            "relationship_stats": rows(r["relationship_stats"]),
            "top_users": rows(r["top_users"]),
            "density_metrics": density[0] if density else None,
        }

    def graph_search_businesses(self, **params) -> dict:
        r = E.graph_search_businesses(self.wh, **params)
        return {"businesses": rows(r["businesses"]), "pagination": r["pagination"]}

    def business_network(self, business_id: str) -> dict:
        return {k: rows(v) for k, v in E.business_network(self.wh, business_id).items()}

    def business_recommendations(self, business_id: str) -> dict:
        return {
            k: rows(v) for k, v in E.business_recommendations(self.wh, business_id).items()
        }

    def user_recommendations(self, user_id: str) -> dict:
        return {k: rows(v) for k, v in E.user_recommendations(self.wh, user_id).items()}

    def connection_path(self, business_id1: str, business_id2: str, path_type: str = "user") -> dict:
        r = E.connection_path(self.wh, business_id1, business_id2, path_type)
        return {
            "business1": {"id": business_id1},
            "business2": {"id": business_id2},
            "paths": rows(r["paths"]),
            "shortest_path": rows(r["shortest_path"]),
        }

    def graph_analytics(self) -> dict:
        return {k: rows(v) for k, v in E.graph_analytics(self.wh).items()}

    # -- utility -----------------------------------------------------------

    def debug(self) -> dict:
        return E.debug_counts(self.wh)

    def health(self) -> dict:
        return {"status": "ok", "engine": "spark", "tables": len(self.wh)}
