"""Dynamic-assembly query registrations (P10/O2/O4) — fixed parameterizations
of plans.builder so the driver can oracle-check the composed plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.builder import SearchParams, search
from ..sources.tables import table
from .registry import register


@register(
    "p10_dynamic_search",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part
    WHERE lower(p_name) LIKE '%re%'
      AND p_size >= 10
      AND p_retailprice <= 1500
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 50
    """,
    tags=("P10", "O2", "O4"),
)
def p10_dynamic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic predicate assembly from optional params (P10) + validated
    sort enum (O2) + page slice (O4).

    Reference: search_businesses' string-assembled WHERE/ORDER BY,
    webapp/mysql_routes.py:607-659. Here: composed Column predicates — one
    logical plan, injection-free, fully pushed down.
    """
    params = SearchParams(name_contains="re", min_size=10, max_price=1500.0)
    return search(table(spark, sf_dir, "part"), params).limit(50)
