"""Dynamic predicate/sort assembly (P10/O2/O4).

The reference builds SQL strings by concatenating optional WHERE clauses and
interpolating sort columns from request params (webapp/mysql_routes.py:
607-659 — including an f-string sort interpolation, a SQLi-prone pattern
noted in SURVEY §8). The Spark-first form composes Column predicates — no
string assembly, no injection surface, and Catalyst still sees one logical
plan it can push down.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# validated sort-key enum → deterministic column list (always ends in the
# unique key so pagination is stable; O2)
_SORT_KEYS = {
    "price_desc": lambda: [F.desc("p_retailprice"), F.asc("p_partkey")],
    "price_asc": lambda: [F.asc("p_retailprice"), F.asc("p_partkey")],
    "size_desc": lambda: [F.desc("p_size"), F.asc("p_partkey")],
    "name": lambda: [F.asc("p_name"), F.asc("p_partkey")],
}


@dataclass
class SearchParams:
    """Optional filters, mirroring the reference's request params
    (name substring ~ `q`, brand ~ `category`, min_size ~ `min_rating`)."""

    name_contains: str | None = None
    brand: str | None = None
    min_size: int | None = None
    max_price: float | None = None
    sort: str = "price_desc"


def _predicates(p: SearchParams) -> list[Column]:
    preds: list[Column] = []
    if p.name_contains:
        preds.append(F.lower(F.col("p_name")).contains(p.name_contains.lower()))
    if p.brand:
        preds.append(F.col("p_brand") == p.brand)
    if p.min_size is not None:
        preds.append(F.col("p_size") >= p.min_size)
    if p.max_price is not None:
        preds.append(F.col("p_retailprice") <= p.max_price)
    return preds


def search(parts: DataFrame, params: SearchParams) -> DataFrame:
    """Compose optional predicates + validated sort into one plan."""
    df = parts
    for pred in _predicates(params):
        df = df.filter(pred)
    if params.sort not in _SORT_KEYS:
        raise ValueError(f"invalid sort key {params.sort!r}; one of {sorted(_SORT_KEYS)}")
    return df.orderBy(*_SORT_KEYS[params.sort]()).select(
        "p_partkey", "p_name", "p_brand", "p_size", "p_retailprice"
    )
