"""Dense-vector math over ``array<float>`` columns — JVM-side only.

Used by the similarity-search and embedding-dedup operators. Everything is
expressed with higher-order functions (zip_with/aggregate) so it runs inside
whole-stage codegen; no Python crosses the boundary per row.

Precision contract: elements are cast to double and accumulated
left-to-right, matching a sequential SQL fold; presentation values are
rounded so engine/oracle hashes agree despite last-ulp noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB renderings (list_inner_product accumulates in order; rounding at the
# presentation edge absorbs any vectorization reassociation).
def dot_sql(a: str, b: str) -> str:
    return f"list_inner_product({a}::DOUBLE[], {b}::DOUBLE[])"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"(list_inner_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_inner_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )

