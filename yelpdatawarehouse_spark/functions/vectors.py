"""Dense-vector math over ``array<float>`` columns — JVM-side only.

Used by the similarity-search and embedding-dedup operators. No Python
crosses the boundary per row.

Kernel economics (measured r8): the higher-order-function forms
(zip_with/aggregate) are CodegenFallback — interpreted per row inside the
compiled stage (~12µs per 64-dim dot) — so a pair join's cost is
dominated by HOW MANY HOF evaluations run per pair. Unrolling the dot
into 64 element_at terms compiles, but the generated method blows past
the JIT huge-method limit and runs as un-JITted bytecode — measured
SLOWER than the interpreted HOF (18.7s -> 24.5s on the cosine-pair
query). The wins that work: precompute per-row norms once (3 HOFs/pair
-> 1) and materialize the score before a filter+project consumes it
twice (2 evaluations -> 1).

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

