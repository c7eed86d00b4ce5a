"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2 is registered here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) an ANSI-SQL oracle string run by DuckDB over the same parquet.
The driver's correctness gate hashes both results order-insensitively, so:

* column names must match exactly (alias both sides identically);
* integer outputs are cast to 64-bit on both sides;
* temporal outputs are rendered as ISO strings on both sides;
* floating outputs are rounded on both sides (same ndigits).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags,
                                  doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {n: d.oracle for n, d in REGISTRY.items() if d.oracle is not None}
