"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementations live in the ``yelpdatawarehouse_spark`` package;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.queries.registry import oracles as _oracles
from yelpdatawarehouse_spark.queries.registry import queries as _queries
from yelpdatawarehouse_spark.session import tune_existing

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the 4-way star join + multi-aggregate rollup (J1/A3), the
    reference's top-businesses/city-ratings workload shape
    (webapp/mysql_routes.py:90-100,329-361).
    """
    tune_existing(spark)
    all_queries()
    from yelpdatawarehouse_spark.queries.relational import j1_multiway_revenue

    return j1_multiway_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    all_queries()
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    all_queries()
    return _oracles()
