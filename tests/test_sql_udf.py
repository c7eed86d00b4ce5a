"""SQL UDFs must be INLINED by Catalyst — the draft's scale claim is that
ydw_disc_price/ydw_charge add zero per-row call overhead, which holds iff
the physical plan contains no Python/function-eval node and the whole
aggregate stays in codegen."""

from __future__ import annotations

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries.drafts_r6 import f15_sql_udf_pricing


def test_sql_udf_inlines_to_codegen(spark):
    df = f15_sql_udf_pricing(spark, SF_TEST_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst replaced the function CALLS with their bodies: no Python or
    # invocation node survives, the bodies appear as plain arithmetic in
    # the partial aggregate, and the :maxqty predicate reached the scan.
    assert "PythonUDF" not in plan
    assert "BatchEvalPython" not in plan
    assert "ydw_disc_price" not in plan
    assert "HashAggregate" in plan
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10.0)]" in plan


def test_sql_udf_composition_and_params(spark):
    """ydw_charge calls ydw_disc_price (function composition) and the
    table name + quantity bound arrive via parameters; spot-check one
    aggregate value against the direct expression."""
    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.sources.tables import table

    got = {r["l_returnflag"]: r for r in f15_sql_udf_pricing(spark, SF_TEST_DIR).collect()}
    li = table(spark, SF_TEST_DIR, "lineitem").filter(F.col("l_quantity") < 10)
    want = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sdp"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n_items"] == want[k]["n_items"]
        assert abs(got[k]["sum_disc_price"] - want[k]["sdp"]) < 0.01
