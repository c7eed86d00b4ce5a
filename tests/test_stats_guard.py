"""Zero-variance guard for a_stats_aggregates: under ANSI mode the builtin
corr/covar_samp/regr_slope THROW (divide-by-zero) on a constant group where
DuckDB returns NULL. The query is built from raw moments with explicit
guards (same class as t19_acf_daily_orders); this pins the degenerate
branch on a constructed constant-column corpus the sf dirs never hit, and
checks full oracle parity on it — not just "doesn't throw"."""

from __future__ import annotations

import os

import pytest

from tests.parity import SF_TEST_DIR, compare
from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def constant_lineitem_sf_dir(spark, tmp_path_factory):
    """Every non-lineitem table empty; lineitem has two groups — one
    constant in BOTH columns (corr/slope NULL, covar/stddev 0), one with a
    constant quantity but varying price (slope NULL, corr NULL, covar 0,
    stddev > 0)."""
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("const_li"))
    for t in TABLES:
        if t == "lineitem":
            continue
        schema = pq.read_schema(os.path.join(SF_TEST_DIR, t + ".parquet"))
        pq.write_table(schema.empty_table(), os.path.join(out, t + ".parquet"))
    src = pq.read_table(os.path.join(SF_TEST_DIR, "lineitem.parquet")).slice(
        0, 6
    )
    schema = src.schema
    import pyarrow as pa

    arrays = []
    for name in schema.names:
        col = src.column(name)
        if name == "l_returnflag":
            col = pa.array(
                ["C" if i % 2 == 0 else "V" for i in range(6)]
            ).cast(schema.field(name).type)
        elif name == "l_quantity":
            col = pa.array([7.0] * 6).cast(schema.field(name).type)
        elif name == "l_extendedprice":
            col = pa.array(
                [3.0 if i % 2 == 0 else float(i + 1) for i in range(6)]
            ).cast(schema.field(name).type)
        arrays.append(col)
    pq.write_table(
        pa.table(arrays, schema=schema), os.path.join(out, "lineitem.parquet")
    )
    return out


def test_stats_aggregates_zero_variance_matches_oracle(
    spark, constant_lineitem_sf_dir
):
    q = all_queries()["a_stats_aggregates"]
    df = q.fn(spark, constant_lineitem_sf_dir)
    problems = compare(df, q.oracle, constant_lineitem_sf_dir)
    assert not problems, "\n".join(problems)
    got = {r.l_returnflag: r for r in df.collect()}
    assert got["C"].qty_price_corr is None
    assert got["C"].price_per_qty is None
    assert got["C"].qty_price_covar == 0.0
    assert got["C"].price_stddev == 0.0
    assert got["V"].qty_price_corr is None  # x constant => corr undefined
    assert got["V"].price_per_qty is None
    assert got["V"].price_stddev > 0.0
