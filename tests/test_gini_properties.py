"""Differential check of the rank-formula Gini against the pairwise
mean-absolute-difference DEFINITION — a genuinely different derivation
(G = Σ|xi−xj| / (2n²μ)), so an algebra slip in the rank form (an
off-by-one in (n+1)/n, a tie-handling error) cannot hide the way it
could behind an oracle that copies the same formula."""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from yelpdatawarehouse_spark.queries.drafts_r6 import diag_gini_spend_by_nation

_NATIONS = [(0, "ALPHA"), (1, "BETA")]

_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),   # custkey pool (small: ties)
        st.integers(min_value=1, max_value=500),  # integer prices: exact sums
    ),
    min_size=1,
    max_size=40,
)


def _py_gini(xs: list[float]) -> float:
    n = len(xs)
    mu = sum(xs) / n
    if mu == 0:
        return 0.0
    mad = sum(abs(a - b) for a in xs for b in xs) / (n * n)
    return mad / (2 * mu)


def _expected(orders):
    spend = {}
    for ck, price in orders:
        nation = _NATIONS[ck % 2][1]
        spend.setdefault(nation, {}).setdefault(ck, 0.0)
        spend[nation][ck] += float(price)
    return {
        nation: _py_gini(list(per_cust.values()))
        for nation, per_cust in spend.items()
    }


@settings(max_examples=6, deadline=None)
@given(_orders)
def test_rank_gini_equals_mean_abs_difference_gini(spark, orders):
    out = tempfile.mkdtemp(prefix="gini_prop_")
    try:
        spark.createDataFrame(
            _NATIONS, "n_nationkey long, n_name string"
        ).write.mode("overwrite").parquet(os.path.join(out, "nation.parquet"))
        custs = sorted({ck for ck, _ in orders})
        spark.createDataFrame(
            [(ck, ck % 2) for ck in custs],
            "c_custkey long, c_nationkey long",
        ).write.mode("overwrite").parquet(os.path.join(out, "customer.parquet"))
        spark.createDataFrame(
            [(ck, float(p)) for ck, p in orders],
            "o_custkey long, o_totalprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "orders.parquet")
        )
        got = {
            r.nation: r.gini
            for r in diag_gini_spend_by_nation(spark, out).collect()
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
    want = _expected(orders)
    assert set(got) == set(want)
    for nation, g in want.items():
        # 4dp presentation rounding on the engine side
        assert abs(got[nation] - g) < 2e-4, f"{nation}: {got[nation]} vs {g}"
