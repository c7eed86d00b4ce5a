"""Differential check of the ACF draft against a pure-Python Pearson
model on random order-date streams — including the constant-series case,
where Spark's ANSI `corr` would throw (found by probing; the draft now
uses guarded moment arithmetic and must return NULL exactly where the
model's variance vanishes, matching DuckDB's corr semantics)."""

from __future__ import annotations

import datetime
import math
import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from yelpdatawarehouse_spark.queries.drafts_r6 import (
    ACF_MAX_LAG,
    t19_acf_daily_orders,
)

_BASE = datetime.date(2024, 3, 1)

# day offsets with repeats (counts > 1) and gaps (observed-day collapse);
# a single repeated offset yields a CONSTANT one-point series per lag
_days = st.lists(
    st.integers(min_value=0, max_value=12), min_size=1, max_size=40
)


def _py_acf(day_offsets):
    counts: dict = {}
    for d in day_offsets:
        counts[d] = counts.get(d, 0) + 1
    xs = [float(counts[d]) for d in sorted(counts)]
    out = {}
    for k in range(1, ACF_MAX_LAG + 1):
        pairs = [(xs[i - k], xs[i]) for i in range(k, len(xs))]
        n = len(pairs)
        if n < 2:
            out[k] = (None, n)
            continue
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            out[k] = (None, n)
        else:
            c = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            out[k] = (math.floor(c * 10_000 + 0.5) / 10_000, n)
    return out


@settings(max_examples=6, deadline=None)
@given(_days)
def test_acf_equals_python_pearson_model(spark, day_offsets):
    rows = [
        (i, datetime.datetime.combine(_BASE + datetime.timedelta(days=d),
                                      datetime.time(12, 0)))
        for i, d in enumerate(day_offsets)
    ]
    out = tempfile.mkdtemp(prefix="acf_prop_")
    try:
        spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "orders.parquet")
        )
        got = {r.lag: (r.acf, r.n_pairs) for r in t19_acf_daily_orders(spark, out).collect()}
    finally:
        shutil.rmtree(out, ignore_errors=True)
    want = _py_acf(day_offsets)
    assert set(got) == set(want)
    for k, (c, n) in want.items():
        assert got[k][1] == n, f"lag {k}: n_pairs"
        if c is None:
            assert got[k][0] is None, f"lag {k}: expected NULL acf"
        else:
            assert got[k][0] is not None and abs(got[k][0] - c) < 2e-4, f"lag {k}"
