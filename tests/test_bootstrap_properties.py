"""Differential check of the Poisson-bootstrap weights against an
independent pure-Python md5 model (test_cms_properties.py pattern): the
DuckDB oracle shares the SQL rendering of the weight arithmetic, so a
misconception in the inverse-CDF cutoffs or the 60-bit uniform could pass
the hash gate on both engines — this twin recomputes every replicate mean
from hashlib in Python and demands exact agreement."""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from yelpdatawarehouse_spark.queries.drafts_r6 import (
    BOOT_B,
    _BOOT_CUTS,
    ml_bootstrap_mean_ci,
)

_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10_000),
        st.floats(min_value=1.0, max_value=9999.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


def _py_weight(b: int, orderkey: int) -> int:
    h = int(hashlib.md5(f"{b}:{orderkey}".encode()).hexdigest()[:15], 16)
    u = h / float(1 << 60)
    for w, cut in enumerate(_BOOT_CUTS):
        if u < cut:
            return w
    return 4


def _py_replicates(rows):
    out = {}
    for b in range(BOOT_B):
        s = sum(_py_weight(b, k) * v for k, v in rows)
        w = sum(_py_weight(b, k) for k, v in rows)
        mean = (
            math.floor(s / w * 10_000 + 0.5) / 10_000 if w else None
        )
        out[b] = (mean, w)
    return out


@settings(max_examples=6, deadline=None)
@given(_orders)
def test_spark_replicates_equal_python_model(spark, rows):
    out = tempfile.mkdtemp(prefix="boot_prop_")
    try:
        spark.createDataFrame(
            [(k, float(v)) for k, v in rows],
            "o_orderkey long, o_totalprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "orders.parquet")
        )
        got = {
            r.replicate: (r.boot_mean, r.n_eff)
            for r in ml_bootstrap_mean_ci(spark, out).collect()
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
    # rebuild the model from the EXACT values Spark read back (float32
    # parquet round-trip is shared by both sides via the same file)
    want = _py_replicates([(k, float(v)) for k, v in rows])
    assert set(got) == set(range(BOOT_B))
    for b, (mean, w) in want.items():
        assert got[b][1] == w, f"replicate {b}: n_eff {got[b][1]} != {w}"
        if mean is None:
            assert got[b][0] is None
        else:
            assert got[b][0] is not None
            assert abs(got[b][0] - mean) < 1e-9, f"replicate {b}"
