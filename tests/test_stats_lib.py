"""Unit tests for the LIBRARY form of the statistical diagnostics
(operators/stats.py — extraction phase 6, round 12).

Hand-built NON-registry frames with non-default column names and
parameters, pure-Python/numpy reference twins (the test_curation_lib.py
pattern). The registry queries stay covered by tests/test_parity.py's
oracle gate.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import stats


def rfix(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_only_the_outlier(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0, None]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["rid", "x"])
    out = stats.mad_outliers(
        df, "x", keep_cols=(F.col("rid").cast("long").alias("rid"),),
        cut=3.5, digits=4).collect()
    assert [r["rid"] for r in out] == [5]
    # twin: median 12, MAD = median(|x-12|) over the 6 non-nulls
    clean = [v for v in vals if v is not None]
    med = float(np.median(clean))
    mad = float(np.median([abs(v - med) for v in clean]))
    assert out[0]["modified_z"] == pytest.approx(
        rfix(0.6745 * (1000.0 - med) / mad, 4), abs=1e-4)


def test_mad_degenerate_column_yields_no_outliers(spark):
    # majority-identical values: MAD = 0 -> by spec, nothing flagged
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)] + [(99, 1e9)], ["rid", "x"])
    assert stats.mad_outliers(df, "x").count() == 0


# ---------------------------------------------------------------------------
# chi2_grid
# ---------------------------------------------------------------------------


def test_chi2_grid_matches_python_twin(spark):
    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 30 + [("c", "x")] * 20)
    df = spark.createDataFrame(rows, ["r", "c"])
    out = {(g["rv"], g["cv"]): g for g in stats.chi2_grid(
        df, "r", "c", out_cols=("rv", "cv")).collect()}
    n = float(len(rows))
    rt = {"a": 40, "b": 40, "c": 20}
    ct = {"x": 60, "y": 40}
    obs = {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 10,
           ("b", "y"): 30, ("c", "x"): 20, ("c", "y"): 0}
    assert set(out) == set(obs)  # FULL cross incl. the zero cell
    for cell, o in obs.items():
        e = rt[cell[0]] * ct[cell[1]] / n
        assert out[cell]["observed"] == o
        assert out[cell]["expected"] == pytest.approx(rfix(e, 4), abs=1e-4)
        assert out[cell]["chi2_contrib"] == pytest.approx(
            rfix((o - e) ** 2 / e, 4), abs=1e-4)


# ---------------------------------------------------------------------------
# benford_profile
# ---------------------------------------------------------------------------


def test_benford_profile_counts_and_exclusions(spark):
    vals = [1.5, 19.0, 123.0, 2.0, 29.9, 900.0, 0.5, 0.9]  # <1 excluded
    df = spark.createDataFrame([(v,) for v in vals], ["amt"])
    out = {r["digit"]: r for r in stats.benford_profile(df, "amt").collect()}
    assert set(out) == set(range(1, 10))  # all nine digits present
    assert out[1]["observed"] == 3 and out[2]["observed"] == 2
    assert out[9]["observed"] == 1
    assert out[5]["observed"] == 0       # zero cell kept
    n = 6.0
    ben1 = math.log10(2.0)
    assert out[1]["benford_p"] == pytest.approx(rfix(ben1, 6), abs=1e-6)
    assert out[1]["observed_p"] == pytest.approx(rfix(3 / n, 6), abs=1e-6)
    assert out[1]["chi2_contrib"] == pytest.approx(
        rfix((3 / n - ben1) ** 2 / ben1 * n, 4), abs=1e-4)


def test_benford_empty_after_filter_is_null_guarded(spark):
    df = spark.createDataFrame([(0.2,), (0.3,)], ["amt"])
    out = stats.benford_profile(df, "amt").collect()
    assert len(out) == 9
    assert all(r["observed"] == 0 and r["observed_p"] is None for r in out)


# ---------------------------------------------------------------------------
# gini_by_group
# ---------------------------------------------------------------------------


def _py_gini(values):
    xs = sorted(values)
    n = len(xs)
    tot = sum(xs)
    s = sum((i + 1) * x for i, x in enumerate(xs))
    return 2.0 * s / (n * tot) - (n + 1.0) / n


def test_gini_by_group_matches_python_twin(spark):
    groups = {
        "equal": [10.0, 10.0, 10.0, 10.0],          # gini 0
        "skew": [1.0, 1.0, 1.0, 97.0],              # concentrated
        "mix": [5.0, 15.0, 30.0, 50.0],
    }
    rows = [(g, i, v) for g, vs in groups.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, ["grp", "ent", "val"])
    out = {r["g"]: r for r in stats.gini_by_group(
        df, "grp", "val", tie_col="ent",
        out_cols=("g", "n", "tot", "gini")).collect()}
    for g, vs in groups.items():
        assert out[g]["n"] == len(vs)
        assert out[g]["tot"] == pytest.approx(rfix(sum(vs), 2))
        assert out[g]["gini"] == pytest.approx(rfix(_py_gini(vs), 4), abs=1e-4)
    assert out["equal"]["gini"] == pytest.approx(0.0, abs=1e-4)
    assert out["skew"]["gini"] > out["mix"]["gini"] > out["equal"]["gini"]


# ---------------------------------------------------------------------------
# psi_profile
# ---------------------------------------------------------------------------


def test_psi_identical_populations_near_zero(spark):
    # ref and cmp drawn from the same values -> every bin contributes ~0
    vals = [float(i) for i in range(1, 101)]
    rows = [(v, True) for v in vals] + [(v, False) for v in vals]
    df = spark.createDataFrame(rows, ["x", "ir"])
    out = stats.psi_profile(df, "x", ref=F.col("ir"), n_edges=4).collect()
    total = sum(r["psi_contrib"] for r in out if r["psi_contrib"] is not None)
    assert total == pytest.approx(0.0, abs=1e-6)
    assert {r["bin"] for r in out} <= set(range(5))
    for r in out:
        assert r["n_ref"] == r["n_cmp"]


def test_psi_shifted_population_matches_numpy_twin(spark):
    ref_vals = [float(i) for i in range(1, 101)]          # 1..100
    cmp_vals = [float(i) for i in range(51, 151)]         # shifted +50
    rows = [(v, True) for v in ref_vals] + [(v, False) for v in cmp_vals]
    df = spark.createDataFrame(rows, ["x", "ir"])
    n_edges = 3
    out = {r["bin"]: r for r in stats.psi_profile(
        df, "x", ref=F.col("ir"), n_edges=n_edges).collect()}
    # twin: exact linear-interpolation quartile edges, canonicalized at 6dp
    edges = [rfix(float(np.percentile(ref_vals, 25 * (k + 1),
                                      method="linear")), 6)
             for k in range(n_edges)]

    def bin_of(v):
        for k, e in enumerate(edges):
            if v < e:
                return k
        return n_edges

    nr = {b: 0 for b in range(n_edges + 1)}
    nc = {b: 0 for b in range(n_edges + 1)}
    for v in ref_vals:
        nr[bin_of(v)] += 1
    for v in cmp_vals:
        nc[bin_of(v)] += 1
    tr, tc = float(sum(nr.values())), float(sum(nc.values()))
    psi_total = 0.0
    for b in range(n_edges + 1):
        assert out[b]["n_ref"] == nr[b] and out[b]["n_cmp"] == nc[b]
        if nr[b] > 0 and nc[b] > 0:
            expect = (nr[b] / tr - nc[b] / tc) * math.log(
                (nr[b] / tr) / (nc[b] / tc))
            assert out[b]["psi_contrib"] == pytest.approx(
                rfix(expect, 6), abs=1e-6)
            psi_total += expect
        else:
            assert out[b]["psi_contrib"] is None
    assert psi_total > 0.25  # a +50% shift is a loud drift alarm
