"""Unit tests for the LIBRARY form of the time-series family
(operators/timeseries.py — extraction phase 7, round 12).

Hand-built NON-registry series with non-default column names and
parameters, pure-Python reference twins replaying the exact recurrences.
The registry queries stay covered by tests/test_parity.py's oracle gate.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from yelpdatawarehouse_spark.operators import timeseries


def rfix(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _series(spark, values, t0=dt.date(2024, 1, 1)):
    rows = [(t0 + dt.timedelta(days=i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["ts", "v"])


# ---------------------------------------------------------------------------
# acf
# ---------------------------------------------------------------------------


def _py_acf(xs, max_lag):
    out = {}
    for k in range(1, max_lag + 1):
        pairs = [(xs[i], xs[i - k]) for i in range(k, len(xs))]
        n = float(len(pairs))
        if n < 2:
            out[k] = (None, len(pairs))
            continue
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            out[k] = (None, len(pairs))
        else:
            out[k] = (rfix((n * sxy - sx * sy) / math.sqrt(vx * vy), 4),
                      len(pairs))
    return out


def test_acf_matches_python_twin(spark):
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    out = {r["lag"]: (r["acf"], r["n_pairs"]) for r in timeseries.acf(
        _series(spark, xs), "ts", "v", max_lag=3).collect()}
    expect = _py_acf(xs, 3)
    assert set(out) == {1, 2, 3}
    for k in expect:
        assert out[k][1] == expect[k][1]
        if expect[k][0] is None:
            assert out[k][0] is None
        else:
            assert out[k][0] == pytest.approx(expect[k][0], abs=1e-4)


def test_acf_alternating_series_is_negative_at_lag1(spark):
    xs = [1.0, -1.0] * 6
    out = {r["lag"]: r["acf"] for r in timeseries.acf(
        _series(spark, xs), "ts", "v", max_lag=2).collect()}
    assert out[1] == pytest.approx(-1.0, abs=1e-4)
    assert out[2] == pytest.approx(1.0, abs=1e-4)


def test_acf_constant_series_null_guarded(spark):
    out = timeseries.acf(_series(spark, [5.0] * 8), "ts", "v",
                         max_lag=2).collect()
    assert all(r["acf"] is None for r in out)  # ANSI corr would THROW


# ---------------------------------------------------------------------------
# cusum_trace
# ---------------------------------------------------------------------------


def test_cusum_trace_matches_python_twin(spark):
    xs = [10.0, 10.0, 10.0, 20.0, 20.0, 20.0]  # level shift at index 3
    out = timeseries.cusum_trace(_series(spark, xs), "ts", "v",
                                 digits=2).orderBy("ts").collect()
    m = sum(xs) / len(xs)
    s, trace = 0.0, []
    for x in xs:
        s += x - m
        trace.append(s)
    peak = max(abs(t) for t in trace)
    for r, x, t in zip(out, xs, trace):
        assert r["v"] == pytest.approx(rfix(x, 2))
        assert r["cusum"] == pytest.approx(rfix(t, 2), abs=1e-2)
        assert r["is_changepoint"] == (abs(t) == peak)
    # the changepoint lands at the last pre-shift day (index 2)
    assert [r["is_changepoint"] for r in out].index(True) == 2


# ---------------------------------------------------------------------------
# holt_linear
# ---------------------------------------------------------------------------


def _py_holt(xs, a, b):
    lvl = xs[0]
    tr = (xs[1] - xs[0]) if len(xs) >= 2 else 0.0
    out = [(xs[0], lvl, tr)]
    for y in xs[1:]:
        new_l = a * y + (1 - a) * (lvl + tr)
        tr = b * (new_l - lvl) + (1 - b) * tr
        lvl = new_l
        out.append((y, lvl, tr))
    return out


def test_holt_linear_matches_python_twin(spark):
    xs = [100.0, 120.0, 90.0, 130.0, 150.0, 110.0]
    a, b = 0.5, 0.3  # non-registry smoothing constants
    out = timeseries.holt_linear(_series(spark, xs), "ts", "v",
                                 alpha=a, beta=b).orderBy("ts").collect()
    expect = _py_holt(xs, a, b)
    assert len(out) == len(xs)
    for r, (y, lvl, tr) in zip(out, expect):
        assert r["v"] == pytest.approx(rfix(y, 2))
        assert r["level"] == pytest.approx(rfix(lvl, 2), abs=1e-2)
        assert r["trend"] == pytest.approx(rfix(tr, 2), abs=1e-2)


def test_holt_single_point_zero_trend(spark):
    out = timeseries.holt_linear(_series(spark, [42.0]), "ts", "v").collect()
    assert len(out) == 1
    assert out[0]["level"] == 42.0 and out[0]["trend"] == 0.0


# ---------------------------------------------------------------------------
# kalman_local_level
# ---------------------------------------------------------------------------


def _py_kalman(xs, q, r):
    x, p = xs[0], r
    out = [(xs[0], x, p, 1.0)]
    for y in xs[1:]:
        pm = p + q
        k = pm / (pm + r)
        x = x + k * (y - x)
        p = (1 - k) * pm
        out.append((y, x, p, k))
    return out


def test_kalman_matches_python_twin(spark):
    xs = [100.0, 120.0, 90.0, 130.0, 150.0]
    q, r = 4.0, 16.0  # non-registry variances
    out = timeseries.kalman_local_level(
        _series(spark, xs), "ts", "v", q=q, r=r,
        digits_level=2, digits_gain=6).orderBy("ts").collect()
    expect = _py_kalman(xs, q, r)
    for row, (y, x, p, k) in zip(out, expect):
        assert row["v"] == y
        assert row["level_estimate"] == pytest.approx(rfix(x, 2), abs=1e-2)
        assert row["error_variance"] == pytest.approx(rfix(p, 2), abs=1e-2)
        assert row["kalman_gain"] == pytest.approx(rfix(k, 6), abs=1e-6)


def test_kalman_gain_converges(spark):
    # constant observations: the gain strictly decreases toward its
    # steady state as the estimate's variance shrinks
    out = timeseries.kalman_local_level(
        _series(spark, [50.0] * 8), "ts", "v", q=1.0, r=100.0,
    ).orderBy("ts").collect()
    gains = [r["kalman_gain"] for r in out[1:]]
    assert all(g1 >= g2 for g1, g2 in zip(gains, gains[1:]))
    assert gains[-1] < gains[0]
