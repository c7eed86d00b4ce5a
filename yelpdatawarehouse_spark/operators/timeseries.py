"""Reusable time-series diagnostics/smoothers over ARBITRARY series
DataFrames.

Phase 7 of the library-extraction program (dedup/ann r10,
textops/sampling/curation r11, graphalgs/embeddings/retrieval/stats
r12): the day-spine recurrence family behind the ``t19/t20/t21/t25``
registry queries as parameterized functions over any (time, value)
frame::

    from yelpdatawarehouse_spark.operators import timeseries
    ac   = timeseries.acf(daily, "d", "x", max_lag=7)
    cu   = timeseries.cusum_trace(daily, "d", "r")
    holt = timeseries.holt_linear(daily, "d", "r", alpha=0.3, beta=0.1)
    kal  = timeseries.kalman_local_level(daily, "d", "r", q=1e5, r=1e7)

Reference analog: none — the reference charts raw GROUP BY counts
(webapp JS plumbing); seasonality/changepoint/forecast diagnostics are
beyond-reference monitoring surface (SURVEY §6).

Design rules (the registry queries' DuckDB oracles pin the semantics):

* The caller collapses the fact table to the series FIRST (one
  map-side-partial aggregate); everything here is calendar-bounded —
  single-partition windows and collect-folds are justified by the spine
  being bounded by days, not rows (the t16 argument).
* Recurrences (Holt, Kalman) run as ONE ``F.aggregate`` fold over the
  sorted series — a whole-stage-codegen higher-order function, not a
  Python UDF; an oracle replays the same recurrence as a recursive CTE
  in the same order, so the float stream is order-identical.
* Pearson/corr statistics are computed from raw moments with explicit
  zero-variance guards: Spark's ANSI ``corr`` THROWS on a constant
  series where DuckDB returns NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.presentation import rfix

__all__ = [
    "acf",
    "cusum_trace",
    "holt_linear",
    "kalman_local_level",
]


def acf(
    series: DataFrame,
    t_col: str,
    value_col: str,
    max_lag: int = 7,
    digits: int = 4,
) -> DataFrame:
    """Lag-1..``max_lag`` autocorrelation of a series (Pearson corr of
    the values against their own lags, over OBSERVED points — gaps
    collapse, the trading-day convention). Returns
    (lag BIGINT, acf DOUBLE[digits], n_pairs BIGINT), one row per lag;
    a lag with < 2 pairs or zero variance yields NULL acf (guarded —
    ANSI ``corr`` would throw on a constant stretch).

    Scale shape: the lag window and the ``max_lag`` moment aggregates
    run over the caller-collapsed, calendar-bounded series (single
    partition by construction); a ``stack()`` unpivots the ONE
    aggregate row — a per-lag union would re-plan the whole pipeline
    once per lag (measured: 14 scans / 21 exchanges before that
    rewrite, 2 / 3 after).
    """
    w = Window.orderBy(t_col)
    lagged = series.select(
        F.col(value_col).alias("x"),
        *[F.lag(value_col, k).over(w).alias(f"x{k}")
          for k in range(1, max_lag + 1)],
    )

    def _corr_terms(k: int):
        y = F.col(f"x{k}")
        xm = F.when(y.isNotNull(), F.col("x"))
        n = F.count(y).cast("double")
        sx, sy = F.sum(xm), F.sum(y)
        sxy = F.sum(xm * y)
        sxx, syy = F.sum(xm * xm), F.sum(y * y)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        c = F.when(
            (n >= 2) & (vx > 0) & (vy > 0),
            (n * sxy - sx * sy) / F.sqrt(vx * vy),
        )
        return c.alias(f"c{k}"), F.count(y).alias(f"n{k}")

    cols = lagged.agg(
        *[a for k in range(1, max_lag + 1) for a in _corr_terms(k)]
    )
    stacked = ", ".join(f"{k}L, c{k}, n{k}" for k in range(1, max_lag + 1))
    return cols.select(
        F.expr(f"stack({max_lag}, {stacked}) AS (lag, acf_raw, n_pairs)")
    ).select(
        F.col("lag").cast("long").alias("lag"),
        rfix(F.col("acf_raw"), digits).alias("acf"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
    )


def cusum_trace(
    series: DataFrame,
    t_col: str,
    value_col: str,
    digits: int = 2,
) -> DataFrame:
    """Offline CUSUM changepoint trace (Page 1954's chart, offline
    form): S_t = Σ_{i≤t} (x_i − mean(x)), with the |S| extremum flagged
    as the estimated changepoint (where the level most plausibly
    shifted). Returns (t_col, value_col[digits], cusum, is_changepoint).

    The running sum is ROWS-framed in series order on both engines, so
    the float addition ORDER is identical and the canonicalization is
    stable; the mean rides in as a broadcast 1-row aggregate. The
    cumulative window and the global max(|S|) are series-bounded.
    """
    mu = F.broadcast(series.agg(F.avg(value_col).alias("_m")))
    w = Window.orderBy(t_col).rowsBetween(Window.unboundedPreceding, 0)
    trace = series.crossJoin(mu).select(
        t_col, value_col,
        F.sum(F.col(value_col) - F.col("_m")).over(w).alias("_s"),
    )
    peak = F.broadcast(trace.agg(F.max(F.abs("_s")).alias("_peak")))
    return trace.crossJoin(peak).select(
        t_col,
        rfix(F.col(value_col), digits).alias(value_col),
        rfix(F.col("_s"), digits).alias("cusum"),
        (F.abs("_s") == F.col("_peak")).alias("is_changepoint"),
    )


def holt_linear(
    series: DataFrame,
    t_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    digits: int = 2,
) -> DataFrame:
    """Holt linear-trend smoothing: lₜ = αyₜ + (1−α)(lₜ₋₁+bₜ₋₁),
    bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, initialized l₁=y₁, b₁=y₂−y₁ (0 for a
    1-point series). Returns the full (t_col, value_col, level, trend)
    trace, rounded at ``digits``.

    The recurrence runs as a single ``F.aggregate`` fold over the
    sorted series (whole-stage codegen, no UDF); the only
    "single-partition" object is the series array, bounded by the
    caller's spine. α dials level responsiveness, β trend
    responsiveness — both embedded as plan literals.
    """
    a, b = float(alpha), float(beta)
    ser = series.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(t_col).alias("d"),
                                    F.col(value_col).alias("r")))
        ).alias("s")
    )
    trace = ser.select(
        F.expr(
            f"""
            CASE WHEN size(s) = 0 THEN array()
            ELSE aggregate(
              slice(s, 2, greatest(size(s) - 1, 0)),
              array(named_struct(
                  'd', s[0].d, 'y', CAST(s[0].r AS DOUBLE),
                  'l', CAST(s[0].r AS DOUBLE),
                  'b', CASE WHEN size(s) >= 2
                            THEN CAST(s[1].r - s[0].r AS DOUBLE)
                            ELSE 0.0D END)),
              (acc, x) -> concat(acc, array(named_struct(
                  'd', x.d, 'y', CAST(x.r AS DOUBLE),
                  'l', {a}D * x.r + {1 - a}D
                       * (element_at(acc, -1).l + element_at(acc, -1).b),
                  'b', {b}D * (({a}D * x.r + {1 - a}D
                                * (element_at(acc, -1).l
                                   + element_at(acc, -1).b))
                               - element_at(acc, -1).l)
                       + {1 - b}D * element_at(acc, -1).b)))
            ) END AS trace
            """
        )
    ).select(F.explode("trace").alias("t"))
    return trace.select(
        F.col("t.d").alias(t_col),
        rfix(F.col("t.y"), digits).alias(value_col),
        rfix(F.col("t.l"), digits).alias("level"),
        rfix(F.col("t.b"), digits).alias("trend"),
    )


def kalman_local_level(
    series: DataFrame,
    t_col: str,
    value_col: str,
    q: float = 1e5,
    r: float = 1e7,
    digits_level: int = 2,
    digits_gain: int = 6,
) -> DataFrame:
    """Scalar Kalman filter, local-level model: predict P⁻=P+Q, gain
    K=P⁻/(P⁻+R), update x+=K(y−x), P=(1−K)P⁻ — initialized x₁=y₁,
    P₁=R. Unlike EWMA/Holt the smoothing weight ADAPTS (K shrinks as
    the estimate converges), so the gain trace is part of the output:
    (t_col, value_col, level_estimate, error_variance, kalman_gain).

    ``q`` is the process variance per step, ``r`` the observation
    variance — their ratio sets the steady-state responsiveness. The
    caller should canonicalize the series values FIRST (both engines
    must fold identical doubles); same single-``F.aggregate``-fold
    execution as :func:`holt_linear`.
    """
    qf, rf = float(q), float(r)
    ser = series.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(t_col).alias("d"),
                                    F.col(value_col).alias("r")))
        ).alias("s")
    )
    trace = ser.select(
        F.expr(
            f"""
            CASE WHEN size(s) = 0 THEN array()
            ELSE aggregate(
              slice(s, 2, greatest(size(s) - 1, 0)),
              array(named_struct(
                  'd', s[0].d, 'y', CAST(s[0].r AS DOUBLE),
                  'x', CAST(s[0].r AS DOUBLE), 'p', {rf}D, 'k', 1.0D)),
              (acc, e) -> concat(acc, array(named_struct(
                  'd', e.d, 'y', CAST(e.r AS DOUBLE),
                  'x', element_at(acc, -1).x
                       + ((element_at(acc, -1).p + {qf}D)
                          / (element_at(acc, -1).p + {qf}D + {rf}D))
                         * (e.r - element_at(acc, -1).x),
                  'p', (1.0D - (element_at(acc, -1).p + {qf}D)
                               / (element_at(acc, -1).p + {qf}D + {rf}D))
                       * (element_at(acc, -1).p + {qf}D),
                  'k', (element_at(acc, -1).p + {qf}D)
                       / (element_at(acc, -1).p + {qf}D + {rf}D))))
            ) END AS trace
            """
        )
    ).select(F.explode("trace").alias("t"))
    return trace.select(
        F.col("t.d").alias(t_col),
        F.col("t.y").alias(value_col),
        rfix(F.col("t.x"), digits_level).alias("level_estimate"),
        rfix(F.col("t.p"), digits_level).alias("error_variance"),
        rfix(F.col("t.k"), digits_gain).alias("kalman_gain"),
    )
