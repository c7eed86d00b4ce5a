"""Round-17 drafts — STAGED in round 12, NOT yet registered.

This module is intentionally absent from queries/draft_layer.py: it is
the two-step staging discipline the draft layer was built for (see
draft_layer's module docstring) — drafts are WRITTEN one round and
REGISTERED the next, so a fresh cohort never displaces stale
re-verifications from the external verifier's bounded window in the
round it is staged. Round 12 already carries 6 new registrations
(drafts_r15 ×5 + drafts_r16 ×1); these two are the timeseries-library
knob-proofs the r12 SURVEY explicitly deferred ("knob-proof
registration deferred to r13 to protect the driver window's freshness
rotation").

To register in r13: add ``from .drafts_r17 import DRAFTS as _R17`` to
queries/draft_layer.py and append ``_R17`` to the layer tuple, then run
the full pre-registration battery (sf0.001+sf0.01 parity, bare-session
probe, 5x scale probe, sf0.1 stamp, pin regen) per the round protocol.

* ``t_holt_responsive_orders`` — operators/timeseries.holt_linear at
  α=0.8 / β=0.4 over the daily ORDER-COUNT series (registered
  t21_holt_linear_daily runs 0.3 / 0.1 over daily revenue): high α
  tracks the observation, high β lets the trend whip — the opposite
  smoothing regime, on a different measure.
* ``t_kalman_quiet_gain`` — operators/timeseries.kalman_local_level at
  q=1e3 / r=1e6 (registered t25 runs 1e5 / 1e7): the q/r RATIO matches
  but both variances shrink 100× — the gain trace converges to the same
  steady state through identical ratios while level/variance traces
  differ, pinning that q and r enter the recurrence independently.

Registry contract as everywhere: identical aliases both sides, floats
through rfix/rfix_sql, the day spine canonicalized before the fold where
the series values are non-integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.presentation import rfix, rfix_sql
from ..sources.tables import spread, table

DRAFTS: dict = {}


# ---------------------------------------------------------------------------
# t_holt_responsive_orders — holt_linear at the responsive operating point
# ---------------------------------------------------------------------------

_H2_ALPHA = 0.8
_H2_BETA = 0.4

_HOLT2_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS r
    FROM orders GROUP BY d
),
idx AS (SELECT d, r, row_number() OVER (ORDER BY d) AS rn FROM daily),
rec(rn, d, r, l, b) AS (
    SELECT rn, d, r, r::DOUBLE,
           coalesce((SELECT r FROM idx WHERE rn = 2) - r, 0.0)::DOUBLE
    FROM idx WHERE rn = 1
    UNION ALL
    SELECT i.rn, i.d, i.r,
           {_H2_ALPHA} * i.r + (1 - {_H2_ALPHA}) * (rec.l + rec.b),
           {_H2_BETA} * (({_H2_ALPHA} * i.r
                          + (1 - {_H2_ALPHA}) * (rec.l + rec.b)) - rec.l)
               + (1 - {_H2_BETA}) * rec.b
    FROM rec JOIN idx i ON i.rn = rec.rn + 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       {rfix_sql('r', 2)} AS daily_orders,
       {rfix_sql('l', 2)} AS level,
       {rfix_sql('b', 2)} AS trend
FROM rec
"""


def t_holt_responsive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing at α={_H2_ALPHA}, β={_H2_BETA} over
    DAILY ORDER COUNTS — the phase-7 library (timeseries.holt_linear) at
    non-registry knobs on a non-registry measure (t21 smooths daily
    revenue at 0.3/0.1). High α ≈ the trace hugs the observations; high
    β ≈ the trend term reacts within a couple of days — the
    short-horizon alerting configuration rather than t21's long-horizon
    smoothing. Same scale shape as t21: one map-side-partial day-spine
    collapse, then a single F.aggregate fold (plan-literal knobs).
    """
    from ..operators import timeseries

    o = spread(table(spark, sf_dir, "orders"))
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count("*").alias("r")
    )
    return timeseries.holt_linear(
        daily, "d", "r", alpha=_H2_ALPHA, beta=_H2_BETA, digits=2,
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("r").alias("daily_orders"),
        "level",
        "trend",
    )


DRAFTS["t_holt_responsive_orders"] = (t_holt_responsive_orders, _HOLT2_ORACLE)


# ---------------------------------------------------------------------------
# t_kalman_quiet_gain — kalman_local_level with both variances shrunk 100x
# ---------------------------------------------------------------------------

_K2_Q = 1e3
_K2_R = 1e6

_KALMAN2_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           {rfix_sql('sum(o_totalprice)', 2)} AS r
    FROM orders GROUP BY 1
),
idx AS (SELECT d, r, row_number() OVER (ORDER BY d) AS rn FROM daily),
rec(rn, d, r, x, p, k) AS (
    SELECT rn, d, r, r::DOUBLE, {_K2_R}::DOUBLE, 1.0::DOUBLE
    FROM idx WHERE rn = 1
    UNION ALL
    SELECT i.rn, i.d, i.r,
           rec.x + ((rec.p + {_K2_Q}) / (rec.p + {_K2_Q} + {_K2_R}))
                   * (i.r - rec.x),
           (1 - (rec.p + {_K2_Q}) / (rec.p + {_K2_Q} + {_K2_R}))
               * (rec.p + {_K2_Q}),
           (rec.p + {_K2_Q}) / (rec.p + {_K2_Q} + {_K2_R})
    FROM rec JOIN idx i ON i.rn = rec.rn + 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       r AS daily_revenue,
       {rfix_sql('x', 2)} AS level_estimate,
       {rfix_sql('p', 2)} AS error_variance,
       {rfix_sql('k', 6)} AS kalman_gain
FROM rec
"""


def t_kalman_quiet_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Kalman local-level filter at q={_K2_Q:g}, r={_K2_R:g} —
    the phase-7 library (timeseries.kalman_local_level) with both
    variances 100× below t25's registered 1e5/1e7. The q/r ratio is
    unchanged, so the steady-state gain matches t25's to 6 digits while
    the error-variance trace is 100× smaller — a pair of registered
    points that demonstrates q and r are independent plan literals, not
    a single ratio knob. Same scale shape as t25 (canonicalize-first
    day spine, single F.aggregate fold).
    """
    from ..operators import timeseries

    o = spread(table(spark, sf_dir, "orders"))
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        rfix(F.sum("o_totalprice"), 2).alias("r")
    )
    return timeseries.kalman_local_level(
        daily, "d", "r", q=_K2_Q, r=_K2_R, digits_level=2, digits_gain=6,
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("r").alias("daily_revenue"),
        "level_estimate",
        "error_variance",
        "kalman_gain",
    )


DRAFTS["t_kalman_quiet_gain"] = (t_kalman_quiet_gain, _KALMAN2_ORACLE)
