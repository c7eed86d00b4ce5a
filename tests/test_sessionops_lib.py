"""Unit tests for the LIBRARY form of the event-time / behavioral
operators (operators/sessionops.py — extraction phase 8, round 12).

Hand-built NON-registry frames with non-default column names and
parameters, pure-Python reference twins (the test_stats_lib.py
pattern). The registry queries (t8_sessionization, a_funnel_*,
a_cohort_retention*, a_latest_event_per_user, scd2_state_intervals,
t13_event_transition_matrix) stay covered by tests/test_parity.py's
oracle gate.
"""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import sessionops


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def rfix(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def _clicks(spark):
    rows = [
        # device A: 3 events inside 90s gaps, then a 5-minute break
        ("devA", 1, _ts("2024-01-01 10:00:00")),
        ("devA", 2, _ts("2024-01-01 10:01:00")),
        ("devA", 3, _ts("2024-01-01 10:02:30")),
        ("devA", 4, _ts("2024-01-01 10:07:31")),
        # device B: two events with EQUAL timestamps (tie-break on id)
        ("devB", 5, _ts("2024-01-01 09:00:00")),
        ("devB", 6, _ts("2024-01-01 09:00:00")),
    ]
    return spark.createDataFrame(rows, ["device", "click_id", "at"])


def test_sessionize_gap_and_tiebreak(spark):
    out = sessionops.sessionize(
        _clicks(spark), "device", "at", gap_seconds=300,
        order_cols=("at", "click_id"), out_col="visit",
    ).collect()
    got = {r["click_id"]: r["visit"] for r in out}
    # 10:07:31 is 301s after 10:02:30 -> new session; equal-ts rows share one
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1}


def test_sessionize_gap_boundary_is_exclusive(spark):
    # exactly gap_seconds apart stays in the SAME session (> not >=)
    rows = [("k", 1, _ts("2024-01-01 00:00:00")),
            ("k", 2, _ts("2024-01-01 00:05:00"))]
    df = spark.createDataFrame(rows, ["k", "i", "t"])
    out = sessionops.sessionize(df, "k", "t", 300, order_cols=("t", "i"))
    assert [r["sess_no"] for r in out.orderBy("i").collect()] == [1, 1]


# ---------------------------------------------------------------------------
# funnel_counts
# ---------------------------------------------------------------------------


def _journey(spark):
    rows = [
        # u1 completes signup -> view -> purchase -> re-view
        (1, "signup", _ts("2024-01-01 00:00:00")),
        (1, "view", _ts("2024-01-02 00:00:00")),
        (1, "purchase", _ts("2024-01-03 00:00:00")),
        (1, "view", _ts("2024-01-04 00:00:00")),
        # u2 views BEFORE signing up and never after -> stops at stage 1
        (2, "view", _ts("2024-01-01 00:00:00")),
        (2, "signup", _ts("2024-01-02 00:00:00")),
        # u3 signup -> view (same instant: inclusive chain) -> no purchase
        (3, "signup", _ts("2024-01-05 00:00:00")),
        (3, "view", _ts("2024-01-05 00:00:00")),
        # u4 never signs up
        (4, "view", _ts("2024-01-01 00:00:00")),
        (4, "purchase", _ts("2024-01-02 00:00:00")),
    ]
    return spark.createDataFrame(rows, ["uid", "etype", "at"])


def test_funnel_four_stages_with_repeated_type(spark):
    out = sessionops.funnel_counts(
        _journey(spark), "uid", "at", "etype",
        stages=("signup", "view", "purchase", "view"),
    ).collect()
    got = {r["stage"]: r["n_users"] for r in out}
    # stage1: u1,u2,u3; stage2 (view >= first signup): u1,u3;
    # stage3: u1; stage4 (view >= first qualifying purchase): u1
    assert got == {"1_signup": 3, "2_view": 2, "3_purchase": 1, "4_view": 1}


def test_funnel_custom_labels_and_order(spark):
    out = sessionops.funnel_counts(
        _journey(spark), "uid", "at", "etype",
        stages=("view", "purchase"), labels=("saw", "bought"),
        out_cols=("step", "n"),
    ).collect()
    # funnel order is preserved in the unioned output
    assert [(r["step"], r["n"]) for r in out] == [("saw", 4), ("bought", 2)]


def test_funnel_rejects_bad_stage_specs(spark):
    df = _journey(spark)
    for kwargs in ({"stages": ()},
                   {"stages": ("a", "b"), "labels": ("only-one",)}):
        try:
            sessionops.funnel_counts(df, "uid", "at", "etype", **kwargs)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------


def test_cohort_retention_week_epoch_offsets(spark):
    rows = [
        # u1 registers Mon Jan 1 (truncs to week 2024-01-01), active wk0+wk2
        (1, "register", _ts("2024-01-01 12:00:00")),
        (1, "ping", _ts("2024-01-16 00:00:00")),
        # u2 registers Thu Jan 4 (same cohort week), active wk0 only;
        # pre-cohort activity is EXCLUDED by ts >= cohort_start
        (2, "ping", _ts("2023-12-20 00:00:00")),
        (2, "register", _ts("2024-01-04 00:00:00")),
        # u3 never registers -> no cohort
        (3, "ping", _ts("2024-01-02 00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["uid", "etype", "at"])
    out = sessionops.cohort_retention(
        df, "uid", "at", granularity="week", cohort_types=("register",),
        type_col="etype", label_fmt="yyyy-MM-dd",
        out_cols=("cw", "wk", "n"),
    ).collect()
    got = {(r["cw"], r["wk"]): r["n"] for r in out}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 2): 1}


def test_cohort_retention_month_integer_arithmetic_across_year(spark):
    # Dec-2023 cohort active in Jan-2024: offset must be exactly 1
    # (y*12+m delta), where float months_between could drift
    rows = [
        (1, "x", _ts("2023-12-15 00:00:00")),
        (1, "x", _ts("2024-01-02 00:00:00")),
        (2, "x", _ts("2023-12-01 00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["uid", "etype", "at"])
    out = sessionops.cohort_retention(
        df, "uid", "at", granularity="month", label_fmt="yyyy-MM",
        out_cols=("cm", "age", "n"),
    ).collect()
    got = {(r["cm"], r["age"]): r["n"] for r in out}
    assert got == {("2023-12", 0): 2, ("2023-12", 1): 1}


# ---------------------------------------------------------------------------
# latest_state
# ---------------------------------------------------------------------------


def test_latest_state_struct_max_with_tiebreak(spark):
    rows = [
        ("s1", _ts("2024-01-01 00:00:00"), 1, "cold"),
        ("s1", _ts("2024-01-02 00:00:00"), 2, "warm"),
        # equal timestamps on s2: higher seq wins
        ("s2", _ts("2024-01-01 00:00:00"), 7, "a"),
        ("s2", _ts("2024-01-01 00:00:00"), 9, "b"),
    ]
    df = spark.createDataFrame(rows, ["sensor", "at", "seq", "reading"])
    out = sessionops.latest_state(
        df, keys=("sensor",), order_cols=("at", "seq"),
        payload_cols=("reading",), struct_col="last",
    ).select("sensor", "last.seq", "last.reading").collect()
    got = {r["sensor"]: (r["seq"], r["reading"]) for r in out}
    assert got == {"s1": (2, "warm"), "s2": (9, "b")}


# ---------------------------------------------------------------------------
# scd2_intervals
# ---------------------------------------------------------------------------


def test_scd2_runs_versions_and_open_interval(spark):
    rows = [
        ("m1", _ts("2024-01-01 00:00:00"), 1, "up"),
        ("m1", _ts("2024-01-02 00:00:00"), 2, "up"),
        ("m1", _ts("2024-01-03 00:00:00"), 3, "down"),
        ("m1", _ts("2024-01-04 00:00:00"), 4, "up"),
        ("m2", _ts("2024-01-01 00:00:00"), 5, "down"),
    ]
    df = spark.createDataFrame(rows, ["mach", "at", "seq", "status"])
    out = sessionops.scd2_intervals(
        df, "mach", "at", "status", order_cols=("at", "seq")
    ).orderBy("mach", "version").collect()
    m1 = [(r["version"], r["state"], r["n_events"], r["is_current"],
           r["valid_to"]) for r in out if r["mach"] == "m1"]
    # up(2 events) -> down -> up, middle intervals closed by the next start
    assert m1 == [
        (1, "up", 2, False, _ts("2024-01-03 00:00:00")),
        (2, "down", 1, False, _ts("2024-01-04 00:00:00")),
        (3, "up", 1, True, None),
    ]
    m2 = [r for r in out if r["mach"] == "m2"][0]
    assert (m2["version"], m2["is_current"], m2["valid_from"]) == (
        1, True, _ts("2024-01-01 00:00:00"))


# ---------------------------------------------------------------------------
# transition_matrix
# ---------------------------------------------------------------------------


def test_transition_matrix_row_normalized_python_twin(spark):
    seq = {"u": ["a", "b", "a", "b", "c"], "v": ["a", "a", "c"]}
    rows = [
        (k, i, _ts(f"2024-01-01 00:0{i}:00"), s)
        for k, states in seq.items()
        for i, s in enumerate(states)
    ]
    df = spark.createDataFrame(rows, ["who", "i", "at", "st"])
    out = sessionops.transition_matrix(
        df, "who", "at", "st", order_cols=("at", "i"), digits=3,
        out_cols=("src", "dst", "n", "p"),
    ).collect()
    # python twin
    from collections import Counter
    pairs: Counter = Counter()
    for states in seq.values():
        pairs.update(zip(states, states[1:]))
    row_tot: Counter = Counter()
    for (a, _), n in pairs.items():
        row_tot[a] += n
    got = {(r["src"], r["dst"]): (r["n"], r["p"]) for r in out}
    assert got == {
        (a, b): (n, rfix(n / row_tot[a], 3)) for (a, b), n in pairs.items()
    }
