"""Semantic invariants of the event-time operators (queries/sessions.py).

Parity (test_parity) proves engine == oracle; these assert the DEFINING
properties directly, so a bug that slipped into both sides identically
(shared misconception) would still be caught.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.queries.sessions import (
    RANGE_WINDOW_SECONDS,
    SESSION_GAP_SECONDS,
)
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"
REGISTRY = all_queries()


def test_sessions_partition_all_events(spark):
    """Sessions tile the event set exactly: per-user event counts match."""
    ev = table(spark, SF, "events")
    sess = REGISTRY["t8_sessionization"].fn(spark, SF)
    got = {
        r["user_id"]: r["n"]
        for r in sess.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    }
    want = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_sessions_are_separated_by_gap(spark):
    """Consecutive sessions of one user start more than GAP apart — session
    k+1's start minus session k's start must exceed the gap (since k's last
    event is >= its start and the inter-session gap alone is > GAP)."""
    sess = REGISTRY["t8_sessionization"].fn(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r)
    import datetime

    n_pairs = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: r["sess_no"])
        for a, b in zip(rows, rows[1:]):
            a_start = datetime.datetime.fromisoformat(a["session_start"])
            a_end = a_start + datetime.timedelta(seconds=a["duration_secs"])
            b_start = datetime.datetime.fromisoformat(b["session_start"])
            # date_format truncates sub-second parts, allow 1s slack
            assert (b_start - a_end).total_seconds() > SESSION_GAP_SECONDS - 1
            n_pairs += 1
    assert n_pairs > 0


def test_asof_no_view_between_match_and_purchase(spark):
    """The as-of property: for each purchase, NO view of the same user lies
    strictly between the matched view and the purchase instant."""
    ev = table(spark, SF, "events")
    asof = REGISTRY["j11_asof_join_last_view"].fn(spark, SF)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("v_ts")
    )
    violations = (
        asof.join(views, "user_id")
        .filter((F.col("v_ts") > F.col("last_view_ts")) & (F.col("v_ts") <= F.col("purchase_ts")))
        .count()
    )
    assert violations == 0
    assert asof.count() > 0


def test_range_join_counts_match_brute_force(spark):
    """The bucketed range join equals the unbucketed inequality join."""
    ev = table(spark, SF, "events")
    got = {
        (r["view_id"], r["purchase_cnt"])
        for r in REGISTRY["j12_range_join_bucketed"].fn(spark, SF).collect()
    }
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("vu"),
        F.col("ts").alias("v_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
    )
    brute = (
        v.join(
            p,
            (F.col("vu") == F.col("pu"))
            & (F.unix_micros("p_ts") >= F.unix_micros("v_ts"))
            & (F.unix_micros("p_ts") < F.unix_micros("v_ts") + RANGE_WINDOW_SECONDS * 1_000_000),
        )
        .groupBy("view_id")
        .agg(F.count("*").alias("purchase_cnt"))
    )
    want = {(r["view_id"], r["purchase_cnt"]) for r in brute.collect()}
    assert got == want and len(want) > 0
