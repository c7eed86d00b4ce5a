"""Seeded randomized brute-force checks for the event-time operators.

test_parity proves engine == SQL oracle and test_sessions_invariants pins
the defining properties on the fixed testdata; here random event sets —
deliberately dense in EQUAL timestamps, boundary gaps, and boundary-window
purchases — are checked against independent pure-Python models, so a
misconception shared by the Spark plan and its SQL oracle would still be
caught. Parquet is written as timestamp[us]-no-tz (the encoding that broke
round 2) for extra NTZ regression pressure.
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.queries.sessions import (
    RANGE_WINDOW_SECONDS,
    SESSION_GAP_SECONDS,
)

BASE = dt.datetime(2024, 3, 1)

# Offsets engineered for collisions: exact ties, exactly-GAP gaps (NOT a new
# session: the rule is strictly greater), GAP+1s gaps, exactly-24h windows
# (exclusive upper bound), 24h-1s.
_OFFSETS = [
    0,
    1,
    30,
    3600,
    SESSION_GAP_SECONDS,
    SESSION_GAP_SECONDS + 1,
    RANGE_WINDOW_SECONDS - 1,
    RANGE_WINDOW_SECONDS,
    RANGE_WINDOW_SECONDS + 7,
    2 * RANGE_WINDOW_SECONDS,
]


def _gen(seed: int, n_users: int = 6, n_events: int = 240):
    rng = random.Random(seed)
    rows = []
    for eid in range(1, n_events + 1):
        rows.append(
            {
                "event_id": eid,
                "ts": BASE
                + dt.timedelta(
                    seconds=rng.choice(_OFFSETS) + rng.choice(_OFFSETS)
                ),
                "user_id": rng.randrange(n_users),
                "event_type": rng.choice(["view", "purchase", "click", "signup"]),
                "value": round(rng.uniform(1, 100), 2),
                "props": "{}",
            }
        )
    return rows


def _write(rows, dirpath):
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),  # no tz: the round-2 NTZ encoding
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), f"{dirpath}/events.parquet")


def _rfix(x: float, n: int = 2) -> float:
    p = 10**n
    return math.floor(x * p + 0.5) / p


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_t8_sessionization_matches_brute_force(spark, tmp_path_factory, seed):
    rows = _gen(seed)
    d = str(tmp_path_factory.mktemp(f"fz_t8_{seed}"))
    _write(rows, d)
    got = {
        (r.user_id, r.sess_no): (r.n_events, r.duration_secs, r.n_purchases, r.total_value)
        for r in all_queries()["t8_sessionization"].fn(spark, d).collect()
    }

    want = {}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        sess_no, prev = 0, None
        sessions: dict[int, list] = {}
        for r in evs:
            gap_us = None if prev is None else (r["ts"] - prev).total_seconds() * 1e6
            if gap_us is None or gap_us > SESSION_GAP_SECONDS * 1e6:
                sess_no += 1
            sessions.setdefault(sess_no, []).append(r)
            prev = r["ts"]
        for sn, sevs in sessions.items():
            dur = int((sevs[-1]["ts"] - sevs[0]["ts"]).total_seconds())
            want[(u, sn)] = (
                len(sevs),
                dur,
                sum(1 for r in sevs if r["event_type"] == "purchase"),
                _rfix(sum(r["value"] for r in sevs)),
            )
    assert got == want


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_j11_asof_matches_brute_force(spark, tmp_path_factory, seed):
    rows = _gen(seed)
    d = str(tmp_path_factory.mktemp(f"fz_j11_{seed}"))
    _write(rows, d)
    got = {
        r.purchase_id: (r.last_view_ts, r.secs_since_view)
        for r in all_queries()["j11_asof_join_last_view"].fn(spark, d).collect()
    }

    want = {}
    for p in rows:
        if p["event_type"] != "purchase":
            continue
        views = [
            v["ts"]
            for v in rows
            if v["user_id"] == p["user_id"]
            and v["event_type"] == "view"
            and v["ts"] <= p["ts"]  # inclusive boundary: equal ts matches
        ]
        if views:
            lv = max(views)
            want[p["event_id"]] = (
                lv.strftime("%Y-%m-%d %H:%M:%S"),
                int((p["ts"] - lv).total_seconds()),
            )
    assert got == want


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_j12_range_join_matches_brute_force(spark, tmp_path_factory, seed):
    rows = _gen(seed)
    d = str(tmp_path_factory.mktemp(f"fz_j12_{seed}"))
    _write(rows, d)
    got = {
        r.view_id: (r.purchase_cnt, r.purchase_value)
        for r in all_queries()["j12_range_join_bucketed"].fn(spark, d).collect()
    }

    want = {}
    for v in rows:
        if v["event_type"] != "view":
            continue
        # half-open window [v.ts, v.ts + W): the exactly-24h purchase is OUT
        ps = [
            p["value"]
            for p in rows
            if p["user_id"] == v["user_id"]
            and p["event_type"] == "purchase"
            and v["ts"] <= p["ts"] < v["ts"] + dt.timedelta(seconds=RANGE_WINDOW_SECONDS)
        ]
        if ps:
            want[v["event_id"]] = (len(ps), _rfix(sum(ps)))
    assert got == want
