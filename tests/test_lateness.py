"""streaming/lateness.py: watermark-lateness profiling vs a python replay."""

from __future__ import annotations

from datetime import datetime, timezone

from yelpdatawarehouse_spark.streaming.lateness import (
    event_lateness,
    lateness_profile,
)


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)


# arrival order = event_id; event-times arrive out of order
ROWS = [
    (0, _ts(0), 1),
    (1, _ts(10), 1),
    (2, _ts(5), 2),    # 5s late vs frontier 10
    (3, _ts(30), 2),
    (4, _ts(8), 1),    # 22s late
    (5, _ts(29), 2),   # 1s late
    (6, _ts(30), 1),   # exactly frontier: on time
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "event_id long, ts timestamp, user_id long")


def _py_lateness(rows):
    frontier = None
    out = {}
    for eid, ts, _u in sorted(rows, key=lambda r: r[0]):
        # lateness is NEGATIVE when the event advances the frontier; only
        # the first arrival (no frontier yet) coalesces to 0.0, mirroring
        # the operator
        late = 0.0 if frontier is None else (frontier - ts).total_seconds()
        out[eid] = late
        frontier = ts if frontier is None else max(frontier, ts)
    return out


def test_lateness_matches_python_replay(spark):
    exp = _py_lateness(ROWS)
    got = {r.event_id: r.lateness_s for r in event_lateness(_docs(spark)).collect()}
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9


def test_profile_classification(spark):
    # watermark 10s: late events are 5s, 22s, 1s -> kept 5s & 1s, dropped 22s
    row = lateness_profile(_docs(spark), watermark_s=10.0).collect()[0]
    assert row.n_events == 7
    assert row.n_on_time == 4
    assert row.n_late_kept == 2
    assert row.n_dropped == 1
    assert abs(row.drop_fraction - 1 / 7) < 1e-9
    assert abs(row.max_lateness_s - 22.0) < 1e-9


def test_watermark_sweep_monotone(spark):
    docs = _docs(spark)
    drops = [
        lateness_profile(docs, watermark_s=w).collect()[0].n_dropped
        for w in (0.5, 5.0, 22.0, 30.0)
    ]
    assert drops == sorted(drops, reverse=True)
    assert drops[-1] == 0  # generous watermark drops nothing


def test_partitioned_frontier_is_per_key(spark):
    """Per-partition replay: each user's frontier only sees that user's
    arrivals (Kafka-partition ordering semantics)."""
    got = {
        r.event_id: r.lateness_s
        for r in event_lateness(_docs(spark), partition_col="user_id").collect()
    }
    # user 1 arrivals: ts 0, 10, 8, 30 -> event 4 is 2s late, others on time
    assert abs(got[4] - 2.0) < 1e-9
    assert got[0] <= 0 and got[1] <= 0 and got[6] <= 0
    # user 2 arrivals: ts 5, 30, 29 -> event 5 is 1s late
    assert abs(got[5] - 1.0) < 1e-9 and got[2] <= 0 and got[3] <= 0


def test_determinism_across_partitioning(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, event_lateness(docs).collect()))
    b = sorted(map(tuple, event_lateness(docs.repartition(5)).collect()))
    assert a == b


def test_empty_input(spark):
    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long")
    row = lateness_profile(empty, watermark_s=10.0).collect()[0]
    assert row.n_events == 0 and row.n_dropped == 0
