"""Regression guards for event-time timestamp physical types.

Round-2 postmortem: the testdata ``events.parquet`` stores ``ts`` as
``timestamp[us]`` with no timezone. PySpark 4.1 reads that as
TIMESTAMP_NTZ by default, and epoch functions (``unix_micros``) reject
NTZ input with DATATYPE_MISMATCH — which broke t8/j11/j12, the test
suite, and the whole round-2 bench. These tests write parquet in every
physical encoding the wild can produce (us-no-tz, us-UTC, nanos) and
push each through every event-time query, asserting analysis+execution
succeed. They run against a BARE session with the engine confs unset,
exactly like the external driver's session.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yelpdatawarehouse_spark.queries import all_queries

EVENT_TIME_QUERIES = (
    "t8_sessionization",
    "j11_asof_join_last_view",
    "j12_range_join_bucketed",
    "a_funnel_signup_view_purchase",
    "t7_hourly_tumbling_window",
    "a7_user_event_span",
)

_TS_TYPES = {
    "us_no_tz": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
    "ns_no_tz": pa.timestamp("ns"),
}


def _write_events(dirpath: str, ts_type: pa.DataType) -> None:
    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        for hour, etype in ((0, "signup"), (1, "view"), (2, "purchase"),
                            (10, "view"), (30, "purchase"), (31, "click")):
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + dt.timedelta(hours=hour, minutes=user),
                    "user_id": user,
                    "event_type": etype,
                    "value": float(eid),
                    "props": "{}",
                }
            )
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", ts_type),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    pq.write_table(tbl, os.path.join(dirpath, "events.parquet"))


@pytest.fixture(scope="module")
def bare_spark(spark):
    """The session with engine read-confs reset to PySpark defaults, the
    way the external driver hands us a session (it never ran get_spark)."""
    prev_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", None)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    yield spark
    if prev_ntz is not None:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev_ntz)


@pytest.mark.parametrize("encoding", sorted(_TS_TYPES))
@pytest.mark.parametrize("qname", EVENT_TIME_QUERIES)
def test_event_time_query_survives_ts_encoding(
    bare_spark, tmp_path_factory, encoding, qname
):
    registry = all_queries()
    d = str(tmp_path_factory.mktemp(f"ev_{encoding}"))
    _write_events(d, _TS_TYPES[encoding])
    df = registry[qname].fn(bare_spark, d)
    # Analysis (the r2 failure point) and execution must both succeed.
    assert df.count() >= 0


def test_tune_existing_lands_on_foreign_session(spark):
    """Every correctness-relevant conf must actually apply to a session we
    did not create (the driver supplies its own). A conf that silently
    fails to set is how the t8-class bug reached the gate."""
    from yelpdatawarehouse_spark.session import tune_existing

    critical = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.sql.adaptive.enabled": "true",
    }
    # Perturb, then tune, then assert each value landed.
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        tune_existing(spark)
        for k, want in critical.items():
            assert spark.conf.get(k) == want, k
    finally:
        tune_existing(spark)  # restore engine defaults for later tests
