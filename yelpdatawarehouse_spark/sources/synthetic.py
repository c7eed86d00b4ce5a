"""Python Data Source (Spark 4 extensibility API): deterministic
synthetic-events generator as a first-class ``spark.read.format(...)``.

The reference's producer (`streaming/producer.py`, SURVEY §2.1 S7)
fabricates events in a single Python process and pushes them through
Kafka; in tests the repo has used file fixtures instead. This module
makes the generator a REAL Spark source via the Spark-4 Python Data
Source API (`pyspark.sql.datasource`): the driver plans N input
partitions, each executor generates its slice from a closed-form formula
of the global row index — no storage, no driver bottleneck, no network.

Why this earns a place in a 100 TB engine:

* **Load generation at cluster scale.** `option("n_events", 10**12)`
  plans evenly-sized partitions whose rows are computed, not read — the
  standard way to soak-test a pipeline's shuffle/agg path without
  petabytes of staged input.
* **Determinism = testability.** Row ``i`` is a pure function of ``i``
  (same arithmetic style as the mm_* synthetic payloads), so ANY
  partitioning yields the same multiset of rows — pinned by
  tests/test_synthetic_source.py, which also replays the generator
  through the windowed-aggregation pipeline under two partitionings.
* **The extensibility surface itself.** The same three-class shape
  (DataSource / DataSourceReader / InputPartition) is how a real
  paginated-API or proprietary-format connector plugs into this engine;
  this module is the template (and the test harness proves the plumbing:
  schema projection, partition planning, Arrow row transport).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_BASE = _dt.datetime(2024, 1, 1)
_JANUARY_SECONDS = 31 * 24 * 3600


def synth_event(i: int, n_users: int) -> tuple:
    """Row ``i`` of the synthetic stream — pure closed form, shared by the
    executor-side reader and the test oracle."""
    user = (i * 2654435761) % n_users
    ts = _BASE + _dt.timedelta(seconds=(i * 7919) % _JANUARY_SECONDS)
    etype = EVENT_TYPES[(i * 31) % len(EVENT_TYPES)]
    value = ((i * 37) % 10000) / 100.0
    return (i, ts, user, etype, value, '{"k": %d}' % ((i * 13) % 100))


class _EventsPartition(InputPartition):
    def __init__(self, start: int, end: int, n_users: int):
        self.start, self.end, self.n_users = start, end, n_users


class _EventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_events = int(options.get("n_events", 1000))
        self.n_users = int(options.get("n_users", 100))
        self.n_partitions = int(options.get("partitions", 8))

    def partitions(self):
        per = -(-self.n_events // self.n_partitions)  # ceil
        return [
            _EventsPartition(lo, min(lo + per, self.n_events), self.n_users)
            for lo in range(0, self.n_events, per)
        ]

    def read(self, partition: _EventsPartition):
        for i in range(partition.start, partition.end):
            yield synth_event(i, partition.n_users)


class _EventsStreamReader:
    """Streaming twin (SimpleDataSourceStreamReader): offsets are plain
    row indices into the same closed-form sequence, so the stream is
    exactly replayable — ``readBetweenOffsets`` regenerates any
    checkpointed range bit-for-bit, giving the source Kafka's
    replay-on-recovery semantics with zero infrastructure. Each
    micro-batch emits ``rows_per_batch`` rows until ``max_rows``."""

    def __init__(self, options):
        self.n_users = int(options.get("n_users", 100))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        # concrete list, not a generator: the runtime pickles the
        # prefetched rows into its offset cache for exact replay
        return (
            [synth_event(i, self.n_users) for i in range(lo, hi)],
            {"i": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            synth_event(i, self.n_users) for i in range(start["i"], end["i"])
        ]

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("ydw_synthetic_events")`` (batch) or
    ``spark.readStream.format("ydw_synthetic_events")`` (micro-batched
    stream) after ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "ydw_synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )

    def reader(self, schema) -> DataSourceReader:
        return _EventsReader(self.options)

    def simpleStreamReader(self, schema) -> _EventsStreamReader:
        return _EventsStreamReader(self.options)
