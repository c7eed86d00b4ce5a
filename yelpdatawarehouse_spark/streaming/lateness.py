"""Watermark-lateness profiling: measure how late events actually arrive.

Every watermarked streaming job trades completeness for state: events later
than the watermark are dropped (Structured Streaming reports them only as
`numRowsDroppedByWatermark`). Choosing the watermark therefore needs the
ARRIVAL-lateness distribution of the real stream — which is a batch
computation over the event log: replaying events in arrival order, an
event's lateness is how far the event-time frontier (the running max of
event time over everything that arrived before it) had already advanced
past its own timestamp when it arrived. Exactly the statistic this module
computes, per event class:

* ``on_time``  — at or ahead of the frontier (lateness ≤ 0);
* ``late_kept``— behind the frontier but within the candidate watermark
                 (a stateful operator WOULD still process it);
* ``dropped``  — beyond the watermark (state already evicted; lost).

The harness events table has no separate arrival column; ``event_id`` is
the ingestion sequence (monotone per producer), the standard proxy when
replaying a log. Scale shape: with ``partition_col`` set (a Kafka
partition / producer key — order is only guaranteed per partition in any
real stream), the frontier window partitions by it: one keyed exchange +
per-key running max, the same shape as w3/w7, then a map-side-combinable
rollup. ``partition_col=None`` replays one globally-ordered log — a
single-partition window, correct but sequential, meant for bounded
diagnostic replays only (the same regime note as deep-OFFSET pagination).

Reference analog: none (the reference consumer applies events immediately
and has no late-data story, consumer.py:31-32 — SURVEY §2.9/§8); this is
the operational companion the watermarked operators in pipeline.py need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_lateness(
    events: DataFrame,
    order_col: str = "event_id",
    ts_col: str = "ts",
    partition_col: str | None = None,
) -> DataFrame:
    """Per-event arrival lateness in seconds: frontier(previous arrivals) −
    event_time. Negative or zero means the event advanced (or matched) the
    frontier; positive means it arrived out of order by that much. With
    ``partition_col`` the frontier is tracked per partition (the only
    ordering a real stream guarantees — scalable keyed window); without it
    the whole log is one ordered replay (diagnostic mode, see module doc).
    """
    base = Window.partitionBy(partition_col) if partition_col else Window
    w = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    frontier = F.max(F.col(ts_col)).over(w)
    late = (
        F.unix_micros(frontier) - F.unix_micros(F.col(ts_col))
    ) / F.lit(1_000_000.0)
    cols = [partition_col] if partition_col else []
    return events.select(
        *cols,
        order_col,
        ts_col,
        F.coalesce(late, F.lit(0.0)).alias("lateness_s"),
    )


def lateness_profile(
    events: DataFrame,
    watermark_s: float,
    order_col: str = "event_id",
    ts_col: str = "ts",
    partition_col: str | None = None,
) -> DataFrame:
    """One-row watermark planning profile for a candidate ``watermark_s``:

    (n_events, n_on_time, n_late_kept, n_dropped, drop_fraction,
     max_lateness_s, p95_lateness_s)

    ``n_dropped`` is exactly the count a watermarked stateful operator
    replaying this log with that watermark would report as
    numRowsDroppedByWatermark; sweep ``watermark_s`` to find the smallest
    state bound meeting a completeness target.
    """
    late = event_lateness(
        events, order_col=order_col, ts_col=ts_col, partition_col=partition_col
    )
    lw = F.col("lateness_s")
    zero = F.lit(0)
    return late.agg(
        F.count("*").cast("long").alias("n_events"),
        F.coalesce(F.sum(F.when(lw <= 0, 1).otherwise(0)), zero)
        .cast("long")
        .alias("n_on_time"),
        F.coalesce(
            F.sum(F.when((lw > 0) & (lw <= watermark_s), 1).otherwise(0)), zero
        )
        .cast("long")
        .alias("n_late_kept"),
        F.coalesce(F.sum(F.when(lw > watermark_s, 1).otherwise(0)), zero)
        .cast("long")
        .alias("n_dropped"),
        (
            F.coalesce(F.sum(F.when(lw > watermark_s, 1).otherwise(0)), zero)
            / F.greatest(F.count("*"), F.lit(1))
        ).alias("drop_fraction"),
        F.max(lw).alias("max_lateness_s"),
        F.percentile_approx(lw, 0.95).alias("p95_lateness_s"),
    )
