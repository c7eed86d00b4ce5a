"""Reusable event-time / behavioral-analytics operators over ARBITRARY
event streams.

Phase 8 of the library-extraction program (dedup/ann r10,
textops/sampling/curation r11, graphalgs/embeddings/retrieval/stats/
timeseries r12): the session-construction family behind the
``t8/a_funnel/a_cohort/a_latest/scd2/t13`` registry queries as
parameterized functions over any (key, time, state/value) frame::

    from yelpdatawarehouse_spark.operators import sessionops
    s  = sessionops.sessionize(ev, "user_id", "ts", gap_seconds=1800,
                               order_cols=("ts", "event_id"))
    f  = sessionops.funnel_counts(ev, "user_id", "ts", "event_type",
                                  stages=("signup", "view", "purchase"))
    c  = sessionops.cohort_retention(ev, "user_id", "ts",
                                     cohort_types=("signup",))
    ls = sessionops.latest_state(ev, keys=("device",), ...)
    v  = sessionops.scd2_intervals(ev, "user_id", "ts", "event_type")
    tm = sessionops.transition_matrix(ev, "user_id", "ts", "event_type")

Reference analog: none — the reference applies each streaming event
independently and has no event-time operators at all (SURVEY.md §2.9:
no windows, no watermarks, ``streaming/consumer.py:128-179``); session
construction, funnels, cohorts and SCD2 history are the behavioral-
corpus workloads a training-data pipeline runs constantly.

Design rules (the registry queries' DuckDB oracles pin the semantics):

* **One hash exchange on the entity key per operator.** Session
  assignment is a lag flag + running sum over the SAME window spec, so
  both passes and any downstream (key, sess_no) rollup ride one
  exchange. SCD2 reuses the identical construction with a state-change
  flag. Nothing here sorts globally or joins on an inequality.
* **Ties must be broken totally.** Every ordering takes explicit
  ``order_cols`` (e.g. ``("ts", "event_id")``) — equal timestamps are
  real at scale and an under-specified sort is nondeterministic across
  cluster layouts (the correctness contract's id-tiebreak rule).
* **Time arithmetic on epoch microseconds** (``unix_micros`` ≡ DuckDB
  ``epoch_us``) under the UTC-pinned session, so oracles bucket
  identically; calendar-month offsets use INTEGER year*12+month
  deltas, never float ``months_between``.
* **Compaction is an aggregate, not a window.** ``latest_state`` is a
  struct-MAX hash aggregate with map-side partial combining — the
  shuffle carries one struct per partial key, not the event history.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.presentation import rfix
from ..functions.timeops import epoch_us as _us

__all__ = [
    "sessionize",
    "funnel_counts",
    "cohort_retention",
    "latest_state",
    "scd2_intervals",
    "transition_matrix",
]


def _cols(cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: Sequence[str] = (),
    out_col: str = "sess_no",
) -> DataFrame:
    """Gap-based session assignment: rows of one ``key_col`` entity
    whose ``ts_col`` gap exceeds ``gap_seconds`` start a new session.
    Returns the input plus ``out_col`` (1-based running session number
    per key; BIGINT after the caller's cast).

    ``order_cols`` is the FULL sort (default ``(ts_col,)``) — pass an
    id tie-break when timestamps can collide. Plan shape: one hash
    exchange on ``key_col`` feeds BOTH window passes (the lag flag and
    the running sum share the window spec) and any downstream
    ``(key, sess_no)`` rollup is a prefix of the same key, so the whole
    operator is a single shuffle regardless of scale. The streaming
    twin is ``F.session_window`` (streaming/pipeline.py).
    """
    order = list(order_cols) if order_cols else [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = _us(ts_col) - F.lag(_us(ts_col)).over(w)
    flagged = df.withColumn(
        "__new_sess",
        F.when(gap.isNull() | (gap > int(gap_seconds) * 1_000_000), 1).otherwise(0),
    )
    return flagged.withColumn(
        out_col,
        F.sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new_sess")


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    labels: Sequence[str] | None = None,
    out_cols: tuple[str, str] = ("stage", "n_users"),
) -> DataFrame:
    """Ordered conversion funnel over an arbitrary stage list: stage
    *i* counts entities whose first stage-*i* event occurs at or after
    their first qualifying stage-*i−1* event (inclusive chaining by
    first-touch timestamps). Returns one row per stage,
    ``(label, count)``. A stage type may repeat (e.g. a post-purchase
    re-view: ``("signup", "view", "purchase", "view")``).

    ``labels`` defaults to ``"{i}_{stage}"``; pass explicit labels for
    presentation. Plan shape: each stage is a groupBy(key) min plus a
    join back on the SAME key, so all stages ride one key hash
    partitioning and per-stage state is one timestamp per entity; the
    event table is scanned once per stage but filtered to one type AT
    the scan (pushed predicate) — at 100 TB this is |stages| pruned
    scans + co-partitioned joins, no window over the full stream.
    """
    if not stages:
        raise ValueError("funnel_counts: stages must be non-empty")
    if labels is None:
        labels = [f"{i + 1}_{s}" for i, s in enumerate(stages)]
    if len(labels) != len(stages):
        raise ValueError("funnel_counts: len(labels) != len(stages)")
    stage_label, n_label = out_cols

    frames: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, etype in enumerate(stages):
        src = df.filter(F.col(type_col) == etype)
        if prev is not None:
            src = src.join(prev, key_col).filter(
                F.col(ts_col) >= F.col(f"__ts{i - 1}")
            )
        prev = src.groupBy(key_col).agg(F.min(ts_col).alias(f"__ts{i}"))
        frames.append(prev)

    counts = [
        fr.agg(F.count("*").alias(n_label)).select(
            F.lit(lbl).alias(stage_label), n_label
        )
        for fr, lbl in zip(frames, labels)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    granularity: str = "week",
    cohort_types: Sequence[str] | None = None,
    type_col: str = "event_type",
    label_fmt: str = "yyyy-MM-dd HH:mm:ss",
    out_cols: tuple[str, str, str] = ("cohort_week", "week_offset", "active_users"),
) -> DataFrame:
    """Cohort retention: entities grouped by the ``granularity`` bucket
    of their first qualifying event (``cohort_types`` filters which
    types open a cohort; None = any event), counted distinct in every
    subsequent activity bucket. Returns
    ``(cohort_label, bucket_offset, active_count)``.

    Offset arithmetic follows the bucket: fixed-width buckets (week)
    divide the epoch-microsecond delta of ``date_trunc`` boundaries;
    calendar months use INTEGER ``year*12+month`` deltas (float
    ``months_between`` is not cross-engine stable). Month mode dedups
    activity on (key, month) BELOW the cohort join — the join then
    carries one row per active month. Week mode joins first (the
    cohort filter needs ``ts >= cohort_start``) and dedups the
    (key, cohort, offset) triple after.

    Plan shape: first-seen is one groupBy(key); the activity join rides
    the same key (co-partitioned); DISTINCT collapses before the final
    count so the last shuffle carries at most |entities|·|buckets| rows.
    """
    stage_src = df
    if cohort_types is not None:
        stage_src = df.filter(F.col(type_col).isin(*cohort_types))

    cohort_lbl, offset_lbl, count_lbl = out_cols

    if granularity == "month":
        ym = (F.year(F.col("__m")) * 12 + F.month(F.col("__m"))).cast("long")
        ymf = (F.year(F.col("__fts")) * 12 + F.month(F.col("__fts"))).cast("long")
        fm = stage_src.groupBy(key_col).agg(F.min(ts_col).alias("__fts"))
        am = df.select(
            key_col, F.date_trunc("month", F.col(ts_col)).alias("__m")
        ).distinct()
        return (
            am.join(fm, key_col)
            .select(
                F.date_format(
                    F.date_trunc("month", F.col("__fts")), label_fmt
                ).alias(cohort_lbl),
                (ym - ymf).alias(offset_lbl),
            )
            .groupBy(cohort_lbl, offset_lbl)
            .agg(F.count("*").cast("long").alias(count_lbl))
        )

    if granularity != "week":
        raise ValueError(f"cohort_retention: unsupported granularity {granularity!r}")

    bucket_us = 7 * 86400 * 1_000_000
    cohorts = stage_src.groupBy(key_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("__cohort")
    )
    activity = (
        df.join(cohorts, key_col)
        .filter(F.col(ts_col) >= F.col("__cohort"))
        .select(
            key_col,
            "__cohort",
            F.floor(
                (_us(F.date_trunc("week", F.col(ts_col))) - _us("__cohort"))
                / bucket_us
            )
            .cast("long")
            .alias(offset_lbl),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("__cohort", label_fmt).alias(cohort_lbl), offset_lbl
    ).agg(F.count("*").alias(count_lbl))


def latest_state(
    df: DataFrame,
    keys: Sequence[Column | str],
    order_cols: Sequence[Column | str],
    payload_cols: Sequence[Column | str] = (),
    struct_col: str = "s",
) -> DataFrame:
    """Latest-state-per-key compaction (CDC latest-wins snapshot): the
    max of ``struct(order_cols…, payload_cols…)`` per key — struct MAX
    compares lexicographically, so ONE hash aggregate with map-side
    partial combining replaces the window+filter plan (which would
    sort every partition). Returns the grouped keys plus the winning
    struct in ``struct_col``; the caller projects fields out.

    ``order_cols`` must totally order rows within a key (id tie-break
    after the timestamp); ``payload_cols`` ride along un-compared
    unless the order prefix ties. This is the primitive behind
    snapshotting a change stream into current state at 100 TB: the
    shuffle carries one struct per (partial) key, not the history.
    """
    order = _cols(order_cols)
    payload = _cols(payload_cols)
    return df.groupBy(*_cols(keys)).agg(
        F.max(F.struct(*order, *payload)).alias(struct_col)
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each key's
    ``state_col`` stream into consecutive-state runs with
    ``[valid_from, valid_to)`` validity. Returns
    ``(key_col, version, state, valid_from, valid_to, n_events,
    is_current)`` — ``valid_to`` NULL (and ``is_current`` true) on the
    open interval; ``version`` is the 1-based run number.

    The run id is the SAME lag-flag + running-sum construction as
    :func:`sessionize`, keyed on state CHANGE instead of time gap —
    one hash exchange on ``key_col`` serves both windows, the
    run-collapse aggregate (``(key, run)`` is a prefix of the key
    partitioning) and the validity-interval lead. ``order_cols``
    (default ``(ts_col,)``) must totally order rows within a key so
    versions are deterministic on any cluster layout.
    """
    order = list(order_cols) if order_cols else [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = (
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col))
    ).cast("int")
    numbered = df.withColumn(
        "__run_id",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = numbered.groupBy(key_col, "__run_id").agg(
        F.min(state_col).alias("state"),
        F.min(ts_col).alias("__vf"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("__run_id")
    nxt = F.lead("__vf").over(w2)
    return runs.select(
        F.col(key_col),
        F.col("__run_id").alias("version"),
        "state",
        F.col("__vf").alias("valid_from"),
        nxt.alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_cols: Sequence[str] = (),
    digits: int = 4,
    out_cols: tuple[str, str, str, str] = (
        "from_type", "to_type", "n_transitions", "p_transition"
    ),
) -> DataFrame:
    """First-order Markov transition matrix over per-key state
    sequences: for each ordered pair of consecutive states within a
    key's timeline, the transition count and the row-normalized
    probability (``digits``-canonicalized exact-integer division) —
    the model behind next-action prediction and funnel leak detection.

    Scale shape: one key-hash exchange feeds the ordered ``lead()``;
    the pair rollup is a |states|²-sized aggregate (map-side partial),
    and row-normalization is a window over the tiny matrix itself —
    nothing downstream of the first shuffle scales with the event log.
    """
    order = list(order_cols) if order_cols else [ts_col]
    from_lbl, to_lbl, n_lbl, p_lbl = out_cols
    w = Window.partitionBy(key_col).orderBy(*order)
    cnt = (
        df.select(
            F.col(state_col).alias(from_lbl),
            F.lead(state_col).over(w).alias(to_lbl),
        )
        .filter(F.col(to_lbl).isNotNull())
        .groupBy(from_lbl, to_lbl)
        .agg(F.count("*").alias("__n"))
    )
    wt = Window.partitionBy(from_lbl)
    return cnt.select(
        from_lbl,
        to_lbl,
        F.col("__n").cast("long").alias(n_lbl),
        rfix(
            F.col("__n").cast("double") / F.sum("__n").over(wt).cast("double"),
            digits,
        ).alias(p_lbl),
    )
