"""Event-time operators over the ``events`` stream table — sessionization,
as-of join, and bucketed range join.

The reference applies each streaming event independently and has no
event-time operators at all (SURVEY.md §2.9: no windows, no watermarks,
``streaming/consumer.py:128-179``); a large-scale training-data pipeline
needs them constantly (session construction for behavioral corpora,
as-of feature joins, bounded-interval attribution). Every implementation
here is shaped for the 100 TB plan:

* **one shuffle on the entity key** (user_id) per operator — session
  assignment and the as-of lookup are single window passes, never
  per-row subqueries;
* **no inequality-join explosion** — the range join equi-joins on a
  coarse time bucket (bucket width == interval length, so each probe
  touches exactly two buckets) and filters the exact predicate after;
* timestamp arithmetic is done on epoch **microseconds** (events carry
  sub-second precision; Spark ``unix_micros`` ≡ DuckDB ``epoch_us``)
  with the session pinned to UTC (session.py), so the DuckDB oracle
  computes identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.presentation import rfix, rfix_sql
from ..functions.timeops import epoch_us as _us
from ..operators import sessionops
from ..operators.asof import asof_join, bucketed_range_join
from ..sources.tables import table
from .registry import register

# Gap threshold separating two sessions of one user.
SESSION_GAP_SECONDS = 6 * 3600

# Attribution window for the range join (purchases following a view).
RANGE_WINDOW_SECONDS = 24 * 3600

_ISO = "yyyy-MM-dd HH:mm:ss"
_ISO_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "t8_sessionization",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SECONDS}::BIGINT * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sess_no AS BIGINT) AS sess_no,
           strftime(min(ts), '{_ISO_DUCK}') AS session_start,
           CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_secs,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchases,
           {rfix_sql('sum(value)')} AS total_value
    FROM numbered
    GROUP BY user_id, sess_no
    """,
    tags=("T8", "W3", "SESSION"),
)
def t8_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >6 h of user
    inactivity; emit per-session start/duration/size/value stats.

    Reference analog: none — the consumer applies events one at a time
    (streaming/consumer.py:128-179) and never groups them. Thin caller
    over the phase-8 library: ``operators.sessionops.sessionize`` owns
    the lag-flag + running-sum construction (one hash shuffle on user_id
    feeds both window passes AND the (user_id, sess_no) rollup — a
    prefix of the same key, so the whole operator is a single shuffle
    regardless of scale). The streaming twin is F.session_window (see
    streaming/pipeline.py).
    """
    ev = table(spark, sf_dir, "events")
    numbered = sessionops.sessionize(
        ev, "user_id", "ts", SESSION_GAP_SECONDS, order_cols=("ts", "event_id")
    )
    return (
        numbered.groupBy(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("sess_no").cast("long").alias("sess_no"),
        )
        .agg(
            F.date_format(F.min("ts"), _ISO).alias("session_start"),
            F.floor((F.max(_us("ts")) - F.min(_us("ts"))) / 1_000_000)
            .cast("long")
            .alias("duration_secs"),
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            rfix(F.sum("value")).alias("total_value"),
        )
    )


@register(
    "j11_asof_join_last_view",
    oracle=f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           strftime(p.ts, '{_ISO_DUCK}') AS purchase_ts,
           strftime(lv.last_view_ts, '{_ISO_DUCK}') AS last_view_ts,
           CAST((epoch_us(p.ts) - epoch_us(lv.last_view_ts)) // 1000000 AS BIGINT) AS secs_since_view
    FROM p, LATERAL (
        SELECT max(v.ts) AS last_view_ts
        FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
    ) lv
    WHERE lv.last_view_ts IS NOT NULL
    """,
    tags=("J11", "ASOF"),
)
def j11_asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the latest same-user view at or
    before it (time-to-convert attribution).

    Spark has no ASOF JOIN operator; the scalable encoding is the
    union+window trick — one shuffle on user_id, no per-probe lookup, no
    inequality-join explosion — provided by the reusable
    ``operators.asof.asof_join`` (backward direction, inclusive at equal
    timestamps). The oracle states the same semantics as a LATERAL max()
    subquery.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").cast("long")
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    matched = asof_join(
        purchases, views, on="user_id", left_time="ts", right_time="ts",
        direction="backward", asof_col="last_view",
    )
    return (
        matched.filter(F.col("last_view").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.date_format("ts", _ISO).alias("purchase_ts"),
            F.date_format("last_view.ts", _ISO).alias("last_view_ts"),
            F.floor((_us("ts") - _us(F.col("last_view.ts"))) / 1_000_000)
            .cast("long")
            .alias("secs_since_view"),
        )
    )


@register(
    "j12_range_join_bucketed",
    oracle=f"""
    SELECT CAST(v.event_id AS BIGINT) AS view_id,
           CAST(v.user_id AS BIGINT) AS user_id,
           strftime(v.ts, '{_ISO_DUCK}') AS view_ts,
           CAST(count(*) AS BIGINT) AS purchase_cnt,
           {rfix_sql('sum(p.value)')} AS purchase_value
    FROM events v JOIN events p
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase'
     AND epoch_us(p.ts) >= epoch_us(v.ts)
     AND epoch_us(p.ts) < epoch_us(v.ts) + {RANGE_WINDOW_SECONDS}::BIGINT * 1000000
    WHERE v.event_type = 'view'
    GROUP BY v.event_id, v.user_id, v.ts
    """,
    tags=("J12", "RANGE"),
)
def j12_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval range join: purchases within 24 h after each view
    by the same user, aggregated per view (attribution counting).

    A naive ``t BETWEEN`` join is an inequality join — Spark falls back
    to broadcast-nested-loop and the plan dies at scale. The reusable
    ``operators.asof.bucketed_range_join`` equi-joins on a coarse bucket
    whose width equals the interval (a purchase in time-bucket b can only
    match views in buckets b and b-1) and applies the exact predicate
    after: work is O(matches), the join stays a shuffled hash join, and
    AQE's skew handling applies as usual.
    """
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = bucketed_range_join(
        views, purchases, on="user_id", left_time="view_ts", right_time="ts",
        window_seconds=RANGE_WINDOW_SECONDS, right_prefix="p_",
    )
    return (
        joined.groupBy(
            F.col("view_id").cast("long").alias("view_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.date_format("view_ts", _ISO).alias("view_ts"),
        )
        .agg(
            F.count("*").alias("purchase_cnt"),
            rfix(F.sum("p_value")).alias("purchase_value"),
        )
    )


@register(
    "a_funnel_signup_view_purchase",
    oracle=f"""
    WITH s AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
        SELECT e.user_id, min(e.ts) AS v_ts
        FROM events e JOIN s ON s.user_id = e.user_id AND e.ts >= s.s_ts
        WHERE e.event_type = 'view' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.v_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, CAST(n_users AS BIGINT) AS n_users FROM (
        SELECT '1_signup' AS stage, count(*) AS n_users FROM s
        UNION ALL SELECT '2_view_after_signup', count(*) FROM v
        UNION ALL SELECT '3_purchase_after_view', count(*) FROM p
    )
    """,
    tags=("FUNNEL", "A2", "J11"),
)
def a_funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who signed up, then viewed at or
    after their first signup, then purchased at or after that first view —
    the product-analytics sequence query the reference's dashboards can't
    ask (every endpoint aggregates one event type at a time).

    Thin caller over the phase-8 library:
    ``operators.sessionops.funnel_counts`` owns the first-touch stage
    chain — each stage a groupBy(user_id) min plus a join back on the
    SAME key, so all stages ride one user_id hash partitioning and the
    per-stage state is one timestamp per user; the event table is
    scanned per stage but filtered to one type at the scan (pushed
    predicate) — at 100 TB this is 3 pruned scans + co-partitioned
    joins, no window over the full stream. The N-stage/repeated-type
    knobs are proven by a_funnel_reengagement (drafts_r16).
    """
    ev = table(spark, sf_dir, "events")
    return sessionops.funnel_counts(
        ev, "user_id", "ts", "event_type",
        stages=("signup", "view", "purchase"),
        labels=("1_signup", "2_view_after_signup", "3_purchase_after_view"),
    )


@register(
    "j15_asof_next_purchase",
    oracle=f"""
    WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
    SELECT CAST(v.event_id AS BIGINT) AS view_id,
           CAST(v.user_id AS BIGINT) AS user_id,
           strftime(v.ts, '{_ISO_DUCK}') AS view_ts,
           strftime(np.next_ts, '{_ISO_DUCK}') AS next_purchase_ts,
           CAST((epoch_us(np.next_ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS secs_to_purchase
    FROM v, LATERAL (
        SELECT min(p.ts) AS next_ts
        FROM events p
        WHERE p.user_id = v.user_id AND p.event_type = 'purchase' AND p.ts >= v.ts
    ) np
    WHERE np.next_ts IS NOT NULL
    """,
    tags=("J11", "ASOF"),
)
def j15_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every view, the EARLIEST same-user purchase
    at or after it (time-to-convert from the view side — the mirror of
    j11's backward attribution).

    Exercises ``operators.asof.asof_join`` in the forward direction under
    the full oracle gate: same single-shuffle union+window plan, ordering
    descended on time so last(..., ignorenulls) carries the nearest LATER
    purchase; inclusive at equal timestamps. Oracle: LATERAL min().
    """
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").cast("long")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    matched = asof_join(
        views, purchases, on="user_id", left_time="ts", right_time="ts",
        direction="forward", asof_col="next_p",
    )
    return (
        matched.filter(F.col("next_p").isNotNull())
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.date_format("ts", _ISO).alias("view_ts"),
            F.date_format("next_p.ts", _ISO).alias("next_purchase_ts"),
            F.floor((_us(F.col("next_p.ts")) - _us("ts")) / 1_000_000)
            .cast("long")
            .alias("secs_to_purchase"),
        )
    )


@register(
    "a_cohort_retention",
    oracle=f"""
    WITH first_seen AS (
        SELECT user_id, min(ts) AS f_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    cohorts AS (
        SELECT user_id, date_trunc('week', f_ts) AS cohort_week FROM first_seen
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               c.cohort_week,
               CAST(floor((epoch_us(date_trunc('week', e.ts))
                           - epoch_us(c.cohort_week))
                          / (7::BIGINT * 86400 * 1000000)) AS BIGINT) AS week_offset
        FROM events e JOIN cohorts c ON c.user_id = e.user_id
        WHERE e.ts >= c.cohort_week
    )
    SELECT strftime(cohort_week, '{_ISO_DUCK}') AS cohort_week,
           week_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("A2", "A6", "COHORT"),
)
def a_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their first
    signup, counted distinct in every subsequent activity week (offset 0 =
    the cohort week itself) — the canonical product-analytics workload the
    reference's one-aggregate-at-a-time dashboards cannot express.

    Thin caller over the phase-8 library:
    ``operators.sessionops.cohort_retention`` (week granularity,
    signup-opened cohorts) owns the plan — first-seen is one
    groupBy(user_id); the activity join rides the same user_id key
    (co-partitioned, no extra exchange of the fact); DISTINCT collapses
    (user, cohort, offset) before the final count so the last shuffle
    carries at most |users|·|weeks| rows. Week arithmetic uses
    date_trunc + epoch microseconds so engine and oracle bucket
    identically under the UTC-pinned session; the calendar-month
    integer-arithmetic knob is proven by a_cohort_retention_matrix
    (drafts_r6), which is the same library call at granularity="month".
    """
    ev = table(spark, sf_dir, "events")
    return sessionops.cohort_retention(
        ev, "user_id", "ts", granularity="week", cohort_types=("signup",),
        label_fmt=_ISO,
    )


@register(
    "a_latest_event_per_user",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '{_ISO_DUCK}') AS last_ts,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_type,
           {rfix_sql('value')} AS last_value
    FROM ranked WHERE rn = 1
    """,
    tags=("A7", "CDC"),
)
def a_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state-per-key (CDC latest-wins compaction): each user's most
    recent event, total order (ts, event_id).

    Thin caller over the phase-8 library:
    ``operators.sessionops.latest_state`` owns the struct-MAX
    aggregation — max of (ts, event_id, payload) structs compares
    lexicographically, so ONE hash aggregate with map-side partial
    combining replaces the window+filter plan (which would sort every
    partition). This is the primitive behind snapshotting a change
    stream into current state at 100 TB: shuffle carries one struct per
    (partial) key, not the event history. The oracle states the same
    semantics as row_number() = 1.
    """
    ev = table(spark, sf_dir, "events")
    latest = sessionops.latest_state(
        ev,
        keys=(F.col("user_id").cast("long").alias("user_id"),),
        order_cols=(F.col("ts"), F.col("event_id").cast("long").alias("event_id")),
        payload_cols=(F.col("event_type"), F.col("value")),
    )
    return latest.select(
        "user_id",
        F.date_format("s.ts", _ISO).alias("last_ts"),
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_type"),
        rfix(F.col("s.value")).alias("last_value"),
    )


@register(
    "scd2_state_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT *, sum(is_new) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS run_id
        FROM ordered
    ),
    runs AS (
        SELECT user_id, run_id, min(event_type) AS state,
               min(ts) AS vf, count(*) AS n_events
        FROM numbered GROUP BY user_id, run_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(run_id AS BIGINT) AS version,
           state,
           epoch_us(vf) AS valid_from_us,
           epoch_us(lead(vf) OVER
                    (PARTITION BY user_id ORDER BY run_id)) AS valid_to_us,
           CAST(n_events AS BIGINT) AS n_events,
           (lead(vf) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL)
               AS is_current
    FROM runs
    """,
    tags=("T2", "W3", "SCD"),
)
def scd2_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each user's
    event-type stream into consecutive-state intervals with
    [valid_from, valid_to) validity and an is_current flag — the batch
    construction of the versioned dimension that the reference's upsert
    consumer overwrites in place (streaming/consumer.py:417-441 keeps
    only the latest state; SCD2 keeps history, which a training pipeline
    needs for leakage-free point-in-time features, cf. j11/
    pointintime_enriched_stream).

    Thin caller over the phase-8 library:
    ``operators.sessionops.scd2_intervals`` owns the run-collapse —
    ONE hash exchange on user_id serves both windows and the aggregate
    (the run id is the sessionize construction keyed on state change;
    groupBy(user_id, run_id) is satisfied by the user_id partitioning;
    the validity-interval lead rides the same exchange). Ties on ts
    break on event_id, so versions are total-ordered and deterministic
    on any cluster layout; this query formats validity to epoch
    microseconds at the presentation edge.
    """
    ev = table(spark, sf_dir, "events")
    runs = sessionops.scd2_intervals(
        ev.select("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_type", order_cols=("ts", "event_id"),
    )
    return runs.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("version").cast("long").alias("version"),
        "state",
        _us("valid_from").alias("valid_from_us"),
        _us("valid_to").alias("valid_to_us"),
        F.col("n_events").cast("long").alias("n_events"),
        "is_current",
    )


@register(
    "t9_session_window_native",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SECONDS}::BIGINT * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(min(ts), '{_ISO_DUCK}') AS session_start,
           strftime(max(ts) + INTERVAL {SESSION_GAP_SECONDS} SECONDS, '{_ISO_DUCK}')
               AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           {rfix_sql('sum(value)')} AS total_value
    FROM numbered
    GROUP BY user_id, sess_no
    """,
    tags=("T8", "SESSION", "T7"),
)
def t9_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` operator — the
    same 6 h-gap semantics as t8's lag/running-sum formulation, expressed
    as a single dynamic-gap grouping aggregate instead of two window
    passes. The oracle derives session boundaries independently with the
    lag construction, so the hash check proves the two formulations agree
    (session_window's `end` is last event + gap, mirrored in the oracle).

    Plan shape: ONE exchange on user_id, then Spark's session-merging
    aggregate (the same operator Structured Streaming uses for streaming
    session windows, streaming/pipeline.py::sessionized_stats) — no rank
    windows at all, and at scale the gap-merge happens inside the
    aggregation buffer rather than via two sorted window passes.
    """
    ev = table(spark, sf_dir, "events")
    sw = F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds")
    return (
        ev.groupBy(F.col("user_id").cast("long").alias("user_id"), sw)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            rfix(F.sum("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", _ISO).alias("session_start"),
            F.date_format("session_window.end", _ISO).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "a_conversion_lag_quantiles",
    oracle=f"""
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    lags AS (
        SELECT (epoch_us(p.ts) - epoch_us(lv.last_view_ts)) // 1000000 AS lag_secs
        FROM p, LATERAL (
            SELECT max(v.ts) AS last_view_ts
            FROM events v
            WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        ) lv
        WHERE lv.last_view_ts IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           {rfix_sql('quantile_cont(lag_secs, 0.5)', 4)} AS median_lag_secs,
           {rfix_sql('quantile_cont(lag_secs, 0.9)', 4)} AS p90_lag_secs,
           {rfix_sql('quantile_cont(lag_secs, 0.99)', 4)} AS p99_lag_secs
    FROM lags
    """,
    tags=("ASOF", "PCTL", "A6"),
)
def a_conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of two operators the registry proves separately: the
    as-of join (j11's purchase → last prior view attribution) feeding
    exact interpolated percentiles (a_percentiles_by_segment's machinery)
    — the time-to-convert distribution, the funnel-latency report every
    behavioral pipeline ships.

    Plan shape: ONE user_id exchange for the union+window as-of encoding,
    then a single-group percentile over the (small) per-conversion lag
    column. At 100 TB the percentile input is conversion-sized, not
    event-sized, because the as-of join reduces before aggregating; for
    heavy funnels swap in approx_percentile (t-digest) with the same call
    shape.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    matched = asof_join(
        purchases, views, on="user_id", left_time="ts", right_time="ts",
        direction="backward", asof_col="last_view",
    )
    lags = matched.filter(F.col("last_view").isNotNull()).select(
        F.floor((_us("ts") - _us(F.col("last_view.ts"))) / 1_000_000)
        .cast("long")
        .alias("lag_secs")
    )
    return lags.agg(
        F.count("*").cast("long").alias("n_conversions"),
        rfix(F.expr("percentile(lag_secs, 0.5)"), 4).alias("median_lag_secs"),
        rfix(F.expr("percentile(lag_secs, 0.9)"), 4).alias("p90_lag_secs"),
        rfix(F.expr("percentile(lag_secs, 0.99)"), 4).alias("p99_lag_secs"),
    )
