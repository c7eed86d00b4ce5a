"""Round-16 drafts (written in round 12; registered via
queries/draft_layer.register_all, probed through the oracle-parity,
bare-session and 5x scale gates before the driver sees them).

One registration — the knob-proof for the phase-8 library extraction
(operators/sessionops.py), following the r11 pattern that every library
phase ships one registration at NON-registry parameters:

* ``a_funnel_reengagement`` — sessionops.funnel_counts with a FOUR-stage
  list containing a REPEATED event type (signup → view → purchase →
  view): the post-purchase re-view funnel. The registered
  a_funnel_signup_view_purchase runs the 3-stage list with custom
  labels; this one proves the stage loop generalizes (N stages, repeated
  types, default ``{i}_{stage}`` labels). The oracle chains four
  first-touch CTEs, each joined on the previous stage's min-timestamp.

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT; counts are exact integers so no float
canonicalization is involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import sessionops
from ..sources.tables import table

DRAFTS: dict = {}


# ---------------------------------------------------------------------------
# a_funnel_reengagement — funnel_counts at a 4-stage, repeated-type list
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("signup", "view", "purchase", "view")

_FUNNEL_ORACLE = """
WITH s0 AS (
    SELECT user_id, min(ts) AS ts0 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), s1 AS (
    SELECT e.user_id, min(e.ts) AS ts1
    FROM events e JOIN s0 ON s0.user_id = e.user_id AND e.ts >= s0.ts0
    WHERE e.event_type = 'view' GROUP BY e.user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS ts2
    FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts >= s1.ts1
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS ts3
    FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts >= s2.ts2
    WHERE e.event_type = 'view' GROUP BY e.user_id
)
SELECT stage, CAST(n_users AS BIGINT) AS n_users FROM (
    SELECT '1_signup' AS stage, count(*) AS n_users FROM s0
    UNION ALL SELECT '2_view', count(*) FROM s1
    UNION ALL SELECT '3_purchase', count(*) FROM s2
    UNION ALL SELECT '4_view', count(*) FROM s3
)
"""


def a_funnel_reengagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-purchase re-engagement funnel: signup → first view at/after
    it → first purchase at/after that → first view at/after the
    purchase — the 4-stage, repeated-type exercise of the phase-8
    ``sessionops.funnel_counts`` stage loop (the registered 3-stage
    a_funnel_signup_view_purchase is the same call at the registry
    operating point; default ``{i}_{stage}`` labels here prove the
    label generator too).

    Reference analog: none — every reference endpoint aggregates one
    event type at a time (SURVEY Appendix A); ordered-sequence funnels
    are beyond-reference product-analytics surface. Plan shape: four
    type-pruned scans + co-partitioned user_id joins, one timestamp per
    user per stage, no window over the full stream (the funnel_counts
    contract).
    """
    ev = table(spark, sf_dir, "events")
    return sessionops.funnel_counts(
        ev, "user_id", "ts", "event_type", stages=_FUNNEL_STAGES
    )


DRAFTS["a_funnel_reengagement"] = (a_funnel_reengagement, _FUNNEL_ORACLE)
