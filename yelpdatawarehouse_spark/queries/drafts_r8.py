"""Round-8 drafts: query + oracle pairs written in round 6, registered the
same round through queries/draft_layer.register_all (the _prioritize
window reserve caps never-verified entries at 45 per round, so these
queue safely behind the round-7 spill instead of displacing stale
re-verifications — the old stage-one-round discipline is now enforced
structurally rather than by keeping code out of the registry).

Every function follows the registry contract (column aliases identical on
both sides, ints cast long/BIGINT, floats through rfix; unordered float
sums canonicalized immediately; argmax over floats ranked on
floor(x*10^n+0.5) on BOTH sides)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import seeded, seeded_sql
from ..functions.presentation import rfix, rfix_sql
from ..sources.tables import spread, table

DRAFTS: dict = {}

_TOKS = "string_split_regex(text, '\\s+')"


# ---------------------------------------------------------------------------
# HITS hubs & authorities, two unrolled rounds over the directed
# cross-nation trade graph — the OTHER classic link-analysis fixed point
# next to g_pagerank_nations, with a twist that makes it hash-checkable:
# both rounds run in EXACT integer arithmetic (weights and scores are
# counts; round-2 sums ride decimal(38,0)/HUGEINT so no overflow and no
# order-dependent float addition), normalized only at the very end.

HITS_ORACLE = """
WITH e AS (
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           count(*)::BIGINT AS w
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
    GROUP BY 1, 2
),
auth1 AS (SELECT dst AS node, sum(w)::BIGINT AS a1 FROM e GROUP BY dst),
hub1 AS (
    SELECT e.src AS node, sum(e.w::HUGEINT * a.a1::HUGEINT) AS h1
    FROM e JOIN auth1 a ON a.node = e.dst GROUP BY e.src
),
auth2 AS (
    SELECT e.dst AS node, sum(e.w::HUGEINT * h.h1::HUGEINT) AS a2
    FROM e JOIN hub1 h ON h.node = e.src GROUP BY e.dst
),
tot AS (
    SELECT (SELECT sum(h1::HUGEINT) FROM hub1) AS th,
           (SELECT sum(a2) FROM auth2) AS ta
)
SELECT CAST(coalesce(h.node, a.node) AS BIGINT) AS nation,
       {hub} AS hub_score,
       {auth} AS auth_score
FROM hub1 h FULL OUTER JOIN auth2 a ON a.node = h.node, tot
""".format(
    hub=rfix_sql("coalesce(h.h1, 0)::DOUBLE / (SELECT th FROM tot)::DOUBLE", 8),
    auth=rfix_sql("coalesce(a.a2, 0)::DOUBLE / (SELECT ta FROM tot)::DOUBLE", 8),
)


def g_hits_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs/authorities), two unrolled iterations over
    the directed customer-nation → supplier-nation trade graph (edge
    weight = cross-nation order-line count). auth1 = weighted in-degree;
    hub1(u) = Σ w(u,v)·auth1(v); auth2(v) = Σ w(u,v)·hub1(u); the
    registered output is each nation's hub and authority MASS SHARE
    (score / total), the bounded-iteration contract used by
    g_pagerank_nations.

    Float discipline: every score is an exact integer until the final
    division — round-2 products reach ~1e19 at sf0.1 so they accumulate
    in decimal(38,0) (HUGEINT on the oracle side), which is exact AND
    order-independent where a double sum is neither.

    Scale shape: one fact-scale exchange builds the node-keyed edge list
    (dimension-bounded: nations²); both HITS rounds are node-scale joins
    + aggregates. Reference analog: none (its graph store has no GDS
    plugin — docker-compose.yml:51-58); this is the link-analysis family
    beyond the reference.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = spread(table(spark, sf_dir, "lineitem"))
    s = table(spark, sf_dir, "supplier")
    e = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    # Thin caller of operators/graphalgs.hits (r12 library extraction):
    # the library pins the edge list (it feeds 3 aggregates + 2 joins),
    # broadcasts the node-sized score frames into the edge joins (each
    # HITS round is broadcast-join -> map-side partial agg -> one
    # node-keyed exchange, the g_pagerank_nations iteration shape), and
    # accumulates BOTH rounds in decimal(38,0) — round-1 products are
    # long×long and Σ w·a1 clears LONG's ~9.2e18 near full-corpus scale
    # (r9 overflow audit, tests/test_overflow_audit.py).
    from ..operators import graphalgs

    return graphalgs.hits(e, digits=8).select(
        F.col("node").alias("nation"), "hub_score", "auth_score"
    )


DRAFTS["g_hits_two_rounds"] = (g_hits_two_rounds, HITS_ORACLE)


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard for "time to second purchase" with
# right-censoring — survival analysis as pure integer risk-set counting
# plus an ordered (hence deterministic) cumulative sum, no transcendentals.

SURVIVAL_ORACLE = """
WITH firsts AS (
    SELECT o_custkey,
           min(CAST(o_orderdate AS DATE)) AS d1,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
),
second AS (
    SELECT o.o_custkey, min(CAST(o.o_orderdate AS DATE)) AS d2
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    WHERE CAST(o.o_orderdate AS DATE) > f.d1
    GROUP BY o.o_custkey
),
horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
durations AS (
    SELECT f.o_custkey,
           CASE WHEN s.d2 IS NOT NULL THEN date_diff('day', f.d1, s.d2)
                ELSE date_diff('day', f.d1, (SELECT h FROM horizon)) END AS t,
           (s.d2 IS NOT NULL)::INT AS is_event
    FROM firsts f LEFT JOIN second s ON s.o_custkey = f.o_custkey
),
by_t AS (
    SELECT t, sum(is_event)::BIGINT AS d,
           sum(1 - is_event)::BIGINT AS c
    FROM durations GROUP BY t
),
spine AS (
    SELECT t, d, c,
           (SELECT count(*) FROM durations)::BIGINT
             - coalesce(sum(d + c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n_risk
    FROM by_t
)
SELECT CAST(t AS BIGINT) AS gap_days,
       CAST(n_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       {hz} AS cum_hazard
FROM (
    SELECT t, n_risk, d,
           sum(d::DOUBLE / n_risk::DOUBLE) OVER (ORDER BY t) AS hz_raw
    FROM spine WHERE d > 0
)
""".format(hz=rfix_sql("hz_raw", 6))


def a_survival_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard curve for time-to-second-purchase:
    each customer contributes one duration (days from first to second
    order date, right-CENSORED at the corpus horizon if no second order
    exists), and H(t) = Σ_{s≤t} d_s/n_s over event times with exact
    integer death/at-risk counts. The survival-analysis member of the
    stats family (KS drift, Welch t, runs test, …) — churn/retention
    modeling over the same table the cohort queries read.

    Float discipline: d_s/n_s divides exact integers (deterministic per
    row); the cumulative sum runs over the ORDERED gap-day spine, so both
    engines add the same doubles in the same sequence — no unordered
    float accumulation anywhere (this is why the estimator is
    Nelson-Aalen rather than Kaplan-Meier: no exp/ln of products).

    Scale shape: one customer-keyed aggregate pair builds durations (two
    fact exchanges); everything after runs on the gap-day SPINE
    (calendar-bounded), including the single-partition cumulative window.
    """
    o = spread(table(spark, sf_dir, "orders"))
    # r13 (guide §1.2/§2.2): first AND second order date from ONE
    # customer-keyed aggregate — the distinct order dates collapse to a
    # sorted set per customer (collect_set partial-aggregates map-side;
    # per-customer order counts are dimension-bounded), d1 = element 1,
    # d2 = element 2 (NULL when only one distinct date — exactly "min
    # date strictly after d1"). The old shape aggregated the fact twice
    # and joined them (12 parquet scans in the before-plan). The
    # gap-day frame is calendar-bounded, so it is pinned and n_total is
    # DERIVED from it (every customer lands in exactly one t bucket, so
    # n = Σ(d+c)) instead of re-running the fact aggregate a third time.
    dates = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set(F.to_date("o_orderdate"))).alias("ds")
    )
    horizon = F.broadcast(
        o.agg(F.max(F.to_date("o_orderdate")).alias("h"))
    )
    durations = dates.crossJoin(horizon).select(
        F.element_at("ds", 1).alias("d1"),
        # try_: single-date customers have no element 2 -> NULL (censored)
        F.try_element_at("ds", F.lit(2)).alias("d2"),
        "h",
    ).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        )
        .otherwise(F.datediff("h", "d1"))
        .alias("t"),
        F.col("d2").isNotNull().cast("int").alias("is_event"),
    )
    by_t = durations.groupBy("t").agg(
        F.sum("is_event").alias("d"),
        F.sum(F.lit(1) - F.col("is_event")).alias("c"),
    ).localCheckpoint()
    n_total = F.broadcast(
        by_t.agg(F.sum(F.col("d") + F.col("c")).alias("n"))
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    spine = by_t.crossJoin(n_total).select(
        "t",
        "d",
        (F.col("n") - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))).alias(
            "n_risk"
        ),
    )
    w_cum = Window.orderBy("t")
    return (
        spine.filter(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            "d",
            F.sum(
                F.col("d").cast("double") / F.col("n_risk").cast("double")
            )
            .over(w_cum)
            .alias("hz_raw"),
        )
        .select(
            F.col("t").cast("long").alias("gap_days"),
            F.col("n_risk").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            rfix("hz_raw", 6).alias("cum_hazard"),
        )
    )


DRAFTS["a_survival_hazard_curve"] = (a_survival_hazard_curve, SURVIVAL_ORACLE)


# ---------------------------------------------------------------------------
# Leave-one-out source valuation: how much does each source move the
# corpus-level quality metric? Exact integer totals, one scan.

LOO_ORACLE = f"""
WITH per_source AS (
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(len({_TOKS}))::BIGINT AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT sum(n_docs)::BIGINT AS nd, sum(n_tokens)::BIGINT AS nt
    FROM per_source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       {rfix_sql("nt::DOUBLE / nd::DOUBLE", 6)} AS corpus_mean_tokens,
       CASE WHEN nd - n_docs > 0 THEN
         {rfix_sql("(nt - n_tokens)::DOUBLE / (nd - n_docs)::DOUBLE"
                   " - nt::DOUBLE / nd::DOUBLE", 6)}
       END AS loo_delta
FROM per_source, tot
"""


def diag_loo_source_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out source valuation (Shapley-lite data attribution):
    for each source, the change in the corpus mean tokens-per-document if
    that source were REMOVED — the cheapest member of the data-valuation
    family a curation pipeline uses to rank ingest feeds (negative delta
    = the source drags the metric down). Exact: totals are integers, the
    two divisions are the only float ops, and the single-source corpus
    degenerates to NULL (guarded division — the a_stats_aggregates ANSI
    rule).

    Scale shape: ONE source-keyed aggregate over the scan (token counts
    are per-row expressions), a 1-row total broadcast, zero further
    exchanges. At 100 TB this is a single pass regardless of the number
    of sources.
    """
    from ..functions import text as T

    d = spread(table(spark, sf_dir, "documents"))
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).alias("n_tokens"),
    )
    tot = F.broadcast(
        per_source.agg(
            F.sum("n_docs").alias("nd"), F.sum("n_tokens").alias("nt")
        )
    )
    nd, nt = F.col("nd"), F.col("nt")
    ndocs, ntok = F.col("n_docs"), F.col("n_tokens")
    return per_source.crossJoin(tot).select(
        "source",
        ndocs.cast("long").alias("n_docs"),
        rfix(nt.cast("double") / nd.cast("double"), 6).alias(
            "corpus_mean_tokens"
        ),
        F.when(
            nd - ndocs > 0,
            rfix(
                (nt - ntok).cast("double") / (nd - ndocs).cast("double")
                - nt.cast("double") / nd.cast("double"),
                6,
            ),
        ).alias("loo_delta"),
    )


DRAFTS["diag_loo_source_value"] = (diag_loo_source_value, LOO_ORACLE)


# ---------------------------------------------------------------------------
# Two-sided trimmed mean over a VALUE-DOMAIN collapse — robust statistics
# without a fact-scale sort: the quantity histogram (≤50 values per
# group) carries exact counts, and the trim is arithmetic on cumulative
# weights, the f16_weighted_median_price/decision-stump move.

TRIM_FRAC = 0.05

TRIMMED_ORACLE = f"""
WITH hist AS (
    SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
           count(*)::BIGINT AS cnt
    FROM lineitem GROUP BY 1, 2
),
cum AS (
    SELECT flag, q, cnt,
           sum(cnt) OVER (PARTITION BY flag ORDER BY q
               ROWS UNBOUNDED PRECEDING) AS cum_n,
           sum(cnt) OVER (PARTITION BY flag) AS n
    FROM hist
),
kept AS (
    SELECT flag, q, n,
           greatest(0::BIGINT,
             least(cum_n, n - CAST(floor(n * {TRIM_FRAC}) AS BIGINT))
             - greatest(cum_n - cnt, CAST(floor(n * {TRIM_FRAC}) AS BIGINT))
           ) AS k
    FROM cum
)
SELECT flag AS l_returnflag,
       CAST(max(n) AS BIGINT) AS n_rows,
       CAST(sum(k) AS BIGINT) AS n_kept,
       {rfix_sql("sum(q * k)::DOUBLE / sum(k)::DOUBLE", 6)} AS trimmed_mean_qty
FROM kept GROUP BY flag
"""


def a_trimmed_mean_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag 5%-two-sided TRIMMED mean of l_quantity — the
    robust-location member of the stats family, computed over the value-
    domain histogram instead of a fact-scale per-group sort: each
    quantity value keeps ``min(cum, n-k) - max(cum_prev, k)`` of its
    occurrences (k = floor(0.05·n) trimmed from each tail), so the whole
    trim is exact integer arithmetic over ≤50 rows per group.

    Scale shape: ONE (flag, quantity) collapse with map-side combine is
    the only fact-scale exchange; the cumulative windows run on the
    value domain (≤50 rows per flag — same discipline as
    ml_decision_stump_returns / f16_weighted_median_price). A naive
    row_number trim would instead sort the full fact table through 3
    flag partitions — unbounded skew at 100 TB.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    hist = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    ).agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("flag").orderBy("q").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("flag")
    cum = hist.select(
        "flag",
        "q",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum_n"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    k_tail = F.floor(F.col("n") * TRIM_FRAC).cast("long")
    kept = cum.select(
        "flag",
        "q",
        "n",
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col("cum_n"), F.col("n") - k_tail)
            - F.greatest(F.col("cum_n") - F.col("cnt"), k_tail),
        ).alias("k"),
    )
    return kept.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.max("n").cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("n_kept"),
        rfix(
            F.sum(F.col("q") * F.col("k")).cast("double")
            / F.sum("k").cast("double"),
            6,
        ).alias("trimmed_mean_qty"),
    )


DRAFTS["a_trimmed_mean_quantity"] = (a_trimmed_mean_quantity, TRIMMED_ORACLE)


# ---------------------------------------------------------------------------
# Measured Bloom false-positive rate — the eval twin of the
# j16_bloom_semi_filter OPERATOR: build the bitmap from one membership
# set with the portable seeded-md5 hash family, probe with true
# negatives, report the observed FPR next to the theoretical bound.

BLOOM_M = 4096  # bits
BLOOM_K = 3  # hash functions
_BLOOM_SEGMENT = "BUILDING"


def _bloom_pos_sql(expr: str, seed: int) -> str:
    return f"({seeded_sql(expr, seed)} % {BLOOM_M})"


BLOOM_FPR_ORACLE = f"""
WITH members AS (
    SELECT CAST(c_custkey AS VARCHAR) AS key FROM customer
    WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
),
negatives AS (
    SELECT CAST(c_custkey AS VARCHAR) AS key FROM customer
    WHERE c_mktsegment <> '{_BLOOM_SEGMENT}'
),
bits AS (
    SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(
            f"SELECT {_bloom_pos_sql('key', s)} AS pos FROM members"
            for s in range(BLOOM_K)
        )}
    )
),
probes AS (
    {" UNION ALL ".join(
        f"SELECT key, {_bloom_pos_sql('key', s)} AS pos FROM negatives"
        for s in range(BLOOM_K)
    )}
),
fp AS (
    SELECT p.key
    FROM probes p JOIN bits b ON b.pos = p.pos
    GROUP BY p.key
    HAVING count(*) = {BLOOM_K}
),
stats AS (
    SELECT (SELECT count(*) FROM members)::BIGINT AS n_members,
           (SELECT count(*) FROM negatives)::BIGINT AS n_negatives,
           (SELECT count(*) FROM bits)::BIGINT AS n_bits_set,
           (SELECT count(*) FROM fp)::BIGINT AS n_false_positives
)
SELECT n_members, n_negatives, n_bits_set, n_false_positives,
       CASE WHEN n_negatives > 0 THEN
         {rfix_sql("n_false_positives::DOUBLE / n_negatives::DOUBLE", 6)}
       END AS fpr_measured,
       {rfix_sql(
           f"pow(n_bits_set::DOUBLE / {BLOOM_M}.0, {BLOOM_K}.0)", 6
       )} AS fpr_predicted
FROM stats
"""


def diag_bloom_fpr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs predicted Bloom-filter false-positive rate: build a
    {BLOOM_M}-bit / {BLOOM_K}-hash bitmap over one customer segment with
    the PORTABLE seeded-md5 family (operators/bloom's xxhash64 family is
    faster but not oracle-reproducible — j16 gets away with it because
    its exact verify join erases FPs; an FPR EVAL is about the bits
    themselves), probe every out-of-segment customer, and report the
    observed FPR next to the occupancy-based prediction (set_bits/m)^k.
    The eval twin every production Bloom deployment wants next to the
    filter itself (same role as ann_recall_eval for the ANN indexes).

    Scale shape: the bitmap is a DISTINCT over ≤m integers (map-side
    combinable); probes explode k positions per negative and join the
    broadcast-sized bit set; the HAVING count(*)=k is a key-sized
    aggregate. No fact-scale sort, no driver collect.
    """
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("key"), "c_mktsegment"
    )
    members = c.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT).select("key")
    negatives = c.filter(F.col("c_mktsegment") != _BLOOM_SEGMENT).select("key")

    def pos(seed: int) -> F.Column:
        return seeded("key", seed) % BLOOM_M

    bits = (
        members.select(
            F.explode(F.array(*[pos(s) for s in range(BLOOM_K)])).alias("pos")
        )
        .distinct()
    )
    probes = negatives.select(
        "key", F.explode(F.array(*[pos(s) for s in range(BLOOM_K)])).alias("pos")
    )
    fp = (
        probes.join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == BLOOM_K)
    )
    stats = (
        F.broadcast(members.agg(F.count("*").alias("n_members")))
        .crossJoin(F.broadcast(negatives.agg(F.count("*").alias("n_negatives"))))
        .crossJoin(F.broadcast(bits.agg(F.count("*").alias("n_bits_set"))))
        .crossJoin(F.broadcast(fp.agg(F.count("*").alias("n_false_positives"))))
    )
    return stats.select(
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_negatives").cast("long").alias("n_negatives"),
        F.col("n_bits_set").cast("long").alias("n_bits_set"),
        F.col("n_false_positives").cast("long").alias("n_false_positives"),
        F.when(  # empty probe set: NULL, not a DIVIDE_BY_ZERO (ANSI rule)
            F.col("n_negatives") > 0,
            rfix(
                F.col("n_false_positives").cast("double")
                / F.col("n_negatives").cast("double"),
                6,
            ),
        ).alias("fpr_measured"),
        rfix(
            F.pow(
                F.col("n_bits_set").cast("double") / F.lit(float(BLOOM_M)),
                F.lit(float(BLOOM_K)),
            ),
            6,
        ).alias("fpr_predicted"),
    )


DRAFTS["diag_bloom_fpr_eval"] = (diag_bloom_fpr_eval, BLOOM_FPR_ORACLE)


# ---------------------------------------------------------------------------
# Top event-type trigrams: the sequential-pattern rollup one step beyond
# t13's transition (bigram) matrix — per-user ordered windows, global
# counts, deterministic top-k.

TRIGRAM_TOPK = 10

TRIGRAM_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type AS t0,
           lead(event_type, 1) OVER w AS t1,
           lead(event_type, 2) OVER w AS t2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
    SELECT t0 || '>' || t1 || '>' || t2 AS trigram, count(*)::BIGINT AS cnt
    FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
    GROUP BY 1
)
SELECT trigram, cnt FROM tri
ORDER BY cnt DESC, trigram
LIMIT {TRIGRAM_TOPK}
"""


def t26_event_trigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TRIGRAM_TOPK} event-type TRIGRAMS across all user streams —
    the order-3 sequential pattern mine (t13_event_transition_matrix is
    order 2): two leads over each user's (ts, event_id)-ordered stream,
    concatenate, count, deterministic top-k (count desc, trigram asc —
    TakeOrdered, never a global sort).

    Scale shape: ONE user_id exchange feeds both lead windows (same
    partitioning, one shuffle); the trigram count is map-side
    combinable over a |event_types|^3-bounded key domain; top-k is
    orderBy+limit.
    """
    e = spread(table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        seq.filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
        .select(
            F.concat_ws(">", "t0", "t1", "t2").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("trigram"))
        .limit(TRIGRAM_TOPK)
    )


DRAFTS["t26_event_trigrams_topk"] = (t26_event_trigrams_topk, TRIGRAM_ORACLE)


# ---------------------------------------------------------------------------
# Sweep-line interval coverage: concurrent open orders per day. The
# classic +1/-1 delta trick — interval containment WITHOUT a range join:
# fact-scale work collapses to two deltas per order, and the coverage
# curve is a prefix sum over the calendar spine.

OPEN_ORDERS_ORACLE = """
WITH intervals AS (
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS d_start,
           max(CAST(l.l_shipdate AS DATE)) AS d_end
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
),
deltas AS (
    SELECT d_start AS d, 1 AS delta FROM intervals
    UNION ALL
    SELECT d_end + 1 AS d, -1 AS delta FROM intervals
),
by_day AS (SELECT d, sum(delta)::BIGINT AS delta FROM deltas GROUP BY d),
spine AS (
    SELECT unnest(generate_series((SELECT min(d) FROM by_day),
                                  (SELECT max(d) FROM by_day),
                                  INTERVAL 1 DAY))::DATE AS d
)
SELECT strftime(s.d, '%Y-%m-%d') AS day,
       CAST(sum(coalesce(b.delta, 0))
                OVER (ORDER BY s.d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS open_orders
FROM spine s LEFT JOIN by_day b ON b.d = s.d
"""


def a_open_orders_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent OPEN orders per calendar day (an order is open from its
    order date to its last line's ship date) — interval coverage by
    sweep line: every order contributes +1 at its start day and -1 the
    day after its end, and the per-day open count is the running sum of
    day deltas over the calendar spine. The operator family behind
    concurrency/occupancy analytics (open tickets, active sessions,
    concurrent jobs) that a naive point-in-interval range join computes
    in O(days x orders).

    Scale shape: one order-keyed aggregate (the interval build) and one
    day-keyed delta collapse are the only fact-scale exchanges; the
    prefix-sum window runs on the CALENDAR spine (~2.4k rows here,
    bounded by date span, never by order count). Orders with no
    lineitems have no ship date and are excluded by the inner join —
    documented contract.
    """
    o = table(spark, sf_dir, "orders")
    li = spread(table(spark, sf_dir, "lineitem"))
    intervals = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d_start"))
        .agg(F.max(F.to_date("l_shipdate")).alias("d_end"))
    )
    # r13 (guide §1.2/§2.3): EXPLODE each interval into its two delta
    # rows instead of a union of two projections — the union form
    # evaluated the whole join+aggregate interval subtree twice (16
    # parquet scans in the before-plan). Same rows by construction. The
    # collapsed per-day frame is calendar-bounded (~2.4k rows), so it is
    # pinned once and its three consumers (bounds, spine join) read the
    # pin instead of re-running the fact subtree.
    deltas = intervals.select(
        F.explode(
            F.array(
                F.struct(F.col("d_start").alias("d"), F.lit(1).alias("delta")),
                F.struct(
                    F.date_add("d_end", 1).alias("d"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("e")
    ).select("e.d", "e.delta")
    by_day = (
        deltas.groupBy("d").agg(F.sum("delta").alias("delta")).localCheckpoint()
    )
    bounds = F.broadcast(
        by_day.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("dmin"), F.col("dmax"), F.expr("interval 1 day"))
        ).alias("d")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(F.broadcast(by_day), "d", "left")
        .select("d", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.sum("delta").over(w).cast("long").alias("open_orders"),
        )
    )


DRAFTS["a_open_orders_per_day"] = (a_open_orders_per_day, OPEN_ORDERS_ORACLE)


# ---------------------------------------------------------------------------
# One Weiszfeld step toward the geometric median of the embedding corpus
# — the robust centroid (minimizes Σ‖x−m‖, not Σ‖x−m‖²), the estimator a
# contaminated corpus needs where the mean chases outliers.

GEOMED_EPS = 1e-9

GEOMED_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
x AS (
    SELECT vec_id, idx.i, v[CAST(idx.i AS INT)] AS x
    FROM e, (SELECT unnest(range(1, 4097)) AS i) idx
    WHERE idx.i <= len(v)
),
mu AS (SELECT i, avg(x) AS mu FROM x GROUP BY i),
dist AS (
    SELECT x.vec_id,
           sqrt(sum((x.x - mu.mu) * (x.x - mu.mu))) AS dst
    FROM x JOIN mu ON mu.i = x.i
    GROUP BY x.vec_id
),
wx AS (
    SELECT x.i,
           sum(x.x / greatest(d.dst, {GEOMED_EPS})) AS num,
           sum(1.0 / greatest(d.dst, {GEOMED_EPS})) AS den
    FROM x JOIN dist d ON d.vec_id = x.vec_id
    GROUP BY x.i
)
SELECT CAST(wx.i - 1 AS BIGINT) AS dim,
       {rfix_sql('mu.mu', 6)} AS mean_coord,
       {rfix_sql('wx.num / wx.den', 6)} AS median_step_coord
FROM wx JOIN mu ON mu.i = wx.i
"""


def emb_geometric_median_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Weiszfeld iteration toward the GEOMETRIC MEDIAN of the
    embedding corpus, seeded at the mean: m₁ = Σ(xᵢ/dᵢ) / Σ(1/dᵢ) with
    dᵢ = ‖xᵢ − mean‖ (clamped at {GEOMED_EPS} so a vector sitting exactly
    on the seed cannot divide by zero). The geometric median is the
    robust centroid — contamination moves the mean linearly but the
    median almost not at all — and one Weiszfeld step is the whole
    fixed-point loop's cost model: run it T times for the full estimator
    (emb_kmeans_train_stats unrolls Lloyd the same way).

    Scale shape: two dimension-keyed aggregates (d fixed-width rows) and
    one vector-keyed distance sum; the d-row moment frame rides a
    broadcast onto the exploded vectors — never a d×d object, never a
    driver collect. Per-dimension sums are unordered float adds,
    canonicalized at the output boundary (rfix 6) like every emb_*
    digest.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    x = e.select("vec_id", F.posexplode("v").alias("i", "x"))
    mu = F.broadcast(x.groupBy("i").agg(F.avg("x").alias("mu")))
    dist = (
        x.join(mu, "i")
        .groupBy("vec_id")
        .agg(
            F.sqrt(
                F.sum((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu")))
            ).alias("dst")
        )
    )
    wx = (
        x.join(dist, "vec_id")
        .groupBy("i")
        .agg(
            F.sum(
                F.col("x") / F.greatest(F.col("dst"), F.lit(GEOMED_EPS))
            ).alias("num"),
            F.sum(
                F.lit(1.0) / F.greatest(F.col("dst"), F.lit(GEOMED_EPS))
            ).alias("den"),
        )
    )
    return wx.join(mu, "i").select(
        F.col("i").cast("long").alias("dim"),
        rfix("mu", 6).alias("mean_coord"),
        rfix(F.col("num") / F.col("den"), 6).alias("median_step_coord"),
    )


DRAFTS["emb_geometric_median_step"] = (emb_geometric_median_step, GEOMED_ORACLE)


# ---------------------------------------------------------------------------
# Grid-density clustering cores (DBSCAN-lite): quantize the first two
# embedding dimensions to a fixed grid, count per cell, mark dense cells
# as cores and count each cell's adjacent cores — the density structure
# without any pairwise distance join.

GRID_SCALE = 8  # cells per unit: cell = floor(coord * 8)
GRID_MINPTS = 10

DENSITY_ORACLE = f"""
WITH cells AS (
    SELECT CAST(floor(embedding[1] * {GRID_SCALE}) AS BIGINT) AS cx,
           CAST(floor(embedding[2] * {GRID_SCALE}) AS BIGINT) AS cy,
           count(*)::BIGINT AS cnt
    FROM embeddings GROUP BY 1, 2
),
cores AS (SELECT cx, cy FROM cells WHERE cnt >= {GRID_MINPTS}),
offsets AS (
    SELECT dx.d AS dx, dy.d AS dy
    FROM (SELECT unnest([-1, 0, 1]) AS d) dx,
         (SELECT unnest([-1, 0, 1]) AS d) dy
    WHERE NOT (dx.d = 0 AND dy.d = 0)
),
adj AS (
    SELECT c.cx, c.cy, count(*)::BIGINT AS n_core_adj
    FROM cells c
    JOIN offsets o ON TRUE
    JOIN cores k ON k.cx = c.cx + o.dx AND k.cy = c.cy + o.dy
    GROUP BY c.cx, c.cy
)
SELECT c.cx, c.cy, c.cnt,
       (c.cnt >= {GRID_MINPTS}) AS is_core,
       coalesce(a.n_core_adj, 0) AS n_core_adj
FROM cells c LEFT JOIN adj a ON a.cx = c.cx AND a.cy = c.cy
"""


def emb_density_grid_cores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering structure (DBSCAN-lite) over the first two
    embedding dimensions: quantize to a 1/{GRID_SCALE}-unit grid, count
    points per cell, mark cells with ≥{GRID_MINPTS} points as CORES, and
    report each cell's count of adjacent (8-neighborhood) core cells —
    the density-reachability skeleton from which DBSCAN clusters are the
    connected components (dedup_clusters supplies that CC pass). Density
    estimation by grid is THE at-scale substitute for pairwise ε-range
    queries: membership is a floor(), not a distance join.

    Scale shape: ONE cell-keyed collapse over the scan (map-side
    combinable, grid-bounded output), then cell-sized joins — the
    9-offset expansion rides a broadcast against the core set. Floor of
    float×constant is bit-deterministic on both engines.

    Operates on 2 of the 64 dims (a visualization/bucketing projection);
    the full-dimensional variant is the same plan with a composite cell
    key (d floors instead of 2).
    """
    e = table(spark, sf_dir, "embeddings")
    cells = e.groupBy(
        F.floor(F.element_at("embedding", 1) * GRID_SCALE)
        .cast("long")
        .alias("cx"),
        F.floor(F.element_at("embedding", 2) * GRID_SCALE)
        .cast("long")
        .alias("cy"),
    ).agg(F.count("*").alias("cnt"))
    cores = cells.filter(F.col("cnt") >= GRID_MINPTS).select("cx", "cy")
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)],
        "dx long, dy long",
    )
    adj = (
        cells.select("cx", "cy")
        .join(F.broadcast(offsets))
        .join(
            F.broadcast(cores).select(
                F.col("cx").alias("kx"), F.col("cy").alias("ky")
            ),
            (F.col("kx") == F.col("cx") + F.col("dx"))
            & (F.col("ky") == F.col("cy") + F.col("dy")),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("n_core_adj"))
    )
    return (
        cells.join(adj, ["cx", "cy"], "left")
        .select(
            F.col("cx").cast("long").alias("cx"),
            F.col("cy").cast("long").alias("cy"),
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt") >= GRID_MINPTS).alias("is_core"),
            F.coalesce("n_core_adj", F.lit(0)).cast("long").alias("n_core_adj"),
        )
    )


DRAFTS["emb_density_grid_cores"] = (emb_density_grid_cores, DENSITY_ORACLE)


# ---------------------------------------------------------------------------
# kNN classifier evaluation on the embedding table: hash-split
# train/test, panel-bounded brute-force neighbors, majority label vote,
# confusion rollup — the lazy-learner eval next to ml_nearest_centroid_eval
# (parametric) and ml_naive_bayes_confusion (generative).

KNN_K = 5
KNN_PANEL = 20

KNN_ORACLE = f"""
WITH test AS (
    SELECT vec_id, embedding, label FROM embeddings
    WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT {KNN_PANEL}
),
train AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 <> 0),
scored AS (
    SELECT t.vec_id AS qid, t.label AS true_label, r.label AS nbr_label,
           row_number() OVER (
               PARTITION BY t.vec_id
               ORDER BY floor({{cos}} * 1e6 + 0.5) DESC, r.vec_id
           ) AS rn
    FROM test t CROSS JOIN train r
),
votes AS (
    SELECT qid, true_label, nbr_label, count(*) AS v
    FROM scored WHERE rn <= {KNN_K}
    GROUP BY qid, true_label, nbr_label
),
pred AS (
    SELECT qid, true_label, nbr_label AS pred_label
    FROM (SELECT *, row_number() OVER (
              PARTITION BY qid ORDER BY v DESC, nbr_label) AS pr
          FROM votes)
    WHERE pr = 1
)
SELECT CAST(true_label AS BIGINT) AS true_label,
       CAST(pred_label AS BIGINT) AS pred_label,
       count(*)::BIGINT AS n
FROM pred GROUP BY 1, 2
""".format(cos="__COS__").replace(
    "__COS__", "(list_inner_product(t.embedding::DOUBLE[], r.embedding::DOUBLE[]) / "
    "(sqrt(list_inner_product(t.embedding::DOUBLE[], t.embedding::DOUBLE[])) * "
    "sqrt(list_inner_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[]))))"
)


def ml_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation (k={KNN_K}) on the embedding corpus: a
    deterministic hash split (vec_id % 5) carves test from train, a
    {KNN_PANEL}-query evaluation panel scores against every train vector
    by cosine (neighbor rank on the floor(cos·1e6+0.5) canonicalization,
    id tie-break — the argmax-over-floats discipline), the top-{KNN_K}
    labels vote with ties to the smaller label, and the output is the
    confusion-matrix rollup. Completes the classifier-eval family:
    nearest-centroid (parametric), naive Bayes (generative), kNN (lazy).

    Scale shape: the PANEL (constant rows) rides a broadcast against one
    corpus scan — per-query cost is one pass, the same contract as
    ann_topk_cosine; votes and the confusion rollup are panel-sized. A
    full-corpus kNN eval (every vector a query) is the all-pairs regime —
    that path goes through the IVF/LSH candidate indexes instead
    (ann_ivf_topk's blocking), not through this query.
    """
    from ..functions import vectors as V

    e = table(spark, sf_dir, "embeddings")
    test = (
        e.filter(F.col("vec_id") % 5 == 0)
        .orderBy("vec_id")
        .limit(KNN_PANEL)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.col("label").alias("true_label"),
        )
    )
    train = e.filter(F.col("vec_id") % 5 != 0)
    cos = V.cosine(F.col("qe"), F.col("embedding"))
    w_nbr = Window.partitionBy("qid").orderBy(
        F.floor(cos * 1e6 + 0.5).desc(), F.col("vec_id").asc()
    )
    scored = train.join(F.broadcast(test)).select(
        "qid",
        "true_label",
        F.col("label").alias("nbr_label"),
        F.row_number().over(w_nbr).alias("rn"),
    )
    votes = (
        scored.filter(F.col("rn") <= KNN_K)
        .groupBy("qid", "true_label", "nbr_label")
        .agg(F.count("*").alias("v"))
    )
    w_vote = Window.partitionBy("qid").orderBy(
        F.desc("v"), F.asc("nbr_label")
    )
    pred = (
        votes.select(
            "qid",
            "true_label",
            F.col("nbr_label").alias("pred_label"),
            F.row_number().over(w_vote).alias("pr"),
        )
        .filter(F.col("pr") == 1)
    )
    return pred.groupBy(
        F.col("true_label").cast("long").alias("true_label"),
        F.col("pred_label").cast("long").alias("pred_label"),
    ).agg(F.count("*").cast("long").alias("n"))


DRAFTS["ml_knn_label_eval"] = (ml_knn_label_eval, KNN_ORACLE)


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance (MMR) diversified top-k, 3 greedy rounds
# unrolled: relevance = query-term hits, redundancy penalty = token
# Jaccard against the already-selected set. The retrieval-diversification
# operator a RAG/training-data pipeline runs between "score" and "take" —
# plain top-k returns near-duplicates; MMR trades relevance for coverage.

MMR_TERMS = ("spark", "join", "window")
MMR_LAMBDA = 4.0

_MMR_REL = " + ".join(
    f"len(list_filter({_TOKS}, t -> t = '{w}'))" for w in MMR_TERMS
)

MMR_ORACLE = f"""
WITH rel AS (
    SELECT doc_id, ({_MMR_REL})::BIGINT AS rel FROM documents
),
pool AS (SELECT doc_id, rel FROM rel WHERE rel >= 1),
toks AS (
    SELECT DISTINCT d.doc_id, t.tok
    FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS t(tok)
    WHERE d.doc_id IN (SELECT doc_id FROM pool)
),
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM toks GROUP BY doc_id),
s1 AS (
    SELECT doc_id, rel FROM pool ORDER BY rel DESC, doc_id LIMIT 1
),
sim1 AS (
    SELECT p.doc_id, p.rel,
           coalesce(i.inter, 0)::DOUBLE
             / (z.sz + (SELECT sz FROM sz WHERE doc_id = (SELECT doc_id FROM s1))
                - coalesce(i.inter, 0))::DOUBLE AS j1
    FROM pool p
    JOIN sz z ON z.doc_id = p.doc_id
    LEFT JOIN (
        SELECT a.doc_id, count(*)::BIGINT AS inter
        FROM toks a JOIN toks b ON b.tok = a.tok
        WHERE b.doc_id = (SELECT doc_id FROM s1)
        GROUP BY a.doc_id
    ) i ON i.doc_id = p.doc_id
    WHERE p.doc_id <> (SELECT doc_id FROM s1)
),
s2 AS (
    SELECT doc_id, rel, rel - {MMR_LAMBDA} * j1 AS score
    FROM sim1
    ORDER BY floor((rel - {MMR_LAMBDA} * j1) * 1e6 + 0.5) DESC, doc_id
    LIMIT 1
),
sim2 AS (
    SELECT s.doc_id, s.rel, s.j1,
           coalesce(i.inter, 0)::DOUBLE
             / (z.sz + (SELECT sz FROM sz WHERE doc_id = (SELECT doc_id FROM s2))
                - coalesce(i.inter, 0))::DOUBLE AS j2
    FROM sim1 s
    JOIN sz z ON z.doc_id = s.doc_id
    LEFT JOIN (
        SELECT a.doc_id, count(*)::BIGINT AS inter
        FROM toks a JOIN toks b ON b.tok = a.tok
        WHERE b.doc_id = (SELECT doc_id FROM s2)
        GROUP BY a.doc_id
    ) i ON i.doc_id = s.doc_id
    WHERE s.doc_id <> (SELECT doc_id FROM s2)
),
s3 AS (
    SELECT doc_id, rel,
           rel - {MMR_LAMBDA} * greatest(j1, j2) AS score
    FROM sim2
    ORDER BY floor((rel - {MMR_LAMBDA} * greatest(j1, j2)) * 1e6 + 0.5) DESC,
             doc_id
    LIMIT 1
)
SELECT 1::BIGINT AS rank, CAST(doc_id AS BIGINT) AS doc_id,
       rel, {rfix_sql('rel::DOUBLE', 6)} AS mmr_score
FROM s1
UNION ALL
SELECT 2::BIGINT, CAST(doc_id AS BIGINT), rel, {rfix_sql('score', 6)} FROM s2
UNION ALL
SELECT 3::BIGINT, CAST(doc_id AS BIGINT), rel, {rfix_sql('score', 6)} FROM s3
"""


def text_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversified retrieval, three greedy
    rounds unrolled: relevance = occurrences of the query terms
    {MMR_TERMS}; each round picks argmax(rel − λ·max Jaccard(d, selected))
    with λ={MMR_LAMBDA}, ranked on the floor(score·1e6+0.5)
    canonicalization with doc_id tie-break (the argmax-over-floats
    discipline — Jaccard is a ratio of exact integers, so the score is
    bit-identical cross-engine). The diversification pass between
    retrieval and selection that keeps a RAG context window or a
    few-shot set from filling with near-duplicates of hit #1; the
    bounded-unroll contract of emb_kmeans_train_stats/ml_boosting_round.

    Scale shape: the candidate pool is relevance-filtered at the scan;
    each greedy round joins the pool's token sets against ONE selected
    document's token set (a 1-row-driven broadcast semi-join), so k
    rounds cost k token-set passes — never a pool×pool similarity join
    (that all-pairs regime belongs to dedup_prefix_filter_jaccard's
    blocked join).
    """
    from ..functions import text as T

    d = spread(table(spark, sf_dir, "documents"))

    def _eq(word: str):
        # single-arg lambda on purpose: a 2-arg lambda makes F.filter pass
        # the ARRAY INDEX as the second argument (PySpark HOF convention)
        return lambda t: t == F.lit(word)

    # Thin caller of operators/retrieval.mmr_select (r12 library
    # extraction, phase 5 — the library pins the loop-carried state per
    # round; unpinned, the scan+tokenize subtree re-evaluated 69x over
    # three rounds, measured round 8).
    #
    # r13 (guide §1.2/§4.2): tokenize ONCE into a pinned base frame.
    # The old shape evaluated the scan+tokenize subtree twice (pool pin
    # and toks pin inside mmr_select) and the regex tokenizer
    # len(MMR_TERMS)+1 times per row (one HOF filter per term, each
    # re-deriving the token array — HOFs are CodegenFallback, no CSE);
    # now the token array is materialized one time and rel counts read
    # it, and toks no longer needs the semi-join back against pool.
    from ..operators import retrieval
    from ..operators.iterative import pin

    rel_expr = sum(
        F.size(F.filter(F.col("_t"), _eq(w))) for w in MMR_TERMS
    )
    base = pin(
        d.select("doc_id", T.tokens("text").alias("_t"))
        .select("doc_id", rel_expr.cast("long").alias("rel"), "_t")
        .filter(F.col("rel") >= 1),
        label="mmr_base",
    )
    pool = base.select("doc_id", "rel")
    toks = base.select("doc_id", F.explode("_t").alias("tok")).distinct()
    return retrieval.mmr_select(pool, toks, rounds=3, lam=MMR_LAMBDA)


DRAFTS["text_mmr_diverse_topk"] = (text_mmr_diverse_topk, MMR_ORACLE)


# ---------------------------------------------------------------------------
# Binary-segmentation changepoint: the split day of the daily-revenue
# series that maximizes the between-segment SSE reduction — the greedy
# first step of binary segmentation (the offline counterpart of
# t20_cusum_daily_revenue's sequential detector). Prefix sums over the
# ordered day spine make every candidate split O(1).

CHANGEPOINT_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           {rfix_sql('sum(o_totalprice)', 2)} AS rev
    FROM orders GROUP BY 1
),
prefix AS (
    SELECT d, rev,
           row_number() OVER (ORDER BY d) AS i,
           sum(rev) OVER (ORDER BY d) AS cs
    FROM daily
),
-- tot := max(cs), NOT an unordered sum() OVER (): cs is a strictly
-- increasing ordered cumsum (rev > 0), so max(cs) IS the sequential
-- total in the same accumulation order on both engines — immune to
-- partial-aggregation ULP divergence (ADVICE r6 #2).
spine AS (
    SELECT d, rev, i, cs,
           count(*) OVER () AS n,
           max(cs) OVER () AS tot
    FROM prefix
),
scored AS (
    SELECT d, i, n,
           cs / i AS mean_before,
           (tot - cs) / (n - i) AS mean_after,
           cs * cs / i + (tot - cs) * (tot - cs) / (n - i)
             - tot * tot / n AS sse_red
    FROM spine WHERE i < n
)
SELECT strftime(d, '%Y-%m-%d') AS split_day,
       CAST(i AS BIGINT) AS n_days_before,
       CAST(n - i AS BIGINT) AS n_days_after,
       {rfix_sql('mean_before', 2)} AS mean_before,
       {rfix_sql('mean_after', 2)} AS mean_after,
       {rfix_sql('sse_red', 2)} AS sse_reduction
FROM scored
ORDER BY floor(sse_red * 100 + 0.5) DESC, d
LIMIT 1
"""


def t29_binary_segmentation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection, first binary-segmentation round:
    the split day of the daily-revenue series maximizing the
    between-segment SSE reduction n₁m₁² + n₂m₂² − nm² (equivalent to the
    two-segment least-squares fit; CUSUM's t20 twin detects the same
    shifts ONLINE). Daily revenue is canonicalized (rfix 2) before the
    prefix sums, so every downstream mean/score is arithmetic on
    bit-identical doubles in both engines, and the argmax ranks on the
    floor(·100+0.5) canonicalization with the day as tie-break. The
    grand total is derived as max(cs) over the ORDERED prefix (cs is
    strictly increasing since daily revenue > 0) rather than an
    unordered global sum, so tot is bit-identical to the oracle's
    sequential accumulation and the cancellation-heavy sse_red formula
    sees the same inputs on both engines (ADVICE r6 #2).

    Scale shape: one day-keyed fact collapse; ALL candidate splits are
    scored from prefix sums over the CALENDAR spine (one ordered
    window pass, O(days) rows) — never a per-split rescan; the argmax
    is orderBy+limit (TakeOrdered).
    """
    o = spread(table(spark, sf_dir, "orders"))
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        rfix(F.sum("o_totalprice"), 2).alias("rev")
    )
    w_ord = Window.orderBy("d")
    w_all = Window.partitionBy()
    prefix = daily.select(
        "d",
        F.row_number().over(w_ord).alias("i"),
        F.sum("rev").over(w_ord).alias("cs"),
    )
    # tot = max(cs): the sequential total in oracle accumulation order
    # (cs strictly increasing; see docstring / ADVICE r6 #2)
    spine = prefix.select(
        "d",
        "i",
        "cs",
        F.count("*").over(w_all).alias("n"),
        F.max("cs").over(w_all).alias("tot"),
    )
    i, cs, n, tot = F.col("i"), F.col("cs"), F.col("n"), F.col("tot")
    scored = spine.filter(i < n).select(
        "d",
        i,
        n,
        (cs / i).alias("mean_before"),
        ((tot - cs) / (n - i)).alias("mean_after"),
        (
            cs * cs / i + (tot - cs) * (tot - cs) / (n - i) - tot * tot / n
        ).alias("sse_red"),
    )
    return (
        scored.orderBy(
            F.floor(F.col("sse_red") * 100 + 0.5).desc(), F.col("d").asc()
        )
        .limit(1)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("split_day"),
            i.cast("long").alias("n_days_before"),
            (n - i).cast("long").alias("n_days_after"),
            rfix("mean_before", 2).alias("mean_before"),
            rfix("mean_after", 2).alias("mean_after"),
            rfix("sse_red", 2).alias("sse_reduction"),
        )
    )


DRAFTS["t29_binary_segmentation_split"] = (
    t29_binary_segmentation_split,
    CHANGEPOINT_ORACLE,
)


# ---------------------------------------------------------------------------
# Farthest-point (k-center / k-means++ style) seeding, 3 unrolled rounds:
# a deterministic, broadcast-argmax seed selector for the clustering
# family (emb_kmeans_* consume seeds; this picks SPREAD-OUT ones).

_FPS_D2 = (
    "(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[])"
    " - 2 * list_inner_product({a}::DOUBLE[], {b}::DOUBLE[])"
    " + list_inner_product({b}::DOUBLE[], {b}::DOUBLE[]))"
)

FPS_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
s1 AS (
    SELECT vec_id, embedding,
           list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS sc
    FROM e
    ORDER BY floor(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])
                   * 1e6 + 0.5) DESC, vec_id
    LIMIT 1
),
d1 AS (
    SELECT e.vec_id, e.embedding,
           {_FPS_D2.format(a='e.embedding', b='(SELECT embedding FROM s1)')} AS dd
    FROM e WHERE e.vec_id <> (SELECT vec_id FROM s1)
),
s2 AS (
    SELECT vec_id, embedding, dd AS sc FROM d1
    ORDER BY floor(dd * 1e6 + 0.5) DESC, vec_id LIMIT 1
),
d2 AS (
    SELECT d1.vec_id,
           least(d1.dd,
                 {_FPS_D2.format(a='d1.embedding', b='(SELECT embedding FROM s2)')})
               AS dd
    FROM d1 WHERE d1.vec_id <> (SELECT vec_id FROM s2)
),
s3 AS (
    SELECT vec_id, dd AS sc FROM d2
    ORDER BY floor(dd * 1e6 + 0.5) DESC, vec_id LIMIT 1
)
SELECT 1::BIGINT AS seed_rank, CAST((SELECT vec_id FROM s1) AS BIGINT) AS vec_id,
       {rfix_sql('(SELECT sc FROM s1)', 4)} AS score
UNION ALL
SELECT 2::BIGINT, CAST((SELECT vec_id FROM s2) AS BIGINT),
       {rfix_sql('(SELECT sc FROM s2)', 4)}
UNION ALL
SELECT 3::BIGINT, CAST((SELECT vec_id FROM s3) AS BIGINT),
       {rfix_sql('(SELECT sc FROM s3)', 4)}
"""


def emb_farthest_point_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point seeding (the deterministic k-center / k-means++
    ancestor), 3 rounds unrolled: seed 1 is the max-norm vector, each
    later seed the vector maximizing its minimum squared distance to the
    seeds so far — every argmax ranks on floor(score·1e6+0.5) with the
    vector id as tie-break (argmax-over-floats discipline; squared
    distances expand to inner products evaluated in index order on both
    engines). emb_kmeans_* consume seeds; this picks spread-out ones
    instead of the first K rows.

    Scale shape: each round is ONE corpus scan against a broadcast 1-row
    seed (TakeOrdered argmax, never a global sort); k rounds cost k
    scans. The classic k-means++ D² SAMPLING is this plan with the
    argmax replaced by a weighted draw (sample_weighted_topk's A-ES
    key) — the deterministic farthest-point form is what a
    hash-verifiable engine registers.
    """
    from ..functions import vectors as V

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def d2(a, b):
        return V.dot(a, a) - 2 * V.dot(a, b) + V.dot(b, b)

    def argmax(df, score_col):
        return (
            df.orderBy(
                F.floor(F.col(score_col) * 1e6 + 0.5).desc(),
                F.col("vec_id").asc(),
            )
            .limit(1)
        )

    norms = e.select("vec_id", "v", V.dot(F.col("v"), F.col("v")).alias("sc"))
    s1 = argmax(norms, "sc")
    d1 = (
        e.join(
            F.broadcast(s1.select(F.col("vec_id").alias("s1_id"), F.col("v").alias("s1_v"))),
            F.col("vec_id") != F.col("s1_id"),
        )
        .select("vec_id", "v", d2(F.col("v"), F.col("s1_v")).alias("dd"))
    )
    s2 = argmax(d1.withColumnRenamed("dd", "sc"), "sc").withColumnRenamed("sc", "dd")
    d2f = (
        d1.join(
            F.broadcast(s2.select(F.col("vec_id").alias("s2_id"), F.col("v").alias("s2_v"))),
            F.col("vec_id") != F.col("s2_id"),
        )
        .select(
            "vec_id",
            F.least(F.col("dd"), d2(F.col("v"), F.col("s2_v"))).alias("dd"),
        )
    )
    s3 = argmax(d2f.withColumnRenamed("dd", "sc"), "sc")
    out = (
        s1.select(F.lit(1).alias("r"), "vec_id", F.col("sc"))
        .unionByName(s2.select(F.lit(2).alias("r"), "vec_id", F.col("dd").alias("sc")))
        .unionByName(s3.select(F.lit(3).alias("r"), "vec_id", F.col("sc")))
    )
    return out.select(
        F.col("r").cast("long").alias("seed_rank"),
        F.col("vec_id").cast("long").alias("vec_id"),
        rfix("sc", 4).alias("score"),
    )


DRAFTS["emb_farthest_point_seeds"] = (emb_farthest_point_seeds, FPS_ORACLE)


# ---------------------------------------------------------------------------
# Majority-label propagation communities, 2 unrolled rounds — community
# detection next to the min-label CC operator (which finds CONNECTED
# components; label propagation finds DENSE ones on a connected graph).

_LP_EDGES = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*)::BIGINT AS w
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
    GROUP BY 1, 2
"""


def _lp_round_sql(labels: str, out: str) -> str:
    """One weighted-majority round: argmax_l Σ w over neighbor labels,
    ties to the smallest label, isolated nodes keep their own."""
    return f"""
tally_{out} AS (
    SELECT e.src AS node, lbl.label, sum(e.w)::BIGINT AS mass
    FROM sym e JOIN {labels} lbl ON lbl.node = e.dst
    GROUP BY e.src, lbl.label
),
win_{out} AS (
    SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                   ORDER BY mass DESC, label) AS rn
        FROM tally_{out}
    ) WHERE rn = 1
),
{out} AS (
    SELECT p.node, coalesce(w.label, p.label) AS label
    FROM {labels} p LEFT JOIN win_{out} w ON w.node = p.node
)
"""


LABELPROP_ORACLE = f"""
WITH e AS ({_LP_EDGES}),
sym AS (
    SELECT src, dst, w FROM e
    UNION ALL
    SELECT dst, src, w FROM e
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
{_lp_round_sql("l0", "l1")},
{_lp_round_sql("l1", "l2")}
SELECT CAST(label AS BIGINT) AS community,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(node) AS BIGINT) AS min_node
FROM l2 GROUP BY label
"""


def g_label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted majority label propagation (Raghavan et al. 2007), two
    synchronous rounds unrolled over the symmetrized nation trade graph:
    every node starts as its own label; each round it adopts the label
    with the greatest incident edge WEIGHT among its neighbors (ties to
    the smallest label — deterministic where classic LPA is random).
    Communities are the surviving labels, rolled up with sizes. The
    density-community member of the graph family: min-label CC
    (dedup_clusters) finds connectivity, LPA finds cohesion.

    Scale shape: the fact-scale edge derivation is pinned once
    (operators/iterative.pin); each round is one node-keyed tally
    aggregate + a bounded per-node argmax window + a left join — all
    node-scale, integer arithmetic end to end (weights are counts, so
    the majority vote is exact).
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = spread(table(spark, sf_dir, "lineitem"))
    s = table(spark, sf_dir, "supplier")
    e = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    # Thin caller of operators/graphalgs.label_propagation (r12 library
    # extraction — it pins the symmetrized edge list and runs the
    # tally/argmax rounds via checkpointed_loop).
    from ..operators import graphalgs

    # r14 (guide §1.2): symmetrize with one explode pass — the unionByName
    # form re-evaluated the fact-scale 4-table join + edge aggregate once
    # per orientation before label_propagation's pin could see it.
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst"), F.col("w")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
                ),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst", "ed.w")
    l2 = graphalgs.label_propagation(sym, rounds=2)
    return l2.groupBy(F.col("label").cast("long").alias("community")).agg(
        F.count("*").cast("long").alias("n_members"),
        F.min("node").cast("long").alias("min_node"),
    )


DRAFTS["g_label_propagation_communities"] = (
    g_label_propagation_communities,
    LABELPROP_ORACLE,
)


# ---------------------------------------------------------------------------
# Simpson's-paradox screen: pooled vs per-group OLS slope sign flips.
# The aggregation-bias diagnostic every observational rollup needs before
# anyone reads a trend off a pooled scatter.

SIMPSON_ORACLE = f"""
WITH pts AS (
    SELECT l_returnflag AS grp, l_quantity AS x,
           l_extendedprice * (1 - l_discount) AS y
    FROM lineitem
),
per_grp AS (
    SELECT grp, count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(x * y) AS sxy
    FROM pts GROUP BY grp
),
pooled AS (
    SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
           sum(sxx) AS sxx, sum(sxy) AS sxy
    FROM per_grp
)
SELECT g.grp AS l_returnflag,
       CAST(g.n AS BIGINT) AS n_rows,
       CASE WHEN g.n >= 2 AND g.n * g.sxx - g.sx * g.sx > 0 THEN
         {rfix_sql('(g.n * g.sxy - g.sx * g.sy) / (g.n * g.sxx - g.sx * g.sx)', 4)}
       END AS group_slope,
       CASE WHEN p.n >= 2 AND p.n * p.sxx - p.sx * p.sx > 0 THEN
         {rfix_sql('(p.n * p.sxy - p.sx * p.sy) / (p.n * p.sxx - p.sx * p.sx)', 4)}
       END AS pooled_slope,
       CASE WHEN g.n >= 2 AND g.n * g.sxx - g.sx * g.sx > 0
                 AND p.n >= 2 AND p.n * p.sxx - p.sx * p.sx > 0 THEN
         sign((g.n * g.sxy - g.sx * g.sy))
           <> sign((p.n * p.sxy - p.sx * p.sy))
       END AS sign_flipped
FROM per_grp g, pooled p
"""


def diag_simpsons_slope_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the OLS slope of net line revenue on
    quantity, per returnflag group AND pooled, with a flag for groups
    whose slope SIGN disagrees with the pooled trend — the
    aggregation-bias diagnostic that catches a pooled correlation
    reversing inside every stratum. Guarded moment arithmetic throughout
    (zero-variance or degenerate groups yield NULL, never a division
    error — the a_stats_aggregates ANSI rule); the flip test compares
    the sign of the covariance NUMERATOR (denominators are positive), so
    it is exact even where the slopes round.

    Scale shape: ONE group-keyed moment aggregate over the scan; the
    pooled moments are the SUM of the group moments (no second scan) and
    ride a broadcast back onto the 3 group rows.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )
    per_grp = pts.groupBy("grp").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    pooled = F.broadcast(
        per_grp.agg(
            F.sum("n").alias("pn"),
            F.sum("sx").alias("psx"),
            F.sum("sy").alias("psy"),
            F.sum("sxx").alias("psxx"),
            F.sum("sxy").alias("psxy"),
        )
    )
    g_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    g_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    p_num = F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    p_den = F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx")
    g_ok = (F.col("n") >= 2) & (g_den > 0)
    p_ok = (F.col("pn") >= 2) & (p_den > 0)
    return per_grp.crossJoin(pooled).select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").cast("long").alias("n_rows"),
        F.when(g_ok, rfix(g_num / g_den, 4)).alias("group_slope"),
        F.when(p_ok, rfix(p_num / p_den, 4)).alias("pooled_slope"),
        F.when(g_ok & p_ok, F.signum(g_num) != F.signum(p_num)).alias(
            "sign_flipped"
        ),
    )


DRAFTS["diag_simpsons_slope_flip"] = (
    diag_simpsons_slope_flip,
    SIMPSON_ORACLE,
)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier concentration per nation — the market-
# concentration index on exact line-count shares (integers end to end
# until the final share division).

HHI_ORACLE = f"""
WITH per_supp AS (
    SELECT s.s_nationkey AS nation, l.l_suppkey, count(*)::BIGINT AS c
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1, 2
),
tot AS (SELECT nation, sum(c)::BIGINT AS t, count(*)::BIGINT AS n_suppliers
        FROM per_supp GROUP BY nation)
SELECT CAST(p.nation AS BIGINT) AS nation,
       CAST(max(t.n_suppliers) AS BIGINT) AS n_suppliers,
       {rfix_sql('sum((p.c::DOUBLE / t.t::DOUBLE) * (p.c::DOUBLE / t.t::DOUBLE))', 6)}
           AS hhi
FROM per_supp p JOIN tot t ON t.nation = p.nation
GROUP BY p.nation
"""


def a_hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of line volume across suppliers
    within each nation: HHI = Σ share² over suppliers, share = that
    supplier's exact line COUNT over the nation total (integer counts, so
    each share is a deterministic division; 1/n_suppliers = perfectly
    competitive, 1.0 = monopoly). The market-structure member of the
    inequality family next to diag_gini_spend_by_nation (Gini ranks
    spend inequality; HHI squares volume shares).

    Scale shape: one (nation, supplier)-keyed collapse over the fact
    scan, a nation-keyed total join (supplier-dimension-sized frames),
    one nation rollup. No windows, no sorts.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    s = table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(F.count("*").alias("c"))
    )
    tot = per_supp.groupBy("nation").agg(
        F.sum("c").alias("t"), F.count("*").alias("n_suppliers")
    )
    share = F.col("c").cast("double") / F.col("t").cast("double")
    return (
        per_supp.join(tot, "nation")
        .groupBy(F.col("nation").cast("long").alias("nation"))
        .agg(
            F.max("n_suppliers").cast("long").alias("n_suppliers"),
            rfix(F.sum(share * share), 6).alias("hhi"),
        )
    )


DRAFTS["a_hhi_supplier_concentration"] = (
    a_hhi_supplier_concentration,
    HHI_ORACLE,
)


# ---------------------------------------------------------------------------
# Audio silence segmentation (VAD-lite): frame-level energy gating + run
# aggregation over REAL decoded WAV bytes — the segmentation pass between
# "decode" and "transcribe" in an audio training pipeline. The waveform
# is mm_wav_decode_features' closed form, so DuckDB reproduces frame
# energies and run structure arithmetically without seeing a byte.

WAV_FRAME = 16  # samples per frame
WAV_QUIET_MEAN_ABS = 3500  # frame is quiet iff sum|v| < T * frame_len (exact ints)

SILENCE_ORACLE = f"""
WITH s AS (
    SELECT doc_id, i,
           abs(((doc_id * 37 + i * 25) % 256 - 128) * 64)::BIGINT AS a
    FROM (
        SELECT doc_id, unnest(range(0, 32 + doc_id % 97)) AS i
        FROM documents
    )
),
frames AS (
    SELECT doc_id, i // {WAV_FRAME} AS f,
           count(*)::BIGINT AS flen, sum(a)::BIGINT AS sa
    FROM s GROUP BY doc_id, i // {WAV_FRAME}
),
flagged AS (
    SELECT doc_id, f, (sa < {WAV_QUIET_MEAN_ABS} * flen) AS quiet
    FROM frames
),
islands AS (
    SELECT doc_id, f,
           f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
    FROM flagged WHERE quiet
),
runs AS (
    SELECT doc_id, grp, count(*)::BIGINT AS run_len
    FROM islands GROUP BY doc_id, grp
),
per_doc AS (
    SELECT fl.doc_id,
           count(*)::BIGINT AS n_frames,
           sum(CASE WHEN fl.quiet THEN 1 ELSE 0 END)::BIGINT AS n_quiet
    FROM flagged fl GROUP BY fl.doc_id
)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       p.n_frames, p.n_quiet,
       CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_quiet_runs,
       CAST(coalesce(r.max_run, 0) AS BIGINT) AS max_quiet_run
FROM per_doc p
LEFT JOIN (
    SELECT doc_id, count(*)::BIGINT AS n_runs, max(run_len)::BIGINT AS max_run
    FROM runs GROUP BY doc_id
) r ON r.doc_id = p.doc_id
"""


def mm_wav_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation over decoded audio (VAD-lite): synthesize each
    document's deterministic PCM16 waveform, encode to true RIFF/WAV,
    decode with the stdlib codec, gate {WAV_FRAME}-sample frames on an
    EXACT integer energy test (Σ|v| < {WAV_QUIET_MEAN_ABS}·frame_len —
    no float thresholding to disagree across engines), and aggregate the
    quiet frames into runs: count, number of contiguous segments, and
    the longest one. This is the segmentation stage an audio ingest
    pipeline runs between decode and feature extraction (trim silence,
    split on pauses); the closed-form waveform means the oracle rebuilds
    frame energies and the gaps-and-islands run structure without ever
    seeing a byte — the full-hash gate proves encoder, transport,
    decoder, AND the run logic.

    Scale shape: one Arrow-batched mapInPandas kernel per document row
    (payloads never leave the executor, the per-doc run scan is a local
    O(frames) loop — no per-frame shuffle); the registered result is one
    fixed-width row per document, nothing else moves.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as S

    from ..multimodal.wav import decode_wav_pcm16, encode_wav_pcm16

    out_schema = S.StructType(
        [
            S.StructField("doc_id", S.LongType()),
            S.StructField("n_frames", S.LongType()),
            S.StructField("n_quiet", S.LongType()),
            S.StructField("n_quiet_runs", S.LongType()),
            S.StructField("max_quiet_run", S.LongType()),
        ]
    )

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "n_frames", "n_quiet", "n_quiet_runs", "max_quiet_run")}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 32 + d % 97
                samples = (
                    (d * 37 + np.arange(n, dtype=np.int64) * 25) % 256 - 128
                ) * 64
                _rate, decoded = decode_wav_pcm16(
                    encode_wav_pcm16(samples, sample_rate=8000)
                )
                a = np.abs(np.asarray(decoded, dtype=np.int64))
                n_frames = (len(a) + WAV_FRAME - 1) // WAV_FRAME
                quiet = []
                for f in range(n_frames):
                    chunk = a[f * WAV_FRAME:(f + 1) * WAV_FRAME]
                    quiet.append(
                        int(chunk.sum()) < WAV_QUIET_MEAN_ABS * len(chunk)
                    )
                n_quiet = sum(quiet)
                n_runs = sum(
                    1 for f, q in enumerate(quiet) if q and (f == 0 or not quiet[f - 1])
                )
                max_run = run = 0
                for q in quiet:
                    run = run + 1 if q else 0
                    max_run = max(max_run, run)
                rows["doc_id"].append(d)
                rows["n_frames"].append(n_frames)
                rows["n_quiet"].append(n_quiet)
                rows["n_quiet_runs"].append(n_runs)
                rows["max_quiet_run"].append(max_run)
            yield pd.DataFrame(rows)

    base = table(spark, sf_dir, "documents")
    from ..sources.tables import inherit_scan_key

    docs = spread(
        inherit_scan_key(base.select(F.col("doc_id").cast("long")), base)
    )
    return docs.mapInPandas(segment, out_schema)


DRAFTS["mm_wav_silence_segments"] = (mm_wav_silence_segments, SILENCE_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q4 shape on this schema: order-priority checking — orders in a
# quarter with at least one LATE line (shipped > 90 days after the order
# date), the canonical decorrelated-EXISTS + rollup.

Q4_START = "1996-01-01"
Q4_END = "1996-04-01"
Q4_LATE_DAYS = 90

Q4_ORACLE = f"""
SELECT o_orderpriority,
       count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND CAST(l.l_shipdate AS DATE)
            > CAST(o.o_orderdate AS DATE) + {Q4_LATE_DAYS}
  )
GROUP BY o_orderpriority
"""


def j23_late_orders_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted to this schema (lineitem has no commit/receipt
    dates, so "late" = a line shipped more than {Q4_LATE_DAYS} days after
    the order date): count the quarter's orders per priority having at
    least one late line — the canonical correlated-EXISTS, decorrelated
    to a LEFT SEMI join. Rounds out the TPC-H composition set
    (Q1/Q15/Q17/Q21/Q22 shapes are j17/j18/j20/j22/q1).

    Scale shape: the quarter filter is PUSHED to the orders scan; the
    EXISTS compiles to one semi join keyed on orderkey (the lateness
    predicate rides inside the join condition, so lineitem needs no
    pre-aggregation); the rollup is a 5-row map-side-partial aggregate.
    """
    o = spread(table(spark, sf_dir, "orders")).filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    li = spread(table(spark, sf_dir, "lineitem"))
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            F.to_date("l_shipdate")
            > F.date_add(F.to_date("o_orderdate"), Q4_LATE_DAYS)
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("order_count")
    )


DRAFTS["j23_late_orders_q4"] = (j23_late_orders_q4, Q4_ORACLE)


# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) between two order-priority groups —
# the nonparametric two-sample test next to Welch's t (a_welch_ttest),
# built on EXACT midranks from a value-domain collapse scanned by the
# distributed prefix-sum operator (operators/ranks.exact_prefix_sum), so
# no un-partitioned window ever sees the value domain.

MWU_A = "1-URGENT"
MWU_B = "5-LOW"

MWU_ORACLE = f"""
WITH pts AS (
    SELECT o_totalprice AS v,
           CASE WHEN o_orderpriority = '{MWU_A}' THEN 1 ELSE 0 END AS a
    FROM orders WHERE o_orderpriority IN ('{MWU_A}', '{MWU_B}')
),
byv AS (
    SELECT v, sum(a)::BIGINT AS ca, sum(1 - a)::BIGINT AS cb
    FROM pts GROUP BY v
),
cum AS (
    SELECT v, ca, cb,
           coalesce(sum(ca + cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS less
    FROM byv
),
ranked AS (
    SELECT ca, cb,
           less + (ca + cb + 1) / 2.0 AS midrank
    FROM cum
),
stats AS (
    SELECT sum(ca * midrank) AS ra,
           (SELECT sum(ca) FROM byv)::BIGINT AS na,
           (SELECT sum(cb) FROM byv)::BIGINT AS nb
    FROM ranked
)
SELECT na, nb,
       {rfix_sql('ra - na * (na + 1) / 2.0', 1)} AS u_a,
       {rfix_sql(
           '(ra - na * (na + 1) / 2.0 - na * nb / 2.0)'
           ' / sqrt(na::DOUBLE * nb * (na + nb + 1) / 12.0)', 4
       )} AS z_score
FROM stats
"""


def a_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing order values between
    the '{MWU_A}' and '{MWU_B}' priorities — the nonparametric member of
    the two-sample family (a_welch_ttest_priorities assumes normality;
    this ranks). Midranks are exact: collapse to the VALUE domain with
    per-group counts, get the strictly-less row count from the
    distributed prefix-sum operator (operators/ranks.exact_prefix_sum —
    range-partitioned, no single task ever sorts the value domain), and
    midrank = less + (ties+1)/2, a half-integer. ΣR and U stay exactly
    representable, so only the z-score needs rfix.

    Scale shape: one value-keyed collapse over the scan, then the
    prefix-sum pass (range exchange + pid-local window + broadcast
    offsets) — the value domain never funnels through one partition,
    unlike the textbook rank() OVER (ORDER BY v) formulation.
    """
    from ..operators.ranks import exact_prefix_sum

    o = spread(table(spark, sf_dir, "orders")).filter(
        F.col("o_orderpriority").isin([MWU_A, MWU_B])
    )
    byv = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.sum((F.col("o_orderpriority") == MWU_A).cast("long")).alias("ca"),
        F.sum((F.col("o_orderpriority") == MWU_B).cast("long")).alias("cb"),
    )
    cum = exact_prefix_sum(
        byv.withColumn("cab", F.col("ca") + F.col("cb")),
        "v",
        "cab",
        out_col="less",
    )
    ranked = cum.select(
        "ca",
        "cb",
        (F.col("less") + (F.col("ca") + F.col("cb") + 1) / 2.0).alias("midrank"),
    )
    # Totals from the PINNED prefix frame (r13, guide §1.2): aggregating
    # `byv` here re-evaluated the whole orders-scan + value-collapse
    # subtree a second time just for the 1-row (na, nb).
    tot = F.broadcast(
        cum.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    )
    ra = F.sum(F.col("ca") * F.col("midrank"))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    u_a = F.col("ra") - na * (na + 1) / 2.0
    return (
        ranked.agg(ra.alias("ra"))
        .crossJoin(tot)
        .select(
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            rfix(u_a, 1).alias("u_a"),
            rfix(
                (F.col("ra") - na * (na + 1) / 2.0 - na * nb / 2.0)
                / F.sqrt(na * nb * (na + nb + 1) / 12.0),
                4,
            ).alias("z_score"),
        )
    )


DRAFTS["a_mann_whitney_u"] = (a_mann_whitney_u, MWU_ORACLE)


# ---------------------------------------------------------------------------
# Embedding alignment margin: mean intra-label vs inter-label cosine over
# a deterministic panel — the representation-quality eval (does the
# embedding place same-label points closer?) that complements the
# classifier evals (kNN / centroid / Bayes measure downstream accuracy;
# this measures the geometry itself).

MARGIN_PANEL = 64

MARGIN_ORACLE = f"""
WITH p AS (
    SELECT vec_id, embedding, label FROM embeddings
    WHERE vec_id < {MARGIN_PANEL}
),
pairs AS (
    SELECT (a.label = b.label) AS same,
           (list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
            (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))))
               AS c
    FROM p a JOIN p b ON a.vec_id < b.vec_id
)
SELECT CAST(sum(CASE WHEN same THEN 1 ELSE 0 END) AS BIGINT) AS n_intra_pairs,
       CAST(sum(CASE WHEN same THEN 0 ELSE 1 END) AS BIGINT) AS n_inter_pairs,
       {rfix_sql('avg(CASE WHEN same THEN c END)', 6)} AS intra_cosine,
       {rfix_sql('avg(CASE WHEN NOT same THEN c END)', 6)} AS inter_cosine,
       {rfix_sql('avg(CASE WHEN same THEN c END)'
                 ' - avg(CASE WHEN NOT same THEN c END)', 6)} AS margin
FROM pairs
"""


def emb_intra_inter_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space alignment margin over a {MARGIN_PANEL}-vector
    panel: mean cosine between SAME-label pairs minus mean cosine between
    DIFFERENT-label pairs. Positive margin = the space clusters by label
    (the geometric precondition the kNN / nearest-centroid evals depend
    on); this is the alignment half of the alignment/uniformity
    representation diagnostics, hash-checkable because it is pure pair
    arithmetic.

    Scale shape: the panel is constant-sized and rides a broadcast
    self-join (C({MARGIN_PANEL},2) pairs — bounded, never corpus×corpus);
    one global aggregate rolls the margins up. Per-pair cosines are
    index-ordered inner products (deterministic); the pair averages are
    canonicalized at the output boundary.
    """
    from ..functions import vectors as V

    p = table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < MARGIN_PANEL
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"), "label")
    a = p.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("label").alias("la")
    )
    b = p.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("label").alias("lb")
    )
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        (F.col("la") == F.col("lb")).alias("same"),
        V.cosine(F.col("va"), F.col("vb")).alias("c"),
    )
    intra = F.avg(F.when(F.col("same"), F.col("c")))
    inter = F.avg(F.when(~F.col("same"), F.col("c")))
    return pairs.agg(
        F.sum(F.col("same").cast("long")).alias("n_intra_pairs"),
        F.sum((~F.col("same")).cast("long")).alias("n_inter_pairs"),
        rfix(intra, 6).alias("intra_cosine"),
        rfix(inter, 6).alias("inter_cosine"),
        rfix(intra - inter, 6).alias("margin"),
    ).select(
        F.col("n_intra_pairs").cast("long").alias("n_intra_pairs"),
        F.col("n_inter_pairs").cast("long").alias("n_inter_pairs"),
        "intra_cosine",
        "inter_cosine",
        "margin",
    )


DRAFTS["emb_intra_inter_margin"] = (emb_intra_inter_margin, MARGIN_ORACLE)


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between source unigram distributions — the
# symmetric, bounded distribution distance for "which ingest feeds differ
# in CONTENT?" (text_ks_length_drift compares length SHAPES; this
# compares token usage).

JSD_ORACLE = f"""
WITH tok AS (
    SELECT source, unnest({_TOKS}) AS w FROM documents
),
cnt AS (SELECT source, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT source, sum(c)::BIGINT AS t FROM cnt GROUP BY source),
srcs AS (SELECT DISTINCT source FROM cnt),
prs AS (
    SELECT a.source AS s1, b.source AS s2
    FROM srcs a JOIN srcs b ON a.source < b.source
),
grid AS (
    SELECT p.s1, p.s2, c.w,
           sum(CASE WHEN c.source = p.s1 THEN c.c ELSE 0 END)::BIGINT AS c1,
           sum(CASE WHEN c.source = p.s2 THEN c.c ELSE 0 END)::BIGINT AS c2
    FROM prs p JOIN cnt c ON c.source IN (p.s1, p.s2)
    GROUP BY p.s1, p.s2, c.w
),
terms AS (
    SELECT g.s1, g.s2,
           g.c1::DOUBLE / t1.t AS p,
           g.c2::DOUBLE / t2.t AS q
    FROM grid g
    JOIN tot t1 ON t1.source = g.s1
    JOIN tot t2 ON t2.source = g.s2
)
SELECT s1, s2,
       {rfix_sql(
           "sum(CASE WHEN p > 0 THEN 0.5 * p * ln(2 * p / (p + q)) ELSE 0 END)"
           " + sum(CASE WHEN q > 0 THEN 0.5 * q * ln(2 * q / (p + q)) ELSE 0 END)",
           6,
       )} AS jsd_nats
FROM terms GROUP BY s1, s2
"""


def text_jsd_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats) between the unigram
    distributions of every pair of sources: JSD(P,Q) = ½KL(P‖M) +
    ½KL(Q‖M), M = ½(P+Q) — symmetric, bounded by ln 2, zero iff the
    sources use tokens identically. The content-drift companion to
    text_ks_length_drift (shape) and diag_psi_priority_drift (bins);
    a curation pipeline thresholds it to detect a feed that changed
    register or language mix.

    Scale shape: ONE (source, token) collapse over the corpus; the
    source-pair grid joins that vocab-sized frame against the broadcast
    pair list (pairs are |sources|², sources are dimension-bounded), and
    each pair's JSD is a map-side-combinable sum. Tokens absent from one
    side contribute their exact ½p·ln2 term via the CASE guards — no
    smoothing, no epsilon.
    """
    from ..functions import text as T

    d = spread(table(spark, sf_dir, "documents"))
    # r14 (guide §1.2): pin the (source, token) collapse — it feeds the
    # per-source totals, the source list (twice, via the pair self-join)
    # and the pair grid, so unpinned the corpus-wide tokenize + count
    # subtree ran 4x (5 parquet scans in the before-plan). The frame is
    # vocab x sources — bounded by the same Heaps-law argument as the
    # freq broadcasts.
    from ..operators.iterative import pin

    cnt = pin(
        d.select("source", F.explode(T.tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c")),
        label="jsd_counts",
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    srcs = cnt.select("source").distinct()
    prs = (
        srcs.select(F.col("source").alias("s1"))
        .join(srcs.select(F.col("source").alias("s2")), F.col("s1") < F.col("s2"))
    )
    grid = (
        cnt.join(
            F.broadcast(prs),
            (F.col("source") == F.col("s1")) | (F.col("source") == F.col("s2")),
        )
        .groupBy("s1", "s2", "w")
        .agg(
            F.sum(F.when(F.col("source") == F.col("s1"), F.col("c")).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("source") == F.col("s2"), F.col("c")).otherwise(0)).alias("c2"),
        )
    )
    terms = (
        grid.join(F.broadcast(tot.select(F.col("source").alias("s1"), F.col("t").alias("t1"))), "s1")
        .join(F.broadcast(tot.select(F.col("source").alias("s2"), F.col("t").alias("t2"))), "s2")
        .select(
            "s1",
            "s2",
            (F.col("c1").cast("double") / F.col("t1")).alias("p"),
            (F.col("c2").cast("double") / F.col("t2")).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    jsd = F.sum(
        F.when(p > 0, 0.5 * p * F.log(2 * p / (p + q))).otherwise(0.0)
    ) + F.sum(F.when(q > 0, 0.5 * q * F.log(2 * q / (p + q))).otherwise(0.0))
    return terms.groupBy("s1", "s2").agg(rfix(jsd, 6).alias("jsd_nats"))


DRAFTS["text_jsd_source_pairs"] = (text_jsd_source_pairs, JSD_ORACLE)
