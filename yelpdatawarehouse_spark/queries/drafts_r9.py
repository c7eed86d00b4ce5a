"""Round-9 drafts (written late in round 6; registered immediately via
queries/draft_layer.register_all — the _prioritize window reserve queues
them behind the earlier never-verified cohorts, so registration order is
evidence order, not a displacement risk).

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT, floats through rfix, unordered float sums
canonicalized, argmax-over-floats ranked on floor(x*10^n+0.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.presentation import rfix, rfix_sql
from ..sources.tables import spread, table

DRAFTS: dict = {}


# ---------------------------------------------------------------------------
# Rolling 7-day correlation between daily order count and daily revenue —
# the co-movement monitor over the calendar spine (w6 does a rolling
# MEAN; ACF does lagged self-correlation; this is the rolling CROSS
# correlation with the guarded-moment discipline).

ROLLCORR_WIN = 7

ROLLCORR_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           count(*)::DOUBLE AS x,
           {rfix_sql('sum(o_totalprice)', 2)} AS y
    FROM orders GROUP BY 1
),
rolled AS (
    SELECT d,
           count(*) OVER w AS n,
           sum(x) OVER w AS sx, sum(y) OVER w AS sy,
           sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
           sum(x * y) OVER w AS sxy
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN {ROLLCORR_WIN - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n_days,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN {rfix_sql(
                '(n * sxy - sx * sy) / '
                '(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))', 4)}
       END AS roll_corr
FROM rolled
"""


def t32_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {ROLLCORR_WIN}-day Pearson correlation between daily order
    COUNT and daily REVENUE — "are volume and value still moving
    together?", the windowed co-movement monitor next to the rolling mean
    (w6) and the autocorrelation profile (t19). Daily revenue is
    canonicalized before the window (rfix 2 — the float-parity move), so
    the rolling moments are arithmetic on bit-identical doubles; the
    correlation itself is guarded moment arithmetic (zero-variance
    windows yield NULL, never a division error).

    Scale shape: ONE day-keyed fact collapse; all six rolling moments
    share a single ordered window pass over the CALENDAR spine
    (~2.4k rows — bounded by the date span, never by order count).
    """
    o = spread(table(spark, sf_dir, "orders"))
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").cast("double").alias("x"),
        rfix(F.sum("o_totalprice"), 2).alias("y"),
    )
    w = Window.orderBy("d").rowsBetween(-(ROLLCORR_WIN - 1), 0)
    x, y = F.col("x"), F.col("y")
    rolled = daily.select(
        "d",
        F.count("*").over(w).alias("n"),
        F.sum(x).over(w).alias("sx"),
        F.sum(y).over(w).alias("sy"),
        F.sum(x * x).over(w).alias("sxx"),
        F.sum(y * y).over(w).alias("syy"),
        F.sum(x * y).over(w).alias("sxy"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return rolled.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_days"),
        F.when(
            (F.col("n") >= 2) & (vx > 0) & (vy > 0),
            rfix(cov / (F.sqrt(vx) * F.sqrt(vy)), 4),
        ).alias("roll_corr"),
    )


DRAFTS["t32_rolling_correlation"] = (t32_rolling_correlation, ROLLCORR_ORACLE)


# ---------------------------------------------------------------------------
# Local clustering coefficient over the co-purchase part graph — the
# closure metric that turns g_triangle_support's raw triangle counts into
# the comparable [0,1] "how clique-like is this node's neighborhood".

_CC_EDGE_SQL = """
edges AS (
    SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
                    greatest(c.c_nationkey, s.s_nationkey) AS b
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
)
"""

CLUSTCOEF_ORACLE = f"""
WITH {_CC_EDGE_SQL},
tri AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
tri_per_node AS (
    SELECT node, count(*)::BIGINT AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY node
),
deg AS (
    SELECT node, count(*)::BIGINT AS d FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
    ) GROUP BY node
)
SELECT CAST(deg.node AS BIGINT) AS node,
       deg.d AS degree,
       CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
       CASE WHEN deg.d >= 2 THEN {rfix_sql(
           '2.0 * coalesce(t.t, 0) / (deg.d * (deg.d - 1))', 4)}
       END AS clustering_coef
FROM deg LEFT JOIN tri_per_node t ON t.node = deg.node
"""


def g_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per nation on the undirected trade
    graph: C(v) = 2·triangles(v) / (deg(v)·(deg(v)−1)) — the [0,1]
    neighborhood-closure metric (g_triangle_support's raw counts made
    comparable across nodes; degree-1 nodes yield NULL, the guarded-
    division rule). Triangles are enumerated once over the canonical
    a<b<c orientation and credited to all three corners — exact integer
    arithmetic until the final ratio.

    Scale shape: the fact-scale edge derivation collapses to the
    DISTINCT node-pair edge list (dimension-bounded here; on fact-sized
    graphs this is j5's basket expansion); the triangle join and both
    rollups are edge-scale. Same plan family as g_triangle_support with
    one extra degree aggregate + left join.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = spread(table(spark, sf_dir, "lineitem"))
    s = table(spark, sf_dir, "supplier")
    # Thin caller of operators/graphalgs.clustering_coefficient (r12
    # library extraction — the library pins the oriented edge list and
    # keeps the exact-integer-until-the-final-ratio discipline).
    from ..operators import graphalgs

    oriented = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
    )
    return graphalgs.clustering_coefficient(oriented, digits=4)


DRAFTS["g_clustering_coefficient"] = (
    g_clustering_coefficient,
    CLUSTCOEF_ORACLE,
)


# ---------------------------------------------------------------------------
# Inverse-frequency class-balance weights over the labeled embedding
# corpus — the reweighting table a training pipeline joins onto its
# sampler when labels are skewed (the weights side of sample_weighted_*).

CLASSW_ORACLE = f"""
WITH per_label AS (
    SELECT label, count(*)::BIGINT AS n FROM embeddings GROUP BY label
),
tot AS (SELECT sum(n)::BIGINT AS nt, count(*)::BIGINT AS k FROM per_label)
SELECT CAST(label AS BIGINT) AS label,
       n AS n_vectors,
       {rfix_sql('n::DOUBLE / nt::DOUBLE', 6)} AS frequency,
       {rfix_sql('nt::DOUBLE / (k::DOUBLE * n::DOUBLE)', 6)} AS class_weight
FROM per_label, tot
"""


def sample_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class-balance weights: w(label) = N / (K·n_label)
    — the standard balanced-sampling/loss-reweighting table (weights
    average to 1 over the corpus, so the effective epoch size is
    unchanged). The LABEL-side companion of sample_weighted_topk /
    sample_weighted_mix, which consume per-row weights; a skewed-label
    corpus joins this table on label to get them. Exact integer counts;
    the two divisions are the only float ops.

    Scale shape: one label-keyed collapse (map-side combinable over a
    label-bounded domain) + a 1-row total broadcast. Nothing else moves.
    """
    e = table(spark, sf_dir, "embeddings")
    per_label = e.groupBy("label").agg(F.count("*").alias("n"))
    tot = F.broadcast(
        per_label.agg(F.sum("n").alias("nt"), F.count("*").alias("k"))
    )
    n, nt, k = F.col("n"), F.col("nt"), F.col("k")
    return per_label.crossJoin(tot).select(
        F.col("label").cast("long").alias("label"),
        n.cast("long").alias("n_vectors"),
        rfix(n.cast("double") / nt.cast("double"), 6).alias("frequency"),
        rfix(
            nt.cast("double") / (k.cast("double") * n.cast("double")), 6
        ).alias("class_weight"),
    )


DRAFTS["sample_class_weights"] = (sample_class_weights, CLASSW_ORACLE)


# ---------------------------------------------------------------------------
# Pareto 80/20 concentration: how many customers produce 80% of revenue?
# Exact, scan-scalable answer via value-domain collapse + the distributed
# prefix-sum operator — no global sort of the customer dimension.

PARETO_TARGET = 0.8

PARETO_ORACLE = f"""
WITH spend AS (
    -- cents per ROW, then an integer sum (order-independent): a float
    -- sum rounded to cents diverges between engines when a customer's
    -- total lands on the .xx5 boundary (hit at sf0.1, round 8)
    SELECT o_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS s_c
    FROM orders GROUP BY o_custkey
),
byv AS (
    SELECT s_c, count(*)::BIGINT AS c, CAST(sum(s_c) AS BIGINT) AS rev
    FROM spend GROUP BY s_c
),
cum AS (
    SELECT s_c, c, rev,
           CAST(coalesce(sum(rev) OVER (ORDER BY s_c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS rev_above,
           CAST(coalesce(sum(c) OVER (ORDER BY s_c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cnt_above
    FROM byv
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT) AS t
        FROM byv),
boundary AS (
    -- target = 0.8*t cents; compare in integers: 5*rev_above < 4*t
    SELECT cum.*, tot.n, tot.t
    FROM cum, tot
    WHERE 5 * cum.rev_above < 4 * tot.t
      AND 5 * (cum.rev_above + cum.rev) >= 4 * tot.t
),
ans AS (
    -- k = cnt_above + ceil((0.8t - rev_above)/s_c)
    --   = cnt_above + ceildiv(4t - 5*rev_above, 5*s_c), all integers
    SELECT n,
           cnt_above + (4 * t - 5 * rev_above + 5 * s_c - 1) // (5 * s_c)
             AS k
    FROM boundary
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS n_top_customers,
       {rfix_sql('k::DOUBLE / n::DOUBLE', 6)} AS customer_share,
       {rfix_sql(str(PARETO_TARGET), 6)} AS revenue_share_target
FROM ans
"""


def a_pareto_8020_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the EXACT minimum number of top-spending
    customers whose combined revenue reaches {PARETO_TARGET:.0%} of the
    total — "do 20% of customers drive 80% of revenue?" as one row
    (n_customers, n_top_customers, customer_share). The classic
    formulation sorts the whole customer dimension and scans the running
    total; here the customer rollup collapses to the SPEND-VALUE domain
    (per-value customer counts + revenue mass), the descending running
    totals come from operators/ranks.exact_prefix_sum (range-partitioned
    — no single task ever sorts the domain), and the boundary value's
    partial count is closed-form ceil arithmetic, so ties at the cutoff
    are handled exactly.

    Float discipline (ADVICE r6 #1; tightened r8): each order converts to
    EXACT CENTS at the ROW level (2-decimal money is exact under
    floor(x*100+0.5)), so the per-customer spend is an INTEGER sum —
    order-independent by construction. (The earlier float-sum-then-round
    form diverged from the oracle at sf0.1 when a customer's total
    landed on the .xx5 boundary under a different partial-aggregation
    order.) Every accumulation, prefix sum, boundary comparison, and the
    ceil-div that yields n_top_customers is integer arithmetic, bit-equal
    to the oracle regardless of partition regrouping inside
    exact_prefix_sum. 0.8*t is compared as 5*x vs 4*t
    and the ceil is an integer ceildiv — no float ever touches the
    boundary decision. Doubles appear only in the final ratio columns.
    Range note: long cents hold up to ~$9.2e16 total revenue (beyond a
    100 TB orders fact); past that, lift the sums to decimal(38,0) —
    the operator is type-generic.

    Scale shape: one custkey collapse (fact exchange), one value
    collapse, then the prefix-sum pass (range exchange + pid-local
    windows + broadcast offsets) and a 1-row boundary filter. Nothing
    fact-scale is ever globally sorted.
    """
    from ..operators.ranks import exact_prefix_sums

    o = spread(table(spark, sf_dir, "orders"))
    # exact cents per ROW (2-decimal money converts exactly), THEN an
    # integer sum — the float-sum-then-round form diverged from the
    # oracle at sf0.1 when a customer total hit the .xx5 boundary
    # (partial-aggregation order differs between engines; caught by the
    # round-8 sf0.1 headline parity sweep)
    row_cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    spend = o.groupBy("o_custkey").agg(F.sum(row_cents).alias("s_c"))
    byv = spend.groupBy("s_c").agg(
        F.count("*").alias("c"), F.sum("s_c").alias("rev")
    )
    # descending order = ascending on the negated key. BOTH running
    # totals come from ONE range pass (r13, guide §1.2/§2.2: the chained
    # two-call form paid the range exchange + eager pin twice for the
    # same ordering), and the grand totals aggregate the PINNED prefix
    # frame — the fact-scan subtree (orders → spend → byv) used to be
    # re-evaluated just to produce the 1-row total.
    byv_neg = byv.withColumn("neg_s", -F.col("s_c"))
    cum = exact_prefix_sums(
        byv_neg, "neg_s", [("rev", "rev_above"), ("c", "cnt_above")]
    )
    tot = F.broadcast(
        cum.agg(F.sum("c").alias("n"), F.sum("rev").alias("t"))
    )
    t4 = F.lit(4) * F.col("t")
    boundary = (
        cum.crossJoin(tot)
        .filter(
            (F.lit(5) * F.col("rev_above") < t4)
            & (F.lit(5) * (F.col("rev_above") + F.col("rev")) >= t4)
        )
    )
    # integer ceildiv((4t - 5*rev_above), 5*s_c); `div` is long division
    k = F.col("cnt_above") + F.expr(
        "(4*t - 5*rev_above + 5*s_c - 1) div (5*s_c)"
    )
    return boundary.select(
        F.col("n").cast("long").alias("n_customers"),
        k.cast("long").alias("n_top_customers"),
        rfix(k.cast("double") / F.col("n").cast("double"), 6).alias(
            "customer_share"
        ),
        rfix(F.lit(PARETO_TARGET), 6).alias("revenue_share_target"),
    )


DRAFTS["a_pareto_8020_concentration"] = (
    a_pareto_8020_concentration,
    PARETO_ORACLE,
)
