"""Approximate (sketch) aggregates and multi-set grouping surfaces.

Sketches are the scale path for cardinality/quantile questions: an exact
``count(DISTINCT x)`` over 100 TB shuffles every distinct key once, while a
HyperLogLog++ sketch is a fixed few-KB buffer per group, mergeable map-side
(partial aggregation), so the shuffle carries sketches instead of keys.
Likewise ``approx_percentile`` (KLL/GK-style) replaces a full sort with a
bounded-memory mergeable summary.

Approximation needs its own correctness contract: the driver's oracle gate
compares value hashes, and a sketch's raw output is not bit-reproducible
across engines. These queries therefore return the EXACT value (independently
computed) plus a BOOLEAN asserting the sketch landed inside its documented
error envelope; the oracle computes the same exact value and asserts literal
TRUE. The gate then verifies both that the exact path matches DuckDB and
that the sketch's error bound held — which is precisely the guarantee a user
of the approximate operator relies on.

Reference analog: the reference has no approximate aggregates (every
COUNT(DISTINCT ...) is exact, e.g. webapp/mysql_routes.py user stats); these
are beyond-reference scale operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.presentation import rfix, rfix_sql
from ..sources.tables import spread, table
from .registry import register


@register(
    "a_approx_distinct_check",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_uniques,
           TRUE AS hll_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("SKETCH", "A8"),
)
def a_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct buyers per order priority, exact AND via HyperLogLog++
    (``approx_count_distinct`` rsd=0.01), returning the exact count plus a
    boolean that the sketch landed within ±5% (5 standard deviations — the
    check is deterministic, not flaky, because the sketch itself is
    deterministic for a fixed input set).

    At scale only the sketch path survives: it aggregates map-side into a
    fixed-width buffer per group, so the exchange carries ~4 KB per
    (group × partition) instead of one row per distinct key. The exact
    column here is the verification harness, not the scale path.

    r13 shape: the exact and sketch legs aggregate over the DISTINCT
    (priority, custkey) pairs — one partial-aggregated pair collapse, then
    a plain count plus the HLL. Value-identical to the old single mixed
    countDistinct+HLL aggregate (an HLL sketch is a set function: register
    state is a max over hashed values, so duplicates cannot move it —
    verified bit-identical at sf0.1), but the plan loses the Expand-based
    mixed-distinct rewrite, whose interpreted multi-phase HLL merge made
    the combined aggregate 3.4 s where the two legs alone cost 0.4 s + 1.0 s
    (guide §1.2/§2.3: measured 3.44 s -> 0.98 s at sf0.1).
    """
    o = table(spark, sf_dir, "orders")
    pairs = o.select("o_orderpriority", "o_custkey").distinct()
    return (
        pairs.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("exact_uniques"),
            F.approx_count_distinct("o_custkey", 0.01).alias("hll"),
        )
        .select(
            "o_orderpriority",
            "exact_uniques",
            (
                F.abs(F.col("hll") - F.col("exact_uniques"))
                <= 0.05 * F.col("exact_uniques")
            ).alias("hll_within_5pct"),
        )
    )


@register(
    "a_approx_median_band",
    oracle=f"""
    SELECT l_returnflag,
           {rfix_sql("quantile_cont(l_extendedprice, 0.5)", 4)} AS exact_median,
           TRUE AS approx_in_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("SKETCH", "A-pctl"),
)
def a_approx_median_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median extended price per return flag: the exact interpolated median,
    plus a boolean that ``approx_percentile`` (mergeable GK summary,
    accuracy=10000) falls inside the exact [p48, p52] band.

    The exact ``percentile`` sorts every group; the approx path is the one
    that scales (bounded memory, map-side mergeable). The band check pins the
    approximation contract into the oracle gate: a regression in the sketch
    (or a wrong accuracy parameter) flips the boolean and fails the hash.

    The median is rounded at FOUR digits, not two: an even-count money
    median is the midpoint of two 2-decimal values — an .xx5 quantity that
    sits bit-exactly ON the 2-digit floor boundary, but exactly half a
    quantum from any 4-digit boundary, which is where a rounded value is
    maximally robust to the engines' interpolation-ulp differences.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            rfix(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "exact_median"
            ),
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("ap"),
            F.expr("percentile(l_extendedprice, 0.48)").alias("lo"),
            F.expr("percentile(l_extendedprice, 0.52)").alias("hi"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            ((F.col("ap") >= F.col("lo")) & (F.col("ap") <= F.col("hi"))).alias(
                "approx_in_band"
            ),
        )
    )


@register(
    "a_grouping_sets_mixed",
    oracle=f"""
    SELECT coalesce(n_name, 'ALL') AS nation,
           coalesce(c_mktsegment, 'ALL') AS segment,
           CAST(grouping(n_name) AS INTEGER) AS g_nation,
           CAST(grouping(c_mktsegment) AS INTEGER) AS g_segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           {rfix_sql('sum(c_acctbal)')} AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """,
    tags=("A-cube",),
)
def a_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent one-dimension rollups plus
    the grand total in ONE aggregation pass (vs three scans + UNION ALL),
    with ``grouping()`` flags disambiguating which set each row belongs to.

    Complements the cube (a_cube_priority_status) and rollup
    (a_rollup_region_nation) queries: GROUPING SETS is the primitive both
    desugar to. Single shuffle; Spark expands each input row once per
    grouping set map-side and partially aggregates before the exchange.
    The sum is rounded at the presentation edge like every float
    aggregate: partial-sum merge ORDER differs between engines (and
    between runs), so the raw double's last ulp is not reproducible.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        j.groupingSets(
            [[F.col("n_name")], [F.col("c_mktsegment")], []],
            F.col("n_name"),
            F.col("c_mktsegment"),
        )
        .agg(
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("c_mktsegment").cast("int").alias("g_segment"),
            F.count(F.lit(1)).alias("n_customers"),
            rfix(F.sum("c_acctbal")).alias("total_acctbal"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "g_nation",
            "g_segment",
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "set_except_all_lines",
    oracle="""
    SELECT l_returnflag, l_linestatus
    FROM lineitem WHERE l_quantity > 10
    EXCEPT ALL
    SELECT l_returnflag, l_linestatus
    FROM lineitem WHERE l_discount > 0.05
    """,
    tags=("SET",),
)
def set_except_all_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag (multiplicity-preserving) difference, completing
    §2.7 alongside the DISTINCT-semantics set ops (set_union_nations etc.).

    Spark plans this as a single hash aggregation over the union of both
    sides with per-side counts (no join): one shuffle on the value columns,
    multiplicities subtracted in the reduce — the same shape it would keep
    at 100 TB. The duplicate rows in the result are exactly what the
    DISTINCT variant would collapse.
    """
    li = table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 10).select("l_returnflag", "l_linestatus")
    disc = li.filter(F.col("l_discount") > 0.05).select("l_returnflag", "l_linestatus")
    return big.exceptAll(disc)


@register(
    "a_sketch_rollup_regions",
    oracle="""
    SELECT r_name,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_uniques,
           TRUE AS sketch_within_5pct
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("SKETCH", "A8", "A3"),
)
def a_sketch_rollup_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable sketch columns: distinct customers are sketched at
    NATION granularity (hll_sketch_agg → one binary column per nation),
    then rolled up to REGION by unioning the sketches — the raw customer
    keys are never revisited.

    This is the pattern that makes 100 TB cardinality rollups cheap:
    materialize per-partition/per-day sketches once, answer any coarser
    grouping by hll_union_agg over kilobyte blobs. The estimate is checked
    against the independently computed exact count with the same in-envelope
    boolean contract as a_approx_distinct_check (lgConfigK=12 → well under
    ±5% at any scale).
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    nat = base.groupBy("n_regionkey", "n_nationkey").agg(
        F.hll_sketch_agg("c_custkey", 12).alias("sk"),
        F.countDistinct("c_custkey").alias("exact"),
    )
    reg = nat.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", False)).alias("est"),
        F.sum("exact").alias("exact_uniques"),  # custkeys are disjoint by nation
    )
    return reg.join(F.broadcast(r), reg.n_regionkey == r.r_regionkey).select(
        "r_name",
        F.col("exact_uniques").cast("long").alias("exact_uniques"),
        (
            F.abs(F.col("est") - F.col("exact_uniques"))
            <= 0.05 * F.col("exact_uniques")
        ).alias("sketch_within_5pct"),
    )


@register(
    "a_approx_topk_priorities",
    oracle="""
    SELECT o_orderpriority AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY cnt DESC, item
    LIMIT 3
    """,
    tags=("SKETCH", "O3"),
)
def a_approx_topk_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k frequency sketch, exploded to
    (item, count) rows.

    maxItemsTracked (1024) exceeds the column's cardinality, so the sketch
    is in its exact regime and the counts are guaranteed equal to a full
    groupBy — which is what the oracle asserts. At 100 TB the same one-pass
    mergeable sketch answers top-k over unbounded-cardinality columns with
    bounded memory (then approximately, with tracked-count error bounds);
    the plan never materializes the full (key, count) table the way the
    exact TakeOrdered path (text_oov_rate's vocab) must.

    The sketch is asked for MORE than k items (all 5 priorities) and the
    final top-3 is cut AFTER an explicit (count desc, item) sort: if a
    count tie ever straddled the cutoff, approx_top_k's own selection
    among tied items is merge-order-dependent, while this derivation and
    the oracle break the tie identically.
    """
    o = table(spark, sf_dir, "orders")
    topk = o.agg(F.expr("approx_top_k(o_orderpriority, 5, 1024)").alias("tk"))
    ex = topk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").cast("long").alias("cnt")
    )
    # deterministic selection AND order, independent of sketch tie order
    return ex.orderBy(F.desc("cnt"), "item").limit(3)


@register(
    "a_stats_aggregates",
    oracle=f"""
    SELECT l_returnflag,
           {rfix_sql('corr(l_quantity, l_extendedprice)', 6)} AS qty_price_corr,
           {rfix_sql('covar_samp(l_quantity, l_extendedprice)', 2)} AS qty_price_covar,
           {rfix_sql('regr_slope(l_extendedprice, l_quantity)', 4)} AS price_per_qty,
           {rfix_sql('stddev_samp(l_extendedprice)', 2)} AS price_stddev
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A3", "STATS"),
)
def a_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates — correlation, sample
    covariance, regression slope, standard deviation — per group in one
    pass.

    All four are single-pass mergeable moment accumulators, so they
    partially aggregate map-side and cost one exchange of fixed-width
    state per group — at 100 TB the same scaling argument as the
    count/sum family. Rounded at the presentation edge because different
    engines associate the moment merges differently (last-ulp noise only;
    the moments themselves are algebraically identical).

    Built from raw moments with explicit zero-variance guards rather
    than F.corr/covar_samp/regr_slope: under ANSI mode those THROW
    (divide-by-zero) on a zero-variance group where DuckDB returns NULL —
    the same latent divergence class t19_acf_daily_orders guards against,
    unreachable on TPC-H-shaped data but reachable on a constant column.
    Sum-of-squares cancellation is benign here (variance/mean² is O(1)
    for both columns) and the rfix canonicalization absorbs the last-ulp
    difference vs streaming co-moment updates.
    """
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    both = x.isNotNull() & y.isNotNull()
    xp, yp = F.when(both, x), F.when(both, y)
    n = F.count(xp).cast("double")
    sx, sy = F.sum(xp), F.sum(yp)
    sxx, syy, sxy = F.sum(xp * xp), F.sum(yp * yp), F.sum(xp * yp)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    # stddev_samp over y alone (its own null mask, like the builtin)
    ny = F.count(y).cast("double")
    sy1, syy1 = F.sum(y), F.sum(y * y)
    vy1 = ny * syy1 - sy1 * sy1
    return li.groupBy("l_returnflag").agg(
        rfix(
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), 6
        ).alias("qty_price_corr"),
        rfix(F.when(n >= 2, cov / (n * (n - 1))), 2).alias("qty_price_covar"),
        rfix(F.when(vx > 0, cov / vx), 4).alias("price_per_qty"),
        rfix(
            F.when(
                ny >= 2, F.sqrt(F.greatest(vy1, F.lit(0.0)) / (ny * (ny - 1)))
            ),
            2,
        ).alias("price_stddev"),
    )


@register(
    "a_sketch_vocab_overlap",
    oracle=f"""
    WITH st AS (
        SELECT DISTINCT source, tok
        FROM (SELECT source, unnest(string_split_regex(text, '\\s+')) AS tok
              FROM documents)
    ),
    cnt AS (SELECT source, count(*)::BIGINT AS n FROM st GROUP BY source),
    inter AS (
        SELECT a.source AS sa, b.source AS sb, count(*)::BIGINT AS ix
        FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT ca.source AS src_a, cb.source AS src_b,
           CAST(coalesce(ix, 0) AS BIGINT) AS exact_inter,
           CAST(ca.n + cb.n - coalesce(ix, 0) AS BIGINT) AS exact_union,
           TRUE AS inter_in_envelope
    FROM cnt ca
    JOIN cnt cb ON ca.source < cb.source
    LEFT JOIN inter ON sa = ca.source AND sb = cb.source
    """,
    tags=("SKETCH", "A8", "SET"),
)
def a_sketch_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary OVERLAP between sources estimated purely from
    sketches: |A∩B| ≈ est(A) + est(B) − est(A∪B) by inclusion-exclusion,
    where est(A∪B) is hll_union of the two per-source sketches — the
    corpus-similarity triage that decides which source pairs deserve a
    real (expensive) dedup pass. Per the module's approximation contract,
    the registered result carries the independently computed EXACT
    intersection/union plus a boolean asserting the sketch estimate landed
    within its envelope (±5% of the union size: three lgK=12 estimates at
    ~1.6% standard error each compound to well under that).

    Scale shape: one distinct over (source, token) — the only exchange
    that sees corpus-sized data — then sketches collapse each source to a
    few KB and the pair join runs over |sources|² sketch rows, never
    tokens. The exact-verification join is the audit path, not the scale
    path; at 100 TB one ships ONLY the sketches.

    The envelope boolean converts a statistical tolerance into a hash
    gate, so if this query ever hash-mismatches, run
    :func:`sketch_vocab_overlap_diag` — it returns the signed estimate
    error per pair, distinguishing benign HLL estimator drift (envelope
    breach) from a genuine exact-path regression.
    """
    return _vocab_overlap_frame(spark, sf_dir).drop("est_signed_err")


def sketch_vocab_overlap_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unregistered diagnostic twin of :func:`a_sketch_vocab_overlap`:
    same result plus ``est_signed_err`` (sketch estimate − exact
    intersection, rounded) so an envelope breach is identifiable as such
    rather than an opaque hash mismatch. Not oracled — the estimate is
    engine-specific by nature.
    """
    return _vocab_overlap_frame(spark, sf_dir)


def _vocab_overlap_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    st = d.select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    ).distinct()
    sk = st.groupBy("source").agg(
        F.hll_sketch_agg("tok", 12).alias("sk"),
        F.count("*").alias("n_exact"),
    )
    a = sk.select(
        F.col("source").alias("src_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_exact").alias("n_a"),
    )
    b = sk.select(
        F.col("source").alias("src_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_exact").alias("n_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    est_inter = est_a + est_b - est_union
    inter = (
        st.alias("x")
        .join(
            st.select(
                F.col("source").alias("source_b"), F.col("tok").alias("tok")
            ).alias("y"),
            (F.col("x.tok") == F.col("y.tok"))
            & (F.col("x.source") < F.col("source_b")),
        )
        .groupBy(F.col("x.source").alias("src_a"), F.col("source_b").alias("src_b"))
        .agg(F.count("*").alias("exact_inter"))
    )
    joined = pairs.join(F.broadcast(inter), ["src_a", "src_b"], "left").na.fill(
        {"exact_inter": 0}
    )
    exact_union = F.col("n_a") + F.col("n_b") - F.col("exact_inter")
    return joined.select(
        "src_a",
        "src_b",
        F.col("exact_inter").cast("long").alias("exact_inter"),
        exact_union.cast("long").alias("exact_union"),
        (
            F.abs(est_inter - F.col("exact_inter")) <= 0.05 * exact_union
        ).alias("inter_in_envelope"),
        rfix(est_inter - F.col("exact_inter"), 2).alias("est_signed_err"),
    )
