"""Relational query surface — scans, predicates, joins, aggregates, windows,
sorts, pagination, set ops (SURVEY.md §2.1-§2.8).

Each query re-expresses one operator family from the reference warehouse
(file:line citations point into /root/reference/) over the harness star
schema (region→nation→customer→orders→lineitem←part/supplier). All plans
are declarative DataFrame compositions: Catalyst handles pushdown, pruning,
join selection; dimension sides are explicitly broadcast where the 100 TB
plan wants a map-side join.

Presentation contract (see functions/presentation.py): integer outputs are
64-bit on both sides, temporal outputs are ISO strings, computed floats go
through rfix() / rfix_sql() — raw stored values pass through unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.presentation import cavg, cavg_sql, rfix, rfix_sql
from ..sources.tables import table
from .registry import register

# ---------------------------------------------------------------------------
# §2.1 Scans / sources  +  §2.2 projections & predicates
# ---------------------------------------------------------------------------


@register(
    "s1_scan_filter_project",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity,
           {rfix_sql('l_extendedprice * (1 - l_discount)')} AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity > 30
    """,
    tags=("S1", "S2", "P1", "P3"),
)
def s1_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + range predicate + projection (S1/P1/P3).

    Reference: JSON-lines scan with row filters, init/mysql_loader.py:354-365;
    range predicates webapp/mysql_routes.py:636-643. Filters and the 4-column
    projection reach the parquet scan (PushedFilters / ReadSchema pruning).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_quantity") > 30))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            rfix(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@register(
    "s3_semi_join_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
    """,
    tags=("S3", "J3"),
)
def s3_semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join load filter (S3/J3).

    Reference: facts loaded only for known business_ids — a Python set
    intersection at init/mysql_loader.py:606-609. Spark-first: LEFT SEMI join
    against the (broadcastable) filtered dimension; no fact-side shuffle.
    """
    orders = table(spark, sf_dir, "orders")
    rich = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 8000).select("c_custkey")
    return (
        orders.join(F.broadcast(rich), orders.o_custkey == rich.c_custkey, "left_semi")
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "p4_substring_search",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part
    WHERE lower(p_name) LIKE '%widget%'
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 25
    """,
    tags=("P4", "O1", "O3"),
)
def p4_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring search + multi-key top-k (P4/O1/O3).

    Reference: LIKE %q% name search, webapp/mysql_routes.py:619-626;
    Mongo $regex "i", webapp/mongodb_routes.py:126-138. Deterministic order
    via unique-key tie-break.
    """
    part = table(spark, sf_dir, "part")
    return (
        part.filter(F.lower(F.col("p_name")).contains("widget"))
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(25)
    )


@register(
    "p5_disjunctive_filter",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' OR c_acctbal < 0
    """,
    tags=("P2", "P5"),
)
def p5_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality OR range disjunction (P2/P5).

    Reference: city-OR-state location match, webapp/mysql_routes.py:625-626.
    """
    c = table(spark, sf_dir, "customer")
    return c.filter((F.col("c_mktsegment") == "BUILDING") | (F.col("c_acctbal") < 0)).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


@register(
    "p6_array_membership",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE list_contains(string_split(p_name, ' '), 'widget')
    """,
    tags=("P6", "F6", "F10"),
)
def p6_array_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-membership predicate on a split string column (P6/F6).

    Reference: categories $in on the split comma-string array,
    webapp/mongodb_routes.py:122-123 (split: init/mongodb_loader.py:152-153).
    """
    part = table(spark, sf_dir, "part")
    return part.filter(F.array_contains(F.split(F.col("p_name"), " "), "widget")).select(
        "p_partkey", "p_name"
    )


@register(
    "p7_json_field_predicate",
    oracle="""
    SELECT event_id, event_type, json_extract_string(props, '$.k')::BIGINT AS k
    FROM events
    WHERE json_extract_string(props, '$.k')::BIGINT >= 90
    """,
    tags=("P7", "F11"),
)
def p7_json_field_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested/JSON field predicate (P7).

    Reference: attributes.GoodForKids nested-attribute filters with value
    normalization, webapp/mongodb_routes.py:188-269. Props stays a JSON
    string; extraction is JVM-side get_json_object (no UDF).
    """
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_id", "event_type", k.alias("k")).filter(F.col("k") >= 90)


@register(
    "p8_null_safe_filter",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE text IS NOT NULL AND text <> '' AND lang IS NOT NULL AND n_chars > 400
    """,
    tags=("P8",),
)
def p8_null_safe_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/empty existence predicate (P8).

    Reference: state IS NOT NULL AND state != '', webapp/mysql_routes.py:1028-1029.
    """
    d = table(spark, sf_dir, "documents")
    return d.filter(
        F.col("text").isNotNull()
        & (F.col("text") != "")
        & F.col("lang").isNotNull()
        & (F.col("n_chars") > 400)
    ).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@register(
    "j1_multiway_revenue",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS order_cnt,
           {rfix_sql('sum(o.o_totalprice)')} AS revenue,
           {cavg_sql('sum(o.o_totalprice)', 'count(*)')} AS avg_order
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("J1", "A3", "A5", "A6"),
)
def j1_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way dim⋈fact star join + multi-aggregate rollup (J1/A3).

    Reference: business⋈location⋈bridge⋈category joins,
    webapp/mysql_routes.py:90-100,497-517. Scale plan: region/nation/customer
    are broadcast; the only shuffle is the final group-by on (r_name, n_name)
    with map-side partial aggregation.
    """
    r = F.broadcast(table(spark, sf_dir, "region"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = F.broadcast(table(spark, sf_dir, "customer"))
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            rfix(F.sum("o_totalprice")).alias("revenue"),
            cavg(F.sum("o_totalprice"), F.count("*")).alias("avg_order"),
        )
    )


@register(
    "j2_left_join_summary",
    oracle=f"""
    SELECT c.c_custkey,
           coalesce(s.order_cnt, 0) AS order_cnt,
           {rfix_sql('coalesce(s.total_spend, 0)')} AS total_spend
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_cnt,
               sum(o_totalprice) AS total_spend
        FROM orders GROUP BY o_custkey
    ) s ON s.o_custkey = c.c_custkey
    """,
    tags=("J2", "F8"),
)
def j2_left_join_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join against a pre-aggregated summary + coalesce (J2/F8).

    Reference: LEFT JOIN summary_business_performance,
    webapp/mysql_routes.py:395-402; IFNULL init/mysql_loader.py:1086-1087.
    Aggregate-then-join keeps the join input small (one row per customer).
    """
    c = table(spark, sf_dir, "customer")
    s = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_cnt"), F.sum("o_totalprice").alias("total_spend"))
    )
    return c.join(s, c.c_custkey == s.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        rfix(F.coalesce("total_spend", F.lit(0.0))).alias("total_spend"),
    )


@register(
    "j4_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("J4",),
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — rows with no match (J4).

    Reference: graph NOT-pattern "businesses the user has NOT reviewed",
    webapp/neo4j_routes.py:643-644. LEFT ANTI is the distributed form.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# Basket size at which j5's pair expansion switches from the inline
# (single-row C(m,2)) path to the salted posexplode path. C(64,2) ≈ 2k
# structs per row is well under a task's working set; anything bigger is
# the hot-key regime where one row must not own the whole expansion.
J5_LARGE_BASKET = 64


def _sorted_pairs(arr, a_name: str, b_name: str):
    """All ordered pairs (position i < j) from a sorted array column, as
    structs — the shared expansion of the j5/j6 basket co-occurrence
    queries. ``slice(arr, i + 2, size(arr))`` is the suffix strictly after
    the 1-based position i + 1 of element x (transform's i is 0-based)."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )


def _basket_pair_rows(
    baskets: DataFrame, arr: str, a_name: str, b_name: str,
    threshold: int, parallelism: int,
) -> DataFrame:
    """Ordered (i < j) pair rows from per-key sorted baskets, skew-hardened.

    Two branches with identical pair semantics, so any aggregate over the
    union is oracle-unchanged: baskets under ``threshold`` expand inline
    via the HOF transform (one task per batch of baskets); baskets at or
    above it take the salted path — posexplode so each element row carries
    only its O(m) suffix pairs, round-robin repartition (the salt), then
    explode per row — spreading one pathological C(m,2) basket over the
    whole cluster instead of one task. At harness scale the large branch
    is empty and AQE prunes it to nothing.
    """
    # r14 (guide §1.2): the small/large branches are disjoint filters over
    # the SAME baskets subtree — unpinned, the union evaluates the whole
    # upstream derivation (fact scan + collect_set exchange + repartition)
    # once per branch (2 fact scans in every consumer's plan; 4 in
    # dedup_fuzzy_name_pairs, which unioned the pairs again). Pinning the
    # compacted basket frame (one row per key — node-scale by
    # construction) makes both branches read one materialization.
    from ..operators.iterative import pin

    baskets = pin(baskets, label="basket_pair_rows")
    small = baskets.filter(F.size(arr) < threshold).select(
        F.explode(_sorted_pairs(F.col(arr), a_name, b_name)).alias("p")
    )
    large = (
        baskets.filter(F.size(arr) >= threshold)
        .select(F.col(arr), F.posexplode(arr).alias("i", "x"))
        .repartition(parallelism)
        .select(
            F.col("x"),
            F.explode(F.slice(arr, F.col("i") + 2, F.size(arr))).alias("y"),
        )
        .select(
            F.struct(F.col("x").alias(a_name), F.col("y").alias(b_name)).alias("p")
        )
    )
    return small.unionByName(large)


@register(
    "j5_copurchase_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS together_cnt
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING count(*) >= 3
    """,
    tags=("J5", "P9", "A9"),
)
def j5_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join co-occurrence via a shared parent (J5/P9/A9).

    Reference: category co-occurrence pairs c1.name < c2.name,
    webapp/neo4j_routes.py:861-867; common-category business network :443-452.

    Scale plan — two exchanges, no self-join: collect_set(partkey) per
    order (dedup inside the aggregate, partial map-side), then ordered
    pairs generated from the sorted basket by a higher-order transform
    (flatten of per-element suffix slices) and counted. The textbook
    distinct+self-join shape costs three exchanges and rescans the fact;
    this shuffles the fact once. Basket size bounds the per-row pair
    blowup (orders are small everywhere; a pathological parent key would
    need the salting path in operators/skew).

    The explicit round-robin repartition between the compacting aggregate
    and the expanding transform is load-bearing: AQE sizes the next stage
    by the basket rows' BYTES and cannot see the ~C(m,2) expansion
    factor, so without it the quadratic work lands on a handful of
    coalesced partitions (measured 3× slower at sf0.1). Rebalance cost is
    one exchange of the already-compacted baskets — negligible against
    the expansion it parallelizes.

    Hot-key hardening (the skew the reference's category co-occurrence
    hits at scale, webapp/neo4j_routes.py:443-452): one pathological
    parent key — a basket of m parts with m ≫ typical — makes the inline
    expansion a single C(m,2) task no matter how baskets are spread.
    Baskets at or above ``J5_LARGE_BASKET`` therefore take a salted path:
    posexplode the basket so each element row carries only its O(m)
    suffix pairs, round-robin those rows (the salt), and explode per
    row — the quadratic work of ONE basket spreads over the whole
    cluster. Both branches produce identical (i < j) pairs, so the union
    is exact and the oracle is unchanged; at harness scale the large
    branch is empty and AQE prunes it to nothing.
    """
    li = table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    ).repartition(spark.sparkContext.defaultParallelism)
    pairs = _basket_pair_rows(
        baskets, "parts", "part_a", "part_b",
        J5_LARGE_BASKET, spark.sparkContext.defaultParallelism,
    )
    return (
        pairs
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").alias("together_cnt"))
        .filter(F.col("together_cnt") >= 3)
    )


@register(
    "j6_two_hop_supplier_pairs",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
           CAST(count(*) AS BIGINT) AS shared_parts
    FROM ps a JOIN ps b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY a.l_suppkey, b.l_suppkey
    HAVING count(*) >= 5
    ORDER BY shared_parts DESC, supp_a, supp_b
    LIMIT 1000
    """,
    tags=("J6", "O3"),
)
def j6_two_hop_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop co-occurrence through an entity graph (J6).

    Reference: co-reviewer 2-hop pattern b←review←user→review→b2,
    webapp/neo4j_routes.py:459-467 — a top-N query there too, so the result
    is the deterministic top-1000 (full tie-break on the pair keys) via
    TakeOrderedAndProject: O(k) per partition then on the driver, never a
    global sort.

    Same two-exchange basket shape as j5 (collect_set per part → HOF pair
    expansion → pair count): the hub entity (part) gathers its supplier
    set once, and the quadratic pair blowup happens inside a row where
    its size is observable and boundable, instead of hiding in a
    self-join's matched-row stream. As in j5, the round-robin repartition
    after the compacting aggregate re-parallelizes the ~8.7M-pair
    expansion that AQE would otherwise coalesce onto 2 partitions
    (byte-based sizing can't see the expansion factor): measured
    4.6s → 1.55s at sf0.1 versus 2.4–3.3s for the 3-exchange self-join.
    Hot-hub hardening mirrors j5: a part supplied by ≥ J5_LARGE_BASKET
    suppliers routes through the salted posexplode branch
    (_basket_pair_rows), so one pathological hub can't serialize the
    cluster; at harness scale that branch is empty.
    """
    li = table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_partkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("supps")
    ).repartition(spark.sparkContext.defaultParallelism)
    pairs = _basket_pair_rows(
        baskets, "supps", "supp_a", "supp_b",
        J5_LARGE_BASKET, spark.sparkContext.defaultParallelism,
    )
    return (
        pairs
        .groupBy(F.col("p.supp_a").alias("supp_a"), F.col("p.supp_b").alias("supp_b"))
        .agg(F.count("*").alias("shared_parts"))
        .filter(F.col("shared_parts") >= 5)
        .orderBy(F.desc("shared_parts"), "supp_a", "supp_b")
        .limit(1000)
    )


@register(
    "j9_date_spine_join",
    oracle=f"""
    WITH spine AS (
        SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                      INTERVAL 1 DAY))::DATE AS d
    ),
    daily AS (
        SELECT ts::DATE AS d, CAST(count(*) AS BIGINT) AS event_cnt,
               sum(value) AS total_value
        FROM events GROUP BY 1
    )
    SELECT strftime(spine.d, '%Y-%m-%d') AS day,
           coalesce(daily.event_cnt, 0) AS event_cnt,
           {rfix_sql('coalesce(daily.total_value, 0)')} AS total_value
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
    tags=("J9", "F4"),
)
def j9_date_spine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension joined to facts — zero-filled days (J9).

    Reference: dim_time generated for every day 2004-2023 then joined by date,
    init/mysql_loader.py:243-288,592-594; dense-array chart fills
    webapp/mysql_routes.py:189-229. Spark-first: sequence()+explode generates
    the spine distributively; the daily aggregate is map-side partial.
    """
    ev = table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("event_cnt"), F.sum("value").alias("total_value"))
    )
    return spine.join(daily, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("event_cnt", F.lit(0)).alias("event_cnt"),
        rfix(F.coalesce("total_value", F.lit(0.0))).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@register(
    "a2_status_histogram",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("A1", "A2"),
)
def a2_status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by count histogram (A2) — the star-rating distribution analog.

    Reference: reviews per star value, webapp/mysql_routes.py:49-54.
    """
    return table(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt")
    )


@register(
    "a3_nation_customer_stats",
    oracle=f"""
    SELECT n.n_name,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS customer_cnt,
           {cavg_sql('sum(c.c_acctbal)', 'count(c.c_acctbal)')} AS avg_bal,
           {rfix_sql('sum(c.c_acctbal)')} AS total_bal,
           CAST(count(CASE WHEN c.c_acctbal > 5000 THEN 1 END) AS BIGINT) AS rich_cnt,
           CAST(count(CASE WHEN c.c_acctbal < 0 THEN 1 END) AS BIGINT) AS debtor_cnt
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("A3", "A4", "A8"),
)
def a3_nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate with conditional (pivot-style) counts (A3/A4/A8).

    Reference: per-city COUNT DISTINCT / AVG / SUM + CASE-bucket counts,
    webapp/mysql_routes.py:329-361.
    """
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("customer_cnt"),
            cavg(F.sum("c_acctbal"), F.count("c_acctbal")).alias("avg_bal"),
            rfix(F.sum("c_acctbal")).alias("total_bal"),
            F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("rich_cnt"),
            F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("debtor_cnt"),
        )
    )


@register(
    "a4_price_band_histogram",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'lt_50k'
                WHEN o_totalprice < 150000 THEN '50k_150k'
                WHEN o_totalprice < 300000 THEN '150k_300k'
                ELSE 'gte_300k' END AS price_band,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1
    """,
    tags=("A4", "F9"),
)
def a4_price_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-bucketed histogram (A4/F9) — the stars>=4.5 bucket analog.

    Reference: COUNT(CASE WHEN stars>=4.5 ...) x5, webapp/mysql_routes.py:336-340.
    """
    o = table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "lt_50k")
        .when(F.col("o_totalprice") < 150000, "50k_150k")
        .when(F.col("o_totalprice") < 300000, "150k_300k")
        .otherwise("gte_300k")
    )
    return o.groupBy(band.alias("price_band")).agg(F.count("*").alias("cnt"))


@register(
    "a5_value_by_dayname",
    oracle=f"""
    SELECT dayname(ts) AS day_name,
           CAST(count(*) AS BIGINT) AS event_cnt,
           {rfix_sql('sum(value)')} AS total_value
    FROM events GROUP BY 1
    """,
    tags=("A5", "F1"),
)
def a5_value_by_dayname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum by day-of-week (A5/F1) — checkins-per-weekday analog.

    Reference: SUM(checkin_count) GROUP BY day_of_week,
    webapp/mysql_routes.py:176-185.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "EEEE").alias("day_name"))
        .agg(F.count("*").alias("event_cnt"), rfix(F.sum("value")).alias("total_value"))
    )


@register(
    "a6_avg_by_year_month",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(count(*) AS BIGINT) AS order_cnt,
           {cavg_sql('sum(o_totalprice)', 'count(*)')} AS avg_price
    FROM orders GROUP BY 1, 2
    """,
    tags=("A6", "A2", "F1"),
)
def a6_avg_by_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series monthly aggregate (A6/F1) — review trends analog.

    Reference: reviews per (year, month), webapp/mysql_routes.py:413-421.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(
            F.count("*").alias("order_cnt"),
            # cavg, not rfix(avg): a group mean here lands bit-exactly on
            # the 2-digit floor boundary (351473.995), where partial-merge
            # order noise would flip the hashed digit
            cavg(F.sum("o_totalprice"), F.count("*")).alias("avg_price"),
        )
    )


@register(
    "a7_user_event_span",
    oracle="""
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d') AS first_day,
           strftime(max(ts), '%Y-%m-%d') AS last_day,
           CAST(count(*) AS BIGINT) AS event_cnt
    FROM events GROUP BY user_id
    """,
    tags=("A7",),
)
def a7_user_event_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max temporal span per entity (A7).

    Reference: first/last review date per user, webapp/mysql_routes.py:1218-1219.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("ts"), "yyyy-MM-dd").alias("last_day"),
        F.count("*").alias("event_cnt"),
    )


@register(
    "a8_distinct_parts_per_customer",
    oracle="""
    SELECT o.o_custkey AS custkey,
           CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS distinct_parts,
           CAST(count(*) AS BIGINT) AS line_cnt
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    """,
    tags=("A8", "J1"),
)
def a8_distinct_parts_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct over a fact join (A8).

    Reference: COUNT(DISTINCT r.business_id) per user,
    webapp/mysql_routes.py:1220. Exact (not approx) — it is the correctness
    gate; the join shuffles both facts on the shared orderkey.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.count("*").alias("line_cnt"),
        )
    )


@register(
    "a9_having_filter",
    oracle=f"""
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS customer_cnt,
           {cavg_sql('sum(c_acctbal)', 'count(c_acctbal)')} AS avg_bal
    FROM customer GROUP BY c_nationkey
    HAVING count(*) > 40
    """,
    tags=("A9",),
)
def a9_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter (A9).

    Reference: cities HAVING COUNT(...) > 5, webapp/mysql_routes.py:355-357.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("customer_cnt"),
            cavg(F.sum("c_acctbal"), F.count("c_acctbal")).alias("avg_bal"),
        )
        .filter(F.col("customer_cnt") > 40)
    )


@register(
    "a10_token_explode_count",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
    tags=("A10", "F6"),
)
def a10_token_explode_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array unwind + frequency count (A10) — category counts analog.

    Reference: $unwind categories → count, webapp/mongodb_routes.py:33-39.
    """
    part = table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "a11_json_key_frequency",
    oracle="""
    SELECT key, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(json_keys(props)) AS key FROM events)
    GROUP BY key
    """,
    tags=("A11", "F11"),
)
def a11_json_key_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-key frequency over semi-structured columns (A11/F11).

    Reference: $objectToArray attributes → key counts,
    webapp/mongodb_routes.py:713-720.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(F.explode(F.json_object_keys("props")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "a13_sampled_doc_stats",
    oracle=f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS doc_cnt,
           {rfix_sql('avg(n_chars)')} AS avg_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    WHERE doc_id % 10 = 0
    GROUP BY lang
    """,
    tags=("A13", "A7"),
)
def a13_sampled_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-sample statistics (A13).

    Reference: $sample 100 → avg/max field stats, webapp/mongodb_routes.py:839-856.
    The reference samples randomly; we sample by key mod so the engine and the
    oracle see the same rows (reproducibility over randomness).
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") % 10 == 0)
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_cnt"),
            rfix(F.avg("n_chars")).alias("avg_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


@register(
    "a14_customer_summary_rebuild",
    oracle=f"""
    SELECT c.c_custkey, n.n_name AS nation,
           coalesce(s.order_cnt, 0) AS order_cnt,
           {rfix_sql('coalesce(s.total_spend, 0)')} AS total_spend,
           {cavg_sql('coalesce(s.total_spend, 0)', 'greatest(coalesce(s.order_cnt, 0), 1)')} AS avg_order,
           coalesce(s.first_order, '') AS first_order,
           coalesce(s.last_order, '') AS last_order
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS order_cnt,
               sum(o_totalprice) AS total_spend,
               strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
               strftime(max(o_orderdate), '%Y-%m-%d') AS last_order
        FROM orders GROUP BY o_custkey
    ) s ON s.o_custkey = c.c_custkey
    """,
    tags=("A14", "J2", "F8"),
)
def a14_customer_summary_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-entity summary rebuild (A14).

    Reference: summary_business_performance full rebuild — per-business
    review/checkin/tip totals via left joins, init/mysql_loader.py:1080-1104;
    Mongo $out pipeline init/mongodb_loader.py:434-529. This is the batch
    half of the batch/stream convergence invariant (§5.5); the streaming half
    maintains the same table incrementally (streaming/pipeline.py).
    """
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    s = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("order_cnt"),
            F.sum("o_totalprice").alias("total_spend"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        )
    )
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(s, c.c_custkey == s.o_custkey, "left")
        .select(
            "c_custkey",
            F.col("n_name").alias("nation"),
            F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
            rfix(F.coalesce("total_spend", F.lit(0.0))).alias("total_spend"),
            cavg(
                F.coalesce("total_spend", F.lit(0.0)),
                F.greatest(F.coalesce("order_cnt", F.lit(0)), F.lit(1)),
            ).alias("avg_order"),
            F.coalesce("first_order", F.lit("")).alias("first_order"),
            F.coalesce("last_order", F.lit("")).alias("last_order"),
        )
    )


@register(
    "a_pivot_year_quarter",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(count(CASE WHEN quarter(o_orderdate) = 1 THEN 1 END) AS BIGINT) AS q1,
           CAST(count(CASE WHEN quarter(o_orderdate) = 2 THEN 1 END) AS BIGINT) AS q2,
           CAST(count(CASE WHEN quarter(o_orderdate) = 3 THEN 1 END) AS BIGINT) AS q3,
           CAST(count(CASE WHEN quarter(o_orderdate) = 4 THEN 1 END) AS BIGINT) AS q4
    FROM orders GROUP BY 1
    """,
    tags=("A4", "F5"),
)
def a_pivot_year_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: rows → per-quarter columns (year_comparison analog).

    Reference: per-year month pivot done in a Python loop,
    webapp/mysql_routes.py:863-898 — here it's a single relational pivot.
    """
    o = table(spark, sf_dir, "orders")
    p = (
        o.select(F.year("o_orderdate").cast("long").alias("yr"), F.quarter("o_orderdate").alias("q"))
        .groupBy("yr")
        .pivot("q", [1, 2, 3, 4])
        .count()
    )
    return p.select(
        "yr",
        *[F.coalesce(F.col(str(i)), F.lit(0)).cast("long").alias(f"q{i}") for i in (1, 2, 3, 4)],
    )


# ---------------------------------------------------------------------------
# §2.5 Windows
# ---------------------------------------------------------------------------


@register(
    "w1_topn_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(row_number() OVER (PARTITION BY p_brand
                    ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
        FROM part
    ) WHERE rn <= 3
    """,
    tags=("W1", "J7"),
)
def w1_topn_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number window (W1) — replaces the reference's
    per-row correlated loop.

    Reference: per-user top-3 categories computed in a Python loop over the
    top-10 users, webapp/mysql_routes.py:1235-1256. One window, no loop.
    """
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w2_rank_customers_in_segment",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rnk
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               CAST(rank() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
        FROM customer
    ) WHERE rnk <= 5
    """,
    tags=("W2",),
)
def w2_rank_customers_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() top-k per partition (W2).

    Reference: top businesses per category, webapp/mysql_routes.py:90-100.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "w3_running_avg_per_customer",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {cavg_sql('''sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''',
                     '''count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_avg
    FROM orders
    """,
    tags=("W3", "T5"),
)
def w3_running_avg_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running average over an ordered frame (W3) — the batch analog of the
    streaming running-average maintenance.

    Reference: avg = (avg*n + stars)/(n+1) applied per event,
    streaming/consumer.py:431-441 (including its off-by-one bug, SURVEY §8 —
    the window form is the correct semantics).
    """
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        # canonical sum/count, not avg().over: frame averages land on the
        # rounding boundary (215341.575 at sf0.01) and Spark's sequential
        # vs DuckDB's segment-tree frame accumulation differ in the ulp
        cavg(F.sum("o_totalprice").over(w), F.count("*").over(w)).alias(
            "running_avg"
        ),
    )


# ---------------------------------------------------------------------------
# §2.6 Sorts / limits / pagination  +  §2.7 set ops
# ---------------------------------------------------------------------------


@register(
    "o1_multikey_topk",
    oracle="""
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part
    ORDER BY p_size DESC, p_retailprice DESC, p_partkey
    LIMIT 10
    """,
    tags=("O1", "O3"),
)
def o1_multikey_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global top-k (O1/O3) — TakeOrderedAndProject, no full sort.

    Reference: ORDER BY stars DESC, review_count DESC LIMIT 10,
    webapp/mysql_routes.py:98,650-655.
    """
    return (
        table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
        .orderBy(F.desc("p_size"), F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
    )


@register(
    "o4_pagination_page3",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    ORDER BY c_name, c_custkey
    LIMIT 20 OFFSET 40
    """,
    tags=("O4",),
)
def o4_pagination_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset/limit pagination with a deterministic total order (O4).

    Reference: LIMIT %s OFFSET %s + separate total-count query,
    webapp/mysql_routes.py:99,106-118. See plans.builder.paginate for the
    parameterized form with the count envelope.
    """
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy("c_name", "c_custkey")
        .offset(40)
        .limit(20)
    )


@register(
    "set_intersect_nations",
    oracle="""
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
    """,
    tags=("SET",),
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT distinct (§2.7 — free via the DataFrame API)."""
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = c.join(n, c.c_nationkey == n.n_nationkey).select("n_name")
    sn = s.join(n, s.s_nationkey == n.n_nationkey).select("n_name")
    return cn.intersect(sn)


@register(
    "set_except_nations",
    oracle="""
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    EXCEPT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
    """,
    tags=("SET",),
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT distinct (§2.7). DataFrame.subtract IS set-difference distinct."""
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = c.join(n, c.c_nationkey == n.n_nationkey).select("n_name")
    sn = s.join(n, s.s_nationkey == n.n_nationkey).select("n_name")
    return cn.subtract(sn)


# ---------------------------------------------------------------------------
# §2.8 Scalar functions
# ---------------------------------------------------------------------------


@register(
    "f_scalar_showcase",
    oracle=f"""
    SELECT c_custkey,
           upper(substr(c_name, 1, 8)) AS name_prefix,
           concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
           {rfix_sql('abs(c_acctbal)', 1)} AS abs_bal,
           coalesce(nullif(c_mktsegment, ''), 'UNKNOWN') AS segment
    FROM customer
    """,
    tags=("F7", "F8", "F9", "F13"),
)
def f_scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/conditional/null scalar function battery (F7/F8/F9/F13).

    Reference: CONCAT webapp/mysql_routes.py:1109, CASE buckets :336-340,
    IFNULL init/mysql_loader.py:1086-1087, boundary coercions
    webapp/db_utils.py:37-43. All JVM-side, whole-stage-codegen friendly.
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.concat("c_mktsegment", F.lit("#"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        rfix(F.abs("c_acctbal"), 1).alias("abs_bal"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("")), F.lit("UNKNOWN")).alias("segment"),
    )


@register(
    "f2_quarter_label_counts",
    oracle="""
    SELECT concat(CAST(year(o_orderdate) AS VARCHAR), '-Q',
                  CAST(quarter(o_orderdate) AS VARCHAR)) AS quarter_label,
           strftime(date_trunc('month', min(o_orderdate)), '%Y-%m-%d') AS first_month,
           CAST(count(*) AS BIGINT) AS order_cnt
    FROM orders GROUP BY 1
    """,
    tags=("F2", "F5", "F7"),
)
def f2_quarter_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date truncation + label formatting (F2/F5/F7).

    Reference: CONCAT(year,'-Q',quarter) quarterly labels,
    webapp/mysql_routes.py:1109; DATE_FORMAT month buckets :721-731.
    """
    o = table(spark, sf_dir, "orders")
    label = F.concat(
        F.year("o_orderdate").cast("string"), F.lit("-Q"), F.quarter("o_orderdate").cast("string")
    )
    return (
        o.groupBy(label.alias("quarter_label"))
        .agg(
            F.date_format(F.date_trunc("month", F.min("o_orderdate")), "yyyy-MM-dd").alias(
                "first_month"
            ),
            F.count("*").alias("order_cnt"),
        )
    )


@register(
    "f3_recent_orders",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM orders
    WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 6 MONTH
    """,
    tags=("F3",),
)
def f3_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative date arithmetic anchored on the data's watermark (F3).

    Reference: DATE_SUB(CURRENT_DATE, INTERVAL 12 MONTH),
    webapp/mysql_routes.py:727 — anchored on max(o_orderdate) instead of the
    wall clock so results are reproducible. The scalar max is broadcast, not
    collected.
    """
    o = table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    return (
        o.crossJoin(F.broadcast(maxd))
        .filter(F.col("o_orderdate") >= F.expr("maxd - INTERVAL 6 MONTH"))
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"))
    )


@register(
    "f12_doc_size_buckets",
    oracle=f"""
    SELECT CASE WHEN length(text) < 150 THEN 'xs'
                WHEN length(text) < 300 THEN 's'
                WHEN length(text) < 450 THEN 'm'
                ELSE 'l' END AS size_bucket,
           CAST(count(*) AS BIGINT) AS doc_cnt,
           {rfix_sql('avg(length(text))')} AS avg_len
    FROM documents GROUP BY 1
    """,
    tags=("F12", "A4"),
)
def f12_doc_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-size histogram (F12).

    Reference: len(json.dumps(doc))/1024 size buckets,
    webapp/mongodb_routes.py:661-678.
    """
    d = table(spark, sf_dir, "documents")
    ln = F.length("text")
    bucket = (
        F.when(ln < 150, "xs").when(ln < 300, "s").when(ln < 450, "m").otherwise("l")
    )
    return d.groupBy(bucket.alias("size_bucket")).agg(
        F.count("*").alias("doc_cnt"), rfix(F.avg(ln)).alias("avg_len")
    )


@register(
    "t7_hourly_tumbling_window",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS event_cnt,
           {rfix_sql('sum(value)')} AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("T7", "A5"),
)
def t7_hourly_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate (T7) — batch form.

    Reference: events carry ISO timestamps but are never windowed
    (streaming/consumer.py:360); this is the windowed-agg capability the
    reference lacks. The identical F.window() plan runs on a stream with
    a watermark in streaming/pipeline.py.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("event_cnt"), rfix(F.sum("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "event_cnt",
            "total_value",
        )
    )


@register(
    "a1_global_counts",
    oracle="""
    SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS row_cnt FROM customer
    UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
    UNION ALL SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT) FROM supplier
    UNION ALL SELECT 'part', CAST(count(*) AS BIGINT) FROM part
    """,
    tags=("A1", "SET"),
)
def a1_global_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global scalar COUNT(*) per table, unioned into one result (A1).

    Reference: the dashboard's per-table counts (webapp/mysql_routes.py:26-35,
    utility_routes.py:32-129). Each count is a metadata-cheap scan
    (parquet row-group statistics); the union is five 1-row DataFrames.
    """
    parts = []
    for t in ("customer", "orders", "lineitem", "supplier", "part"):
        parts.append(
            table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"), F.count("*").alias("row_cnt")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "a12_array_inline_agg",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dims,
           {rfix_sql('list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))', 4)} AS sq_norm,
           {rfix_sql('list_max(embedding)::DOUBLE', 4)} AS max_val
    FROM embeddings
    WHERE vec_id < 100
    """,
    tags=("A12", "F10"),
)
def a12_array_inline_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row aggregate OVER an array column — no explode, no shuffle (A12).

    Reference: $size / $sum-of-$map over nested arrays,
    init/mongodb_loader.py:471-503. Spark-first: F.aggregate folds inside the
    row (whole-stage codegen), so a 100 TB embedding table needs zero
    shuffles for per-vector statistics.
    """
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dims"),
        rfix(sq, 4).alias("sq_norm"),
        rfix(F.array_max("embedding").cast("double"), 4).alias("max_val"),
    )


@register(
    "set_union_nations",
    oracle="""
    SELECT n_name FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    UNION
    SELECT n_name FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
    tags=("SET",),
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two derived sets — completes the set-op family
    with intersect/except (SURVEY.md §2.7: free via the DataFrame API)."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = n.join(c, n.n_nationkey == c.c_nationkey).select("n_name")
    sn = n.join(s, n.n_nationkey == s.s_nationkey).select("n_name")
    return cn.union(sn).distinct()


@register(
    "a_percentiles_by_segment",
    oracle=f"""
    SELECT c_mktsegment,
           {rfix_sql('quantile_cont(c_acctbal, 0.5)', 4)} AS median_bal,
           {rfix_sql('quantile_cont(c_acctbal, 0.9)', 4)} AS p90_bal,
           {rfix_sql('quantile_cont(c_acctbal, 0.99)', 4)} AS p99_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("A6", "PCTL"),
)
def a_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median/p90/p99).

    Absent from the reference's aggregate surface entirely; a quality-score
    pipeline needs them (threshold selection). Spark `percentile` and
    DuckDB `quantile_cont` share linear-interpolation semantics (probed to
    1e-9 before registration). The 100 TB note: exact percentile sorts each
    group's values; for heavy groups swap in `approx_percentile` (t-digest,
    mergeable map-side) — same call shape, documented tolerance.
    """
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        rfix(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        rfix(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
        rfix(F.expr("percentile(c_acctbal, 0.99)"), 4).alias("p99_bal"),
    )


@register(
    "a_rollup_region_nation",
    oracle=f"""
    SELECT coalesce(r.r_name, 'ALL') AS region_name,
           coalesce(CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END,
                    'ALL') AS nation_name,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS cust_cnt,
           {rfix_sql('sum(c.c_acctbal)')} AS total_bal
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("ROLLUP",),
)
def a_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (nation → region → grand total) in ONE
    aggregation pass — beyond the reference, which re-queries per level
    (each dashboard tab is its own GROUP BY; SURVEY §2.4 notes the gap).
    Spark expands grouping sets map-side: the fact is scanned once and every
    level's partial aggregates combine in the same shuffle.

    Null grouping keys are disambiguated with GROUPING()/grouping_id (the
    standard way to tell 'rollup total' from a genuinely null key) and
    rendered as 'ALL' so the hash-compare is label-stable.
    """
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    joined = (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .join(c, n.n_nationkey == c.c_nationkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("cust_cnt"),
            rfix(F.sum("c_acctbal")).alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "gid",
            "cust_cnt",
            "total_bal",
        )
    )


@register(
    "w4_month_over_month_delta",
    oracle=f"""
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS ym,
               CAST(count(*) AS BIGINT) AS order_cnt,
               sum(o_totalprice) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT ym, order_cnt,
           {rfix_sql('revenue')} AS revenue,
           {rfix_sql("coalesce(revenue - lag(revenue) OVER (ORDER BY ym), 0)")} AS mom_delta,
           coalesce(CAST(order_cnt - lag(order_cnt) OVER (ORDER BY ym) AS BIGINT), 0) AS cnt_delta
    FROM monthly
    """,
    tags=("W4", "F2"),
)
def w4_month_over_month_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() month-over-month deltas on a monthly rollup.

    Reference analog: year_comparison/review_trends compute period series and
    leave the delta math to the dashboard JS (webapp/mysql_routes.py:863-898);
    here it's one window over the (tiny) aggregated series — the window input
    is post-aggregation, so the sort is over months, never over the fact.
    """
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("ym")
    ).agg(F.count("*").alias("order_cnt"), F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("ym")
    return monthly.select(
        "ym",
        "order_cnt",
        rfix(F.col("revenue")).alias("revenue"),
        rfix(F.coalesce(F.col("revenue") - F.lag("revenue").over(w), F.lit(0))).alias(
            "mom_delta"
        ),
        F.coalesce(F.col("order_cnt") - F.lag("order_cnt").over(w), F.lit(0))
        .cast("long")
        .alias("cnt_delta"),
    )


@register(
    "a_cube_priority_status",
    oracle=f"""
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END
             AS priority,
           CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END
             AS status,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS order_cnt,
           {rfix_sql('sum(o_totalprice)')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    tags=("CUBE",),
)
def a_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE cross-dimensional totals — all four grouping sets of
    (priority, status) in ONE fact scan, complementing the hierarchical
    ROLLUP above. The reference's dashboards issue one GROUP BY per
    marginal (SURVEY §2.4); Spark expands the grouping sets map-side so
    partials for every set ride the same shuffle. GROUPING() labels
    distinguish subtotal rows from genuine keys, as in a_rollup.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("order_cnt"),
            rfix(F.sum("o_totalprice")).alias("revenue"),
        )
        .select(
            F.when(F.shiftright("gid", 1).bitwiseAND(1) == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            F.when(F.col("gid").bitwiseAND(1) == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            "gid",
            "order_cnt",
            "revenue",
        )
    )


@register(
    "w5_segment_spend_quartiles",
    oracle=f"""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, c.c_custkey AS custkey,
               {rfix_sql('sum(o.o_totalprice)')} AS total_spent,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT segment, CAST(custkey AS BIGINT) AS custkey, total_spent, n_orders,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           {rfix_sql('cume_dist() OVER w', 6)} AS cume,
           {rfix_sql('coalesce(total_spent - lead(total_spent) OVER w, 0)')} AS gap_to_next,
           {rfix_sql('first_value(total_spent) OVER w')} AS segment_top
    FROM spend
    WINDOW w AS (PARTITION BY segment ORDER BY total_spent DESC, custkey)
    """,
    tags=("W5", "W2"),
)
def w5_segment_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows per market segment: spend quartile (ntile),
    cumulative share of rank (cume_dist), gap to the next-ranked customer
    (lead), and the segment leader (first_value) in one window pass.

    The window input is the per-customer aggregate, not the fact, and is
    PARTITIONED by segment — no global sort, so the plan scales with the
    widest segment, not the table (SURVEY §2.5: the reference has no
    window functions at all). Ordering is made unique with the rounded
    spend + custkey tiebreak so ntile/lead are deterministic on both
    engines.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("c_custkey").alias("custkey"))
        .agg(
            rfix(F.sum("o_totalprice")).alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.partitionBy("segment").orderBy(F.desc("total_spent"), F.asc("custkey"))
    return spend.select(
        "segment",
        F.col("custkey").cast("long"),
        "total_spent",
        "n_orders",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        rfix(F.cume_dist().over(w), 6).alias("cume"),
        rfix(
            F.coalesce(F.col("total_spent") - F.lead("total_spent").over(w), F.lit(0))
        ).alias("gap_to_next"),
        rfix(F.first("total_spent").over(w)).alias("segment_top"),
    )


@register(
    "w6_sliding_30day_avg",
    oracle=f"""
    SELECT CAST(o_custkey AS BIGINT) AS custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day_no,
           {cavg_sql("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate) // 86400 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)",
                     "count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate) // 86400 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)")} AS avg_30d,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate) // 86400 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt_30d
    FROM orders
    """,
    tags=("W6", "W3"),
)
def w6_sliding_30day_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based sliding window: per customer, the average and count of
    orders in the trailing 30 DAYS — a RANGE frame over the event-time
    axis, not a ROWS frame over positions (w3): rows 40 days apart do not
    see each other even when adjacent in sequence, and tied days share
    one frame. Frame bounds are on integer day numbers (orders carry
    midnight timestamps; epoch//86400 ≡ unix_date), identical on both
    engines. One shuffle on custkey, like every window here.

    Reference analog: none — review_trends (webapp/mysql_routes.py:708-760)
    buckets by calendar month because MySQL 8.0 window RANGE frames were
    not used anywhere in the codebase.
    """
    o = table(spark, sf_dir, "orders")
    # orders carry midnight stamps; unix_date(to_date) is the tz-free day
    # number and works whether parquet surfaces TIMESTAMP or TIMESTAMP_NTZ
    day_no = F.unix_date(F.to_date("o_orderdate"))
    w = (
        Window.partitionBy("custkey")
        .orderBy("day_no")
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").cast("long").alias("custkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        day_no.cast("long").alias("day_no"),
        "o_totalprice",
    ).select(
        "custkey",
        "order_date",
        "day_no",
        cavg(F.sum("o_totalprice").over(w), F.count("*").over(w)).alias("avg_30d"),
        F.count("*").over(w).cast("long").alias("cnt_30d"),
    )


@register(
    "a_unpivot_status_counts",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS cnt_open,
               CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS cnt_filled,
               CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS cnt_partial
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, cnt
    FROM wide
    UNPIVOT (cnt FOR status IN (cnt_open AS 'open', cnt_filled AS 'filled',
                                cnt_partial AS 'partial'))
    """,
    tags=("F9", "A4", "UNPIVOT"),
)
def a_unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then melt back to long form (unpivot via ``stack``) — the
    wide↔long reshape every feature-table pipeline needs; the reference
    reshapes in dashboard JS instead (year_comparison Python pivot,
    webapp/mysql_routes.py:863-898). The wide aggregate is one conditional-
    count pass (A4); stack() is a zero-shuffle projection.
    """
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).cast("long").alias("cnt_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).cast("long").alias("cnt_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).cast("long").alias("cnt_partial"),
    )
    return wide.select(
        "o_orderpriority",
        F.expr(
            "stack(3, 'open', cnt_open, 'filled', cnt_filled, 'partial', cnt_partial) "
            "AS (status, cnt)"
        ),
    )


@register(
    "a_mode_priority_per_segment",
    oracle="""
    SELECT segment, priority AS mode_priority, CAST(cnt AS BIGINT) AS cnt
    FROM (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               count(*) AS cnt,
               row_number() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY count(*) DESC, o.o_orderpriority) AS rn
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    WHERE rn = 1
    """,
    tags=("A-mode", "A2", "W1"),
)
def a_mode_priority_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value (statistical mode) per group, with a
    deterministic tie-break — built as count + rank rather than F.mode(),
    whose tie behavior is engine-defined and therefore un-oracle-able.
    The window input is the (segment, priority) aggregate — 25 rows — so
    the rank pass is free at any scale; the count shuffle dominates.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    counts = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("segment").orderBy(F.desc("cnt"), F.asc("priority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("segment", F.col("priority").alias("mode_priority"), "cnt")
    )


@register(
    "a_array_assembly_per_user",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|')
               AS types_seen,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("A-array", "F10", "A8"),
)
def a_array_assembly_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-result assembly: per user, the SORTED distinct event types
    assembled per key — the grouping-into-example step of a training
    pipeline (assembling chunks/labels per key into one nested row).
    collect_set order is partition-dependent, so the array is canonical-
    ized with sort_array. The registered result renders the array as a
    '|'-joined string so external harnesses that canonicalize via pandas
    (which cannot hash list cells) can sort/hash it; the nested ArrayType
    capability itself is exercised by tests/test_parity.py's array
    variant. One shuffle.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.concat_ws("|", F.sort_array(F.collect_set("event_type"))).alias(
            "types_seen"
        ),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


@register(
    "o5_keyset_page",
    oracle="""
    WITH page1 AS (
        SELECT c_name, c_custkey FROM customer
        ORDER BY c_name, c_custkey LIMIT 40
    ),
    cur AS (
        SELECT c_name AS cn, c_custkey AS ck FROM page1
        ORDER BY c_name DESC, c_custkey DESC LIMIT 1
    )
    SELECT c_custkey, c_name
    FROM customer, cur
    WHERE (c_name, c_custkey) > (cn, ck)
    ORDER BY c_name, c_custkey
    LIMIT 20
    """,
    tags=("O4", "O3"),
)
def o5_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination — the scale-correct alternative to
    o4's LIMIT/OFFSET: the client passes the last row's sort key back, and
    the page is WHERE (keys) > cursor ORDER BY LIMIT k.

    OFFSET n must produce and discard n rows per partition before the
    merge (TakeOrdered still sorts everything ahead of the offset); the
    seek predicate instead prunes at the scan — on a sort-keyed layout it
    skips whole files via min/max statistics, making page 10,000 cost the
    same as page 1. The cursor here is derived from the previous page
    deterministically (the driver cannot pass one in); production callers
    supply it as two literals. Tuple comparison is expressed as a struct
    comparison, which Spark and SQL define identically (lexicographic by
    field position).
    """
    c = table(spark, sf_dir, "customer")
    cur = (
        c.select("c_name", "c_custkey")
        .orderBy("c_name", "c_custkey")
        .limit(40)
        .orderBy(F.desc("c_name"), F.desc("c_custkey"))
        .limit(1)
        .select(F.col("c_name").alias("cn"), F.col("c_custkey").alias("ck"))
    )
    key = F.struct(F.col("c_name").alias("k1"), F.col("c_custkey").alias("k2"))
    cursor = F.struct(F.col("cn").alias("k1"), F.col("ck").alias("k2"))
    return (
        c.crossJoin(F.broadcast(cur))
        .filter(key > cursor)
        .select("c_custkey", "c_name")
        .orderBy("c_name", "c_custkey")
        .limit(20)
    )


@register(
    "a_filtered_aggregates",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_big,
           {rfix_sql("coalesce(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 0)")}
               AS urgent_value,
           CAST(count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
                AS BIGINT) AS n_big_buyers
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("A9", "A2"),
)
def a_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates — several differently-predicated measures
    in ONE aggregation pass (ANSI `agg FILTER (WHERE ...)`), instead of the
    reference's N separate conditional-sum queries per dashboard card.

    One scan, one exchange, every measure partially aggregated map-side;
    the conditional logic is evaluated per-row before the partial, so
    adding a measure adds zero I/O. The distinct-with-filter measure shows
    the two compose (it expands to its own distinct aggregation path but
    still shares the scan).
    """
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.expr("count(*) FILTER (WHERE o_totalprice > 200000)")
        .cast("long")
        .alias("n_big"),
        rfix(
            F.coalesce(
                F.expr(
                    "sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT')"
                ),
                F.lit(0.0),
            )
        ).alias("urgent_value"),
        F.expr("count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)")
        .cast("long")
        .alias("n_big_buyers"),
    )


@register(
    "j13_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {rfix_sql('sum(l_extendedprice * (1 - l_discount))')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    tags=("J1", "J8", "P2"),
)
def j13_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): 6-way join where the
    interesting predicate CROSSES branches — the customer's nation must
    equal the supplier's nation — so this is not a pure star: the
    fact-side join carries both foreign keys until they meet.

    Scale plan: lineitem joins orders on the shuffle; customer, supplier,
    nation, region all broadcast (dimension-sized); the year filter on
    orders is a pushed parquet range predicate that prunes before the
    shuffle. One exchange for the fact join + one for the final rollup.
    """
    c = F.broadcast(table(spark, sf_dir, "customer"))
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ'1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ'1997-01-01 00:00:00'"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            rfix(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "j14_unshipped_value_topk",
    oracle=f"""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           {rfix_sql('sum(l_extendedprice * (1 - l_discount))')} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           o_orderpriority
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J1", "O1", "O3"),
)
def j14_unshipped_value_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-value not-yet-shipped orders at a cutoff date (TPC-H Q3
    shape): ordered-before / shipped-after predicates on BOTH join sides,
    group at order grain, deterministic top-10.

    Both date filters are pushed parquet range predicates, so the join
    sees only the pruned slices; the rollup groups on the join key the
    fact is already shuffled by (no second exchange); the top-10 is
    TakeOrderedAndProject. The orderdate travels as a grouping column and
    is emitted as an ISO day string (timezone-free on both engines).
    """
    cutoff = "TIMESTAMP_NTZ'1998-06-01 00:00:00'"
    o = table(spark, sf_dir, "orders").filter(F.expr(f"o_orderdate < {cutoff}"))
    li = table(spark, sf_dir, "lineitem").filter(F.expr(f"l_shipdate > {cutoff}"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            rfix(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "w_pandas_zscore_outliers",
    oracle=f"""
    WITH c AS (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cx
        FROM orders
    ),
    s AS (
        SELECT o_orderstatus,
               CAST(sum(cx) AS DOUBLE) AS sx,
               CAST(sum(cx * cx) AS DOUBLE) AS sxx,
               CAST(count(*) AS DOUBLE) AS n
        FROM c GROUP BY o_orderstatus
    ),
    m AS (
        SELECT o_orderstatus,
               sx / n / 100 AS m,
               sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0)) / 100 AS sd
        FROM s
    ),
    z AS (
        SELECT c.o_orderstatus, o_orderkey,
               (o_totalprice - m.m) / m.sd AS z
        FROM c JOIN m USING (o_orderstatus)
    )
    SELECT o_orderstatus, CAST(o_orderkey AS BIGINT) AS o_orderkey,
           {rfix_sql('z', 4)} AS zscore
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY abs(z) DESC, o_orderkey) AS rn FROM z)
    WHERE rn <= 3
    """,
    tags=("UDF", "W1"),
)
def w_pandas_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier extraction through a grouped Pandas kernel
    (§2.10's applyInPandas surface, under the full oracle gate): top-3
    |z-score| orders per status, z computed and ranked inside an
    Arrow-batched kernel.

    Division of labor is deliberate: the group moments are EXACT
    integer-cent sums — prices are 2-decimal, so cents are int64, and
    sum(cx)/sum(cx²) are exact integers in any accumulation order (the
    squared sum via 128-bit-safe aggregation; overflow bound ~9e18 cents²
    per group, documented, with DECIMAL the production answer) — then
    mean/stddev derive from those identical integers with identical
    float ops on both engines, so the kernel's inputs are bit-identical
    by construction rather than by rounding. Rounded moments are NOT
    safe here: a money mean can land bit-exactly on the rounding
    boundary where 1-ulp partial-merge noise flips the digit. The kernel
    does the per-row arithmetic and the per-group selection. One shuffle
    (the applyInPandas grouping); each group crosses the Arrow boundary
    once.
    """
    import pandas as pd

    o = table(spark, sf_dir, "orders")
    cx = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    c = o.select("o_orderstatus", "o_orderkey", "o_totalprice", cx.alias("cx"))
    # squared cents in DECIMAL(38,0), not long (the ml_pca_2d discipline):
    # cx² ~ 1e14-3e15 per row, so a LONG sum overflows near ~1e5 rows per
    # group — exactly sf0.1's group size (caught by the first full-registry
    # sf0.1 sweep, r8). DECIMAL(38,0) keeps the sum exact to ~1e38 cents²
    # and casts to the same double as DuckDB's HUGEINT on the oracle side.
    cxd = F.col("cx").cast("decimal(38,0)")
    s = c.groupBy("o_orderstatus").agg(
        F.sum("cx").cast("double").alias("sx"),
        F.sum(cxd * cxd).cast("double").alias("sxx"),
        F.count("*").cast("double").alias("n"),
    )
    stats = s.select(
        "o_orderstatus",
        (F.col("sx") / F.col("n") / 100).alias("m"),
        (
            F.sqrt(
                F.greatest(
                    (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                    / (F.col("n") - 1),
                    F.lit(0.0),
                )
            )
            / 100
        ).alias("sd"),
    )
    joined = c.join(F.broadcast(stats), "o_orderstatus").select(
        "o_orderstatus", "o_orderkey", "o_totalprice", "m", "sd"
    )

    def top_outliers(pdf: pd.DataFrame) -> pd.DataFrame:
        z = (pdf["o_totalprice"] - pdf["m"]) / pdf["sd"]
        out = pd.DataFrame(
            {
                "o_orderstatus": pdf["o_orderstatus"],
                "o_orderkey": pdf["o_orderkey"],
                "z": z,
                "az": z.abs(),
            }
        )
        out = out.sort_values(["az", "o_orderkey"], ascending=[False, True]).head(3)
        return out[["o_orderstatus", "o_orderkey", "z"]]

    res = joined.groupBy("o_orderstatus").applyInPandas(
        top_outliers, "o_orderstatus string, o_orderkey long, z double"
    )
    return res.select(
        "o_orderstatus", "o_orderkey", rfix(F.col("z"), 4).alias("zscore")
    )


@register(
    "o6_null_ordering",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, band
    FROM (
        SELECT c_custkey,
               CAST(CASE WHEN c_acctbal < 0 THEN NULL
                         ELSE floor(c_acctbal / 1000) END AS BIGINT) AS band
        FROM customer
    )
    ORDER BY band ASC NULLS FIRST, c_custkey DESC
    LIMIT 50
    """,
    tags=("O1", "P8"),
)
def o6_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ORDER BY (§2.6) — the cross-engine trap
    pinned down: Spark sorts ASC with NULLS FIRST by default, ANSI/DuckDB
    with NULLS LAST, so any nullable sort key silently produces different
    pages on different engines unless the placement is spelled out. Every
    sort in this engine therefore either orders non-nullable keys or
    states placement explicitly, and this query asserts the contract
    (the null band is synthesized — the harness tables carry no NULLs).

    asc_nulls_first + desc tie-break keeps the page deterministic;
    TakeOrderedAndProject still applies (null placement is part of the
    ordering, not a post-sort filter).
    """
    c = table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.floor(F.col("c_acctbal") / 1000))
        .cast("long")
    )
    return (
        c.select(F.col("c_custkey").cast("long").alias("c_custkey"), band.alias("band"))
        .orderBy(F.col("band").asc_nulls_first(), F.col("c_custkey").desc())
        .limit(50)
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {rfix_sql('sum(l_quantity)')} AS sum_qty,
           {rfix_sql('sum(l_extendedprice)')} AS sum_base_price,
           {rfix_sql('sum(l_extendedprice * (1 - l_discount))')} AS sum_disc_price,
           {rfix_sql('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))')} AS sum_charge,
           {cavg_sql('sum(l_quantity)', 'count(*)')} AS avg_qty,
           {cavg_sql('sum(l_extendedprice)', 'count(*)')} AS avg_price,
           {cavg_sql('sum(l_discount)', 'count(*)', 4)} AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A3", "A1", "P3"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical wide-aggregate scan
    (8 aggregates over a filtered fact, tiny group cardinality) — the
    reference's summary-table rebuild workload generalized
    (init/mysql_loader.py summary_* builds; webapp/mysql_routes.py:49-54).

    Scale shape: the single most scan-bound plan in the book — filter and
    2-column-group pushdown reach parquet, every aggregate is map-side
    partial (sum/count), the shuffle carries ~|flags × statuses| rows per
    partition. The canonical 100 TB smoke test: if this plan isn't
    scan-dominated, the cluster is misconfigured. Averages derive from
    the rounded sums (cavg) so both engines round identically.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rfix(F.sum("l_quantity")).alias("sum_qty"),
            rfix(F.sum("l_extendedprice")).alias("sum_base_price"),
            rfix(F.sum(disc_price)).alias("sum_disc_price"),
            rfix(F.sum(charge)).alias("sum_charge"),
            cavg(F.sum("l_quantity"), cnt).alias("avg_qty"),
            cavg(F.sum("l_extendedprice"), cnt).alias("avg_price"),
            cavg(F.sum("l_discount"), cnt, 4).alias("avg_disc"),
            cnt.cast("long").alias("count_order"),
        )
    )


@register(
    "w7_activity_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, ts::DATE AS d FROM events
    ),
    grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, count(*) AS streak
        FROM grp GROUP BY user_id, island
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(streak) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(streak) AS BIGINT) AS longest_streak
    FROM streaks
    GROUP BY user_id
    """,
    tags=("W3", "T8", "F1"),
)
def w7_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands per user: runs of CONSECUTIVE active days found by
    the date-minus-row_number trick (consecutive days share `day - rn`),
    yielding streak count / longest streak — the calendar-grain
    engagement-streak companion to t8's 30-minute sessionization
    (reference's user-activity timeline, webapp/mongodb_routes.py user
    stats, at day grain).

    Scale shape: ONE hash exchange on user_id serves the distinct, the
    window, and both group-bys — the explicit repartition("user_id")
    before the distinct is load-bearing: HashPartitioning(user_id)
    satisfies the clustered-distribution requirement of every later
    stage (user_id is a prefix of each key set), so without it the
    distinct partitions on (user_id, d) and the window immediately
    re-shuffles on user_id alone (measured: 2 exchanges → 1).
    """
    ev = table(spark, sf_dir, "events")
    days = (
        ev.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("ts").cast("date").alias("d"),
        )
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("island", F.date_sub("d", F.row_number().over(w)))
    streaks = grp.groupBy("user_id", "island").agg(F.count("*").alias("streak"))
    return streaks.groupBy("user_id").agg(
        F.sum("streak").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_islands"),
        F.max("streak").cast("long").alias("longest_streak"),
    )


@register(
    "j16_bloom_semi_filter",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s.s_suppkey
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    )
    GROUP BY l_returnflag
    """,
    tags=("J3", "S3", "bloom"),
)
def j16_bloom_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side semi-join through a Bloom prefilter
    (`operators/bloom.py`): the qualifying supplier keys are compressed
    into a ~32 KB one-row bitmap (groupBy/bit_or, exchange cardinality
    ≤ n_bits/64 REGARDLESS of build size), broadcast, and every lineitem
    row is membership-tested map-side inside whole-stage codegen; only
    survivors (matches + tunable false positives) reach the exact
    verifying semi-join, whose result equals the plain semi-join — the
    oracle is exactly that plain semi-join, so the driver hash-check
    proves the equivalence. At 100 TB this is the shape that keeps a
    dimension-membership filter from shuffling the whole fact table when
    the dimension outgrows row-broadcast range. Reference analog: the
    load-path existence filters (init/mysql_loader.py batched membership
    checks), re-expressed as a cluster-scale operator.
    """
    from ..operators.bloom import bloom_semi_join

    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    asia_keys = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r.filter(F.col("r_name") == "ASIA"), n.n_regionkey == F.col("r_regionkey"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    # broadcast_verify (r14, guide §3.1): the build side here is
    # dimension-scale (ASIA suppliers), so the exact verify join rides
    # the same broadcast regime as the bitmap — before, the planner
    # sort-merge-shuffled every Bloom survivor into the verify join
    # (SortMergeJoin LeftSemi + 2 exchanges in the before-dump), undoing
    # the prefilter's point. The fact table now never shuffles: scan →
    # bitmap test → broadcast semi join → partial agg → one
    # returnflag-keyed exchange.
    kept = bloom_semi_join(li, asia_keys, "l_suppkey", broadcast_verify=True)
    return kept.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("l_quantity").cast("long").alias("total_qty"),
    )


@register(
    "j17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey, 0.2 * avg(l_quantity) AS qlim
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_small_lines,
           {rfix_sql('sum(l.l_extendedprice)')} AS small_revenue,
           {cavg_sql('sum(l.l_quantity)', 'count(*)')} AS avg_small_qty
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qlim
    GROUP BY p.p_brand
    """,
    tags=("J7", "A3", "P3"),
)
def j17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue locked in unusually small orders: line
    items whose quantity is below 20% of their part's average quantity,
    rolled up by brand. The classic correlated scalar subquery
    (`l_quantity < 0.2 * (SELECT avg ... WHERE same part)`), decorrelated
    the way a 100 TB plan wants it: ONE per-part aggregate, then an
    equi-join back to lineitem on the SAME key, so the aggregate's
    exchange partitioning is reused by the join (lineitem shuffles once,
    the agg side not at all), and the tiny part dimension rides a
    broadcast for the brand rollup. The boundary comparison is identical
    IEEE arithmetic on both engines (integer sums are exact in double,
    same division, same 0.2 multiplier), so no row can flip sides.

    Reference analog: the correlated-subquery family of SURVEY §2 J7
    (webapp/mysql_routes.py top-N per group), here in its scalar-agg form.
    """
    li = table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qlim")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    small = (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qlim"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    )
    return small.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_small_lines"),
        rfix(F.sum("l_extendedprice")).alias("small_revenue"),
        cavg(F.sum("l_quantity"), F.count("*")).alias("avg_small_qty"),
    )


@register(
    "j18_sole_blame_supplier",
    oracle="""
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS n_blamed_lines
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
    tags=("J3", "J4", "A2"),
)
def j18_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — composed EXISTS / NOT EXISTS on the same fact with
    different correlated predicates: returned lines whose order involves
    ANOTHER supplier (semi join) but where NO other supplier's line on
    that order was returned (anti join) — "the sole supplier to blame on
    a multi-supplier order", rolled up per supplier.

    The 100 TB plan: both the semi and the anti join are hash joins on
    l_orderkey with the supplier-inequality as a residual condition —
    lineitem shuffles on orderkey ONCE and the exchange is reused across
    the l1/l2/l3 branches (same key); the supplier dimension rides a
    broadcast. No row-per-row subquery execution survives: Catalyst
    decorrelates both EXISTS into joins.

    Reference analog: composition of S3/J3 (semi) and J4 (anti), which the
    reference only ever runs singly (webapp/mysql_routes.py filtered
    loads); the composed form is the classic data-quality blame query.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("k2")
    ).alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("k3"))
        .alias("l3")
    )
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("o2"))
        & (F.col("l1.l_suppkey") != F.col("k2")),
        "left_semi",
    )
    sole = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("o3"))
        & (F.col("l1.l_suppkey") != F.col("k3")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("n_blamed_lines"))
    )
