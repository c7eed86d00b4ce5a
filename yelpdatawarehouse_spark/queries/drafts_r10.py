"""Round-10 drafts (written in round 7; registered immediately via
queries/draft_layer.register_all — the _prioritize window reserve queues
them behind the earlier never-verified cohorts, so registration order is
evidence order, not a displacement risk).

Batch 1: the TPC-H classics still absent from the registry (Q3, Q10, Q11,
Q14, Q16, Q18 — adapted to the harness schema, which has no partsupp or
shipmode columns; each docstring notes the adaptation). Batch 2: new
capability shapes (sorted-neighborhood dedup, readability / URL-density
curation signals, Page-Hinkley drift, closed-form 2D PCA).

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT, floats through rfix, money carried as exact cents
(long) wherever a comparison or ordering depends on it, argmax-over-floats
ranked on floor(x*10^n+0.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.presentation import rfix, rfix_sql
from ..sources.tables import spread, table

DRAFTS: dict = {}


# money → exact cents, the same IEEE floor(x*100+0.5) on both engines
# (identical to rfix's tie-side argument; see functions/presentation.py)
def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _cents_sql(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# TPC-H Q3: shipping priority — revenue of unshipped-as-of-date orders for
# one market segment, top 10 by revenue.

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-06-01"

Q3_ORACLE = f"""
WITH rev AS (
    SELECT l.l_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority,
           sum({_cents_sql('l.l_extendedprice * (1 - l.l_discount)')})
               AS rev_c
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{Q3_DATE}'
    GROUP BY 1, 2, 3
)
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       {rfix_sql('rev_c / 100.0', 2)} AS revenue,
       o_orderdate, o_orderpriority
FROM rev
ORDER BY rev_c DESC, l_orderkey
LIMIT 10
"""


def j24_shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): for one market segment, orders placed
    before a date with lineitems still shipping after it, ranked by open
    revenue — top 10. (Harness schema has no o_shippriority column; the
    priority string stands in.)

    Float discipline: line revenue is converted to exact cents per row
    (the rfix floor(x*100+0.5) IEEE idiom), so the per-order sums, the
    ordering, and the top-10 cutoff are all integer decisions — sum order
    can't flip a rank. Cents → dollars only in the emitted column.

    Scale shape: both date filters are pushed to the parquet scans; the
    segment-filtered customer dim broadcasts into orders; one
    orderkey-keyed exchange aggregates revenue map-side; the top-10 is
    TakeOrdered on (rev_c, l_orderkey) — no global sort.

    Reference parity: the classic warehouse top-N join
    (webapp/mysql_routes.py:75-152 top_businesses is the same
    join→filter→rank shape on the Yelp schema).
    """
    c = F.broadcast(
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = spread(table(spark, sf_dir, "lineitem")).filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev_c")
        )
    )
    return (
        rev.orderBy(F.desc("rev_c"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            rfix(F.col("rev_c") / 100.0, 2).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


DRAFTS["j24_shipping_priority_q3"] = (j24_shipping_priority_q3, Q3_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q10: returned-item reporting — customers who returned the most
# revenue in a quarter, top 20.

Q10_START = "1997-07-01"
Q10_END = "1997-10-01"

Q10_ORACLE = f"""
WITH rev AS (
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum({_cents_sql('l.l_extendedprice * (1 - l.l_discount)')})
               AS rev_c
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{Q10_START}'
      AND o.o_orderdate <  TIMESTAMP '{Q10_END}'
    GROUP BY 1, 2, 3
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       {rfix_sql('rev_c / 100.0', 2)} AS returned_revenue
FROM rev
ORDER BY rev_c DESC, c_custkey
LIMIT 20
"""


def j25_returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): customers ranked by revenue of
    items they returned in one quarter, with nation, top 20 — the churn
    triage query.

    Same exact-cents discipline as Q3: per-row cent conversion makes the
    customer rollup, ordering, and cutoff integer-exact.

    Scale shape: the returnflag + date filters are pushed to the scans;
    the quarter-filtered orders side broadcasts at test scale (size-based
    — beyond the threshold it degrades to an orderkey shuffle join); the
    rollup shuffles on custkey; the nation dim (25 rows) broadcasts;
    top-20 is TakeOrdered.
    """
    li = spread(table(spark, sf_dir, "lineitem")).filter(
        F.col("l_returnflag") == "R"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev_c")
        )
    )
    return (
        rev.orderBy(F.desc("rev_c"), F.asc("c_custkey"))
        .limit(20)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            rfix(F.col("rev_c") / 100.0, 2).alias("returned_revenue"),
        )
    )


DRAFTS["j25_returned_items_q10"] = (j25_returned_items_q10, Q10_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q14: promotion effect — the share of one month's revenue that came
# from PROMO-type parts. One row.

Q14_START = "1997-09-01"
Q14_END = "1997-10-01"

Q14_ORACLE = f"""
WITH m AS (
    SELECT sum(CASE WHEN p.p_type = 'PROMO'
                    THEN {_cents_sql('l.l_extendedprice * (1 - l.l_discount)')}
                    ELSE 0 END) AS promo_c,
           sum({_cents_sql('l.l_extendedprice * (1 - l.l_discount)')})
               AS total_c
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_START}'
      AND l.l_shipdate <  TIMESTAMP '{Q14_END}'
)
SELECT {rfix_sql('100.0 * promo_c / total_c', 6)} AS promo_revenue_pct,
       {rfix_sql('promo_c / 100.0', 2)} AS promo_revenue,
       {rfix_sql('total_c / 100.0', 2)} AS total_revenue
FROM m
"""


def j26_promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one shipping month's
    revenue from PROMO parts. Numerator and denominator are exact-cent
    sums (order-independent longs), so the single emitted ratio is a
    division of two integers — bit-equal on both engines.

    Scale shape: the ship-month filter prunes the fact scan; the part dim
    broadcasts (partkey→type is dimension-sized); ONE conditional
    aggregate computes both sums in a single pass — no second scan for
    the denominator.
    """
    li = spread(table(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit(Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_END).cast("timestamp"))
    )
    p = F.broadcast(table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    m = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0)).alias(
                "promo_c"
            ),
            F.sum(cents).alias("total_c"),
        )
    )
    return m.select(
        rfix(F.lit(100.0) * F.col("promo_c") / F.col("total_c"), 6).alias(
            "promo_revenue_pct"
        ),
        rfix(F.col("promo_c") / 100.0, 2).alias("promo_revenue"),
        rfix(F.col("total_c") / 100.0, 2).alias("total_revenue"),
    )


DRAFTS["j26_promo_revenue_q14"] = (j26_promo_revenue_q14, Q14_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q11 (adapted): important parts — parts whose revenue share of the
# whole fact table exceeds a fraction; the HAVING-against-global-scalar
# shape. (No partsupp table in the harness; lineitem revenue stands in for
# stock value.)

Q11_SHARE_BP = 10  # threshold: share > 10 basis points (0.1%)

Q11_ORACLE = f"""
WITH by_part AS (
    SELECT l_partkey,
           CAST(sum({_cents_sql('l_extendedprice * (1 - l_discount)')})
                AS BIGINT) AS rev_c
    FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS t FROM by_part)
SELECT CAST(b.l_partkey AS BIGINT) AS l_partkey,
       {rfix_sql('b.rev_c / 100.0', 2)} AS part_revenue,
       {rfix_sql('b.rev_c::DOUBLE / t::DOUBLE', 8)} AS revenue_share
FROM by_part b, tot
WHERE b.rev_c * 10000 > t * {Q11_SHARE_BP}
ORDER BY b.rev_c DESC, b.l_partkey
"""


def j27_important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock, adapted to lineitem revenue): parts
    whose share of total revenue exceeds a global fraction — the
    HAVING-against-a-global-scalar pattern.

    The share test is integer arithmetic (rev_c·10000 > t·bp on exact
    cents), so membership can't flip on a ULP; the emitted share is
    informational float. At 100 TB the same plan holds: the threshold is
    a 1-row broadcast, never a second fact pass (the by-part rollup is
    reused for both sides of the comparison via ReusedExchange).

    Scale shape: one partkey-keyed fact collapse (map-side combinable);
    the global total is a 1-row aggregate OF THE ROLLUP (part-domain
    sized, not fact-sized) broadcast back; output is share-filtered and
    sorted on the bounded survivor set.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    by_part = li.groupBy("l_partkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("rev_c")
    )
    tot = F.broadcast(by_part.agg(F.sum("rev_c").alias("t")))
    return (
        by_part.crossJoin(tot)
        .filter(F.col("rev_c") * 10000 > F.col("t") * Q11_SHARE_BP)
        .orderBy(F.desc("rev_c"), F.asc("l_partkey"))
        .select(
            F.col("l_partkey").cast("long").alias("l_partkey"),
            rfix(F.col("rev_c") / 100.0, 2).alias("part_revenue"),
            rfix(
                F.col("rev_c").cast("double") / F.col("t").cast("double"), 8
            ).alias("revenue_share"),
        )
    )


DRAFTS["j27_important_parts_q11"] = (j27_important_parts_q11, Q11_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q16 (adapted): supplier relationship — how many distinct suppliers
# serve each (brand, size) slice, excluding suppliers on a complaint list
# (negative account balance stands in; no partsupp/comment in the harness).

Q16_ORACLE = """
WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
pairs AS (
    SELECT DISTINCT p.p_brand, p.p_size, l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
)
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(*) AS BIGINT) AS supplier_cnt
FROM pairs
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def j28_supplier_relationship_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier relationship, adapted): distinct suppliers per
    (brand, size) slice, excluding a complaint list — the
    count-distinct-over-join-with-NOT-IN shape. Exact integer counts.

    Scale shape: the exclusion list is dimension-sized and applied as a
    broadcast anti-join BEFORE the part join (prune early); the distinct
    collapses on (brand, size, suppkey) — bounded by |parts slices| ×
    |suppliers|, not by facts; counts are a second bounded rollup.
    """
    li = spread(table(spark, sf_dir, "lineitem")).select(
        "l_partkey", "l_suppkey"
    )
    bad = F.broadcast(
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = F.broadcast(
        table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    pairs = (
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .select(
            "p_brand",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
        )
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


DRAFTS["j28_supplier_relationship_q16"] = (
    j28_supplier_relationship_q16,
    Q16_ORACLE,
)


# ---------------------------------------------------------------------------
# TPC-H Q18: large-volume customers — orders whose total quantity exceeds a
# threshold, with the customer, biggest first.

Q18_MIN_QTY = 300

Q18_ORACLE = f"""
WITH big AS (
    SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {Q18_MIN_QTY}
)
SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {rfix_sql('o.o_totalprice', 2)} AS o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY b.total_qty DESC, o.o_orderkey
"""


def j29_large_volume_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose summed quantity
    exceeds a threshold, joined back to order + customer, biggest first.
    Quantities are integer-valued doubles, so the sum, HAVING cutoff, and
    ordering are exact (< 2^53).

    Scale shape: one orderkey-keyed quantity rollup (map-side combinable)
    produces a SMALL survivor set (the HAVING is highly selective —
    broadcastable by construction), which then broadcast-joins into
    orders and customer; the fact table is scanned once.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > Q18_MIN_QTY)
        .select("l_orderkey", F.col("qty").cast("long").alias("total_qty"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            rfix("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


DRAFTS["j29_large_volume_q18"] = (j29_large_volume_q18, Q18_ORACLE)


# ---------------------------------------------------------------------------
# Batch 2: new capability shapes.
# ---------------------------------------------------------------------------

from ..functions import text as T  # noqa: E402
from ..operators.ranks import exact_global_rank  # noqa: E402

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (SNM, Hernández & Stolfo 1995): sort the corpus
# by a blocking key, compare each record only with its w nearest neighbors
# in sort order — the classic entity-resolution blocking that catches
# near-dups whose LSH signatures just miss a band.

SNM_WINDOW = 4
SNM_THRESHOLD = 0.3

SNM_ORACLE = f"""
WITH docs AS (
    SELECT doc_id,
           COALESCE({_NORM_SQL}, '') AS norm,
           list_distinct(string_split(COALESCE({_NORM_SQL}, ''), ' ')) AS toks
    FROM documents
),
ranked AS (
    SELECT doc_id, toks,
           row_number() OVER (
               ORDER BY substr(norm, 1, 24), doc_id) AS rn
    FROM docs
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.rn - a.rn AS BIGINT) AS rank_dist,
           len(list_intersect(a.toks, b.toks))::DOUBLE /
             (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
             AS j
    FROM ranked a
    JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       rank_dist, {rfix_sql('j', 4)} AS jaccard
FROM pairs
WHERE j >= {SNM_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking: global sort by a blocking key
    (normalized-text 24-char prefix), then token-Jaccard only against the
    next SNM_WINDOW neighbors in sort order — O(n·w) comparisons instead
    of O(n²), the classic complement to LSH banding (it catches near-dups
    that share a prefix but differ in a band).

    Spark-first: the global sort is operators/ranks.exact_global_rank
    (range partition + pid-local windows + broadcast offsets — no single
    task ever sorts the corpus); neighbor pairing is ONE equality join on
    rank after exploding each doc into its w successor ranks (sequence +
    explode), so the "window join" is a plain shuffle join on an int key.
    Jaccard is exact set arithmetic on distinct normalized tokens.

    Scale shape: rank exchange + one rank-keyed join, both O(n·w); no
    cross join anywhere. The blocking key's uniqueness requirement is met
    by suffixing doc_id (same contract the oracle's ORDER BY uses).
    """
    d = table(spark, sf_dir, "documents")
    # NULL text coalesced to '' (ADVICE r7): otherwise concat_ws silently
    # drops the NULL bkey and the doc sorts among digit-prefixed keys while
    # the oracle's ORDER BY sorts NULLs last — a parity divergence.
    norm = F.coalesce(T.normalize("text"), F.lit(""))
    docs = d.select(
        "doc_id",
        F.substring(norm, 1, 24).alias("bkey"),
        F.array_distinct(F.split(norm, " ")).alias("toks"),
    )
    # unique orderable composite key: blocking prefix then doc_id
    keyed = docs.withColumn(
        "skey", F.concat_ws("\x01", F.col("bkey"), F.lpad(F.col("doc_id").cast("string"), 12, "0"))
    )
    # Pinning note (r9, was stale): exact_global_rank now localCheckpoints
    # its ranged input INTERNALLY (spark_partition_id correctness, r8) —
    # so the wide-row (token-array) frame IS checkpointed here whether or
    # not 2x reuse amortizes it. No extra pin is added on top; narrowing
    # the checkpoint by ranking doc_id-only and re-joining toks would just
    # move the wide rows into a twice-evaluated join subtree (same bytes,
    # plus a shuffle) — measured trade recorded in SCALING.md "Pinned-rank
    # operators at 20x (round 9)".
    # r14 (guide §1.2): pin the RANKED output too — exact_global_rank
    # returns a lazy frame over its internally-pinned ranged input, and
    # the left/right join sides below each re-ran the local-rank window +
    # offsets aggregate + broadcast join (the r13 before-plan shows the
    # sort+window pipeline 4x: 2 consumers x the rank's 2 subplans). One
    # more node-scale materialization buys a single ranking pass.
    from ..operators.iterative import pin

    ranked = pin(
        exact_global_rank(keyed, "skey", rank_col="rn").drop("skey", "bkey"),
        label="snm_ranked",
    )
    right = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("rn").alias("rn_b"),
    )
    left = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.explode(F.sequence(F.col("rn") + 1, F.col("rn") + SNM_WINDOW)).alias("rn_b"),
        F.col("rn").alias("rn_a"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    j = inter.cast("double") / union
    return (
        left.join(right, "rn_b")
        .withColumn("jaccard_raw", j)
        .filter(F.col("jaccard_raw") >= SNM_THRESHOLD)
        .select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            (F.col("rn_b") - F.col("rn_a")).cast("long").alias("rank_dist"),
            rfix("jaccard_raw", 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


DRAFTS["dedup_sorted_neighborhood"] = (dedup_sorted_neighborhood, SNM_ORACLE)


# ---------------------------------------------------------------------------
# Readability scoring per source: Flesch reading ease from integer text
# statistics (words, sentence marks, vowel-group syllable proxy) — a
# corpus-curation quality signal (too-hard / too-degenerate text).

READ_ORACLE = f"""
WITH per_doc AS (
    SELECT source,
           len(string_split_regex(text, '\\s+')) AS w,
           greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS s,
           greatest(len(regexp_extract_all(lower(text), '[aeiou]+')), 1) AS v
    FROM documents
),
per_src AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS total_words,
           CAST(sum(s) AS BIGINT) AS total_sentences,
           CAST(sum(v) AS BIGINT) AS total_syllables
    FROM per_doc GROUP BY source
)
SELECT source, n_docs, total_words, total_sentences, total_syllables,
       {rfix_sql(
           "206.835 - 1.015 * (total_words::DOUBLE / total_sentences::DOUBLE)"
           " - 84.6 * (total_syllables::DOUBLE / total_words::DOUBLE)", 4)}
           AS flesch_ease
FROM per_src
ORDER BY source
"""


def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source from integer text statistics: words
    (whitespace tokens), sentence marks ([.!?], floored at 1), and a
    vowel-group syllable proxy (floored at 1) — the classic readability
    screen a curation pipeline runs next to perplexity.

    Every aggregate is an exact integer sum; the single float formula runs
    once per source on bit-identical integers, so the emitted score is
    deterministic on both engines. One source-keyed exchange; the regex
    counting is per-row JVM codegen (no UDF).
    """
    d = spread(table(spark, sf_dir, "documents"))
    per_doc = d.select(
        "source",
        F.size(T.tokens("text")).alias("w"),
        F.greatest(F.regexp_count("text", F.lit(r"[.!?]")), F.lit(1)).alias("s"),
        F.greatest(
            F.regexp_count(F.lower("text"), F.lit(r"[aeiou]+")), F.lit(1)
        ).alias("v"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("total_words"),
        F.sum("s").cast("long").alias("total_sentences"),
        F.sum("v").cast("long").alias("total_syllables"),
    )
    tw = F.col("total_words").cast("double")
    return per_src.select(
        "source",
        "n_docs",
        "total_words",
        "total_sentences",
        "total_syllables",
        rfix(
            F.lit(206.835)
            - F.lit(1.015) * (tw / F.col("total_sentences").cast("double"))
            - F.lit(84.6) * (F.col("total_syllables").cast("double") / tw),
            4,
        ).alias("flesch_ease"),
    ).orderBy("source")


DRAFTS["text_readability_scores"] = (text_readability_scores, READ_ORACLE)


# ---------------------------------------------------------------------------
# URL / e-mail density per source — the C4-style structural-noise screen
# (pages that are mostly links are boilerplate, not prose).

URLMAIL_ORACLE = f"""
WITH per_doc AS (
    SELECT source,
           len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_urls,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           len(string_split_regex(text, '\\s+')) AS w
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_urls) AS BIGINT) AS total_urls,
       CAST(sum(n_emails) AS BIGINT) AS total_emails,
       CAST(count(*) FILTER (WHERE n_urls > 0) AS BIGINT) AS docs_with_url,
       {rfix_sql('sum(n_urls)::DOUBLE / sum(w)::DOUBLE', 6)} AS url_token_density
FROM per_doc
GROUP BY source
ORDER BY source
"""


def text_url_email_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-noise screen per source: URL and e-mail counts, the share
    of docs containing a URL, and URL-per-token density — the C4-style
    boilerplate signal (link farms have high URL density, prose near
    zero). Exact integer counts; the one emitted ratio divides two exact
    sums. One source-keyed exchange, regex counting in codegen.
    """
    d = spread(table(spark, sf_dir, "documents"))
    per_doc = d.select(
        "source",
        F.regexp_count("text", F.lit(r"https?://[^\s]+")).alias("n_urls"),
        F.regexp_count(
            "text", F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        ).alias("n_emails"),
        F.size(T.tokens("text")).alias("w"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_urls").cast("long").alias("total_urls"),
            F.sum("n_emails").cast("long").alias("total_emails"),
            F.sum((F.col("n_urls") > 0).cast("long")).cast("long").alias("docs_with_url"),
            F.sum("w").alias("tw"),
        )
        .select(
            "source",
            "n_docs",
            "total_urls",
            "total_emails",
            "docs_with_url",
            rfix(
                F.col("total_urls").cast("double") / F.col("tw").cast("double"), 6
            ).alias("url_token_density"),
        )
        .orderBy("source")
    )


DRAFTS["text_url_email_density"] = (text_url_email_density, URLMAIL_ORACLE)


# ---------------------------------------------------------------------------
# Page-Hinkley drift on daily revenue — the sequential mean-shift statistic
# (PH_t = m_t - min m, m_t = Σ (x_i - x̄_i)) as a bounded top-10 digest.

PH_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           {rfix_sql('sum(o_totalprice)', 2)} AS rev
    FROM orders GROUP BY 1
),
ord AS (
    SELECT d, rev,
           row_number() OVER (ORDER BY d) AS rn,
           sum(rev) OVER (ORDER BY d) AS cs
    FROM daily
),
terms AS (SELECT d, rev, rev - cs / rn AS term FROM ord),
m AS (SELECT d, rev, sum(term) OVER (ORDER BY d) AS mt FROM terms),
ph AS (SELECT d, rev, mt - min(mt) OVER (ORDER BY d) AS ph FROM m)
SELECT strftime(d, '%Y-%m-%d') AS day,
       rev AS daily_revenue,
       {rfix_sql('ph', 2)} AS ph_score
FROM ph
ORDER BY floor(ph * 100 + 0.5) DESC, d
LIMIT 10
"""


def t33_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift detection on the daily-revenue series: the
    running deviation-from-running-mean sum m_t and its drawdown
    PH_t = m_t − min_{i≤t} m_i — the classic sequential drift statistic
    (the online cousin of t29's offline binary segmentation; delta = 0, so
    PH is the raw upward-shift evidence). Emitted as the top-10 PH days
    (floor-canonicalized rank, day tie-break) — the bounded digest form.

    Float discipline: daily revenue is canonicalized (rfix 2); every
    downstream quantity is ORDERED-window arithmetic (cumsum, running
    mean, cumsum of terms, cummin) — sequential accumulation in day order
    on both engines, the established deterministic idiom.

    Scale shape: one day-keyed fact collapse, then three window passes
    over the CALENDAR spine (O(days) rows); the digest is TakeOrdered.
    """
    o = spread(table(spark, sf_dir, "orders"))
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        rfix(F.sum("o_totalprice"), 2).alias("rev")
    )
    w_ord = Window.orderBy("d")
    ordd = daily.select(
        "d",
        "rev",
        F.row_number().over(w_ord).alias("rn"),
        F.sum("rev").over(w_ord).alias("cs"),
    )
    terms = ordd.select(
        "d", "rev", (F.col("rev") - F.col("cs") / F.col("rn")).alias("term")
    )
    m = terms.select("d", "rev", F.sum("term").over(w_ord).alias("mt"))
    ph = m.select(
        "d", "rev", (F.col("mt") - F.min("mt").over(w_ord)).alias("ph")
    )
    return (
        ph.orderBy(F.floor(F.col("ph") * 100 + 0.5).desc(), F.col("d").asc())
        .limit(10)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("rev").alias("daily_revenue"),
            rfix("ph", 2).alias("ph_score"),
        )
    )


DRAFTS["t33_page_hinkley_drift"] = (t33_page_hinkley_drift, PH_ORACLE)


# ---------------------------------------------------------------------------
# Closed-form 2D PCA on (quantity, price) — covariance from EXACT integer
# moments, eigenvalues by the quadratic formula. The smallest real PCA:
# every engine-vs-oracle bit of it is decided by integer sums.

PCA_ORACLE = f"""
WITH m AS (
    SELECT count(*)::BIGINT AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::HUGEINT AS sy,
           sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))::HUGEINT AS sxx,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)::HUGEINT
               * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)::HUGEINT) AS syy,
           sum(CAST(l_quantity AS BIGINT)
               * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::HUGEINT AS sxy
    FROM lineitem
),
cov AS (
    SELECT n,
           (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / n AS a,
           (sxy::DOUBLE / 100.0 - sx::DOUBLE * (sy::DOUBLE / 100.0) / n) / n AS b,
           (syy::DOUBLE / 10000.0
             - (sy::DOUBLE / 100.0) * (sy::DOUBLE / 100.0) / n) / n AS c
    FROM m
),
eig AS (
    SELECT n, a, b, c,
           (a + c + sqrt((a - c) * (a - c) + 4 * b * b)) / 2 AS lam1,
           (a + c - sqrt((a - c) * (a - c) + 4 * b * b)) / 2 AS lam2
    FROM cov
)
SELECT CAST(n AS BIGINT) AS n_rows,
       {rfix_sql('lam1', 4)} AS eigenvalue_1,
       {rfix_sql('lam2', 4)} AS eigenvalue_2,
       {rfix_sql('lam1 / (lam1 + lam2)', 6)} AS explained_ratio_1,
       {rfix_sql('(lam1 - a) / b', 6)} AS pc1_slope
FROM eig
"""


def ml_pca_2d_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-D PCA over (l_quantity, l_extendedprice): covariance
    entries from EXACT integer moments (quantities are integer-valued;
    prices go through the floor(x*100+0.5) cents idiom; squares/cross
    terms accumulate in decimal(38,0)/HUGEINT — order-independent), then
    eigenvalues by the 2×2 quadratic formula and the PC1 direction as a
    slope ratio. sqrt is IEEE-correctly-rounded on both engines, so the
    emitted floats are pure functions of the integer moments; no atan2
    (libm-dependent) anywhere.

    Scale shape: ONE map-side-combinable aggregate pass over the fact
    scan (5 moment sums + count) — the canonical one-pass sufficient-
    statistics reduction every distributed ML fit builds on; the eigen
    algebra runs on a 1-row frame.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    qty = F.col("l_quantity").cast("long")
    cents = _cents(F.col("l_extendedprice"))
    dec = "decimal(38,0)"
    m = li.agg(
        F.count("*").alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(cents.cast(dec)).alias("sy"),
        F.sum((qty * qty).cast(dec)).alias("sxx"),
        F.sum(cents.cast(dec) * cents.cast(dec)).alias("syy"),
        F.sum((qty * cents).cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double") / 100.0
    cov = m.select(
        F.col("n"),
        ((F.col("sxx").cast("double") - sx * sx / n) / n).alias("a"),
        ((F.col("sxy").cast("double") / 100.0 - sx * sy_d / n) / n).alias("b"),
        (
            (F.col("syy").cast("double") / 10000.0 - sy_d * sy_d / n) / n
        ).alias("c"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    disc = F.sqrt((a - c) * (a - c) + 4 * b * b)
    eig = cov.select(
        F.col("n"),
        a,
        b,
        c,
        ((a + c + disc) / 2).alias("lam1"),
        ((a + c - disc) / 2).alias("lam2"),
    )
    return eig.select(
        F.col("n").cast("long").alias("n_rows"),
        rfix("lam1", 4).alias("eigenvalue_1"),
        rfix("lam2", 4).alias("eigenvalue_2"),
        rfix(F.col("lam1") / (F.col("lam1") + F.col("lam2")), 6).alias(
            "explained_ratio_1"
        ),
        rfix((F.col("lam1") - a) / b, 6).alias("pc1_slope"),
    )


DRAFTS["ml_pca_2d_closed_form"] = (ml_pca_2d_closed_form, PCA_ORACLE)


# ---------------------------------------------------------------------------
# Z-order layout diagnostics: Morton-cell occupancy of the (partkey,
# suppkey) space — pins the interleave bit math cross-engine and shows
# which curve cells are hot (the skew input to a layout compaction job).

from ..operators.zorder import morton_code, morton_code_sql  # noqa: E402

ZCELL_BITS = 8

ZORDER_ORACLE = f"""
WITH z AS (
    SELECT {morton_code_sql('l_partkey', 'l_suppkey', ZCELL_BITS)} AS zkey
    FROM lineitem
)
SELECT CAST(zkey >> {ZCELL_BITS} AS BIGINT) AS z_cell,
       CAST(count(*) AS BIGINT) AS n_rows
FROM z
GROUP BY 1
ORDER BY n_rows DESC, z_cell
LIMIT 20
"""


def layout_zorder_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) cell occupancy of the (l_partkey, l_suppkey) key
    space: interleave the low {ZCELL_BITS} bits of each key
    (operators/zorder.morton_code — pure shift/mask codegen, no UDF),
    coarsen to cells by dropping the low byte, count rows per cell, top
    20. The layout job's skew diagnostic — hot curve cells are where a
    zordered compaction needs more output files — and the cross-engine
    pin for the exact bit arithmetic operators/zorder.write_zordered
    clusters on (tests/test_zorder.py measures the resulting footer
    pruning: both dimensions' per-file coverage tightens vs the
    unclustered baseline, point predicates skip files in either
    dimension).

    Scale shape: per-row integer bit ops in whole-stage codegen + ONE
    cell-keyed count collapse (map-side combinable); top-20 TakeOrdered.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    z = morton_code(F.col("l_partkey"), F.col("l_suppkey"), ZCELL_BITS)
    return (
        li.select(F.shiftright(z, ZCELL_BITS).alias("z_cell"))
        .groupBy("z_cell")
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"), F.asc("z_cell"))
        .limit(20)
        .select(
            F.col("z_cell").cast("long").alias("z_cell"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
    )


DRAFTS["layout_zorder_cell_counts"] = (layout_zorder_cell_counts, ZORDER_ORACLE)


# ---------------------------------------------------------------------------
# IVF+PQ combined ANN (the FAISS IVFPQ architecture): coarse cells restrict
# WHICH vectors are scored, PQ codes + ADC tables decide HOW — together the
# O(n/K · m-lookups) query path that makes billion-vector search feasible.

from ..functions import vectors as V  # noqa: E402
from ..operators.pq import train_pq  # noqa: E402

IVFPQ_CELLS = 8
IVFPQ_M, IVFPQ_K = 4, 8
IVFPQ_QUERIES, IVFPQ_TOPK = 3, 5

IVFPQ_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
    SELECT vec_id AS ccid, embedding AS cv FROM embeddings
    WHERE vec_id < {IVFPQ_CELLS}
),
assign AS (
    SELECT vec_id, ccid AS cell FROM (
        SELECT e2.vec_id, c.ccid,
               row_number() OVER (
                   PARTITION BY e2.vec_id
                   ORDER BY {rfix_sql(V.cosine_sql('e2.embedding', 'c.cv'), 6)}
                            DESC, c.ccid
               ) AS rn
        FROM embeddings e2 CROSS JOIN cents c
    ) WHERE rn = 1
),
dims AS (SELECT 64 AS d, 64 // {IVFPQ_M} AS sub),
seeds AS (
    SELECT vec_id AS cid, j,
           (SELECT list(v[i]) FROM
             (SELECT unnest(range(j * (SELECT sub FROM dims) + 1,
                                  (j + 1) * (SELECT sub FROM dims) + 1)) AS i)) AS c
    FROM e, (SELECT unnest(range(0, {IVFPQ_M})) AS j)
    WHERE vec_id < {IVFPQ_K}
),
slices AS (
    SELECT e.vec_id, j,
           (SELECT list(v[i]) FROM
             (SELECT unnest(range(j * (SELECT sub FROM dims) + 1,
                                  (j + 1) * (SELECT sub FROM dims) + 1)) AS i)) AS s
    FROM e, (SELECT unnest(range(0, {IVFPQ_M})) AS j)
),
d2 AS (
    SELECT sl.vec_id, sl.j, sd.cid,
           list_inner_product(sl.s, sl.s) + list_inner_product(sd.c, sd.c)
           - 2 * list_inner_product(sl.s, sd.c) AS d2
    FROM slices sl JOIN seeds sd ON sd.j = sl.j
),
best AS (
    SELECT vec_id, j, cid,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
    FROM d2
),
adc AS (
    SELECT qd.vec_id AS query_id, b.vec_id AS neighbor_id,
           sum(qd.d2) AS dist
    FROM best b
    JOIN d2 qd ON qd.j = b.j AND qd.cid = b.cid
    JOIN assign av ON av.vec_id = b.vec_id
    JOIN assign aq ON aq.vec_id = qd.vec_id
    WHERE b.rn = 1 AND qd.vec_id < {IVFPQ_QUERIES}
      AND b.vec_id <> qd.vec_id
      AND av.cell = aq.cell
    GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, neighbor_id,
           {rfix_sql('dist', 4)} AS adc_dist,
           row_number() OVER (
               PARTITION BY query_id
               ORDER BY {rfix_sql('dist', 6)}, neighbor_id) AS rn
    FROM adc
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, adc_dist
FROM ranked WHERE rn <= {IVFPQ_TOPK}
"""


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ combined approximate nearest neighbor — the two index
    structures the repo already ships (ann_ivf_topk's coarse inverted
    lists, ann_pq_adc_topk's asymmetric-distance codes) COMPOSED into the
    architecture production vector stores run (FAISS IVFPQ): the coarse
    cell decides WHICH vectors are candidates (O(n/K) per query,
    nprobe=1), the PQ codes + per-query distance tables decide their
    ranks (m table lookups per candidate — full-precision vectors are
    never touched at query time). Simplification vs. the textbook: PQ
    encodes raw vectors, not cell residuals, so the whole pipeline stays
    arithmetically reproducible by the oracle (same contract as the two
    parent queries).

    Scale shape: cell assignment is a broadcast cross-score + one window
    (pinned — it feeds the code side AND the query side); codes are 4
    ints per vector; the per-query ADC tables (m·K doubles each) and the
    query panel's cells ride ONE broadcast into the code table; a single
    (query, neighbor)-keyed exchange sums the lookups; top-k is a
    per-query window over cell-sized candidate lists.
    """
    e = table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < IVFPQ_CELLS).select(
        F.col("vec_id").alias("ccid"), F.col("embedding").alias("cv")
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("ac6"), F.asc("ccid"))
    assign = (
        e.join(F.broadcast(cents))
        .select(
            "vec_id",
            "ccid",
            rfix(V.cosine(F.col("embedding"), F.col("cv")), 6).alias("ac6"),
        )
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("ccid").alias("cell"))
    ).localCheckpoint()
    model = train_pq(e, m=IVFPQ_M, k=IVFPQ_K, max_iters=0)
    if not all(model.codebooks):
        return spark.createDataFrame(
            [], "query_id LONG, neighbor_id LONG, rank LONG, adc_dist DOUBLE"
        )
    # r13: Arrow code assignment (guide §4.2; equivalence note at
    # operators/pq.encode_codes_arrow) — drops 36 interpreted HOF dots
    # per vector from the encode projection.
    codes = (
        model.encode_codes_arrow(e)
        .select("vec_id", F.posexplode("codes").alias("j", "cid"))
        .join(assign, "vec_id")
    )
    panel = e.filter(F.col("vec_id") < IVFPQ_QUERIES)
    entries = []
    for j in range(model.m):
        sub = model._sub_expr("embedding", j)
        sd = F.expr(
            f"aggregate(zip_with(CAST({sub} AS ARRAY<DOUBLE>), "
            f"CAST({sub} AS ARRAY<DOUBLE>), (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        for cid in sorted(model.codebooks[j]):
            c = model.codebooks[j][cid]
            arr = ", ".join(f"{float(x)!r}D" for x in c)
            dot = F.expr(
                f"aggregate(zip_with(CAST({sub} AS ARRAY<DOUBLE>), "
                f"array({arr}), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            )
            c2 = sum(x * x for x in c)
            entries.append(
                F.struct(
                    F.lit(j).alias("j"),
                    F.lit(int(cid)).alias("cid"),
                    (sd + F.lit(c2) - 2 * dot).alias("qd2"),
                )
            )
    qtab = (
        panel.select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.array(*entries)).alias("x"),
        )
        .select("query_id", "x.j", "x.cid", "x.qd2")
        .join(
            assign.select(F.col("vec_id").alias("query_id"), "cell"),
            "query_id",
        )
    )
    # cell equality is a JOIN KEY, not a post-join filter (VERDICT r7 #3):
    # each code row hash-matches only the queries probing ITS cell, pruning
    # ~IVFPQ_CELLS× of the per-row query matches before they materialize
    adc = (
        codes.join(F.broadcast(qtab), ["j", "cid", "cell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd2").alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        rfix(F.col("dist"), 6), F.asc("neighbor_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVFPQ_TOPK)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            rfix(F.col("dist"), 4).alias("adc_dist"),
        )
    )


DRAFTS["ann_ivfpq_topk"] = (ann_ivfpq_topk, IVFPQ_ORACLE)


# ---------------------------------------------------------------------------
# Batch 3: completing the TPC-H suite (Q6, Q7, Q8, Q13, Q19 — with Q1/Q3/
# Q4/Q5/Q10/Q11/Q14/Q15/Q16/Q17/Q18/Q21/Q22 shapes already registered, this
# covers every classic expressible on the harness schema; Q2/Q9/Q12/Q20
# need partsupp/shipmode columns the harness doesn't have).

Q6_START, Q6_END = "1997-01-01", "1998-01-01"

Q6_ORACLE = f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       {rfix_sql(
           "sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) / 100.0",
           2)} AS forecast_revenue_increase
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START}'
  AND l_shipdate <  TIMESTAMP '{Q6_END}'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def j30_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the would-be revenue gain of
    eliminating small discounts on low-quantity lines in one year — a
    pure scan-filter-aggregate with a conjunctive band predicate, the
    simplest query whose 100 TB cost is ENTIRELY decided by pushdown
    (every predicate must reach the parquet reader; at scale this query
    is IO-bound or it is wrong). Revenue terms go through the exact-cents
    idiom per row, so the single emitted sum is an integer.

    The BETWEEN on l_discount compares stored doubles against the
    literals 0.05/0.07 — pure equality-class comparison, no arithmetic,
    so both engines see identical membership.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    f = li.filter(
        (F.col("l_shipdate") >= F.lit(Q6_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_END).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.count("*").cast("long").alias("n_lines"),
        rfix(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
            / 100.0,
            2,
        ).alias("forecast_revenue_increase"),
    )


DRAFTS["j30_forecast_revenue_q6"] = (j30_forecast_revenue_q6, Q6_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q7: volume shipping between two nations, by year and direction.

# pair chosen to have flow in BOTH directions at both gate scales
Q7_NATION_A, Q7_NATION_B = "NATION_18", "NATION_19"

Q7_ORACLE = f"""
WITH flows AS (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_cents_sql('l.l_extendedprice * (1 - l.l_discount)')} AS rev_c
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE (ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
       OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}')
)
SELECT supp_nation, cust_nation, l_year,
       {rfix_sql('sum(rev_c) / 100.0', 2)} AS revenue
FROM flows
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


def j31_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): trade volume between two nations by
    shipping year and direction — the bi-directional international-flow
    rollup. The nation pair predicate is a disjunction over the two
    directions applied AFTER the nation dims broadcast in, so the fact
    scan is never read twice.

    Scale shape: lineitem⋈orders shuffles on orderkey; customer and
    supplier resolve nationkeys (customer joins at test scale by
    broadcast, at 100 TB by custkey shuffle — either is one exchange);
    the two 25-row nation dims broadcast; the final rollup groups a
    (2 directions × years) bounded domain. Exact cents per row.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    a, b = Q7_NATION_A, Q7_NATION_B
    flows = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nc, F.col("c_nationkey") == F.col("ck"))
        .join(ns, F.col("s_nationkey") == F.col("sk"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
    )
    return (
        flows.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            rfix(
                F.sum(
                    _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


DRAFTS["j31_volume_shipping_q7"] = (j31_volume_shipping_q7, Q7_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q8: national market share inside one region, by year.

Q8_NATION, Q8_REGION = "NATION_3", "EUROPE"

Q8_ORACLE = f"""
WITH sales AS (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {_cents_sql('l.l_extendedprice * (1 - l.l_discount)')} AS rev_c,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = '{Q8_REGION}'
),
by_year AS (
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev_c
                         ELSE 0 END) AS BIGINT) AS nation_c,
           CAST(sum(rev_c) AS BIGINT) AS total_c
    FROM sales GROUP BY 1
)
SELECT o_year,
       {rfix_sql('nation_c::DOUBLE / total_c::DOUBLE', 6)} AS mkt_share,
       {rfix_sql('nation_c / 100.0', 2)} AS nation_revenue,
       {rfix_sql('total_c / 100.0', 2)} AS region_revenue
FROM by_year
ORDER BY o_year
"""


def j32_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one supplier nation's share of
    the revenue sold INTO one region, by order year — the
    conditional-sum-over-conditional-sum ratio rollup. Numerator and
    denominator are exact-cent sums computed in ONE pass (a CASE inside
    the same aggregate), so the emitted share divides two integers.

    Scale shape: the region filter prunes the customer side through two
    broadcast dims before the fact join; one orderkey exchange, one
    bounded (years) rollup. No second fact pass for the denominator.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cust_nations = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == Q8_REGION)
        .select(F.col("n_nationkey").alias("ck"))
    )
    c = table(spark, sf_dir, "customer").join(
        cust_nations, F.col("c_nationkey") == F.col("ck"), "left_semi"
    ).select("c_custkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = F.broadcast(
        n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    )
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    sales = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ns, F.col("s_nationkey") == F.col("sk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            cents.alias("rev_c"),
            "supp_nation",
        )
    )
    by_year = sales.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == Q8_NATION, F.col("rev_c")).otherwise(0)
        ).alias("nation_c"),
        F.sum("rev_c").alias("total_c"),
    )
    return by_year.select(
        "o_year",
        rfix(
            F.col("nation_c").cast("double") / F.col("total_c").cast("double"), 6
        ).alias("mkt_share"),
        rfix(F.col("nation_c") / 100.0, 2).alias("nation_revenue"),
        rfix(F.col("total_c") / 100.0, 2).alias("region_revenue"),
    ).orderBy("o_year")


DRAFTS["j32_market_share_q8"] = (j32_market_share_q8, Q8_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q13: customer order-count distribution (the double aggregation).

Q13_ORACLE = """
WITH per_cust AS (
    SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


def a_custdist_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly k orders, INCLUDING the zero-order customers the left join
    preserves — the double-aggregation histogram shape (count per key,
    then count per count). Exact integers end to end.

    Scale shape: one custkey-keyed outer-join/count collapse (the fact
    exchange), then a second rollup over the order-count domain (bounded
    by max orders per customer — tiny). The left join keeps the
    customer dimension's zero class, which an inner join would silently
    drop (the classic Q13 trap).
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy(F.col("c_count").cast("long").alias("c_count"))
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


DRAFTS["a_custdist_q13"] = (a_custdist_q13, Q13_ORACLE)


# ---------------------------------------------------------------------------
# TPC-H Q19: discounted revenue under a three-bracket DNF predicate.

Q19_ORACLE = f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       {rfix_sql(
           "coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
           " AS BIGINT)), 0) / 100.0", 2)} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def j33_bracket_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue from lines matching a
    three-bracket DNF over (brand, size, quantity) — the classic
    OR-of-ANDs join predicate. (Harness schema has no shipmode/
    shipinstruct; the brackets keep Q19's defining brand×size×quantity
    structure.)

    Scale shape: the part side pre-filters to the union of the three
    brand/size brackets BEFORE broadcasting (dimension pruning inside
    the DNF), the quantity legs evaluate on the fact scan, and the final
    bracket conjunctions run post-join in codegen. One aggregate, no
    shuffle beyond the 1-row reduce. Exact cents per row.
    """
    li = spread(table(spark, sf_dir, "lineitem"))
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    brackets = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 10) & qty.between(1, 11)),
        ((F.col("p_brand") == "Brand#2")
         & F.col("p_size").between(1, 15) & qty.between(10, 20)),
        ((F.col("p_brand") == "Brand#3")
         & F.col("p_size").between(1, 20) & qty.between(20, 30)),
    )
    part_union = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 20))
    )
    joined = li.join(
        F.broadcast(p.filter(part_union)),
        F.col("l_partkey") == F.col("p_partkey"),
    ).filter(brackets[0] | brackets[1] | brackets[2])
    return joined.agg(
        F.count("*").cast("long").alias("n_lines"),
        rfix(
            F.coalesce(
                F.sum(
                    _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                ),
                F.lit(0),
            )
            / 100.0,
            2,
        ).alias("revenue"),
    )


DRAFTS["j33_bracket_revenue_q19"] = (j33_bracket_revenue_q19, Q19_ORACLE)


# ---------------------------------------------------------------------------
# SNM blocking-quality eval: recall of the sorted-neighborhood window
# against exact token-Jaccard truth on a panel — completing the
# index-quality family (ann_recall_eval / ann_ivf_recall_eval /
# dedup_minhash_pr_eval measure the other three indexes).

SNM_EVAL_PANEL = 40

SNM_EVAL_ORACLE = f"""
WITH docs AS (
    SELECT doc_id,
           COALESCE({_NORM_SQL}, '') AS norm,
           list_distinct(string_split(COALESCE({_NORM_SQL}, ''), ' ')) AS toks
    FROM documents
),
ranked AS (
    SELECT doc_id, toks,
           row_number() OVER (ORDER BY substr(norm, 1, 24), doc_id) AS rn
    FROM docs
),
cand AS (
    SELECT least(a.doc_id, b.doc_id) AS doc_a,
           greatest(a.doc_id, b.doc_id) AS doc_b
    FROM ranked a
    JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
    WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
          (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
          >= {SNM_THRESHOLD}
      AND least(a.doc_id, b.doc_id) < {SNM_EVAL_PANEL}
),
truth AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM docs a JOIN docs b ON b.doc_id > a.doc_id
    WHERE a.doc_id < {SNM_EVAL_PANEL}
      AND len(list_intersect(a.toks, b.toks)) > 0
      AND len(list_intersect(a.toks, b.toks))::DOUBLE /
          (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
          >= {SNM_THRESHOLD}
),
hit AS (
    SELECT t.doc_a, t.doc_b FROM truth t
    JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
)
SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
       CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
       {rfix_sql(
           '(SELECT count(*) FROM hit)::DOUBLE /'
           ' nullif((SELECT count(*) FROM truth), 0)', 4)} AS recall
"""


def dedup_snm_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation for the sorted-neighborhood index: of
    the EXACT above-threshold Jaccard pairs on a bounded panel, how many
    fall within the SNM window (rank distance <= w on the blocking key)?
    This is THE number a window-size choice trades (recall up, compare
    cost up); precision is structurally 1.0 — the window filters by the
    same exact Jaccard — so it is not emitted. Completes the
    index-quality family: ann_recall_eval (brute vs IVF), ann_ivf_recall,
    dedup_minhash_pr_eval (LSH banding), and now the SNM window.

    Interpretation on THIS corpus: the synthetic documents draw from a
    shared vocabulary, so tau=0.3 is near-vacuous (~94% of panel pairs
    qualify) and the measured window recall is honestly tiny (~0.016) —
    prefix-sorted adjacency cannot cover a truth set that is almost the
    complete graph. That IS the eval's finding: SNM is a precision tool
    for prefix-sharing near-dups (the planted-duplicate invariant shows
    recall 1.0 there), not a recall tool under a loose global threshold
    — exactly the trade a deployment must see measured before choosing
    blocking keys.

    Scale shape: truth is exact only over the panel (standard eval
    protocol), generated by a shared-token join — never all-pairs over
    the corpus; the candidate side is the production SNM query itself,
    panel-filtered and pair-canonicalized; metric assembly is three
    1-row broadcasts.
    """
    d = table(spark, sf_dir, "documents")
    norm = F.coalesce(T.normalize("text"), F.lit(""))  # match SNM blocking key
    # r14 (guide §1.2): pin the normalized token sets — they feed the
    # explode, the panel slice and both size joins (4 corpus-wide
    # normalize+tokenize evaluations unpinned); same move as the minhash
    # pr_evals.
    from ..operators.iterative import pin

    docs = pin(
        d.select(
            "doc_id", F.array_distinct(F.split(norm, " ")).alias("toks")
        ),
        label="snm_eval_toks",
    )
    sizes = docs.select("doc_id", F.size("toks").alias("n"))
    ex = docs.select("doc_id", F.explode("toks").alias("tok"))
    pan = ex.filter(F.col("doc_id") < SNM_EVAL_PANEL).select(
        F.col("doc_id").alias("doc_a"), "tok"
    )
    shared = (
        pan.join(ex.select(F.col("doc_id").alias("doc_b"), "tok"), "tok")
        .filter(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
            >= SNM_THRESHOLD
        )
    )
    truth = jac.select("doc_a", "doc_b")
    cand = (
        dedup_sorted_neighborhood(spark, sf_dir)
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .filter(F.col("doc_a") < SNM_EVAL_PANEL)
    )
    # r13 metric assembly: one flagged full-outer join + one aggregate
    # instead of three aggregates + a hit join (which evaluated the truth
    # subtree twice and the SNM candidate subtree — including its rank
    # join above the pinned ranged frame — twice). Counts identical: both
    # frames are pair-unique (truth groupBy'd; SNM emits each (a,b) once
    # because ranks are unique and rn_a < rn_b).
    m = (
        truth.withColumn("_t", F.lit(1))
        .join(cand.withColumn("_c", F.lit(1)), ["doc_a", "doc_b"], "full_outer")
        .agg(
            F.count("_t").alias("n_true"),
            F.count("_c").alias("n_cand"),
            F.count(F.when(F.col("_t").isNotNull() & F.col("_c").isNotNull(), 1)).alias("n_hit"),
        )
    )
    return m.select(
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_cand").cast("long").alias("n_cand"),
        F.col("n_hit").cast("long").alias("n_hit"),
        rfix(
            F.col("n_hit").cast("double") / F.nullif(F.col("n_true"), F.lit(0)),
            4,
        ).alias("recall"),
    )


DRAFTS["dedup_snm_recall_eval"] = (dedup_snm_recall_eval, SNM_EVAL_ORACLE)


# ---------------------------------------------------------------------------
# IVF nprobe=2 recall: the tuning curve's second point. ann_ivf_recall_eval
# measures nprobe=1; this probes each query's TWO nearest cells — recall
# bought back at ~2x candidate cost, the sweep every IVF deployment runs.

IVF_NPROBE = 2
_NPROBE_K = 8  # coarse centroids (= llmops._IVF_K, kept literal for the oracle)

NPROBE_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < 5),
truth AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {rfix_sql(V.cosine_sql('q.qe', 'e.embedding'), 6)} DESC,
                            e.vec_id) AS rn
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ) WHERE rn <= 10
),
cents AS (
    SELECT vec_id AS cid, embedding AS cv FROM embeddings
    WHERE vec_id < {_NPROBE_K}
),
ranked AS (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {rfix_sql(V.cosine_sql('e.embedding', 'c.cv'), 6)} DESC, c.cid
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
),
assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cid FROM ranked
           WHERE rn <= {IVF_NPROBE} AND vec_id < 5),
cand AS (
    SELECT p.query_id, na.vec_id AS neighbor_id
    FROM probes p JOIN assign na ON na.cid = p.cid AND na.vec_id <> p.query_id
)
SELECT CAST(t.query_id AS BIGINT) AS query_id,
       CAST((SELECT count(*) FROM cand c2 WHERE c2.query_id = t.query_id)
           AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS hits,
       {rfix_sql('sum(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / 10.0', 4)}
           AS recall_at_10
FROM truth t
LEFT JOIN cand c
  ON c.query_id = t.query_id AND c.neighbor_id = t.neighbor_id
GROUP BY t.query_id
"""


def ann_ivf_nprobe2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index at nprobe={IVF_NPROBE}: each query
    searches its TWO highest-scoring coarse cells instead of one. Paired
    with ann_ivf_recall_eval (nprobe=1, identical columns), this is the
    recall-vs-candidate-cost tuning curve an IVF deployment sweeps before
    fixing nprobe — recall must be monotonically >= the nprobe=1 number
    per query (an invariant test pins this against the registered
    nprobe=1 query).

    Scale shape mirrors the production index: one K-way cosine ranking
    pass assigns database vectors (rank 1, pinned) AND yields the query
    panel's probe list (rank <= nprobe) from the same window — no second
    scoring pass; candidates are a cell-keyed join; truth exact over the
    broadcast panel only.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c6"), F.asc("neighbor_id"))
    truth = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            rfix(V.cosine(F.col("qe"), F.col("embedding")), 6).alias("c6"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
    )
    cents = e.filter(F.col("vec_id") < _NPROBE_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("ac6"), F.asc("cid"))
    ranked = (
        e.join(F.broadcast(cents))
        .select(
            "vec_id",
            "cid",
            rfix(V.cosine(F.col("embedding"), F.col("cv")), 6).alias("ac6"),
        )
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("vec_id", "cid", "rn")
    ).localCheckpoint()
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    probes = ranked.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "cid"
    )
    cand = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    sizes = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    hits = (
        truth.join(
            cand.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
        )
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("hits"))
    )
    return hits.join(F.broadcast(sizes), "query_id", "left").select(
        F.col("query_id").cast("long").alias("query_id"),
        F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
        F.col("hits").cast("long").alias("hits"),
        rfix(F.col("hits") / F.lit(10.0), 4).alias("recall_at_10"),
    )


DRAFTS["ann_ivf_nprobe2_recall"] = (ann_ivf_nprobe2_recall, NPROBE_ORACLE)
