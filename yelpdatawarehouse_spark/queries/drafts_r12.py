"""Round-12 drafts (written in round 9; registered immediately via
queries/draft_layer.register_all — the _prioritize window front-loads the
new cohort while keeping stale re-verification slots).

Four capability gaps, each a shape the 263-query registry did not yet
cover:

* ``g_closeness_centrality`` — closeness + harmonic centrality from
  ALL-PAIRS min-hop distances, computed as ONE simultaneous multi-root
  BFS frame (operators/graph.bfs_min_hops_multi) — the remaining classic
  centrality next to degree/PageRank/HITS/k-core/clustering-coefficient.
* ``emb_silhouette_eval`` — centroid-silhouette clustering quality over
  the embedding labels, with EXACT centroids via quantized-integer
  component sums (the cents discipline applied to vectors: float means
  are summation-order-dependent, integer sums are not).
* ``t36_holt_winters_daily`` — additive Holt-Winters (level/trend/weekly
  seasonal) over daily revenue — completes the classical forecasting
  family next to t21 Holt-linear and t22's static weekday decompose.
* ``split_leakage_safe_groups`` — duplicate-group-aware train/val/test
  splitting (all copies of a document land in ONE split) measured
  against the naive doc-hash split's cross-split duplicate leakage —
  the constructive counterpart of dedup_cross_split_contamination.

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT, floats through rfix, money as exact cents where a
comparison or recursion consumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as T
from ..functions import vectors as V
from ..functions.presentation import rfix, rfix_sql
from ..operators.graph import bfs_min_hops_multi
from ..sources.tables import table
from .graphq import _EDGE_SQL, trade_edges

DRAFTS: dict = {}


# ---------------------------------------------------------------------------
# Closeness + harmonic centrality: all-pairs min-hops via one multi-root
# BFS frame. The edge derivation (two fact joins + distinct) is the
# 100 TB-scale part and stays fully distributed; the iteration state is
# |nations|^2-bounded.

_CLOSENESS_MAX_HOPS = 6

CLOSENESS_ORACLE = f"""
WITH RECURSIVE {_EDGE_SQL},
roots AS (SELECT n_nationkey AS root FROM nation),
walk(root, node, hop) AS (
    SELECT root, root, 0 FROM roots
    UNION
    SELECT w.root, e.dst, w.hop + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.hop < {_CLOSENESS_MAX_HOPS}
),
dist AS (
    SELECT root, node, min(hop) AS d FROM walk GROUP BY root, node
),
agg AS (
    SELECT root,
           count(*) FILTER (WHERE d > 0) AS n_reached,
           sum(d) AS sum_hops,
           sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END) AS harm
    FROM dist GROUP BY root
)
SELECT n.n_name,
       CAST(coalesce(a.n_reached, 0) AS BIGINT) AS n_reached,
       CAST(coalesce(a.sum_hops, 0) AS BIGINT) AS sum_hops,
       {rfix_sql('CASE WHEN coalesce(a.sum_hops, 0) > 0 '
                 'THEN a.n_reached / CAST(a.sum_hops AS DOUBLE) ELSE 0 END', 6)}
           AS closeness,
       {rfix_sql('coalesce(a.harm, 0)', 6)} AS harmonic
FROM nation n LEFT JOIN agg a ON a.root = n.n_nationkey
"""


def g_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness and harmonic centrality of every nation on the derived
    trade graph: closeness = n_reached / sum(min-hops) over nodes
    reachable within {_CLOSENESS_MAX_HOPS} hops, harmonic = sum(1/d) —
    the disconnection-robust variant (isolated nations score 0 instead
    of dividing by an unreachable-node convention).

    Spark-first shape: the fact-scale edge derivation (orders ⋈ customer
    ⋈ lineitem ⋈ supplier, distinct) is the part that scales and runs
    fully distributed; the all-pairs distances come from ONE multi-root
    BFS frame (operators/graph.bfs_min_hops_multi) whose state is
    |nations|²-bounded — never |roots| sequential BFS sweeps, and never
    a driver-side loop over nodes. The oracle is the same all-pairs walk
    as a recursive CTE with UNION-distinct rows (bounded by
    nodes² × hops, not path count).

    Reference analog: Neo4j degree/shortestPath surfaces
    (webapp/neo4j_routes.py:695-843); closeness itself is
    beyond-reference, same graph.
    """
    edges = trade_edges(spark, sf_dir)
    nation = table(spark, sf_dir, "nation")
    dist = bfs_min_hops_multi(
        spark, edges, nation.select("n_nationkey"), max_hops=_CLOSENESS_MAX_HOPS
    )
    agg = dist.groupBy("root").agg(
        F.count(F.when(F.col("hops") > 0, 1)).cast("long").alias("n_reached"),
        F.sum("hops").cast("long").alias("sum_hops"),
        F.sum(
            F.when(F.col("hops") > 0, F.lit(1.0) / F.col("hops")).otherwise(0.0)
        ).alias("harm"),
    )
    return nation.join(F.broadcast(agg), nation.n_nationkey == agg.root, "left").select(
        "n_name",
        F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
        F.coalesce("sum_hops", F.lit(0)).cast("long").alias("sum_hops"),
        rfix(
            F.when(
                F.coalesce("sum_hops", F.lit(0)) > 0,
                F.col("n_reached") / F.col("sum_hops").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("closeness"),
        rfix(F.coalesce("harm", F.lit(0.0)), 6).alias("harmonic"),
    )


DRAFTS["g_closeness_centrality"] = (g_closeness_centrality, CLOSENESS_ORACLE)


# ---------------------------------------------------------------------------
# Centroid silhouette over the embedding labels. Centroids are EXACT:
# components quantized to 1e-6 integers, summed as longs (order-free),
# divided back once — so both engines hold bit-identical centroids and
# the distance comparisons can never flip on a summation-order ulp.

_SIL_Q = 1_000_000  # component quantization (|v| < 1 => q < 1e6; long-safe)

SILHOUETTE_ORACLE = f"""
WITH e AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
pq AS (
    SELECT e.label, idx.i,
           CAST(floor(e.v[CAST(idx.i AS INT)] * {_SIL_Q} + 0.5) AS BIGINT) AS q
    FROM e, (SELECT unnest(range(1, 257)) AS i) idx
    WHERE idx.i <= len(e.v)
),
cent AS (
    SELECT label, i, CAST(sum(q) AS DOUBLE) / count(*) / {_SIL_Q} AS c
    FROM pq GROUP BY label, i
),
carr AS (
    SELECT label AS cl, list(c ORDER BY i) AS cv FROM cent GROUP BY label
),
pairs AS (
    SELECT e.vec_id, e.label,
           carr.cl,
           sqrt(greatest(
               list_inner_product(e.v, e.v)
               + list_inner_product(carr.cv, carr.cv)
               - 2 * list_inner_product(e.v, carr.cv), 0)) AS d
    FROM e CROSS JOIN carr
),
ab AS (
    SELECT vec_id, label,
           min(CASE WHEN label = cl THEN d END) AS a,
           min(CASE WHEN label <> cl THEN d END) AS b
    FROM pairs GROUP BY vec_id, label
),
s AS (
    SELECT label, a, b,
           CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
                ELSE 0.0 END AS sil
    FROM ab
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       {rfix_sql('avg(a)', 4)} AS mean_intra_dist,
       {rfix_sql('avg(b)', 4)} AS mean_nearest_other,
       {rfix_sql('avg(sil)', 4)} AS mean_silhouette
FROM s GROUP BY label
"""


def emb_silhouette_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-silhouette clustering quality per label: a(v) = distance
    to the OWN label centroid, b(v) = distance to the nearest OTHER label
    centroid, s = (b-a)/max(a,b) — the standard clustering-quality score
    in its centroid form (O(n·K) like PAM's medoid variant, not the
    O(n²) pairwise original), the eval that says whether the label
    structure the kNN / nearest-centroid / margin queries lean on is
    geometrically real.

    Exactness: centroids from quantized-integer component sums (1e-6
    grid) — float means are summation-order-dependent across engines,
    integer sums are not, so both engines compute bit-identical
    centroids; distances are index-ordered dot products via the
    d² = |v|² + |c|² − 2v·c identity, norms precomputed once per row
    (HOFs are CodegenFallback — the measured round-8 finding).

    Scale shape: one (label, position)-keyed exchange builds centroids
    (K·dim rows out), K centroid rows broadcast against the vector scan
    (n·K pair rows — the kmeans-assign shape), one vec_id exchange for
    the a/b minima, one K-group rollup. Never vectors × vectors.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    pq = e.select(
        "label", F.posexplode("v").alias("i", "u")
    ).select(
        "label", "i",
        F.floor(F.col("u") * _SIL_Q + F.lit(0.5)).cast("long").alias("q"),
    )
    cent = pq.groupBy("label", "i").agg(
        (F.sum("q").cast("double") / F.count("*") / _SIL_Q).alias("c")
    )
    carr = cent.groupBy(F.col("label").alias("cl")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda x: x["c"]
        ).alias("cv")
    ).withColumn("nc2", V.dot(F.col("cv"), F.col("cv")))
    pairs = (
        e.withColumn("nv2", V.dot(F.col("v"), F.col("v")))
        .crossJoin(F.broadcast(carr))
        .select(
            "vec_id", "label", "cl",
            F.sqrt(
                F.greatest(
                    F.col("nv2") + F.col("nc2") - 2 * V.dot(F.col("v"), F.col("cv")),
                    F.lit(0.0),
                )
            ).alias("d"),
        )
    )
    ab = pairs.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("label") == F.col("cl"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("label") != F.col("cl"), F.col("d"))).alias("b"),
    )
    sil = F.when(
        F.greatest("a", "b") > 0, (F.col("b") - F.col("a")) / F.greatest("a", "b")
    ).otherwise(0.0)
    return ab.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vectors"),
        rfix(F.avg("a"), 4).alias("mean_intra_dist"),
        rfix(F.avg("b"), 4).alias("mean_nearest_other"),
        rfix(F.avg(sil), 4).alias("mean_silhouette"),
    ).select(
        F.col("label").cast("long").alias("label"),
        "n_vectors", "mean_intra_dist", "mean_nearest_other", "mean_silhouette",
    )


DRAFTS["emb_silhouette_eval"] = (emb_silhouette_eval, SILHOUETTE_ORACLE)


# ---------------------------------------------------------------------------
# Additive Holt-Winters with weekly seasonality over daily revenue —
# level/trend/seasonal recursion, initialized on the first two weeks,
# emitted with the one-step-ahead fitted value. Same engine discipline
# as t21/t25: the fact scan collapses to the day spine once, the
# recurrence is a single whole-stage-codegen aggregate fold (never a
# Python loop), and the oracle replays the identical float stream
# through a recursive CTE.

HW_ALPHA = 0.25
HW_BETA = 0.05
HW_GAMMA = 0.3
HW_PERIOD = 7

HW_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
    FROM orders GROUP BY d
),
idx AS (SELECT d, c, row_number() OVER (ORDER BY d) AS rn FROM daily),
init AS (
    SELECT
        (SELECT CAST(sum(c) AS DOUBLE) FROM idx WHERE rn <= {HW_PERIOD})
            / {HW_PERIOD * 100}.0 AS lm,
        ((SELECT CAST(sum(c) AS DOUBLE)
          FROM idx WHERE rn > {HW_PERIOD} AND rn <= {2 * HW_PERIOD})
         - (SELECT CAST(sum(c) AS DOUBLE) FROM idx WHERE rn <= {HW_PERIOD}))
            / {HW_PERIOD * 100}.0 / {HW_PERIOD}.0 AS bm
),
rec(rn, d, c, l, b, f, sv) AS (
    SELECT {HW_PERIOD}, i.d, i.c, init.lm, init.bm, CAST(NULL AS DOUBLE),
           (SELECT list(c / 100.0 - init.lm ORDER BY rn)
            FROM idx WHERE rn <= {HW_PERIOD})
    FROM idx i, init WHERE i.rn = {HW_PERIOD}
      AND (SELECT max(rn) FROM idx) >= {2 * HW_PERIOD}
    UNION ALL
    SELECT i.rn, i.d, i.c,
           {HW_ALPHA} * (i.c / 100.0 - rec.sv[1])
               + {1 - HW_ALPHA} * (rec.l + rec.b),
           {HW_BETA} * (({HW_ALPHA} * (i.c / 100.0 - rec.sv[1])
                         + {1 - HW_ALPHA} * (rec.l + rec.b)) - rec.l)
               + {1 - HW_BETA} * rec.b,
           rec.l + rec.b + rec.sv[1],
           rec.sv[2:{HW_PERIOD}] ||
               [{HW_GAMMA} * (i.c / 100.0
                              - ({HW_ALPHA} * (i.c / 100.0 - rec.sv[1])
                                 + {1 - HW_ALPHA} * (rec.l + rec.b)))
                + {1 - HW_GAMMA} * rec.sv[1]]
    FROM rec JOIN idx i ON i.rn = rec.rn + 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       {rfix_sql('c / 100.0', 2)} AS daily_revenue,
       {rfix_sql('l', 2)} AS level,
       {rfix_sql('b', 2)} AS trend,
       {rfix_sql(f'sv[{HW_PERIOD}]', 2)} AS seasonal,
       {rfix_sql('f', 2)} AS fitted
FROM rec WHERE rn > {HW_PERIOD}
"""


def t36_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters smoothing (α={HW_ALPHA}, β={HW_BETA},
    γ={HW_GAMMA}, weekly period m={HW_PERIOD}) of daily order revenue:

        lₜ = α(yₜ − sₜ₋ₘ) + (1−α)(lₜ₋₁ + bₜ₋₁)
        bₜ = β(lₜ − lₜ₋₁) + (1−β)bₜ₋₁
        sₜ = γ(yₜ − lₜ) + (1−γ)sₜ₋ₘ

    initialized l_m = mean(y₁..y_m), b_m = (mean(y_{{m+1}}..y_{{2m}}) −
    mean(y₁..y_m))/m, sᵢ = yᵢ − l_m, emitting the trace from t = m+1 with
    the one-step-ahead fitted value lₜ₋₁ + bₜ₋₁ + sₜ₋ₘ (empty result when
    the series is shorter than 2m — the fit is undefined).

    Exactness: y is exact-cents/100 (identical double both sides); the
    init means are single-division expressions over integer sums; the
    recursion consumes the trace in strict day order, so the float
    streams are order-identical and 2dp canonicalization absorbs the
    ulp. Seasonal lookback sₜ₋ₘ is element_at(acc, -m) on the engine
    side and a carried 7-slot list in the oracle's recursive CTE.

    Scale shape: one map-side-combinable fact rollup to the calendar
    spine; the recurrence folds over the sorted spine array inside
    whole-stage codegen (t21/t25 discipline) — the only single-partition
    object is the day-spine array, constant in fact volume.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("c")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "c"))).alias("s")
    )
    a, b, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD
    lvl = (
        f"({a}D * (x.c / 100.0D - element_at(acc, -{m}).s)"
        f" + {1 - a}D * (element_at(acc, -1).l + element_at(acc, -1).b))"
    )
    trace = series.select(
        F.expr(
            f"""
            CASE WHEN size(s) < {2 * m} THEN
                CAST(array() AS array<struct<d:date,c:bigint,l:double,
                                            b:double,f:double,s:double>>)
            ELSE aggregate(
              slice(s, {m + 1}, size(s) - {m}),
              transform(slice(s, 1, {m}), x -> named_struct(
                  'd', x.d, 'c', x.c,
                  'l', aggregate(slice(s, 1, {m}), 0L, (q, y) -> q + y.c)
                           / {m * 100}.0D,
                  'b', (aggregate(slice(s, {m + 1}, {m}), 0L, (q, y) -> q + y.c)
                        - aggregate(slice(s, 1, {m}), 0L, (q, y) -> q + y.c))
                           / {m * 100}.0D / {m}.0D,
                  'f', CAST(NULL AS DOUBLE),
                  's', x.c / 100.0D
                       - aggregate(slice(s, 1, {m}), 0L, (q, y) -> q + y.c)
                           / {m * 100}.0D)),
              (acc, x) -> concat(acc, array(named_struct(
                  'd', x.d, 'c', x.c,
                  'l', {lvl},
                  'b', {b}D * ({lvl} - element_at(acc, -1).l)
                       + {1 - b}D * element_at(acc, -1).b,
                  'f', element_at(acc, -1).l + element_at(acc, -1).b
                       + element_at(acc, -{m}).s,
                  's', {g}D * (x.c / 100.0D - {lvl})
                       + {1 - g}D * element_at(acc, -{m}).s)))
            ) END AS tr
            """
        )
    ).select(F.explode(F.expr(f"slice(tr, {m + 1}, greatest(size(tr) - {m}, 0))")).alias("t"))
    return trace.select(
        F.date_format("t.d", "yyyy-MM-dd").alias("day"),
        rfix(F.col("t.c") / 100.0, 2).alias("daily_revenue"),
        rfix(F.col("t.l"), 2).alias("level"),
        rfix(F.col("t.b"), 2).alias("trend"),
        rfix(F.col("t.s"), 2).alias("seasonal"),
        rfix(F.col("t.f"), 2).alias("fitted"),
    )


DRAFTS["t36_holt_winters_daily"] = (t36_holt_winters_daily, HW_ORACLE)


# ---------------------------------------------------------------------------
# Duplicate-group-aware splitting: assign SPLITS BY CONTENT-HASH GROUP so
# every copy of a document lands in one split, and measure the naive
# doc-hash split's cross-split duplicate leakage beside it. The
# constructive counterpart of dedup_cross_split_contamination (which
# MEASURES n-gram leakage of the naive split after the fact).

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)

SPLIT_GROUPS_ORACLE = f"""
WITH base AS (
    SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
),
marked AS (
    SELECT fp,
           CASE WHEN {hashing.md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")}
                     % 100 < 90 THEN 'train'
                WHEN {hashing.md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")}
                     % 100 < 95 THEN 'val'
                ELSE 'test' END AS doc_hash,
           CASE WHEN {hashing.md5_long_sql("'gsplit:' || fp")} % 100 < 90
                    THEN 'train'
                WHEN {hashing.md5_long_sql("'gsplit:' || fp")} % 100 < 95
                    THEN 'val'
                ELSE 'test' END AS group_hash
    FROM base
),
long_form AS (
    SELECT fp, 'doc_hash' AS method, doc_hash AS split FROM marked
    UNION ALL
    SELECT fp, 'group_hash' AS method, group_hash AS split FROM marked
),
per_fp_split AS (
    SELECT method, fp, split, count(*)::BIGINT AS ns
    FROM long_form GROUP BY method, fp, split
),
per_fp AS (
    SELECT method, fp, sum(ns) AS n,
           sum(ns * (ns - 1) / 2) AS same_pairs,
           sum(CASE WHEN split = 'train' THEN ns ELSE 0 END) AS tr,
           sum(CASE WHEN split = 'val' THEN ns ELSE 0 END) AS va,
           sum(CASE WHEN split = 'test' THEN ns ELSE 0 END) AS te
    FROM per_fp_split GROUP BY method, fp
)
SELECT method,
       CAST(sum(tr) AS BIGINT) AS train_docs,
       CAST(sum(va) AS BIGINT) AS val_docs,
       CAST(sum(te) AS BIGINT) AS test_docs,
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
       CAST(sum(n * (n - 1) / 2) AS BIGINT) AS dup_pairs,
       CAST(sum(n * (n - 1) / 2 - same_pairs) AS BIGINT) AS cross_split_pairs
FROM per_fp GROUP BY method
"""


def split_leakage_safe_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test splitting: the same 90/5/5 keyed-hash
    assignment as split_train_val_test, run two ways — naive (hash of
    doc_id: duplicate copies scatter across splits and leak) and
    GROUP-AWARE (hash of the normalized-content fingerprint: every copy
    of a text lands in one split, cross_split_pairs = 0 BY CONSTRUCTION,
    and the output proves it). One row per method with the split sizes,
    duplicate-group mass, and the cross-split duplicate-pair count — the
    number an eval-integrity review asks for first.

    Scale shape: one fingerprint hash per row (JVM md5, no shuffle), one
    exchange keyed on (method, fp, split) for the group rollup (the
    doubled long form rides the same exchange), then a 2-group final
    rollup; pair counts are C(n,2) arithmetic on group sizes — no pair
    frame is ever materialized. The split assignment itself is a pure
    function of content, reproducible under any repartitioning.
    """
    d = table(spark, sf_dir, "documents")
    fp = F.md5(T.normalize("text"))
    doc_slot = (
        hashing.md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % 100
    )
    grp_slot = hashing.md5_long(F.concat(F.lit("gsplit:"), F.col("fp"))) % 100

    def to_split(slot):
        return F.when(slot < 90, "train").when(slot < 95, "val").otherwise("test")

    marked = d.select(F.col("doc_id"), fp.alias("fp")).select(
        "fp",
        to_split(doc_slot).alias("doc_hash"),
        to_split(grp_slot).alias("group_hash"),
    )
    long_form = marked.select(
        "fp",
        F.expr(
            "stack(2, 'doc_hash', doc_hash, 'group_hash', group_hash) "
            "AS (method, split)"
        ),
    )
    per_fp = (
        long_form.groupBy("method", "fp", "split")
        .agg(F.count("*").alias("ns"))
        .groupBy("method", "fp")
        .agg(
            F.sum("ns").alias("n"),
            F.sum(F.col("ns") * (F.col("ns") - 1) / 2).cast("long").alias("same_pairs"),
            F.sum(F.when(F.col("split") == "train", F.col("ns")).otherwise(0)).alias("tr"),
            F.sum(F.when(F.col("split") == "val", F.col("ns")).otherwise(0)).alias("va"),
            F.sum(F.when(F.col("split") == "test", F.col("ns")).otherwise(0)).alias("te"),
        )
    )
    pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return per_fp.groupBy("method").agg(
        F.sum("tr").cast("long").alias("train_docs"),
        F.sum("va").cast("long").alias("val_docs"),
        F.sum("te").cast("long").alias("test_docs"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long").alias("dup_groups"),
        F.sum(pairs).cast("long").alias("dup_pairs"),
        F.sum(pairs - F.col("same_pairs")).cast("long").alias("cross_split_pairs"),
    )


DRAFTS["split_leakage_safe_groups"] = (split_leakage_safe_groups, SPLIT_GROUPS_ORACLE)
