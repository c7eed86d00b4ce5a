"""Round-12 drafts (written in round 9; registered immediately via
queries/draft_layer.register_all — the _prioritize window front-loads the
new cohort while keeping stale re-verification slots).

Sixteen capability gaps across five same-round tranches, each a shape
the 263-query registry did not yet cover:

Tranche 1:
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

Tranche 2:
* ``dedup_lsh_s_curve_eval`` — measured vs theoretical LSH banding
  collision rate per true-Jaccard decile (the 1-(1-s^r)^b curve).
* ``text_kn_continuation_stats`` — Kneser-Ney continuation-probability
  diagnostics (distinct-left-context structure; the Francisco problem).
* ``mm_wht_fingerprint_pairs`` — Walsh-Hadamard perceptual fingerprint
  near-dup pairs (exact-integer pHash sibling; Arrow kernel).
* ``t37_ar2_yule_walker`` — AR(2) fit from exact-moment lag-1/2
  autocorrelations via the closed-form Yule-Walker solve.

Tranche 3:
* ``ann_ivf_nprobe_curve`` — the IVF recall-vs-candidate-cost tuning
  curve (nprobe 1/2/4) from one pinned cell-ranking pass, agreement-
  pinned against the two registered pointwise anchors.

Tranche 4:
* ``diag_table_profiler`` — one-pass exact per-column profile (rows,
  non-null, distinct, min/max) — the contract-grade describe().
* ``g_eccentricity_diameter`` — diameter/radius/center/periphery from
  the same multi-root BFS frame closeness consumes.
* ``sample_ess_lengths`` — effective sample size of length-proportional
  sampling on exact integer weights (Σw² in decimal(38,0)).
* ``text_term_burstiness_topk`` — Church-Gale burstiness as index of
  dispersion from exact integer moments.

Tranche 5:
* ``g_degree_assortativity`` — Newman's degree-mixing correlation over
  edge endpoints (zero-variance guard on regular graphs).
* ``ann_hubness_stats`` — k-occurrence skewness over exact top-k lists
  (the high-dimensional hub phenomenon behind ANN recall ceilings).
* ``a_anova_weekday_revenue`` — one-way ANOVA F across weekdays from
  exact-cents moments (k-group Welch generalization).

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
    # Thin caller of operators/graphalgs.closeness_stats (r12 library
    # extraction over the existing bfs_min_hops_multi frame).
    from ..operators import graphalgs

    edges = trade_edges(spark, sf_dir)
    nation = table(spark, sf_dir, "nation")
    agg = graphalgs.closeness_stats(
        spark, edges, nation.select("n_nationkey"),
        max_hops=_CLOSENESS_MAX_HOPS,
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
    # Thin caller of operators/embeddings.silhouette_eval (r12 library
    # extraction, phase 4).
    from ..operators import embeddings as emb_ops

    return emb_ops.silhouette_eval(
        table(spark, sf_dir, "embeddings"), "embedding", "label", "vec_id",
        quant=_SIL_Q,
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


# ---------------------------------------------------------------------------
# Tranche 2 (same round): LSH S-curve calibration, Kneser-Ney continuation
# diagnostics, Walsh-Hadamard perceptual fingerprints, Yule-Walker AR(2).


# LSH S-curve: measured band-collision rate per true-Jaccard band vs the
# closed-form 1-(1-s^r)^b — the calibration curve every (bands, rows)
# deployment choice is tuned against, next to dedup_minhash_pr_eval's
# single-threshold precision/recall.

_SC_PANEL = 30


def _s_curve_oracle() -> str:
    from .llmops import _TOKS as _LTOKS
    from .llmops import N_BANDS, ROWS_PER_BAND, _minhash_oracle

    jac = (
        "len(list_intersect(a.s, b.s))::DOUBLE / "
        "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"
    )
    # theory term with multiplications only (pow() may route through
    # exp/ln and is not bit-portable): s2=s*s, s4=s2*s2, 1-(1-s4)^4
    return f"""
    WITH cand0 AS ({_minhash_oracle()}),
    cand AS (SELECT doc_a, doc_b FROM cand0 WHERE doc_a < {_SC_PANEL}),
    sh AS (SELECT doc_id, list_distinct({T.shingles_sql(_LTOKS, 3)}) AS s
           FROM documents),
    uni AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               {rfix_sql(jac, 6)} AS jr
        FROM sh a JOIN sh b ON b.doc_id > a.doc_id
        WHERE a.doc_id < {_SC_PANEL}
          AND len(list_intersect(a.s, b.s)) > 0
    ),
    marked AS (
        SELECT u.jr,
               least(CAST(floor(u.jr * 10) AS BIGINT), 9) AS bucket,
               CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS is_cand
        FROM uni u LEFT JOIN cand c
          ON c.doc_a = u.doc_a AND c.doc_b = u.doc_b
    ),
    byb AS (
        SELECT bucket, count(*)::BIGINT AS n_pairs,
               sum(is_cand)::BIGINT AS n_cand,
               (bucket + 0.5) / 10.0 AS s
        FROM marked GROUP BY bucket
    ),
    t AS (
        SELECT bucket, n_pairs, n_cand, s,
               s * s AS s2
        FROM byb
    )
    SELECT bucket,
           n_pairs,
           n_cand,
           {rfix_sql('n_cand::DOUBLE / n_pairs', 4)} AS measured_rate,
           {rfix_sql(
               '1.0 - (1.0 - s2 * s2) * (1.0 - s2 * s2)'
               ' * (1.0 - s2 * s2) * (1.0 - s2 * s2)', 6)} AS theory_rate
    FROM t
    """


def dedup_lsh_s_curve_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding S-curve calibration: over a {_SC_PANEL}-doc panel's
    blocked candidate universe (pairs sharing >= 1 shingle), the MEASURED
    fraction of pairs each true-Jaccard decile that the production 4x4
    MinHash banding surfaces, beside the THEORETICAL collision rate
    1-(1-s^r)^b at the decile midpoint — the curve that says whether the
    (bands, rows) choice actually sits where the formula promises, and
    the tuning artifact behind dedup_minhash_pr_eval's two numbers.

    Exactness: true Jaccard is exact set arithmetic over distinct
    shingles; the theory term is expanded into MULTIPLICATIONS only
    (pow() may route through exp/ln and is not bit-portable across
    engines); rates land on rfix.

    Scale shape: the truth side is panel-bounded (panel x overlapping
    docs via ONE shingle equi-join — never all-pairs); the candidate
    side is the production banding query itself, panel-filtered; the
    rollup is 10 groups.
    """
    from .llmops import dedup_minhash_lsh_candidates

    d = table(spark, sf_dir, "documents")
    sh = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_distinct(T.shingles(T.tokens("text"), 3)).alias("s"),
    )
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    ex = sh.select("doc_id", F.explode("s").alias("sg"))
    pan = ex.filter(F.col("doc_id") < _SC_PANEL).select(
        F.col("doc_id").alias("doc_a"), "sg"
    )
    shared = (
        pan.join(ex.select(F.col("doc_id").alias("doc_b"), "sg"), "sg")
        .filter(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jr = rfix(
        F.col("inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("inter")),
        6,
    )
    uni = (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select("doc_a", "doc_b", jr.alias("jr"))
    )
    cand = (
        dedup_minhash_lsh_candidates(spark, sf_dir)
        .filter(F.col("doc_a") < _SC_PANEL)
        .withColumn("is_c", F.lit(1))
    )
    marked = uni.join(cand, ["doc_a", "doc_b"], "left").select(
        "jr", F.coalesce("is_c", F.lit(0)).alias("is_cand")
    )
    byb = (
        marked.groupBy(
            F.least(F.floor(F.col("jr") * 10), F.lit(9)).cast("long").alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("n_pairs"),
             F.sum("is_cand").cast("long").alias("n_cand"))
        .withColumn("s", (F.col("bucket") + 0.5) / 10.0)
        .withColumn("s2", F.col("s") * F.col("s"))
    )
    one_minus_s4 = F.lit(1.0) - F.col("s2") * F.col("s2")
    return byb.select(
        "bucket",
        "n_pairs",
        "n_cand",
        rfix(F.col("n_cand").cast("double") / F.col("n_pairs"), 4).alias(
            "measured_rate"
        ),
        rfix(
            F.lit(1.0) - one_minus_s4 * one_minus_s4 * one_minus_s4 * one_minus_s4,
            6,
        ).alias("theory_rate"),
    )


DRAFTS["dedup_lsh_s_curve_eval"] = (dedup_lsh_s_curve_eval, _s_curve_oracle())


# ---------------------------------------------------------------------------
# Kneser-Ney continuation diagnostics: the words whose continuation
# probability (distinct left contexts / distinct bigram types) most
# undershoots their raw frequency — the "Francisco problem" words an ML
# unigram backoff overweights and KN smoothing exists to fix.

_KN_MIN_COUNT = 5
_KN_TOP = 20

_KN_TOKS = "string_split_regex(text, '\\s+')"

KN_CONT_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_KN_TOKS} AS t FROM documents),
tok AS (
    SELECT t[CAST(idx.i AS INT)] AS w
    FROM toks, (SELECT unnest(range(1, 4097)) AS i) idx
    WHERE idx.i <= len(t)
),
bg AS (
    SELECT t[CAST(idx.i AS INT)] AS w1, t[CAST(idx.i AS INT) + 1] AS w2
    FROM toks, (SELECT unnest(range(1, 4097)) AS i) idx
    WHERE idx.i < len(t)
),
uni AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
cont AS (SELECT w2 AS w, count(DISTINCT w1)::BIGINT AS k FROM bg GROUP BY w2),
tots AS (
    SELECT (SELECT count(*) FROM tok)::BIGINT AS n,
           (SELECT count(*) FROM (SELECT DISTINCT w1, w2 FROM bg))::BIGINT AS b
),
scored AS (
    SELECT uni.w, uni.c, coalesce(cont.k, 0) AS k,
           {rfix_sql('(coalesce(cont.k, 0) * tots.n)::DOUBLE / (tots.b * uni.c)', 6)}
               AS cont_ratio
    FROM uni LEFT JOIN cont ON cont.w = uni.w CROSS JOIN tots
    WHERE uni.c >= {_KN_MIN_COUNT}
)
SELECT w, c AS c_uni, k AS n_contexts, cont_ratio
FROM scored
ORDER BY cont_ratio ASC, w ASC
LIMIT {_KN_TOP}
"""


def text_kn_continuation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation diagnostics: for every corpus word (count
    >= {_KN_MIN_COUNT}), the ratio of its CONTINUATION probability
    (distinct left contexts / distinct bigram types — KN's unigram
    backoff estimate) to its ML unigram probability, returning the
    {_KN_TOP} words where the ratio is lowest — frequent words that
    follow very few distinct contexts ("Francisco" after "San"), exactly
    the mass KN smoothing reassigns and a backoff LM built on raw
    frequencies misplaces. Complements text_bigram_quality_by_source
    (add-k scoring) with the distinct-context structure KN is built on.

    Exactness: all inputs are exact integer counts; the ratio
    k·N/(B·c) divides exact-integer doubles (deterministic IEEE), lands
    on rfix, and the top-{_KN_TOP} order is (rounded ratio, word) — a
    total order.

    Scale shape: one token exchange for unigram counts, one bigram-key
    exchange for distinct contexts (count-distinct collapses map-side to
    distinct (w1,w2) first), two 1-row totals broadcast back; the final
    TakeOrdered is top-{_KN_TOP}, never a full sort.
    """
    d = table(spark, sf_dir, "documents")
    t = T.tokens("text")
    toks = d.select(t.alias("t"))
    tok = toks.select(F.explode("t").alias("w"))
    n_keep = F.greatest(F.size("t") - 1, F.lit(0))
    bg = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n_keep).alias("w1"),
                F.slice(F.col("t"), 2, n_keep).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = tok.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    bg_types = bg.distinct()
    cont = bg_types.groupBy(F.col("w2").alias("w")).agg(
        F.count("*").cast("long").alias("k")
    )
    tots = tok.agg(F.count("*").cast("long").alias("n")).crossJoin(
        F.broadcast(bg_types.agg(F.count("*").cast("long").alias("b")))
    )
    scored = (
        uni.filter(F.col("c") >= _KN_MIN_COUNT)
        .join(cont, "w", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "w",
            F.col("c").alias("c_uni"),
            F.coalesce("k", F.lit(0)).alias("n_contexts"),
            rfix(
                (F.coalesce("k", F.lit(0)) * F.col("n")).cast("double")
                / (F.col("b") * F.col("c")),
                6,
            ).alias("cont_ratio"),
        )
    )
    return scored.orderBy(F.asc("cont_ratio"), F.asc("w")).limit(_KN_TOP)


DRAFTS["text_kn_continuation_stats"] = (text_kn_continuation_stats, KN_CONT_ORACLE)


# ---------------------------------------------------------------------------
# Walsh-Hadamard perceptual fingerprint near-dup pairs: the
# frequency-domain sibling of mm_ahash_near_dup_pairs (aHash thresholds
# BRIGHTNESS per cell; this thresholds the SIGN of sequency components —
# pHash's move, with the DCT replaced by the Walsh-Hadamard transform so
# every coefficient is an EXACT integer sum, bit-portable by construction
# where cos() tables are not).

_WHT_N = 32        # signal cells sampled from the payload
_WHT_COEFS = 16    # sequency components u = 1.._WHT_COEFS (DC skipped)
_WHT_BAND_BITS = 8  # 2 bands x 8 bits => hamming <= 1 found by pigeonhole

WHT_ORACLE = f"""
WITH d AS (
    SELECT doc_id, text, length(text) AS L FROM documents WHERE length(text) > 0
),
p AS (
    SELECT doc_id, text,
           CASE WHEN L >= {_WHT_N} THEN L // {_WHT_N} ELSE 1 END AS st,
           CASE WHEN L >= {_WHT_N} THEN {_WHT_N} ELSE L END AS nc
    FROM d
),
cells AS (
    SELECT doc_id, idx.i,
           ord(substring(text, CAST(idx.i * st + 1 AS INT), 1)) AS v
    FROM p, (SELECT unnest(range(0, {_WHT_N})) AS i) idx
    WHERE idx.i < nc
),
coef AS (
    SELECT c.doc_id, u.u,
           sum(c.v * CASE WHEN bit_count(CAST(c.i AS BIGINT) & u.u) % 2 = 0
                          THEN 1 ELSE -1 END)::BIGINT AS w
    FROM cells c, (SELECT unnest(range(1, {_WHT_COEFS + 1})) AS u) u
    GROUP BY c.doc_id, u.u
),
h AS (
    SELECT doc_id,
           sum(CASE WHEN w > 0 THEN (1::BIGINT << CAST(u - 1 AS INT))
                    ELSE 0 END)::BIGINT AS wh
    FROM coef GROUP BY doc_id
),
bands AS (
    SELECT doc_id, wh, 0 AS band_i, wh & {(1 << _WHT_BAND_BITS) - 1} AS band_v
    FROM h
    UNION ALL
    SELECT doc_id, wh, 1, (wh >> {_WHT_BAND_BITS}) & {(1 << _WHT_BAND_BITS) - 1}
    FROM h
)
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
                CAST(b.doc_id AS BIGINT) AS doc_b,
                CAST(bit_count(xor(a.wh, b.wh)) AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.band_i = b.band_i AND a.band_v = b.band_v AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.wh, b.wh)) <= 1
"""


def mm_wht_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by Walsh-Hadamard perceptual fingerprint:
    {_WHT_N} signal cells sampled from the payload, {_WHT_COEFS}
    low-sequency WHT components w_u = Σ v_i·(−1)^popcount(i AND u)
    (u = 1..{_WHT_COEFS}; DC skipped — that is aHash's axis), one bit per
    component sign, paired by a flip-one-bit NEIGHBORHOOD join (exact for
    hamming <= 1: the identity variant catches equal hashes, the 16
    single-bit flips catch every 1-bit pair), verified by true hamming.
    pHash's frequency-domain move with the DCT replaced by the
    Walsh-Hadamard transform: every coefficient is an EXACT integer sum
    (bit-portable across engines by construction, where cos() tables are
    not), and the transform is the one used at scale when multiply-free
    integer pipelines matter.

    Like mm_ahash_near_dup_pairs, the synthetic payloads are text bytes,
    so the deterministic sampling branch runs in every environment and
    DuckDB reproduces the hash arithmetically; with real decoded frames
    the identical pipeline runs over pixel rows.

    Scale shape: fingerprints come from one Arrow-batched numpy matmul
    pass (multimodal/columns.wht_fingerprint — fixed-width output, text
    pruned before any join); candidates come from ONE equi-join keyed on
    the full 16-bit hash over a 17x variant explode (O(17n) candidate
    volume — an 8-bit band scheme's buckets collapse to 256 keys and go
    quadratic-in-bucket), never all-pairs; only (doc_id, hash) shuffles.
    """
    from ..multimodal.columns import wht_fingerprint

    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # Arrow kernel, not SQL higher-order functions: the equivalent nested
    # aggregate/zip_with expression is correct but costs ~4.5 s of
    # Catalyst ANALYSIS per invocation at any data size (and the naive
    # 16-separate-aggregates form re-evaluates the 32-substring cell
    # transform per element access — no CSE inside HOF lambdas; measured
    # 30 s). One numpy int64 matmul per batch, flat mapInPandas plan.
    hashes = wht_fingerprint(
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        n_cells=_WHT_N,
        n_coefs=_WHT_COEFS,
    )
    # Flip-one-bit neighborhood join, not band buckets: for hamming <= 1
    # over a 16-bit key, exploding each hash into itself + its 16
    # single-bit flips and equi-joining the variants against the plain
    # hashes is EXACT (a pair differs in 0 bits -> identity variant
    # matches; in 1 bit -> the flipped variant matches) and keys the
    # shuffle on the FULL 16-bit value — 65536 buckets instead of the
    # 256 an 8-bit band gives, so candidate volume is O(17n), not
    # O(n²/256)·bands (measured 3.62 s -> 0.9 s at sf0.1; the oracle
    # keeps the 2-band pigeonhole form, which is result-identical).
    # explode the BIT INDEX, not an array of 17 hash expressions: the
    # variant is derived from the carried `wh` attribute AFTER the
    # Generate boundary, so the fingerprint fold is evaluated once per
    # document (an array(wh, wh^1, ...) literal inlines the fold 17x
    # under projection collapse — same no-CSE trap one level up).
    variants = (
        hashes.select(
            F.col("doc_id").alias("doc_a"),
            F.col("wh").alias("ha"),
            F.explode(F.sequence(F.lit(-1), F.lit(_WHT_COEFS - 1))).alias("k"),
        )
        .select(
            "doc_a",
            "ha",
            F.expr(
                "CASE WHEN k < 0 THEN ha ELSE ha ^ shiftleft(1L, k) END"
            ).alias("vk"),
        )
    )
    plain = hashes.select(
        F.col("doc_id").alias("doc_b"), F.col("wh").alias("hb")
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        variants.join(plain, variants.vk == plain.hb)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .distinct()
    )


DRAFTS["mm_wht_fingerprint_pairs"] = (mm_wht_fingerprint_pairs, WHT_ORACLE)


# ---------------------------------------------------------------------------
# Yule-Walker AR(2) fit of the daily order-count series — the parametric
# follow-on to t19's ACF: the two autoregressive coefficients the lag-1/
# lag-2 autocorrelations imply, via the closed-form 2x2 Yule-Walker solve.

AR2_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, count(*)::DOUBLE AS x
    FROM orders GROUP BY d
),
lagged AS (
    SELECT x,
           lag(x, 1) OVER (ORDER BY d) AS x1,
           lag(x, 2) OVER (ORDER BY d) AS x2
    FROM daily
),
m AS (
    SELECT count(*)::BIGINT AS n_days,
           count(x1)::DOUBLE AS n1, sum(CASE WHEN x1 IS NOT NULL THEN x END) AS sa1,
           sum(x1) AS sb1, sum(CASE WHEN x1 IS NOT NULL THEN x * x END) AS saa1,
           sum(x1 * x1) AS sbb1, sum(x * x1) AS sab1,
           count(x2)::DOUBLE AS n2, sum(CASE WHEN x2 IS NOT NULL THEN x END) AS sa2,
           sum(x2) AS sb2, sum(CASE WHEN x2 IS NOT NULL THEN x * x END) AS saa2,
           sum(x2 * x2) AS sbb2, sum(x * x2) AS sab2
    FROM lagged
),
r AS (
    SELECT n_days,
           CASE WHEN n1 >= 2 AND (n1 * saa1 - sa1 * sa1) > 0
                     AND (n1 * sbb1 - sb1 * sb1) > 0
                THEN (n1 * sab1 - sa1 * sb1)
                     / sqrt((n1 * saa1 - sa1 * sa1) * (n1 * sbb1 - sb1 * sb1))
           END AS rho1,
           CASE WHEN n2 >= 2 AND (n2 * saa2 - sa2 * sa2) > 0
                     AND (n2 * sbb2 - sb2 * sb2) > 0
                THEN (n2 * sab2 - sa2 * sb2)
                     / sqrt((n2 * saa2 - sa2 * sa2) * (n2 * sbb2 - sb2 * sb2))
           END AS rho2
    FROM m
)
SELECT n_days,
       {rho1} AS rho1,
       {rho2} AS rho2,
       {phi1} AS phi1,
       {phi2} AS phi2
FROM r
""".format(
    rho1=rfix_sql("rho1", 6),
    rho2=rfix_sql("rho2", 6),
    phi1=rfix_sql(
        "CASE WHEN (1 - rho1 * rho1) > 0 "
        "THEN rho1 * (1 - rho2) / (1 - rho1 * rho1) END", 6
    ),
    phi2=rfix_sql(
        "CASE WHEN (1 - rho1 * rho1) > 0 "
        "THEN (rho2 - rho1 * rho1) / (1 - rho1 * rho1) END", 6
    ),
)


def t37_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule-Walker AR(2) fit of the daily order-count series: lag-1/lag-2
    Pearson autocorrelations (pairwise-complete, t19's exact-moment
    discipline) solved through the closed-form 2x2 Yule-Walker system
    φ1 = ρ1(1−ρ2)/(1−ρ1²), φ2 = (ρ2−ρ1²)/(1−ρ1²) — the parametric
    follow-on to t19_acf_daily_orders: not just how correlated the
    series is with its past, but the autoregression those correlations
    imply (φ2's sign separates momentum from mean-reversion at lag 2).

    Exactness: daily counts are small integers, so every moment sum is
    an EXACT double and ρ/φ are IEEE-deterministic ratios of exact
    values (no summation-order ulp anywhere); zero-variance and
    degenerate-denominator guards mirror t19's (Spark's ANSI corr
    throws on constant series — raw moments with explicit guards).

    Scale shape: one map-side-combinable fact rollup to the day spine;
    the lag window and the one-row moment aggregate run over the
    calendar-bounded frame; constant-width output.
    """
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "x", F.lag("x", 1).over(w).alias("x1"), F.lag("x", 2).over(w).alias("x2")
    )

    def _rho(k: int):
        y = F.col(f"x{k}")
        xm = F.when(y.isNotNull(), F.col("x"))
        n = F.count(y).cast("double")
        sa, sb = F.sum(xm), F.sum(y)
        saa, sbb, sab = F.sum(xm * xm), F.sum(y * y), F.sum(xm * y)
        va, vb = n * saa - sa * sa, n * sbb - sb * sb
        return F.when(
            (n >= 2) & (va > 0) & (vb > 0), (n * sab - sa * sb) / F.sqrt(va * vb)
        )

    m = lagged.agg(
        F.count("*").cast("long").alias("n_days"),
        _rho(1).alias("rho1"),
        _rho(2).alias("rho2"),
    )
    den = F.lit(1.0) - F.col("rho1") * F.col("rho1")
    return m.select(
        "n_days",
        rfix(F.col("rho1"), 6).alias("rho1"),
        rfix(F.col("rho2"), 6).alias("rho2"),
        rfix(
            F.when(den > 0, F.col("rho1") * (F.lit(1.0) - F.col("rho2")) / den), 6
        ).alias("phi1"),
        rfix(
            F.when(den > 0, (F.col("rho2") - F.col("rho1") * F.col("rho1")) / den), 6
        ).alias("phi2"),
    )


DRAFTS["t37_ar2_yule_walker"] = (t37_ar2_yule_walker, AR2_ORACLE)


# ---------------------------------------------------------------------------
# IVF recall-vs-cost tuning CURVE: nprobe in {1, 2, 4} from ONE ranking
# pass — the whole sweep ann_ivf_recall_eval (nprobe=1) and
# ann_ivf_nprobe2_recall (nprobe=2) sample pointwise, as a single query
# whose output is the curve an IVF deployment actually reads before
# fixing nprobe. The S-curve eval's sibling for the ANN index family.

_CURVE_K = 8        # coarse centroids (= drafts_r10._NPROBE_K)
_CURVE_PANEL = 5    # query panel (= the pointwise evals' panel)
_CURVE_LEVELS = (1, 2, 4)

NPROBE_CURVE_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {_CURVE_PANEL}),
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
    WHERE vec_id < {_CURVE_K}
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
levels AS (SELECT unnest([{', '.join(str(x) for x in _CURVE_LEVELS)}]) AS np),
probes AS (
    SELECT l.np, r.vec_id AS query_id, r.cid
    FROM ranked r CROSS JOIN levels l
    WHERE r.vec_id < {_CURVE_PANEL} AND r.rn <= l.np
),
cand AS (
    SELECT p.np, p.query_id, na.vec_id AS neighbor_id
    FROM probes p JOIN assign na ON na.cid = p.cid AND na.vec_id <> p.query_id
),
hits AS (
    SELECT l.np, count(*)::BIGINT AS total_hits
    FROM levels l
    JOIN cand c ON c.np = l.np
    JOIN truth t ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
    GROUP BY l.np
),
sizes AS (SELECT np, count(*)::BIGINT AS total_candidates FROM cand GROUP BY np)
SELECT CAST(l.np AS BIGINT) AS nprobe,
       coalesce(s.total_candidates, 0) AS total_candidates,
       coalesce(h.total_hits, 0) AS total_hits,
       {rfix_sql(
           f'coalesce(h.total_hits, 0) / (10.0 * {_CURVE_PANEL})', 4)}
           AS mean_recall_at_10
FROM levels l
LEFT JOIN sizes s ON s.np = l.np
LEFT JOIN hits h ON h.np = l.np
"""


def ann_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall-vs-candidate-cost tuning curve: recall@10 of the coarse
    index at nprobe ∈ {_CURVE_LEVELS}, one output row per level — the
    sweep an IVF deployment reads before fixing nprobe, produced whole
    instead of pointwise (ann_ivf_recall_eval = the nprobe=1 point,
    ann_ivf_nprobe2_recall = the nprobe=2 point; both stay registered as
    the driver-verified anchors this curve must agree with — an
    invariant test pins the agreement). Recall is monotone
    non-decreasing in nprobe BY CONSTRUCTION (probe sets are nested);
    candidate cost grows roughly linearly — the curve IS that trade.

    Scale shape mirrors the production index: ONE K-way cosine ranking
    pass (pinned — rank 1 assigns database vectors, rank <= max(nprobe)
    yields every probe list; no per-level scoring pass) , the level
    dimension enters as a 3-row broadcast cross, candidates are a
    cell-keyed join, truth is exact over the broadcast panel only.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _CURVE_PANEL).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    from pyspark.sql import Window

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
    cents = e.filter(F.col("vec_id") < _CURVE_K).select(
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
        .filter(F.col("rn") <= max(_CURVE_LEVELS))
        .select("vec_id", "cid", "rn")
    ).localCheckpoint()
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    levels = spark.createDataFrame([(x,) for x in _CURVE_LEVELS], "np LONG")
    probes = (
        ranked.filter(F.col("vec_id") < _CURVE_PANEL)
        .crossJoin(F.broadcast(levels))
        .filter(F.col("rn") <= F.col("np"))
        .select("np", F.col("vec_id").alias("query_id"), "cid")
    )
    cand = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("np", "query_id", F.col("vec_id").alias("neighbor_id"))
    )
    sizes = cand.groupBy("np").agg(F.count("*").cast("long").alias("total_candidates"))
    hits = cand.join(truth, ["query_id", "neighbor_id"]).groupBy("np").agg(
        F.count("*").cast("long").alias("total_hits")
    )
    return (
        levels.join(F.broadcast(sizes), "np", "left")
        .join(F.broadcast(hits), "np", "left")
        .select(
            F.col("np").cast("long").alias("nprobe"),
            F.coalesce("total_candidates", F.lit(0)).alias("total_candidates"),
            F.coalesce("total_hits", F.lit(0)).alias("total_hits"),
            rfix(
                F.coalesce("total_hits", F.lit(0)) / F.lit(10.0 * _CURVE_PANEL), 4
            ).alias("mean_recall_at_10"),
        )
    )


DRAFTS["ann_ivf_nprobe_curve"] = (ann_ivf_nprobe_curve, NPROBE_CURVE_ORACLE)


# ---------------------------------------------------------------------------
# Tranche 4: one-pass table profiler, graph eccentricity/diameter,
# exact-integer effective sample size, term burstiness. All four are
# exact-arithmetic end to end (counts, mins/maxes, integer moments) — no
# transcendental in any compared value.


# One-pass per-column profile of the orders table — the describe()-class
# report a 100 TB ingestion runs per partition before publishing, with
# every number exact and oracled (Spark's summary()/describe() are
# driver conveniences with approximate percentiles; this is the
# contract-grade form).

_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


def _profiler_oracle() -> str:
    legs = []
    for c in _PROFILE_COLS:
        legs.append(f"""
    SELECT '{c}' AS column_name,
           count(*)::BIGINT AS n_rows,
           count({c})::BIGINT AS n_non_null,
           count(DISTINCT {c})::BIGINT AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM orders""")
    return "\nUNION ALL".join(legs)


def diag_table_profiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler over the orders batch: per column, row
    count, non-null count, exact distinct count, and min/max rendered as
    strings — the schema-on-read triage report (Deequ's profiler /
    pandas-profiling's top block) next to diag_quality_report's
    rule-based gate. Everything exact: a 100 TB publish decision should
    not hinge on an approximate distinct.

    Scale shape (r13): one union leg per column, each leg scanning ONLY
    its column (columnar storage makes six single-column scans
    byte-equivalent to one six-column scan) and collapsing to the
    column's distinct values map-side before the exact distinct count and
    min/max — so every exchange carries distinct values only, exactly as
    before. The previous single mixed 6-distinct aggregate was also one
    pass, but Spark's Expand-based multi-distinct rewrite put the whole
    row stream through an interpreted multi-phase aggregation costing
    ~5x the two-leg arithmetic (guide §1.2: measured 3.23 s -> 0.51 s at
    sf0.1, identical rows). Min/max stringification still happens after
    aggregation (6 rows), so scans stay typed and prunable.
    """
    o = table(spark, sf_dir, "orders")
    legs = []
    for c in _PROFILE_COLS:
        d = o.select(F.col(c).alias("v"))
        base = d.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_non_null"),
        )
        dist = d.distinct().agg(
            F.count("v").alias("n_distinct"),
            F.min("v").cast("string").alias("min_value"),
            F.max("v").cast("string").alias("max_value"),
        )
        legs.append(
            base.crossJoin(dist).select(
                F.lit(c).alias("column_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_non_null").cast("long").alias("n_non_null"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                "min_value",
                "max_value",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


DRAFTS["diag_table_profiler"] = (diag_table_profiler, _profiler_oracle())


# ---------------------------------------------------------------------------
# Eccentricity / diameter / radius of the trade graph — the remaining
# all-pairs-distance statistics over the SAME multi-root BFS frame
# closeness consumes (one more reader of bfs_min_hops_multi, zero new
# iteration machinery).

ECC_ORACLE = f"""
WITH RECURSIVE {_EDGE_SQL},
roots AS (SELECT DISTINCT src AS root FROM edges),
walk(root, node, hop) AS (
    SELECT root, root, 0 FROM roots
    UNION
    SELECT w.root, e.dst, w.hop + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.hop < {_CLOSENESS_MAX_HOPS}
),
dist AS (SELECT root, node, min(hop) AS d FROM walk GROUP BY root, node),
ecc AS (SELECT root, max(d) AS e, count(*)::BIGINT AS n_comp FROM dist GROUP BY root),
g AS (
    SELECT max(e) AS diameter, min(e) AS radius FROM ecc
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST((SELECT diameter FROM g) AS BIGINT) AS diameter,
       CAST((SELECT radius FROM g) AS BIGINT) AS radius,
       CAST(sum(CASE WHEN e.e = (SELECT radius FROM g) THEN 1 ELSE 0 END)
           AS BIGINT) AS n_center,
       CAST(sum(CASE WHEN e.e = (SELECT diameter FROM g) THEN 1 ELSE 0 END)
           AS BIGINT) AS n_periphery
FROM ecc e
"""


def g_eccentricity_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eccentricity statistics of the trade graph: diameter (max over
    nodes of the farthest-reachable distance), radius (min eccentricity),
    and the sizes of the center (radius-eccentricity nodes) and
    periphery (diameter-eccentricity nodes) — the all-pairs-distance
    summary family that closeness started, over non-isolated nodes
    (eccentricity of an isolated node is undefined).

    Reuses the SAME one-frame multi-root BFS as g_closeness_centrality
    (operators/graph.bfs_min_hops_multi) — nothing new iterates; the
    statistics are two bounded rollups over the (root, node, hops)
    frame. Hop cap {_CLOSENESS_MAX_HOPS} (the reference's shortestPath
    depth); on this dense graph every eccentricity is far below it.
    """
    # Thin caller of operators/graphalgs.eccentricity_stats (r12 library
    # extraction over the same multi-root BFS frame closeness consumes).
    from ..operators import graphalgs

    return graphalgs.eccentricity_stats(
        spark, trade_edges(spark, sf_dir), max_hops=_CLOSENESS_MAX_HOPS
    )


DRAFTS["g_eccentricity_diameter"] = (g_eccentricity_diameter, ECC_ORACLE)


# ---------------------------------------------------------------------------
# Effective sample size of length-proportional sampling, per source —
# ESS = (Σw)²/Σw² on EXACT INTEGER weights (token counts), so the
# concentration diagnostic is bit-portable with no transcendental
# anywhere (the DSIR log-weights need exp() for ESS, which is not; the
# length-weighted form answers the same "how few documents dominate my
# sample?" question exactly).

_ESS_TOKS = "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"

ESS_ORACLE = f"""
WITH sized AS (
    SELECT source, {_ESS_TOKS}::BIGINT AS w FROM documents
),
m AS (
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(w)::BIGINT AS sum_w,
           sum(w * w) AS sum_w2
    FROM sized GROUP BY source
)
SELECT source, n_docs, sum_w,
       {rfix_sql('CASE WHEN sum_w2 > 0 '
                 'THEN (sum_w::DOUBLE * sum_w) / sum_w2 ELSE 0 END', 4)} AS ess,
       {rfix_sql('CASE WHEN sum_w2 > 0 '
                 'THEN (sum_w::DOUBLE * sum_w) / sum_w2 / n_docs ELSE 0 END', 4)}
           AS ess_ratio
FROM m
"""


def sample_ess_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of LENGTH-PROPORTIONAL document sampling per
    source: ESS = (Σw)²/Σw² with w = token count — how many
    equally-weighted documents the skewed draw is actually worth, and
    ess_ratio = ESS/n ∈ (0, 1] as the concentration score (1 = uniform
    lengths; → 1/n = one giant document dominates). The diagnostic read
    before token-budget sampling (sample_token_budget_fill) silently
    turns a 10k-document source into the statistical equivalent of 80.

    Exact end to end: weights are integer token counts; Σw² accumulates
    in decimal(38,0)/HUGEINT (the cents² LONG-overflow class the round-8
    sf0.1 sweep caught — w² ≈ 1.7e7 per 4k-token doc clears a long past
    ~5e11 documents, squarely inside 100 TB territory; the overflow-audit
    CI guard flagged exactly this line), and the two ratios divide
    exact-integer doubles — IEEE-deterministic, rfix only as the
    presentation boundary.

    Scale shape: one stateless token-count expression per row, one
    source-keyed map-combinable exchange. The ideal 100 TB shape.
    """
    d = table(spark, sf_dir, "documents")
    w = F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).cast("long")
    dec = "decimal(38,0)"
    m = d.select("source", w.alias("w")).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.col("w").cast(dec) * F.col("w").cast(dec)).alias("sum_w2"),
    )
    ess = F.when(
        F.col("sum_w2") > 0,
        (F.col("sum_w").cast("double") * F.col("sum_w")) / F.col("sum_w2"),
    ).otherwise(0.0)
    return m.select(
        "source",
        "n_docs",
        "sum_w",
        rfix(ess, 4).alias("ess"),
        rfix(ess / F.col("n_docs"), 4).alias("ess_ratio"),
    )


DRAFTS["sample_ess_lengths"] = (sample_ess_lengths, ESS_ORACLE)


# ---------------------------------------------------------------------------
# Term burstiness: variance-to-mean ratio (index of dispersion) of
# per-document term counts — Church & Gale's observation that content
# words arrive in BURSTS (VMR >> 1) while function words are near-
# Poisson (VMR ≈ 1). The dispersion form keeps every compared number a
# ratio of exact-integer moments (the Poisson-tail form needs exp()).

_BURST_MIN_COUNT = 30
_BURST_TOP = 20

BURSTINESS_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
    FROM documents
),
n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM documents
      WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
per_doc AS (SELECT w, doc_id, count(*)::BIGINT AS x FROM toks GROUP BY w, doc_id),
m AS (
    SELECT w,
           sum(x)::BIGINT AS c,
           sum(x * x) AS ssq,
           count(*)::BIGINT AS df
    FROM per_doc GROUP BY w
),
scored AS (
    SELECT m.w, m.c, m.df,
           {rfix_sql('(ssq::DOUBLE / n.n_docs'
                     ' - (c::DOUBLE / n.n_docs) * (c::DOUBLE / n.n_docs))'
                     ' / (c::DOUBLE / n.n_docs)', 4)} AS vmr
    FROM m CROSS JOIN n
    WHERE m.c >= {_BURST_MIN_COUNT}
)
SELECT w, c AS term_count, df AS doc_freq, vmr
FROM scored
ORDER BY vmr DESC, w ASC
LIMIT {_BURST_TOP}
"""


def text_term_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {_BURST_TOP} burstiest frequent terms by index of dispersion:
    VMR = Var(x)/E(x) of the per-document count x (zeros included via
    the moment identities E[x] = c/N, E[x²] = ssq/N over N non-empty
    documents) — Church & Gale's burstiness signal: topical content
    words clump into few documents (VMR >> 1), function words spread
    near-Poisson (VMR ≈ 1). The quality-filter family reads this to
    find template/boilerplate tokens that repeat abnormally within
    documents.

    Exactness: both moments are exact integer sums; VMR divides
    exact-integer doubles (IEEE-deterministic — the dispersion form
    exists precisely because the Poisson-tail form needs exp(), which
    is not bit-portable); ranking is (rounded VMR, term) — total order.

    Scale shape: one (term, doc) exchange for per-doc counts (map-side
    combinable), one term-keyed moment rollup, a 1-row N broadcast, and
    a top-{_BURST_TOP} TakeOrdered — never a full sort.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("w"),
    )
    n = d.filter(
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")) > 0
    ).agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    per_doc = toks.groupBy("w", "doc_id").agg(F.count("*").alias("x"))
    # ssq in decimal(38,0): x² sums are the cents²-overflow class the
    # round-9 audit guard pins (x ≈ 4e3 per doc => x² ≈ 1.7e7; a LONG
    # clears at ~5e11 documents — inside 100 TB territory)
    dec = "decimal(38,0)"
    m = per_doc.groupBy("w").agg(
        F.sum("x").cast("long").alias("c"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("ssq"),
        F.count("*").cast("long").alias("df"),
    )
    ex = F.col("c").cast("double") / F.col("n_docs")
    vmr = (F.col("ssq").cast("double") / F.col("n_docs") - ex * ex) / ex
    scored = (
        m.filter(F.col("c") >= _BURST_MIN_COUNT)
        .crossJoin(F.broadcast(n))
        .select(
            "w",
            F.col("c").alias("term_count"),
            F.col("df").alias("doc_freq"),
            rfix(vmr, 4).alias("vmr"),
        )
    )
    return scored.orderBy(F.desc("vmr"), F.asc("w")).limit(_BURST_TOP)


DRAFTS["text_term_burstiness_topk"] = (text_term_burstiness_topk, BURSTINESS_ORACLE)


# ---------------------------------------------------------------------------
# Tranche 5: degree assortativity, ANN hubness, weekday ANOVA — three
# exact-moment statistics completing the graph / ANN-eval / classical-
# stats families.


ASSORT_ORACLE = f"""
WITH {_EDGE_SQL},
deg AS (SELECT src AS node, count(*)::BIGINT AS d FROM edges GROUP BY src),
pairs AS (
    SELECT a.d::DOUBLE AS x, b.d::DOUBLE AS y
    FROM edges e
    JOIN deg a ON a.node = e.src
    JOIN deg b ON b.node = e.dst
),
m AS (
    SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
    FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_directed_edges,
       {rfix_sql('CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 '
                 'THEN (n * sxy - sx * sy) '
                 '     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END', 6)}
           AS assortativity
FROM m
"""


def g_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the trade graph (Newman 2002): the Pearson
    correlation of (degree(src), degree(dst)) over directed edge
    endpoints — positive means hubs trade with hubs (assortative mixing),
    negative means hub-and-spoke. The one classical whole-graph mixing
    statistic the g_* family did not yet cover.

    Exactness: degrees are exact integer counts; every moment sum is a
    sum of exact-integer products in double (degrees² bounded by
    |nations|² — no overflow class), so the correlation is an
    IEEE-deterministic ratio; the zero-variance guard mirrors t19's
    (a regular graph has undefined assortativity — NULL, not a crash).

    Scale shape: the fact-scale edge derivation is shared with every
    other graph query; degrees and the moment rollup are
    |nations|-bounded; the degree table joins back as a broadcast.
    """
    # Thin caller of operators/graphalgs.degree_assortativity (r12
    # library extraction).
    from ..operators import graphalgs

    return graphalgs.degree_assortativity(trade_edges(spark, sf_dir), digits=6)


DRAFTS["g_degree_assortativity"] = (g_degree_assortativity, ASSORT_ORACLE)


# ---------------------------------------------------------------------------
# ANN hubness: the k-occurrence distribution over the brute-force top-k
# lists of a query panel — high-dimensional spaces grow "hubs" that
# appear in everyone's neighbor list and poison recall; this is the
# diagnostic that says whether the ANN indexes above are fighting that.

_HUB_PANEL = 50
_HUB_K = 10

HUBNESS_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {_HUB_PANEL}),
topk AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {rfix_sql(V.cosine_sql('q.qe', 'e.embedding'), 6)} DESC,
                            e.vec_id) AS rn
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ) WHERE rn <= {_HUB_K}
),
occ AS (SELECT neighbor_id, count(*)::BIGINT AS k_occ FROM topk GROUP BY neighbor_id),
m AS (
    SELECT count(*)::DOUBLE AS n, sum(k_occ)::DOUBLE AS s,
           sum(k_occ * k_occ)::DOUBLE AS s2,
           sum(k_occ * k_occ * k_occ)::DOUBLE AS s3,
           max(k_occ)::BIGINT AS max_occ
    FROM occ
)
SELECT CAST(n AS BIGINT) AS n_listed_vectors,
       max_occ AS max_k_occurrence,
       {rfix_sql('s / n', 4)} AS mean_k_occurrence,
       {rfix_sql('CASE WHEN (s2 / n - (s / n) * (s / n)) > 0 THEN '
                 '(s3 / n - 3 * (s / n) * (s2 / n) + 2 * (s / n) * (s / n) * (s / n)) '
                 '/ (sqrt(s2 / n - (s / n) * (s / n)) '
                 '   * (s2 / n - (s / n) * (s / n))) END', 4)} AS k_occ_skewness
FROM m
"""


def ann_hubness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic over the exact top-{_HUB_K} lists of a
    {_HUB_PANEL}-query panel: the k-occurrence N_k(v) = how many panel
    lists vector v appears in, summarized as max, mean, and SKEWNESS —
    Radovanović et al.'s measure of the high-dimensional hub
    phenomenon (skewness >> 0 means a few vectors dominate everyone's
    neighbor lists, which silently caps recall for every ANN index in
    the registry; near 0 means the space is hub-free at this k).

    Exactness: k-occurrences are exact integer counts (the top-k lists
    are the registry's canonical rounded-cosine ranking); the three
    central moments divide exact-integer-sum doubles — deterministic,
    with the zero-variance guard NULLing the degenerate case.

    Scale shape: the panel rides one broadcast against the vector scan
    (the ann_topk_cosine shape); k-occurrence is one count rollup over
    panel_size × k rows; moments are a 1-row reduce.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _HUB_PANEL).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("c6"), F.asc("neighbor_id"))
    topk = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            rfix(V.cosine(F.col("qe"), F.col("embedding")), 6).alias("c6"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HUB_K)
        .select("query_id", "neighbor_id")
    )
    occ = topk.groupBy("neighbor_id").agg(F.count("*").cast("long").alias("k_occ"))
    x = F.col("k_occ").cast("double")
    m = occ.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.max("k_occ").cast("long").alias("max_occ"),
    )
    mu = F.col("s") / F.col("n")
    var = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    return m.select(
        F.col("n").cast("long").alias("n_listed_vectors"),
        F.col("max_occ").alias("max_k_occurrence"),
        rfix(mu, 4).alias("mean_k_occurrence"),
        rfix(F.when(var > 0, m3 / (F.sqrt(var) * var)), 4).alias("k_occ_skewness"),
    )


DRAFTS["ann_hubness_stats"] = (ann_hubness_stats, HUBNESS_ORACLE)


# ---------------------------------------------------------------------------
# One-way ANOVA across weekdays: does day-of-week explain daily revenue?
# The F-statistic from exact-cents moment sums — the k-group
# generalization of a_welch_ttest_priorities, and the significance lens
# on t22's weekday seasonal decomposition.

ANOVA_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           dayofweek(CAST(o_orderdate AS DATE))::BIGINT AS dow,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
    FROM orders GROUP BY 1, 2
),
g AS (
    SELECT dow, count(*)::DOUBLE AS n, sum(c)::DOUBLE AS s,
           sum(c * c) AS s2
    FROM daily GROUP BY dow
),
tot AS (
    SELECT sum(n) AS n, sum(s) AS s, count(*)::BIGINT AS k,
           sum(s * s / n) AS sg, sum(s2::DOUBLE) AS s2
    FROM g
),
f AS (
    SELECT k, CAST(n AS BIGINT) AS n_days,
           (sg - s * s / n) / 10000.0 AS ssb,
           (s2 - sg) / 10000.0 AS ssw
    FROM tot
)
SELECT n_days, CAST(k AS BIGINT) AS n_groups,
       {rfix_sql('ssb / 1000000.0', 2)} AS ssb_millions,
       {rfix_sql('ssw / 1000000.0', 2)} AS ssw_millions,
       {rfix_sql('CASE WHEN ssw > 0 AND n_days > k THEN '
                 '(ssb / (k - 1)) / (ssw / (n_days - k)) END', 4)} AS f_stat
FROM f
"""


def a_anova_weekday_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily revenue across the 7 weekdays: between- and
    within-group sums of squares and the F statistic — the significance
    test behind t22's weekday seasonal decompose (is the weekday effect
    real, or noise?), and the k-group generalization of
    a_welch_ttest_priorities. Uses the moment identities
    SSB = Σ sᵢ²/nᵢ − S²/N and SSW = Σx² − Σ sᵢ²/nᵢ so one pass over the
    day spine suffices.

    Exactness: daily revenue is exact integer cents; c² sums accumulate
    in HUGEINT/decimal (the cents² overflow class — the audit guard's
    home turf); SS terms convert cents² to currency² (/10⁴) at the
    boundary and the F ratio divides exact-input doubles. The SS values
    themselves are emitted in MILLIONS at 2dp — at ~1e15 currency² an
    absolute 2-decimal rounding sits on the 17th significant digit,
    BELOW double resolution, and the digit flips with executor count
    (caught by a local[8] bare-session probe after three local[16]
    parity scales passed; ratios like F are magnitude-safe, raw sums
    must round RELATIVE to magnitude).

    Scale shape: one map-combinable fact rollup to the (day, weekday)
    spine, a 7-row group rollup, and a 1-row reduce — fact-linear scan,
    constant state.
    """
    o = table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        F.dayofweek(F.col("o_orderdate").cast("date")).cast("long").alias("dow"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("c")
    )
    g = daily.groupBy("dow").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("s2"),
    )
    tot = g.agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sg"),
        F.sum(F.col("s2").cast("double")).alias("s2"),
    )
    ssb = (F.col("sg") - F.col("s") * F.col("s") / F.col("n")) / 10000.0
    ssw = (F.col("s2") - F.col("sg")) / 10000.0
    fstat = F.when(
        (ssw > 0) & (F.col("n") > F.col("k")),
        (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))),
    )
    return tot.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("k").alias("n_groups"),
        rfix(ssb / 1e6, 2).alias("ssb_millions"),
        rfix(ssw / 1e6, 2).alias("ssw_millions"),
        rfix(fstat, 4).alias("f_stat"),
    )


DRAFTS["a_anova_weekday_revenue"] = (a_anova_weekday_revenue, ANOVA_ORACLE)


# ---------------------------------------------------------------------------
# Tranche 6 (final round-9 pair): estimator-error eval for the MinHash
# SIGNATURE itself, and the fingerprint distance distribution that
# justifies the WHT near-dup threshold.


_EST_PANEL = 30


def _minhash_est_oracle() -> str:
    from ..functions import hashing as H
    from .llmops import _TOKS as _LTOKS
    from .llmops import N_PERM

    jac = (
        "len(list_intersect(a.s, b.s))::DOUBLE / "
        "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"
    )
    h = f"({H.md5_long_sql('s')} % {H.MERSENNE})"
    mins = ",\n           ".join(
        f"min({H.perm_sql(h, i)}) AS m{i}" for i in range(N_PERM)
    )
    matches = " + ".join(
        f"CASE WHEN x.m{i} = y.m{i} THEN 1 ELSE 0 END" for i in range(N_PERM)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_LTOKS} AS t FROM documents),
    sh0 AS (SELECT doc_id, list_distinct({T.shingles_sql('t', 3)}) AS s
            FROM toks WHERE len(t) >= 3),
    truth AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               {rfix_sql(jac, 6)} AS jr
        FROM sh0 a JOIN sh0 b ON b.doc_id > a.doc_id
        WHERE a.doc_id < {_EST_PANEL}
          AND len(list_intersect(a.s, b.s)) > 0
    ),
    ex AS (SELECT doc_id, unnest(s) AS s FROM sh0),
    mh AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
    est AS (
        SELECT t.doc_a, t.doc_b, t.jr,
               ({matches})::DOUBLE / {N_PERM} AS e
        FROM truth t
        JOIN mh x ON x.doc_id = t.doc_a
        JOIN mh y ON y.doc_id = t.doc_b
    ),
    banded AS (
        SELECT least(CAST(floor(jr * 10) AS BIGINT), 9) AS bucket, jr, e
        FROM est
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {rfix_sql('avg(jr)', 4)} AS mean_true_jaccard,
           {rfix_sql('avg(e)', 4)} AS mean_estimate,
           {rfix_sql('avg(abs(e - jr))', 4)} AS mae,
           {rfix_sql('avg(e - jr)', 4)} AS bias
    FROM banded GROUP BY bucket
    """


def dedup_minhash_estimate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-error evaluation for the MinHash SIGNATURE itself:
    Ĵ = (matching components)/{16} against exact Jaccard on the blocked
    panel pair universe, reported per true-similarity decile as mean
    estimate, MAE, and bias. Completes the index's eval triptych —
    dedup_minhash_pr_eval scores the BANDING's candidate set,
    dedup_lsh_s_curve_eval its collision calibration, and this the raw
    estimator every banding decision quietly trusts (unbiasedness with
    sd = sqrt(J(1-J)/16), so decile MAE ≈ 0.1 at mid similarities is
    EXPECTED at 16 permutations — the eval makes the permutation-count
    cost/accuracy trade measurable).

    Exactness: signature components are exact integers (the production
    Carter-Wegman permutations); the match fraction is a ratio of exact
    small ints; exact Jaccard is exact set arithmetic — everything lands
    on rfix with no transcendental anywhere.

    Scale shape: truth is the same panel-bounded shingle equi-join as
    the S-curve eval; signatures join at one row per doc (16 longs);
    the rollup is 10 groups.
    """
    from ..functions import hashing
    from .llmops import N_PERM, _minhash_sigs

    d = table(spark, sf_dir, "documents")
    sh = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_distinct(T.shingles(T.tokens("text"), 3)).alias("s"),
    ).filter(F.size(F.col("s")) > 0)
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    ex = sh.select("doc_id", F.explode("s").alias("sg"))
    pan = ex.filter(F.col("doc_id") < _EST_PANEL).select(
        F.col("doc_id").alias("doc_a"), "sg"
    )
    shared = (
        pan.join(ex.select(F.col("doc_id").alias("doc_b"), "sg"), "sg")
        .filter(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    truth = (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            rfix(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jr"),
        )
    )
    sig = _minhash_sigs(spark, sf_dir, N_PERM)
    xa = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(N_PERM)]
    )
    xb = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(N_PERM)]
    )
    matches = sum(
        (F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(N_PERM)),
        F.lit(0),
    )
    est = (
        truth.join(xa, "doc_a")
        .join(xb, "doc_b")
        .select("jr", (matches.cast("double") / N_PERM).alias("e"))
    )
    return (
        est.groupBy(
            F.least(F.floor(F.col("jr") * 10), F.lit(9)).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            rfix(F.avg("jr"), 4).alias("mean_true_jaccard"),
            rfix(F.avg("e"), 4).alias("mean_estimate"),
            rfix(F.avg(F.abs(F.col("e") - F.col("jr"))), 4).alias("mae"),
            rfix(F.avg(F.col("e") - F.col("jr")), 4).alias("bias"),
        )
    )


DRAFTS["dedup_minhash_estimate_eval"] = (
    dedup_minhash_estimate_eval,
    _minhash_est_oracle(),
)


# ---------------------------------------------------------------------------
# WHT fingerprint distance distribution on a bounded panel — the
# histogram that justifies (or indicts) the hamming <= 1 near-dup
# threshold: a well-separated corpus shows a spike at 0-1 (dups) and a
# bell around 8 (random 16-bit hashes); mass at 2-4 would mean the
# threshold is leaving near-dups behind.

_WHTH_PANEL = 200

WHT_HIST_ORACLE = f"""
WITH d AS (
    SELECT doc_id, text, length(text) AS L FROM documents
    WHERE length(text) > 0 AND doc_id < {_WHTH_PANEL}
),
p AS (
    SELECT doc_id, text,
           CASE WHEN L >= {_WHT_N} THEN L // {_WHT_N} ELSE 1 END AS st,
           CASE WHEN L >= {_WHT_N} THEN {_WHT_N} ELSE L END AS nc
    FROM d
),
cells AS (
    SELECT doc_id, idx.i,
           ord(substring(text, CAST(idx.i * st + 1 AS INT), 1)) AS v
    FROM p, (SELECT unnest(range(0, {_WHT_N})) AS i) idx
    WHERE idx.i < nc
),
coef AS (
    SELECT c.doc_id, u.u,
           sum(c.v * CASE WHEN bit_count(CAST(c.i AS BIGINT) & u.u) % 2 = 0
                          THEN 1 ELSE -1 END)::BIGINT AS w
    FROM cells c, (SELECT unnest(range(1, {_WHT_COEFS + 1})) AS u) u
    GROUP BY c.doc_id, u.u
),
h AS (
    SELECT doc_id,
           sum(CASE WHEN w > 0 THEN (1::BIGINT << CAST(u - 1 AS INT))
                    ELSE 0 END)::BIGINT AS wh
    FROM coef GROUP BY doc_id
),
pairs AS (
    SELECT bit_count(xor(a.wh, b.wh))::BIGINT AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
)
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY hamming
"""


def mm_wht_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise WHT-fingerprint hamming-distance histogram over a
    {_WHTH_PANEL}-document panel — the threshold-selection evidence for
    mm_wht_fingerprint_pairs' hamming <= 1 cut (the watermark-planning
    move t10_lateness_profile makes for event time, applied to the
    fingerprint family): dup mass concentrates at 0-1, unrelated pairs
    bell around {_WHT_COEFS}/2, and mass in between would indict the
    threshold.

    Scale shape: fingerprints from the same Arrow kernel as the pair
    query; the all-pairs join is PANEL-BOUNDED by contract (C(panel,2)
    pairs — the standard eval protocol; production pairing stays the
    neighborhood join); output is a <= {_WHT_COEFS + 1}-row histogram.
    """
    from ..multimodal.columns import wht_fingerprint

    d = (
        table(spark, sf_dir, "documents")
        .filter((F.length("text") > 0) & (F.col("doc_id") < _WHTH_PANEL))
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    )
    h = wht_fingerprint(d, n_cells=_WHT_N, n_coefs=_WHT_COEFS)
    a = h.select(F.col("doc_id").alias("da"), F.col("wh").alias("ha"))
    b = h.select(F.col("doc_id").alias("db"), F.col("wh").alias("hb"))
    return (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .select(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("long")
            .alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


DRAFTS["mm_wht_hamming_histogram"] = (mm_wht_hamming_histogram, WHT_HIST_ORACLE)
