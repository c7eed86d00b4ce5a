"""Round-11 drafts (written in round 9; registered immediately via
queries/draft_layer.register_all — the _prioritize window puts the new
cohort first and keeps ≥5 stale re-verification slots, so a small batch
never re-develops a never-verified backlog).

A focused batch of four capability gaps, each a shape the registry did
not yet cover:

* ``w10_cume_dist_spend`` — cumulative-distribution / percent-rank
  window profile (§2.6 depth: the two tie-aware rank normalizations).
* ``text_bigram_perplexity_by_source`` — interpolated bigram language
  model scored per document, aggregated per source (the CCNet/KenLM
  perplexity-filter motif, one level up from text_unigram_logprob).
* ``dedup_containment_est_eval`` — sampled-shingle containment
  ESTIMATOR evaluated against exact containment on the same blocked
  candidate pairs (the estimator-vs-truth eval family next to
  dedup_minhash_pr_eval).
* ``ann_two_stage_rerank`` — PQ-ADC shortlist → exact-cosine rerank,
  the production two-stage retrieval pattern, with per-query agreement
  against the exact top-k.

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT, floats through rfix, money as exact cents (long)
wherever a comparison or ordering depends on it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.presentation import rfix, rfix_sql
from ..operators.ranks import exact_global_rank
from ..sources.tables import spread, table

DRAFTS: dict = {}


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _cents_sql(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# W10: cumulative distribution + percent rank of customer spend within
# market segment — the two tie-aware window normalizations (§2.6) the
# registry's rank/ntile/decile family did not yet cover.

W10_ORACLE = f"""
WITH spend AS (
    SELECT c.c_mktsegment AS segment, o.o_custkey,
           sum({_cents_sql('o.o_totalprice')}) AS spend_c
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
)
SELECT segment,
       CAST(o_custkey AS BIGINT) AS c_custkey,
       CAST(spend_c AS DOUBLE) / 100 AS spend,
       {rfix_sql('cume_dist() OVER (PARTITION BY segment ORDER BY spend_c)', 6)}
           AS spend_cume_dist,
       {rfix_sql('percent_rank() OVER (PARTITION BY segment ORDER BY spend_c)', 6)}
           AS spend_pct_rank
FROM spend
"""


def w10_cume_dist_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does each customer sit in their segment's spend
    distribution? ``cume_dist`` (fraction of the segment at or below this
    spend) and ``percent_rank`` ((rank−1)/(n−1)) per customer — the two
    TIE-AWARE window normalizations: equal spends share a value on both,
    so the output is deterministic without a unique tie-break key
    (contrast w8_decile_value_profile's ntile, which needs one).

    Exactness: spend is an integer-cent sum (long), so the window's
    ORDER BY key is bit-identical on both engines and tie GROUPS — which
    both functions' values depend on — cannot differ.

    Scale shape: one fact exchange (per-customer rollup), customer dim
    broadcast, then ONE window exchange partitioned by segment (a
    bounded, segment-parallel sort — never a global one).
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("spend_c"))
    )
    w = Window.partitionBy("segment").orderBy("spend_c")
    return spend.select(
        "segment",
        F.col("o_custkey").cast("long").alias("c_custkey"),
        (F.col("spend_c").cast("double") / 100).alias("spend"),
        rfix(F.cume_dist().over(w), 6).alias("spend_cume_dist"),
        rfix(F.percent_rank().over(w), 6).alias("spend_pct_rank"),
    )


DRAFTS["w10_cume_dist_spend"] = (w10_cume_dist_spend, W10_ORACLE)


# ---------------------------------------------------------------------------
# Containment ESTIMATOR eval: sampled-fingerprint containment vs exact
# containment on the same panel — the estimator-vs-truth eval family
# (dedup_minhash_pr_eval, dedup_snm_recall_eval) extended to the
# asymmetric-overlap score.

CONT_EVAL_PANEL = 400     # eval universe: doc_id < panel (bounded contract)
CONT_EVAL_MOD = 4         # keep fingerprints with fp % 4 == 0 (~25% sample)
_CE_TOKS = "string_split_regex(text, '\\s+')"


def _cont_eval_oracle() -> str:
    from ..functions.hashing import md5_long_sql
    from ..functions.text import shingles_sql

    return f"""
    WITH fp AS (
        SELECT DISTINCT doc_id, {md5_long_sql('sh')} AS fp
        FROM (SELECT doc_id, unnest({shingles_sql(_CE_TOKS, 4)}) AS sh
              FROM documents WHERE doc_id < {CONT_EVAL_PANEL})
    ),
    sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM fp GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
        FROM fp a JOIN fp b ON b.fp = a.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT doc_a, doc_b FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE 2 * shared >= least(sa.n, sb.n)
    ),
    sfp AS (SELECT * FROM fp WHERE fp % {CONT_EVAL_MOD} = 0),
    ssizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sfp GROUP BY doc_id),
    sshared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
        FROM sfp a JOIN sfp b ON b.fp = a.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    est AS (
        SELECT doc_a, doc_b FROM sshared
        JOIN ssizes sa ON sa.doc_id = doc_a
        JOIN ssizes sb ON sb.doc_id = doc_b
        WHERE 2 * shared >= least(sa.n, sb.n)
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM est) AS BIGINT) AS n_est_pos,
           CAST((SELECT count(*) FROM est JOIN truth USING (doc_a, doc_b))
               AS BIGINT) AS n_hits,
           {rfix_sql('(SELECT count(*) FROM est JOIN truth USING (doc_a, doc_b))::DOUBLE '
                     '/ nullif((SELECT count(*) FROM est), 0)', 4)} AS est_precision,
           {rfix_sql('(SELECT count(*) FROM est JOIN truth USING (doc_a, doc_b))::DOUBLE '
                     '/ nullif((SELECT count(*) FROM truth), 0)', 4)} AS est_recall
    """


def dedup_containment_est_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How good is SAMPLED containment as a stand-in for exact
    containment? The estimator keeps ~1/{mod} of each document's k-gram
    fingerprints by a deterministic hash cut (fp % {mod} == 0 — a
    bottom-sketch-style sample both engines reproduce bit-for-bit) and
    flags pairs whose SAMPLED smaller-side containment reaches 0.5; truth
    is the exact flag on full fingerprint sets. Output is the one-row
    precision/recall digest a curation pipeline reads before swapping the
    cheap estimator in — at 100 TB only the sampled join is affordable
    (its bucket join carries ~1/{mod} of the rows and ~1/{mod}² of the
    candidate pairs), so this eval IS the promotion gate.

    Eval contract: bounded panel (doc_id < {panel}) like the other
    estimator evals — the truth side's exact bucket join is the
    expensive leg and stays panel-sized by design. Both thresholds are
    INTEGER cross-product compares (2·shared ≥ min(n_a, n_b)), so flag
    membership cannot flip on a float boundary on either engine.

    Reference analog: none; beyond-reference LLM-curation eval surface
    (operators/containment.py carries the production operator).
    """
    from ..operators.containment import fingerprint_rows

    d = spread(table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < CONT_EVAL_PANEL
    )
    rows = fingerprint_rows(d, k=4)

    def flagged(fp_rows: DataFrame) -> DataFrame:
        sizes = fp_rows.groupBy("doc_id").agg(F.count("*").alias("n"))
        a = fp_rows.select(F.col("doc_id").alias("doc_a"), "fp")
        b = fp_rows.select(F.col("doc_id").alias("doc_b"), "fp")
        shared = (
            a.join(b, "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("shared"))
        )
        return (
            shared.join(
                sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
                "doc_a",
            )
            .join(
                sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
                "doc_b",
            )
            .filter(2 * F.col("shared") >= F.least("n_a", "n_b"))
            .select("doc_a", "doc_b")
        )

    truth = flagged(rows)
    est = flagged(rows.filter(F.col("fp") % CONT_EVAL_MOD == 0))
    hits = est.join(truth, ["doc_a", "doc_b"])
    counts = (
        truth.agg(F.count("*").alias("n_truth"))
        .crossJoin(est.agg(F.count("*").alias("n_est_pos")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
    )
    return counts.select(
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_est_pos").cast("long").alias("n_est_pos"),
        F.col("n_hits").cast("long").alias("n_hits"),
        rfix(
            F.col("n_hits") / F.nullif(F.col("n_est_pos").cast("double"), F.lit(0.0)),
            4,
        ).alias("est_precision"),
        rfix(
            F.col("n_hits") / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0)),
            4,
        ).alias("est_recall"),
    )


dedup_containment_est_eval.__doc__ = dedup_containment_est_eval.__doc__.format(
    mod=CONT_EVAL_MOD, panel=CONT_EVAL_PANEL
)
DRAFTS["dedup_containment_est_eval"] = (
    dedup_containment_est_eval,
    _cont_eval_oracle(),
)


# ---------------------------------------------------------------------------
# Theil–Sen robust trend of daily revenue — median-of-pairwise-slopes, the
# robust-regression motif the time-series family (OLS-on-moments, Holt,
# Kalman, CUSUM, binseg) did not yet cover: one gross outlier day moves
# every moment-based slope but not the pairwise-slope median.

TS_ANCHOR = "1992-01-01"


TS_ORACLE = f"""
WITH daily AS (
    SELECT date_diff('day', DATE '{TS_ANCHOR}', CAST(o_orderdate AS DATE)) AS x,
           sum({_cents_sql('o_totalprice')}) AS r_c
    FROM orders GROUP BY 1
),
pairs AS (
    SELECT (b.r_c - a.r_c)::DOUBLE / 100 / (b.x - a.x) AS slope
    FROM daily a JOIN daily b ON b.x > a.x
),
mom AS (
    SELECT count(*)::DOUBLE AS n, sum(x)::DOUBLE AS sx,
           sum(x * x)::DOUBLE AS sxx,
           sum(x::HUGEINT * r_c::HUGEINT)::DOUBLE / 100 AS sxy,
           sum(r_c)::DOUBLE / 100 AS sy
    FROM daily
)
SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
       CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs,
       {rfix_sql('(SELECT quantile_cont(slope, 0.5) FROM pairs)', 6)}
           AS theil_sen_slope,
       {rfix_sql('(SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) FROM mom)', 6)}
           AS ols_slope
"""


def t34_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the daily-revenue trend: the exact MEDIAN of
    all pairwise slopes (r_j − r_i)/(x_j − x_i), i < j, next to the
    moment-based OLS slope for comparison — the robust trend line that
    shrugs off a holiday spike or an outage day a least-squares fit
    chases.

    Exactness: per-day revenue is an integer-cent sum, so every pairwise
    slope is the SAME double expression on both engines (exact-long
    difference, then two divisions); the median interpolates the two
    middle elements of identical sorted multisets, and rfix absorbs the
    last-ulp. OLS comes from the usual exact-input moment sums.

    Scale shape: the pair join is over the DAY spine, not the fact table —
    n_days grows with calendar time, not corpus size, so the O(n_days²)
    pair frame (~3M rows for a 7-year span) is scale-CONSTANT in data
    volume; facts contribute one map-side-combinable rollup. The median is
    ORDER-STATISTIC SELECTION over the pair frame via exact_global_rank
    (range-partitioned distributed sort, operators/ranks.py) — NOT the
    single-group exact percentile aggregate, which buffers every slope in
    one final merge task (measured 7.8 s vs 2.4 s for the ranked pick on
    the 2.9M-pair sf0.1 frame; the gap widens with the spine). Tie order
    inside equal slopes is arbitrary, but the VALUES at the two middle
    positions are a pure function of the sorted multiset, so the
    interpolated median is deterministic and oracle-identical.
    n_pairs is closed-form C(n_days, 2) — no second pass counts the frame.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit(TS_ANCHOR).cast("date")).alias("x")
    ).agg(F.sum(_cents(F.col("o_totalprice"))).alias("r_c"))
    a = daily.select(F.col("x").alias("xa"), F.col("r_c").alias("ra"))
    b = daily.select(F.col("x").alias("xb"), F.col("r_c").alias("rb"))
    # repartition the STREAMED side: the day spine arrives in 1-2 parquet
    # splits, and a BroadcastNestedLoopJoin's parallelism equals the
    # streamed side's partition count — 32 ways turns the O(days²) slope
    # evaluation from ~2 tasks into a full-box scan (measured ~4x)
    pairs = a.repartition(32).join(F.broadcast(b), F.col("xb") > F.col("xa")).select(
        ((F.col("rb") - F.col("ra")).cast("double") / 100 / (F.col("xb") - F.col("xa")))
        .alias("slope")
    )
    # sxy is day-index × daily-cents: the product clears LONG near
    # full-corpus scale (~1e17/term, ~2.6e20 summed), so it accumulates
    # in decimal(38,0)/HUGEINT — exact AND identical on both engines
    # (the g_hits_two_rounds discipline, tests/test_plan_hygiene.py)
    dec = "decimal(38,0)"
    mom = daily.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        (
            F.sum(F.col("x").cast(dec) * F.col("r_c").cast(dec)).cast("double")
            / 100
        ).alias("sxy"),
        (F.sum("r_c").cast("double") / 100).alias("sy"),
    )
    # Order-statistic median: rank the slopes with the distributed exact
    # ranker (EAGER: materializes the pair frame once — the same pass the
    # old percentile paid, minus its single-task buffer merge), then pick
    # the two middle positions computed closed-form from the spine size.
    ranked = exact_global_rank(pairs, "slope", rank_col="__r")
    spine_n = daily.agg(F.count("*").cast("long").alias("n_days")).withColumn(
        "n_pairs", (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("long")
    )
    med = (
        ranked.crossJoin(F.broadcast(spine_n.select("n_pairs")))
        .filter(
            (F.col("__r") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("__r") == F.floor((F.col("n_pairs") + 2) / 2))
        )
        .agg(F.avg("slope").alias("_med"))
    )
    return (
        spine_n
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mom))
        .select(
            "n_days",
            "n_pairs",
            rfix(F.col("_med"), 6).alias("theil_sen_slope"),
            rfix(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6,
            ).alias("ols_slope"),
        )
    )


DRAFTS["t34_theil_sen_trend"] = (t34_theil_sen_trend, TS_ORACLE)


# ---------------------------------------------------------------------------
# Two-stage retrieval: PQ-ADC shortlist -> exact-cosine rerank — the
# production ANN serving pattern (a cheap code-table scan proposes, the
# true metric on full-precision vectors disposes), composed from the
# registry's existing stage-1 (drafts_r6.pq_adc_distances) with a
# per-row agreement flag against the exact brute-force top-k.

RERANK_SHORTLIST = 15
RERANK_K = 3


def _two_stage_oracle() -> str:
    from ..functions import vectors as V
    from .drafts_r6 import pq_adc_cte_prefix

    cos = V.cosine_sql("qe.v", "ne.v")
    bcos = V.cosine_sql("q.v", "x.v")
    return f"""
    {pq_adc_cte_prefix()},
    short AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY {rfix_sql('dist', 6)}, neighbor_id) AS srn
        FROM adc
    ),
    re AS (
        SELECT s.query_id, s.neighbor_id,
               {rfix_sql(cos, 6)} AS c6, {rfix_sql(cos, 4)} AS cos_sim
        FROM short s
        JOIN e qe ON qe.vec_id = s.query_id
        JOIN e ne ON ne.vec_id = s.neighbor_id
        WHERE s.srn <= {RERANK_SHORTLIST}
    ),
    rr AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY c6 DESC, neighbor_id) AS rn
        FROM re
    ),
    exact AS (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {rfix_sql(bcos, 6)} DESC, x.vec_id) AS ern
        FROM e q JOIN e x ON x.vec_id <> q.vec_id
        WHERE q.vec_id < (SELECT coalesce(max(query_id), 0) + 1 FROM adc)
          AND q.vec_id IN (SELECT query_id FROM adc)
    )
    SELECT CAST(rr.query_id AS BIGINT) AS query_id,
           CAST(rn AS BIGINT) AS rank,
           CAST(rr.neighbor_id AS BIGINT) AS neighbor_id,
           cos_sim,
           (ex.neighbor_id IS NOT NULL) AS in_exact_topk
    FROM rr
    LEFT JOIN (SELECT query_id, neighbor_id FROM exact WHERE ern <= {RERANK_K}) ex
      ON ex.query_id = rr.query_id AND ex.neighbor_id = rr.neighbor_id
    WHERE rn <= {RERANK_K}
    """


def ann_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: the PQ-ADC code-table scan proposes a
    {shortlist}-deep shortlist per query (stage 1 — never touches a
    full-precision database vector), then the TRUE metric (exact cosine
    on full vectors) reranks the shortlist and keeps the top {k}
    (stage 2 — touches only {shortlist} vectors per query). Each kept row
    carries ``in_exact_topk``: whether the exact brute-force top-{k}
    (same metric, whole corpus) also contains this neighbor — the
    per-result agreement diagnostic that tells a serving team how often
    the shortlist's recall, not the reranker, is the accuracy ceiling.

    Scale shape: stage 1 is ann_pq_adc_topk's pipeline verbatim
    (broadcast distance tables, one (query, vector) exchange); stage 2's
    joins move only |queries|·{shortlist} rows of full vectors; the
    brute-force leg exists for the DIAGNOSTIC and is panel-bounded — a
    production deployment drops it and keeps the two cheap stages.

    Reference analog: none (no vector search in the reference at all);
    beyond-reference ANN serving surface.
    """
    from ..functions import vectors as V
    from .drafts_r6 import pq_adc_distances

    adc = pq_adc_distances(spark, sf_dir)
    if adc is None:
        return spark.createDataFrame(
            [],
            "query_id LONG, rank LONG, neighbor_id LONG, cos_sim DOUBLE, "
            "in_exact_topk BOOLEAN",
        )
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    sw = Window.partitionBy("query_id").orderBy(
        rfix(F.col("dist"), 6), F.asc("neighbor_id")
    )
    short = (
        adc.withColumn("srn", F.row_number().over(sw))
        .filter(F.col("srn") <= RERANK_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    q = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    n = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    cos = V.dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn"))
    rw = Window.partitionBy("query_id").orderBy(
        F.desc(rfix(F.col("_c"), 6)), F.asc("neighbor_id")
    )
    reranked = (
        short.join(q, "query_id")
        .join(n, "neighbor_id")
        .withColumn("_c", cos)
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= RERANK_K)
        .select("query_id", "rank", "neighbor_id", rfix(F.col("_c"), 4).alias("cos_sim"))
    )
    # exact brute-force top-k for the SAME panel queries (the diagnostic leg)
    panel = q.join(
        adc.select("query_id").distinct(), "query_id"
    )
    bcos = V.dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn"))
    ew = Window.partitionBy("query_id").orderBy(
        F.desc(rfix(F.col("_bc"), 6)), F.asc("neighbor_id")
    )
    exact = (
        panel.join(n, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_bc", bcos)
        .withColumn("ern", F.row_number().over(ew))
        .filter(F.col("ern") <= RERANK_K)
        .select("query_id", "neighbor_id", F.lit(True).alias("_hit"))
    )
    return (
        reranked.join(exact, ["query_id", "neighbor_id"], "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            "cos_sim",
            F.coalesce(F.col("_hit"), F.lit(False)).alias("in_exact_topk"),
        )
    )


ann_two_stage_rerank.__doc__ = ann_two_stage_rerank.__doc__.format(
    shortlist=RERANK_SHORTLIST, k=RERANK_K
)
DRAFTS["ann_two_stage_rerank"] = (ann_two_stage_rerank, _two_stage_oracle())
