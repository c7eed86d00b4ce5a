"""Round-15 drafts (written in round 12; registered via
queries/draft_layer.register_all, probed through the oracle-parity,
bare-session and 5x scale gates before the driver sees them).

Three registrations, each the knob-proof for one of this round's moves
(the r11 pattern: every library phase ships one registration at
NON-registry parameters so the parameterization is demonstrably real):

* ``g_pagerank_damped`` — operators/graphalgs.pagerank (phase-3 library)
  at damping 0.7 / 3 iterations vs the registered 0.85 / 5; the oracle
  unrolls three chained CTEs with the 0.3/0.7 literals, pinning the
  round(1-damping, 12) teleport-mass contract.
* ``ann_srp_adaptive_topk`` — srp_multiprobe_candidates(adaptive=True)
  (ADVICE r11 #1's real fix): per-query flips ranked by boundary
  distance |⟨v, plane⟩| (integer-canonicalized, plane-index tie-break)
  feeding a top-2 cosine search; the oracle reproduces the ranked flips
  with the identical packed-integer sort keys.
* ``emb_power_iteration_v2`` — operators/embeddings.power_iteration_step
  (phase-4 library) with an EXPLICIT alternating ±1 start vector instead
  of the registered all-ones — the v0 knob that chains PCA iterations.

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT, floats through rfix; ranking ties broken by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.presentation import rfix, rfix_sql
from ..operators import ann as ann_ops
from ..operators import embeddings as emb_ops
from ..operators import graphalgs
from ..sources.tables import table
from .graphq import _EDGE_SQL, trade_edges

DRAFTS: dict = {}


# ---------------------------------------------------------------------------
# g_pagerank_damped — the graphalgs.pagerank knobs at a second operating point
# ---------------------------------------------------------------------------

_PR2_DAMPING = 0.7
_PR2_ITERS = 3


def _pagerank_damped_oracle() -> str:
    base, damp = round(1.0 - _PR2_DAMPING, 12), _PR2_DAMPING
    cte = (
        "pr{o} AS (SELECT nn.node, {base} / (SELECT n FROM ncnt) + {damp} * "
        "coalesce(c.contrib, 0) AS rank FROM nodes nn LEFT JOIN "
        "(SELECT e.dst, sum(p.rank / od.od) AS contrib FROM edges e "
        "JOIN pr{i} p ON p.node = e.src JOIN outdeg od ON od.src = e.src "
        "GROUP BY e.dst) c ON c.dst = nn.node)"
    )
    rounds = ",\n    ".join(
        cte.format(o=i + 1, i=i, base=base, damp=damp)
        for i in range(_PR2_ITERS)
    )
    return f"""
    WITH {_EDGE_SQL},
    nodes AS (SELECT n_nationkey AS node FROM nation),
    ncnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM ncnt) AS rank FROM nodes),
    {rounds}
    SELECT CAST(node AS BIGINT) AS node,
           {rfix_sql('rank', 6)} AS rank
    FROM pr{_PR2_ITERS}
    """


def g_pagerank_damped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank at damping {_PR2_DAMPING} / {_PR2_ITERS} iterations — the
    phase-3 library (operators/graphalgs.pagerank) at NON-registry
    parameters (the registered g_pagerank_nations runs 0.85 / 5). More
    teleport mass flattens the distribution toward uniform; fewer
    iterations stop further from the fixpoint — both observable in the
    oracle-pinned values, so the knobs are provably wired through.

    Also pins the teleport-mass contract: the library computes
    round(1 - 0.7, 12), which must equal the oracle's literal 0.3
    bit-for-bit (1 - 0.7 in raw IEEE is 0.30000000000000004).
    """
    return graphalgs.pagerank(
        trade_edges(spark, sf_dir),
        table(spark, sf_dir, "nation").select("n_nationkey"),
        damping=_PR2_DAMPING, iters=_PR2_ITERS, digits=6,
    )


DRAFTS["g_pagerank_damped"] = (g_pagerank_damped, _pagerank_damped_oracle())


# ---------------------------------------------------------------------------
# ann_srp_adaptive_topk — query-adaptive multi-probe feeding a real search
# ---------------------------------------------------------------------------

_AD_PANEL = 5
_AD_PLANES = 4
_AD_PROBES = 2
_AD_K = 2


def _adaptive_topk_oracle() -> str:
    b = ann_ops.srp_bucket_sql("embedding", _AD_PLANES)
    flips = ann_ops.srp_adaptive_flips_sql("embedding", _AD_PLANES,
                                           n_probes=_AD_PROBES)
    return f"""
    WITH bq AS (
        SELECT vec_id, CAST({b} AS BIGINT) AS bucket, {flips} AS flips
        FROM embeddings WHERE vec_id < {_AD_PANEL}
    ),
    probes AS (
        SELECT vec_id AS query_id, bucket FROM bq
        UNION ALL
        SELECT vec_id, xor(bucket, (1::BIGINT << CAST(p AS INT)))
        FROM bq, unnest(flips) AS t(p)
    ),
    corpus AS (
        SELECT vec_id, CAST({b} AS BIGINT) AS bucket FROM embeddings
    ),
    cand AS (
        SELECT p.query_id, c.vec_id AS neighbor_id
        FROM corpus c JOIN probes p USING (bucket)
        WHERE c.vec_id <> p.query_id
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               {rfix_sql(V.cosine_sql('q.embedding', 'n.embedding'), 6)} AS c6,
               {rfix_sql(V.cosine_sql('q.embedding', 'n.embedding'), 4)} AS cos_sim
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           cos_sim, rn
    FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY c6 DESC, neighbor_id) AS BIGINT) AS rn
          FROM scored)
    WHERE rn <= {_AD_K}
    """


def ann_srp_adaptive_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-ADAPTIVE multi-probe SRP search (Lv et al., VLDB '07, the
    real thing — ADVICE r11 #1): each panel query probes its own bucket
    plus the {_AD_PROBES} buckets across its NEAREST hyperplane
    boundaries (smallest |⟨v, plane⟩|, canonicalized to integer
    micro-units with a plane-index tie-break so both engines rank
    identically), then takes top-{_AD_K} by cosine among the candidates.
    Contrast ann_srp_multiprobe_topk, which flips the fixed low-index
    planes for every query.

    Scale shape identical to the fixed-flip query: the per-query flip
    ranking is a stateless array expression on the panel side (broadcast),
    corpus work stays one scan + a bucket equi-join.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _AD_PANEL)
    cand = ann_ops.srp_multiprobe_candidates(
        e, q, n_planes=_AD_PLANES, n_probes=_AD_PROBES, adaptive=True,
    )
    qv = q.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("_qv"))
    nv = e.select(F.col("vec_id").alias("neighbor_id"),
                  F.col("embedding").alias("_nv"))
    cos = V.cosine(F.col("_qv"), F.col("_nv"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            rfix(cos, 6).alias("_c6"),
            rfix(cos, 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _AD_K)
        .drop("_c6")
    )


DRAFTS["ann_srp_adaptive_topk"] = (ann_srp_adaptive_topk,
                                   _adaptive_topk_oracle())


# ---------------------------------------------------------------------------
# emb_power_iteration_v2 — the v0 knob on the phase-4 library
# ---------------------------------------------------------------------------

_PI_DIMS = 64
_PI_V0 = tuple(1.0 if i % 2 == 0 else -1.0 for i in range(_PI_DIMS))


def _power_v2_oracle() -> str:
    v0 = "[" + ", ".join(str(x) for x in _PI_V0) + "]"
    return f"""
    WITH r AS (
        SELECT embedding::DOUBLE[] AS e,
               {V.dot_sql('embedding', v0)} AS rs
        FROM embeddings
    ),
    u AS (
        SELECT rs, unnest(e) AS val, generate_subscripts(e, 1) AS i FROM r
    ),
    w AS (SELECT i, sum(rs * val) AS w FROM u GROUP BY i),
    n AS (SELECT sqrt(sum(w * w)) AS nrm FROM w)
    SELECT CAST(i - 1 AS BIGINT) AS dim_idx,
           {rfix_sql('w / nrm', 6)} AS v_next
    FROM w CROSS JOIN n
    """


def emb_power_iteration_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-iteration step from an EXPLICIT alternating ±1 start vector
    — operators/embeddings.power_iteration_step's v0 knob (phase-4
    library) at a NON-registry operating point (the registered
    emb_power_iteration_step starts all-ones, v0=None). The alternating
    start has a different projection onto the dominant eigenvector, so
    the oracle-pinned iterate provably flows the v0 through Aᵀ(A·v₀);
    chaining such calls (with driver-side Gram-Schmidt on the d-sized
    iterate between rounds) is the distributed PCA loop.
    """
    return emb_ops.power_iteration_step(
        table(spark, sf_dir, "embeddings"), "embedding",
        v0=_PI_V0, digits=6,
    )


DRAFTS["emb_power_iteration_v2"] = (emb_power_iteration_v2,
                                    _power_v2_oracle())


# ---------------------------------------------------------------------------
# text_bm25_tuned — the retrieval library's k1/b/terms/topk knobs
# ---------------------------------------------------------------------------

_BM2_K1, _BM2_B = 0.9, 0.4   # the "short-query" Lucene tuning, not 1.2/0.75
_BM2_TERMS = ("stream", "state", "window")
_BM2_TOPK = 8

_TOKS = "string_split_regex(text, '\\s+')"


def _bm25_tuned_oracle() -> str:
    terms_sql = ", ".join(f"'{t}'" for t in _BM2_TERMS)
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, len({_TOKS}) AS dlen FROM documents),
    g AS (SELECT count(*)::DOUBLE AS n_docs, avg(dlen) AS avg_len FROM dl),
    tf AS (
        SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
        FROM tok WHERE tok IN ({terms_sql})
        GROUP BY doc_id, tok
    ),
    df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               sum(
                   ln((g.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                   * tf.tf * ({_BM2_K1} + 1)
                   / (tf.tf + {_BM2_K1}
                      * (1 - {_BM2_B} + {_BM2_B} * dl.dlen / g.avg_len))
               ) AS score
        FROM tf
        JOIN df ON df.term = tf.term
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN g
        GROUP BY tf.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           {rfix_sql('score', 4)} AS bm25_score
    FROM scored
    ORDER BY bm25_score DESC, doc_id
    LIMIT {_BM2_TOPK}
    """


def text_bm25_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 at the short-query Lucene tuning k1={_BM2_K1} / b={_BM2_B}
    with a different term set and depth — operators/retrieval.bm25_topk
    (phase-5 library) at NON-registry parameters (the registered
    text_bm25_topk runs 1.2 / 0.75). Lower k1 saturates term frequency
    faster; lower b softens length normalization — both observable in
    the oracle-pinned scores, so the knobs are provably wired through.
    """
    from ..operators import retrieval

    return retrieval.bm25_topk(
        table(spark, sf_dir, "documents"), terms=_BM2_TERMS,
        k1=_BM2_K1, b=_BM2_B, topk=_BM2_TOPK, digits=4,
    )


DRAFTS["text_bm25_tuned"] = (text_bm25_tuned, _bm25_tuned_oracle())


# ---------------------------------------------------------------------------
# diag_psi_quartile_drift — the stats library's n_edges / ref knobs
# ---------------------------------------------------------------------------

_PSIQ_EDGES = 3  # quartiles, not the registered deciles


def _psi_quartile_oracle() -> str:
    step = 1.0 / (_PSIQ_EDGES + 1)
    edges = ", ".join(
        f"(floor(quantile_cont(o_totalprice, {step * (k + 1):.10f}) * 1000000 "
        f"+ 0.5) / 1000000) AS e{k}"
        for k in range(_PSIQ_EDGES)
    )
    bin_case = "CASE " + " ".join(
        f"WHEN o_totalprice < e{k} THEN {k}" for k in range(_PSIQ_EDGES)
    ) + f" ELSE {_PSIQ_EDGES} END"
    return f"""
    WITH ref AS (SELECT o_totalprice FROM orders WHERE o_orderstatus = 'F'),
    edges AS (SELECT {edges} FROM ref),
    binned AS (
        SELECT {bin_case} AS bin,
               (o_orderstatus = 'F') AS is_ref
        FROM orders, edges
    ),
    counts AS (
        SELECT bin,
               sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
               sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS nc
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT sum(nr)::DOUBLE AS tr, sum(nc)::DOUBLE AS tc FROM counts
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(nr AS BIGINT) AS n_ref,
           CAST(nc AS BIGINT) AS n_cmp,
           CASE WHEN nr > 0 AND nc > 0 THEN
               CAST(floor((nr / tr - nc / tc) * ln((nr / tr) / (nc / tc))
                    * 1000000 + 0.5) / 1000000 AS DOUBLE)
           END AS psi_contrib
    FROM counts, tot
    """


def diag_psi_quartile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI at QUARTILE granularity against a different reference
    population (finished-status orders) — operators/stats.psi_profile
    (phase-6 library) at NON-registry parameters (the registered
    diag_psi_priority_drift runs 9 decile edges against urgent-priority
    orders). Coarser bins trade sensitivity for per-bin mass; a
    different reference predicate re-derives every cut line — both
    observable in the oracle-pinned histogram, so the n_edges and ref
    knobs are provably wired through.
    """
    from ..operators import stats
    from ..sources.tables import spread

    return stats.psi_profile(
        spread(table(spark, sf_dir, "orders")), "o_totalprice",
        ref=F.col("o_orderstatus") == "F",
        n_edges=_PSIQ_EDGES, digits_edges=6, digits=6,
    )


DRAFTS["diag_psi_quartile_drift"] = (diag_psi_quartile_drift,
                                     _psi_quartile_oracle())
