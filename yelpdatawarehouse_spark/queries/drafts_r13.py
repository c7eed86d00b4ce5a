"""Round-13 drafts (written in round 10; registered via
queries/draft_layer.register_all, probed 5x pre-registration and through
the bare-session local[8] gate before the driver sees them).

Eight capability gaps, clustered around this round's library-ification of
the dedup/ANN machinery (operators/dedup.py, operators/ann.py) — half the
tranche exercises the NEW library functions at non-registry parameters,
proving the parameterization is real, not decorative:

* ``dedup_simhash_banded_pairs`` — the UNBOUNDED SimHash scale path the
  bounded sweep's docstring has promised since r4: band-bucket blocking
  over fingerprint chunks with the pigeonhole recall-1.0 guarantee
  (max_hamming < bands), via the new ``dedup.simhash_band_pairs``.
* ``dedup_minhash_lsh_highrecall`` — MinHash banding at the OTHER
  operating point (16 perms, 8 bands x 2 rows: collides at far lower
  Jaccard than the registered 4x4) via ``dedup.minhash_lsh(bands=8)``.
* ``ann_srp_multiprobe_recall`` — multi-probe LSH (Lv et al., VLDB'07):
  probe the query's own SRP bucket plus its four 1-bit-flip neighbors,
  and measure recall@10 against exact ground truth — the standard trick
  that buys recall without more hash tables.
* ``emb_anisotropy_stats`` — embedding-space hygiene: the corpus mean
  vector's norm vs average vector norm (anisotropy / common-direction
  bias, cf. Ethayarajh '19) plus the most biased dimension.
* ``text_code_detect_heuristic`` — code-vs-prose detection buckets from
  marker-token density (the curation gate every pretraining pipeline
  runs to route code out of prose corpora).
* ``text_ccnet_ppl_buckets`` — CCNet-style head/middle/tail bucketing
  (Wenzek et al. '19): per-source tercile split on unigram-LM mean
  negative log-likelihood, integer-division bucket boundaries.
* ``pipeline_filter_funnel`` — curation-funnel observability: how many
  docs survive each successive gate (length -> langid -> token count ->
  blocking-key canonical) in ONE scan.
* ``sample_softdedup_weights`` — soft dedup (down-weight 1/dup_cnt on
  the blocking fingerprint instead of dropping): effective dataset size
  per source.

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT, floats through rfix; threshold comparisons on
integer-exact or 6-digit-canonicalized values only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as T
from ..functions.presentation import rfix, rfix_sql
from ..functions import vectors as V
from ..operators import ann as ann_ops
from ..operators import dedup as dedup_ops
from ..sources.tables import spread, table

DRAFTS: dict = {}

_TOKS = "string_split_regex(text, '\\s+')"


# ---------------------------------------------------------------------------
# dedup_simhash_banded_pairs — the unbounded SimHash scale path
# ---------------------------------------------------------------------------

_SH_BITS = 32
_SH_BANDS = 2   # 16-bit chunks -> 65536 buckets per band: expected RANDOM
#                 collisions are n²/2^16 per band, and chunk width is the
#                 knob that must grow with log2(n) (Manku et al., WWW'07 use
#                 64-bit fingerprints in 16-bit blocks at web scale). The
#                 first cut of this query used 4x8-bit bands — only 256
#                 buckets/band, organically quadratic: measured x12.2 at a
#                 5x probe before registration. 2x16 measured 70x fewer
#                 candidate rows at sf0.1 (Σ bucket² 180k vs n²/2 = 12.5M).
_SH_MAXHAM = 1  # < bands -> pigeonhole: banding has recall exactly 1.0


def _simhash_fp_sql(bound_sql: str = "") -> str:
    """(doc_id, fp) CTE body: 32-bit sign-of-sums fingerprint over token
    hashes — the SQL twin of operators/dedup.simhash_fingerprints."""
    h = hashing.md5_long_sql("tok")
    bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(_SH_BITS)
    )
    return f"""
    tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents {bound_sql}),
    hashed AS (SELECT doc_id, {h} AS h FROM tok),
    fps AS (SELECT doc_id, {bits} AS fp FROM hashed GROUP BY doc_id)
    """


# Because max_hamming < bands makes banding recall-exact, the oracle can be
# the straight all-pairs Hamming sweep — the banded engine result must EQUAL
# it, which is precisely the property under test.
SIMHASH_BANDED_ORACLE = f"""
WITH {_simhash_fp_sql()}
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {_SH_MAXHAM}
"""


def dedup_simhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the WHOLE corpus — no doc_id bound —
    via band-bucket blocking (operators/dedup.simhash_band_pairs).

    dedup_simhash_pairs (r4) bounds its O(n²) sweep to doc_id < 1000 and
    its docstring names banding as the unbounded path; this registers that
    path. 32-bit fp → 2 bands x 16 bits → bucket self-join → exact Hamming
    verify ≤ 1. Pigeonhole (1 flip < 2 bands ⇒ one band intact) makes the
    blocked result bit-equal to the all-pairs sweep, so the oracle runs the
    sweep and the engine must reproduce it from buckets alone. At 100 TB
    the pair work is Σ bucket² over colliding 16-bit chunks (see the
    _SH_BANDS note: chunk width is the log2(n) knob), never n². Under
    k-fold VERBATIM replication the pair OUTPUT is itself ~k² — every
    clone pair is a real ham-0 duplicate; that is the answer, not
    overhead (same classification as the verified-pairs 50x row).
    """
    d = spread(table(spark, sf_dir, "documents"))
    fps = dedup_ops.simhash_fingerprints(d, "text", "doc_id", bits=_SH_BITS)
    return dedup_ops.simhash_band_pairs(
        fps, "doc_id", bits=_SH_BITS, bands=_SH_BANDS, max_hamming=_SH_MAXHAM,
        pair_cols=("doc_a", "doc_b"),
    )


DRAFTS["dedup_simhash_banded_pairs"] = (dedup_simhash_banded_pairs,
                                        SIMHASH_BANDED_ORACLE)


# ---------------------------------------------------------------------------
# dedup_minhash_lsh_highrecall — banding at the high-recall operating point
# ---------------------------------------------------------------------------

_HR_PERM = 16
_HR_BANDS = 8  # r = 2 rows/band: P(collide) = 1-(1-j^2)^8 — catches j~0.3


def _minhash_highrecall_oracle() -> str:
    shingle_expr = T.shingles_sql("t", 3)
    h = f"({hashing.md5_long_sql('s')} % {hashing.MERSENNE})"
    mins = ",\n           ".join(
        f"min({hashing.perm_sql(h, i)}) AS m{i}" for i in range(_HR_PERM)
    )
    rows = _HR_PERM // _HR_BANDS
    band_selects = []
    for b in range(_HR_BANDS):
        cols = [f"m{b * rows + r}" for r in range(rows)]
        concat = " || ',' || ".join(cols)
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM mh"
        )
    bands = "\n    UNION ALL ".join(band_selects)
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct({shingle_expr})) AS s
           FROM toks WHERE len(t) >= 3),
    mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({bands})
    SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
                    CAST(b.doc_id AS BIGINT) AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    """


def dedup_minhash_lsh_highrecall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates at the high-recall operating point — the SAME
    16-permutation signatures as dedup_minhash_lsh_candidates, banded
    8 x 2 instead of 4 x 4 (library call: dedup.minhash_lsh(bands=8)).

    S-curve: P(collide | j) = 1-(1-j^r)^b; r=2 collides ~50% at j≈0.29 vs
    r=4's j≈0.66 — this is the configuration a recall-first pipeline runs
    before an exact verify stage, and (with the s-curve eval) the second
    measured point on the banding tradeoff. Same scale shape as the 4x4
    query: one signature shuffle, bucket-join candidates, never n².
    """
    d = spread(table(spark, sf_dir, "documents"))
    return dedup_ops.minhash_lsh(
        d, "text", "doc_id", n_perm=_HR_PERM, bands=_HR_BANDS,
        pair_cols=("doc_a", "doc_b"),
    )


DRAFTS["dedup_minhash_lsh_highrecall"] = (dedup_minhash_lsh_highrecall,
                                          _minhash_highrecall_oracle())


# ---------------------------------------------------------------------------
# ann_srp_multiprobe_recall — multi-probe LSH recall eval
# ---------------------------------------------------------------------------

_MP_PANEL = 8
_MP_K = 10
_MP_FLIPS = (0, 1, 2, 4, 8)  # own bucket + the four 1-bit-flip neighbors


def _multiprobe_oracle() -> str:
    probes = ", ".join(f"xor(bucket, {m})" if m else "bucket" for m in _MP_FLIPS)
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {_MP_PANEL}),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY {rfix_sql(V.cosine_sql('q.qe', 'e.embedding'), 6)} DESC,
                                e.vec_id) AS rn
            FROM q JOIN embeddings e ON e.vec_id <> q.query_id
        ) WHERE rn <= {_MP_K}
    ),
    b AS (
        SELECT vec_id, CAST({ann_ops.srp_bucket_sql('embedding', 4)} AS BIGINT) AS bucket
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS query_id, unnest([{probes}]) AS bucket
        FROM b WHERE vec_id < {_MP_PANEL}
    ),
    cand AS (
        SELECT p.query_id, nb.vec_id AS neighbor_id
        FROM probes p JOIN b nb ON nb.bucket = p.bucket
        WHERE nb.vec_id <> p.query_id
    )
    SELECT CAST(t.query_id AS BIGINT) AS query_id,
           CAST((SELECT count(*) FROM cand c2 WHERE c2.query_id = t.query_id)
               AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS hits,
           {rfix_sql(f'sum(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / {_MP_K}.0', 4)}
               AS recall_at_10
    FROM truth t
    LEFT JOIN cand c
      ON c.query_id = t.query_id AND c.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
    """


def ann_srp_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB'07) recall@10: each panel query
    scores candidates from its own SRP bucket PLUS the four buckets one
    hyperplane-sign flip away — the planes a near-boundary vector most
    plausibly landed across.

    Probing 5 of 16 buckets lifts recall far above the single-bucket index
    (ann_recall_eval) at ~5x candidate cost — without building more hash
    tables, which is the whole point of multi-probe. Scale shape: the
    probe list is a panel-sized explode broadcast against the bucket
    index; truth is exact only over the bounded panel (the standard eval
    protocol). Candidates are naturally duplicate-free: a vector lives in
    exactly one bucket and a query's five probes are distinct.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MP_PANEL).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cos = V.cosine(F.col("qe"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.desc("c6"), F.asc("neighbor_id"))
    truth = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                rfix(cos, 6).alias("c6"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MP_K)
        .select("query_id", "neighbor_id")
    )
    cand = ann_ops.srp_multiprobe_candidates(
        e, e.filter(F.col("vec_id") < _MP_PANEL),
        n_planes=4, n_probes=len(_MP_FLIPS) - 1,
    )
    sizes = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    hits = (
        truth.join(cand.withColumn("hit", F.lit(1)),
                   ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
    )
    # LEFT join + coalesce: a panel query whose five probes all land in
    # empty buckets must still appear with n_candidates=0 / recall 0.0,
    # matching the oracle's LEFT JOIN semantics (ADVICE r10).
    return (
        hits.join(sizes, "query_id", "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
            F.col("hits").cast("long").alias("hits"),
            rfix(F.col("hits") / float(_MP_K), 4).alias("recall_at_10"),
        )
    )


DRAFTS["ann_srp_multiprobe_recall"] = (ann_srp_multiprobe_recall,
                                       _multiprobe_oracle())


# ---------------------------------------------------------------------------
# emb_anisotropy_stats — embedding-space hygiene profile
# ---------------------------------------------------------------------------

_DIMS = 64

ANISO_ORACLE_EXPR_MU = ",\n       ".join(
    rfix_sql(f"avg(embedding[{i + 1}]::DOUBLE)", 6) + f" AS mu{i}"
    for i in range(_DIMS)
)
_ANISO_SUMSQ = " + ".join(f"mu{i} * mu{i}" for i in range(_DIMS))
_ANISO_MAXABS = "greatest(" + ", ".join(f"abs(mu{i})" for i in range(_DIMS)) + ")"

ANISO_ORACLE = f"""
WITH agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       {rfix_sql("avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])))", 6)} AS avg_norm,
       {ANISO_ORACLE_EXPR_MU}
    FROM embeddings
)
SELECT n_vecs, avg_norm,
       {rfix_sql(f'sqrt({_ANISO_SUMSQ})', 4)} AS mean_vec_norm,
       {rfix_sql(f'sqrt({_ANISO_SUMSQ}) / avg_norm', 4)} AS anisotropy_ratio,
       {rfix_sql(_ANISO_MAXABS, 4)} AS max_abs_dim_mean
FROM agg
"""


def emb_anisotropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy profile: ‖mean vector‖ / mean ‖vector‖
    (the common-direction bias of Ethayarajh '19 — isotropic corpora score
    ~0, collapsed/rogue-dimension corpora score toward 1) plus the single
    most biased dimension.

    One exchange: everything is a d-vector of column aggregates over one
    scan (count, avg norm, 64 component means) — the same
    d-not-d² discipline as emb_power_iteration_step. The derived ratios
    are computed FROM the 6-digit-canonicalized component means on both
    engines, so parallel summation order can't leak into the output.
    """
    # Thin caller of operators/embeddings.anisotropy_stats (r12 library
    # extraction, phase 4).
    from ..operators import embeddings as emb_ops

    return emb_ops.anisotropy_stats(
        table(spark, sf_dir, "embeddings"), "embedding", dims=_DIMS,
    )


DRAFTS["emb_anisotropy_stats"] = (emb_anisotropy_stats, ANISO_ORACLE)


# ---------------------------------------------------------------------------
# text_code_detect_heuristic — code-vs-prose routing buckets
# ---------------------------------------------------------------------------

_CODE_MARKERS = ("table", "hash", "join", "scan", "agg", "index", "column", "query")
_CODE_HI = 0.28
_CODE_LO = 0.18

CODE_DETECT_ORACLE = f"""
WITH scored AS (
    SELECT source,
           {T.marker_count_sql(_TOKS, _CODE_MARKERS)}::DOUBLE
               / len({_TOKS}) AS score
    FROM documents
)
SELECT source,
       CASE WHEN score >= {_CODE_HI} THEN 'code'
            WHEN score >= {_CODE_LO} THEN 'mixed'
            ELSE 'prose' END AS bucket,
       CAST(count(*) AS BIGINT) AS doc_cnt,
       {rfix_sql('avg(score)', 4)} AS avg_score
FROM scored
GROUP BY 1, 2
"""


def text_code_detect_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing heuristic: marker-token density buckets per
    source — the curation gate that keeps code out of prose corpora (and
    vice versa) before language-specific filters run.

    The score is an integer/integer ratio (marker tokens / total tokens),
    so thresholding is exact on both engines — no float-canonicalization
    needed at the bucket boundary. Shuffle-free row expressions + one
    grouped aggregate, same shape as text_quality_scores.
    """
    d = table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    score = (T.marker_count(toks, _CODE_MARKERS).cast("double") / F.size(toks))
    bucket = (
        F.when(F.col("score") >= _CODE_HI, "code")
        .when(F.col("score") >= _CODE_LO, "mixed")
        .otherwise("prose")
    )
    return (
        d.select("source", score.alias("score"))
        .select("source", bucket.alias("bucket"), "score")
        .groupBy("source", "bucket")
        .agg(F.count("*").cast("long").alias("doc_cnt"),
             rfix(F.avg("score"), 4).alias("avg_score"))
    )


DRAFTS["text_code_detect_heuristic"] = (text_code_detect_heuristic,
                                        CODE_DETECT_ORACLE)


# ---------------------------------------------------------------------------
# text_ccnet_ppl_buckets — CCNet head/middle/tail split
# ---------------------------------------------------------------------------

CCNET_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
cnts AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT sum(c)::DOUBLE AS total FROM cnts),
dnll AS (
    SELECT tok.doc_id,
           {rfix_sql('avg(ln(tot.total) - ln(cnts.c))', 6)} AS nll6
    FROM tok JOIN cnts ON cnts.t = tok.t CROSS JOIN tot
    GROUP BY tok.doc_id
),
ranked AS (
    SELECT d.source, dnll.nll6,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY dnll.nll6, dnll.doc_id) AS rn,
           count(*) OVER (PARTITION BY d.source) AS cnt
    FROM dnll JOIN documents d ON d.doc_id = dnll.doc_id
)
SELECT source,
       CASE (3 * (rn - 1)) // cnt WHEN 0 THEN 'head'
                                  WHEN 1 THEN 'middle'
                                  ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS doc_cnt,
       {rfix_sql('avg(nll6)', 4)} AS avg_nll
FROM ranked
GROUP BY 1, 2
"""


def text_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus split (Wenzek et al. '19): per-source tercile
    bucketing on unigram-LM mean negative log-likelihood — 'head' is the
    most-fluent third a quality-first pipeline keeps, 'tail' the third it
    drops or routes to heavier filtering.

    The LM is the corpus's own unigram distribution (one token-count
    exchange, vocabulary-sized — Zipf-bounded at any corpus size — then
    broadcast back against the token stream). Bucket boundaries use pure
    INTEGER division over the per-source rank, so the tercile split is
    bit-deterministic; ordering ties break on doc_id.
    """
    d = spread(table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(T.tokens("text")).alias("t"))
    cnts = tok.groupBy("t").agg(F.count("*").alias("c"))
    total = cnts.agg(F.sum("c").cast("double").alias("total"))
    nll = F.log(F.col("total")) - F.log(F.col("c"))
    dnll = (
        tok.join(F.broadcast(cnts), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(rfix(F.avg(nll), 6).alias("nll6"))
    )
    wrank = Window.partitionBy("source").orderBy("nll6", "doc_id")
    wcnt = Window.partitionBy("source")
    ranked = (
        dnll.join(d.select("doc_id", "source"), "doc_id")
        .withColumn("rn", F.row_number().over(wrank))
        .withColumn("cnt", F.count("*").over(wcnt))
    )
    bucket_id = F.expr("(3 * (rn - 1)) div cnt")
    bucket = (
        F.when(bucket_id == 0, "head")
        .when(bucket_id == 1, "middle")
        .otherwise("tail")
    )
    return (
        ranked.select("source", bucket.alias("bucket"), "nll6")
        .groupBy("source", "bucket")
        .agg(F.count("*").cast("long").alias("doc_cnt"),
             rfix(F.avg("nll6"), 4).alias("avg_nll"))
    )


DRAFTS["text_ccnet_ppl_buckets"] = (text_ccnet_ppl_buckets, CCNET_ORACLE)


# ---------------------------------------------------------------------------
# pipeline_filter_funnel — per-gate survival counts in one scan
# ---------------------------------------------------------------------------

_FUNNEL_MIN_CHARS = 150
_FUNNEL_MIN_TOKS = 30
_PREFIX_FP = f"md5(array_to_string(({_TOKS})[1:5], ' '))"

FUNNEL_ORACLE = f"""
WITH flags AS (
    SELECT n_chars >= {_FUNNEL_MIN_CHARS} AS g_len,
           lang = 'en' AS g_lang,
           len({_TOKS}) >= {_FUNNEL_MIN_TOKS} AS g_tok,
           doc_id = min(doc_id) OVER (PARTITION BY {_PREFIX_FP}) AS g_canon
    FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE g_len) AS BIGINT) AS pass_len,
       CAST(count(*) FILTER (WHERE g_len AND g_lang) AS BIGINT) AS pass_lang,
       CAST(count(*) FILTER (WHERE g_len AND g_lang AND g_tok) AS BIGINT)
           AS pass_tokens,
       CAST(count(*) FILTER (WHERE g_len AND g_lang AND g_tok AND g_canon)
           AS BIGINT) AS pass_dedup
FROM flags
"""


def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel observability: survivors of each successive gate —
    length ≥ 150 chars → lang = en → ≥ 30 tokens → canonical within the
    5-token-prefix blocking group — as ONE row from ONE scan.

    This is the report every pipeline run ships next to its output (what
    did each filter cost?); pipeline_corpus_curation applies gates,
    this measures their attrition. The only exchange is the blocking-key
    window (same key as dedup_prefix_near_groups); everything else is
    conditional aggregation of cumulative gate flags.
    """
    d = table(spark, sf_dir, "documents")
    wfp = Window.partitionBy(F.md5(F.concat_ws(" ", F.slice(T.tokens("text"), 1, 5))))
    flags = d.select(
        (F.col("n_chars") >= _FUNNEL_MIN_CHARS).alias("g_len"),
        (F.col("lang") == "en").alias("g_lang"),
        (F.size(T.tokens("text")) >= _FUNNEL_MIN_TOKS).alias("g_tok"),
        (F.col("doc_id") == F.min("doc_id").over(wfp)).alias("g_canon"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return flags.agg(
        F.count("*").cast("long").alias("n_total"),
        cnt(F.col("g_len")).alias("pass_len"),
        cnt(F.col("g_len") & F.col("g_lang")).alias("pass_lang"),
        cnt(F.col("g_len") & F.col("g_lang") & F.col("g_tok")).alias("pass_tokens"),
        cnt(F.col("g_len") & F.col("g_lang") & F.col("g_tok") & F.col("g_canon"))
        .alias("pass_dedup"),
    )


DRAFTS["pipeline_filter_funnel"] = (pipeline_filter_funnel, FUNNEL_ORACLE)


# ---------------------------------------------------------------------------
# sample_softdedup_weights — down-weight duplicates instead of dropping
# ---------------------------------------------------------------------------

SOFTDEDUP_ORACLE = f"""
WITH grp AS (
    SELECT source,
           count(*) OVER (PARTITION BY {_PREFIX_FP}) AS dup_cnt
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE dup_cnt > 1) AS BIGINT) AS dup_docs,
       {rfix_sql('sum(1.0 / dup_cnt)', 4)} AS eff_docs
FROM grp
GROUP BY source
"""


def sample_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of dropping near-duplicates, DOWN-WEIGHT every
    member of a duplicate group by 1/group_size (the SoftDeDup idea applied
    at the blocking-key level), and report each source's effective dataset
    size Σ 1/dup_cnt next to its raw count.

    eff_docs < n_docs exactly where a source carries redundant mass —
    the sampling-weight input for a mixture tuner. One window on the
    blocking fingerprint + one grouped aggregate; the weight join never
    materializes pairs.
    """
    from ..operators import sampling

    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(T.tokens("text"), 1, 5)))
    grp = sampling.softdedup_weights(d.select("source", "text"), fp)
    return grp.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("dup_cnt") > 1, 1).otherwise(0)).cast("long")
        .alias("dup_docs"),
        rfix(F.sum("weight"), 4).alias("eff_docs"),
    )


DRAFTS["sample_softdedup_weights"] = (sample_softdedup_weights, SOFTDEDUP_ORACLE)


# ---------------------------------------------------------------------------
# dedup_minhash_highrecall_pr_eval — the 8x2 banding's measured P/R point
# ---------------------------------------------------------------------------

_HRPR_PANEL, _HRPR_TAU = 20, 0.2

_PR_JACCARD_SQL = (
    "len(list_intersect(a.s, b.s))::DOUBLE / "
    "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"
)


def _highrecall_pr_oracle() -> str:
    return f"""
    WITH cand0 AS ({_minhash_highrecall_oracle()}),
    cand AS (SELECT doc_a, doc_b FROM cand0 WHERE doc_a < {_HRPR_PANEL}),
    sh AS (SELECT doc_id, list_distinct({T.shingles_sql(_TOKS, 3)}) AS s
           FROM documents),
    truth AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON b.doc_id > a.doc_id
        WHERE a.doc_id < {_HRPR_PANEL}
          AND len(list_intersect(a.s, b.s)) > 0
          AND {rfix_sql(_PR_JACCARD_SQL, 6)} >= {_HRPR_TAU}
    ),
    hit AS (
        SELECT t.doc_a, t.doc_b FROM truth t
        JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    ),
    m AS (
        SELECT (SELECT count(*) FROM truth) AS n_true,
               (SELECT count(*) FROM cand) AS n_cand,
               (SELECT count(*) FROM hit) AS n_hit
    )
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_hit AS BIGINT) AS n_hit,
           {rfix_sql('n_hit::DOUBLE / nullif(n_cand, 0)', 4)} AS precision,
           {rfix_sql('n_hit::DOUBLE / nullif(n_true, 0)', 4)} AS recall
    FROM m
    """


def dedup_minhash_highrecall_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the 8x2 high-recall banding against the SAME
    exact-Jaccard ground truth and panel as dedup_minhash_pr_eval's 4x4
    point — together the two rows are the MEASURED banding tradeoff the
    S-curve eval predicts in closed form (r=2 collides at far lower
    similarity: recall up, precision down).

    Same scale shape as the r6 eval: truth via shingle join over the
    bounded panel (never all-pairs), candidates are the production
    high-recall query panel-filtered, metric assembly is three
    broadcast-sized counts.
    """
    d = table(spark, sf_dir, "documents")
    # r14 (guide §1.2): pin the shingle sets — they feed the explode, the
    # panel slice and both size joins (4 corpus-wide tokenize+shingle
    # evaluations unpinned); same move as dedup_minhash_pr_eval.
    from ..operators.iterative import pin

    sh = pin(
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.array_distinct(T.shingles(T.tokens("text"), 3)).alias("s"),
        ),
        label="hrpr_shingles",
    )
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    ex = sh.select("doc_id", F.explode("s").alias("sg"))
    pan = ex.filter(F.col("doc_id") < _HRPR_PANEL).select(
        F.col("doc_id").alias("doc_a"), "sg"
    )
    shared = (
        pan.join(ex.select(F.col("doc_id").alias("doc_b"), "sg"), "sg")
        .filter(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                 F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("inter").cast("double")
             / (F.col("na") + F.col("nb") - F.col("inter"))).alias("j"),
        )
    )
    truth = jac.filter(rfix(F.col("j"), 6) >= _HRPR_TAU).select("doc_a", "doc_b")
    cand = dedup_minhash_lsh_highrecall(spark, sf_dir).filter(
        F.col("doc_a") < _HRPR_PANEL
    )
    # r13 metric assembly: one flagged full-outer join + one aggregate
    # instead of three aggregates + a hit join (which evaluated each of
    # the truth/candidate subtrees twice) — same rationale and identical
    # counts as dedup_minhash_pr_eval (both frames pair-unique).
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
        rfix(F.col("n_hit").cast("double")
             / F.nullif(F.col("n_cand"), F.lit(0)), 4).alias("precision"),
        rfix(F.col("n_hit").cast("double")
             / F.nullif(F.col("n_true"), F.lit(0)), 4).alias("recall"),
    )


DRAFTS["dedup_minhash_highrecall_pr_eval"] = (dedup_minhash_highrecall_pr_eval,
                                              _highrecall_pr_oracle())


# ---------------------------------------------------------------------------
# diag_correlation_matrix — one-scan exact-moment Pearson over lineitem
# ---------------------------------------------------------------------------

# column -> cents expression name (x100 makes every 2dp value an exact int)
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
]


def _corr_oracle() -> str:
    cents = {c: f"CAST(floor({c} * 100 + 0.5) AS BIGINT)" for c in _CORR_COLS}
    sums = [f"count(*)::HUGEINT AS n"]
    for c in _CORR_COLS:
        sums.append(f"sum({cents[c]}::HUGEINT) AS s_{c}")
        sums.append(f"sum({cents[c]}::HUGEINT * {cents[c]}) AS ss_{c}")
    for a, b in _CORR_PAIRS:
        sums.append(f"sum({cents[a]}::HUGEINT * {cents[b]}) AS sp_{a}_{b}")
    selects = []
    for a, b in _CORR_PAIRS:
        num = f"(n * sp_{a}_{b} - s_{a} * s_{b})::DOUBLE"
        dx = f"(n * ss_{a} - s_{a} * s_{a})::DOUBLE"
        dy = f"(n * ss_{b} - s_{b} * s_{b})::DOUBLE"
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"{rfix_sql(f'{num} / sqrt({dx} * {dy})', 4)} AS corr FROM m"
        )
    body = "\n    UNION ALL ".join(selects)
    return f"""
    WITH m AS (SELECT {', '.join(sums)} FROM lineitem)
    {body}
    """


def diag_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan exact-moment Pearson correlation matrix over the lineitem
    measures — the numeric-profiling companion of diag_table_profiler
    (which covers cardinality/nulls; this covers linear structure).

    Float discipline: every 2dp measure becomes exact integer cents
    (floor(x*100+0.5), same on both engines); all sums and cross-products
    accumulate as decimal(38,0)/HUGEINT — summation order cannot change an
    integer total, so the corr ratios are bit-deterministic at any
    parallelism, unlike F.corr's float accumulators. One aggregate
    (15 exact moments), zero joins; pair assembly is a 6-row explode of
    the single moment row.

    Headroom bound (ADVICE r10): the largest intermediate is n * sp_a_b.
    With extendedprice cents ~1e7, a cross-product term is ~1e14, so at
    n = 10^12 rows n*sp ≈ 1e12 * (1e12 * 1e14-mean) — concretely
    n*sp_a_b reaches ~3.6e37 at trillion-row scale, only ~3x below the
    decimal(38,0) cap, and Spark's non-ANSI decimal overflow yields NULL
    silently (DuckDB's HUGEINT is 128-bit and has far more headroom).
    Past ~3e12 lineitem rows, shift this query to per-partition moment
    blocks (two-level aggregation) or center the cents first; the
    magnitude audit would catch the NULL, not prevent it.
    """
    li = table(spark, sf_dir, "lineitem")
    cents = {c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")
             for c in _CORR_COLS}
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count("*").cast("decimal(38,0)").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec(cents[c])).alias(f"s_{c}"))
        aggs.append(F.sum(dec(cents[c]) * dec(cents[c])).alias(f"ss_{c}"))
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(dec(cents[a]) * dec(cents[b])).alias(f"sp_{a}_{b}"))
    m = li.agg(*aggs)
    rows = []
    for a, b in _CORR_PAIRS:
        num = (F.col("n") * F.col(f"sp_{a}_{b}")
               - F.col(f"s_{a}") * F.col(f"s_{b}")).cast("double")
        dx = (F.col("n") * F.col(f"ss_{a}")
              - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double")
        dy = (F.col("n") * F.col(f"ss_{b}")
              - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double")
        rows.append(F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            rfix(num / F.sqrt(dx * dy), 4).alias("corr"),
        ))
    return m.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col_a", "r.col_b", "r.corr"
    )


DRAFTS["diag_correlation_matrix"] = (diag_correlation_matrix, _corr_oracle())


# ---------------------------------------------------------------------------
# g_jaccard_link_prediction — neighbor-overlap link scores
# ---------------------------------------------------------------------------

from .graphq import _EDGE_SQL, trade_edges  # noqa: E402

JACCARD_LINK_ORACLE = f"""
WITH {_EDGE_SQL},
deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
common AS (
    SELECT e1.src AS a, e2.src AS b, count(*) AS common
    FROM edges e1 JOIN edges e2
      ON e1.dst = e2.dst AND e1.src < e2.src
    GROUP BY 1, 2
)
SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
       CAST(c.common AS BIGINT) AS common_neighbors,
       {rfix_sql('c.common::DOUBLE / (da.d + db.d - c.common)', 4)}
           AS jaccard
FROM common c
JOIN deg da ON da.node = c.a
JOIN deg db ON db.node = c.b
JOIN nation na ON na.n_nationkey = c.a
JOIN nation nb ON nb.n_nationkey = c.b
"""


def g_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction over the nation trade graph:
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)| for every node pair sharing a neighbor —
    the set-overlap sibling of g_adamic_adar_nations (which weights rare
    neighbors up; Jaccard normalizes by combined degree instead). Both
    appear in every link-prediction baseline battery (Liben-Nowell &
    Kleinberg '03).

    Scale shape identical to Adamic-Adar: the edge DERIVATION is the
    fact-scale part (two joins + distinct, fully distributed); the
    wedge join and degree rollup run on the nation-bounded edge set.
    Pairs with zero common neighbors are absent by construction — at any
    scale the output is bounded by realized wedges, not node pairs.
    """
    # Thin caller of operators/graphalgs.jaccard_links (r12 library
    # extraction); the nation-name joins stay here.
    from ..operators import graphalgs

    scored = graphalgs.jaccard_links(trade_edges(spark, sf_dir), digits=4)
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        scored.join(F.broadcast(nation.select(F.col("n_nationkey").alias("a"),
                                              F.col("n_name").alias("nation_a"))), "a")
        .join(F.broadcast(nation.select(F.col("n_nationkey").alias("b"),
                                        F.col("n_name").alias("nation_b"))), "b")
        .select("nation_a", "nation_b", "common_neighbors", "jaccard")
    )


DRAFTS["g_jaccard_link_prediction"] = (g_jaccard_link_prediction,
                                       JACCARD_LINK_ORACLE)
