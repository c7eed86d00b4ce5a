"""Round-14 drafts (written in round 11; registered via
queries/draft_layer.register_all, probed through the oracle-parity,
bare-session and 5x/50x scale gates before the driver sees them).

Eight registrations, clustered around this round's two library moves —
the clone-collapse option on the pair-emitters (judge r10 brief #2) and
the phase-2 library-ification of the text/sampling machinery (brief #1),
with half the tranche exercising the NEW libraries at non-registry
parameters to prove the parameterization is real:

* ``dedup_simhash_banded_collapsed`` — the clone-collapsed twin of
  dedup_simhash_banded_pairs: identical fingerprints collapse to
  (canonical, n) BEFORE pair emission, so output is linear in distinct
  fingerprints with exact pair multiplicities; the oracle derives the
  multiplicities with a GROUP BY over the same all-pairs sweep.
* ``dedup_minhash_highrecall_collapsed`` — same move on the 8x2 MinHash
  banding (the other r10-flagged quadratic-output leg).
* ``ann_srp_multiprobe_topk`` — the lifted ann.srp_multiprobe_candidates
  at NON-registry parameters (3 probes, 6-query panel) feeding an actual
  top-3 search, not just the recall eval.
* ``text_winnow_k6w4`` — textops.winnow_fingerprints at k=6/w=4 (the
  registered query runs 4/5).
* ``text_chunk_disjoint`` — textops.chunk_sliding at chunk=stride=24
  (zero overlap: every token in exactly one chunk).
* ``text_pack_bins_fine`` — textops.pack_bins at 512-token bins over 4
  streams with a fresh salt.
* ``sample_stratified_v2`` — sampling.stratified_hash_sample at a second
  rate table and salt (proves the rates/salt are real parameters).
* ``sample_budget_longest_first`` — sampling.token_budget_fill with a
  CUSTOM priority column (longest-first) instead of the hash priority.

Registry contract as everywhere: identical column aliases both sides,
ints cast long/BIGINT, floats through rfix; threshold comparisons on
integer-exact or 6-digit-canonicalized values only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as T
from ..functions import vectors as V
from ..functions.presentation import rfix, rfix_sql
from ..operators import ann as ann_ops
from ..operators import dedup as dedup_ops
from ..operators import sampling, textops
from ..sources.tables import spread, table
from .drafts_r13 import _SH_BANDS, _SH_BITS, _SH_MAXHAM, _simhash_fp_sql
from .drafts_r13 import _HR_BANDS, _HR_PERM
from .llmops import _winnow_oracle

DRAFTS: dict = {}

_TOKS = "string_split_regex(text, '\\s+')"


# ---------------------------------------------------------------------------
# dedup_simhash_banded_collapsed — clone-collapsed SimHash pair emission
# ---------------------------------------------------------------------------

# The oracle derives multiplicities with a GROUP BY over the SAME all-pairs
# Hamming sweep that pins the uncollapsed query: map each doc to its
# fingerprint-group canonical (min doc_id over the fp partition), then count
# raw pairs per (canonical_a, canonical_b, hamming) cell. Because Hamming
# distance is a function of the two fingerprints, each cell is one exact
# (cross: n_a*n_b, within: C(n,2)) multiplicity.
SIMHASH_COLLAPSED_ORACLE = f"""
WITH {_simhash_fp_sql()},
c AS (SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS canon FROM fps)
SELECT CAST(least(a.canon, b.canon) AS BIGINT) AS doc_a,
       CAST(greatest(a.canon, b.canon) AS BIGINT) AS doc_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming,
       CAST(count(*) AS BIGINT) AS pair_multiplicity
FROM c a JOIN c b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {_SH_MAXHAM}
GROUP BY 1, 2, 3
"""


def dedup_simhash_banded_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clone-collapsed SimHash near-dup pairs — the high-duplication scale
    path of dedup_simhash_banded_pairs (judge r10 brief #2).

    The uncollapsed query's output contract is Θ(clones²) under verbatim
    replication (every clone pair is a real ham-0 duplicate: measured
    x90.3 rows at the x50 clone probe). Here identical fingerprints
    collapse to (canonical = min doc_id, n) BEFORE pair emission
    (operators/dedup.simhash_band_pairs(collapse_exact=True)), so the
    output is LINEAR in distinct fingerprints: cross-group pairs carry
    multiplicity n_a*n_b, each clone group a (canonical, canonical,
    ham=0, C(n,2)) self-row — Σ multiplicity equals the uncollapsed pair
    count exactly, which the oracle pins by GROUP BY over the all-pairs
    sweep. Banding/verify work is unchanged (Σ bucket² over 16-bit
    chunks); only the emission contract changes.
    """
    d = spread(table(spark, sf_dir, "documents"))
    fps = dedup_ops.simhash_fingerprints(d, "text", "doc_id", bits=_SH_BITS)
    return dedup_ops.simhash_band_pairs(
        fps, "doc_id", bits=_SH_BITS, bands=_SH_BANDS, max_hamming=_SH_MAXHAM,
        pair_cols=("doc_a", "doc_b"), collapse_exact=True,
    )


DRAFTS["dedup_simhash_banded_collapsed"] = (dedup_simhash_banded_collapsed,
                                            SIMHASH_COLLAPSED_ORACLE)


# ---------------------------------------------------------------------------
# dedup_minhash_highrecall_collapsed — clone-collapsed 8x2 MinHash banding
# ---------------------------------------------------------------------------


def _minhash_collapsed_oracle() -> str:
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
    sig_cols = ", ".join(f"m{i}" for i in range(_HR_PERM))
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct({shingle_expr})) AS s
           FROM toks WHERE len(t) >= 3),
    mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    c AS (SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY {sig_cols}) AS canon
          FROM mh),
    bands AS ({bands}),
    pairs AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT CAST(least(ga.canon, gb.canon) AS BIGINT) AS doc_a,
           CAST(greatest(ga.canon, gb.canon) AS BIGINT) AS doc_b,
           CAST(count(*) AS BIGINT) AS pair_multiplicity
    FROM pairs
    JOIN c ga ON ga.doc_id = pairs.ia
    JOIN c gb ON gb.doc_id = pairs.ib
    GROUP BY 1, 2
    """


def dedup_minhash_highrecall_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clone-collapsed MinHash-LSH candidates at the 8x2 high-recall
    operating point — the same emission-contract fix as
    dedup_simhash_banded_collapsed applied to the other r10-flagged leg
    (x26.2 output rows at the x50 clone probe).

    Identical SIGNATURES collapse to (canonical, n) before banding
    (operators/dedup.minhash_lsh(collapse_exact=True)); identical
    signatures collide in every band, so each clone-group cross pair is a
    real candidate and the multiplicities (n_a*n_b cross, C(n,2) within)
    account for the uncollapsed candidate set exactly — pinned by the
    oracle's GROUP BY over the raw banding pair set. Candidate WORK was
    already Σ bucket²; collapsing also makes the OUTPUT linear in
    distinct signatures.
    """
    d = spread(table(spark, sf_dir, "documents"))
    return dedup_ops.minhash_lsh(
        d, "text", "doc_id", n_perm=_HR_PERM, bands=_HR_BANDS,
        pair_cols=("doc_a", "doc_b"), collapse_exact=True,
    )


DRAFTS["dedup_minhash_highrecall_collapsed"] = (dedup_minhash_highrecall_collapsed,
                                                _minhash_collapsed_oracle())


# ---------------------------------------------------------------------------
# ann_srp_multiprobe_topk — multi-probe candidates feeding a real search
# ---------------------------------------------------------------------------

_MT_PANEL = 6
_MT_PROBES = 3  # own bucket + flips of planes 0,1,2 — NOT the recall eval's 4
_MT_K = 3


def _multiprobe_topk_oracle() -> str:
    probes = ", ".join(
        [f"bucket"] + [f"xor(bucket, {1 << j})" for j in range(_MT_PROBES)]
    )
    return f"""
    WITH b AS (
        SELECT vec_id, CAST({ann_ops.srp_bucket_sql('embedding', 4)} AS BIGINT) AS bucket
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS query_id, unnest([{probes}]) AS bucket
        FROM b WHERE vec_id < {_MT_PANEL}
    ),
    cand AS (
        SELECT p.query_id, nb.vec_id AS neighbor_id
        FROM probes p JOIN b nb ON nb.bucket = p.bucket
        WHERE nb.vec_id <> p.query_id
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
    WHERE rn <= {_MT_K}
    """


def ann_srp_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe SRP search returning actual neighbors: top-3 by cosine
    among each panel query's multi-probe candidate set (own bucket + 3
    one-bit flips) — ann.srp_multiprobe_candidates (judge r10 brief #7)
    at NON-registry parameters (3 probes / 6-query panel vs the recall
    eval's 4 / 8), feeding a real search instead of an eval.

    Scale shape: candidates from the broadcast probe-list bucket join
    (O(n·(probes+1)/2^planes) expected), then scoring joins the panel
    (broadcast) and corpus vectors only on the candidate rows — per-query
    work stays a small corpus fraction, with the recall lift of probing.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MT_PANEL)
    cand = ann_ops.srp_multiprobe_candidates(
        e, q, n_planes=4, n_probes=_MT_PROBES
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
        .filter(F.col("rn") <= _MT_K)
        .drop("_c6")
    )


DRAFTS["ann_srp_multiprobe_topk"] = (ann_srp_multiprobe_topk,
                                     _multiprobe_topk_oracle())


# ---------------------------------------------------------------------------
# text_winnow_k6w4 — winnowing at the second operating point
# ---------------------------------------------------------------------------


def text_winnow_k6w4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints at k=6 / w=4 — textops.winnow_fingerprints
    (judge r10 brief #1) at NON-registry parameters: longer shingles pick
    rarer features, the smaller window selects denser fingerprints (the
    guarantee-threshold t = w + k - 1 shifts from 8 to 9). Same digest
    shape as the registered 4/5 query; same no-shuffle row-local plan.
    """
    fps = textops.winnow_fingerprints(
        table(spark, sf_dir, "documents"), k=6, w=4
    )
    return fps.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").cast("long").alias("min_fp"),
        F.array_max("fps").cast("long").alias("max_fp"),
    )


DRAFTS["text_winnow_k6w4"] = (text_winnow_k6w4, _winnow_oracle(6, 4))


# ---------------------------------------------------------------------------
# text_chunk_disjoint — zero-overlap chunking
# ---------------------------------------------------------------------------

_CD_CHUNK = 24  # chunk == stride: disjoint windows, every token exactly once


def text_chunk_disjoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint document chunking (chunk = stride = 24): the
    tokenizer-training / packing-prep variant where every token lands in
    exactly ONE chunk — textops.chunk_sliding at non-registry parameters
    (the registered query overlaps 16/12). Same stateless flatMap shape:
    sequence() starts, explode, slice; no shuffle at any scale.
    """
    return textops.chunk_sliding(
        table(spark, sf_dir, "documents"), chunk=_CD_CHUNK, stride=_CD_CHUNK
    )


DRAFTS["text_chunk_disjoint"] = (text_chunk_disjoint, f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), {_CD_CHUNK})) AS start
          FROM t)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(start // {_CD_CHUNK} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(toks, start + 1, start + {_CD_CHUNK})) AS BIGINT)
               AS n_tokens,
           md5(array_to_string(list_slice(toks, start + 1, start + {_CD_CHUNK}), ' '))
               AS chunk_hash
    FROM s
    """)


# ---------------------------------------------------------------------------
# text_pack_bins_fine — packing at trainer-context granularity
# ---------------------------------------------------------------------------

_PF_BIN = 512
_PF_SLOTS = 4
_PF_SALT = "pack2:"


def text_pack_bins_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing at 512-token bins over 4 hash-slot streams with a
    fresh salt — textops.pack_bins at non-registry parameters (registered:
    2048/8/"pack:"). Finer bins bite harder: mean fill drops and bin
    count rises, which is exactly what a short-context trainer sees. Same
    one-shuffle-per-slot shape.
    """
    d = table(spark, sf_dir, "documents")
    sized = d.select("doc_id", F.size(T.tokens("text")).alias("n_tokens"))
    assign = textops.pack_bins(
        sized, id_col="doc_id", size_col="n_tokens",
        bin_tokens=_PF_BIN, slots=_PF_SLOTS, salt=_PF_SALT,
    )
    return assign.groupBy("slot", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_used"),
    )


DRAFTS["text_pack_bins_fine"] = (text_pack_bins_fine, f"""
    WITH t AS (
        SELECT doc_id,
               {hashing.md5_long_sql(f"'{_PF_SALT}' || CAST(doc_id AS VARCHAR)")} % {_PF_SLOTS} AS slot,
               len({_TOKS}) AS n_tokens
        FROM documents
    ), c AS (
        SELECT slot, doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY slot ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
        FROM t
    )
    SELECT CAST(slot AS BIGINT) AS slot,
           CAST(cum_excl // {_PF_BIN} AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_used
    FROM c GROUP BY slot, cum_excl // {_PF_BIN}
    """)


# ---------------------------------------------------------------------------
# sample_stratified_v2 — second rate table, fresh salt
# ---------------------------------------------------------------------------

_SV2_RATES = {"web": 25, "wiki": 60, "books": 90}
_SV2_DEFAULT = 10
_SV2_SALT = "sample2:"


def sample_stratified_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified keyed-hash downsample at a SECOND rate table and salt
    (web 25 / wiki 60 / books 90 / default 10) —
    sampling.stratified_hash_sample at non-registry parameters, proving
    rates and salt are real knobs. The fresh salt makes this draw
    independent of sample_stratified_hash's: a document kept there says
    nothing about it being kept here. Stateless filter, no shuffle.
    """
    kept = sampling.stratified_hash_sample(
        table(spark, sf_dir, "documents"),
        rates=_SV2_RATES, default_pct=_SV2_DEFAULT, salt=_SV2_SALT,
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )


DRAFTS["sample_stratified_v2"] = (sample_stratified_v2, f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM (
        SELECT source, n_chars,
               {hashing.md5_long_sql(f"'{_SV2_SALT}' || CAST(doc_id AS VARCHAR)")} % 100 AS slot
        FROM documents
    )
    WHERE slot < CASE source
                 {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _SV2_RATES.items())}
                 ELSE {_SV2_DEFAULT} END
    GROUP BY source
    """)


# ---------------------------------------------------------------------------
# sample_budget_longest_first — budget fill under a custom priority
# ---------------------------------------------------------------------------

_BLF_BUDGET = 800


def sample_budget_longest_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget fill with a CUSTOM priority: longest documents first
    (ties by doc_id) instead of the hash order —
    sampling.token_budget_fill(priority_col=...) at non-registry
    parameters. Longest-first is the "fewest documents to fill the
    budget" policy; the shortest kept document per source is reported as
    the cut line. Same one-exchange shape: the source partitioning feeds
    both the running-sum window and the rollup.
    """
    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "source", "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias(
            "n_tokens"
        ),
    ).withColumn("neg_tokens", -F.col("n_tokens"))
    kept = sampling.token_budget_fill(
        sized, id_col="doc_id", group_col="source", size_col="n_tokens",
        budget=_BLF_BUDGET, priority_col="neg_tokens",
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_kept"),
        F.sum("n_tokens").cast("long").alias("tokens_kept"),
        F.min("n_tokens").cast("long").alias("shortest_kept"),
    )


DRAFTS["sample_budget_longest_first"] = (sample_budget_longest_first, f"""
    WITH sized AS (
        SELECT source, doc_id,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
        FROM documents
    ),
    filled AS (
        SELECT source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source
                                   ORDER BY -n_tokens, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
           CAST(min(n_tokens) AS BIGINT) AS shortest_kept
    FROM filled
    WHERE cum - n_tokens < {_BLF_BUDGET}
    GROUP BY source
    """)
