"""LLM-training-data pipeline operators over the documents/embeddings tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), and text analysis
(tokenization, quality scoring, language ID, winnowing fingerprints).

These extend the reference's surface (review text is only ever LIKE-filtered,
webapp/mysql_routes.py:619-626) with the operators a 100 TB corpus pipeline
needs. Design rules:

* Candidate generation is always hash/bucket-based (explode→shuffle on the
  shingle/band/bucket key) — never an unbounded cross join. Where a query
  does bound its input (the O(n²) verification sweeps), the bound is an
  explicit key predicate mirrored in the oracle.
* All hashing is md5-derived (functions/hashing.py) so every operator is
  verifiable against the DuckDB oracle bit-for-bit — signatures, bands,
  fingerprints included.
* Everything is JVM-side DataFrame expressions (higher-order array
  functions); no Python UDFs.

Since round 10 the reusable machinery lives in the LIBRARY modules
``operators/dedup.py`` (minhash/banding/jaccard-verify/simhash) and
``operators/ann.py`` (SRP bucketing, brute-force top-k, IVF); round 11
added ``operators/textops.py`` (quality/langid/winnowing/tf-idf/
chunking/packing/n-grams/repetition) and ``operators/sampling.py``
(stratified/split/upsample/A-ES/temperature/budget/cap) — the queries
here are thin, registry-bound callers; a user brings their own
DataFrame to the library functions directly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as T
from ..functions import vectors as V
from ..functions.presentation import rfix, rfix_sql
from ..operators import ann as ann_ops
from ..operators import curation
from ..operators import dedup as dedup_ops
from ..operators import sampling
from ..operators import textops
from ..operators.graph import min_label_components
from ..sources.tables import spread, table
from .registry import register

# DuckDB-side token expression (oracle counterpart of T.tokens)
_TOKS = "string_split_regex(text, '\\s+')"

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                   '\\s+', ' ', 'g'))) AS fingerprint,
           CAST(count(*) AS BIGINT) AS dup_cnt,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc
    FROM documents
    GROUP BY 1
    """,
    tags=("DEDUP", "A2"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text, keep min-id canonical.

    The scale path for 100 TB: one shuffle on the 128-bit fingerprint; no
    row ever compares against another directly. (Reference analog: INSERT
    IGNORE first-writer-wins on PK, init/mysql_loader.py:435-439.)
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(T.normalize("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("dup_cnt"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
        )
    )


@register(
    "dedup_prefix_near_groups",
    oracle=f"""
    SELECT md5(array_to_string(({_TOKS})[1:5], ' ')) AS prefix_fp,
           CAST(count(*) AS BIGINT) AS dup_cnt,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
    tags=("DEDUP",),
)
def dedup_prefix_near_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup grouping on a 5-token prefix fingerprint (cheap first-pass
    blocking before expensive pairwise verification)."""
    d = table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(T.tokens("text"), 1, 5))
    return (
        d.select(F.md5(prefix).alias("prefix_fp"), "doc_id")
        .groupBy("prefix_fp")
        .agg(
            F.count("*").alias("dup_cnt"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .filter(F.col("dup_cnt") > 1)
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str, n_perm: int) -> DataFrame:
    """(doc_id, m0..m{n-1}) MinHash signatures over distinct 3-token shingles.

    Thin caller of the library operator (``operators/dedup.py``) bound to
    the documents table, with the narrow-stage ``spread`` rebalance applied
    at the source (see :func:`..sources.tables.spread`).
    """
    return dedup_ops.minhash_signatures(
        spread(table(spark, sf_dir, "documents")), "text", "doc_id", n_perm
    )


N_PERM = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERM // N_BANDS


def _minhash_oracle() -> str:
    shingle_expr = T.shingles_sql("t", 3)
    h = f"({hashing.md5_long_sql('s')} % {hashing.MERSENNE})"
    mins = ",\n           ".join(
        f"min({hashing.perm_sql(h, i)}) AS m{i}" for i in range(N_PERM)
    )
    band_selects = []
    for b in range(N_BANDS):
        cols = [f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
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


@register("dedup_minhash_lsh_candidates", oracle=_minhash_oracle(), tags=("DEDUP", "LSH"))
def dedup_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding candidate pairs (Broder resemblance sketches;
    16 permutations, 4 bands × 4 rows).

    Scale path: shingle-explode → per-doc min-aggregate (one shuffle on
    doc_id) → band hash → self-join on (band, band_hash) — pair work is
    proportional to bucket collisions, never to n². The md5-seeded hash
    family makes signatures identical in the SQL oracle.
    """
    sigs = _minhash_sigs(spark, sf_dir, N_PERM)
    bands = dedup_ops.lsh_band_hashes(sigs, "doc_id", N_PERM, N_BANDS)
    return dedup_ops.lsh_candidate_pairs(bands, "doc_id", ("doc_a", "doc_b"))


def _minhash_verified_oracle() -> str:
    """LSH candidates (the minhash oracle's CTE chain) verified with exact
    3-gram Jaccard ≥ 0.2 — the canonical generate→verify dedup pipeline."""
    return f"""
    WITH cand AS ({_minhash_oracle()}),
    sh AS (SELECT doc_id, list_distinct({T.shingles_sql(_TOKS, 3)}) AS s FROM documents)
    SELECT c.doc_a, c.doc_b,
           {rfix_sql('''len(list_intersect(a.s, b.s))::DOUBLE /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))''', 4)} AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b
    WHERE {rfix_sql('''len(list_intersect(a.s, b.s))::DOUBLE /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))''', 6)} >= 0.2
    """


@register("dedup_minhash_verified", oracle=_minhash_verified_oracle(), tags=("DEDUP", "LSH"))
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full two-stage dedup pipeline: MinHash-LSH candidate generation
    followed by exact shingle-Jaccard verification of ONLY the candidates.

    This is the shape that runs at 100 TB: stage 1 touches every doc once
    (hash → band → bucket join, work ∝ collisions); stage 2's exact
    pairwise cost is proportional to the candidate count, not n². The
    threshold is applied to the 6-digit-canonicalized Jaccard on both sides
    so set membership can't flip on last-ulp noise.
    """
    cands = dedup_minhash_lsh_candidates(spark, sf_dir)
    return dedup_ops.jaccard_verify(
        table(spark, sf_dir, "documents"),
        cands,
        threshold=0.2,
        pair_cols=("doc_a", "doc_b"),
    )


def _dedup_clusters_oracle() -> str:
    """Transitive closure of the verified near-dup graph via WITH RECURSIVE;
    cluster id = min reachable doc_id."""
    return f"""
    WITH RECURSIVE cand AS ({_minhash_verified_oracle()}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cand
        UNION SELECT doc_b, doc_a FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, other) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other
    )
    SELECT node AS doc_id, min(other) AS cluster_id,
           CAST(count(DISTINCT other) AS BIGINT) AS cluster_size
    FROM reach GROUP BY node
    """


@register("dedup_clusters", oracle=_dedup_clusters_oracle(), tags=("DEDUP", "ITER"))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the verified near-dup
    pair graph — the final stage of a dedup pipeline (transitive closure:
    A~B and B~C put A,B,C in one cluster; keep min doc_id as canonical).

    Spark-first iterative min-label propagation: each round joins labels to
    the (cached, pre-shuffled) edge list and takes the elementwise min —
    O(diameter) rounds, each one distributed join + aggregate, no driver
    data. Converges when no label changes (checked with a count, the only
    driver-side value). The DuckDB oracle computes the same closure with
    WITH RECURSIVE.

    cluster_size counts reachable docs (= component size); singleton docs
    (no near-dup pair) are excluded — they're already canonical.
    """
    pairs = dedup_minhash_verified(spark, sf_dir).select("doc_a", "doc_b")
    # both directions from ONE evaluation of the (expensive) pair subtree:
    # a union of two selects re-executes it per branch (measured 2x the
    # verify join); explode emits src->dst and dst->src per row instead
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    labels = min_label_components(edges)
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
        )
    )


@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, list_distinct({T.shingles_sql(_TOKS, 3)}) AS sh
        FROM documents
        WHERE doc_id < 300 AND len({_TOKS}) >= 3
    )
    SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
           {rfix_sql('''len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))''', 4)} AS jaccard
    FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) > 0
      AND len(list_intersect(a.sh, b.sh))::DOUBLE /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
    """,
    tags=("DEDUP",),
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity pairs (≥ 0.2) on a bounded slice.

    Spark-first shape: instead of the oracle's O(n²) cross join, shingles are
    exploded and pairs are generated by a shuffle join on the shingle key —
    only docs sharing ≥1 shingle ever meet, then |A∩B| is a pair count and
    |A∪B| = |A|+|B|−|A∩B|. This is the verification stage that confirms
    MinHash candidates; the doc_id < 300 bound keeps the oracle cross join
    tractable and is part of the query contract.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return dedup_ops.ngram_jaccard_pairs(
        d, k=3, threshold=0.2, pair_cols=("doc_a", "doc_b")
    )


SIMHASH_BITS = 32


def _simhash_oracle() -> str:
    h = hashing.md5_long_sql("tok")
    bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents WHERE doc_id < 1000),
    hashed AS (SELECT doc_id, {h} AS h FROM tok),
    fps AS (SELECT doc_id, {bits} AS fp FROM hashed GROUP BY doc_id)
    SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 6
    """


@register("dedup_simhash_pairs", oracle=_simhash_oracle(), tags=("DEDUP",))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (Charikar) near-dup pairs: 32-bit sign-of-sums fingerprint
    over token hashes, pairs at Hamming distance ≤ 6.

    Fingerprinting is one explode + one groupBy (linear, shuffle on doc_id).
    The pairwise Hamming sweep is bounded (doc_id < 1000) — the unbounded
    scale path is banding on fingerprint chunks, same pattern as MinHash-LSH.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    fps = dedup_ops.simhash_fingerprints(d, bits=SIMHASH_BITS)
    return dedup_ops.simhash_pairs(
        fps, max_hamming=6, pair_cols=("doc_a", "doc_b")
    )


@register(
    "dedup_embedding_cosine_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000)
    SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
           {rfix_sql(V.cosine_sql('a.embedding', 'b.embedding'), 4)} AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {rfix_sql(V.cosine_sql('a.embedding', 'b.embedding'), 6)} >= 0.4
    """,
    tags=("DEDUP", "ANN"),
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4, vec_id < 1000)
    WITHOUT an all-pairs join: candidates come from an angular-IVF index
    with triangle-inequality cell-pair pruning, which — unlike LSH banding
    — is EXACT, so the result provably equals the oracle's brute-force
    self-join (the hash gate checks precisely that).

    Index: vectors are assigned to their max-cosine cell among K
    deterministic centroids (first K by vec_id), and each cell records its
    angular radius r = max angle(member, centroid). Angular distance is a
    metric, so a qualifying pair (angle ≤ θt = arccos(threshold)) can only
    live in a cell pair whose centroid angle ≤ r_a + r_b + θt; only those
    cell pairs are joined (cell-keyed equi-joins, never a cross join), and
    the exact 6-digit-canonicalized cosine filter runs on candidates only
    (same final predicate on both sides, so set membership can't flip on
    last-ulp noise).

    Scale shape: two bounded collects (K centroid rows, K radius rows —
    the documented legitimate kind), assignment as a codegen argmax over K
    literal expressions, candidates via a broadcast of the ≤K² admitted
    cell pairs. On clustered real-world embeddings the pruning drops most
    cell pairs and each surviving join is cell-local; on this synthetic
    isotropic corpus radii sit near 90° so most cell pairs stay admitted —
    the curse of dimensionality, which no exact index escapes — but the
    plan is the scale-correct one and, unlike the previous bounded
    all-pairs slice, never degenerates to a cross join. The probabilistic
    (recall < 1) alternative at 100 TB is SRP-LSH banding
    (ann_lsh_bucket_topk below), measured by ann_recall_eval.
    """
    import math

    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    k = 16
    cents = sorted(
        e.filter(F.col("vec_id") < k)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("c"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not cents:
        return spark.createDataFrame(
            [], "vec_a LONG, vec_b LONG, cos_sim DOUBLE"
        )
    # argmax-cosine cell assignment: one parsed expression per centroid
    # (same plan-build-latency move as emb_kmeans_assign_stats), ties to
    # the lower cell id via the negated-id struct field
    self_norm = F.sqrt(
        F.expr(
            "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
            "CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )
    )
    choices = []
    for idx, r in enumerate(cents):
        arr = ", ".join(f"{float(x)!r}D" for x in r.c)
        dot_c = F.expr(
            f"aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
            f"array({arr}), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
        cnorm = math.sqrt(sum(x * x for x in r.c))
        cos_c = dot_c / (self_norm * F.lit(cnorm))
        choices.append(
            F.struct(cos_c.alias("cos"), F.lit(-idx).alias("negcell"))
        )
    best = F.array_max(F.array(*choices))
    ang = F.acos(
        F.least(F.lit(1.0), F.greatest(F.lit(-1.0), best["cos"]))
    )
    assigned = e.select(
        "vec_id",
        "embedding",
        (-best["negcell"]).cast("int").alias("cell"),
        ang.alias("ang"),
        # per-ROW norm, precomputed once: the pair join divides by
        # nrm_a * nrm_b instead of re-deriving both norms per pair —
        # 3 interpreted HOF evaluations per candidate become 1
        V.norm(F.col("embedding")).alias("nrm"),
    ).localCheckpoint()  # pinned: feeds radii + both join sides
    radii = {
        int(r["cell"]): float(r["r"])
        for r in assigned.groupBy("cell").agg(F.max("ang").alias("r")).collect()
    }
    # admitted DIRECTED cell pairs (each vector pair appears exactly once,
    # under (cell(a), cell(b))): centroid angle ≤ r_a + θt + r_b, with an
    # epsilon for the Python-vs-codegen float path difference
    theta_t = math.acos(0.39999)  # margin below the 6-digit 0.3999995 edge

    def _angle(u, v):
        d = sum(x * y for x, y in zip(u, v))
        n = math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(x * x for x in v))
        return math.acos(max(-1.0, min(1.0, d / n if n else 1.0)))

    cell_pairs = [
        (i, ca, cb)
        for i, (ca, cb) in enumerate(
            (ca, cb)
            for ca in radii
            for cb in radii
            if _angle(cents[ca].c, cents[cb].c)
            <= radii[ca] + theta_t + radii[cb] + 1e-6
        )
    ]
    # BLOCK-MATMUL scoring (r9, replaces the pair-row HOF join — measured
    # 3.91s -> 1.92s at sf0.1, identical 246-row output): instead of
    # materializing one row per candidate PAIR and paying one interpreted
    # HOF dot each (~500k evaluations — HOFs are CodegenFallback, see
    # functions/vectors.py), ship each admitted cell pair's MEMBER
    # VECTORS once through Arrow (O(n·avg_pairs_per_cell) rows, not
    # O(pairs)) and score the block with one dense numpy matmul
    # A @ B.T / outer(norms) per group — the BLAS-per-cell-pair shape an
    # IVF index uses at 100 TB. Only qualifying-orientation pairs
    # (vec_a < vec_b within the DIRECTED cell pair, so each unordered
    # pair still appears exactly once) leave Python. float64 matmul
    # reassociates the fold the sequential HOF used; the 6-digit
    # canonicalized threshold and 4-digit output absorb last-ulp
    # differences exactly as they already do for DuckDB's vectorized
    # list_inner_product on the oracle side.
    cp = spark.createDataFrame(cell_pairs, "pid INT, ca INT, cb INT")
    left = assigned.join(
        F.broadcast(cp.select("pid", "ca")), F.col("cell") == F.col("ca")
    ).select("pid", F.lit(0).alias("side"), "vec_id", "embedding", "nrm")
    right = assigned.join(
        F.broadcast(cp.select("pid", "cb")), F.col("cell") == F.col("cb")
    ).select("pid", F.lit(1).alias("side"), "vec_id", "embedding", "nrm")
    both = left.unionByName(right)

    # r14 (guide §2.5/§5): iterator form + blocked matmul — the r13 kernel
    # materialized the full |a| x |b| cosine matrix of one admitted cell
    # pair in a single return value; a hot cell pair at scale is a
    # straggler-then-OOM. Row blocks stream out as separate Arrow batches
    # (same move as ann_lsh_bucket_topk's _score_bucket).
    def _score_block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.ann import blocked_cosine_rows

        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return
        ma = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        mb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        na = a["nrm"].to_numpy()
        nb = b["nrm"].to_numpy()
        ids_a = a["vec_id"].to_numpy()
        ids_b = b["vec_id"].to_numpy()
        for i0, cos in blocked_cosine_rows(ma, na, mb, nb):
            blk = cos.shape[0]
            ia, ib = np.meshgrid(
                ids_a[i0:i0 + blk], ids_b, indexing="ij"
            )
            mask = ia < ib
            yield pd.DataFrame(
                {"vec_a": ia[mask], "vec_b": ib[mask], "_c": cos[mask]}
            )

    scored = both.groupBy("pid").applyInPandas(
        _score_block, "vec_a long, vec_b long, _c double"
    )
    # _c is a materialized kernel output column (not an expression), so the
    # filter+project below read it without re-evaluation — the r8 pin that
    # guarded the HOF double-evaluation is no longer needed
    return (
        scored.filter(rfix(F.col("_c"), 6) >= 0.4)
        .select(
            "vec_a",
            "vec_b",
            rfix(F.col("_c"), 4).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Similarity search (ANN)
# ---------------------------------------------------------------------------


@register(
    "ann_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {rfix_sql(V.cosine_sql('q.qe', 'e.embedding'), 6)} AS c6,
               {rfix_sql(V.cosine_sql('q.qe', 'e.embedding'), 4)} AS cos_sim
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
           cos_sim, rn
    FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY c6 DESC, neighbor_id) AS BIGINT) AS rn
          FROM scored)
    WHERE rn <= 10
    """,
    tags=("ANN", "W1"),
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k — the exact-ANN baseline.

    Query vectors (a tiny set) are broadcast against the full corpus; ranking
    is a per-query row_number window ordered by the 6-digit-canonicalized
    cosine with a deterministic id tie-break. One corpus scan per batch of
    queries, no shuffle of the corpus itself.
    """
    e = table(spark, sf_dir, "embeddings")
    return ann_ops.cosine_topk(e, e.filter(F.col("vec_id") < 5), k=10)


_IVF_K = 8  # coarse centroids
_IVF_QUERIES = 5


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {_IVF_K}
    ),
    assign AS (
        SELECT vec_id, cid, embedding FROM (
            SELECT e.vec_id, c.cid, e.embedding,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {rfix_sql(V.cosine_sql('e.embedding', 'c.cv'), 6)} DESC, c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, cid, embedding AS qe FROM assign
          WHERE vec_id < {_IVF_QUERIES}),
    scored AS (
        SELECT q.query_id, a.vec_id AS neighbor_id,
               {rfix_sql(V.cosine_sql('q.qe', 'a.embedding'), 6)} AS c6,
               {rfix_sql(V.cosine_sql('q.qe', 'a.embedding'), 4)} AS cos_sim
        FROM q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.query_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
           cos_sim, rn
    FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY c6 DESC, neighbor_id) AS BIGINT) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    tags=("ANN", "IVF"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbor — the 100 TB scale
    path next to the brute-force baseline (ann_topk_cosine).

    Index build: every vector is assigned to its nearest of K coarse
    centroids (here the first K vectors — a deterministic stand-in for a
    k-means codebook; the assignment plan is identical). Search: a query
    scores ONLY its own centroid's inverted list — corpus work drops from
    O(n) to O(n/K) per query (nprobe=1). Both stages are shuffle-light:
    centroids broadcast, assignment is a map-side cross-score + one window,
    and the search joins on the centroid id.

    Determinism: assignment and ranking order by the 6-digit-canonicalized
    cosine with id tie-breaks, so engine and oracle pick identical buckets
    and neighbors.

    The assignment (the IVF index) is pinned with an eager localCheckpoint
    before the search join: it feeds BOTH join sides, and inlining its
    K-way cosine + window tree twice into the join stage made Janino
    compilation dominate cold runs (6.6s cold vs 1.2s warm at sf0.1 —
    same pathology and fix as ann_lsh_bucket_topk). At cluster scale this
    is exactly "build the index once, then search it": the index is a
    materialization point by design.
    """
    e = table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    assign = ann_ops.ivf_assign(e, cents)
    q = assign.filter(F.col("vec_id") < _IVF_QUERIES)
    return ann_ops.ivf_search_topk(assign, q, k=5)


# SRP machinery graduated to the library (operators/ann.py, judge r9 brief
# #1); these module-level names are kept as the registry queries' binding —
# same md5-derived literal planes, same one-F.expr construction (the py4j
# round-trip fix documented at ann.srp_bucket), bucket ids bit-identical.
_srp_weights = ann_ops.srp_planes
_srp_bucket_sql = ann_ops.srp_bucket_sql
_srp_bucket_col = ann_ops.srp_bucket


@register(
    "ann_lsh_bucket_histogram",
    oracle=f"""
    SELECT CAST({_srp_bucket_sql('embedding', 4)} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS vec_cnt
    FROM embeddings
    GROUP BY 1
    """,
    tags=("ANN", "LSH"),
)
def ann_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH bucketing — the scale path for ANN.

    Each vector is assigned a 4-bit hyperplane-sign bucket; at query time
    only same-bucket (or neighboring-bucket) candidates are scored, turning
    the O(n) scan into O(n / 2^planes) per query. Planes are md5-derived so
    the oracle assigns identical buckets. This query materializes the bucket
    histogram (the index-build step).
    """
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(_srp_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("vec_cnt"))
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks, text FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_words_re,
           {rfix_sql("list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE / len(toks)", 4)} AS avg_token_len,
           {rfix_sql(f"{T.marker_count_sql('toks', T.STOPWORDS)}::DOUBLE / len(toks)", 4)} AS stopword_ratio,
           {rfix_sql('len(list_distinct(toks))::DOUBLE / len(toks)', 4)} AS uniq_ratio
    FROM t WHERE len(toks) > 0
    """,
    tags=("TEXT", "F10"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token counts, regex word count,
    average token length, stopword ratio, lexical diversity.

    All higher-order array functions inside codegen; the standard heuristic
    filters (Gopher/C4-style length & repetition rules) compose from these
    columns.
    """
    return textops.quality_scores(table(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    counts = ",\n           ".join(
        f"{T.marker_count_sql('toks', T.LANG_MARKERS[lang])} AS hits_{lang}"
        for lang in T.LANG_PRIORITY
    )
    # deterministic argmax: first language in priority order with max hits;
    # a prediction needs >=1 marker hit (zero-hit docs -> 'und')
    cases = []
    for lang in T.LANG_PRIORITY:
        conds = " AND ".join(
            [f"hits_{lang} > 0"]
            + [f"hits_{lang} >= hits_{other}"
               for other in T.LANG_PRIORITY if other != lang]
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_expr = "CASE " + " ".join(cases) + " ELSE 'und' END"
    hit_cols = ", ".join(f"CAST(hits_{lang} AS BIGINT) AS hits_{lang}" for lang in T.LANG_PRIORITY)
    return f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    scored AS (SELECT doc_id, lang, {counts} FROM t)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS labeled_lang,
           {case_expr} AS predicted_lang, {hit_cols}
    FROM scored
    """


@register("text_langid_heuristic", oracle=_langid_oracle(), tags=("TEXT",))
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword heuristic language ID: count per-language marker
    tokens, pick the max with a deterministic priority tie-break.

    (The synthetic corpus is vocab-random, so precision vs the labeled lang
    column is not meaningful — the operator shape and its portability are.)
    """
    return textops.langid(
        table(spark, sf_dir, "documents"),
        passthrough=(F.col("lang").alias("labeled_lang"),),
    )


def _winnow_oracle(k: int, w: int) -> str:
    shingle_expr = T.shingles_sql("t", k)
    h = hashing.md5_long_sql("s")
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    hs AS (SELECT doc_id,
                  list_transform({shingle_expr}, s -> {h}) AS hashes
           FROM toks WHERE len(t) >= {k}),
    wins AS (SELECT doc_id,
                    CASE WHEN len(hashes) >= {w} THEN
                      list_distinct(list_transform(
                        range(1, len(hashes) - {w - 2}),
                        i -> list_aggregate(hashes[i:i + {w - 1}], 'min')))
                    ELSE list_distinct([list_aggregate(hashes, 'min')]) END AS fps
             FROM hs)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(list_aggregate(fps, 'min') AS BIGINT) AS min_fp,
           CAST(list_aggregate(fps, 'max') AS BIGINT) AS max_fp
    FROM wins
    """


@register("text_winnow_fingerprints", oracle=_winnow_oracle(4, 5), tags=("TEXT", "DEDUP"))
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken '03):
    4-gram rolling hashes, window-of-5 minima, distinct selected prints.

    Entirely array-expression math per row — no explode, no shuffle; the
    downstream near-dup join on fingerprints is the same bucket-join shape
    as MinHash.
    """
    fps = textops.winnow_fingerprints(
        table(spark, sf_dir, "documents"), k=4, w=5
    )
    return fps.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").cast("long").alias("min_fp"),
        F.array_max("fps").cast("long").alias("max_fp"),
    )


@register(
    "ann_lsh_bucket_topk",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
               CAST({_srp_bucket_sql('embedding', 4)} AS BIGINT) AS bucket
        FROM embeddings
    ), scored AS (
        SELECT a.vec_id AS query_id, n.vec_id AS neighbor_id, a.bucket,
               {rfix_sql(f"{V.dot_sql('a.embedding', 'n.embedding')} / (a.nrm * n.nrm)", 6)} AS c6,
               {rfix_sql(f"{V.dot_sql('a.embedding', 'n.embedding')} / (a.nrm * n.nrm)", 4)} AS cos_sim
        FROM b a JOIN b n ON n.bucket = a.bucket AND n.vec_id <> a.vec_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           bucket, cos_sim, rn
    FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY c6 DESC, neighbor_id) AS BIGINT) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    tags=("ANN", "LSH", "W1"),
)
def ann_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN search — top-3 same-bucket neighbors for EVERY
    vector (all-pairs k-NN, the near-dup/similarity workhorse).

    This is the query-time half of ann_lsh_bucket_histogram: candidates
    are restricted to the probe's own 4-bit hyperplane-sign bucket, so
    each vector scores ~n/16 candidates instead of n — the same
    shuffle-on-bucket plan that at 100 TB keeps per-task candidate sets
    bounded (more planes → smaller buckets). Exact cosine then ranks the
    candidates; ties break on the 6-digit-canonicalized score + vec_id
    so engine and oracle agree bit-for-bit. Recall tradeoff vs the
    brute-force ann_topk_cosine baseline is the standard LSH contract.

    Duplicate-robustness (the PPJoin move, measured r8): on a corpus with
    exact-duplicate vectors the naive bucket self-join is QUADRATIC in
    the duplication factor — identical vectors share a bucket, so k
    clones turn every candidate pair into k² scored rows (measured
    x26.86 at 20x verbatim-replicated embeddings). The cosine join
    therefore runs on DISTINCT vectors only: exact clones collapse to
    one representative (group key = md5 of the float array's string
    form — Java float→string is injective, distinct floats → distinct
    strings), representatives score against representatives, and members
    are expanded back afterwards. Expansion is exact, not approximate:
    every member of a candidate group shares the representative's cosine
    bit-for-bit (identical bytes), and within a tied group order is by
    vec_id — so the per-query top-3 is reconstructed from each group's
    first FOUR members by id (4 = top-3 + at most one self-exclusion),
    ranked globally per group, then per query after removing self. The
    per-group candidate pool and the expansion join are both linear in
    corpus size; the k² regime is gone.
    """
    # The bucketed + pre-normed projection IS the ANN index: materialize it
    # once (eager localCheckpoint) so (a) norms are computed per ROW, not per
    # pair, and (b) the probe join's generated code doesn't re-inline the
    # 4x64-literal plane expressions on both sides — whole-stage-codegen
    # compile time of that doubled expression tree dominated the cold run.
    e = (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "embedding",
            _srp_bucket_col().alias("bucket"),
            V.norm(F.col("embedding")).alias("nrm"),
        )
        .localCheckpoint(eager=True)
    )
    # FULL 128-bit md5 hex as the clone-group key, not the 60-bit
    # md5_long truncation (ADVICE r8): at the billion-vector scale this
    # module targets, 60-bit birthday collisions are likely (~40% at 1e9)
    # and a collision silently merges two DISTINCT vectors into one clone
    # group, emitting the representative's cosine for the wrong members
    # with no error. The 32-char fixed-width key costs a marginally wider
    # shuffle; group membership is what must never be wrong.
    gkey = F.md5(F.array_join(F.col("embedding").cast("array<string>"), ","))
    keyed = e.withColumn("gkey", gkey)
    mw = Window.partitionBy("gkey").orderBy("vec_id")
    gm = keyed.withColumn("mrn", F.row_number().over(mw))
    reps = gm.filter(F.col("mrn") == 1)
    first4 = gm.filter(F.col("mrn") <= 4).select(
        F.col("gkey").alias("n_gkey"), F.col("vec_id").alias("neighbor_id")
    )
    # rep×rep INCLUDING the self-pair: a group's own members are each
    # other's (exact-duplicate) candidates; per-query self-exclusion below.
    # r13 BLOCK-MATMUL scoring (the r9 dedup_embedding_cosine_pairs move,
    # guide §4.2): the bucket-keyed HOF self-join paid one interpreted
    # ~12µs zip_with/aggregate dot per candidate PAIR (~261k pairs at
    # sf0.1, measured 2.9 s for the pair subtree alone); instead ship each
    # bucket's MEMBER vectors once through Arrow (O(reps) rows) and score
    # the whole bucket with one dense numpy matmul. Raw cosines leave
    # Python; the 6/4-digit rfix canonicalization stays in Spark exactly
    # as before, absorbing the matmul's last-ulp reassociation the same
    # way it already absorbs DuckDB's vectorized list_inner_product.
    # r14 (guide §2.5/§5): iterator form + blocked matmul — the r13 kernel
    # materialized the whole k x k cosine matrix and emitted k² rows from
    # ONE return value, so a hot bucket's memory grew with the SQUARE of
    # its membership. Blocks of ann.blocked_cosine_rows leave the worker
    # as separate Arrow batches; peak live state is O(k·d + block·k).
    # Same values row for row (each block row is the same GEMM dot).
    def _score_bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.ann import blocked_cosine_rows

        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ma = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        nr = pdf["nrm"].to_numpy()
        k = len(pdf)
        gk = pdf["gkey"].to_numpy()
        bucket = pdf["bucket"].to_numpy()[0]
        for i0, cos in blocked_cosine_rows(ma, nr, ma, nr):
            blk = cos.shape[0]
            yield pd.DataFrame(
                {
                    "q_gkey": np.repeat(gk[i0:i0 + blk], k),
                    "n_gkey": np.tile(gk, blk),
                    "bucket": np.repeat(bucket, blk * k),
                    "_c": cos.ravel(),
                }
            )

    pairs = (
        reps.select("gkey", "bucket", "embedding", "nrm")
        .groupBy("bucket")
        .applyInPandas(
            _score_bucket, "q_gkey string, n_gkey string, bucket long, _c double"
        )
        .select(
            "q_gkey",
            "n_gkey",
            "bucket",
            rfix(F.col("_c"), 6).alias("c6"),
            rfix(F.col("_c"), 4).alias("cos_sim"),
        )
    )
    gw = Window.partitionBy("q_gkey").orderBy(F.desc("c6"), F.asc("neighbor_id"))
    top4 = (
        pairs.join(first4, "n_gkey")
        .withColumn("crn", F.row_number().over(gw))
        .filter(F.col("crn") <= 4)
        .drop("crn", "n_gkey")
    )
    # no window needed on the query side — every member is a query
    queries = keyed.select(
        F.col("gkey").alias("q_gkey"), F.col("vec_id").alias("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c6"), F.asc("neighbor_id"))
    return (
        queries.join(top4, "q_gkey")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            "bucket",
            "c6",
            "cos_sim",
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .drop("c6")
    )


# DuckDB-side lowercased word expression (oracle counterpart of the tf-idf
# tokenizer below — alnum runs, case-folded, so 'The'/'the' share a term).
_WORDS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_WORDS}) AS term FROM documents)
        GROUP BY doc_id, term
    ), df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               {rfix_sql('tf.tf * ln(n.n_docs::DOUBLE / df.df)', 6)} AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tf, df, score, rn
    FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, term) AS BIGINT) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    tags=("TEXT", "TFIDF", "W1"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (keyword extraction).

    tf = in-doc term count, idf = ln(N / df) over the corpus; both exact
    integer-derived quantities, so the score is reproducible anywhere.
    Plan shape — exactly three exchanges, each on a natural key:
    explode→groupBy(doc,term) for tf, then df as COUNT(*) OVER (PARTITION
    BY term) — a window on tf instead of the textbook groupBy(term)+join,
    which removes both the second aggregation and the join reshuffle —
    then the per-doc top-3 window. N comes from the document scan itself
    (count of docs with ≥1 term: identical to COUNT(DISTINCT doc_id) over
    tf but needs no distinct shuffle), broadcast as a 1-row cross join.
    The corpus is never cross-joined. Ranking ties break on the
    6-digit-rounded score then term, keeping engine and oracle
    row-identical.
    """
    return textops.tfidf_top_terms(
        spread(table(spark, sf_dir, "documents")), top_k=3
    )


@register(
    "text_top_bigrams",
    oracle=f"""
    WITH grams AS (
        SELECT unnest({T.shingles_sql(_TOKS, 2)}) AS bigram FROM documents
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS gram_cnt
    FROM grams
    GROUP BY bigram
    ORDER BY gram_cnt DESC, bigram
    LIMIT 20
    """,
    tags=("TEXT", "A10", "O3"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequency, top-20 — the n-gram statistics pass a
    corpus pipeline runs for tokenizer/LM training diagnostics.

    Shingle construction is the same zip_with-over-slices used by MinHash
    (functions/text.shingles, k=2): the token split is evaluated twice per
    row, not per gram. One explode→groupBy(bigram) shuffle; Spark's partial
    map-side counts do the heavy lifting before exchange, so the shuffle
    carries only distinct grams per task — the corpus itself never moves.
    Deterministic top-20 via the (count desc, bigram) tiebreak.
    """
    return textops.top_ngrams(
        table(spark, sf_dir, "documents"), n=2, top_k=20, gram_col="bigram"
    )


# Per-source sampling rates (percent of the md5 keyspace kept) for the
# stratified downsample below.
_STRATA_RATES = {"web": 40, "wiki": 80, "books": 100}


@register(
    "sample_stratified_hash",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM (
        SELECT source, n_chars,
               {hashing.md5_long_sql("'sample:' || CAST(doc_id AS VARCHAR)")} % 100 AS slot
        FROM documents
    )
    WHERE slot < CASE source
                 {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())}
                 ELSE 20 END
    GROUP BY source
    """,
    tags=("SAMPLE", "A2"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling by keyed hash — keep a
    per-stratum percentage of documents (web 40%, wiki 80%, books 100%,
    default 20%), the data-mixing step of a corpus pipeline.

    ``df.sampleBy`` draws per-partition randomness: resplitting the input
    changes the sample, which is unacceptable for reproducible training
    sets. Hashing the stable document key into 100 slots gives a sample
    that is a pure function of the data — same rows on any cluster
    layout, any engine (the oracle reproduces it bit-for-bit) — and it's
    a stateless map over the scan: no shuffle at any scale.
    """
    kept = sampling.stratified_hash_sample(
        table(spark, sf_dir, "documents"),
        rates=_STRATA_RATES, default_pct=20, salt="sample:",
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM (
        SELECT source, doc_id,
               CASE WHEN slot < 90 THEN 'train'
                    WHEN slot < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT source, doc_id,
                     {hashing.md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS slot
              FROM documents)
    )
    GROUP BY source, split
    """,
    tags=("SAMPLE", "A2"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by keyed hash.

    Same reproducibility argument as sample_stratified_hash: the split is
    a pure function of the document key (salted so it is independent of
    the sampling hash above — a document's sample slot says nothing about
    its split slot), survives any repartitioning, and needs no shuffle;
    the reported per-(source, split) counts aggregate in one exchange.
    """
    labeled = sampling.hash_split(
        table(spark, sf_dir, "documents").select("source", "doc_id"),
        boundaries=((90, "train"), (95, "val")), default_label="test",
        salt="split:",
    )
    return labeled.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc"),
    )


# Mixing weights: average copies of each document per epoch of the blended
# corpus (fractional part applied via an independent hash slot).
_MIX_WEIGHTS = {"books": 2.5, "wiki": 1.0, "web": 0.5}


@register(
    "sample_weighted_mix",
    oracle=f"""
    WITH w AS (
        SELECT source, doc_id, n_chars,
               CASE source {' '.join(f"WHEN '{k}' THEN {int(v)}" for k, v in _MIX_WEIGHTS.items())} ELSE 1 END
                 AS whole,
               CASE source {' '.join(f"WHEN '{k}' THEN {int(round((v - int(v)) * 10000))}" for k, v in _MIX_WEIGHTS.items())} ELSE 0 END
                 AS frac_bp,
               {hashing.md5_long_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000 AS slot
        FROM documents
    ), expanded AS (
        SELECT source, doc_id, n_chars,
               whole + CASE WHEN slot < frac_bp THEN 1 ELSE 0 END AS copies
        FROM w
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_in,
           CAST(sum(copies) AS BIGINT) AS n_docs_out,
           CAST(sum(copies * n_chars) AS BIGINT) AS chars_out
    FROM expanded
    GROUP BY source
    """,
    tags=("SAMPLE", "A2"),
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus mixing (upsampling): each document is
    repeated floor(w) times plus one more for the hash-chosen fraction of
    its stratum — books 2.5x, wiki 1x, web 0.5x — the blend step after
    [[sample_stratified_hash]]'s filtering.

    Like the other sampling ops, repetition is a pure function of the
    document key (salted 'mix:' hash, independent of the sample/split
    hashes), so the blended corpus is identical on any layout. At scale
    the expansion is explode(sequence(1, copies)) — a stateless
    flatMap, no shuffle; this query reports the per-source blend totals
    (sum(copies) ≡ the exploded row count, cheaper to verify).
    """
    blended = sampling.weighted_upsample_copies(
        table(spark, sf_dir, "documents"),
        weights=_MIX_WEIGHTS, default_weight=1.0, salt="mix:",
    )
    return blended.groupBy("source").agg(
        F.count("*").alias("n_docs_in"),
        F.sum("copies").cast("long").alias("n_docs_out"),
        F.sum(F.col("copies") * F.col("n_chars")).cast("long").alias("chars_out"),
    )


@register(
    "diag_key_skew_profile",
    oracle="""
    WITH sizes AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS group_sz
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(min(group_sz) AS BIGINT) AS min_sz,
           CAST(max(group_sz) AS BIGINT) AS max_sz,
           CAST(sum(group_sz) AS BIGINT) AS n_rows,
           (floor(quantile_cont(group_sz, 0.50) * 100 + 0.5) / 100) AS p50_sz,
           (floor(quantile_cont(group_sz, 0.99) * 100 + 0.5) / 100) AS p99_sz
    FROM sizes
    """,
    tags=("SKEW", "A13"),
)
def diag_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profiler for join/agg planning: group-size min,
    max, exact interpolated p50/p99 over l_partkey — the diagnostic that
    decides whether a key needs salting (operators/skew) or AQE's skew
    join can handle it. Two aggregations: the fact-scale groupBy, then a
    single-partition reduce over the (already tiny) per-key sizes.
    """
    li = table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_partkey").agg(F.count("*").alias("group_sz"))
    return sizes.agg(
        F.count("*").alias("n_keys"),
        F.min("group_sz").alias("min_sz"),
        F.max("group_sz").alias("max_sz"),
        F.sum("group_sz").alias("n_rows"),
        rfix(F.expr("percentile(group_sz, 0.50)")).alias("p50_sz"),
        rfix(F.expr("percentile(group_sz, 0.99)")).alias("p99_sz"),
    )


# ---------------------------------------------------------------------------
# Chunking, filtering, clustering — the downstream corpus-prep stages
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 16, 12  # tokens per chunk / sliding stride (4-token overlap)


@register(
    "text_chunk_sliding",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), {_STRIDE})) AS start
          FROM t)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(start // {_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(toks, start + 1, start + {_CHUNK})) AS BIGINT)
               AS n_tokens,
           md5(array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' '))
               AS chunk_hash
    FROM s
    """,
    tags=("TEXT", "CHUNK"),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 16-token chunks every 12 tokens
    (4-token overlap) — the standard pre-embedding / pre-tokenization split
    for long documents.

    Pure stateless row expansion: sequence() builds the chunk starts,
    explode() flattens, slice() cuts each window — a flatMap with NO
    shuffle, so at 100 TB it streams through executors at scan speed and
    parallelism is inherited from the input partitioning. Chunk text is
    emitted as md5 so the verified payload stays narrow.
    """
    return textops.chunk_sliding(
        table(spark, sf_dir, "documents"), chunk=_CHUNK, stride=_STRIDE
    )


@register(
    "text_top_token_repetition",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
    m AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
                 CAST(sum(c) AS BIGINT) AS n_tokens
          FROM cnt GROUP BY doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, top_cnt, n_tokens,
           {rfix_sql('top_cnt::DOUBLE / n_tokens', 4)} AS top_ratio,
           (top_cnt::DOUBLE / n_tokens > 0.2) AS repetitive
    FROM m
    """,
    tags=("TEXT", "FILTER"),
)
def text_top_token_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition detector (Gopher-style): the most frequent
    token's share of the document; > 20% flags boilerplate/spam.

    Explode → two-level aggregation. The (doc_id, token) count partially
    aggregates map-side, and because the second groupBy's key (doc_id) is a
    prefix of the first's, Catalyst reuses the same hash partitioning — the
    doc-level max/sum needs no second exchange. Scale cost is one shuffle
    of the distinct (doc, token) pairs, never the raw token stream.
    """
    return textops.token_repetition(
        table(spark, sf_dir, "documents"), threshold=0.2
    )


@register(
    "text_quality_filter_stats",
    oracle=f"""
    WITH t AS (SELECT source, n_chars, {_TOKS} AS toks FROM documents),
    m AS (SELECT source, n_chars,
                 len(toks) AS n,
                 len(list_distinct(toks))::DOUBLE / len(toks) AS uniq_ratio,
                 {T.marker_count_sql('toks', T.STOPWORDS)}::DOUBLE / len(toks)
                     AS stop_ratio
          FROM t),
    v AS (SELECT source, n_chars,
                 CASE WHEN n < 15 THEN 'too_short'
                      WHEN uniq_ratio < 0.35 THEN 'low_diversity'
                      WHEN stop_ratio < 0.01 THEN 'no_stopwords'
                      ELSE 'keep' END AS verdict
          FROM m)
    SELECT source, verdict,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM v GROUP BY source, verdict
    """,
    tags=("TEXT", "FILTER"),
)
def text_quality_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality-filter pipeline: per-document keep/drop
    verdict (first failing rule wins — length, lexical diversity, stopword
    presence) rolled up to corpus yield per (source, verdict).

    The per-doc verdict is a pure row expression (higher-order functions,
    no shuffle); the rollup is one map-side-combined aggregation over a
    handful of groups. This is the triage report a 100 TB cleaning run
    produces before committing to the filtered write — the same verdict
    column, kept per-row, IS the filter predicate downstream.
    """
    d = table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    m = d.select(
        "source",
        "n_chars",
        F.size(toks).alias("n"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
        (T.marker_count(toks, T.STOPWORDS).cast("double") / F.size(toks)).alias(
            "stop_ratio"
        ),
    )
    verdict = (
        F.when(F.col("n") < 15, "too_short")
        .when(F.col("uniq_ratio") < 0.35, "low_diversity")
        .when(F.col("stop_ratio") < 0.01, "no_stopwords")
        .otherwise("keep")
    )
    return (
        m.select("source", "n_chars", verdict.alias("verdict"))
        .groupBy("source", "verdict")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


_KMEANS_K = 8


def _kmeans_oracle() -> str:
    return f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS c
        FROM embeddings WHERE vec_id < {_KMEANS_K}
    ),
    d AS (
        SELECT e.vec_id, cents.cid,
               list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
               + list_inner_product(cents.c, cents.c)
               - 2 * list_inner_product(e.embedding::DOUBLE[], cents.c) AS d2
        FROM embeddings e CROSS JOIN cents
    ),
    a AS (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           {rfix_sql('avg(sqrt(greatest(d2, 0)))', 4)} AS mean_dist
    FROM a WHERE rn = 1
    GROUP BY cid
    """


@register("emb_kmeans_assign_stats", oracle=_kmeans_oracle(), tags=("EMB", "CLUSTER"))
def emb_kmeans_assign_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step of k-means over the embedding column:
    deterministic seed centroids (the first K vectors by vec_id), every
    vector assigned to its nearest centroid (squared-L2 via the
    three-inner-product identity, ties broken on centroid id), per-cluster
    membership and mean distance.

    The K centroids are collected driver-side (K rows — the legitimate
    collect) and inlined as literals, so assignment is a stateless row
    expression: array_min over K (d2, cid) structs picks the argmin with NO
    join and NO per-vector window. One shuffle total (the K-group rollup).
    At 100 TB this is exactly the iteration body you'd repeat: broadcast
    centroids in, partial-aggregated (sum, count) per cluster out.

    Both engines accumulate dot products left-to-right over doubles, so d2
    agrees bitwise and the argmin is stable cross-engine.
    """
    e = table(spark, sf_dir, "embeddings")
    cents = sorted(
        e.filter(F.col("vec_id") < _KMEANS_K)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("c"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not cents:
        # zero seed vectors (empty/pruned input): no clusters is the
        # well-defined degenerate result — matches the oracle's empty set
        # and keeps array_min(array()) (VOID) out of the analyzer
        return spark.createDataFrame(
            [], "cluster_id LONG, n_members BIGINT, mean_dist DOUBLE"
        )
    # Centroid dot products as single parsed expressions: composing 8×64
    # literal Columns costs ~500 py4j round trips at plan build (the same
    # driver-side latency fixed in _srp_bucket_col); one expr string per
    # centroid keeps construction O(K) calls with identical fold semantics.
    self_dot = F.expr(
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
        "CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )
    choices = []
    for r in cents:
        arr = ", ".join(f"{float(x)!r}D" for x in r.c)
        dot_c = F.expr(
            f"aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
            f"array({arr}), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
        c2 = 0.0
        for x in r.c:  # same left-to-right double fold as both engines
            c2 += x * x
        d2 = self_dot + F.lit(c2) - 2 * dot_c
        choices.append(F.struct(d2.alias("d2"), F.lit(int(r.vec_id)).alias("cid")))
    best = F.array_min(F.array(*choices))
    assigned = e.select(
        best["cid"].cast("long").alias("cluster_id"),
        F.sqrt(F.greatest(best["d2"], F.lit(0.0))).alias("dist"),
    )
    return assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        rfix(F.avg("dist"), 4).alias("mean_dist"),
    )


@register(
    "dedup_cross_split_contamination",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks,
               {hashing.md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
                   AS slot
        FROM documents
    ),
    train_sh AS (
        SELECT DISTINCT {hashing.md5_long_sql('sh')} AS h
        FROM (SELECT unnest({T.shingles_sql('toks', 3)}) AS sh
              FROM d WHERE slot < 90)
    ),
    test_sh AS (
        SELECT DISTINCT doc_id, {hashing.md5_long_sql('sh')} AS h
        FROM (SELECT doc_id, unnest({T.shingles_sql('toks', 3)}) AS sh
              FROM d WHERE slot >= 95)
    )
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(train_sh.h) AS BIGINT) AS n_overlap,
           {rfix_sql('count(train_sh.h)::DOUBLE / count(*)', 4)} AS overlap_ratio,
           (count(train_sh.h) > 0) AS contaminated
    FROM test_sh t LEFT JOIN train_sh ON t.h = train_sh.h
    GROUP BY t.doc_id
    """,
    tags=("DEDUP", "SPLIT"),
)
def dedup_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test contamination scan: for every test-split document, the
    fraction of its distinct 3-token shingles that also occur anywhere in
    the train split — the decontamination pass run before an eval set is
    trusted (n-gram overlap, the standard benchmark-leakage check).

    Splits reuse the keyed-hash slots of split_train_val_test, so the scan
    needs no split table. Shingles travel as 60-bit md5 keys (16 bytes of
    string → 8 bytes), and both sides deduplicate BEFORE the join — the
    shuffle carries distinct (doc, shingle) pairs, never the raw shingle
    stream. The join keys on the shingle hash: at 100 TB that is the flat
    uniform key a shuffle wants (no skew: identical shingles collapsed
    pre-join on both sides; the test side keeps per-doc multiplicity only
    at distinct-(doc,shingle) grain). Documents shorter than 3 tokens have
    no shingles and drop out — by construction they cannot leak n-grams.
    """
    d = table(spark, sf_dir, "documents")
    slot = (
        hashing.md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % 100
    )
    base = d.select("doc_id", T.tokens("text").alias("toks"), slot.alias("slot"))
    sh = F.explode(T.shingles(F.col("toks"), 3)).alias("sh")
    train_sh = (
        base.filter(F.col("slot") < 90)
        .select(sh)
        .select(hashing.md5_long(F.col("sh")).alias("h"))
        .distinct()
        .withColumn("mark", F.lit(1))
    )
    test_sh = (
        base.filter(F.col("slot") >= 95)
        .select("doc_id", sh)
        .select("doc_id", hashing.md5_long(F.col("sh")).alias("h"))
        .distinct()
    )
    joined = test_sh.join(train_sh, "h", "left")
    return joined.groupBy(F.col("doc_id").cast("long").alias("doc_id")).agg(
        F.count("*").alias("n_shingles"),
        F.count("mark").alias("n_overlap"),
        rfix(F.count("mark").cast("double") / F.count("*"), 4).alias("overlap_ratio"),
        (F.count("mark") > 0).alias("contaminated"),
    )


@register(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS tok FROM documents),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS c FROM tok
            GROUP BY tok ORDER BY c DESC, tok LIMIT 100
        )
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           {rfix_sql("sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)", 4)}
               AS oov_rate
    FROM tok LEFT JOIN vocab v USING (tok)
    GROUP BY source
    """,
    tags=("TEXT", "VOCAB"),
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus top-100
    vocabulary — the tokenizer-coverage diagnostic run before fixing a
    vocab/merges file: how much of each source's token stream falls
    outside the head of the distribution.

    The vocabulary is a deterministic top-k (count desc, term) built with
    one token-count exchange + TakeOrderedAndProject, then broadcast to
    the marking join — the fact-side token stream is never reshuffled for
    the lookup, and the per-source rollup partially aggregates map-side.
    At 100 TB the vocab stays a driver-bounded k rows, so the only
    fact-scale costs are the token-count shuffle and the final rollup.
    """
    return textops.oov_rate(
        table(spark, sf_dir, "documents"), group_col="source", vocab_k=100
    )


# Redaction denylist (stands in for a PII/unsafe-term lexicon; the synthetic
# corpus has no emails/SSNs, so the mechanism is exercised on real hits).
_DENYLIST = ("key", "hash", "token", "secret", "stream")


@register(
    "text_redaction_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    m AS (
        SELECT source,
               len(toks) AS n_tokens,
               len(list_filter(toks, x -> x IN
                   ({", ".join("'" + w + "'" for w in _DENYLIST)}))) AS n_hits,
               md5(array_to_string(list_transform(toks, x -> CASE
                   WHEN x IN ({", ".join("'" + w + "'" for w in _DENYLIST)})
                   THEN '[REDACTED]' ELSE x END), ' ')) AS redacted_hash
        FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_hits) AS BIGINT) AS n_redactions,
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_touched,
           CAST(count(DISTINCT redacted_hash) AS BIGINT) AS distinct_redacted
    FROM m GROUP BY source
    """,
    tags=("TEXT", "FILTER"),
)
def text_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist redaction pass — every denylist token replaced with a
    [REDACTED] marker, reported as per-source hit counts plus the distinct
    count of post-redaction documents (the dedup-after-scrub effect: docs
    differing only in redacted terms collapse).

    The scrub is a pure row transform (higher-order token map, no UDF, no
    shuffle); at 100 TB it runs at scan speed and the redacted text would
    stream straight to the filtered write. A real deployment swaps the
    token lexicon for PII regexes (the same regexp_replace machinery as
    functions/text.normalize) — the plan shape is identical. The md5 of
    the redacted text keeps the verified payload narrow while still
    proving the transform output matches the oracle byte-for-byte.
    """
    m = textops.redact_tokens(
        table(spark, sf_dir, "documents"), denylist=_DENYLIST,
        marker="[REDACTED]",
    )
    return m.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_hits").cast("long").alias("n_redactions"),
        F.sum((F.col("n_hits") > 0).cast("long")).alias("docs_touched"),
        F.countDistinct("redacted_hash").alias("distinct_redacted"),
    )


def _semantic_clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
    ),
    cand AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {rfix_sql(V.cosine_sql('a.embedding', 'b.embedding'), 6)} >= 0.4
    ),
    edges AS (
        SELECT va AS src, vb AS dst FROM cand
        UNION SELECT vb, va FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, other) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT r.node, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.other
    ),
    lab AS (SELECT node, min(other) AS cluster_id FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM lab
              GROUP BY cluster_id)
    SELECT CAST(node AS BIGINT) AS vec_id,
           CAST(lab.cluster_id AS BIGINT) AS cluster_id,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM lab JOIN sizes USING (cluster_id)
    """


@register(
    "dedup_semantic_clusters",
    oracle=_semantic_clusters_oracle(),
    tags=("DEDUP", "EMB", "ITER"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC duplicate clusters: connected components over the
    embedding-cosine near-dup graph (threshold 0.4 on the canonicalized
    cosine) — the meaning-level counterpart of dedup_clusters' lexical
    (MinHash-verified) clustering, sharing the same min-label-propagation
    operator (operators/graph.min_label_components).

    In a production corpus pipeline the two run side by side: lexical CC
    collapses copies and near-copies, semantic CC collapses paraphrases
    and translations; keeping min vec_id per component is the same
    canonical-representative policy. Edge generation here reuses the
    bounded cosine-pair query; at open scale the edge source swaps to the
    LSH-bucketed candidate path (ann_lsh_bucket_topk's index) with the
    identical downstream closure.
    """
    pairs = dedup_embedding_cosine_pairs(spark, sf_dir).select("vec_a", "vec_b")
    # explode, not union-of-selects: the union's two branches each re-run
    # the full celled cosine-pair subtree (measured 13s -> 7s at sf0.01)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")),
                F.struct(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    labels = min_label_components(edges)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("cluster_id"),
        "cluster_size",
    )


@register(
    "emb_quantize_int8_stats",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (
        SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, e, scale,
               list_transform(e, x -> floor(x / scale + 0.5)) AS qv
        FROM s
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           {rfix_sql('scale', 6)} AS scale,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           {rfix_sql("sqrt(greatest(list_inner_product(e, e)"
                     " + scale * scale * list_inner_product(qv, qv)"
                     " - 2 * scale * list_inner_product(e, qv), 0))", 4)}
               AS q_err
    FROM q
    """,
    tags=("EMB", "UDF"),
)
def emb_quantize_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column through an
    Arrow-batched ``mapInPandas`` kernel — the vector-compression pass an
    ANN index build runs before storage (4x size cut), exercised under
    the full oracle gate: per-vector scale (absmax/127), quantized-value
    checksum, and the L2 reconstruction error.

    Reproducibility contract: every float op is either elementwise
    (abs, max, divide, floor half-up — bit-identical on any IEEE engine)
    or a SEQUENTIAL left-to-right dot-product fold, with the error
    derived from the same three-inner-product identity the k-means and
    cosine operators use — so the Python kernel and the SQL oracle agree
    bitwise before the presentation rounding. The kernel is a stateless
    mapInPandas (no shuffle, no group state): at 100 TB it streams
    batches at scan speed, and the quantized bytes would be written
    alongside the scale as the index payload. Zero vectors would yield a
    zero scale (divide-by-zero); the corpus has none and a production
    kernel would clamp.
    """
    from collections.abc import Iterator

    import pandas as pd

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def quantize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += x * y
            return acc

        import math

        for pdf in batches:
            rows = []
            for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
                v = [float(x) for x in vec]
                scale = max(abs(x) for x in v) / 127.0
                qv = [math.floor(x / scale + 0.5) for x in v]
                err2 = (
                    dot(v, v)
                    + scale * scale * dot(qv, qv)
                    - 2 * scale * dot(v, qv)
                )
                rows.append(
                    (
                        int(vid),
                        math.floor(scale * 1e6 + 0.5) / 1e6,
                        int(sum(qv)),
                        math.floor(math.sqrt(max(err2, 0.0)) * 1e4 + 0.5) / 1e4,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["vec_id", "scale", "q_sum", "q_err"]
            )

    return e.mapInPandas(
        quantize, "vec_id long, scale double, q_sum long, q_err double"
    )


# ---------------------------------------------------------------------------
# Dedup action + sequence packing (round 3 additions)
# ---------------------------------------------------------------------------

def _keep_canonical_oracle() -> str:
    """Clusters closure (same recursive CTEs as dedup_clusters) + canonical
    representative per cluster: longest doc wins, ties to the lowest id."""
    return f"""
    WITH RECURSIVE cand AS ({_minhash_verified_oracle()}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cand
        UNION SELECT doc_b, doc_a FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, other) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other
    ),
    cl AS (SELECT node AS doc_id, min(other) AS cluster_id FROM reach GROUP BY node),
    j AS (
        SELECT cl.cluster_id, cl.doc_id, d.n_chars
        FROM cl JOIN documents d ON d.doc_id = cl.doc_id
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY n_chars DESC, doc_id) AS rk
        FROM j
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS kept_doc_id,
           CAST(max(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT) AS kept_n_chars,
           CAST(count(*) - 1 AS BIGINT) AS dropped_cnt
    FROM r GROUP BY cluster_id
    """


@register("dedup_keep_canonical", oracle=_keep_canonical_oracle(), tags=("DEDUP", "W1"))
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION: given near-dup clusters (dedup_clusters), keep one
    canonical representative per cluster — the longest document, ties broken
    to the lowest doc_id — and report what each cluster dropped. Singleton
    docs never enter a cluster and survive untouched by construction.

    Scale shape: clusters are node-labelled by the distributed min-label
    propagation (no driver data); representative selection is one window
    pass partitioned on cluster_id (the same key the labels already carry);
    the documents join brings only (doc_id, n_chars) — two narrow shuffles
    beyond the clustering itself, independent of document payload size.
    Reference analog: none (the reference never deduplicates content;
    SURVEY §2 extension for the training-data pipeline).
    """
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = clusters.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    r = j.withColumn("rk", F.row_number().over(w))
    return (
        r.groupBy(F.col("cluster_id").cast("long").alias("cluster_id"))
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).cast("long").alias("kept_doc_id"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).cast("long").alias("kept_n_chars"),
            (F.count("*") - 1).cast("long").alias("dropped_cnt"),
        )
    )


# Sequence-packing bin capacity (tokens) and stream-shard count.
PACK_BIN_TOKENS = 2048
PACK_SLOTS = 8


@register(
    "text_pack_bins",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {hashing.md5_long_sql("'pack:' || CAST(doc_id AS VARCHAR)")} % {PACK_SLOTS} AS slot,
               len({_TOKS}) AS n_tokens
        FROM documents
    ), c AS (
        SELECT slot, doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY slot ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
        FROM t
    )
    SELECT CAST(slot AS BIGINT) AS slot,
           CAST(cum_excl // {PACK_BIN_TOKENS} AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_used
    FROM c GROUP BY slot, cum_excl // {PACK_BIN_TOKENS}
    """,
    tags=("PACK", "W3"),
)
def text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (concat-and-chunk): assign each document to a
    training bin of ~{PACK_BIN_TOKENS} tokens by its running token offset —
    the batch-construction step between a cleaned corpus and a trainer.

    Documents are sharded into deterministic hash-slot streams (a pure
    function of doc_id: reproducible on any cluster layout, like every
    sampling op here), ordered stably within the stream, and a doc starts
    the bin its exclusive cumulative token count falls in. One shuffle on
    the slot key feeds both the window pass and the (slot, bin) rollup —
    at 100 TB each stream packs independently and in parallel, and adding
    streams (PACK_SLOTS) scales packing throughput with zero coordination.
    Reference analog: none (SURVEY §2 extension).
    """
    d = table(spark, sf_dir, "documents")
    sized = d.select("doc_id", F.size(T.tokens("text")).alias("n_tokens"))
    assign = textops.pack_bins(
        sized, id_col="doc_id", size_col="n_tokens",
        bin_tokens=PACK_BIN_TOKENS, slots=PACK_SLOTS, salt="pack:",
    )
    return assign.groupBy("slot", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_used"),
    )


def _kmeans_update_oracle() -> str:
    """Assignment (same CTEs as _kmeans_oracle) + dimension-wise centroid
    recomputation and per-cluster norm/shift digests."""
    return f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS c
        FROM embeddings WHERE vec_id < {_KMEANS_K}
    ),
    d AS (
        SELECT e.vec_id, cents.cid,
               list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
               + list_inner_product(cents.c, cents.c)
               - 2 * list_inner_product(e.embedding::DOUBLE[], cents.c) AS d2
        FROM embeddings e CROSS JOIN cents
    ),
    a AS (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d
    ),
    assigned AS (SELECT vec_id, cid FROM a WHERE rn = 1),
    dims AS (
        SELECT ass.cid, idx.i, (e.embedding::DOUBLE[])[idx.i] AS x
        FROM assigned ass
        JOIN embeddings e ON e.vec_id = ass.vec_id,
             (SELECT unnest(range(1, 4097)) AS i) idx
        WHERE idx.i <= len(e.embedding)
    ),
    means AS (SELECT cid, i, avg(x) AS m FROM dims GROUP BY cid, i),
    seedd AS (
        SELECT cid, idx.i, c[idx.i] AS s
        FROM cents, (SELECT unnest(range(1, 4097)) AS i) idx
        WHERE idx.i <= len(c)
    ),
    stats AS (
        SELECT m.cid,
               sqrt(sum(m.m * m.m)) AS nrm,
               sqrt(sum((m.m - s.s) * (m.m - s.s))) AS shift
        FROM means m JOIN seedd s ON s.cid = m.cid AND s.i = m.i
        GROUP BY m.cid
    ),
    counts AS (SELECT cid, count(*) AS n FROM assigned GROUP BY cid)
    SELECT CAST(stats.cid AS BIGINT) AS cluster_id,
           CAST(counts.n AS BIGINT) AS n_members,
           {rfix_sql('nrm', 4)} AS centroid_norm,
           {rfix_sql('shift', 4)} AS centroid_shift
    FROM stats JOIN counts ON counts.cid = stats.cid
    """


@register("emb_kmeans_update_step", oracle=_kmeans_update_oracle(), tags=("EMB", "CLUSTER", "ITER"))
def emb_kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A FULL Lloyd iteration: nearest-centroid assignment (same literal-
    centroid argmin as emb_kmeans_assign_stats) followed by dimension-wise
    centroid recomputation, digested per cluster as (n_members, new-centroid
    L2 norm, L2 shift from the seed centroid).

    The recomputation is the distributed pattern the assignment docstring
    promises for the iteration body: posexplode the assigned vectors to
    (cluster, dim, value) rows, average per (cluster, dim) with map-side
    partial aggregation, then roll the K×dim means up per cluster — one
    shuffle keyed (cluster, dim) whose cardinality is K·dim regardless of
    corpus size, plus a broadcast of the K seed centroids for the shift.
    Scalar digests (not array cells) keep the result canonicalizable by
    the harness sort.
    """
    e = table(spark, sf_dir, "embeddings")
    cents = sorted(
        e.filter(F.col("vec_id") < _KMEANS_K)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("c"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not cents:
        # same degenerate contract as emb_kmeans_assign_stats
        return spark.createDataFrame(
            [],
            "cluster_id LONG, n_members BIGINT, centroid_norm DOUBLE, "
            "centroid_shift DOUBLE",
        )
    self_dot = F.expr(
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
        "CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )
    choices = []
    for r in cents:
        arr = ", ".join(f"{float(x)!r}D" for x in r.c)
        dot_c = F.expr(
            f"aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
            f"array({arr}), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
        c2 = 0.0
        for x in r.c:
            c2 += x * x
        d2 = self_dot + F.lit(c2) - 2 * dot_c
        choices.append(F.struct(d2.alias("d2"), F.lit(int(r.vec_id)).alias("cid")))
    best = F.array_min(F.array(*choices))
    assigned = e.select(
        best["cid"].cast("long").alias("cluster_id"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    dims = assigned.select("cluster_id", F.posexplode("emb").alias("i", "x"))
    means = dims.groupBy("cluster_id", "i").agg(F.avg("x").alias("m"))
    seed_rows = [
        (int(r.vec_id), i, float(x)) for r in cents for i, x in enumerate(r.c)
    ]
    seed_df = F.broadcast(
        spark.createDataFrame(seed_rows, "cluster_id LONG, i INT, s DOUBLE")
    )
    stats = (
        means.join(seed_df, ["cluster_id", "i"])
        .groupBy("cluster_id")
        .agg(
            F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("nrm"),
            F.sqrt(F.sum((F.col("m") - F.col("s")) * (F.col("m") - F.col("s")))).alias(
                "shift"
            ),
        )
    )
    counts = assigned.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    return stats.join(counts, "cluster_id").select(
        "cluster_id",
        "n_members",
        rfix("nrm", 4).alias("centroid_norm"),
        rfix("shift", 4).alias("centroid_shift"),
    )


@register(
    "diag_join_size_profile",
    oracle=f"""
    WITH a AS (SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY o_orderkey),
    b AS (SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY l_orderkey),
    j AS (SELECT a.k, a.ca * b.cb AS prod FROM a JOIN b ON b.k = a.k)
    SELECT CAST(count(*) AS BIGINT) AS n_join_keys,
           CAST(sum(prod) AS BIGINT) AS join_rows,
           CAST(max(prod) AS BIGINT) AS max_key_rows,
           {rfix_sql('sum(prod) / count(*)')} AS mean_key_rows
    FROM j
    """,
    tags=("SKEW", "DIAG", "J1"),
)
def diag_join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size profiler: the exact output cardinality of orders⋈lineitem
    on orderkey, plus the hottest key's contribution — computed WITHOUT
    running the join on full rows. |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), so two
    key-count aggregations and a count-sized join answer "how big is this
    join and does one key dominate it" before you commit a cluster to the
    real thing. Companion to diag_key_skew_profile: that one sizes groups
    on ONE side, this one sizes the joint blow-up.

    At 100 TB the count tables are |distinct keys| rows (tiny next to the
    facts), both aggregations are map-side partial, and the profile join
    shares the facts' natural key partitioning — strictly cheaper than the
    join it models. Reference analog: none (the reference never plans;
    SURVEY §4 notes its engines own physical strategy).
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    a = o.groupBy(F.col("o_orderkey").alias("k")).agg(F.count("*").alias("ca"))
    b = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count("*").alias("cb"))
    j = a.join(b, "k").select((F.col("ca") * F.col("cb")).alias("prod"))
    return j.agg(
        F.count("*").alias("n_join_keys"),
        F.sum("prod").cast("long").alias("join_rows"),
        F.max("prod").cast("long").alias("max_key_rows"),
        rfix(F.sum("prod") / F.count("*")).alias("mean_key_rows"),
    )


_WSAMPLE_K = 50
# md5_long yields 60-bit uniforms; +1 / (2^60 + 1) maps into the OPEN
# interval (0, 1) so ln(u) is always finite.
_WSAMPLE_DENOM = float((1 << 60) + 1)


@register(
    "sample_weighted_topk",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln(({hashing.md5_long_sql("'wrs:' || CAST(doc_id AS VARCHAR)")} + 1)
                  / {_WSAMPLE_DENOM!r}) / n_chars AS k
        FROM documents
        WHERE n_chars > 0
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT) AS rank
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {_WSAMPLE_K}
    """,
    tags=("SAMPLE", "O3"),
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each doc gets key ln(u)/w with u a deterministic hash-uniform and
    w = n_chars; the k largest keys are a weighted sample — longer docs
    proportionally more likely, yet the draw is a pure function of the
    data (reproducible on any cluster layout, same rows in the oracle).

    Scale shape: the key is a stateless row expression over the scan and
    the top-k is TakeOrderedAndProject — O(k) per partition then on the
    driver, never a global sort. This is the weighted counterpart of
    sample_stratified_hash's percentage slots; together they cover the
    corpus-mixing policies a training pipeline draws with.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    # library top-k FIRST (TakeOrderedAndProject, O(k) per partition), THEN
    # rank the k survivors — a global row_number window over the full corpus
    # would be a single-partition scan at scale.
    topk = sampling.weighted_topk(
        base, id_col="doc_id", weight_col="n_chars", k=_WSAMPLE_K,
        salt="wrs:", key_col="k",
    )
    w = Window.orderBy(F.desc("k"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).drop("k")


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation/symbol runs —
# the split a byte-pair tokenizer applies BEFORE merges (the engine-portable
# core of the GPT-2 pattern, minus lookahead, which RE2 oracles lack).
_BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


@register(
    "text_token_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {_TOKS} AS ws,
               regexp_extract_all(text, '{_BPE_PATTERN}') AS bpe
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(ws) AS BIGINT) AS n_ws_tokens,
           CAST(len(bpe) AS BIGINT) AS n_bpe_pretokens,
           CAST(len(list_filter(bpe, x -> x ~ '^[0-9]+$')) AS BIGINT)
               AS n_digit_runs,
           {rfix_sql("list_aggregate(list_transform(bpe, x -> length(x)), 'sum')::DOUBLE / len(bpe)", 4)}
               AS chars_per_pretoken
    FROM t
    WHERE len(bpe) > 0
    """,
    tags=("TEXT", "F6"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace split and a BPE-ish pre-token
    regex (letter/digit/symbol runs) — plus digit-run count and mean
    pre-token length: the per-document token-budget accounting a training
    pipeline runs before packing/pricing a corpus. Reference has no token
    surface at all (review text only ever hits LIKE filters,
    webapp/mysql_routes.py:619-626); this is north-star LLM-ops surface.

    Scale shape: stateless per-row expressions over the scan (regexp +
    higher-order aggregate, all JVM-side, zero shuffles) — the ideal
    100 TB operator.
    """
    d = spread(table(spark, sf_dir, "documents"))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0))
    out = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(T.tokens("text")).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_pretokens"),
        F.size(F.filter(bpe, lambda x: x.rlike(r"^[0-9]+$")))
        .cast("long")
        .alias("n_digit_runs"),
        rfix(
            F.aggregate(
                bpe, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            ).cast("double")
            / F.size(bpe),
            4,
        ).alias("chars_per_pretoken"),
    )
    return out.filter(F.col("n_bpe_pretokens") > 0)


_DUP_SHINGLE_K = 8


@register(
    "text_dup_shingle_coverage",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    ds AS (
        SELECT DISTINCT doc_id, source,
               {hashing.md5_long_sql('sh')} AS h
        FROM (
            SELECT doc_id, source,
                   unnest({T.shingles_sql('toks', _DUP_SHINGLE_K)}) AS sh
            FROM base
        )
    ),
    df AS (
        SELECT h, count(DISTINCT doc_id) AS docfreq FROM ds GROUP BY h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN docfreq > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_shingles,
           {rfix_sql("sum(CASE WHEN docfreq > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)", 4)}
               AS dup_fraction
    FROM ds JOIN df USING (h)
    GROUP BY source
    """,
    tags=("TEXT", "DEDUP"),
)
def text_dup_shingle_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-text coverage per source: the fraction of each source's
    distinct (doc, 8-gram shingle) instances whose shingle also occurs in
    ANOTHER document — the corpus-level duplication metric used to rank
    sources for dedup priority (the within-corpus analog of the
    cross-split contamination scan, which this reuses machinery from).

    Scale shape: shingles travel as 60-bit md5 keys and are deduplicated
    to distinct-(doc, shingle) grain with map-side partial aggregation;
    docfreq is a count window over the flat uniform key h (rows are
    unique per (doc, h) after the distinct, so count(*) = distinct docs —
    no groupBy+join-back round trip), then one aggregate per source.
    Three shuffles total, each over compacted data; no skew — identical
    shingles collapse before any exchange carries them.
    """
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    sh = F.explode(
        T.shingles(T.tokens("text"), _DUP_SHINGLE_K)
    ).alias("sh")
    ds = (
        d.select("doc_id", "source", sh)
        .select("doc_id", "source", hashing.md5_long(F.col("sh")).alias("h"))
        .distinct()
    )
    with_df = ds.withColumn("docfreq", F.count("*").over(Window.partitionBy("h")))
    dup = F.sum(F.when(F.col("docfreq") > 1, 1).otherwise(0))
    return with_df.groupBy("source").agg(
        F.count("*").alias("n_shingles"),
        dup.cast("long").alias("n_dup_shingles"),
        rfix(dup.cast("double") / F.count("*"), 4).alias("dup_fraction"),
    )


_MIX_ALPHA = 0.7


@register(
    "sample_temperature_mix",
    oracle=f"""
    WITH counts AS (
        SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
    ),
    tot AS (
        SELECT sum(n_docs)::DOUBLE AS total,
               sum(pow(n_docs::DOUBLE, {_MIX_ALPHA})) AS pow_total
        FROM counts
    )
    SELECT source, n_docs,
           {rfix_sql(f"pow(n_docs::DOUBLE, {_MIX_ALPHA}) / pow_total", 6)} AS mix_weight,
           {rfix_sql(f"(pow(n_docs::DOUBLE, {_MIX_ALPHA}) / pow_total) / (n_docs::DOUBLE / total)", 4)} AS boost
    FROM counts, tot
    """,
    tags=("SAMPLE",),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing weights (alpha = 0.7): each
    source's sampling weight is proportional to n_docs^alpha, the standard
    up-weighting of low-resource sources when composing a multi-source /
    multilingual training mix; `boost` is the ratio to natural
    proportion (> 1 for small sources, < 1 for large).

    Scale shape: one count aggregate (source-cardinality rows), then a
    broadcast 1-row crossJoin for the two normalizers — the same
    "tiny aggregate joined back" pattern as tf-idf's corpus size. The
    per-source math is stateless row expressions; nothing scales with
    corpus size except the initial count.
    """
    return sampling.temperature_mix(
        table(spark, sf_dir, "documents"), group_col="source", alpha=_MIX_ALPHA
    )


_ZIPF_TOP = 1000


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH tf AS (
        SELECT tok, count(*)::BIGINT AS cnt
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok ORDER BY cnt DESC, tok LIMIT {_ZIPF_TOP}
    ),
    ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, tok) AS rank
        FROM tf
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           {rfix_sql('regr_slope(ln(cnt), ln(rank))', 4)} AS zipf_slope,
           {rfix_sql('regr_intercept(ln(cnt), ln(rank))', 4)} AS zipf_intercept,
           {rfix_sql('regr_r2(ln(cnt), ln(rank))', 4)} AS fit_r2
    FROM ranked
    """,
    tags=("TEXT", "STATS"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: least-squares
    slope/intercept/R² of ln(freq) on ln(rank) over the top terms — the
    corpus-statistics diagnostic run before sizing a tokenizer vocabulary
    (a natural corpus fits slope ≈ -1; this synthetic vocab-uniform corpus
    fits a shallow slope, which is itself the diagnostic). Uses Spark's
    built-in linear-regression aggregates (regr_slope & co., one-pass
    mergeable moments, identical estimator in DuckDB).

    Scale shape: one shuffle for term counts (map-side partial), then
    TakeOrderedAndProject to the top-{_ZIPF_TOP} — the global rank window
    and the regression aggregate both run over only those k rows, so the
    single-partition window is O(k) by construction, never a full sort.
    """
    return textops.zipf_fit(table(spark, sf_dir, "documents"), top_k=_ZIPF_TOP)


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
    ),
    tf AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
    tot AS (SELECT sum(cnt) AS n FROM tf)
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           {rfix_sql('avg(ln(tf.cnt / tot.n))', 3)} AS avg_logprob
    FROM toks t JOIN tf ON t.w = tf.w CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    tags=("LLM-quality", "A3", "J1"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram log-probability under a language model
    estimated from the corpus itself — the classic perplexity-proxy
    quality signal (CCNet/KenLM-style filtering keeps documents whose
    tokens look like the corpus; gibberish and boilerplate score low).

    Plan shape at scale: explode → ONE exchange to build term frequencies
    (map-side combinable), corpus total as a broadcast 1-row crossJoin,
    tokens re-keyed on the term for the tf join (exchange on w, AQE
    handles stopword skew), then ONE exchange back to doc_id for the
    per-doc mean. No Python in the path; ln/avg stay in codegen.
    Reference analog: none (reference only LIKE-filters review text,
    webapp/mysql_routes.py:619-626); beyond-reference LLM-ops surface.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("w"),
    )
    tf = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    tot = tf.agg(F.sum("cnt").cast("double").alias("n"))
    scored = (
        toks.join(tf, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            rfix(F.avg(F.log(F.col("cnt") / F.col("n"))), 3).alias("avg_logprob"),
        )
    )
    return scored


@register(
    "sample_token_budget_fill",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
               {hashing.md5_long_sql("'budget:' || CAST(doc_id AS VARCHAR)")} AS pri
        FROM documents
    ),
    filled AS (
        SELECT source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
    FROM filled
    WHERE cum - n_tokens < 600
    GROUP BY source
    """,
    tags=("LLM-sampling", "W3", "A3"),
)
def sample_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-capped corpus fill: each source contributes documents
    (in a deterministic keyed-hash priority order) until its token budget
    is exhausted — the greedy allocation step of building a fixed-size
    training mixture ("take N billion tokens per source"), the budget
    counterpart of sample_temperature_mix's proportional weighting. The
    document that crosses the budget line is kept (standard greedy fill),
    so every source with data contributes at least one document.

    Deterministic and shuffle-minimal at scale: priority is a salted md5
    of doc_id (no RNG, stable under repartitioning); ONE exchange on
    source serves both the running-sum window and the final per-source
    rollup. Reference analog: none; beyond-reference LLM-ops surface.
    """
    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "source",
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias(
            "n_tokens"
        ),
    )
    kept = sampling.token_budget_fill(
        sized, id_col="doc_id", group_col="source", size_col="n_tokens",
        budget=600, salt="budget:",
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_kept"),
        F.sum("n_tokens").cast("long").alias("tokens_kept"),
    )


@register(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH base AS (
        SELECT source, doc_id,
               {_TOKS} AS toks,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp,
               {hashing.md5_long_sql("'curate:' || CAST(doc_id AS VARCHAR)")} AS pri
        FROM documents
    ),
    q AS (
        SELECT source, doc_id, fp, pri, len(toks) AS n_tokens
        FROM base
        WHERE len(toks) >= 15
          AND len(list_distinct(toks))::DOUBLE / len(toks) >= 0.35
          AND {T.marker_count_sql('toks', T.STOPWORDS)}::DOUBLE / len(toks) >= 0.01
    ),
    u AS (
        SELECT source, doc_id, pri, n_tokens,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM q
    ),
    uq AS (SELECT source, doc_id, pri, n_tokens FROM u WHERE rn = 1),
    b AS (
        SELECT source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM uq
    ),
    kept AS (SELECT source, n_tokens FROM b WHERE cum - n_tokens < 400),
    s_in AS (SELECT source, count(*) AS n_input FROM base GROUP BY source),
    s_q AS (SELECT source, count(*) AS n_quality FROM q GROUP BY source),
    s_u AS (SELECT source, count(*) AS n_unique FROM uq GROUP BY source),
    s_k AS (SELECT source, count(*) AS n_kept, sum(n_tokens) AS tokens_kept
            FROM kept GROUP BY source)
    SELECT s_in.source,
           CAST(n_input AS BIGINT) AS n_input,
           CAST(coalesce(n_quality, 0) AS BIGINT) AS n_quality,
           CAST(coalesce(n_unique, 0) AS BIGINT) AS n_unique,
           CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(tokens_kept, 0) AS BIGINT) AS tokens_kept
    FROM s_in
    LEFT JOIN s_q USING (source)
    LEFT JOIN s_u USING (source)
    LEFT JOIN s_k USING (source)
    """,
    tags=("LLM-pipeline", "FILTER", "DEDUP", "W3"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation funnel — the composition that a real
    training-data run executes as ONE job: Gopher-style quality gate
    (length / lexical diversity / stopword presence, same thresholds as
    text_quality_filter_stats) → exact dedup on the normalized-text
    fingerprint keeping the lowest doc_id (same canonicalization as
    dedup_exact_groups) → greedy per-source token-budget fill in salted-
    hash priority order (same mechanism as sample_token_budget_fill) —
    reported as a per-source yield funnel (input → quality → unique →
    budget-kept, plus surviving tokens). Each stage consumes the previous
    stage's DataFrame lazily; Catalyst fuses the row-level quality gate
    into the scan, so a dropped document costs one predicate evaluation
    and never reaches the dedup shuffle.

    Scale shape — the whole funnel is ONE pass with survivor FLAGS, not a
    tree of recomputed branches (a naive four-branch funnel re-ran the
    fingerprint window once per branch: 6 exchanges, 3 windows, 4 scans;
    this form is 2 exchanges, 2 windows, 1 scan): the quality gate is a
    row predicate; "unique" is a row_number over the fingerprint
    partition ORDERED QUALITY-FIRST, so rank 1 lands on the min-id
    quality survivor without filtering first; the budget running sum
    counts only unique-survivor tokens via a CASE inside the window; and
    the per-source rollup reuses the budget window's source partitioning
    (no third exchange). Reference analog: none; this is the north-star
    use the engine exists for.
    """
    flags = curation.curation_flags(
        table(spark, sf_dir, "documents"),
        min_tokens=15, min_uniq_ratio=0.35, min_stopword_ratio=0.01,
        budget=400, salt="curate:",
    )
    return curation.curation_funnel(flags, group_col="source")


@register(
    "emb_power_iteration_step",
    oracle=f"""
    WITH r AS (
        SELECT embedding::DOUBLE[] AS e,
               list_aggregate(embedding::DOUBLE[], 'sum')::DOUBLE AS rs
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
    """,
    tags=("EMB", "ITER", "A3"),
)
def emb_power_iteration_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the dominant eigenvector of the
    (uncentered) Gram matrix of the embedding corpus — the building block
    of distributed PCA / spectral embedding-drift monitoring: v_next ∝
    Aᵀ(A·v₀), started from the deterministic all-ones direction (whose
    1/√d scale cancels in the final normalization, so the plan never even
    multiplies by it).

    The distributed shape matters more than the algebra: each row
    contributes (x·v₀)·x, so the map side computes one dot product per
    vector and emits (dim, partial) pairs via posexplode — the ONLY
    exchange carries d values per partition (map-side combined), never a
    d×d matrix and never the vectors themselves. The normalizer is a
    broadcast 1-row crossJoin. Repeating this stage IS the 100 TB PCA
    loop (k dominant directions = k such passes with Gram-Schmidt between
    rounds). Iterative-linear-algebra companion to emb_kmeans_update_step.
    Reference analog: none; beyond-reference embedding-ops surface.
    """
    # Thin caller of operators/embeddings.power_iteration_step (r12
    # library extraction, phase 4; v0=None is the all-ones start).
    from ..operators import embeddings as emb_ops

    return emb_ops.power_iteration_step(
        table(spark, sf_dir, "embeddings"), "embedding", v0=None, digits=6,
    )


@register(
    "ann_recall_eval",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY {rfix_sql(V.cosine_sql('q.qe', 'e.embedding'), 6)} DESC,
                                e.vec_id) AS rn
            FROM q JOIN embeddings e ON e.vec_id <> q.query_id
        ) WHERE rn <= 10
    ),
    b AS (
        SELECT vec_id, CAST({_srp_bucket_sql('embedding', 4)} AS BIGINT) AS bucket
        FROM embeddings
    ),
    cand AS (
        SELECT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
        FROM b qb JOIN b nb ON nb.bucket = qb.bucket AND nb.vec_id <> qb.vec_id
        WHERE qb.vec_id < 5
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
    """,
    tags=("ANN", "LSH", "EVAL"),
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@10 of the SRP-LSH bucket index
    (ann_lsh_bucket_topk's candidate generator) against brute-force cosine
    ground truth (ann_topk_cosine's ranking), per query — the measurement
    loop every production ANN deployment runs before trading recall for
    candidate-set size (more planes → smaller buckets → lower recall).

    Scale shape: ground truth is exact ONLY over the bounded query panel
    (5 queries broadcast against the corpus — the standard eval protocol:
    recall is estimated on a sample, never all-pairs), while the candidate
    side is the same bucket-equality join the production query uses. The
    overlap join keys on (query_id, neighbor_id) — both sides are
    panel-bounded (≤ 10·|panel| truth rows, bucket-sized candidates), so
    the whole evaluation after candidate generation is broadcast-sized.
    Reference analog: none; beyond-reference ANN-ops surface.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cos = V.cosine(F.col("qe"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.desc("c6"), F.asc("neighbor_id"))
    truth = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            rfix(cos, 6).alias("c6"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
    )
    b = e.select("vec_id", _srp_bucket_col().alias("bucket"))
    qb = b.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    cand = (
        b.join(F.broadcast(qb), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    sizes = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    hits = (
        truth.join(cand.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("hits"))
    )
    # Left join + coalesce: a query whose bucket/cell holds no other
    # vector has no sizes row, but must still report n_candidates = 0
    # (the oracle's correlated COUNT keeps it).
    return hits.join(F.broadcast(sizes), "query_id", "left").select(
        F.col("query_id").cast("long").alias("query_id"),
        F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
        F.col("hits").cast("long").alias("hits"),
        rfix(F.col("hits") / F.lit(10.0), 4).alias("recall_at_10"),
    )


@register(
    "dedup_fuzzy_name_pairs",
    oracle="""
    SELECT CAST(a.c_custkey AS BIGINT) AS c_custkey,
           CAST(count(*) AS BIGINT) AS n_fuzzy_matches
    FROM customer a
    JOIN customer b
      ON a.c_custkey <> b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    GROUP BY a.c_custkey
    """,
    tags=("DEDUP", "FUZZY", "J5"),
)
def dedup_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match self-join (entity resolution): per customer, how many
    OTHER customers sit within edit distance 1 of its name — without ever
    comparing all pairs. Candidates come from deletion-neighborhood
    blocking (FastSS): every string is keyed by itself plus each of its
    single-character deletions; two strings within edit distance 1
    (substitute / insert / delete) provably share a key, so the equi-join
    on the variant finds every true pair and levenshtein verifies the
    survivors.

    The ORACLE is the brute-force O(n²) levenshtein join — the driver's
    hash check therefore proves the blocking is exactly equivalent to
    all-pairs, which is the entire point of the method: at 100 TB the
    engine's cost is |names|·(len+1) exploded keys through ONE exchange
    (candidate groups bounded by neighborhood collisions), while all-pairs
    is impossible. Same scale argument as the MinHash/SimHash family, for
    the edit-distance metric. Reference analog: none (reference matches
    names only with LIKE); beyond-reference entity-resolution surface.

    Candidates come from the j5/j6 basket shape rather than a self-join:
    one exchange of the variant rows keyed by the 8-byte xxhash64 of the
    deletion variant (a collision can only ADD a candidate, and every
    candidate is levenshtein-verified, so the result is unchanged while
    the shuffle carries fixed-width longs), per-key member baskets, then
    in-task ordered-pair expansion with the hot-key salted branch —
    replacing the join's second exchange + probe (measured 2.96s → 2.18s
    at sf0.1 on top of round 4's 11.5s → ~3s verify-before-distinct win).
    Verification stays BEFORE the distinct so the distinct's exchange
    sees only verified (x, y) long pairs; the threshold levenshtein form
    short-circuits the DP (returns -1 past the bound).
    """
    from .relational import _basket_pair_rows

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = F.expr(
        "transform(sequence(0, length(c_name)), i -> "
        "IF(i = 0, c_name, "
        "concat(substr(c_name, 1, i - 1), substr(c_name, i + 1, length(c_name)))))"
    )
    keyed = c.select(
        "c_custkey", "c_name", F.explode(F.array_distinct(variants)).alias("v")
    ).select("c_custkey", "c_name", F.xxhash64("v").alias("h"))
    baskets = keyed.groupBy("h").agg(
        F.array_sort(F.collect_set(F.struct("c_custkey", "c_name"))).alias("members")
    )
    # struct sort is (c_custkey, c_name)-lexicographic and custkeys are
    # unique, so pair order (i < j) ≡ the oracle's a.c_custkey < b.c_custkey
    pairs = (
        _basket_pair_rows(
            baskets, "members", "a", "b",
            256, spark.sparkContext.defaultParallelism,
        )
        .filter(F.levenshtein(F.col("p.a.c_name"), F.col("p.b.c_name"), 1) >= 0)
        .select(F.col("p.a.c_custkey").alias("x"), F.col("p.b.c_custkey").alias("y"))
        .distinct()
    )
    # r14 (guide §1.2): explode both endpoints from ONE pass over the
    # verified-distinct pairs — the unionAll form re-evaluated the whole
    # expansion + levenshtein + distinct subtree once per side (the
    # before-plan shows the distinct exchange twice and the customer scan
    # four times; with the basket pin + this explode it appears once).
    both = pairs.select(
        F.explode(F.array(F.col("x"), F.col("y"))).alias("c_custkey")
    )
    return both.groupBy(F.col("c_custkey").cast("long").alias("c_custkey")).agg(
        F.count("*").cast("long").alias("n_fuzzy_matches")
    )


# ---------------------------------------------------------------------------
# Tokenizer training / corpus-curation actions (round 4)
# ---------------------------------------------------------------------------

_BPE_TOP = 50


@register(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH tf AS (
        SELECT tok AS w, count(*)::BIGINT AS cnt
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok
    )
    SELECT pair,
           CAST(sum(cnt) AS BIGINT) AS pair_count,
           CAST(count(DISTINCT w) AS BIGINT) AS n_words
    FROM (
        SELECT substring(w, CAST(i AS INT), 2) AS pair, w, cnt
        FROM (
            SELECT w, cnt, unnest(range(1, length(w))) AS i
            FROM tf WHERE length(w) >= 2
        )
    )
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT {_BPE_TOP}
    """,
    tags=("TEXT", "TOKENIZER", "A10"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner step of BPE tokenizer training: count adjacent symbol
    pairs across the corpus, weighted by word frequency, and surface the
    top-{_BPE_TOP} merge candidates (at initialization the symbols are
    single characters, so pairs are 2-char substrings). A full BPE
    trainer repeats this count-and-merge step per vocab entry; this is
    the distributed primitive it iterates.

    Scale shape: word frequencies first (ONE map-side-combinable
    exchange over words — the corpus collapses to its vocabulary before
    any per-character work), then pair explosion runs over DISTINCT
    words only, so the second exchange carries O(vocab · word_len) rows
    regardless of corpus size. Top-k is TakeOrderedAndProject, no global
    sort. Reference analog: none (reference never tokenizes,
    webapp/mysql_routes.py:619-626); beyond-reference tokenizer surface.
    """
    d = spread(table(spark, sf_dir, "documents"))
    tf = (
        d.select(F.explode(T.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    pair_rows = tf.filter(F.length("w") >= 2).select(
        "w",
        "cnt",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pair_rows.groupBy("pair")
        .agg(
            F.sum("cnt").cast("long").alias("pair_count"),
            F.countDistinct("w").cast("long").alias("n_words"),
        )
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


_DOMAIN_CAP = 15


@register(
    "sample_domain_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_kept,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_kept
    FROM ranked
    GROUP BY source
    """,
    tags=("SAMPLE", "W1"),
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps: keep at most {_DOMAIN_CAP} documents per
    source, preferring the longest (ties broken by doc_id) — the standard
    anti-over-representation guard when a few domains dominate a web
    crawl (per-domain caps in C4/RefinedWeb-style curation). Reports per
    source how much the cap bites.

    Scale shape: ONE exchange on source + per-key sort for the rank
    window, then the aggregate reuses the same partitioning (no second
    exchange). A pathologically hot domain makes one partition sort-heavy;
    the mitigation at 100 TB is the same two-phase trick as o1's top-k —
    pre-prune per input partition to its local top-{_DOMAIN_CAP} before
    the exchange, which AQE cannot do automatically but
    diag_key_skew_profile flags when it is needed.
    """
    d = table(spark, sf_dir, "documents")
    ranked = sampling.domain_cap(
        d.select("source", "n_chars", "doc_id"),
        group_col="source", id_col="doc_id", order_col="n_chars",
        cap=_DOMAIN_CAP,
    )
    kept = F.when(F.col("rn") <= _DOMAIN_CAP, 1).otherwise(0)
    return ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(kept).cast("long").alias("docs_kept"),
        F.sum(F.col("n_chars") * kept).cast("long").alias("chars_kept"),
    )


_SPAN_K = 16


@register(
    "dedup_span_first_occurrence",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, {_TOKS} AS toks
        FROM documents WHERE len({_TOKS}) >= 1
    ),
    spans AS (
        SELECT DISTINCT doc_id, source,
               {hashing.md5_long_sql(f"array_to_string(toks[(g*{_SPAN_K}+1):(g*{_SPAN_K}+{_SPAN_K})], ' ')")} AS h
        FROM (
            SELECT doc_id, source, toks,
                   unnest(range(0, (len(toks) + {_SPAN_K - 1}) // {_SPAN_K})) AS g
            FROM base
        )
    ),
    fo AS (
        SELECT source, doc_id,
               min(doc_id) OVER (PARTITION BY h) AS first_doc
        FROM spans
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
               AS spans_kept,
           {rfix_sql("sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)::DOUBLE / count(*)", 4)}
               AS retention
    FROM fo
    GROUP BY source
    """,
    tags=("DEDUP", "TEXT"),
)
def dedup_span_first_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span-level keep-first dedup ACTION: split every document
    into non-overlapping {_SPAN_K}-token spans, keep each distinct span
    only in the lowest-doc_id document that contains it, and report per
    source how much text survives. This is the retention decision itself
    (which spans each document keeps), where text_dup_shingle_coverage
    only measures overlap — the two share the hash-span machinery.

    Scale shape: spans travel as 60-bit md5 keys; distinct-(doc, span)
    grain collapses map-side, the first-occurrence winner is a min window
    over the flat span-hash key (uniform — identical spans collapse
    before the exchange), then one aggregate per source. Three exchanges
    total, none carrying raw text. Reference analog: none;
    beyond-reference curation surface.
    """
    d = spread(table(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id", "source", T.tokens("text").alias("toks")
    ).filter(F.size("toks") >= 1)
    spans = F.expr(
        f"transform(sequence(0, (size(toks) + {_SPAN_K - 1}) div {_SPAN_K} - 1), "
        f"g -> concat_ws(' ', slice(toks, g * {_SPAN_K} + 1, {_SPAN_K})))"
    )
    ds = (
        base.select("doc_id", "source", F.explode(spans).alias("span"))
        .select("doc_id", "source", hashing.md5_long(F.col("span")).alias("h"))
        .distinct()
    )
    fo = ds.withColumn("first_doc", F.min("doc_id").over(Window.partitionBy("h")))
    kept = F.sum(F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0))
    return fo.groupBy("source").agg(
        F.count("*").cast("long").alias("n_spans"),
        kept.cast("long").alias("spans_kept"),
        rfix(kept.cast("double") / F.count("*"), 4).alias("retention"),
    )


_MRL_DIMS = (8, 16, 32)
_MRL_BOUND = 200
_MRL_CLOSE = 0.05


@register(
    "emb_matryoshka_fidelity",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_MRL_BOUND}
    ),
    p AS (
        SELECT a.embedding AS ea, b.embedding AS eb
        FROM e a JOIN e b ON a.vec_id < b.vec_id
    ),
    d AS (
        SELECT k,
               abs({rfix_sql(V.cosine_sql('ea', 'eb'), 6)}
                   - {rfix_sql(V.cosine_sql('ea[1:CAST(k AS INT)]', 'eb[1:CAST(k AS INT)]'), 6)}) AS diff
        FROM p CROSS JOIN (SELECT unnest([{', '.join(str(k) for k in _MRL_DIMS)}]) AS k)
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {rfix_sql('avg(diff)', 3)} AS avg_abs_err,
           {rfix_sql(f'avg(CASE WHEN diff <= {_MRL_CLOSE} THEN 1.0 ELSE 0.0 END)', 4)}
               AS frac_close
    FROM d
    GROUP BY k
    """,
    tags=("EMB", "ANN", "EVAL"),
)
def emb_matryoshka_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation fidelity eval: how well cosine
    similarity under a PREFIX of the embedding (first k dims, k in
    {_MRL_DIMS}) agrees with full-dimension cosine — the measurement that
    decides whether a cheap truncated index (IVF/LSH over k dims, rerank
    with full vectors) is safe. Reports mean |cos_full − cos_k| and the
    fraction of pairs within {_MRL_CLOSE}.

    Like dedup_embedding_cosine_pairs, the all-pairs sweep is explicitly
    bounded (vec_id < {_MRL_BOUND}, a fixed evaluation slice mirrored in
    the oracle) — fidelity is estimated on a sample by construction, not
    computed corpus-wide; the production path applies the chosen k inside
    ann_ivf_topk/ann_lsh_bucket_topk. Per-pair math is zip_with/aggregate
    folds in codegen; the k fan-out is a 3-row explode.
    """
    # Thin caller of operators/embeddings.matryoshka_fidelity (r12 library
    # extraction, phase 4) over the bounded evaluation panel.
    from ..operators import embeddings as emb_ops

    return emb_ops.matryoshka_fidelity(
        table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _MRL_BOUND),
        "embedding", "vec_id", ks=_MRL_DIMS, close=_MRL_CLOSE,
    )


# Fixed evaluation point for the gradient step (a mid-training iterate, not
# zeros — at w = 0 the sigmoid is constant 0.5 and the step degenerates).
_LR_W = (0.1, -0.2, 0.3, 0.5)  # bias, ln(1+chars), tokens/100, stopword_rate
_LR_MARKERS = ("the", "a", "value")


@register(
    "ml_logreg_grad_step",
    oracle=f"""
    WITH feat AS (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0,
               ln(1 + n_chars) AS x1,
               len({_TOKS}) / 100.0 AS x2,
               {T.marker_count_sql(_TOKS, _LR_MARKERS)}::DOUBLE
                   / greatest(len({_TOKS}), 1) AS x3
        FROM documents
    ),
    p AS (
        SELECT y, x0, x1, x2, x3,
               1.0 / (1.0 + exp(-({_LR_W[0]} * x0 + {_LR_W[1]} * x1
                                  + {_LR_W[2]} * x2 + {_LR_W[3]} * x3))) AS p
        FROM feat
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           {rfix_sql('sum(-(y * ln(p) + (1 - y) * ln(1 - p)))', 3)} AS loss,
           {rfix_sql('sum((p - y) * x0)', 4)} AS g_bias,
           {rfix_sql('sum((p - y) * x1)', 4)} AS g_logchars,
           {rfix_sql('sum((p - y) * x2)', 4)} AS g_tokens,
           {rfix_sql('sum((p - y) * x3)', 4)} AS g_stoprate
    FROM p
    """,
    tags=("ML", "A3", "EMB"),
)
def ml_logreg_grad_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full-batch gradient step of a logistic-regression quality
    classifier (label: lang = 'en'; features: bias, ln(1+chars),
    token count, stopword rate) evaluated at a fixed mid-training iterate
    {_LR_W} — the distributed primitive a trained data-quality filter
    (fastText/DSIR-style classifier) iterates: p = sigma(w.x), gradient
    sum((p - y) * x), log loss. Companion to emb_kmeans_update_step and
    emb_power_iteration_step in the "training loops as mergeable
    aggregates" family.

    Scale shape: features and sigmoid are stateless row expressions in
    codegen; the whole step is ONE map-side-combinable aggregate whose
    exchange carries a single partial row per task regardless of corpus
    size. The driver-side loop (update w, re-broadcast) moves O(d) bytes
    per iteration. Reference analog: none; beyond-reference ML surface.
    """
    d = spread(table(spark, sf_dir, "documents"))
    toks = T.tokens("text")
    feat = d.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        F.log(F.lit(1) + F.col("n_chars")).alias("x1"),
        (F.size(toks) / F.lit(100.0)).alias("x2"),
        (
            T.marker_count(toks, _LR_MARKERS).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("x3"),
    )
    z = (
        F.lit(_LR_W[0]) * F.col("x0")
        + F.lit(_LR_W[1]) * F.col("x1")
        + F.lit(_LR_W[2]) * F.col("x2")
        + F.lit(_LR_W[3]) * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    withp = feat.withColumn("p", p)
    r = F.col("p") - F.col("y")
    return withp.agg(
        F.count("*").cast("long").alias("n_docs"),
        rfix(
            F.sum(
                -(
                    F.col("y") * F.log(F.col("p"))
                    + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - F.col("p"))
                )
            ),
            3,
        ).alias("loss"),
        rfix(F.sum(r * F.col("x0")), 4).alias("g_bias"),
        rfix(F.sum(r * F.col("x1")), 4).alias("g_logchars"),
        rfix(F.sum(r * F.col("x2")), 4).alias("g_tokens"),
        rfix(F.sum(r * F.col("x3")), 4).alias("g_stoprate"),
    )


@register(
    "text_bpe_one_merge_compression",
    oracle=f"""
    WITH tf AS (
        SELECT tok AS w, count(*)::BIGINT AS cnt
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok
    ),
    best AS (
        SELECT substring(w, CAST(i AS INT), 2) AS pair
        FROM (
            SELECT w, cnt, unnest(range(1, length(w))) AS i
            FROM tf WHERE length(w) >= 2
        )
        GROUP BY pair
        ORDER BY sum(cnt) DESC, pair
        LIMIT 1
    ),
    sfw AS (
        SELECT source, tok AS w, count(*)::BIGINT AS cnt
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY source, tok
    )
    SELECT source,
           CAST(sum(cnt * length(w)) AS BIGINT) AS chars_total,
           CAST(sum(cnt * (length(w) - (len(string_split(w, (SELECT pair FROM best))) - 1)))
               AS BIGINT) AS symbols_after,
           {rfix_sql("sum(cnt * (length(w) - (len(string_split(w, (SELECT pair FROM best))) - 1)))::DOUBLE / sum(cnt * length(w))", 4)}
               AS compression
    FROM sfw
    GROUP BY source
    """,
    tags=("TEXT", "TOKENIZER", "UDF"),
)
def text_bpe_one_merge_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL BPE trainer + encoder under the full oracle gate: train ONE
    merge rule with operators/bpe.train_bpe (distributed word-count
    collapse, driver merge loop on the bounded vocabulary), then encode the
    corpus with the Arrow-batched segmenter UDF and report per-source
    symbol compression. One merge is exactly SQL-expressible — greedy
    leftmost-first application of a single rule removes one symbol per
    NON-OVERLAPPING occurrence of the pair, which the oracle counts via
    string_split — so the trainer's tie-break (count DESC, pair ASC) and
    the encoder's greedy loop are both hash-checked, and the multi-merge
    path (text_bpe_subword_stats) reuses the exact same code.

    Scale shape: the UDF runs on DISTINCT (source, word) rows — vocabulary-
    sized input, never per token instance — after one map-side-combinable
    exchange; the trainer's collect is the bounded vocab pull documented in
    operators/bpe.py.
    """
    from ..operators.bpe import bpe_symbol_counter, train_bpe

    d = spread(table(spark, sf_dir, "documents"))
    merges = train_bpe(d, n_merges=1)
    nsyms = bpe_symbol_counter(merges)
    sfw = (
        d.select("source", F.explode(T.tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("cnt"))
    )
    sized = sfw.withColumn("nsym", nsyms(F.col("w")))
    chars = F.sum(F.col("cnt") * F.length("w"))
    syms = F.sum(F.col("cnt") * F.col("nsym"))
    return sized.groupBy("source").agg(
        chars.cast("long").alias("chars_total"),
        syms.cast("long").alias("symbols_after"),
        rfix(syms.cast("double") / chars, 4).alias("compression"),
    )


# Registered merge depth. 2 is the smallest count that exercises the
# genuinely ITERATIVE part of training (round 2's pair statistics are
# computed over round 1's merged segmentation, and the encoder must apply a
# rule whose operands are themselves merged symbols — none of which the
# one-merge slice covers) while still being unrollable into a hash-grade
# DuckDB oracle below. Deeper models (8-16 merges: determinism,
# reconstruction, monotonicity) are pinned by tests/test_bpe.py.
_BPE_MERGES = 2


@register(
    "text_bpe_subword_stats",
    # Full unrolled-iteration oracle (the PageRank-CTE trick applied to BPE):
    # round 1 picks the best adjacent-char pair exactly like the one-merge
    # oracle; a recursive CTE then re-derives each word's greedy leftmost
    # segmentation (chr(31)-joined — segment boundaries can't be expressed
    # by substring counting once symbols are multi-char, a mid-symbol match
    # of the pair string would corrupt counts); round 2's pair is chosen
    # over that segmentation with the trainer's (count DESC, pair ASC)
    # tie-break comparing the symbol TUPLE (l, r) — concatenated-string
    # order is wrong once symbols are multi-char; a second recursion
    # applies it greedily to count final symbols per word. Rank order ≡
    # sequential full application because applying merge k can never
    # re-create a pair of rank < k (merges only grow symbols).
    oracle=f"""
    WITH RECURSIVE tf AS (
        SELECT tok AS w, count(*)::BIGINT AS cnt
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok
    ),
    p1 AS (
        SELECT substring(w, CAST(i AS INT), 2) AS pair
        FROM (SELECT w, cnt, unnest(range(1, length(w))) AS i
              FROM tf WHERE length(w) >= 2)
        GROUP BY pair
        ORDER BY sum(cnt) DESC, pair
        LIMIT 1
    ),
    seg AS (
        SELECT w, cnt, 1 AS pos, ''::VARCHAR AS s FROM tf WHERE w <> ''
        UNION ALL
        SELECT w, cnt,
               pos + CASE WHEN substring(w, pos, 2) = (SELECT pair FROM p1)
                          THEN 2 ELSE 1 END,
               s || CASE WHEN pos > 1 THEN chr(31) ELSE '' END ||
                 CASE WHEN substring(w, pos, 2) = (SELECT pair FROM p1)
                      THEN substring(w, pos, 2) ELSE substring(w, pos, 1) END
        FROM seg WHERE pos <= length(w)
    ),
    seg1 AS (
        SELECT w, cnt, string_split(s, chr(31)) AS syms
        FROM seg WHERE pos > length(w)
    ),
    p2 AS (
        SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT) + 1] AS r
        FROM (SELECT syms, cnt, unnest(range(1, len(syms))) AS i
              FROM seg1 WHERE len(syms) >= 2)
        GROUP BY l, r
        ORDER BY sum(cnt) DESC, l, r
        LIMIT 1
    ),
    enc AS (
        SELECT w, syms, 1 AS idx, 0 AS nsym FROM seg1
        UNION ALL
        SELECT w, syms,
               idx + CASE WHEN idx < len(syms)
                           AND syms[CAST(idx AS INT)] = (SELECT l FROM p2)
                           AND syms[CAST(idx AS INT) + 1] = (SELECT r FROM p2)
                     THEN 2 ELSE 1 END,
               nsym + 1
        FROM enc WHERE idx <= len(syms)
    ),
    nsyms AS (SELECT w, nsym FROM enc WHERE idx > len(syms)),
    sfw AS (
        SELECT source, tok AS w, count(*)::BIGINT AS cnt
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY source, tok
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_words,
           CAST(sum(sfw.cnt * coalesce(nsym, 0)) AS BIGINT) AS symbols_total,
           {rfix_sql("sum(sfw.cnt * coalesce(nsym, 0))::DOUBLE / sum(sfw.cnt)", 4)}
               AS avg_symbols_per_word,
           {rfix_sql("sum(sfw.cnt * coalesce(nsym, 0))::DOUBLE / sum(sfw.cnt * length(w))", 4)}
               AS compression
    FROM sfw LEFT JOIN nsyms USING (w)
    GROUP BY source
    """,
    tags=("TEXT", "TOKENIZER", "UDF", "ITER"),
)
def text_bpe_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-merge BPE encode under the FULL hash gate: train two (=_BPE_MERGES)
    merge rules with the real iterative trainer (operators/bpe.train_bpe —
    round 2 trains on round 1's merged segmentation), encode the corpus
    with the greedy rank-ordered segmenter UDF, report per-source subword
    statistics (symbols per word, symbol compression vs characters). The
    oracle unrolls both training rounds and the encoder into recursive
    CTEs, so trainer tie-breaks, merged-symbol pair statistics, and the
    encoder's leftmost-greedy application are all hash-checked; deeper
    models (8-16 merges) keep their determinism / reconstruction /
    monotonicity pins in tests/test_bpe.py.
    """
    from ..operators.bpe import bpe_symbol_counter, train_bpe

    d = spread(table(spark, sf_dir, "documents"))
    merges = train_bpe(d, n_merges=_BPE_MERGES)
    nsyms = bpe_symbol_counter(merges)
    sfw = (
        d.select("source", F.explode(T.tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("cnt"))
    )
    sized = sfw.withColumn("nsym", nsyms(F.col("w")))
    chars = F.sum(F.col("cnt") * F.length("w"))
    syms = F.sum(F.col("cnt") * F.col("nsym"))
    return sized.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab_words"),
        syms.cast("long").alias("symbols_total"),
        rfix(syms.cast("double") / F.sum("cnt"), 4).alias("avg_symbols_per_word"),
        rfix(syms.cast("double") / chars, 4).alias("compression"),
    )


# One Lloyd round of the unrolled training oracle, parameterized on the
# previous round's centroid-dims CTE: assignment (same three-inner-product
# d2 as _kmeans_oracle) against the list-form centroids, then dimension-wise
# means with empty clusters holding the PREVIOUS round's value (the
# trainer's hold-position rule — coalesce against the prior dims, not the
# seeds).
def _kmeans_round_sql(prev_dims: str, out_assign: str, out_dims: str) -> str:
    return f"""
    {out_assign}l AS (
        SELECT cid, list(x ORDER BY i) AS c FROM {prev_dims} GROUP BY cid
    ),
    {out_assign} AS (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM (
            SELECT e.vec_id, c.cid,
                   list_inner_product(e.v, e.v) + list_inner_product(c.c, c.c)
                   - 2 * list_inner_product(e.v, c.c) AS d2
            FROM e CROSS JOIN {out_assign}l c
        )
    ),
    {out_dims}m AS (
        SELECT a.cid, idx.i, avg((e.v)[idx.i]) AS m
        FROM (SELECT vec_id, cid FROM {out_assign} WHERE rn = 1) a
        JOIN e USING (vec_id), (SELECT unnest(range(1, 4097)) AS i) idx
        WHERE idx.i <= len(e.v)
        GROUP BY a.cid, idx.i
    ),
    {out_dims} AS (
        SELECT p.cid, p.i, coalesce(m.m, p.x) AS x
        FROM {prev_dims} p
        LEFT JOIN {out_dims}m m ON m.cid = p.cid AND m.i = p.i
    )"""


@register(
    "emb_kmeans_train_stats",
    # Unrolled-iteration oracle (the PageRank-CTE trick applied to Lloyd):
    # two full training rounds composed from the same assignment/update SQL
    # emb_kmeans_assign_stats / emb_kmeans_update_step are hash-checked on,
    # then the final assignment pass with the trained centroids. The
    # recorded inertia is round 2's assignment d2 sum (inertia_history[-1]
    # in the trainer), rounded like every float digest.
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
        SELECT cid, idx.i, c[idx.i] AS x
        FROM (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {_KMEANS_K}),
             (SELECT unnest(range(1, 4097)) AS i) idx
        WHERE idx.i <= len(c)
    ),
    {_kmeans_round_sql("c0", "a0", "c1")},
    {_kmeans_round_sql("c1", "a1", "c2")},
    inert AS (SELECT round(sum(d2), 2) AS fi FROM a1 WHERE rn = 1),
    a2l AS (SELECT cid, list(x ORDER BY i) AS c FROM c2 GROUP BY cid),
    a2 AS (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM (
            SELECT e.vec_id, c.cid,
                   list_inner_product(e.v, e.v) + list_inner_product(c.c, c.c)
                   - 2 * list_inner_product(e.v, c.c) AS d2
            FROM e CROSS JOIN a2l c
        )
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(2 AS BIGINT) AS n_iters,
           (SELECT fi FROM inert) AS final_inertia
    FROM a2 WHERE rn = 1
    GROUP BY cid
    """,
    tags=("EMB", "CLUSTER", "ITER"),
)
def emb_kmeans_train_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means TRAINING (operators/kmeans.kmeans_train) under the FULL hash
    gate: exactly two Lloyd iterations (k=8, tol=0 so neither round
    early-stops — the oracle above unrolls precisely two), then one
    assignment pass with the trained model. Output is per-cluster
    membership plus the run's iteration count and final inertia — scalar
    digests, deterministic for a given corpus (seeded init, tie-broken
    argmin, empty clusters hold position). The convergence-stopped variant
    of the same loop (≤5 iters, tol 1e-3) keeps its determinism and
    inertia-monotonicity pins in tests/test_kmeans.py — the tol test is
    the one part an unrolled oracle cannot express.

    Scale shape per iteration: broadcast K×dim literal centroids into a
    codegen argmin (no join), ONE (cluster, dim)-keyed exchange of
    K·dim·tasks partial sums, K·dim means + one double back to the
    driver. The corpus is scanned once per iteration and nothing
    corpus-sized ever shuffles — the 100 TB regime documented in the
    operator module.
    """
    from ..operators.kmeans import kmeans_train

    e = table(spark, sf_dir, "embeddings")
    model = kmeans_train(e, k=8, max_iters=2, tol=0.0)
    if not model.centroids:
        return spark.createDataFrame(
            [],
            "cluster_id long, n_members long, n_iters long, final_inertia double",
        )
    assigned = model.assign(e)
    final_inertia = (
        round(model.inertia_history[-1], 2) if model.inertia_history else 0.0
    )
    return assigned.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_members"),
        F.lit(model.n_iters).cast("long").alias("n_iters"),
        F.lit(final_inertia).alias("final_inertia"),
    )


@register(
    "text_entropy_by_source",
    oracle=f"""
    WITH tf AS (
        SELECT source, tok, count(*)::DOUBLE AS cnt
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY source, tok
    ),
    tot AS (SELECT source, sum(cnt) AS n FROM tf GROUP BY source)
    SELECT tf.source,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           {rfix_sql('-sum((cnt / n) * ln(cnt / n))', 4)} AS token_entropy,
           {rfix_sql('-sum((cnt / n) * ln(cnt / n)) / ln(count(*))', 4)}
               AS normalized_entropy
    FROM tf JOIN tot ON tot.source = tf.source
    GROUP BY tf.source
    """,
    tags=("TEXT", "STATS", "A3"),
)
def text_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution — the lexical-
    diversity signal used to rank corpus sources (low entropy = templated/
    boilerplate text, high = diverse vocabulary usage); normalized by
    ln(vocab) so sources of different vocabulary sizes compare on [0, 1].

    Scale shape: one map-side-combinable exchange to (source, token)
    counts — the only stage that sees corpus-sized data — then the
    per-source totals join back on the source key (count-table-sized) and
    the entropy sum is a second small exchange. The -Σ p·ln p fold stays
    in codegen; summation order is absorbed by the rounding edge like
    every float aggregate in the registry.
    """
    return textops.entropy_by_group(
        spread(table(spark, sf_dir, "documents")), group_col="source"
    )


@register(
    "ann_ivf_recall_eval",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
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
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {_IVF_K}
    ),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {rfix_sql(V.cosine_sql('e.embedding', 'c.cv'), 6)} DESC, c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    cand AS (
        SELECT qa.vec_id AS query_id, na.vec_id AS neighbor_id
        FROM assign qa JOIN assign na ON na.cid = qa.cid AND na.vec_id <> qa.vec_id
        WHERE qa.vec_id < 5
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
    """,
    tags=("ANN", "IVF", "EVAL"),
)
def ann_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the single-probe IVF index (ann_ivf_topk's candidate
    generator: only the query's own coarse cell is searched) against
    brute-force cosine ground truth — the companion measurement to
    ann_recall_eval's SRP-LSH number. Together they quantify the recall /
    candidate-set-size trade both index families make, over the same
    bounded query panel; raising nprobe (searching neighboring cells)
    buys recall back at proportional cost.

    Scale shape mirrors the production query: centroids broadcast, the
    index assignment pinned once with localCheckpoint (it feeds both
    sides of the candidate join), truth exact only over the 5-query
    broadcast panel; everything after candidate generation is
    panel-bounded.
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
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("ac6"), F.asc("cid"))
    assign = (
        e.join(F.broadcast(cents))
        .select(
            "vec_id",
            "cid",
            rfix(V.cosine(F.col("embedding"), F.col("cv")), 6).alias("ac6"),
        )
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    ).localCheckpoint()
    qa = assign.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "cid"
    )
    cand = (
        assign.join(F.broadcast(qa), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    sizes = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    hits = (
        truth.join(cand.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("hits"))
    )
    # Left join + coalesce: a query whose bucket/cell holds no other
    # vector has no sizes row, but must still report n_candidates = 0
    # (the oracle's correlated COUNT keeps it).
    return hits.join(F.broadcast(sizes), "query_id", "left").select(
        F.col("query_id").cast("long").alias("query_id"),
        F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
        F.col("hits").cast("long").alias("hits"),
        rfix(F.col("hits") / F.lit(10.0), 4).alias("recall_at_10"),
    )
