"""Reusable embedding-space evaluation operators over ARBITRARY DataFrames.

Library form of the ``emb_*`` eval registry queries (judge r11 brief #5)
— phase 4 of the extraction program that produced :mod:`.dedup` /
:mod:`.ann` (r10), :mod:`.textops` / :mod:`.sampling` / :mod:`.curation`
(r11) and :mod:`.graphalgs` (r12). :mod:`.kmeans` and :mod:`.pq` already
hold the embedding TRAINING loops; this module holds the geometry EVALS::

    from yelpdatawarehouse_spark.operators import embeddings
    profile = embeddings.anisotropy_stats(df, "embedding", dims=128)
    sil     = embeddings.silhouette_eval(df, "embedding", "cluster_id")
    v1      = embeddings.power_iteration_step(df, "embedding")
    fid     = embeddings.matryoshka_fidelity(panel, "embedding", "id",
                                             ks=(16, 64))

Reference analog: none — the reference has no vector surface at all;
this is the beyond-reference LLM-pipeline family (SURVEY §6).

Design rules (the registry queries' DuckDB oracles pin the semantics):

* All per-vector math is JVM-side higher-order array expressions
  (``zip_with``/``aggregate`` folds) — no Python UDFs, no collect.
* Cross-engine float discipline: derived ratios are computed FROM
  canonicalized intermediates (component means at 6 digits, quantized
  integer centroid sums) so parallel summation order cannot leak into
  output; every emitted float goes through ``presentation.rfix``.
* Scale shapes: corpus-wide stats are d-vector (not d²) column
  aggregates over one scan; centroid builds are one (group, position)
  exchange emitting K·dim rows; pair sweeps are panel-bounded by the
  CALLER (evals estimate on a sample by construction — pass a bounded
  frame, not the corpus).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.presentation import rfix

__all__ = [
    "anisotropy_stats",
    "silhouette_eval",
    "power_iteration_step",
    "matryoshka_fidelity",
]

CENTROID_QUANT = 1_000_000  # component quantization (|v| < 1 => long-safe)


def anisotropy_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    digits_mu: int = 6,
    digits: int = 4,
) -> DataFrame:
    """Embedding-space anisotropy profile: ‖mean vector‖ / mean ‖vector‖
    (the common-direction bias of Ethayarajh '19 — isotropic corpora
    score ~0, collapsed/rogue-dimension corpora toward 1) plus the single
    most biased dimension. Returns one row
    (n_vecs, avg_norm, mean_vec_norm, anisotropy_ratio, max_abs_dim_mean).

    One exchange: everything is a d-vector of column aggregates over one
    scan (count, avg norm, ``dims`` component means) — d-not-d²
    discipline. The derived ratios are computed FROM the
    ``digits_mu``-canonicalized component means, so parallel summation
    order can't leak into the output.
    """
    # r13 (guide §5/§1: driver-side fixed cost): the component-mean pack
    # and the derived sumsq/maxabs chains are built as ONE parsed SQL
    # expression each instead of ~4·dims py4j Column calls — the Python
    # round-trips alone cost ~0.7 s warm (2.6 s cold) at dims=64, an
    # order of magnitude more than executing the aggregate. The parsed
    # expressions resolve to the identical Catalyst tree (same rfix
    # canonicalization, same avg/cast), so results are bit-unchanged.
    from ..functions.presentation import rfix_sql

    nrm = V.norm(F.col(vec_col))
    mu_fields = ", ".join(
        f"{rfix_sql(f'avg(cast({vec_col}[{i}] as double))', digits_mu)}"
        f" as mu{i}"
        for i in range(dims)
    )
    agg = df.agg(
        F.count("*").cast("long").alias("n_vecs"),
        rfix(F.avg(nrm), digits_mu).alias("avg_norm"),
        F.expr(f"struct({mu_fields})").alias("_mu"),
    )
    sumsq = " + ".join(f"(_mu.mu{i} * _mu.mu{i})" for i in range(dims))
    maxabs = "greatest(" + ", ".join(
        f"abs(_mu.mu{i})" for i in range(dims)
    ) + ")"
    return agg.selectExpr(
        "n_vecs",
        "avg_norm",
        f"{rfix_sql(f'sqrt({sumsq})', digits)} as mean_vec_norm",
        f"{rfix_sql(f'sqrt({sumsq}) / avg_norm', digits)} as anisotropy_ratio",
        f"{rfix_sql(maxabs, digits)} as max_abs_dim_mean",
    )


def silhouette_eval(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    quant: int = CENTROID_QUANT,
    digits: int = 4,
) -> DataFrame:
    """Centroid-silhouette clustering quality per label: a(v) = distance
    to the OWN label centroid, b(v) = distance to the nearest OTHER label
    centroid, s = (b−a)/max(a,b) — the standard clustering-quality score
    in its centroid form (O(n·K) like PAM's medoid variant, not the O(n²)
    pairwise original). Returns per-label
    (label BIGINT, n_vectors, mean_intra_dist, mean_nearest_other,
    mean_silhouette).

    Exactness: centroids from quantized-integer component sums (1/quant
    grid) — float means are summation-order-dependent across engines,
    integer sums are not, so independent engines compute bit-identical
    centroids; distances are index-ordered dot products via the
    d² = |v|² + |c|² − 2v·c identity, norms precomputed once per row
    (HOFs are CodegenFallback — the measured round-8 finding).

    Scale shape: one (label, position)-keyed exchange builds centroids
    (K·dim rows out), K centroid rows broadcast against the vector scan
    (n·K pair rows — the kmeans-assign shape), one id exchange for the
    a/b minima, one K-group rollup. Never vectors × vectors.
    """
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    pq = e.select(
        "label", F.posexplode("v").alias("i", "u")
    ).select(
        "label", "i",
        F.floor(F.col("u") * quant + F.lit(0.5)).cast("long").alias("q"),
    )
    cent = pq.groupBy("label", "i").agg(
        (F.sum("q").cast("double") / F.count("*") / quant).alias("c")
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
        rfix(F.avg("a"), digits).alias("mean_intra_dist"),
        rfix(F.avg("b"), digits).alias("mean_nearest_other"),
        rfix(F.avg(sil), digits).alias("mean_silhouette"),
    ).select(
        F.col("label").cast("long").alias("label"),
        "n_vectors", "mean_intra_dist", "mean_nearest_other", "mean_silhouette",
    )


def power_iteration_step(
    df: DataFrame,
    vec_col: str = "embedding",
    v0: Sequence[float] | None = None,
    digits: int = 6,
) -> DataFrame:
    """One power-iteration step toward the dominant eigenvector of the
    (uncentered) Gram matrix of a vector corpus: v_next ∝ Aᵀ(A·v₀) —
    the building block of distributed PCA / spectral drift monitoring.
    Returns (dim_idx BIGINT, v_next DOUBLE[digits]), unit-normalized.

    ``v0=None`` starts from the deterministic all-ones direction (whose
    1/√d scale cancels in the final normalization, so the plan never
    even multiplies by it); pass an explicit ``v0`` for later iterations
    (the k-dominant-directions PCA loop is k such passes with
    Gram-Schmidt between rounds — driver-side on d-sized state).

    Distributed shape: each row contributes (x·v₀)·x, so the map side
    computes one dot product per vector and emits (dim, partial) pairs
    via posexplode — the ONLY exchange carries d values per partition
    (map-side combined), never a d×d matrix and never the vectors
    themselves. The normalizer is a broadcast 1-row crossJoin.
    """
    vecs = df.select(F.col(vec_col).cast("array<double>").alias("e"))
    if v0 is None:
        rs = F.aggregate("e", F.lit(0.0), lambda acc, x: acc + x)
    else:
        rs = V.dot(F.col("e"), F.array(*[F.lit(float(x)) for x in v0]))
    rows = vecs.select(rs.alias("rs"), F.posexplode("e").alias("i", "val"))
    w = rows.groupBy("i").agg(F.sum(F.col("rs") * F.col("val")).alias("w"))
    nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w.crossJoin(F.broadcast(nrm)).select(
        F.col("i").cast("long").alias("dim_idx"),
        rfix(F.col("w") / F.col("nrm"), digits).alias("v_next"),
    )


def matryoshka_fidelity(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ks: Sequence[int] = (8, 16, 32),
    close: float = 0.05,
    digits_err: int = 3,
    digits_frac: int = 4,
) -> DataFrame:
    """Matryoshka-style truncation fidelity eval: how well cosine
    similarity under a PREFIX of the vector (first k dims, k ∈ ``ks``)
    agrees with full-dimension cosine — the measurement that decides
    whether a cheap truncated index (IVF/LSH over k dims, rerank with
    full vectors) is safe. Returns per-k
    (k BIGINT, n_pairs, avg_abs_err, frac_close).

    ``df`` must be a BOUNDED evaluation panel — the all-pairs sweep is
    quadratic in its size by design (fidelity is estimated on a sample,
    never corpus-wide; the production path applies the chosen k inside
    the ANN queries). Every k-prefix must be a non-zero vector (an
    all-zero prefix has no cosine: under ANSI mode the division raises
    rather than silently emitting NaN — pick ks past the first
    informative dimensions). Norms are precomputed per VECTOR instead of per
    pair×k — the pair stage then does ONE dot per pair-row; same float
    ops as the naive cosine (folds left-to-right), measured ~4× less
    work.
    """
    ks = tuple(ks)
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        V.norm(F.col(vec_col)).alias("nf"),
        F.array(
            *[V.norm(F.slice(F.col(vec_col), 1, k)) for k in ks]
        ).alias("nks"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nf").alias("b_nf"),
        F.col("nks").alias("b_nks"),
    )
    pairs = e.join(b, F.col("vec_id") < F.col("b_id")).select(
        rfix(V.dot(F.col("embedding"), F.col("b_emb"))
             / (F.col("nf") * F.col("b_nf")), 6).alias("cf"),
        "embedding", "b_emb", "nks", "b_nks",
        F.posexplode(F.array(*[F.lit(k) for k in ks])).alias("idx", "k"),
    )
    ck = rfix(
        V.dot(F.expr("slice(embedding, 1, k)"), F.expr("slice(b_emb, 1, k)"))
        / (F.expr("nks[idx]") * F.expr("b_nks[idx]")),
        6,
    )
    diff = F.abs(F.col("cf") - ck)
    return (
        pairs.select(F.col("k").cast("long").alias("k"), diff.alias("diff"))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            rfix(F.avg("diff"), digits_err).alias("avg_abs_err"),
            rfix(
                F.avg(F.when(F.col("diff") <= close, 1.0).otherwise(0.0)),
                digits_frac,
            ).alias("frac_close"),
        )
    )
