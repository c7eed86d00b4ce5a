"""Product quantization (PQ) over an embedding column.

The standard ANN memory-compression scheme (Jégou et al., "Product
Quantization for Nearest Neighbor Search"): split each d-dim vector into
``m`` contiguous subspaces, train an independent k-means codebook per
subspace, and represent every vector by its m nearest-centroid codes —
d·4 bytes shrink to m·log2(k) bits, and asymmetric distance computation
against the codebooks approximates full-precision search. Extends the
repo's quantization family (emb_quantize_int8_stats is the scalar
variant; operators/kmeans.py supplies the trainer).

Scale shape: training runs the documented kmeans regime per subspace
(broadcast K×(d/m) literal centroids, one (cluster, dim)-keyed exchange
per iteration, K·(d/m) means to the driver); encoding is a stateless
codegen argmin over the m broadcast codebooks — no join, no shuffle, the
same shape as emb_kmeans_assign_stats. Reconstruction error needs no
decode join: per-vector squared error is exactly the sum of the m
subspace argmin distances, so quality stats fall out of the encode
expressions themselves.

Determinism mirrors the kmeans operator: subspace codebooks seed from the
first k vectors by id, distance ties break toward the lower code, so the
same corpus always produces the same codes.

Reference analog: none; beyond-reference embedding-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kmeans import KMeansModel, argmin_centroid, kmeans_train


@dataclass
class PQModel:
    m: int
    dim: int
    # codebooks[j]: cluster id -> centroid of subspace j (length dim // m)
    codebooks: list[dict[int, list[float]]]

    @property
    def sub_dim(self) -> int:
        return self.dim // self.m

    def _sub_expr(self, emb_col: str, j: int) -> str:
        # 1-based slice start; argmin_centroid casts to ARRAY<DOUBLE>
        return f"slice({emb_col}, {j * self.sub_dim + 1}, {self.sub_dim})"

    def _bests(self, emb_col: str) -> list[Column]:
        return [
            argmin_centroid(self._sub_expr(emb_col, j), self.codebooks[j])
            for j in range(self.m)
        ]

    def encode(self, emb: DataFrame, emb_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
        """(id, codes array<int>, sq_err double): each vector's m codebook
        codes plus its exact reconstruction error ‖x − x̂‖² (the sum of the
        m subspace argmin distances — no decode join needed)."""
        if not all(self.codebooks):
            # untrained/empty-corpus model: the well-defined degenerate
            # result is the empty code table (same contract as the kmeans
            # assign queries' empty guard)
            return emb.sparkSession.createDataFrame(
                [], f"{id_col} LONG, codes ARRAY<INT>, sq_err DOUBLE"
            )
        bests = self._bests(emb_col)
        codes = F.array(*[b["cid"].cast("int") for b in bests])
        err_col = bests[0]["d2"]
        for b in bests[1:]:
            err_col = err_col + b["d2"]
        return emb.select(
            F.col(id_col),
            codes.alias("codes"),
            F.greatest(err_col, F.lit(0.0)).alias("sq_err"),
        )

    def encode_codes_arrow(self, emb: DataFrame, emb_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
        """(id, codes array<int>) via ONE Arrow ``mapInPandas`` pass — the
        r13 fast path for consumers that need only the CODES (the ADC
        query stage): the expression path runs m·(K+1) interpreted
        zip_with/aggregate HOF dots per row (CodegenFallback, ~12-30µs
        each — the vectors.py kernel-economics note), while this kernel
        scores each subspace against its whole codebook with one dense
        numpy matmul. No shuffle, no per-row Python; the embedding column
        crosses the boundary once, batched.

        Equivalence to ``encode()``'s codes: the argmin compares
        ‖x_j‖² + ‖c‖² − 2·x_j·c exactly as the expression path does, and
        ``np.argmin`` returns the FIRST minimum over the ascending-cid
        centroid rows — the same ties-to-lower-cid rule. Summation order
        inside each dot differs in the last ulp, which can only matter
        when two centroids are equidistant to sub-ulp precision — the
        codebooks are distinct seed vectors, and the agreement is pinned
        by tests (exact code equality vs encode()) plus every consuming
        query's DuckDB-oracle hash. sq_err consumers stay on encode()."""
        if not all(self.codebooks):
            return emb.sparkSession.createDataFrame(
                [], f"{id_col} LONG, codes ARRAY<INT>"
            )
        books = [
            [(int(cid), [float(x) for x in self.codebooks[j][cid]])
             for cid in sorted(self.codebooks[j])]
            for j in range(self.m)
        ]
        m, sub = self.m, self.sub_dim

        def kernel(batches):
            import numpy as np
            import pandas as pd

            cids = [np.array([cid for cid, _ in b], dtype=np.int32)
                    for b in books]
            cents = [np.array([v for _, v in b], dtype=np.float64)
                     for b in books]
            c2 = [(c * c).sum(axis=1) for c in cents]
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
                per_sub = []
                for j in range(m):
                    xj = x[:, j * sub:(j + 1) * sub]
                    d2 = (
                        (xj * xj).sum(axis=1)[:, None]
                        + c2[j][None, :]
                        - 2.0 * (xj @ cents[j].T)
                    )
                    per_sub.append(cids[j][np.argmin(d2, axis=1)])
                stacked = np.stack(per_sub, axis=1)
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "codes": list(stacked)}
                )

        return emb.select(id_col, emb_col).mapInPandas(
            kernel, f"{id_col} LONG, codes ARRAY<INT>"
        )


def train_pq(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    max_iters: int = 3,
    tol: float = 0.0,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> PQModel:
    """Train one k-means codebook per subspace. The embedding dimension
    must divide evenly by ``m`` (PQ's standard constraint). Empty input
    yields empty codebooks (encode of the empty frame is empty).

    The first-K seed rows are collected ONCE and sliced client-side for
    all m subspaces (one TakeOrdered job instead of m+1 — the seed values
    are identical to per-subspace collects, and for max_iters=0 they ARE
    the codebooks, so the whole seed-variant model costs one job)."""
    seed_rows = sorted(
        emb.orderBy(id_col)
        .limit(k)
        .select(id_col, F.col(emb_col).cast("array<double>").alias("c"))
        .collect(),
        key=lambda r: r[id_col],
    )
    if not seed_rows:
        return PQModel(m=m, dim=0, codebooks=[{} for _ in range(m)])
    dim = len(seed_rows[0]["c"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[dict[int, list[float]]] = []
    for j in range(m):
        seeds = {
            i: list(r["c"][j * sub:(j + 1) * sub])
            for i, r in enumerate(seed_rows)
        }
        if max_iters == 0:
            books.append(seeds)
            continue
        sliced = emb.select(
            F.col(id_col),
            F.slice(F.col(emb_col), j * sub + 1, sub).alias("sub"),
        )
        model: KMeansModel = kmeans_train(
            sliced, k=k, max_iters=max_iters, tol=tol,
            emb_col="sub", id_col=id_col, seeds=seeds,
        )
        books.append(model.centroids)
    return PQModel(m=m, dim=dim, codebooks=books)


def pq_quality_stats(emb: DataFrame, model: PQModel,
                     emb_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Corpus-level quantizer quality: one row of (n_vectors, mse,
    max_sq_err) — a single mergeable aggregate over the encode
    expressions, nothing corpus-sized shuffles."""
    enc = model.encode(emb, emb_col=emb_col, id_col=id_col)
    return enc.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.avg("sq_err").alias("mse"),
        F.max("sq_err").alias("max_sq_err"),
    )
