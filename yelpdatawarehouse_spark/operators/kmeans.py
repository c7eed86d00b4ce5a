"""Full Lloyd k-means training loop over an embedding column.

Single-step building blocks live in the query registry
(emb_kmeans_assign_stats / emb_kmeans_update_step, both hash-checked
against SQL oracles); this operator is the ITERATIVE composition they
promise — the part SQL cannot express. The distributed/driver split is the
standard one for K·dim ≪ corpus state: centroids are a K×dim literal
broadcast into the assignment expression (argmin over per-centroid squared
distances, all inside whole-stage codegen), the update is a (cluster, dim)-
keyed mean whose exchange cardinality is K·dim regardless of corpus size,
and only the K×dim means plus one inertia double cross the driver boundary
per iteration.

Determinism: initialization is the first K vectors by vec_id, distance ties
break toward the lower cluster id (array_min on (d2, cid) structs), and
empty clusters keep their previous centroid — same corpus in, same model
out, which tests/test_kmeans.py pins along with the Lloyd monotonicity
guarantee (inertia never increases).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def argmin_centroid(emb_col: str, centroids: dict[int, list[float]]) -> Column:
    """(d2, cid) struct of the nearest centroid, ties to the lower cid.
    ‖x−c‖² = x·x + c·c − 2·x·c; x·x is computed once and shared across the
    K candidate expressions, c·c is folded at plan-build time."""
    # ONE parsed expression for the whole argmin (r13, guide §5: driver
    # fixed cost — was one F.expr parse + ~6 py4j calls per centroid,
    # re-built every Lloyd iteration). The rendered tree is identical:
    # same folds, same literal rendering (repr round-trips doubles
    # exactly), same ties-to-lower-cid via array_min struct ordering.
    e = f"CAST({emb_col} AS ARRAY<DOUBLE>)"
    self_dot = (
        f"aggregate(zip_with({e}, {e}, (x, y) -> x * y), "
        f"0.0D, (acc, x) -> acc + x)"
    )
    choices = []
    for cid in sorted(centroids):
        c = centroids[cid]
        arr = ", ".join(f"{float(x)!r}D" for x in c)
        dot_c = (
            f"aggregate(zip_with({e}, array({arr}), (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        c2 = sum(x * x for x in c)
        choices.append(
            f"struct((({self_dot} + {float(c2)!r}D) - (2 * {dot_c})) AS d2, "
            f"{int(cid)} AS cid)"
        )
    return F.expr(f"array_min(array({', '.join(choices)}))")


@dataclass
class KMeansModel:
    centroids: dict[int, list[float]]
    inertia_history: list[float] = field(default_factory=list)
    n_iters: int = 0

    def assign(self, emb: DataFrame, emb_col: str = "embedding") -> DataFrame:
        best = argmin_centroid(emb_col, self.centroids)
        return emb.withColumn("cluster_id", best["cid"].cast("long"))


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seeds: dict[int, list[float]] | None = None,
) -> KMeansModel:
    """Lloyd's algorithm until the max centroid shift drops below ``tol``
    (L2) or ``max_iters`` is reached. ONE action per iteration (the
    (cluster, dim) mean collect, which also carries the inertia) — the
    documented driver-loop regime; everything corpus-sized stays on the
    executors.

    ``seeds`` (cid -> vector) skips the first-K seed collect — callers
    training several codebooks over slices of ONE frame (train_pq) fetch
    the seed rows once and slice client-side instead of running one
    TakeOrdered job per subspace; values are identical either way."""
    if seeds is not None:
        centroids = {cid: list(v) for cid, v in seeds.items()}
        if not centroids:
            return KMeansModel(centroids={})
    else:
        seed_rows = sorted(
            emb.orderBy(id_col).limit(k).select(id_col, F.col(emb_col).cast("array<double>").alias("c")).collect(),
            key=lambda r: r[id_col],
        )
        if not seed_rows:
            return KMeansModel(centroids={})
        centroids = {i: list(r["c"]) for i, r in enumerate(seed_rows)}
    model = KMeansModel(centroids=centroids)
    for _ in range(max_iters):
        best = argmin_centroid(emb_col, model.centroids)
        assigned = emb.select(
            best["cid"].alias("cid"),
            best["d2"].alias("d2"),
            F.col(emb_col).cast("array<double>").alias("e"),
        )
        # ONE action per iteration: the (cluster, dim) mean exchange also
        # carries each member's d2, so cluster inertia falls out of the
        # i=0 rows — no second corpus scan for the convergence metric.
        means = (
            assigned.select("cid", "d2", F.posexplode("e").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("m"), F.sum("d2").alias("sd2"))
            .collect()
        )
        inertia = sum(float(r["sd2"]) for r in sorted(
            (r for r in means if r["i"] == 0), key=lambda r: r["cid"]
        ))
        model.inertia_history.append(inertia)
        new_centroids = {cid: list(c) for cid, c in model.centroids.items()}
        per_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            per_cluster.setdefault(int(r["cid"]), {})[int(r["i"])] = float(r["m"])
        shift = 0.0
        for cid, dims in per_cluster.items():
            vec = [dims[i] for i in range(len(dims))]
            old = model.centroids[cid]
            shift = max(
                shift, sum((a - b) ** 2 for a, b in zip(vec, old)) ** 0.5
            )
            new_centroids[cid] = vec
        model.centroids = new_centroids
        model.n_iters += 1
        if shift < tol:
            break
    return model
