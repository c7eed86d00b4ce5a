"""Lloyd k-means training-loop invariants (operators/kmeans.py). The
single-step building blocks are oracle-checked via test_parity
(emb_kmeans_assign_stats / emb_kmeans_update_step); these pin the
properties of the iterative composition SQL cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.kmeans import kmeans_train
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return table(spark, SF, "embeddings")


def test_train_deterministic(spark):
    m1 = kmeans_train(_emb(spark), k=4, max_iters=3)
    m2 = kmeans_train(_emb(spark), k=4, max_iters=3)
    assert m1.centroids == m2.centroids
    assert m1.inertia_history == m2.inertia_history
    assert m1.n_iters == m2.n_iters


def test_inertia_monotone_nonincreasing(spark):
    m = kmeans_train(_emb(spark), k=4, max_iters=5, tol=0.0)
    assert m.n_iters >= 2
    for a, b in zip(m.inertia_history, m.inertia_history[1:]):
        assert b <= a * (1 + 1e-9), m.inertia_history  # Lloyd guarantee


def test_assign_partitions_everything(spark):
    e = _emb(spark)
    m = kmeans_train(e, k=4, max_iters=2)
    assigned = m.assign(e)
    assert assigned.count() == e.count()
    cids = {r["cluster_id"] for r in assigned.select("cluster_id").distinct().collect()}
    assert cids <= set(m.centroids)


def test_huge_tol_stops_after_one_iteration(spark):
    m = kmeans_train(_emb(spark), k=4, max_iters=5, tol=1e9)
    assert m.n_iters == 1


def test_empty_input(spark):
    empty = _emb(spark).filter(F.col("vec_id") < 0)
    m = kmeans_train(empty, k=4, max_iters=3)
    assert m.centroids == {}
    assert m.n_iters == 0


def test_centroid_dims_preserved(spark):
    m = kmeans_train(_emb(spark), k=3, max_iters=2)
    dims = {len(c) for c in m.centroids.values()}
    assert dims == {64}
