"""operators/pq.py: product quantization — codes, reconstruction error,
Lloyd-improvement and determinism guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.pq import pq_quality_stats, train_pq
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF, "embeddings")


def test_codes_shape_and_range(spark, emb):
    model = train_pq(emb, m=4, k=16, max_iters=1)
    enc = model.encode(emb)
    rows = enc.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == 4
        assert all(0 <= c < 16 for c in r.codes)
        assert r.sq_err >= 0.0


def test_seed_vectors_quantize_exactly_before_training(spark, emb):
    """With zero Lloyd iterations the codebooks ARE the first-k vector
    slices, so those vectors reconstruct with (float-noise) zero error."""
    model = train_pq(emb, m=4, k=16, max_iters=0)
    errs = {
        r.vec_id: r.sq_err
        for r in model.encode(emb).filter(F.col("vec_id") < 16).collect()
    }
    assert len(errs) == 16
    assert all(e < 1e-9 for e in errs.values())


def test_lloyd_training_improves_quantizer(spark, emb):
    """The PQ training guarantee: trained codebooks reconstruct no worse
    than the raw seed codebooks (per-subspace Lloyd never increases
    within-cluster distortion)."""
    mse0 = pq_quality_stats(emb, train_pq(emb, m=4, k=16, max_iters=0)).collect()[0].mse
    mse2 = pq_quality_stats(emb, train_pq(emb, m=4, k=16, max_iters=2)).collect()[0].mse
    assert mse2 <= mse0 + 1e-9


def test_error_is_sum_of_subspace_distances(spark, emb):
    """Full-vector reconstruction error must equal the sum over subspaces
    of distance to the chosen centroid — checked against an independent
    Python reconstruction for a sample."""
    model = train_pq(emb, m=4, k=8, max_iters=1)
    sample = model.encode(emb).filter(F.col("vec_id") < 20).collect()
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 20).collect()
    }
    sub = model.sub_dim
    for r in sample:
        x = vecs[r.vec_id]
        err = 0.0
        for j, code in enumerate(r.codes):
            c = model.codebooks[j][code]
            err += sum(
                (a - b) ** 2 for a, b in zip(x[j * sub : (j + 1) * sub], c)
            )
        assert abs(err - r.sq_err) < 1e-6


def test_determinism(spark, emb):
    a = train_pq(emb, m=4, k=8, max_iters=2)
    b = train_pq(emb.repartition(7), m=4, k=8, max_iters=2)
    enc_a = sorted((r.vec_id, tuple(r.codes)) for r in a.encode(emb).collect())
    enc_b = sorted((r.vec_id, tuple(r.codes)) for r in b.encode(emb).collect())
    assert enc_a == enc_b


def test_dim_must_divide(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(emb, m=7)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    model = train_pq(empty, m=4, k=8)
    assert model.codebooks == [{}, {}, {}, {}]
    assert model.encode(empty).count() == 0
