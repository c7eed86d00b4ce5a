"""Unit tests for the LIBRARY form of the embedding evals
(operators/embeddings.py — judge r11 brief #5).

Hand-built NON-registry vector frames with non-default column names,
non-registry dims/ks/quant parameters, and pure-Python reference twins
(the test_curation_lib.py pattern). The registry queries stay covered by
tests/test_parity.py's DuckDB oracle gate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StructField,
                               StructType)

from yelpdatawarehouse_spark.operators import embeddings as emb

DIMS = 6

# two tight clusters + one outlier, |components| < 1 (quantization-safe)
VECS = [
    (1, 0, [0.90, 0.10, 0.00, 0.05, 0.00, 0.00]),
    (2, 0, [0.85, 0.15, 0.05, 0.00, 0.00, 0.00]),
    (3, 0, [0.95, 0.05, 0.00, 0.00, 0.05, 0.00]),
    (4, 1, [0.00, 0.05, 0.90, 0.10, 0.00, 0.05]),
    (5, 1, [0.05, 0.00, 0.85, 0.15, 0.00, 0.00]),
    (6, 1, [0.00, 0.00, 0.95, 0.05, 0.05, 0.00]),
    (7, 2, [0.30, 0.30, 0.30, 0.30, 0.30, 0.30]),
]

SCHEMA = StructType([
    StructField("vid", LongType()),
    StructField("grp", LongType()),
    StructField("emb", ArrayType(DoubleType())),
])


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, SCHEMA)


def rfix(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _norm(v):
    return math.sqrt(sum(x * x for x in v))


def _dot(a, b):
    return sum(x * y for x, y in zip(a, b))


# ---------------------------------------------------------------------------
# anisotropy_stats
# ---------------------------------------------------------------------------


def test_anisotropy_stats_matches_python_twin(spark, vecs):
    row = emb.anisotropy_stats(vecs, "emb", dims=DIMS).collect()[0]
    mus = [rfix(sum(v[i] for _, _, v in VECS) / len(VECS), 6)
           for i in range(DIMS)]
    avg_norm = rfix(sum(_norm(v) for _, _, v in VECS) / len(VECS), 6)
    mvn = math.sqrt(sum(m * m for m in mus))
    assert row["n_vecs"] == len(VECS)
    assert row["avg_norm"] == pytest.approx(avg_norm, abs=1e-6)
    assert row["mean_vec_norm"] == pytest.approx(rfix(mvn, 4), abs=1e-4)
    assert row["anisotropy_ratio"] == pytest.approx(
        rfix(mvn / avg_norm, 4), abs=1e-4)
    assert row["max_abs_dim_mean"] == pytest.approx(
        rfix(max(abs(m) for m in mus), 4), abs=1e-4)


def test_anisotropy_isotropic_corpus_scores_low(spark):
    # symmetric ± pairs: the mean vector is ~0 -> ratio ~0
    rows = [(1, 0, [0.5, -0.5, 0.5, -0.5, 0.5, -0.5]),
            (2, 0, [-0.5, 0.5, -0.5, 0.5, -0.5, 0.5])]
    df = spark.createDataFrame(rows, SCHEMA)
    row = emb.anisotropy_stats(df, "emb", dims=DIMS).collect()[0]
    assert row["anisotropy_ratio"] == pytest.approx(0.0, abs=1e-3)


# ---------------------------------------------------------------------------
# silhouette_eval
# ---------------------------------------------------------------------------


def _py_silhouette(quant: int):
    # integer-quantized centroids, same grid as the library
    groups = sorted({g for _, g, _ in VECS})
    cents = {}
    for g in groups:
        members = [v for _, gg, v in VECS if gg == g]
        cents[g] = [
            (sum(math.floor(v[i] * quant + 0.5) for v in members)
             / len(members) / quant)
            for i in range(DIMS)
        ]
    per_label = {g: [] for g in groups}
    for _vid, g, v in VECS:
        d = {c: math.sqrt(max(_dot(v, v) + _dot(cv, cv) - 2 * _dot(v, cv), 0.0))
             for c, cv in cents.items()}
        a = d[g]
        b = min(dd for c, dd in d.items() if c != g)
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        per_label[g].append((a, b, s))
    return {
        g: (len(rows),
            rfix(sum(r[0] for r in rows) / len(rows), 4),
            rfix(sum(r[1] for r in rows) / len(rows), 4),
            rfix(sum(r[2] for r in rows) / len(rows), 4))
        for g, rows in per_label.items()
    }


def test_silhouette_eval_matches_python_twin(spark, vecs):
    quant = 10_000  # non-registry quantization grid
    out = {r["label"]: r for r in emb.silhouette_eval(
        vecs, "emb", "grp", "vid", quant=quant).collect()}
    expect = _py_silhouette(quant)
    assert set(out) == set(expect)
    for g, (n, a, b, s) in expect.items():
        assert out[g]["n_vectors"] == n
        assert out[g]["mean_intra_dist"] == pytest.approx(a, abs=1e-4)
        assert out[g]["mean_nearest_other"] == pytest.approx(b, abs=1e-4)
        assert out[g]["mean_silhouette"] == pytest.approx(s, abs=1e-4)
    # tight clusters separate cleanly: silhouette near 1
    assert out[0]["mean_silhouette"] > 0.7
    assert out[1]["mean_silhouette"] > 0.7


# ---------------------------------------------------------------------------
# power_iteration_step
# ---------------------------------------------------------------------------


def _py_power_step(v0):
    w = [0.0] * DIMS
    for _, _, v in VECS:
        rs = _dot(v, v0)
        for i in range(DIMS):
            w[i] += rs * v[i]
    nrm = math.sqrt(sum(x * x for x in w))
    return [rfix(x / nrm, 6) for x in w]


def test_power_iteration_all_ones_start(spark, vecs):
    out = [r["v_next"] for r in emb.power_iteration_step(
        vecs, "emb").orderBy("dim_idx").collect()]
    assert out == pytest.approx(_py_power_step([1.0] * DIMS), abs=1e-6)
    # unit norm
    assert sum(x * x for x in out) == pytest.approx(1.0, abs=1e-4)


def test_power_iteration_explicit_v0(spark, vecs):
    v0 = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0]
    out = [r["v_next"] for r in emb.power_iteration_step(
        vecs, "emb", v0=v0).orderBy("dim_idx").collect()]
    assert out == pytest.approx(_py_power_step(v0), abs=1e-6)
    # the knob is real: different start, different direction
    ones = [r["v_next"] for r in emb.power_iteration_step(
        vecs, "emb").orderBy("dim_idx").collect()]
    assert out != pytest.approx(ones, abs=1e-3)


def test_power_iteration_converges_to_dominant_direction(spark, vecs):
    # two steps via the v0 knob: the iterate's Rayleigh quotient must not
    # decrease (power iteration monotonicity on PSD Gram matrices)
    def rayleigh(v):
        av = [_dot(v, vec) for _, _, vec in VECS]
        return sum(x * x for x in av)  # v'A'Av with |v|=1

    v1 = [r["v_next"] for r in emb.power_iteration_step(
        vecs, "emb").orderBy("dim_idx").collect()]
    v2 = [r["v_next"] for r in emb.power_iteration_step(
        vecs, "emb", v0=v1).orderBy("dim_idx").collect()]
    assert rayleigh(v2) >= rayleigh(v1) - 1e-9


# ---------------------------------------------------------------------------
# matryoshka_fidelity
# ---------------------------------------------------------------------------


def _py_matryoshka(ks, close):
    out = {}
    pairs = [(a, b) for ai, (_, _, a) in enumerate(VECS)
             for bi, (_, _, b) in enumerate(VECS) if ai < bi]
    for k in ks:
        diffs = []
        for a, b in pairs:
            cf = rfix(_dot(a, b) / (_norm(a) * _norm(b)), 6)
            ck = rfix(_dot(a[:k], b[:k]) / (_norm(a[:k]) * _norm(b[:k])), 6)
            diffs.append(abs(cf - ck))
        out[k] = (len(diffs),
                  rfix(sum(diffs) / len(diffs), 3),
                  rfix(sum(1.0 for d in diffs if d <= close) / len(diffs), 4))
    return out


def test_matryoshka_fidelity_matches_python_twin(spark, vecs):
    ks, close = (3, 4), 0.1  # non-registry prefixes and threshold
    out = {r["k"]: r for r in emb.matryoshka_fidelity(
        vecs, "emb", "vid", ks=ks, close=close).collect()}
    expect = _py_matryoshka(ks, close)
    assert set(out) == set(expect)
    for k, (n, err, frac) in expect.items():
        assert out[k]["n_pairs"] == n
        assert out[k]["avg_abs_err"] == pytest.approx(err, abs=1e-3)
        assert out[k]["frac_close"] == pytest.approx(frac, abs=1e-4)


def test_matryoshka_full_prefix_is_exact(spark, vecs):
    # k = full dimensionality: prefix cosine IS full cosine -> zero error
    out = emb.matryoshka_fidelity(vecs, "emb", "vid", ks=(DIMS,)).collect()[0]
    assert out["avg_abs_err"] == pytest.approx(0.0, abs=1e-9)
    assert out["frac_close"] == pytest.approx(1.0)
