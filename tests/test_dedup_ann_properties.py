"""Property-based tests for the dedup/ANN LIBRARY (operators/dedup.py,
operators/ann.py) — randomized corpora via hypothesis, properties that must
hold for ANY input, not just the fixtures:

* MinHash: identical texts ⇒ identical signatures; signature agreement is
  a plausible Jaccard estimator (within a binomial-style envelope).
* LSH banding: candidates are a SUPERSET of the full-signature-equality
  pairs (a doc pair agreeing on every slot must collide in every band)
  and a SUBSET of pairs sharing ≥1 shingle (disjoint docs cannot agree on
  a min-slot... only probabilistically — so the pinned subset property is
  the band-collision ⇒ slot-agreement direction instead).
* SimHash banding pigeonhole: banded pairs == all-pairs sweep whenever
  max_hamming < bands — on RANDOM corpora, not just the curated fixture.
* SRP buckets: invariant under positive scaling of the vector (sign
  pattern depends only on direction — the defining LSH property).
* Brute-force cosine top-k: matches an independent numpy ranking.

Hypothesis drives the corpus; Spark jobs per example are expensive, so
examples are capped low — these are structure probes, not fuzz soak.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import ann, dedup

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet"]


def _docs(draw_lists):
    return [(i, " ".join(ws)) for i, ws in enumerate(draw_lists)]


@st.composite
def corpora(draw, min_docs=3, max_docs=8):
    n = draw(st.integers(min_docs, max_docs))
    docs = []
    for i in range(n):
        words = draw(st.lists(st.sampled_from(WORDS), min_size=3, max_size=12))
        docs.append((i, " ".join(words)))
    # force at least one exact duplicate pair so dedup paths are exercised
    docs.append((n, docs[0][1]))
    return docs


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpora())
def test_minhash_signature_properties(spark, corpus):
    df = spark.createDataFrame(corpus, ["id", "body"])
    sigs = {r["id"]: tuple(r[f"m{i}"] for i in range(8))
            for r in dedup.minhash_signatures(df, "body", "id", n_perm=8).collect()}
    texts = dict(corpus)
    # identical text -> identical signature (the duplicate injected above)
    dup_id = corpus[-1][0]
    if dup_id in sigs and 0 in sigs:
        assert sigs[dup_id] == sigs[0]
    # signature agreement is bounded by [0, 1] trivially; check the exact
    # Jaccard=1 case only (probabilistic bounds are flaky at n_perm=8)
    for a in sigs:
        for b in sigs:
            if a < b and texts[a] == texts[b]:
                assert sigs[a] == sigs[b]


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpora())
def test_lsh_candidates_superset_of_full_agreement(spark, corpus):
    """If two docs agree on EVERY signature slot they must collide in every
    band — so (a, b) with equal signatures is always a candidate pair."""
    df = spark.createDataFrame(corpus, ["id", "body"])
    sigs = {r["id"]: tuple(r[f"m{i}"] for i in range(8))
            for r in dedup.minhash_signatures(df, "body", "id", n_perm=8).collect()}
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.minhash_lsh(df, "body", "id",
                                        n_perm=8, bands=4).collect()}
    for a in sigs:
        for b in sigs:
            if a < b and sigs[a] == sigs[b]:
                assert (a, b) in pairs
    # and every candidate must share at least one full band slice
    rows = 8 // 4
    for a, b in pairs:
        assert any(
            sigs[a][k * rows:(k + 1) * rows] == sigs[b][k * rows:(k + 1) * rows]
            for k in range(4)
        )


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpora())
def test_simhash_banding_pigeonhole_random(spark, corpus):
    df = spark.createDataFrame(corpus, ["id", "body"])
    fps = dedup.simhash_fingerprints(df, "body", "id", bits=16)
    sweep = {(r["id_a"], r["id_b"], r["hamming"])
             for r in dedup.simhash_pairs(fps, "id", max_hamming=1).collect()}
    banded = {(r["id_a"], r["id_b"], r["hamming"])
              for r in dedup.simhash_band_pairs(
                  fps, "id", bits=16, bands=2, max_hamming=1).collect()}
    assert banded == sweep


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vec=st.lists(st.floats(min_value=-10, max_value=10,
                           allow_nan=False, allow_infinity=False),
                 min_size=4, max_size=4),
    scale=st.floats(min_value=0.1, max_value=100, allow_nan=False),
)
def test_srp_bucket_scale_invariant(spark, vec, scale):
    """sign(<c·v, p>) == sign(<v, p>) for c > 0 — SRP buckets depend only
    on direction. (Exact-zero dot products break ties differently under
    scaling in float; nudge away from zero by skipping degenerate vecs.)"""
    if all(abs(x) < 1e-6 for x in vec):
        return
    planes = ann.srp_planes(3, 4)
    # skip examples where any plane dot is within float noise of zero
    for p in planes:
        d = sum(x * w for x, w in zip(vec, p))
        if abs(d) < 1e-3:
            return
    df = spark.createDataFrame(
        [(1, vec), (2, [x * scale for x in vec])], ["vid", "v"]
    ).select("vid", F.col("v").cast("array<double>").alias("v"))
    got = {r["vid"]: r["bucket"]
           for r in df.select("vid", ann.srp_bucket("v", 3, 4)
                              .alias("bucket")).collect()}
    assert got[1] == got[2]


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False,
                           allow_infinity=False, width=32),
                 min_size=4, max_size=4),
        min_size=4, max_size=7, unique_by=tuple,
    )
)
def test_cosine_topk_matches_numpy(spark, vecs):
    vecs = [v for v in vecs if math.sqrt(sum(x * x for x in v)) > 1e-3]
    if len(vecs) < 3:
        return
    rows = [(i, list(map(float, v))) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vid", "v"]).select(
        "vid", F.col("v").cast("array<float>").alias("v"))
    out = ann.cosine_topk(df, df.filter("vid = 0"), id_col="vid",
                          vec_col="v", k=len(rows) - 1)
    got = [(r["rn"], r["neighbor_id"]) for r in out.collect()]
    got.sort()

    def cos(a, b):
        # mirror the engine: float32 inputs widened to double
        import struct
        f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
        a = [f32(x) for x in a]; b = [f32(x) for x in b]
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    expect = sorted(
        ((round(cos(rows[0][1], rows[i][1]), 6), -i) for i in range(1, len(rows))),
        reverse=True)
    for rank, (c6, neg_i) in enumerate(expect, 1):
        assert got[rank - 1] == (rank, -neg_i)
