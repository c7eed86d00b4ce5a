"""Property-based tests for the text/sampling LIBRARIES
(operators/textops.py, operators/sampling.py — the r11 phase-2
library-ification) — randomized inputs via hypothesis, properties that
must hold for ANY input, not just the fixtures:

* Chunking is a partition when stride >= chunk and a cover when
  stride <= chunk: token counts reconcile exactly against the input.
* Packing: bins respect the running-offset law; total size is conserved;
  the assignment is invariant under input repartitioning (keyed hash).
* Stratified sampling + hash split: disjoint salts give independent
  draws; the kept set is invariant under repartitioning; split labels
  partition the input.
* Weighted top-k (A-ES): exactly matches a local reference
  implementation of the same deterministic draw for every random corpus.
* temperature_mix: weights sum to ~1 and alpha=1 recovers natural
  proportions (boost == 1).
* token_budget_fill: every group's kept prefix is exactly the greedy
  prefix of its priority order.

Hypothesis drives the corpus; Spark jobs per example are expensive, so
examples are capped low — these are structure probes, not fuzz soak.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import sampling, textops

WORDS = ["kilo", "lima", "mike", "november", "oscar", "papa", "quebec"]


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@st.composite
def corpora(draw, min_docs=3, max_docs=8):
    n = draw(st.integers(min_docs, max_docs))
    return [
        (i, " ".join(draw(st.lists(st.sampled_from(WORDS),
                                   min_size=1, max_size=20))))
        for i in range(n)
    ]


@st.composite
def sized_rows(draw, min_rows=4, max_rows=12):
    n = draw(st.integers(min_rows, max_rows))
    return [
        (i, draw(st.sampled_from(["x", "y", "z"])),
         draw(st.integers(1, 50)))
        for i in range(n)
    ]


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus=corpora(), chunk=st.integers(2, 6))
def test_chunking_token_conservation(spark, corpus, chunk):
    df = spark.createDataFrame(corpus, ["id", "body"])
    # disjoint chunks (stride == chunk): token counts reconcile exactly
    out = textops.chunk_sliding(df, "body", "id", chunk=chunk,
                                stride=chunk).collect()
    got = {}
    for r in out:
        got[r["id"]] = got.get(r["id"], 0) + r["n_tokens"]
    want = {i: len(body.split()) for i, body in corpus}
    assert got == want
    # chunk indexes are dense from 0 per document
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r["chunk_idx"])
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=sized_rows(), bin_tokens=st.integers(8, 64),
       slots=st.integers(1, 4))
def test_pack_bins_offset_law(spark, rows, bin_tokens, slots):
    df = spark.createDataFrame(rows, ["id", "g", "sz"])
    out = textops.pack_bins(df, id_col="id", size_col="sz",
                            bin_tokens=bin_tokens, slots=slots).collect()
    assert len(out) == len(rows)                       # total conserved
    assert sum(r["sz"] for r in out) == sum(sz for _, _, sz in rows)
    by_slot = {}
    for r in sorted(out, key=lambda r: (r["slot"], r["id"])):
        by_slot.setdefault(r["slot"], []).append(r)
    for srows in by_slot.values():
        cum = 0
        for r in srows:                                # running-offset law
            assert r["bin_id"] == cum // bin_tokens
            cum += r["sz"]
    # repartition invariance
    again = textops.pack_bins(df.repartition(5), id_col="id", size_col="sz",
                              bin_tokens=bin_tokens, slots=slots).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=sized_rows(), pct=st.integers(0, 100))
def test_stratified_sample_and_split_partition(spark, rows, pct):
    df = spark.createDataFrame(rows, ["id", "g", "sz"])
    kept = sampling.stratified_hash_sample(
        df, id_col="id", strata_col="g", rates={"x": pct},
        default_pct=100 - pct, salt="p:").collect()
    # local mirror of the keyed-hash draw
    want = {i for i, g, _ in rows
            if _md5_long(f"p:{i}") % 100 < (pct if g == "x" else 100 - pct)}
    assert {r["id"] for r in kept} == want
    # hash_split labels partition the input
    labeled = sampling.hash_split(df, "id", boundaries=((pct, "lo"),),
                                  default_label="hi", salt="q:").collect()
    assert len(labeled) == len(rows)
    for r in labeled:
        assert r["split"] == ("lo" if _md5_long(f"q:{r['id']}") % 100 < pct
                              else "hi")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=sized_rows(), k=st.integers(1, 6))
def test_weighted_topk_matches_reference(spark, rows, k):
    df = spark.createDataFrame(rows, ["id", "g", "sz"])
    got = sorted(r["id"] for r in sampling.weighted_topk(
        df, "id", "sz", k=k, salt="aes:").collect())
    denom = float((1 << 60) + 1)
    keys = {i: math.log((_md5_long(f"aes:{i}") + 1) / denom) / sz
            for i, _, sz in rows}
    want = sorted(sorted(keys, key=lambda i: (-keys[i], i))[:k])
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=sized_rows())
def test_temperature_mix_alpha_one_is_natural(spark, rows):
    df = spark.createDataFrame(rows, ["id", "g", "sz"])
    out = sampling.temperature_mix(df, "g", alpha=1.0).collect()
    assert abs(sum(r["mix_weight"] for r in out) - 1.0) < 1e-4
    for r in out:                      # alpha=1: no reweighting at all
        assert r["boost"] == pytest.approx(1.0, abs=1e-3)
        assert r["mix_weight"] == pytest.approx(
            r["n_docs"] / len(rows), abs=1e-4)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=sized_rows(), budget=st.integers(1, 120))
def test_token_budget_fill_is_greedy_prefix(spark, rows, budget):
    df = spark.createDataFrame(rows, ["id", "g", "sz"])
    kept = sampling.token_budget_fill(
        df, id_col="id", group_col="g", size_col="sz", budget=budget,
        salt="bf:").collect()
    got = {}
    for r in kept:
        got.setdefault(r["g"], set()).add(r["id"])
    # local greedy reference: order by (hash, id), keep while the EXCLUSIVE
    # cumulative size is under budget
    want: dict = {}
    groups: dict = {}
    for i, g, sz in rows:
        groups.setdefault(g, []).append((_md5_long(f"bf:{i}"), i, sz))
    for g, members in groups.items():
        cum = 0
        for _, i, sz in sorted(members):
            if cum < budget:
                want.setdefault(g, set()).add(i)
            cum += sz
    assert got == want
