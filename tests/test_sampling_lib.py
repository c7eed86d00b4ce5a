"""Unit tests for the LIBRARY form of the deterministic-sampling operators
(operators/sampling.py — judge r10 brief #1, phase 2 of the
library-ification).

Everything here runs on hand-built, NON-registry DataFrames with
non-default column names and non-registry parameters. The core property
under test everywhere: every draw is a pure function of the data —
re-running, repartitioning, or recomputing yields the SAME rows.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import sampling

ROWS = [(i, ["red", "green", "blue"][i % 3], 10 + 7 * i) for i in range(60)]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, ["rid", "color", "sz"])


# ---------------------------------------------------------------------------
# stratified_hash_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_rates_and_determinism(spark, frame):
    kept = sampling.stratified_hash_sample(
        frame, id_col="rid", strata_col="color",
        rates={"red": 100, "green": 0}, default_pct=50, salt="t:")
    rows = kept.collect()
    by_color: dict[str, int] = {}
    for r in rows:
        by_color[r["color"]] = by_color.get(r["color"], 0) + 1
    assert by_color.get("red") == 20          # 100% kept
    assert "green" not in by_color            # 0% kept
    assert 0 < by_color.get("blue", 0) < 20   # ~50% kept
    # pure function of the data: identical on a repartitioned input
    again = sampling.stratified_hash_sample(
        frame.repartition(7), "rid", "color",
        rates={"red": 100, "green": 0}, default_pct=50, salt="t:")
    assert sorted(r["rid"] for r in rows) == sorted(
        r["rid"] for r in again.collect())
    # slot column is exposed and in range
    assert all(0 <= r["slot"] < 100 for r in rows)


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------


def test_hash_split_partition_of_unity(spark, frame):
    out = sampling.hash_split(frame, "rid",
                              boundaries=((50, "a"), (75, "b")),
                              default_label="c", salt="s:",
                              split_col="bucket")
    rows = out.collect()
    assert len(rows) == 60                       # every row labeled once
    labels = {r["bucket"] for r in rows}
    assert labels <= {"a", "b", "c"} and "a" in labels
    # label is a pure function of rid: same assignment under repartition
    again = {r["rid"]: r["bucket"]
             for r in sampling.hash_split(frame.repartition(5), "rid",
                                          boundaries=((50, "a"), (75, "b")),
                                          default_label="c", salt="s:",
                                          split_col="bucket").collect()}
    assert {r["rid"]: r["bucket"] for r in rows} == again


def test_hash_split_salt_independence(spark, frame):
    a = {r["rid"]: r["split"] for r in sampling.hash_split(
        frame, "rid", salt="one:").collect()}
    b = {r["rid"]: r["split"] for r in sampling.hash_split(
        frame, "rid", salt="two:").collect()}
    assert a != b   # different salts draw independent uniforms


# ---------------------------------------------------------------------------
# weighted_upsample_copies
# ---------------------------------------------------------------------------


def test_weighted_upsample_copies_bounds(spark, frame):
    out = sampling.weighted_upsample_copies(
        frame, "rid", "color",
        weights={"red": 2.5, "green": 0.5}, default_weight=1.0, salt="m:")
    rows = out.collect()
    for r in rows:
        if r["color"] == "red":
            assert r["copies"] in (2, 3)   # floor 2 + hash-chosen 50%
        elif r["color"] == "green":
            assert r["copies"] in (0, 1)
        else:
            assert r["copies"] == 1        # default weight 1.0 exactly
    reds = [r["copies"] for r in rows if r["color"] == "red"]
    assert min(reds) == 2 and max(reds) == 3   # the fraction actually draws


# ---------------------------------------------------------------------------
# weighted_topk (A-ES)
# ---------------------------------------------------------------------------


def _md5_long_py(s: str) -> int:
    """Local mirror of functions.hashing.md5_long (60-bit md5 prefix)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_weighted_topk_matches_local_aes(spark, frame):
    got = sampling.weighted_topk(frame, "rid", "sz", k=10, salt="w:")
    rows = got.collect()
    assert len(rows) == 10
    # local reference implementation of the same deterministic A-ES draw
    denom = float((1 << 60) + 1)
    keys = {rid: math.log((_md5_long_py(f"w:{rid}") + 1) / denom) / sz
            for rid, _, sz in ROWS}
    want = sorted(keys, key=lambda rid: (-keys[rid], rid))[:10]
    assert sorted(r["rid"] for r in rows) == sorted(want)
    # all original columns survive + the key column
    assert set(got.columns) == {"rid", "color", "sz", "_aes_key"}


# ---------------------------------------------------------------------------
# temperature_mix
# ---------------------------------------------------------------------------


def test_temperature_mix_math(spark, frame):
    out = {r["color"]: r.asDict()
           for r in sampling.temperature_mix(frame, "color",
                                             alpha=0.5).collect()}
    assert set(out) == {"red", "green", "blue"}
    # equal-sized groups -> equal weights summing to ~1, boost ~1
    w = [out[c]["mix_weight"] for c in out]
    assert all(abs(x - w[0]) < 1e-9 for x in w)
    assert abs(sum(w) - 1.0) < 1e-5
    assert all(abs(out[c]["boost"] - 1.0) < 1e-3 for c in out)


def test_temperature_mix_upweights_small(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(i, "small") for i in range(10)],
        ["rid", "g"])
    out = {r["g"]: r for r in sampling.temperature_mix(df, "g",
                                                       alpha=0.3).collect()}
    assert out["small"]["boost"] > 1.0 > out["big"]["boost"]
    assert out["small"]["n_docs"] == 10


# ---------------------------------------------------------------------------
# token_budget_fill
# ---------------------------------------------------------------------------


def test_token_budget_fill_greedy_contract(spark, frame):
    kept = sampling.token_budget_fill(
        frame, id_col="rid", group_col="color", size_col="sz",
        budget=100, salt="b:").collect()
    by_color: dict[str, list] = {}
    for r in kept:
        by_color.setdefault(r["color"], []).append(r)
    assert set(by_color) == {"red", "green", "blue"}  # every group contributes
    for rows in by_color.values():
        rows.sort(key=lambda r: r["cum"])
        # every kept row STARTED under budget; all but the last end under it
        for r in rows:
            assert r["cum"] - r["sz"] < 100
        for r in rows[:-1]:
            assert r["cum"] < 100 + rows[-1]["sz"]


def test_token_budget_fill_custom_priority(spark, frame):
    # longest-first fill: order by -sz instead of the hash
    sized = frame.withColumn("neg", -F.col("sz"))
    kept = sampling.token_budget_fill(
        sized, id_col="rid", group_col="color", size_col="sz",
        budget=1, priority_col="neg").collect()
    # budget 1: exactly the single largest row per group is kept
    assert len(kept) == 3
    assert {r["sz"] for r in kept} == {
        max(sz for _, c, sz in ROWS if c == col) for col in
        ("red", "green", "blue")}


# ---------------------------------------------------------------------------
# domain_cap
# ---------------------------------------------------------------------------


def test_domain_cap_rank_semantics(spark, frame):
    ranked = sampling.domain_cap(frame, group_col="color", id_col="rid",
                                 order_col="sz", cap=5, rank_col="r").collect()
    assert len(ranked) == 60   # returns ALL rows with rank
    top = {(r["color"], r["rid"]) for r in ranked if r["r"] <= 5}
    # recompute locally: per color, 5 largest sz (ties by rid asc)
    want = set()
    for col in ("red", "green", "blue"):
        rows = sorted(((sz, rid) for rid, c, sz in ROWS if c == col),
                      key=lambda t: (-t[0], t[1]))[:5]
        want |= {(col, rid) for _, rid in rows}
    assert top == want


# ---------------------------------------------------------------------------
# softdedup_weights
# ---------------------------------------------------------------------------


def test_softdedup_weights_invariants(spark):
    df = spark.createDataFrame(
        [(1, "x", "same text"), (2, "x", "same text"), (3, "x", "same text"),
         (4, "y", "same text"), (5, "y", "unique here")],
        ["rid", "g", "body"])
    out = sampling.softdedup_weights(
        df, F.md5(F.col("body")), count_col="n", weight_col="w").collect()
    got = {r["rid"]: (r["n"], r["w"]) for r in out}
    # 'same text' appears 4x across groups: every member weighted 1/4
    for rid in (1, 2, 3, 4):
        assert got[rid] == (4, 0.25)
    assert got[5] == (1, 1.0)
    # effective size sums to the number of DISTINCT fingerprints
    assert abs(sum(w for _, w in got.values()) - 2.0) < 1e-9
    # all original columns survive
    assert set(out[0].asDict()) == {"rid", "g", "body", "n", "w"}
