"""operators/containment.py: containment dedup vs a python set model."""

from __future__ import annotations

import pytest

from yelpdatawarehouse_spark.operators.containment import (
    containment_pairs,
    fingerprint_rows,
    keep_supersets,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta"
DOCS = [
    (0, BASE),                                            # the original
    (1, BASE + " iota kappa"),                            # superset of 0
    (2, "intro words here " + BASE),                      # superset of 0
    (3, "totally different content about other things entirely"),
    (4, "alpha beta gamma delta"),                        # tiny prefix: 1 shingle
    (5, BASE),                                            # exact duplicate of 0
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_sets(k=4):
    sets = {}
    for doc_id, text in DOCS:
        toks = text.split()
        sets[doc_id] = {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
    return sets


def _py_pairs(threshold, k=4):
    sets = _py_sets(k)
    out = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j and sets[i] and sets[j]:
                shared = len(sets[i] & sets[j])
                c = shared / min(len(sets[i]), len(sets[j]))
                if shared and c >= threshold:
                    out[(i, j)] = (shared, len(sets[i]), len(sets[j]), c)
    return out


def test_fingerprint_rows_sizes_match_python(spark):
    sets = _py_sets()
    rows = fingerprint_rows(_docs(spark)).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add(r.fp)
    assert {d: len(s) for d, s in got.items()} == {
        d: len(s) for d, s in sets.items() if s
    }


@pytest.mark.parametrize("threshold", [0.8, 0.5, 1.0])
def test_pairs_match_python_model(spark, threshold):
    exp = _py_pairs(threshold)
    got = {
        (r.doc_a, r.doc_b): (r.shared, r.n_a, r.n_b, round(r.containment, 9))
        for r in containment_pairs(_docs(spark), threshold=threshold).collect()
    }
    assert got.keys() == exp.keys()
    for key, (shared, na, nb, c) in exp.items():
        gs, gna, gnb, gc = got[key]
        assert (gs, gna, gnb) == (shared, na, nb)
        assert abs(gc - c) < 1e-9


def test_containment_catches_what_jaccard_misses(spark):
    """Doc 2 contains doc 0 with containment 1.0 while the symmetric
    Jaccard is well below a typical 0.8 dedup threshold — the operator's
    reason to exist."""
    sets = _py_sets()
    jac = len(sets[0] & sets[2]) / len(sets[0] | sets[2])
    assert jac < 0.8
    pairs = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(_docs(spark), threshold=0.99).collect()
    }
    assert pairs[(0, 2)] == 1.0


def test_keep_supersets_drops_contained_side(spark):
    pairs = containment_pairs(_docs(spark), threshold=0.99)
    dropped = {r.doc_id for r in keep_supersets(pairs).collect()}
    # 0 is contained in 1 and 2; 5 duplicates 0 exactly (tie -> higher id)
    assert 0 in dropped and 5 in dropped
    assert 1 not in dropped and 2 not in dropped and 3 not in dropped


def test_max_df_guard_prunes_common_shingles(spark):
    # every shingle of BASE appears in docs 0, 1, 2, 5 -> df >= 4; with
    # max_df=3 those fingerprints vanish and no candidate pairs remain
    out = containment_pairs(_docs(spark), threshold=0.5, max_df=3).collect()
    assert out == []


def test_determinism_across_partitioning(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, containment_pairs(docs).collect()))
    b = sorted(map(tuple, containment_pairs(docs.repartition(7)).collect()))
    assert a == b


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert containment_pairs(empty).count() == 0
