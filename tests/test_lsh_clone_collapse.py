"""Duplicate-corpus regression for ann_lsh_bucket_topk's clone collapse.

The registered corpora have all-distinct embeddings, so the parity gate
exercises only the degenerate all-singleton-group path. This test plants
exact-duplicate vectors (the regime the collapse exists for: the naive
bucket self-join is quadratic in the duplication factor) and checks the
collapsed plan against the UNCOLLAPSED oracle SQL on the same parquet —
expansion must reconstruct every member's top-3, ties and self-exclusion
included, bit-for-bit.
"""

from __future__ import annotations

import os

import duckdb
import pytest


@pytest.fixture(scope="module")
def dup_sf(spark, tmp_path_factory):
    """An embeddings table where vectors 0..9 each appear 5x (clone groups
    of 5, consecutive ids) plus 10 singletons — small enough for the O(n²)
    oracle, duplicated enough that every expansion branch fires (within-
    group self-exclusion, cross-group tie interleaving, first-4 member
    truncation: group size 5 > 4)."""
    import random

    rnd = random.Random(8)
    rows = []
    vid = 0
    for g in range(10):
        vec = [round(rnd.uniform(-1, 1), 3) for _ in range(16)]
        for _ in range(5):
            rows.append((vid, vec, g))
            vid += 1
    for g in range(10):
        vec = [round(rnd.uniform(-1, 1), 3) for _ in range(16)]
        rows.append((vid, vec, 100 + g))
        vid += 1
    sf = str(tmp_path_factory.mktemp("lsh_dup") / "sf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    return sf


def test_collapsed_topk_matches_naive_oracle_on_duplicated_corpus(spark, dup_sf):
    from yelpdatawarehouse_spark.queries import all_queries

    qd = all_queries()["ann_lsh_bucket_topk"]
    got = sorted(
        (r.query_id, r.rn, r.neighbor_id, r.bucket, r.cos_sim)
        for r in qd.fn(spark, dup_sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(dup_sf, 'embeddings.parquet')}/*.parquet')"
    )
    want = sorted(
        (q, rn, n, b, c)
        for q, n, b, c, rn in con.execute(qd.oracle).fetchall()
    )
    assert got == want and len(want) > 0
    # the duplication actually exercised the collapse: every member of a
    # clone group must list 3 neighbors led by its own clones (cosine 1.0
    # beats any non-parallel vector; within the tie, lowest ids win)
    by_q = {}
    for q, rn, n, b, c in got:
        by_q.setdefault(q, []).append(n)
    for q in range(5):  # members of clone group 0 (ids 0..4)
        mates = [n for n in by_q[q] if n < 5]
        assert len(mates) == 3 and mates == sorted(mates)
