"""Focused tests for the round-14 optimization-round internals changes.

Each test pins the EQUIVALENCE argument an optimization relied on:

* ``ann.blocked_cosine_rows`` — the blocked matmul that replaced the
  k x k single-shot kernels in ``ann_lsh_bucket_topk`` /
  ``dedup_embedding_cosine_pairs`` (guide §2.5/§5: a hot bucket must
  stream row blocks, not materialize the square) must reproduce the full
  pairwise cosine matrix row for row, including on a "hot bucket" far
  larger than the block height and on ragged final blocks.
* ``_basket_pair_rows`` now pins its basket input (guide §1.2: the
  small/large union evaluated the whole upstream subtree twice); the
  pair semantics across the small/large threshold must be unchanged.
* The symmetrize-by-explode rewrites (trade_edges, kcore/LPA/AA edge
  unions) must produce exactly the union-form edge set.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.ann import (
    COSINE_BLOCK_ROWS,
    blocked_cosine_rows,
)


def _full_cosine(ma, na, mb, nb):
    return (ma @ mb.T) / np.outer(na, nb)


def _rng_matrix(n, d, seed):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d)
    return m, np.sqrt((m * m).sum(axis=1))


def test_blocked_cosine_covers_hot_bucket_exactly():
    # 1000-row "hot bucket" with block height 64: 15 full blocks + one
    # ragged 40-row tail. Every row block must equal the corresponding
    # rows of the unblocked matmul (same GEMM row-dots).
    ma, na = _rng_matrix(1000, 16, seed=7)
    full = _full_cosine(ma, na, ma, na)
    seen = 0
    for i0, blk in blocked_cosine_rows(ma, na, ma, na, block_rows=64):
        assert i0 == seen
        np.testing.assert_allclose(blk, full[i0:i0 + blk.shape[0]], rtol=0, atol=1e-12)
        seen += blk.shape[0]
    assert seen == 1000


def test_blocked_cosine_rectangular_sides():
    ma, na = _rng_matrix(37, 8, seed=1)
    mb, nb = _rng_matrix(53, 8, seed=2)
    full = _full_cosine(ma, na, mb, nb)
    out = np.vstack([blk for _, blk in blocked_cosine_rows(ma, na, mb, nb, block_rows=10)])
    np.testing.assert_allclose(out, full, rtol=0, atol=1e-12)


def test_blocked_cosine_single_block_when_small():
    ma, na = _rng_matrix(5, 4, seed=3)
    blocks = list(blocked_cosine_rows(ma, na, ma, na, block_rows=COSINE_BLOCK_ROWS))
    assert len(blocks) == 1 and blocks[0][0] == 0
    np.testing.assert_allclose(blocks[0][1], _full_cosine(ma, na, ma, na),
                               rtol=0, atol=1e-12)


def _pairs(spark, baskets, threshold):
    from yelpdatawarehouse_spark.queries.relational import _basket_pair_rows

    df = spark.createDataFrame(
        [(sorted(b),) for b in baskets], "arr array<long>"
    )
    rows = _basket_pair_rows(
        df, "arr", "a", "b", threshold, 4
    ).select(F.col("p.a"), F.col("p.b")).collect()
    return sorted((int(r["a"]), int(r["b"])) for r in rows)


def test_basket_pair_rows_pinned_semantics_unchanged(spark):
    # Baskets straddling the small/large threshold: the pinned frame must
    # yield exactly the ordered (i < j) pairs of each sorted basket.
    baskets = [[3, 1, 2], list(range(10)), [7], []]
    expect = sorted(
        (x, y)
        for b in baskets
        for i, x in enumerate(sorted(b))
        for y in sorted(b)[i + 1:]
    )
    assert _pairs(spark, baskets, threshold=5) == expect
    # and identically with every basket under / over the threshold
    assert _pairs(spark, baskets, threshold=100) == expect
    assert _pairs(spark, baskets, threshold=1) == expect


def test_basket_pair_rows_plans_flat(spark):
    # The pin must actually cut lineage: no FileScan/parquet source may
    # appear below the pair expansion (regression guard for the r14
    # double-evaluation fix).
    from yelpdatawarehouse_spark.queries.relational import _basket_pair_rows

    df = spark.createDataFrame([([1, 2, 3],)], "arr array<long>")
    plan = _basket_pair_rows(df, "arr", "a", "b", 64, 4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "FileScan" not in plan


def test_symmetrize_explode_equals_union(spark):
    # The explode-based symmetrization (trade_edges / kcore / LPA / AA)
    # must equal the union form as a SET for any directed input,
    # including antiparallel pairs and self-loops.
    directed = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 5)], "src long, dst long"
    ).distinct()
    union_form = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    explode_form = (
        directed.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    assert sorted(map(tuple, union_form.collect())) == sorted(
        map(tuple, explode_form.collect())
    )
