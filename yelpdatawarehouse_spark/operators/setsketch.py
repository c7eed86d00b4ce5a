"""Theta sketches: re-aggregatable set EXPRESSIONS (union / intersect /
difference cardinalities).

HLL (queries/sketches.py) answers only union-style cardinality questions;
intersections there ride inclusion-exclusion, whose error compounds per
term. A theta sketch (Dasgupta et al., the DataSketches theta family —
Spark 4.1 ships the kernels) keeps a bounded uniform sample of hashed
keys, so arbitrary set algebra composes sketch-side with bounded relative
error — and is EXACT while a sketch stays below its nominal capacity
(2^lgNomEntries distinct keys), because until saturation every distinct
hash is retained. That exactness-below-saturation is what makes theta
results hash-gateable at harness scale while the same code path degrades
gracefully to estimation at 100 TB.

Typical corpus questions this answers without rescanning data: how many
users appear in BOTH event types; how many tokens are unique to one
source; incremental audience overlap across rollup levels.

Scale shape: one map-side-combinable exchange to per-group sketches (few
KB each), then all set algebra runs over the sketch table — the pair
"join" is |groups|² sketch rows, never raw keys; same argument as the HLL
and KLL rollups.

Reference analog: none (reference set math is exact SQL over full scans);
beyond-reference scale surface completing the sketch family (HLL
cardinality, KLL quantiles, theta set algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theta_group_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group theta sketches of ``value_col``: (keys..., theta)."""
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(value_col, lg_k).alias("theta")
    )


def merged_distinct(
    sketches: DataFrame, rollup_keys: list[str], lg_k: int = 12
) -> DataFrame:
    """Union-merge sketches up a hierarchy: (rollup_keys..., n_distinct).

    ``lg_k`` MUST match the value the sketches were built with: the union
    gadget has its own nominal capacity (kernel default 2^12), so leaving
    it lower than the inputs' silently re-introduces sampling — and breaks
    the exact-below-capacity contract — even when every input sketch is
    still exact."""
    return (
        sketches.groupBy(*rollup_keys)
        .agg(F.theta_union_agg("theta", lg_k).alias("theta"))
        .select(
            *rollup_keys,
            F.theta_sketch_estimate("theta").cast("long").alias("n_distinct"),
        )
    )


def pairwise_set_algebra(
    sketches: DataFrame, key_col: str, lg_k: int = 12
) -> DataFrame:
    """Full set algebra for every group pair (a < b), straight from the
    sketch table: |A∪B|, |A∩B|, |A\\B|, |B\\A| estimates plus the Jaccard
    they imply. Exact whenever the inputs stayed below sketch capacity —
    provided ``lg_k`` matches the build-side value (see merged_distinct:
    the pairwise union gadget also has its own capacity)."""
    a = sketches.select(
        F.col(key_col).alias("key_a"), F.col("theta").alias("ta")
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"), F.col("theta").alias("tb")
    )
    pairs = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
    union = F.theta_sketch_estimate(F.theta_union("ta", "tb", lg_k))
    inter = F.theta_sketch_estimate(F.theta_intersection("ta", "tb"))
    a_only = F.theta_sketch_estimate(F.theta_difference("ta", "tb"))
    b_only = F.theta_sketch_estimate(F.theta_difference("tb", "ta"))
    return pairs.select(
        "key_a",
        "key_b",
        union.cast("long").alias("n_union"),
        inter.cast("long").alias("n_intersect"),
        a_only.cast("long").alias("n_a_only"),
        b_only.cast("long").alias("n_b_only"),
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )
