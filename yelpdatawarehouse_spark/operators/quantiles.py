"""Re-aggregatable quantile sketches (KLL) — the distributed-percentile
scale path.

An exact percentile over 100 TB needs a full sort (or a per-group
``percentile`` whose state is every value); a KLL sketch is a bounded
buffer with a PROVEN normalized-rank-error bound (~1.65% at the default
k=200, Karnin-Lang-Liberty '16) that merges associatively — so quantiles
compose along a rollup hierarchy exactly like the HLL cardinality family
(queries/sketches.a_sketch_rollup_regions): sketch the leaves once, merge
upward, never touch the raw data again. That merge-without-rescan is the
property this module packages; Spark 4.1 ships the kernels
(kll_sketch_agg_double / kll_merge_agg_double).

Correctness contract (mirrors queries/sketches.py): KLL compaction is
RANDOMIZED, so estimates are not bit-reproducible across partitionings —
any hash-gate consumer must pair the estimate with an independently
computed exact value plus an in-envelope boolean, and tests assert the
rank-error envelope, never exact equality (tests/test_quantiles.py).

Reference analog: none (every reference percentile-ish stat is a full
scan); beyond-reference scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Per-group KLL sketches of ``value_col`` (cast to double): one
    map-side-combinable exchange; output rows carry (keys..., sketch) —
    a few KB per group regardless of group size."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "kll"
        )
    )


def merge_rollup(
    sketches: DataFrame,
    rollup_keys: list[str],
    quantiles: list[float],
) -> DataFrame:
    """Merge leaf sketches up a hierarchy level and read off quantile
    estimates: (rollup_keys..., n, q_<p> per requested quantile). The
    merge exchange carries sketch bytes only — the raw data is never
    rescanned, which is the entire point of the sketch path at scale."""
    merged = sketches.groupBy(*rollup_keys).agg(
        F.kll_merge_agg_double("kll").alias("kll")
    )
    cols: list[Column] = [
        F.kll_sketch_get_n_double("kll").cast("long").alias("n")
    ]
    for q in quantiles:
        cols.append(
            F.kll_sketch_get_quantile_double("kll", F.lit(float(q))).alias(
                f"q_{str(q).replace('.', '_')}"
            )
        )
    return merged.select(*rollup_keys, *cols)


def rank_of(df: DataFrame, keys: list[str], value_col: str,
            probe: DataFrame, probe_val: str) -> DataFrame:
    """Exact normalized rank of each probe value within its group — the
    audit side: join probes to the raw data per group and compute
    fraction-below. Used by tests to assert the KLL envelope; at scale
    you run it on a sampled audit slice, not the corpus."""
    v = F.col(value_col).cast("double")
    joined = df.select(*keys, v.alias("__v")).join(probe, keys)
    return (
        joined.groupBy(*keys)
        .agg(
            (
                F.sum(F.when(F.col("__v") <= F.col(probe_val), 1).otherwise(0))
                / F.count("*")
            ).alias("exact_rank"),
        )
    )
