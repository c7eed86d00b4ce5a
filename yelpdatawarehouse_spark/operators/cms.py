"""Count-min sketch: mergeable approximate frequency counters.

Completes the engine's sketch family (HLL distinct — sketches.py; KLL
quantiles — quantiles.py; theta set algebra — setsketch.py; Bloom
membership — bloom.py) with the frequency/point-query member: a d x W
counter matrix where each of d seeded hash rows increments one of W
buckets per observation, and a key's frequency estimate is the MIN of its
d counters (Cormode & Muthukrishnan 2005). Guarantees: estimate >= true
count always (counters only over-count via collisions); estimate <= true
count + e/W * N with probability 1 - (1/2)^d.

Representation: a (seed, bucket, c) DataFrame of at most d*W rows —
tiny and broadcastable at any input scale, which is the whole point:

* **Build** is one fact-scale groupBy over (seed, bucket) after a d-fold
  posexplode of the key column alone (project-first, so the fan-out
  carries 8 bytes/row, not the row). Map-side partial aggregation
  collapses each partition to <= d*W rows before the exchange — shuffle
  bytes are O(d*W * partitions), independent of row count.
* **Merge** is counter addition — sketches built per partition, per day,
  or per source combine losslessly (same re-aggregatability contract as
  the HLL rollup in a_sketch_rollup_regions), so a 100 TB corpus can be
  sketched incrementally and unioned.
* **Estimate** joins the query keys against the broadcast sketch d times
  (one hash per seed) and takes the min — O(d) per query key, no scan
  of the original data.

Hashing is the portable seeded-md5 family (functions/hashing.seeded), so
an oracle engine can rebuild the EXACT same counter matrix and estimates
in SQL — the draft query's gate is a full hash comparison, not an
envelope. ORACLE CONTRACT: ``cms_build`` drops NULL keys (they would
occupy d unreachable counter rows), so a SQL rebuild on a NULLABLE key
column must add ``WHERE key IS NOT NULL`` before grouping — without it
the rebuilt counter table carries d NULL-bucket rows the sketch never
has, and a hash-compare gate fails. (The registered
a_cms_frequency_check runs on non-null l_partkey, where the filter is a
no-op; any future draft on a nullable key needs it.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import seeded, seeded_sql

DEFAULT_DEPTH = 4  # d: number of hash rows
DEFAULT_WIDTH = 256  # W: buckets per row


def _bucket(col: Column, seed: int, width: int) -> Column:
    return seeded(col, seed) % width


def cms_build(
    df: DataFrame,
    key: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Sketch a key column into a (seed, bucket, c) counter table.

    ``key`` is referenced as a string column expression; values are cast
    to string before hashing so the construction is type-portable (the
    oracle side does ``CAST(.. AS VARCHAR)``).
    """
    k = F.col(key).cast("string")
    # NULL keys hash to a NULL bucket no estimate probe can ever reach —
    # drop them rather than carry d unreachable counter rows.
    src = df.where(k.isNotNull())
    rows = [
        src.select(
            F.lit(seed).alias("seed"),
            _bucket(k, seed, width).alias("bucket"),
        )
        for seed in range(depth)
    ]
    union = reduce(lambda a, b: a.unionByName(b), rows)
    return union.groupBy("seed", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Combine sketches built with identical (depth, width): counters add."""
    union = reduce(lambda a, b: a.unionByName(b), sketches)
    return union.groupBy("seed", "bucket").agg(
        F.sum("c").cast("long").alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-query frequencies for every row of ``keys``: join each of the
    d seeded buckets against the broadcast sketch, min over seeds.

    A bucket no key ever hashed to is absent from the sparse counter
    table; the left join + coalesce(0) keeps such a key's estimate 0
    (correct: its counter is empty in every row it misses... the min
    over PRESENT counters would over-estimate).
    """
    k = F.col(key).cast("string")
    probes = [
        keys.select(
            F.col(key),
            F.lit(seed).alias("seed"),
            _bucket(k, seed, width).alias("bucket"),
        )
        for seed in range(depth)
    ]
    probe = reduce(lambda a, b: a.unionByName(b), probes)
    joined = probe.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est")
    )


def cms_bucket_sql(expr: str, seed: int, width: int) -> str:
    """DuckDB rendering of the bucket function, for oracle SQL."""
    return f"({seeded_sql(expr, seed)} % {width})"
