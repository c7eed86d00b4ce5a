"""Skew-mitigation operators for hot keys at 100 TB.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py): it splits oversized shuffle partitions at runtime. These
operators cover the cases AQE cannot fix:

* a sort-merge/shuffled-hash JOIN where ONE key carries a large fraction of
  the fact table and the other side is too big to broadcast → `salted_join`
  replicates the dimension side per salt so the hot key spreads over
  `n_salts` reducers;
* an exact COUNT(DISTINCT x) per key where a hot key's distinct-set must fit
  one reducer → `salted_distinct_count` dedups on (key, salt, x) first, then
  sums per-salt partial distinct counts (exact, since the same x always
  lands in the same salt bucket).

Salts are derived from a deterministic hash of the row (never rand(): retry
of a failed task must re-produce the same salt or the shuffle is corrupt).

Reference context: the reference never handles skew (single-node stores,
demo scale) — this is part of the 100 TB design mandate (BASELINE.json
north star), not a parity item.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(col: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): stable across task retries."""
    return F.pmod(F.xxhash64(col.cast("string")), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big[key]` is skewed and `small` is too large to
    broadcast: big rows get a salt from a high-cardinality column
    (`salt_source`, default the key row's hash of all columns via the first
    non-key column), small rows are replicated once per salt, and the join
    runs on (key, salt) — the hot key's rows spread across n_salts tasks.

    Cost model: small side shuffles n_salts× its size; big side shuffles 1×.
    Worth it when (hot-key fraction × big) ≫ n_salts × small.
    """
    if salt_source is None:
        non_key = [c for c in big.columns if c != key]
        salt_source = non_key[0] if non_key else key
    b = big.withColumn("__salt", _salt_of(F.col(salt_source), n_salts))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    s = small.select("*", salts)
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n_salts: int = 8
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key for skewed keys, in two stages:

    1. dedup on (key, salt(value), value) — map-side combine shrinks the
       hot key's stream before any single reducer sees it;
    2. count distinct within each (key, salt) bucket, then SUM the partials.

    Exact because salt is a pure function of value: every occurrence of the
    same value lands in the same bucket, and buckets partition the value
    space — partial distinct counts are disjoint.
    Returns (key, distinct_cnt).
    """
    salted = df.select(key, value).withColumn("__salt", _salt_of(F.col(value), n_salts))
    partial = (
        salted.groupBy(key, "__salt")
        .agg(F.countDistinct(value).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").cast("long").alias("distinct_cnt"))
