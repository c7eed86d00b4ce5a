"""Bloom-filter semi-join: compress a large build side into a broadcastable
bitmap, prefilter the probe side with JVM-only bit tests, then (optionally)
verify exactly.

Why this exists at 100 TB: a plain semi-join between a fact table and a
large key set shuffles the FULL fact table on the join key. When the build
side is too big to broadcast as rows but its MEMBERSHIP can be approximated,
a Bloom bitmap of a few hundred KB summarizes hundreds of millions of keys;
broadcasting the bitmap lets every probe task drop non-members map-side, so
only `|matches| + false positives` rows ever reach the exact join's
exchange. Spark's own runtime row-group filtering uses the same idea
internally (InjectRuntimeFilter), but it is planner-heuristic and not
available as a composable operator; this one is explicit and reusable.

Everything is DataFrame ops — the bitmap is built with a groupBy/bit_or
aggregate (map-side combinable, result ≤ n_bits/64 rows), densified into a
ONE-ROW array<long> column, and broadcast via a 1-row crossJoin; the
probe-side membership test is `forall` over k hash positions with O(1)
array indexing, entirely inside whole-stage codegen. No Python UDFs, no
driver-side bit twiddling.

Reference analog: none directly — the reference's load path filters fact
rows against dimension membership with per-row lookups
(init/mysql_loader.py batched existence checks); this is the
shuffle-avoiding equivalent at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_bits: int, k: int) -> Column:
    """Array of k Bloom bit positions for a key: double hashing h1 + i*h2
    (Kirsch-Mitzenmacher) over xxhash64 with two seeds, so position
    computation is 2 hash calls, not k."""
    # reduce each hash mod n_bits BEFORE combining: ANSI mode (Spark 4
    # default) rejects the long wraparound the textbook h1 + i*h2 relies on
    h1 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x85EBCA6B)), F.lit(n_bits))
    return F.array_distinct(
        F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(k)])
    )


def bloom_bitmap(build: DataFrame, key: str, n_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """ONE-ROW DataFrame holding the Bloom bitmap of ``build[key]`` as a
    DENSE array<long> of n_bits/64 words (index = bit position div 64).

    Plan: project positions → explode → groupBy(pos div 64) with bit_or —
    one exchange whose cardinality is ≤ n_bits/64 regardless of build size
    — then a 1-row densification (sparse map → fixed-length array, n_bits/64
    map lookups ONCE at build time). Dense matters: Spark's element_at on a
    map is a linear scan per call, which would put an O(words) loop inside
    the per-probe-row filter; on an array it is O(1) indexing. The default
    128 Ki bits is a 2048-long array (16 KB serialized)."""
    words = (
        build.select(F.explode(_positions(F.col(key), n_bits, k)).alias("pos"))
        .groupBy((F.col("pos") / 64).cast("long").alias("word"))
        .agg(
            # call_function: the plain F.shiftleft binding takes only a
            # Python-int shift amount, but the SQL function accepts a column
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("pos") % 64).cast("int"),
                )
            ).alias("bits")
        )
    )
    sparse = words.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("bits")).alias(
            "__m"
        )
    )
    return sparse.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bits // 64 - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("__m"), w.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("__bloom")
    )


def _might_contain(bitmap: Column, key: Column, n_bits: int, k: int) -> Column:
    """True when every one of the key's k bit positions is set — the
    classic Bloom membership test (no false negatives, tunable false
    positives), as a single codegen-friendly boolean expression."""
    return F.forall(
        _positions(key, n_bits, k),
        # element_at on the DENSE array is O(1) (1-based; p < n_bits always)
        lambda p: (
            F.call_function(
                "shiftright",
                F.element_at(bitmap, ((p / 64).cast("int") + 1)),
                (p % 64).cast("int"),
            ).bitwiseAND(F.lit(1).cast("long"))
            == 1
        ),
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_bits: int = 1 << 17,
    k: int = 5,
    verify: bool = True,
    broadcast_verify: bool = False,
) -> DataFrame:
    """Semi-join ``probe`` to ``build`` on ``key`` via a Bloom prefilter.

    ``verify=True`` (default) follows the prefilter with an exact left-semi
    join against the build keys, so the result EQUALS the plain semi-join —
    the bitmap only reduces how many probe rows reach that join's shuffle.
    ``verify=False`` returns the prefiltered superset (no false negatives;
    false-positive rate ≈ (1 - e^(-k·n/n_bits))^k), for pipelines that
    tolerate approximate membership in exchange for zero probe shuffles.
    """
    bitmap = bloom_bitmap(build, key, n_bits, k)
    filtered = probe.crossJoin(F.broadcast(bitmap)).where(
        _might_contain(F.col("__bloom"), F.col(key), n_bits, k)
    ).drop("__bloom")
    if not verify:
        return filtered
    keys = build.select(key).distinct()
    # r14 (guide §3.1): when the caller KNOWS the build side is
    # dimension-bounded, broadcasting the exact key set keeps the verify
    # step map-side too — without it the planner (no stats through the
    # distinct) falls back to a sort-merge semi join that shuffles every
    # Bloom survivor, i.e. the exact shuffle the prefilter exists to
    # avoid. Default stays shuffled: the operator's contract is a build
    # side too big to broadcast as rows.
    if broadcast_verify:
        keys = F.broadcast(keys)
    return filtered.join(keys, key, "left_semi")
