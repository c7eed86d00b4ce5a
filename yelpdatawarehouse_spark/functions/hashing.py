"""Deterministic, engine-portable hashing.

Every hash-based operator in this engine (exact dedup, MinHash-LSH, SimHash,
fingerprinting) is built on one primitive: a 60-bit unsigned integer derived
from the first 15 hex chars of md5. Unlike murmur3 (`F.hash`) or xxhash64,
md5 is available with identical semantics in every ANSI-SQL engine, which
makes each operator's output verifiable against an independent SQL oracle —
our substitute for the reference's (absent) test suite (SURVEY.md §5).

60 bits fit comfortably in a signed 64-bit long, so no overflow/sign
mismatch between engines.

Spark side:   conv(substring(md5(x), 1, 15), 16, 10)::long   (all JVM-side)
DuckDB side:  ('0x' || substr(md5(x), 1, 15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def md5_long(col: Column | str) -> Column:
    """60-bit integer hash of a string column (JVM-side, codegen-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The DuckDB/ANSI rendering of :func:`md5_long` for oracle queries."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def seeded(col: Column | str, seed: int) -> Column:
    """Family of independent hash functions h_seed(x) = md5(seed || ':' || x).

    This is the MinHash permutation family: k independent functions obtained
    by prefixing the seed (a standard construction; cf. Broder '97 resemblance
    sketches). Identical construction on the SQL side keeps signatures
    bit-equal across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{seed}:"), c))


def seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'{seed}:' || {expr}")
