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


# --- Universal-hash permutation family -------------------------------------
#
# MinHash needs k independent hash functions per shingle. Hashing the string
# k times (``seeded``) costs k md5 evaluations per row; the standard
# Carter-Wegman construction h_i(x) = (a_i * H(x) + b_i) mod p needs only ONE
# string hash plus k integer ops — identical arithmetic in any SQL engine,
# and 16× less hashing at 100 TB. p = 2^31 - 1 (Mersenne); H(x) is reduced
# mod p first so a_i * (H mod p) + b_i < 2^62 never overflows int64 on
# either engine.

MERSENNE = (1 << 31) - 1


def _perm_coeffs(n: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a fixed-seed LCG (no RNG dependency —
    the same Python generates both the Spark plan and the SQL oracle)."""
    coeffs, state = [], 0x5DEECE66D
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (MERSENNE - 1) + 1  # a in [1, p-1]
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE  # b in [0, p-1]
        coeffs.append((a, b))
    return coeffs


PERM_COEFFS = _perm_coeffs(64)


def perm(hash_col: Column, i: int) -> Column:
    """i-th permutation of an already-reduced hash column (h must be < p)."""
    a, b = PERM_COEFFS[i]
    return (F.lit(a) * hash_col + F.lit(b)) % F.lit(MERSENNE)


def perm_sql(hash_expr: str, i: int) -> str:
    a, b = PERM_COEFFS[i]
    return f"(({a} * {hash_expr} + {b}) % {MERSENNE})"
