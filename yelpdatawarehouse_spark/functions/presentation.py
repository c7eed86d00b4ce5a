"""Presentation-edge numeric canonicalization.

Floating aggregates must hash identically between the engine and any ANSI-SQL
oracle. ``round()`` is NOT portable: Spark rounds the shortest decimal
representation (BigDecimal HALF_UP on Double.toString), DuckDB rounds the
binary value — they disagree on decimal ties (e.g. 37704.575 → .58 vs .57).

``floor(x * 10^n + 0.5) / 10^n`` uses only IEEE-754 multiply/add/floor/divide,
which every engine executes bit-identically on the same input double, so the
tie side is deterministic everywhere. (Negatives round half toward +inf —
consistently on both sides, which is what matters.)

Columns copied from storage without arithmetic are emitted raw — already
exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rfix(col: Column | str, ndigits: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    p = 10**ndigits
    return F.floor(c * p + F.lit(0.5)) / p


def rfix_sql(expr: str, ndigits: int = 2) -> str:
    p = 10**ndigits
    return f"(floor(({expr}) * {p} + 0.5) / {p})"
