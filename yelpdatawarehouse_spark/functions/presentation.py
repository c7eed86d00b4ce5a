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


def cavg(sum_col: Column, cnt_col: Column, ndigits: int = 2) -> Column:
    """Canonical average: rfix the SUM first (a sum of 2-decimal money
    values is a 0.01-quantized quantity, so its 2-digit rounding sits ~half
    a quantum from any floor boundary — robust to cross-engine/partition
    ulp noise), then divide by the exact integer count and round.

    Emitting ``rfix(avg(x))`` directly is NOT safe: an average can land
    bit-exactly on the rounding boundary (measured: 351473.995 at sf0.01),
    where a 1-ulp difference in accumulation order flips the last rounded
    digit. Deriving the emitted value from canonicalized intermediates
    makes both engines' inputs bit-identical, so the final rounding —
    whatever side of a boundary it falls on — agrees everywhere.
    """
    return rfix(rfix(sum_col, 2) / cnt_col, ndigits)


def cavg_sql(sum_expr: str, cnt_expr: str, ndigits: int = 2) -> str:
    """SQL twin of :func:`cavg` (same nested floor arithmetic)."""
    return rfix_sql(f"({rfix_sql(sum_expr, 2)}) / ({cnt_expr})", ndigits)
