"""Text-analysis functions for large-scale corpus processing.

All JVM-side (split/filter/transform/aggregate higher-order functions) —
no Python UDFs in any hot path. Each helper has a documented ANSI-SQL
equivalent used by the correctness oracles.

These extend the reference's text surface (review text is stored but never
analyzed beyond LIKE filters, webapp/mysql_routes.py:619-626) with the
operators a training-data pipeline needs: tokenization, n-gram shingling,
quality scoring, language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the heuristic language classifier.
# Deterministic and SQL-portable; precision is not the point (the synthetic
# corpus is vocab-random) — engine/oracle agreement is.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}
LANG_PRIORITY = ("en", "es", "de", "fr", "zh")  # deterministic tie-break

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization. SQL: string_split_regex(text, '\\s+')."""
    return F.split(F.col(col), r"\s+")


def normalize(col: str = "text") -> Column:
    """lower + collapse whitespace + strip non [a-z0-9 ] — canonical form
    for fingerprinting. Same regex pipeline on the SQL side."""
    c = F.lower(F.col(col))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def shingles(tokens_col: Column, k: int = 3) -> Column:
    """k-token shingles as space-joined strings, 1..n-k+1 (empty array when
    the doc is shorter than k).

    Formulated as ``zip_with`` over k shifted ``slice``s so the (possibly
    expensive) ``tokens_col`` expression is evaluated only k times per row.
    The naive ``transform(sequence(...), i -> t[i]||' '||t[i+1]||...)``
    re-evaluates the token-split regex on every element access inside the
    lambda (no common-subexpression elimination within higher-order
    functions) — measured 4× slower at sf0.1.
    """
    m = F.greatest(F.size(tokens_col) - (k - 1), F.lit(0))
    acc = F.slice(tokens_col, 1, m)
    for j in range(2, k + 1):
        acc = F.zip_with(
            acc, F.slice(tokens_col, j, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(tokens_col) >= k, acc).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(toks: str, k: int = 3) -> str:
    joined = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1), "
        f"i -> {joined}) ELSE [] END"
    )


def marker_count(tokens_col: Column, markers: tuple[str, ...]) -> Column:
    """# tokens that are in the marker list (with repetition)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(arr, t)))


def marker_count_sql(toks: str, markers: tuple[str, ...]) -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter({toks}, t -> list_contains({lst}, t)))"
