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

    Spark arrays are 0-indexed via ``[]``; the SQL oracle uses 1-indexed
    lists — both iterate i = 1..n-k+1 and read k consecutive tokens.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens_col) - (k - 1), F.lit(0)))
    parts = lambda i: [tokens_col[i + j - 1] for j in range(k)]  # noqa: E731
    return F.when(F.size(tokens_col) >= k,
                  F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
                  ).otherwise(F.array().cast("array<string>"))


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
