"""The end-to-end corpus-curation funnel as a reusable library operator.

Composition form of the machinery behind ``pipeline_corpus_curation``
(queries/llmops.py) — the north-star job this engine exists for: a
Gopher-style quality gate (length / lexical diversity / stopword
presence) → exact dedup on the normalized-text fingerprint keeping the
lowest-id quality survivor → greedy per-group token-budget fill in
deterministic salted-hash priority order. A user with their own corpus
DataFrame runs the whole pipeline as::

    from yelpdatawarehouse_spark.operators import curation
    flags = curation.curation_flags(df, text_col="body", id_col="id",
                                    group_col="domain", budget=10**9)
    curated = flags.filter("in_budget")          # the surviving corpus keys
    funnel  = curation.curation_funnel(flags)    # per-group yield report

Scale shape (identical to the registry thin caller, whose DuckDB oracle
pins the semantics): the whole funnel is ONE pass with survivor FLAGS,
not a tree of recomputed branches — the quality gate is a row predicate
fused into the scan; "unique" is a row_number over the fingerprint
partition ordered QUALITY-FIRST, so rank 1 lands on the min-id quality
survivor without materializing the filter; the budget running sum counts
only unique-survivor tokens via a CASE inside the window; and the
per-group rollup reuses the budget window's partitioning. 2 exchanges,
2 windows, 1 scan, at any corpus size. No RNG anywhere: the budget
priority is a salted md5 of the id, so the curated set is a pure
function of the data (reproducible on any cluster layout).

Reference analog: none — the reference never curates text
(webapp/mysql_routes.py:619-626 only LIKE-filters it); this is
beyond-reference LLM-training-data surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as T

__all__ = ["curation_flags", "curation_funnel"]


def curation_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    min_tokens: int = 15,
    min_uniq_ratio: float = 0.35,
    min_stopword_ratio: float = 0.01,
    stopwords: Sequence[str] = T.STOPWORDS,
    budget: int = 400,
    salt: str = "curate:",
) -> DataFrame:
    """Row-level curation verdicts: one row per input document with the
    funnel flags ``q`` (passed the quality gate), ``is_unique`` (the
    canonical quality survivor of its exact-dup group), ``in_budget``
    (inside its group's greedy token budget), plus ``n_tokens`` and the
    running total ``cum``.

    ``filter("in_budget")`` is the curated corpus; aggregating the flags
    is the attrition report (:func:`curation_funnel`). Keeping verdicts
    as flags rather than filtered branches is what makes the funnel one
    pass — see the module docstring for the plan-shape argument.
    """
    toks = T.tokens(text_col)
    base = df.select(
        group_col,
        id_col,
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
        (T.marker_count(toks, tuple(stopwords)).cast("double") / F.size(toks)).alias(
            "stop_ratio"
        ),
        F.md5(T.normalize(text_col)).alias("fp"),
        hashing.md5_long(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ).alias("pri"),
    )
    q = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("uniq_ratio") >= min_uniq_ratio)
        & (F.col("stop_ratio") >= min_stopword_ratio)
    )
    # rank within each fingerprint with quality rows first: rank 1 == the
    # min-id QUALITY survivor, computed without materializing the filter
    w_fp = Window.partitionBy("fp").orderBy(F.col("q").desc(), id_col)
    flagged = base.withColumn("q", q).withColumn(
        "is_unique", F.col("q") & (F.row_number().over(w_fp) == 1)
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("pri", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok_if = F.when(F.col("is_unique"), F.col("n_tokens")).otherwise(F.lit(0))
    return flagged.withColumn("cum", F.sum(tok_if).over(wb)).withColumn(
        "in_budget", F.col("is_unique") & (F.col("cum") - F.col("n_tokens") < budget)
    )


def curation_funnel(
    flags: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Per-group yield funnel over a :func:`curation_flags` frame:
    input → quality → unique → budget-kept (+ surviving tokens). The
    aggregate reuses the budget window's group partitioning — no extra
    exchange."""
    return flags.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_input"),
        F.sum(F.col("q").cast("long")).cast("long").alias("n_quality"),
        F.sum(F.col("is_unique").cast("long")).cast("long").alias("n_unique"),
        F.sum(F.col("in_budget").cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("in_budget"), F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tokens_kept"),
    )
