"""C4-style boilerplate removal: drop lines that repeat across documents.

The classic web-corpus cleanup (C4, RefinedWeb, Gopher/MassiveText all ship
a variant): navigation chrome, cookie banners, and footers appear verbatim
in thousands of pages, so any line whose normalized form occurs in at least
``min_docs`` DISTINCT documents is removed from every document; unique
prose survives. This is deduplication at LINE granularity — document-level
dedup (MinHash & co., queries/llmops.py) can't touch it because the
surrounding prose differs per page.

Scale shape (the 100 TB argument): one explode to (doc_id, line) rows, one
map-side-combinable exchange to per-line distinct-document counts — the
only corpus-sized shuffle — then the frequent-line set (Zipf-bounded: lines
repeated across ≥ min_docs documents are by construction few relative to
the corpus, the same bound the C4 pipeline relies on) broadcasts back as a
left-anti join on the line key, and documents reassemble with one groupBy
on doc_id. Normalization (trim + casefold) happens before hashing so
cosmetic whitespace/case variants of a banner still collapse; the line key
travels as the repo's portable md5-derived 60-bit hash
(functions/hashing.md5_long — the module-wide rule that keeps every
operator's arithmetic reproducible in the DuckDB oracle, md5_long_sql),
so the frequency table is engine-verifiable bit-for-bit.

Reference analog: none (the reference never processes document text beyond
LIKE filters, webapp/mysql_routes.py:619-626); beyond-reference
LLM-curation surface, companion to dedup_span_first_occurrence (span-level)
and the document-level dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing


def _lines(docs: DataFrame, text_col: str, delim: str) -> DataFrame:
    """(doc_id, pos, line, key): positioned split of each document with the
    normalized portable line key. Position is kept so documents reassemble
    in original order after filtering."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    ).withColumn("key", hashing.md5_long(F.lower(F.trim(F.col("line")))))


def line_frequencies(
    docs: DataFrame, text_col: str = "text", delim: str = "\n"
) -> DataFrame:
    """Per-line distinct-document counts: (key, line, n_docs), one row per
    normalized line form (an arbitrary-but-deterministic original spelling
    is kept via min(line) for reporting)."""
    return (
        _lines(docs, text_col, delim)
        .groupBy("key")
        .agg(
            F.min("line").alias("line"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Remove every line occurring in ≥ ``min_docs`` distinct documents.

    Returns one row per input document: (doc_id, <text_col> cleaned,
    n_lines_kept, n_lines_removed). Documents whose every line was
    boilerplate survive with empty text — dropping them is a separate
    policy decision left to the caller (the C4 pipeline keeps them for
    the length filter to cull).
    """
    lines = _lines(docs, text_col, delim)
    frequent = (
        lines.groupBy("key")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("key")
    )
    kept = lines.join(F.broadcast(frequent), "key", "left_anti")
    total = lines.groupBy("doc_id").agg(F.count("*").alias("n_total"))
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                delim,
            ).alias(text_col),
            F.count("*").alias("n_lines_kept"),
        )
    )
    return (
        total.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (F.col("n_total") - F.coalesce("n_lines_kept", F.lit(0))).alias(
                "n_lines_removed"
            ),
        )
    )
