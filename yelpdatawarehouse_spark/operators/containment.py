"""Containment dedup: find documents (nearly) CONTAINED in another.

Symmetric similarity (Jaccard — the MinHash/n-gram family in
queries/llmops.py) misses the commonest real-corpus duplication shape:
document B is document A plus a header, a quote plus commentary, a
superset crawl of the same page. There |A∩B|/|A∪B| is small while the
containment of the smaller document, |A∩B| / min(|A|, |B|), is ≈ 1. This
operator computes exactly that score over k-gram fingerprint sets — the
LLM-curation step that keeps the superset and drops the contained copy.

Scale shape (same as the shingle-join family): distinct (doc, fingerprint)
rows, one exchange keyed by the 8-byte fingerprint to co-locate shared
shingles, per-pair shared counts from the bucket join (never a cross
join — only documents sharing a fingerprint ever meet), set sizes joined
back, one filter. A pathologically common shingle creates a hot
fingerprint key; the ``max_df`` guard drops fingerprints appearing in more
than that many documents BEFORE the pair join — the standard stop-shingle
cut. Note its exact effect: dropped shingles leave the per-document set
sizes (the containment denominator) untouched but shrink the SHARED
count, so every pair whose overlap includes common shingles scores lower
and can fall under the threshold even when part of its overlap is rare —
a deliberate recall-for-throughput trade (boilerplate-dominated overlap
is exactly what it discounts). Run with ``max_df=None`` when the
brute-force-equivalent result is required (the oracle-gated mode).

Reference analog: none; beyond-reference LLM-curation surface, companion
to dedup_ngram_jaccard_pairs (symmetric) and operators/boilerplate.py
(line-level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as T


def fingerprint_rows(
    docs: DataFrame, k: int = 4, text_col: str = "text"
) -> DataFrame:
    """Distinct (doc_id, fp) rows: md5-derived 64-bit hashes of the
    document's token k-grams (the same shingle hashing the Jaccard family
    uses, so scores are comparable across operators)."""
    shingles = T.shingles(T.tokens(text_col), k)
    fps = F.array_distinct(
        F.transform(shingles, lambda s: hashing.md5_long(s))
    )
    return docs.select("doc_id", F.explode(fps).alias("fp"))


def containment_pairs(
    docs: DataFrame,
    k: int = 4,
    threshold: float = 0.8,
    max_df: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, shared, n_a, n_b, containment) for every pair whose
    smaller-side containment |A∩B| / min(|A|, |B|) reaches ``threshold``
    (doc_a < doc_b). ``max_df`` drops fingerprints occurring in more than
    that many documents before the pair join (stop-shingle guard)."""
    rows = fingerprint_rows(docs, k=k, text_col=text_col)
    sizes = rows.groupBy("doc_id").agg(F.count("*").alias("n"))
    if max_df is not None:
        rare = (
            rows.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("fp")
        )
        rows = rows.join(rare, "fp")
    a = rows.select(F.col("doc_id").alias("doc_a"), "fp")
    b = rows.select(F.col("doc_id").alias("doc_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn(
            "containment",
            F.col("shared") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "shared", "n_a", "n_b", "containment")
    )


def keep_supersets(pairs: DataFrame) -> DataFrame:
    """Action policy over containment_pairs output: for each qualifying
    pair, the SMALLER document (fewer fingerprints; ties to the higher
    doc_id, so the earliest-id superset survives) is marked for removal.
    Returns distinct (doc_id) rows to drop."""
    victim = F.when(F.col("n_a") < F.col("n_b"), F.col("doc_a")).when(
        F.col("n_b") < F.col("n_a"), F.col("doc_b")
    ).otherwise(F.greatest("doc_a", "doc_b"))
    return pairs.select(victim.alias("doc_id")).distinct()
