"""Add-k–smoothed bigram language model over the documents corpus.

Extends the registered unigram LM (queries/llmops.text_unigram_logprob) one
Markov order up — the classic corpus-quality signal: a document whose
bigrams are improbable under the corpus model is boilerplate, spam, or
another language, and per-document average bigram log-probability is the
filter feature (used by e.g. CCNet-style quality pipelines with a KenLM
model; here the model is trained on the corpus itself, which is exactly
the in-domain perplexity variant).

Scale shape: counts are two map-side-combinable exchanges (unigram and
bigram keys — adjacency is derived INSIDE each row with a zip of the token
array against its own tail, so no positional self-join ever happens);
scoring joins each document's bigrams against the count tables on their
hash keys (the only corpus-sized joins, both equi) and folds per document
with one final groupBy. Everything is JVM-side expressions.

Reference analog: none (reference does no text modeling); beyond-reference
LLM-curation surface, companion to operators/bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def _doc_bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) rows: each document's adjacent token pairs, derived
    row-locally by zipping the token array with its own tail — no
    positional self-join, and the (expensive) split regex is evaluated a
    CONSTANT number of times per row. Same no-CSE-inside-HOF rationale as
    functions/text.shingles: element_at(tokens, i) inside a transform
    lambda re-runs the split per element (measured 4x there)."""
    toks = T.tokens(text_col)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return docs.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        _doc_bigrams(docs, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )


def score_bigram_addk(
    docs: DataFrame, alpha: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Per-document average add-k bigram log-probability:

        logP(w2 | w1) = ln( (c(w1, w2) + α) / (c(w1) + α · V) )

    with V the corpus unigram vocabulary size. Unseen bigrams of seen
    unigrams get the smoothed floor; every bigram in scope was observed at
    least once here (the model is trained on the scored corpus — the
    in-domain variant), so the join below is inner and exact. Returns
    (doc_id, n_bigrams, avg_logprob); single-token/empty documents score
    NULL avg over zero bigrams and keep their row (left join back to the
    corpus), so the output is one row per input document.
    """
    uni = unigram_counts(docs, text_col)
    bi = bigram_counts(docs, text_col)
    vocab = uni.agg(F.count("*").cast("double").alias("v"))
    scored_pairs = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("cnt").alias("c1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("cnt") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("lp"),
        )
    )
    per_doc = (
        _doc_bigrams(docs, text_col)
        .join(scored_pairs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("lp").alias("avg_logprob"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.col("avg_logprob"),
        )
    )
