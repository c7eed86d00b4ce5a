"""Distributed BPE tokenizer training and application.

Architecture mirrors production tokenizer trainers (HF tokenizers /
sentencepiece train on word counts, not raw text): the distributed part is
the corpus → (word, count) collapse — ONE map-side-combinable exchange whose
output is vocabulary-sized (Zipf-bounded regardless of corpus size, the same
bounded-collect argument as the k-means centroid pull in queries/llmops.py).
The greedy merge loop then runs driver-side over that bounded vocabulary,
and application fans back out as an Arrow-batched pandas UDF over DISTINCT
words (vocab-sized input), never per token instance.

Reference analog: none — the reference never tokenizes (its only text
operation is LIKE filtering, webapp/mysql_routes.py:619-626); this is part
of the beyond-reference LLM-training-data surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import text as T

Merge = tuple[str, str]


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (w, cnt): the distributed collapse every tokenizer-training
    step runs on. One exchange, map-side combinable."""
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[Merge, int]:
    counts: dict[Merge, int] = {}
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + cnt
    return counts


def _merge_word(syms: tuple[str, ...], pair: Merge) -> tuple[str, ...]:
    """Merge every occurrence of ``pair``, leftmost first (canonical BPE)."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_vocab: int = 200_000,
) -> list[Merge]:
    """Learn ``n_merges`` BPE merge rules from ``docs``.

    The collect is bounded: at most ``max_vocab`` distinct words (the most
    frequent, ties broken by word for determinism) cross the driver
    boundary — the standard trainer bound (tokenizer quality saturates long
    before the vocabulary tail matters). Candidate-pair ties break by
    (count DESC, pair ASC), so training is deterministic for a given
    corpus. The loop itself is O(n_merges · Σ word_len) over the bounded
    vocabulary — driver-side by design, like every production trainer.
    """
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(max_vocab)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        if r["w"]:
            vocab[tuple(r["w"])] = vocab.get(tuple(r["w"]), 0) + r["cnt"]
    merges: list[Merge] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best_cnt = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == best_cnt)
        merges.append(best_pair)
        vocab = {
            _merge_word(syms, best_pair): cnt for syms, cnt in vocab.items()
        }
    return merges


def segment_word(word: str, ranks: dict[Merge, int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    lowest-ranked (earliest-learned) pair present, leftmost occurrence
    first — the canonical greedy BPE encoder."""
    syms: list[str] = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = list(_merge_word(tuple(syms), best_pair))
    return syms


def bpe_segmenter(merges: list[Merge]):
    """Arrow-batched pandas UDF: word → array<string> of BPE symbols.
    ``merges`` ships to executors inside the UDF closure (small — the rule
    table is O(n_merges))."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: segment_word(w, ranks) if w else [])

    return seg


def bpe_symbol_counter(merges: list[Merge]):
    """Arrow-batched pandas UDF: word → number of BPE symbols after
    applying ``merges`` (the cheap path when only sizes are needed)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("long")
    def nsyms(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(segment_word(w, ranks)) if w else 0)

    return nsyms
