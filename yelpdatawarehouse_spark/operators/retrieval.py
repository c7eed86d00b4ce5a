"""Reusable lexical/hybrid retrieval operators over ARBITRARY DataFrames.

Phase 5 of the library-extraction program (after dedup/ann r10,
textops/sampling/curation r11, graphalgs/embeddings r12): the retrieval
stack behind the ``text_bm25_topk`` / ``text_rrf_hybrid_topk`` /
``text_mmr_diverse_topk`` registry queries as parameterized functions::

    from yelpdatawarehouse_spark.operators import retrieval
    scores = retrieval.bm25_scores(docs, terms=("join", "stream"))
    top    = retrieval.bm25_topk(docs, terms=..., k1=0.9, b=0.4, topk=8)
    lex    = retrieval.rank_topk(scores, "score", depth=50,
                                 rank_col="lex_rank")
    fused  = retrieval.rrf_fuse([(lex, "lex_rank"), (vec, "vec_rank")])
    divers = retrieval.mmr_select(pool, toks, rounds=3, lam=0.7)

Reference analog: the reference's search surface is SQL LIKE / Mongo
regex (webapp/mysql_routes.py:587 search_businesses); ranked retrieval,
rank fusion and diversification are beyond-reference RAG-stack surface
(SURVEY §6).

Design rules (the registry queries' DuckDB oracles pin the semantics):

* Rankings order by fixed-digit-canonicalized scores with an id
  tie-break, so independent engines pick identical rows; RRF's fused
  score is then pure integer-reciprocal arithmetic — bit-exact.
* Scale shapes: BM25's term-frequency exchange carries only
  query-matching tokens (the filter runs inside the explode
  projection); df/corpus-stats ride broadcasts; every top-k is a
  TakeOrdered, never a global sort; MMR's greedy rounds each join the
  pool against ONE selected document's token set (1-row-driven
  broadcast semi-joins) — never a pool×pool similarity join.
* Iterative state (MMR) is pinned per round (:func:`~.iterative.pin`):
  unpinned, the scan+tokenize subtree re-evaluated 69× over three
  rounds (measured round 8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.presentation import rfix
from .iterative import pin

__all__ = [
    "bm25_scores",
    "bm25_topk",
    "rank_topk",
    "rrf_fuse",
    "mmr_select",
]


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every matching document for a bag-of-terms query
    (Robertson's probabilistic model in the Lucene idf form):
    Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dlen/avg_len)).
    Returns (id_col BIGINT, score DOUBLE) — raw scores for downstream
    ranking/fusion; :func:`bm25_topk` is the ranked convenience form.

    ``k1`` saturates term frequency (0 → binary, ∞ → raw tf); ``b``
    dials length normalization (0 → none, 1 → fully proportional).

    Scale shape: term frequencies aggregate only tokens matching the
    query terms (the filter runs inside the explode projection, so the
    exchange carries |matching tokens| rows, not the corpus); document
    lengths are a row-local ``size(split())`` with no shuffle; the
    |terms|-row df table and 1-row corpus stats ride broadcasts. Per-
    query cost at 100 TB is one filtered scan — the shape an inverted
    index accelerates but never changes.
    """
    from ..functions import text as T

    toks = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(T.tokens(text_col)).alias("term"),
    ).filter(F.col("term").isin(list(terms)))
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    dl = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(T.tokens(text_col)).cast("double").alias("dlen"),
    )
    g = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dlen").alias("avg_len"),
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    norm = F.col("tf") + k1 * (
        1 - b + b * F.col("dlen") / F.col("avg_len")
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(g))
        .groupBy(id_col)
        .agg(F.sum(idf * F.col("tf") * (k1 + 1) / norm).alias("score"))
    )


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    digits: int = 4,
    score_col: str = "bm25_score",
) -> DataFrame:
    """Ranked BM25 retrieval: :func:`bm25_scores` → ``digits``-rounded
    score → TakeOrdered top-``topk`` with id tie-break."""
    scored = bm25_scores(df, terms, text_col, id_col, k1=k1, b=b)
    return (
        scored.select(id_col, rfix(F.col("score"), digits).alias(score_col))
        .orderBy(F.desc(score_col), id_col)
        .limit(topk)
    )


def rank_topk(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    depth: int = 50,
    rank_col: str = "rank",
    digits: int = 6,
) -> DataFrame:
    """Ranked leg for fusion: TakeOrdered to ``depth`` FIRST (distributed
    top-k on the ``digits``-canonicalized score, id tie-break), then
    row_number the survivors — the global window never sees the full
    corpus. Returns (id_col, rank_col BIGINT)."""
    w = Window.orderBy(F.desc("_s"), F.asc(id_col))
    return (
        scored.select(id_col, rfix(F.col(score_col), digits).alias("_s"))
        .orderBy(F.desc("_s"), F.asc(id_col))
        .limit(depth)
        .select(
            id_col, F.row_number().over(w).cast("long").alias(rank_col)
        )
    )


def rrf_fuse(
    rankings: Sequence[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int = 10,
    digits: int = 6,
    score_col: str = "rrf_score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of any
    number of ranked lists: score = Σ_legs 1/(k + rank), absent legs
    contribute 0 — the score-free merge every two-tower RAG stack runs
    because it needs no calibration between incomparable scorers.
    ``rankings`` is a list of (frame, rank_col) with frames keyed by
    ``id_col``; returns the fused top-``topk`` with every leg's rank
    column and the rounded score.

    The fused score is pure integer-reciprocal arithmetic on BIGINT
    ranks — bit-exact across engines. Legs are depth-bounded by
    :func:`rank_topk`, so the fusion join is depth×depth rows.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    fused, rank_cols = rankings[0][0], [rankings[0][1]]
    for frame, rc in rankings[1:]:
        fused = fused.join(frame, id_col, "full_outer")
        rank_cols.append(rc)
    score = None
    for rc in rank_cols:
        leg = F.coalesce(1.0 / (k + F.col(rc)), F.lit(0.0))
        score = leg if score is None else score + leg
    return (
        fused.select(id_col, *rank_cols, score.alias("_rrf"))
        .orderBy(F.desc("_rrf"), id_col)
        .limit(topk)
        .select(id_col, *rank_cols, rfix(F.col("_rrf"), digits).alias(score_col))
    )


def mmr_select(
    pool: DataFrame,
    toks: DataFrame,
    rounds: int = 3,
    lam: float = 0.7,
    id_col: str = "doc_id",
    rel_col: str = "rel",
    tok_col: str = "tok",
    digits: int = 6,
    score_col: str = "mmr_score",
) -> DataFrame:
    """Maximal Marginal Relevance diversified selection, ``rounds``
    greedy rounds: round 1 takes the most relevant document; each later
    round picks argmax(rel − λ·max_selected Jaccard(d, s)) over the
    remaining pool, with the running similarity maximum carried between
    rounds. Returns (rank BIGINT, id_col, rel_col, score_col) — the
    diversification pass that keeps a RAG context window or few-shot
    set from filling with near-duplicates of hit #1.

    ``pool`` is (id, rel) — relevance-filtered candidates; ``toks`` is
    the DISTINCT (id, token) set of the pool (the similarity base).
    Argmaxes rank on floor(score·10^digits + 0.5) with an id tie-break
    (Jaccard is a ratio of exact integers, so scores are bit-identical
    cross-engine).

    Scale shape: each round joins the pool's token sets against ONE
    selected document's token set (1-row-driven broadcast semi-joins),
    so k rounds cost k token-set passes — never a pool×pool similarity
    join (that all-pairs regime belongs to the blocked dedup joins).
    Loop-carried state is pinned per round; unpinned, the scan+tokenize
    subtree re-evaluated 69× over three rounds (measured round 8).
    """
    canon = 10 ** digits
    pool = pin(pool.select(F.col(id_col), F.col(rel_col)), label="mmr_pool")
    toks = pin(toks.select(F.col(id_col), F.col(tok_col)), label="mmr_toks")
    sz = toks.groupBy(id_col).agg(F.count("*").alias("sz"))

    def jacc_vs(cands: DataFrame, sel: DataFrame, out: str) -> DataFrame:
        """Jaccard of every candidate against the ONE selected doc."""
        sel_toks = toks.join(
            F.broadcast(sel.select(id_col)), id_col, "left_semi"
        ).select(tok_col)
        sel_sz = F.broadcast(
            sz.join(F.broadcast(sel.select(id_col)), id_col, "left_semi")
            .select(F.col("sz").alias("_sel_sz"))
        )
        inter = (
            toks.join(F.broadcast(sel_toks), tok_col)
            .groupBy(id_col)
            .agg(F.count("*").alias("_inter"))
        )
        return (
            cands.join(sz, id_col)
            .join(inter, id_col, "left")
            .crossJoin(sel_sz)
            .withColumn(
                out,
                F.coalesce("_inter", F.lit(0)).cast("double")
                / (
                    F.col("sz") + F.col("_sel_sz")
                    - F.coalesce("_inter", F.lit(0))
                ).cast("double"),
            )
            .drop("sz", "_inter", "_sel_sz")
        )

    def pick(df: DataFrame, score) -> DataFrame:
        return (
            df.withColumn("_score", score)
            .orderBy(
                F.floor(F.col("_score") * canon + 0.5).desc(),
                F.col(id_col).asc(),
            )
            .limit(1)
        )

    sel = pin(pool.orderBy(F.desc(rel_col), F.asc(id_col)).limit(1),
              label="mmr_s1")
    outs = [sel.select(
        F.lit(1).cast("long").alias("rank"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(rel_col).cast("long").alias(rel_col),
        rfix(F.col(rel_col).cast("double"), digits).alias(score_col),
    )]
    cands = pool.join(F.broadcast(sel.select(id_col)), id_col, "left_anti")
    jmax: str | None = None
    for r in range(2, rounds + 1):
        jcol = f"_j{r - 1}"
        sims = jacc_vs(cands, sel, jcol)
        if jmax is not None:
            sims = sims.withColumn(jcol, F.greatest(jmax, jcol)).drop(jmax)
        jmax = jcol
        sims = pin(sims, label=f"mmr_sims{r - 1}")
        sel = pin(pick(sims, F.col(rel_col) - lam * F.col(jmax)),
                  label=f"mmr_s{r}")
        outs.append(sel.select(
            F.lit(r).cast("long").alias("rank"),
            F.col(id_col).cast("long").alias(id_col),
            F.col(rel_col).cast("long").alias(rel_col),
            rfix("_score", digits).alias(score_col),
        ))
        cands = sims.join(F.broadcast(sel.select(id_col)), id_col, "left_anti")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
