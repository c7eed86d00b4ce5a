"""Unit tests for the LIBRARY form of the text-analysis operators
(operators/textops.py — judge r10 brief #1, phase 2 of the r9/r10
library-ification).

Everything here runs on hand-built, NON-registry DataFrames with
non-default column names and non-registry parameters, proving the
functions work over arbitrary inputs — not just the documents table the
registry queries bind them to. (The registry thin callers themselves
remain covered by tests/test_parity.py's DuckDB oracle gate.)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import textops

DOCS = [
    (7, "The quick brown fox jumps over the lazy dog"),
    (8, "the the the the spam spam spam spam spam spam"),        # repetitive
    (9, "a of and to in is it for on the"),                      # all stopwords
    (10, "Zebra7 apples! banana-split 42 cherries"),             # mixed alnum
    (11, ""),                                                    # empty
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["id", "body"])


# ---------------------------------------------------------------------------
# quality_scores
# ---------------------------------------------------------------------------


def test_quality_scores_values(spark, docs):
    rows = {r["id"]: r.asDict()
            for r in textops.quality_scores(docs, "body", "id").collect()}
    # "" whitespace-splits to [''] (size 1), so even the empty doc keeps a
    # row — the len(toks) > 0 guard only drops genuinely token-free frames
    assert set(rows) == {7, 8, 9, 10, 11}
    assert rows[11]["n_tokens"] == 1 and rows[11]["avg_token_len"] == 0.0
    q7 = rows[7]
    toks7 = DOCS[0][1].split()
    assert q7["n_tokens"] == len(toks7)
    assert q7["n_uniq"] == len(set(toks7))
    assert q7["avg_token_len"] == round(
        math.floor(sum(len(t) for t in toks7) / len(toks7) * 1e4 + 0.5) / 1e4, 4)
    # stopword ratio counts only the default stopword list, case-sensitive
    # ('The' is not 'the'): doc 7 has 'the' once + 'over'∉list
    assert rows[9]["stopword_ratio"] == 1.0
    assert rows[8]["n_uniq"] == 2


def test_quality_scores_custom_stopwords(spark, docs):
    rows = {r["id"]: r["stopword_ratio"]
            for r in textops.quality_scores(
                docs, "body", "id", stopwords=("spam",)).collect()}
    assert rows[8] == 0.6  # 6 of 10 tokens are 'spam'
    assert rows[9] == 0.0


# ---------------------------------------------------------------------------
# langid
# ---------------------------------------------------------------------------


def test_langid_markers_and_priority(spark):
    df = spark.createDataFrame(
        [(1, "der und die der und"), (2, "el la los el"), (3, "qqq zzz")],
        ["k", "t"],
    )
    out = {r["k"]: r.asDict() for r in textops.langid(
        df, "t", "k",
        markers={"de": ("der", "und", "die"), "es": ("el", "la", "los")},
        priority=("de", "es"),
    ).collect()}
    assert out[1]["predicted_lang"] == "de" and out[1]["hits_de"] == 5
    assert out[2]["predicted_lang"] == "es"
    # zero hits everywhere -> 'und': a prediction requires >=1 marker hit
    # (ADVICE r11 — previously the >= tie silently resolved to priority[0])
    assert out[3]["predicted_lang"] == "und"
    assert out[3]["hits_de"] == 0 and out[3]["hits_es"] == 0


def test_langid_passthrough_columns(spark):
    df = spark.createDataFrame([(1, "en-ish text the of", "en")],
                               ["k", "t", "label"])
    out = textops.langid(df, "t", "k",
                         passthrough=(F.col("label").alias("gold"),))
    assert out.columns[:2] == ["k", "gold"]
    assert out.collect()[0]["gold"] == "en"


# ---------------------------------------------------------------------------
# winnow_fingerprints
# ---------------------------------------------------------------------------


def test_winnow_fingerprints_properties(spark, docs):
    out = {r["id"]: r["fps"]
           for r in textops.winnow_fingerprints(docs, "body", "id",
                                                k=2, w=3).collect()}
    # doc 11 (empty) has no 2-shingles and drops out
    assert 11 not in out
    # identical docs -> identical fingerprints (pure function of text)
    again = {r["id"]: r["fps"]
             for r in textops.winnow_fingerprints(docs, "body", "id",
                                                  k=2, w=3).collect()}
    assert out == again
    # each fingerprint list is distinct values and a subset of all k-gram
    # hashes; with window w the count is <= n_hashes - w + 1
    for i, text in [(7, DOCS[0][1]), (8, DOCS[1][1])]:
        n_shingles = len(text.split()) - 1
        assert 1 <= len(out[i]) <= max(n_shingles - 3 + 1, 1)
        assert len(out[i]) == len(set(out[i]))


def test_winnow_short_doc_single_min(spark):
    df = spark.createDataFrame([(1, "a b c")], ["k", "t"])
    # k=2 -> 2 shingle hashes, w=5 > 2 -> single global-min fingerprint
    fps = textops.winnow_fingerprints(df, "t", "k", k=2, w=5).collect()[0]["fps"]
    assert len(fps) == 1


# ---------------------------------------------------------------------------
# tfidf_top_terms (DuckDB twin at non-registry parameters)
# ---------------------------------------------------------------------------


def test_tfidf_top_terms_duckdb_twin(spark, docs):
    duckdb = pytest.importorskip("duckdb")
    out = textops.tfidf_top_terms(docs, "body", "id", top_k=2).collect()
    got = sorted((r["id"], r["term"], r["tf"], r["df"], r["score"], r["rn"])
                 for r in out)
    con = duckdb.connect()
    con.register("d", __import__("pandas").DataFrame(DOCS, columns=["id", "body"]))
    want = con.execute("""
        WITH tf AS (
            SELECT id, term, count(*)::BIGINT AS tf
            FROM (SELECT id, unnest(regexp_extract_all(lower(body), '[a-z0-9]+')) AS term FROM d)
            GROUP BY id, term
        ), n AS (SELECT count(DISTINCT id)::BIGINT AS n_docs FROM tf),
        dfx AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        scored AS (
            SELECT tf.id, tf.term, tf.tf, dfx.df,
                   floor(tf.tf * ln(n.n_docs::DOUBLE / dfx.df) * 1e6 + 0.5) / 1e6 AS score
            FROM tf JOIN dfx USING (term) CROSS JOIN n
        )
        SELECT id, term, tf, df, score,
               row_number() OVER (PARTITION BY id ORDER BY score DESC, term)::BIGINT AS rn
        FROM scored QUALIFY rn <= 2
    """).fetchall()
    assert got == sorted(tuple(r) for r in want)


# ---------------------------------------------------------------------------
# chunk_sliding
# ---------------------------------------------------------------------------


def test_chunk_sliding_partitioning(spark):
    df = spark.createDataFrame([(5, " ".join(f"t{i}" for i in range(10)))],
                               ["k", "t"])
    rows = sorted((r["chunk_idx"], r["n_tokens"])
                  for r in textops.chunk_sliding(df, "t", "k",
                                                 chunk=4, stride=3).collect())
    # starts 0,3,6,9: sizes 4,4,4,1
    assert rows == [(0, 4), (1, 4), (2, 4), (3, 1)]


def test_chunk_sliding_disjoint_covers_once(spark):
    df = spark.createDataFrame([(5, " ".join(f"t{i}" for i in range(9)))],
                               ["k", "t"])
    rows = textops.chunk_sliding(df, "t", "k", chunk=3, stride=3).collect()
    # disjoint chunks of 3 over 9 tokens: every token exactly once
    assert sorted(r["n_tokens"] for r in rows) == [3, 3, 3]
    assert len({r["chunk_hash"] for r in rows}) == 3


# ---------------------------------------------------------------------------
# pack_bins
# ---------------------------------------------------------------------------


def test_pack_bins_invariants(spark):
    df = spark.createDataFrame([(i, 10 + i) for i in range(40)], ["k", "sz"])
    out = textops.pack_bins(df, id_col="k", size_col="sz",
                            bin_tokens=64, slots=3, salt="x:").collect()
    assert len(out) == 40                                # every row assigned
    assert {r["slot"] for r in out} <= {0, 1, 2}
    # within a slot, bin_id is non-decreasing in id order and equals
    # cum_excl // bin_tokens recomputed locally
    by_slot: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["slot"], r["k"])):
        by_slot.setdefault(r["slot"], []).append(r)
    for rows in by_slot.values():
        cum = 0
        for r in rows:
            assert r["bin_id"] == cum // 64
            cum += r["sz"]


def test_pack_bins_salt_changes_sharding(spark):
    df = spark.createDataFrame([(i, 1) for i in range(64)], ["k", "sz"])
    a = {r["k"]: r["slot"] for r in textops.pack_bins(
        df, "k", "sz", slots=8, salt="a:").collect()}
    b = {r["k"]: r["slot"] for r in textops.pack_bins(
        df, "k", "sz", slots=8, salt="b:").collect()}
    assert a != b  # different salt -> different deterministic sharding


# ---------------------------------------------------------------------------
# top_ngrams / token_repetition
# ---------------------------------------------------------------------------


def test_top_ngrams_trigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b d")], ["k", "t"])
    rows = textops.top_ngrams(df, "t", n=3, top_k=2,
                              gram_col="tri", count_col="c").collect()
    assert rows[0]["tri"] == "a b c" and rows[0]["c"] == 2
    assert rows[0].asDict().keys() == {"tri", "c"}


def test_token_repetition_flags(spark, docs):
    rows = {r["id"]: r.asDict()
            for r in textops.token_repetition(docs, "body", "id",
                                              threshold=0.5).collect()}
    assert rows[8]["top_cnt"] == 6 and rows[8]["n_tokens"] == 10
    assert rows[8]["repetitive"] is True                 # 0.6 > 0.5
    assert rows[7]["repetitive"] is False
    assert rows[8]["top_ratio"] == 0.6


# ---------------------------------------------------------------------------
# entropy_by_group / zipf_fit / oov_rate / redact_tokens (r11 phase-3)
# ---------------------------------------------------------------------------


def test_entropy_by_group_values(spark):
    df = spark.createDataFrame(
        [(1, "flat", "a b c d"),            # uniform: entropy = ln(4)
         (2, "peaky", "x x x x x x x y")],  # skewed: low entropy
        ["k", "g", "t"])
    out = {r["g"]: r.asDict()
           for r in textops.entropy_by_group(df, "t", "g").collect()}
    assert out["flat"]["vocab_size"] == 4 and out["flat"]["n_tokens"] == 4
    assert out["flat"]["token_entropy"] == pytest.approx(math.log(4), abs=1e-3)
    assert out["flat"]["normalized_entropy"] == pytest.approx(1.0, abs=1e-3)
    p = 7 / 8
    want = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    assert out["peaky"]["token_entropy"] == pytest.approx(want, abs=1e-3)
    assert out["peaky"]["normalized_entropy"] < 1.0


def test_zipf_fit_perfect_line(spark):
    # construct counts following freq = 64 / rank exactly: slope -1, R² 1
    docs = []
    i = 0
    for rank, word in enumerate(["w1", "w2", "w3", "w4"], start=1):
        for _ in range(64 // rank):
            docs.append((i, word)); i += 1
    df = spark.createDataFrame(docs, ["k", "t"])
    row = textops.zipf_fit(df, "t", top_k=4).collect()[0]
    assert row["n_terms"] == 4
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=0.01)
    assert row["fit_r2"] == pytest.approx(1.0, abs=0.01)
    assert row["zipf_intercept"] == pytest.approx(math.log(64), abs=0.05)


def test_oov_rate_vocab_cut(spark):
    df = spark.createDataFrame(
        [(1, "a", "top top top rare1"), (2, "b", "top rare2 rare3 rare4")],
        ["k", "g", "t"])
    out = {r["g"]: r.asDict()
           for r in textops.oov_rate(df, "t", "g", vocab_k=1).collect()}
    # vocab = {top}; everything else is OOV
    assert out["a"]["n_oov"] == 1 and out["a"]["oov_rate"] == 0.25
    assert out["b"]["n_oov"] == 3 and out["b"]["oov_rate"] == 0.75


def test_redact_tokens_rowwise(spark):
    df = spark.createDataFrame(
        [(1, "g1", "keep secret keep token"), (2, "g1", "keep keep")],
        ["k", "g", "t"])
    out = {r["k"]: r.asDict()
           for r in textops.redact_tokens(df, "t",
                                          denylist=("secret", "token"),
                                          marker="<X>").collect()}
    assert set(out[1]) == {"k", "g", "n_tokens", "n_hits", "redacted_hash"}
    assert out[1]["n_hits"] == 2 and out[2]["n_hits"] == 0
    import hashlib
    assert out[1]["redacted_hash"] == hashlib.md5(
        b"keep <X> keep <X>").hexdigest()
    assert out[2]["redacted_hash"] == hashlib.md5(b"keep keep").hexdigest()
