"""Structural invariants for the corpus-prep operators — properties that
must hold on ANY input, checked on the harness tables (complementing the
value-exact oracle parity in test_parity.py).

These are the checks that keep refactors honest at scale: parity pins the
output values at one SF; invariants pin the semantics (coverage, bounds,
conservation) that must survive any partitioning or data growth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"
REG = all_queries()


def _run(spark, name):
    return REG[name].fn(spark, SF)


def test_chunking_covers_every_token_exactly(spark):
    """Chunk windows tile each document: chunk 0 starts at token 1, strides
    are constant, and the union of [start, start+len) intervals covers
    1..n_tokens with overlap exactly chunk_size - stride on interior seams."""
    chunks = _run(spark, "text_chunk_sliding")
    docs = (
        table(spark, SF, "documents")
        .select("doc_id", F.size(F.split("text", r"\s+")).alias("n"))
        .collect()
    )
    n_by_doc = {r["doc_id"]: r["n"] for r in docs}
    got = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("tok_sum"),
        F.max("chunk_idx").alias("max_idx"),
    ).collect()
    CHUNK, STRIDE = 16, 12
    import math

    for r in got:
        n = n_by_doc[r["doc_id"]]
        want_chunks = max(1, math.ceil(n / STRIDE))
        assert r["n_chunks"] == want_chunks
        assert r["max_idx"] == want_chunks - 1
        # slice lengths clamp at the doc end: exact expected token total
        want_tok_sum = sum(
            min(CHUNK, n - s) for s in range(0, max(n, 1), STRIDE)
        )
        assert r["tok_sum"] == want_tok_sum
        assert r["tok_sum"] >= n  # full coverage: no token dropped


def test_split_and_contamination_are_consistent(spark):
    """Contamination scan only reports docs from the test split, ratios are
    in [0,1], and n_overlap never exceeds n_shingles."""
    cont = _run(spark, "dedup_cross_split_contamination").collect()
    assert len(cont) > 0
    from yelpdatawarehouse_spark.functions import hashing

    d = table(spark, SF, "documents")
    slot = (
        hashing.md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % 100
    )
    test_ids = {
        r["doc_id"] for r in d.select("doc_id").filter(slot >= 95).collect()
    }
    for r in cont:
        assert r["doc_id"] in test_ids
        assert 0 <= r["n_overlap"] <= r["n_shingles"]
        assert 0.0 <= r["overlap_ratio"] <= 1.0
        assert r["contaminated"] == (r["n_overlap"] > 0)


def test_kmeans_assignment_is_nearest(spark):
    """Every cluster is non-empty only if some vector is nearest to it, the
    membership total equals the vector count, and mean distances are
    non-negative."""
    stats = _run(spark, "emb_kmeans_assign_stats").collect()
    total = sum(r["n_members"] for r in stats)
    assert total == table(spark, SF, "embeddings").count()
    assert all(r["mean_dist"] >= 0 for r in stats)
    assert all(0 <= r["cluster_id"] < 8 for r in stats)


def test_triangle_support_matches_bruteforce(spark):
    """Per-node triangle counts equal a brute-force enumeration of the
    (small) nation graph done driver-side."""
    from yelpdatawarehouse_spark.queries.graphq import trade_edges
    from collections import defaultdict
    from itertools import combinations

    edges = {
        (r["src"], r["dst"])
        for r in trade_edges(spark, SF).collect()
        if r["src"] < r["dst"]
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = defaultdict(int)
    nodes = sorted(adj)
    for a in nodes:
        for b, c in combinations(sorted(n for n in adj[a] if n > a), 2):
            if c in adj[b]:
                want[a] += 1
                want[b] += 1
                want[c] += 1
    got = {
        r["node"]: r["triangles"]
        for r in _run(spark, "g_triangle_support").collect()
    }
    assert got == dict(want)


def test_quality_filter_verdicts_partition_the_corpus(spark):
    """Every document lands in exactly one verdict bucket; totals match."""
    stats = _run(spark, "text_quality_filter_stats")
    n_total = stats.agg(F.sum("n_docs")).collect()[0][0]
    assert n_total == table(spark, SF, "documents").count()
    verdicts = {r["verdict"] for r in stats.collect()}
    assert verdicts <= {"keep", "too_short", "low_diversity", "no_stopwords"}
    assert "keep" in verdicts


def test_redaction_conserves_documents(spark):
    """Redaction reports every document exactly once per source and never
    redacts more tokens than exist."""
    d = table(spark, SF, "documents")
    want = {r["source"]: r["cnt"] for r in d.groupBy("source").count().withColumnRenamed("count", "cnt").collect()}
    got = _run(spark, "text_redaction_stats").collect()
    assert {r["source"]: r["n_docs"] for r in got} == want
    for r in got:
        assert 0 <= r["docs_touched"] <= r["n_docs"]
        assert 0 < r["distinct_redacted"] <= r["n_docs"]


def test_kmeans_assigns_to_true_nearest_centroid(spark):
    """Driver-side argmin recomputation: per-cluster membership counts must
    equal a brute-force nearest-centroid assignment (d2 via the same
    three-inner-product identity, ties to the lower centroid id)."""
    rows = (
        table(spark, SF, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    vecs = {r["vec_id"]: r["e"] for r in rows}
    cents = {i: vecs[i] for i in range(8)}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    from collections import Counter

    want = Counter()
    for vid, e in vecs.items():
        best = min(
            (dot(e, e) + dot(c, c) - 2 * dot(e, c), cid)
            for cid, c in cents.items()
        )
        want[best[1]] += 1
    got = {
        r["cluster_id"]: r["n_members"]
        for r in _run(spark, "emb_kmeans_assign_stats").collect()
    }
    assert got == dict(want)


def test_exact_duplicates_survive_the_minhash_pipeline(spark, tmp_path):
    """Identical texts have identical signatures, so every exact-duplicate
    pair MUST surface as an LSH candidate and verify at jaccard 1.0 — the
    recall floor of the pipeline (no probability involved). The shipped
    corpus has no exact dups, so plant them: clone 10 documents under new
    ids into a synthetic sf dir and run the pipeline there."""
    import shutil

    d = str(tmp_path / "sf_dups")
    os_mkdir = __import__("os").makedirs
    os_mkdir(d, exist_ok=True)
    docs = table(spark, SF, "documents")
    clones = (
        docs.filter(F.col("doc_id") < 10)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    docs.unionByName(clones).coalesce(1).write.parquet(str(tmp_path / "docs_tmp"))
    # single-file layout like the harness dirs
    import glob, os
    src = glob.glob(str(tmp_path / "docs_tmp" / "*.parquet"))[0]
    shutil.copy(src, os.path.join(d, "documents.parquet"))

    dup_pairs = {(i, i + 100000) for i in range(10)}
    reg_cands = REG["dedup_minhash_lsh_candidates"].fn(spark, d)
    cands = {(r.doc_a, r.doc_b) for r in reg_cands.collect()}
    verified = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REG["dedup_minhash_verified"].fn(spark, d).collect()
    }
    missing = dup_pairs - cands
    assert not missing, f"exact dups missing from candidates: {sorted(missing)[:5]}"
    for p in dup_pairs:
        assert verified.get(p) == 1.0, (p, verified.get(p))


def test_verified_pairs_have_true_jaccard_above_threshold(spark):
    """Every verified pair's jaccard must equal the brute-force 3-gram
    Jaccard of the two texts (independent Python model, not the oracle)."""
    import re as _re

    docs = {r.doc_id: r.text for r in table(spark, SF, "documents").collect()}

    def shingles(text: str) -> set:
        toks = _re.split(r"\s+", text)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for r in _run(spark, "dedup_minhash_verified").collect():
        sa, sb = shingles(docs[r.doc_a]), shingles(docs[r.doc_b])
        true_j = len(sa & sb) / len(sa | sb)
        assert true_j >= 0.2 - 1e-9
        assert abs(true_j - r.jaccard) < 5e-5, (r.doc_a, r.doc_b, true_j, r.jaccard)


def test_keep_canonical_conserves_clusters_and_picks_longest(spark):
    """dedup_keep_canonical: every cluster keeps exactly one doc, kept +
    dropped equals the cluster size, and the kept doc maximizes
    (n_chars, -doc_id) within its cluster."""
    clusters = {}
    for r in _run(spark, "dedup_clusters").collect():
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    chars = {r.doc_id: r.n_chars for r in table(spark, SF, "documents").collect()}

    kept = {r.cluster_id: r for r in _run(spark, "dedup_keep_canonical").collect()}
    assert set(kept) == set(clusters)
    for cid, members in clusters.items():
        k = kept[cid]
        assert k.dropped_cnt == len(members) - 1
        best = sorted(members, key=lambda d: (-chars[d], d))[0]
        assert k.kept_doc_id == best and k.kept_n_chars == chars[best]


def test_oracle_index_bounds_hold_on_every_sf(spark):
    """Several oracles index token/byte/dim positions through a bounded
    range(1, N+1) unnest (kmeans/PQ dims 4096, BPE/bigram tokens 4096,
    mm byte sums 4096, boilerplate chunks 1024) while the Spark side is
    unbounded. Those bounds are corpus CONTRACTS: if a future generator
    exceeds them the oracles silently drop tails and hash-mismatch far
    from the cause — this guard fails loudly at the data instead (r5
    review finding)."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        ntoks, nlen = con.execute(
            f"""SELECT max(len(string_split_regex(text, '\\s+'))),
                       max(octet_length(encode(text)))
                FROM '/root/testdata/{sf}/documents.parquet'"""
        ).fetchone()
        assert ntoks <= 4096, (sf, ntoks)
        assert nlen <= 4096, (sf, nlen)
        dim = con.execute(
            f"SELECT max(len(embedding)) FROM '/root/testdata/{sf}/embeddings.parquet'"
        ).fetchone()[0]
        assert dim <= 4096, (sf, dim)
