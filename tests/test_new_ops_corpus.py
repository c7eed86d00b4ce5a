"""Round-5 operators against the real harness corpus (sf0.001): the
integration layer between unit fixtures and future registered queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_containment_finds_planted_dupes_in_real_corpus(spark):
    """Recall floor amid real corpus noise: an exact copy and a
    header-prefixed superset of a real document must both surface at
    containment 1.0 (the superset is the pair symmetric Jaccard misses)."""
    from yelpdatawarehouse_spark.operators.containment import containment_pairs

    d = table(spark, SF, "documents").select("doc_id", "text")
    src = d.orderBy("doc_id").limit(1).collect()[0]
    planted = spark.createDataFrame(
        [
            (1_000_001, src.text),                                   # exact copy
            (1_000_002, "planted header words " + src.text),         # superset
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(
            d.unionByName(planted), threshold=0.999
        ).collect()
    }
    assert got.get((src.doc_id, 1_000_001)) == 1.0
    assert got.get((src.doc_id, 1_000_002)) == 1.0
    assert got.get((1_000_001, 1_000_002)) == 1.0


def test_bigram_lm_scores_whole_corpus(spark):
    from yelpdatawarehouse_spark.operators.lm import score_bigram_addk

    d = table(spark, SF, "documents")
    out = score_bigram_addk(d).collect()
    assert len(out) == d.count()
    scored = [r for r in out if r.avg_logprob is not None]
    assert scored and all(r.avg_logprob < 0 for r in scored)
    # duplicates of the same text must score identically
    by_text = (
        d.join(score_bigram_addk(d), "doc_id")
        .groupBy("text")
        .agg(F.count_distinct(F.round("avg_logprob", 9)).alias("k"))
        .agg(F.max("k"))
        .collect()[0][0]
    )
    assert by_text == 1


def test_lateness_profile_on_events(spark):
    from yelpdatawarehouse_spark.streaming.lateness import lateness_profile

    ev = table(spark, SF, "events")
    n = ev.count()
    drops = []
    for w in (60.0, 3600.0, 86400.0 * 365):
        row = lateness_profile(ev, watermark_s=w).collect()[0]
        assert row.n_events == n
        assert row.n_on_time + row.n_late_kept + row.n_dropped == n
        drops.append(row.n_dropped)
    assert drops == sorted(drops, reverse=True)
    assert drops[-1] == 0  # a year of watermark drops nothing


def test_kll_rollup_on_lineitem(spark):
    from yelpdatawarehouse_spark.operators.quantiles import (
        group_sketches,
        merge_rollup,
        rank_of,
    )

    li = table(spark, SF, "lineitem").select("l_suppkey", "l_extendedprice")
    s = table(spark, SF, "supplier").select("s_suppkey", "s_nationkey")
    df = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).select(
        "s_nationkey", "l_extendedprice"
    )
    leaves = group_sketches(df, ["s_nationkey"], "l_extendedprice")
    rolled = merge_rollup(leaves.withColumn("all", F.lit(1)), ["all"], [0.5])
    probe = rolled.select("all", F.col("q_0_5").alias("est"))
    rank = rank_of(
        df.withColumn("all", F.lit(1)), ["all"], "l_extendedprice", probe, "est"
    ).collect()[0]
    assert abs(rank.exact_rank - 0.5) <= 0.05


def test_theta_vocab_overlap_matches_exact_sets(spark):
    """Theta set algebra below capacity must reproduce the EXACT per-source
    vocabulary overlap the registered HLL query (a_sketch_vocab_overlap)
    audits — same corpus, same tokenization."""
    from yelpdatawarehouse_spark.functions import text as T
    from yelpdatawarehouse_spark.operators.setsketch import (
        pairwise_set_algebra,
        theta_group_sketches,
    )

    d = table(spark, SF, "documents")
    st = d.select(
        "source", F.explode(T.tokens("text")).alias("tok")
    ).distinct()
    sk = theta_group_sketches(st, ["source"], "tok", lg_k=16)
    got = {
        (r.key_a, r.key_b): (r.n_union, r.n_intersect)
        for r in pairwise_set_algebra(sk, "source").collect()
    }
    sets: dict[str, set] = {}
    for r in st.collect():
        sets.setdefault(r.source, set()).add(r.tok)
    for (a, b), (nu, ni) in got.items():
        assert nu == len(sets[a] | sets[b])
        assert ni == len(sets[a] & sets[b])


@pytest.mark.slow
def test_zorder_on_lineitem_two_keys(spark, tmp_path):
    from yelpdatawarehouse_spark.operators.zorder import (
        file_coverage_stats,
        write_unclustered,
        write_zordered,
    )

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    z, u = str(tmp_path / "z"), str(tmp_path / "u")
    write_zordered(li, z, "l_orderkey", "l_partkey", bits=7, n_files=8)
    write_unclustered(li, u, n_files=8)
    zs = file_coverage_stats(z, "l_orderkey", "l_partkey")
    us = file_coverage_stats(u, "l_orderkey", "l_partkey")
    zm = sum(s["a_cover"] + s["b_cover"] for s in zs) / (2 * len(zs))
    um = sum(s["a_cover"] + s["b_cover"] for s in us) / (2 * len(us))
    assert zm < 0.7 * um
