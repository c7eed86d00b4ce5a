"""Semantic invariants for the round-10 TPC-H drafts — properties the
oracle hash can't state (ordering contracts, threshold membership, mass
conservation against independent recomputes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries.drafts_r10 import (
    DRAFTS,
    Q3_DATE,
    Q11_SHARE_BP,
    Q18_MIN_QTY,
)
from yelpdatawarehouse_spark.sources.tables import table


def _rows(spark, name, sf_dir=SF_TEST_DIR):
    fn, _ = DRAFTS[name]
    return fn(spark, sf_dir).collect()


def test_q3_top10_ordered_and_open(spark):
    rows = _rows(spark, "j24_shipping_priority_q3")
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.o_orderdate < Q3_DATE for r in rows)


def test_q10_revenue_matches_independent_rollup(spark):
    rows = _rows(spark, "j25_returned_items_q10")
    assert 0 < len(rows) <= 20
    revs = [r.returned_revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # independent recompute for the top customer (plain float sum is
    # within a cent of the exact-cents path)
    top = rows[0]
    li = table(spark, SF_TEST_DIR, "lineitem")
    o = table(spark, SF_TEST_DIR, "orders")
    got = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_custkey") == top.c_custkey)
            & (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .collect()[0][0]
    )
    assert abs(got - top.returned_revenue) < 0.05


def test_q14_share_consistent(spark):
    (r,) = _rows(spark, "j26_promo_revenue_q14")
    assert 0.0 <= r.promo_revenue_pct <= 100.0
    assert 0.0 <= r.promo_revenue <= r.total_revenue
    assert abs(r.promo_revenue_pct - 100.0 * r.promo_revenue / r.total_revenue) < 0.01


def test_q11_members_exceed_threshold_and_shares_bounded(spark):
    rows = _rows(spark, "j27_important_parts_q11")
    assert rows
    thr = Q11_SHARE_BP / 10000.0
    assert all(r.revenue_share > thr - 1e-9 for r in rows)
    assert sum(r.revenue_share for r in rows) <= 1.0 + 1e-6
    revs = [r.part_revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q16_counts_bounded_by_clean_suppliers(spark):
    rows = _rows(spark, "j28_supplier_relationship_q16")
    assert rows
    s = table(spark, SF_TEST_DIR, "supplier")
    n_clean = s.filter(F.col("s_acctbal") >= 0).count()
    assert all(0 < r.supplier_cnt <= n_clean for r in rows)
    # grouping covers only real (brand, size) slices
    sizes = {
        (r.p_brand, r.p_size)
        for r in table(spark, SF_TEST_DIR, "part")
        .select("p_brand", "p_size")
        .distinct()
        .collect()
    }
    assert all((r.p_brand, r.p_size) in sizes for r in rows)


def test_q18_threshold_membership_is_exact(spark):
    rows = _rows(spark, "j29_large_volume_q18")
    li = table(spark, SF_TEST_DIR, "lineitem")
    want = {
        r.l_orderkey: r.q
        for r in li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > Q18_MIN_QTY)
        .collect()
    }
    got = {r.o_orderkey: r.total_qty for r in rows}
    assert got == {k: int(v) for k, v in want.items()}
    qtys = [r.total_qty for r in rows]
    assert qtys == sorted(qtys, reverse=True)


# --- batch 2: new-capability drafts ---------------------------------------


def test_snm_pairs_within_window_and_symmetric_jaccard(spark):
    from yelpdatawarehouse_spark.queries.drafts_r10 import (
        SNM_THRESHOLD,
        SNM_WINDOW,
    )

    rows = _rows(spark, "dedup_sorted_neighborhood")
    assert rows
    assert all(1 <= r.rank_dist <= SNM_WINDOW for r in rows)
    assert all(r.jaccard >= SNM_THRESHOLD for r in rows)
    assert all(r.doc_a != r.doc_b for r in rows)
    # no duplicate pairs in either orientation
    seen = {frozenset((r.doc_a, r.doc_b)) for r in rows}
    assert len(seen) == len(rows)


def test_snm_catches_planted_near_duplicates(spark, tmp_path):
    """Two docs differing by one trailing token share a long prefix, so
    SNM must place them adjacent and emit the pair with high Jaccard."""
    import os

    from yelpdatawarehouse_spark.queries.drafts_r10 import (
        dedup_sorted_neighborhood,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " twice", "en", "s", len(base) + 6),
        (3, "completely different content about spark engines", "en", "s", 48),
    ]
    sf = str(tmp_path / "snm_sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_sorted_neighborhood(spark, sf).collect()
    }
    assert (1, 2) in got and got[(1, 2)] > 0.8


def test_snm_null_text_matches_oracle(spark, tmp_path):
    """NULL text must agree with the DuckDB oracle (ADVICE r7): norm is
    coalesced to '' on BOTH sides, so a NULL-text doc sorts with the empty
    prefix instead of concat_ws dropping its blocking key while the oracle
    sorts NULLs last."""
    import os

    import duckdb

    from yelpdatawarehouse_spark.queries.drafts_r10 import (
        SNM_ORACLE,
        dedup_sorted_neighborhood,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " twice", "en", "s", len(base) + 6),
        (3, None, "en", "s", 0),
        (4, None, "en", "s", 0),
        (5, "aardvark " + base, "en", "s", len(base) + 9),
    ]
    sf = str(tmp_path / "snm_null_sf")
    pq = os.path.join(sf, "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(pq)

    got = sorted(
        (r.doc_a, r.doc_b, r.rank_dist)
        for r in dedup_sorted_neighborhood(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = sorted((a, b, d) for a, b, d, _ in con.execute(SNM_ORACLE).fetchall())
    assert got == want
    # the two NULL docs normalize identically → they must pair with each other
    assert any(a == 3 and b == 4 for a, b, _ in got)


def test_readability_formula_consistent(spark):
    rows = _rows(spark, "text_readability_scores")
    assert rows
    for r in rows:
        want = (
            206.835
            - 1.015 * (r.total_words / r.total_sentences)
            - 84.6 * (r.total_syllables / r.total_words)
        )
        assert abs(r.flesch_ease - want) < 1e-3
        assert r.total_words >= r.n_docs  # every doc has >= 1 token


def test_url_density_counts_bounded(spark):
    rows = _rows(spark, "text_url_email_density")
    assert rows
    for r in rows:
        assert 0 <= r.docs_with_url <= r.n_docs
        assert r.url_token_density >= 0.0
        assert (r.total_urls == 0) <= (r.docs_with_url == 0)


def test_page_hinkley_digest_ordered_and_nonnegative(spark):
    rows = _rows(spark, "t33_page_hinkley_drift")
    assert 0 < len(rows) <= 10
    scores = [r.ph_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0.0 for s in scores)  # drawdown statistic is >= 0


def test_pca_eigen_identities(spark):
    """Eigenvalues must satisfy trace/determinant identities of the
    covariance matrix recomputed independently, and lam1 >= lam2 >= 0
    for a PSD matrix."""
    import numpy as np

    (r,) = _rows(spark, "ml_pca_2d_closed_form")
    li = table(spark, SF_TEST_DIR, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ).toPandas()
    cov = np.cov(li["l_quantity"], li["l_extendedprice"], ddof=0)
    lams = sorted(np.linalg.eigvalsh(cov), reverse=True)
    assert r.eigenvalue_1 >= r.eigenvalue_2 >= 0
    assert abs(r.eigenvalue_1 - lams[0]) / lams[0] < 1e-6
    assert abs(r.eigenvalue_2 - lams[1]) / max(lams[1], 1e-9) < 1e-4
    assert abs(r.explained_ratio_1 - lams[0] / (lams[0] + lams[1])) < 1e-6


# --- batch 3: TPC-H completion (Q6/Q7/Q8/Q13/Q19) -------------------------


def test_q6_revenue_bounded_by_unfiltered(spark):
    (r,) = _rows(spark, "j30_forecast_revenue_q6")
    li = table(spark, SF_TEST_DIR, "lineitem")
    n_all = li.count()
    assert 0 < r.n_lines < n_all
    assert r.forecast_revenue_increase > 0.0


def test_q7_directions_partition_the_flow(spark):
    rows = _rows(spark, "j31_volume_shipping_q7")
    assert rows
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert dirs == {("NATION_18", "NATION_19"), ("NATION_19", "NATION_18")}
    assert all(r.revenue > 0 for r in rows)
    # years within the data's date span
    assert all(1994 <= r.l_year <= 2002 for r in rows)


def test_q8_share_in_unit_interval_and_consistent(spark):
    rows = _rows(spark, "j32_market_share_q8")
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert 0.0 <= r.nation_revenue <= r.region_revenue
        assert abs(r.mkt_share - r.nation_revenue / r.region_revenue) < 1e-4


def test_q13_histogram_conserves_customers(spark):
    rows = _rows(spark, "a_custdist_q13")
    c = table(spark, SF_TEST_DIR, "customer").count()
    assert sum(r.custdist for r in rows) == c  # every customer in one bin
    o = table(spark, SF_TEST_DIR, "orders").count()
    assert sum(r.c_count * r.custdist for r in rows) == o  # mass conservation


def test_q19_brackets_are_subset_of_brand_filter(spark):
    (r,) = _rows(spark, "j33_bracket_revenue_q19")
    li = table(spark, SF_TEST_DIR, "lineitem")
    p = table(spark, SF_TEST_DIR, "part")
    brand_lines = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .count()
    )
    assert 0 <= r.n_lines <= brand_lines
    assert r.revenue >= 0.0


def test_snm_eval_precision_is_structural(spark):
    """Every SNM candidate on the panel must be a truth pair (the window
    filters by the same exact Jaccard), so hits == candidates; recall is
    the informative number and must be consistent with the counts."""
    (r,) = _rows(spark, "dedup_snm_recall_eval")
    assert r.n_hit == r.n_cand <= r.n_true
    assert abs(r.recall - r.n_hit / r.n_true) < 1e-3


def test_nprobe2_recall_dominates_nprobe1(spark):
    """Probing a superset of cells can only add candidates: per query,
    nprobe=2 recall >= the registered nprobe=1 recall, and candidate
    counts are >= — the monotonicity that makes the tuning curve a curve."""
    from yelpdatawarehouse_spark.queries.llmops import ann_ivf_recall_eval

    r1 = {r.query_id: r for r in ann_ivf_recall_eval(spark, SF_TEST_DIR).collect()}
    r2 = {r.query_id: r for r in _rows(spark, "ann_ivf_nprobe2_recall")}
    assert set(r1) == set(r2) and r1
    for qid in r1:
        assert r2[qid].recall_at_10 >= r1[qid].recall_at_10
        assert r2[qid].n_candidates >= r1[qid].n_candidates
