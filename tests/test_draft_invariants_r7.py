"""Semantic invariants for the round-7 drafts — properties the oracle hash
can't state, several pinned on CONSTRUCTED inputs that exercise branches
the sf corpora never hit (k-core actually peeling, a perfectly separable
stump split, a constant Holt series), same spirit as test_stats_guard.py.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries.drafts_r7 import (
    AHASH_HAMMING_MAX,
    DRAFTS,
    KCORE_K,
    RIDGE_LAMBDA,
)
from yelpdatawarehouse_spark.sources.tables import TABLES


def _rows(spark, name, sf_dir=SF_TEST_DIR):
    fn, _ = DRAFTS[name]
    return fn(spark, sf_dir).collect()


_DEFAULTS = {
    pa.int64(): 0,
    pa.int32(): 0,
    pa.float64(): 0.0,
    pa.string(): "",
}


def _synth_dir(tmp_path_factory, overrides: dict) -> str:
    """Schema-faithful sf dir: listed tables get the given rows (dicts of
    column -> list, unspecified columns filled with type defaults), every
    other table is a 0-row twin."""
    out = str(tmp_path_factory.mktemp("synth_sf"))
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SF_TEST_DIR, t + ".parquet"))
        if t not in overrides:
            pq.write_table(schema.empty_table(), os.path.join(out, t + ".parquet"))
            continue
        cols = overrides[t]
        n = len(next(iter(cols.values())))
        arrays = []
        for field in schema:
            if field.name in cols:
                arrays.append(pa.array(cols[field.name]).cast(field.type))
            elif pa.types.is_timestamp(field.type):
                arrays.append(
                    pa.array([datetime.datetime(1995, 1, 1)] * n).cast(field.type)
                )
            else:
                arrays.append(
                    pa.array([_DEFAULTS.get(field.type, 0)] * n).cast(field.type)
                )
        pq.write_table(pa.table(arrays, schema=schema), os.path.join(out, t + ".parquet"))
    return out


# ---------------------------------------------------------------------------
# k-core: on a star-plus-clique graph the peel must actually peel — the sf
# corpora at sf0.001 are dense enough that no node falls below k.


@pytest.fixture(scope="module")
def star_clique_dir(tmp_path_factory):
    # clique K4 on parts 1-4: two orders each containing all four parts
    # (every pair co-occurs twice -> edges). star: part 10 centered on
    # leaves 11-15, two orders per leaf containing only (10, leaf).
    orders, parts = [], []
    oid = 0
    for _ in range(2):
        oid += 1
        for p in (1, 2, 3, 4):
            orders.append(oid)
            parts.append(p)
    for leaf in (11, 12, 13, 14, 15):
        for _ in range(2):
            oid += 1
            for p in (10, leaf):
                orders.append(oid)
                parts.append(p)
    return _synth_dir(
        tmp_path_factory,
        {"lineitem": {"l_orderkey": orders, "l_partkey": parts}},
    )


def test_kcore_peels_star_keeps_clique(spark, star_clique_dir):
    rows = {r.part: r.residual_degree for r in _rows(spark, "g_kcore_parts", star_clique_dir)}
    # leaves (degree 1) peel in round 1; the hub (degree -> 0) peels in
    # round 2; the K4 clique (degree 3 = k) survives with full degree.
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3}
    assert KCORE_K == 3


# ---------------------------------------------------------------------------
# naive Bayes: perfectly separable vocabularies classify perfectly.


@pytest.fixture(scope="module")
def disjoint_vocab_dir(tmp_path_factory):
    ids, texts, sources = [], [], []
    for i in range(40):
        ids.append(i)
        if i % 2 == 0:
            texts.append("alpha beta gamma alpha")
            sources.append("srcA")
        else:
            texts.append("delta epsilon zeta zeta")
            sources.append("srcB")
    return _synth_dir(
        tmp_path_factory,
        {
            "documents": {
                "doc_id": ids,
                "text": texts,
                "lang": ["en"] * 40,
                "source": sources,
                "n_chars": [len(t) for t in texts],
            }
        },
    )


def test_naive_bayes_separable_is_diagonal(spark, disjoint_vocab_dir):
    rows = _rows(spark, "ml_naive_bayes_confusion", disjoint_vocab_dir)
    assert rows, "held-out split must be non-empty"
    for r in rows:
        assert r.true_source == r.pred_source, f"misclassified: {r}"
    assert sum(r.n_docs for r in rows) == 8  # 40 docs, doc_id % 5 == 0


def test_naive_bayes_confusion_is_total(spark):
    from yelpdatawarehouse_spark.sources.tables import table

    rows = _rows(spark, "ml_naive_bayes_confusion")
    n_test = (
        table(spark, SF_TEST_DIR, "documents")
        .filter("doc_id % 5 = 0")
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_test


# ---------------------------------------------------------------------------
# decision stump: a perfectly separable target reaches Gini 0 at the
# separating threshold.


@pytest.fixture(scope="module")
def separable_stump_dir(tmp_path_factory):
    qty = [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0] * 5
    flag = ["R" if q <= 2 else "N" for q in qty]
    return _synth_dir(
        tmp_path_factory,
        {
            "lineitem": {
                "l_orderkey": list(range(len(qty))),
                "l_partkey": list(range(len(qty))),
                "l_quantity": qty,
                "l_returnflag": flag,
            }
        },
    )


def test_stump_finds_perfect_split(spark, separable_stump_dir):
    (row,) = _rows(spark, "ml_decision_stump_returns", separable_stump_dir)
    assert row.threshold == 2
    assert row.split_gini == 0.0
    assert row.n_left == 20 and row.n_right == 20


# ---------------------------------------------------------------------------
# ridge: the query's Cramer solve must agree with an independent dense
# linear-algebra solve of the same normal equations (numpy).


def test_ridge_matches_numpy_solve(spark):
    import numpy as np

    (row,) = _rows(spark, "ml_ridge_normal_eq")
    import duckdb

    con = duckdb.connect()
    q, price, disc = (
        con.execute(
            f"""SELECT list(l_quantity ORDER BY l_orderkey, l_linenumber),
                       list(l_extendedprice ORDER BY l_orderkey, l_linenumber),
                       list(l_discount ORDER BY l_orderkey, l_linenumber)
                FROM read_parquet('{SF_TEST_DIR}/lineitem.parquet')"""
        ).fetchone()
    )
    Xm = np.column_stack([np.ones(len(q)), np.array(q), np.array(disc)])
    yv = np.array(price)
    A = Xm.T @ Xm + RIDGE_LAMBDA * np.eye(3)
    beta = np.linalg.solve(A, Xm.T @ yv)
    assert abs(row.beta_intercept - beta[0]) < 2e-3
    assert abs(row.beta_quantity - beta[1]) < 2e-3
    assert abs(row.beta_discount - beta[2]) < 2e-3


# ---------------------------------------------------------------------------
# Holt: a constant series has level == the constant and trend == 0 at
# every step; on real data the level trace must stay inside the series'
# min/max envelope (convexity of the update).


@pytest.fixture(scope="module")
def constant_revenue_dir(tmp_path_factory):
    days = [datetime.datetime(1995, 1, d + 1) for d in range(10)]
    return _synth_dir(
        tmp_path_factory,
        {
            "orders": {
                "o_orderkey": list(range(10)),
                "o_custkey": [1] * 10,
                "o_totalprice": [100.0] * 10,
                "o_orderdate": days,
            }
        },
    )


def test_holt_constant_series_is_flat(spark, constant_revenue_dir):
    rows = _rows(spark, "t21_holt_linear_daily", constant_revenue_dir)
    assert len(rows) == 10
    for r in rows:
        assert r.level == 100.0
        assert r.trend == 0.0


def test_holt_level_in_envelope(spark):
    rows = _rows(spark, "t21_holt_linear_daily")
    ys = [r.daily_revenue for r in rows]
    lo, hi = min(ys), max(ys)
    for r in rows:
        assert lo - 0.01 <= r.level <= hi + 0.01


# ---------------------------------------------------------------------------
# aHash: identical payloads collide at hamming 0; every emitted pair
# respects the banding bound.


@pytest.fixture(scope="module")
def twin_docs_dir(tmp_path_factory):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "the quick brown fox jumps over the lazy dog again and again today",
        "completely different content with other words entirely here now ok",
        "ZZZZ yyyy ZZZZ yyyy ZZZZ yyyy ZZZZ yyyy ZZZZ yyyy ZZZZ yyyy ZZ no",
    ]
    return _synth_dir(
        tmp_path_factory,
        {
            "documents": {
                "doc_id": [0, 1, 2, 3],
                "text": texts,
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [len(t) for t in texts],
            }
        },
    )


def test_ahash_twins_collide(spark, twin_docs_dir):
    rows = _rows(spark, "mm_ahash_near_dup_pairs", twin_docs_dir)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert pairs.get((0, 1)) == 0, "identical payloads must pair at hamming 0"


def test_ahash_respects_bound(spark):
    rows = _rows(spark, "mm_ahash_near_dup_pairs")
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= AHASH_HAMMING_MAX
        assert r.doc_a < r.doc_b


# ---------------------------------------------------------------------------
# Adamic-Adar: predicted links must be NON-edges of the strong graph, with
# at least one common neighbor each.


def test_adamic_adar_predicts_only_non_edges(spark):
    import duckdb

    rows = _rows(spark, "g_adamic_adar_nations")
    assert rows
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_TEST_DIR}/{t}.parquet')"
        )
    edges = set(
        map(
            tuple,
            con.execute(
                """WITH w AS (
                       SELECT c.c_nationkey a, s.s_nationkey b, count(*) wt
                       FROM orders o
                       JOIN customer c ON c.c_custkey = o.o_custkey
                       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                       JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
                   m AS (SELECT avg(wt) mu FROM w),
                   st AS (SELECT a, b FROM w, m WHERE wt >= mu)
                   SELECT a, b FROM st UNION SELECT b, a FROM st"""
            ).fetchall(),
        )
    )
    for r in rows:
        assert (r.nation_a, r.nation_b) not in edges
        assert r.n_common >= 1
        assert r.aa_score > 0
        assert r.nation_a < r.nation_b


# ---------------------------------------------------------------------------
# Q15: every returned supplier ties for the global maximum.


def test_q15_rows_all_tie_at_max(spark):
    rows = _rows(spark, "j22_top_supplier_q15")
    assert rows
    assert len({r.total_revenue for r in rows}) == 1


# ---------------------------------------------------------------------------
# RAKE: phrases are stopword-free, scores positive, k respected.


def test_rake_phrases_are_stopword_free(spark):
    from yelpdatawarehouse_spark.queries.drafts_r7 import RAKE_STOPWORDS, RAKE_TOP_K

    rows = _rows(spark, "text_rake_keywords")
    assert 0 < len(rows) <= RAKE_TOP_K
    for r in rows:
        assert r.rake_score > 0
        assert r.n_occurrences >= 1
        for w in r.phrase.split(" "):
            assert w not in RAKE_STOPWORDS
            assert w == w.lower()


# ---------------------------------------------------------------------------
# seasonal decomposition: components reassemble the series; the seasonal
# profile is centered; only interior (full-window) days are emitted.


def test_seasonal_decompose_identity(spark):
    from yelpdatawarehouse_spark.sources.tables import table

    rows = _rows(spark, "t22_weekday_seasonal_decompose")
    n_days = (
        table(spark, SF_TEST_DIR, "orders")
        .selectExpr("CAST(o_orderdate AS DATE) d")
        .distinct()
        .count()
    )
    assert len(rows) == n_days - 6
    for r in rows:
        assert (
            abs(r.daily_revenue - r.trend - r.seasonal - r.remainder) < 0.02
        ), r
    seasonal_by_day = {}
    for r in rows:
        seasonal_by_day.setdefault(r.seasonal, None)
    # 7 distinct weekday offsets, centered to ~0
    assert len(seasonal_by_day) == 7
    assert abs(sum(seasonal_by_day)) < 0.005 * 7


# ---------------------------------------------------------------------------
# nearest centroid: confusion totals the test split; orthogonal clusters
# classify perfectly.


@pytest.fixture(scope="module")
def orthogonal_embeddings_dir(tmp_path_factory):
    rows_v, rows_l = [], []
    for i in range(40):
        lab = i % 2
        base = [0.0] * 8
        base[lab] = 1.0
        base[4 + lab] = 0.5 if i % 3 else 1.0  # within-cluster variation
        rows_v.append(base)
        rows_l.append(lab)
    return _synth_dir(
        tmp_path_factory,
        {
            "embeddings": {
                "vec_id": list(range(40)),
                "embedding": rows_v,
                "label": rows_l,
            }
        },
    )


def test_centroid_classifier_separable_is_diagonal(spark, orthogonal_embeddings_dir):
    rows = _rows(spark, "ml_nearest_centroid_eval", orthogonal_embeddings_dir)
    assert rows
    for r in rows:
        assert r.true_label == r.pred_label, r
    assert sum(r.n_vecs for r in rows) == 8


def test_centroid_confusion_is_total(spark):
    from yelpdatawarehouse_spark.sources.tables import table

    rows = _rows(spark, "ml_nearest_centroid_eval")
    n_test = (
        table(spark, SF_TEST_DIR, "embeddings").filter("vec_id % 5 = 0").count()
    )
    assert sum(r.n_vecs for r in rows) == n_test


# ---------------------------------------------------------------------------
# runs test: an alternating series runs n times; a two-block series runs
# exactly twice (both give |z| far from 0 on opposite sides).


def _revenue_days(pattern):
    days, prices = [], []
    for i, hi in enumerate(pattern):
        days.append(datetime.datetime(1995, 2, 1) + datetime.timedelta(days=i))
        prices.append(5000.0 if hi else 100.0)
    return {
        "orders": {
            "o_orderkey": list(range(len(pattern))),
            "o_totalprice": prices,
            "o_orderdate": days,
        }
    }


def test_runs_test_alternating_and_blocked(spark, tmp_path_factory):
    alt = _synth_dir(tmp_path_factory, _revenue_days([i % 2 == 0 for i in range(20)]))
    (r,) = _rows(spark, "a_runs_test_daily_revenue", alt)
    assert r.n_runs == 20 and r.n_above == 10 and r.n_below == 10
    assert r.z_score > 2, "alternation = far more runs than chance"
    blk = _synth_dir(tmp_path_factory, _revenue_days([i < 10 for i in range(20)]))
    (r2,) = _rows(spark, "a_runs_test_daily_revenue", blk)
    assert r2.n_runs == 2
    assert r2.z_score < -2, "two blocks = far fewer runs than chance"


# ---------------------------------------------------------------------------
# scene cuts: a payload with one abrupt content change cuts exactly once,
# at the known boundary magnitude; uniform payloads never cut.


def test_scene_cut_detects_constructed_boundary(spark, tmp_path_factory):
    texts = [
        "a" * 128 + "z" * 128,   # one dominant jump: frame 1 -> 2
        "m" * 256,               # uniform: max_jump 0, no cuts
        "q" * 40,                # single frame: no jumps possible
    ]
    d = _synth_dir(
        tmp_path_factory,
        {
            "documents": {
                "doc_id": [0, 1, 2],
                "text": texts,
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [len(t) for t in texts],
            }
        },
    )
    rows = {r.doc_id: r for r in _rows(spark, "mm_scene_cut_profile", d)}
    assert rows[0].n_frames == 4
    assert rows[0].n_cuts == 1
    assert rows[0].max_jump == 64 * (ord("z") - ord("a"))
    assert rows[1].n_frames == 4 and rows[1].n_cuts == 0 and rows[1].max_jump == 0
    assert rows[2].n_frames == 1 and rows[2].n_cuts == 0 and rows[2].max_jump == 0


# ---------------------------------------------------------------------------
# Kalman local level: gain and variance bounded; level inside the series
# envelope (convex update).


def test_kalman_bounds_and_envelope(spark):
    from yelpdatawarehouse_spark.queries.drafts_r7 import KALMAN_Q, KALMAN_R

    rows = _rows(spark, "t25_kalman_local_level")
    assert rows
    ys = [r.daily_revenue for r in rows]
    lo, hi = min(ys), max(ys)
    for r in rows:
        assert 0 < r.kalman_gain <= 1
        assert 0 < r.error_variance <= KALMAN_R + KALMAN_Q
        assert lo - 0.01 <= r.level_estimate <= hi + 0.01
    # steady state: the gain converges to the Riccati fixed point
    import math

    pstar = (KALMAN_Q + math.sqrt(KALMAN_Q * KALMAN_Q + 4 * KALMAN_Q * KALMAN_R)) / 2
    kstar = pstar / (pstar + KALMAN_R)
    assert abs(rows[-1].kalman_gain - kstar) < 1e-3


# ---------------------------------------------------------------------------
# RFM: codes are three quintile digits; the histogram is total over
# customers who ordered.


def test_rfm_codes_and_totals(spark):
    from yelpdatawarehouse_spark.sources.tables import table

    rows = _rows(spark, "w12_rfm_segments")
    assert rows
    for r in rows:
        digits = (r.rfm_code // 100, (r.rfm_code // 10) % 10, r.rfm_code % 10)
        assert all(1 <= d <= 5 for d in digits), r
        assert r.n_customers >= 1
        assert r.avg_monetary > 0
        assert r.avg_frequency >= 1
    n_buyers = (
        table(spark, SF_TEST_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_buyers


# ---------------------------------------------------------------------------
# Mahalanobis outliers: a constructed extreme vector ranks first; constant
# dimensions are excluded from the distance, not divided by.


def test_mahalanobis_flags_constructed_outlier(spark, tmp_path_factory):
    import random

    rng = random.Random(75)
    vecs = [[rng.gauss(0, 1) for _ in range(6)] + [7.0] for _ in range(30)]
    vecs[13] = [25.0] * 6 + [7.0]  # extreme on every varying dim; dim 7 constant
    d = _synth_dir(
        tmp_path_factory,
        {
            "embeddings": {
                "vec_id": list(range(30)),
                "embedding": vecs,
                "label": [0] * 30,
            }
        },
    )
    rows = _rows(spark, "emb_mahalanobis_outliers", d)
    assert rows[0].n_dims_used == 6, "constant dimension must be excluded"
    top = max(rows, key=lambda r: r.mahal_dist)
    assert top.vec_id == 13
    for r in rows:
        assert r.mahal_dist >= 0


# ---------------------------------------------------------------------------
# KS drift: D in [0,1]; per-source + rest totals the corpus; a constructed
# shifted source must flag drift while an identical source must not.


def test_ks_drift_bounds_and_construction(spark, tmp_path_factory):
    rows = _rows(spark, "text_ks_length_drift")
    assert rows
    total = rows[0].n_source + rows[0].n_rest
    for r in rows:
        assert 0.0 <= r.ks_d <= 1.0
        assert r.n_source + r.n_rest == total
        assert r.drift_flag == (r.ks_d > r.critical_d)
    # 60 docs at length 20 split over two sources, 10 shifted docs at 400:
    # "shifted" vs rest has disjoint support (D = 1, flagged); "same" vs
    # rest differs only by the small shifted tail (D = 0.25 < crit 0.33).
    d = _synth_dir(
        tmp_path_factory,
        {
            "documents": {
                "doc_id": list(range(70)),
                "text": ["w " * 10] * 60 + ["w " * 200] * 10,
                "lang": ["en"] * 70,
                "source": ["same"] * 30 + ["same2"] * 30 + ["shifted"] * 10,
                "n_chars": [20] * 60 + [400] * 10,
            }
        },
    )
    got = {r.source: r for r in _rows(spark, "text_ks_length_drift", d)}
    assert got["shifted"].drift_flag, "disjoint length support must drift"
    assert got["shifted"].ks_d == 1.0
    assert not got["same"].drift_flag, "a matching-shape source must not"


# ---------------------------------------------------------------------------
# weighted median: on a constructed group the answer is hand-checkable,
# and heavy weight on one price pins the median there.


def test_weighted_median_constructed(spark, tmp_path_factory):
    d = _synth_dir(
        tmp_path_factory,
        {
            "lineitem": {
                "l_orderkey": list(range(5)),
                "l_partkey": list(range(5)),
                "l_returnflag": ["X"] * 5,
                "l_extendedprice": [10.0, 20.0, 30.0, 40.0, 50.0],
                "l_quantity": [1.0, 1.0, 1.0, 1.0, 10.0],
            }
        },
    )
    (r,) = _rows(spark, "f16_weighted_median_price", d)
    # total weight 14, half 7 -> first cum >= 7 is price 50 (cum 14)
    assert r.weighted_median_price == 50.0
    assert r.total_weight == 14


# ---------------------------------------------------------------------------
# Heaps' law: monotone curve, vocab bounded by tokens, full decile grid.


def test_heaps_curve_shape(spark):
    rows = sorted(_rows(spark, "diag_heaps_vocab_growth"), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    prev_t, prev_v = 0, 0
    for r in rows:
        assert r.cum_tokens >= prev_t and r.cum_vocab >= prev_v
        assert r.cum_vocab <= r.cum_tokens
        prev_t, prev_v = r.cum_tokens, r.cum_vocab
    betas = {r.heaps_beta for r in rows}
    assert len(betas) == 1
    (beta,) = betas
    # the sf corpus has a CLOSED ~31-token vocabulary: the whole vocab
    # appears in decile 1, so the fitted exponent is exactly 0 — the
    # "tokenizer pathology" the docstring describes, detected correctly
    assert 0 <= beta <= 1.0


def test_heaps_beta_near_one_on_open_vocab(spark, tmp_path_factory):
    # every doc contributes brand-new tokens -> vocab grows linearly with
    # tokens -> fitted exponent ~1
    texts = [
        " ".join(f"tok{i}_{j}" for j in range(10)) for i in range(50)
    ]
    d = _synth_dir(
        tmp_path_factory,
        {
            "documents": {
                "doc_id": list(range(50)),
                "text": texts,
                "lang": ["en"] * 50,
                "source": ["s"] * 50,
                "n_chars": [len(t) for t in texts],
            }
        },
    )
    rows = _rows(spark, "diag_heaps_vocab_growth", d)
    assert rows
    (beta,) = {r.heaps_beta for r in rows}
    assert 0.98 <= beta <= 1.0
    for r in rows:
        assert r.cum_vocab == r.cum_tokens, "all-unique corpus: V == N"


# ---------------------------------------------------------------------------
# boosting: round 1 equals the standalone stump; upweighting is non-empty
# on imperfect data; both impurities well-formed.


def test_boosting_round_consistency(spark):
    (b,) = _rows(spark, "ml_boosting_round_stumps")
    (s,) = _rows(spark, "ml_decision_stump_returns")
    assert b.r1_threshold == s.threshold
    assert abs(b.r1_gini - s.split_gini) < 1e-9
    assert b.n_upweighted > 0, "sf data is not perfectly separable"
    assert 0 <= b.r2_weighted_gini <= 0.5
    assert b.r1_left_label in ("R", "N") and b.r1_right_label in ("R", "N")
