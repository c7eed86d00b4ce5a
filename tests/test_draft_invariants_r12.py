"""Model-twin and structural invariants for the round-12 drafts
(queries/drafts_r12.py), beyond the oracle-parity/determinism/empty-input
sweeps every registered query already gets."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.operators.graph import bfs_min_hops, bfs_min_hops_multi
from yelpdatawarehouse_spark.queries.drafts_r12 import (
    HW_ALPHA,
    HW_BETA,
    HW_GAMMA,
    HW_PERIOD,
    emb_silhouette_eval,
    g_closeness_centrality,
    split_leakage_safe_groups,
    t36_holt_winters_daily,
)
from yelpdatawarehouse_spark.queries.graphq import trade_edges
from yelpdatawarehouse_spark.queries.llmops import split_train_val_test
from yelpdatawarehouse_spark.sources.tables import table


# ---------------------------------------------------------------------------
# g_closeness_centrality


def test_multi_root_bfs_matches_single_source(spark):
    """The simultaneous multi-root frame must agree with the existing
    single-source operator root by root (on a couple of roots)."""
    edges = trade_edges(spark, SF_TEST_DIR)
    roots = spark.createDataFrame([(0,), (5,)], "k LONG")
    multi = {
        (r.root, r.node): r.hops
        for r in bfs_min_hops_multi(spark, edges, roots, max_hops=6).collect()
    }
    for root in (0, 5):
        single = {
            r.node: r.hops
            for r in bfs_min_hops(spark, edges, start=root, max_hops=6).collect()
        }
        got = {n: h for (rt, n), h in multi.items() if rt == root}
        assert got == single, f"root {root}: multi-root BFS diverges"


def test_closeness_bounds_and_consistency(spark):
    rows = g_closeness_centrality(spark, SF_TEST_DIR).collect()
    assert len(rows) == table(spark, SF_TEST_DIR, "nation").count()
    for r in rows:
        assert 0.0 <= r.closeness <= 1.0  # hops >= 1 => mean dist >= 1
        assert r.harmonic >= 0.0
        if r.n_reached == 0:
            assert r.closeness == 0.0 and r.harmonic == 0.0 and r.sum_hops == 0
        else:
            assert r.sum_hops >= r.n_reached  # every reached node >= 1 hop
            # harmonic <= n_reached (each term <= 1), with equality iff
            # every reachable node is at distance exactly 1
            assert r.harmonic <= r.n_reached + 1e-9
            want = math.floor(r.n_reached / r.sum_hops * 1e6 + 0.5) / 1e6
            assert r.closeness == pytest.approx(want)


# ---------------------------------------------------------------------------
# emb_silhouette_eval


def test_silhouette_bounds_and_coverage(spark):
    rows = emb_silhouette_eval(spark, SF_TEST_DIR).collect()
    emb = table(spark, SF_TEST_DIR, "embeddings")
    assert sum(r.n_vectors for r in rows) == emb.count()
    assert len(rows) == emb.select("label").distinct().count()
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.mean_intra_dist >= 0.0
        assert r.mean_nearest_other >= 0.0


def test_silhouette_planted_clusters(spark):
    """Perfectly separated planted clusters must score ~1; the score must
    see through row order (same data, shuffled, scores identically)."""
    import pandas as pd

    rows = []
    for label in range(3):
        base = [0.0] * 8
        base[label] = 10.0
        for i in range(20):
            v = list(base)
            v[(label + 1) % 8] = (i % 5) * 0.01  # tiny intra-cluster spread
            rows.append((label * 100 + i, v, label))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(os.path.join(td, "embeddings.parquet"))
        got = {r.label: r for r in emb_silhouette_eval(spark, td).collect()}
        assert set(got) == {0, 1, 2}
        for r in got.values():
            assert r.mean_silhouette > 0.95, "planted separation must be seen"
            assert r.n_vectors == 20


# ---------------------------------------------------------------------------
# t36_holt_winters_daily


def test_holt_winters_python_twin(spark):
    """Replay the recursion in plain Python from the day spine and demand
    2dp-identical traces (the t21/t25 model-twin discipline)."""
    daily = (
        table(spark, SF_TEST_DIR, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("c"))
        .orderBy("d")
        .collect()
    )
    m = HW_PERIOD
    ys = [r.c / 100.0 for r in daily]
    assert len(ys) >= 2 * m, "test data must span two weeks"
    lm = sum(r.c for r in daily[:m]) / (m * 100.0)
    bm = (sum(r.c for r in daily[m : 2 * m]) - sum(r.c for r in daily[:m])) / (
        m * 100.0
    ) / float(m)
    s = [y - lm for y in ys[:m]]
    level, trend = lm, bm
    expect = {}
    for t in range(m, len(ys)):
        y = ys[t]
        sprev = s[t - m]
        fitted = level + trend + sprev
        new_l = HW_ALPHA * (y - sprev) + (1 - HW_ALPHA) * (level + trend)
        new_b = HW_BETA * (new_l - level) + (1 - HW_BETA) * trend
        s.append(HW_GAMMA * (y - new_l) + (1 - HW_GAMMA) * sprev)
        level, trend = new_l, new_b
        key = daily[t].d.strftime("%Y-%m-%d")
        expect[key] = (
            math.floor(y * 100 + 0.5) / 100,
            math.floor(level * 100 + 0.5) / 100,
            math.floor(trend * 100 + 0.5) / 100,
            math.floor(s[-1] * 100 + 0.5) / 100,
            math.floor(fitted * 100 + 0.5) / 100,
        )
    got = {
        r.day: (r.daily_revenue, r.level, r.trend, r.seasonal, r.fitted)
        for r in t36_holt_winters_daily(spark, SF_TEST_DIR).collect()
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=0.011), k


def test_holt_winters_short_series_empty(spark, tmp_path):
    """A series shorter than two periods has no defined fit — empty out."""
    orders = table(spark, SF_TEST_DIR, "orders").filter(
        F.col("o_orderdate") < F.lit("1992-01-10")
    )
    n_days = orders.select(F.col("o_orderdate").cast("date")).distinct().count()
    out = str(tmp_path / "orders.parquet")
    orders.write.parquet(out)
    got = t36_holt_winters_daily(spark, str(tmp_path)).collect()
    if n_days < 2 * HW_PERIOD:
        assert got == []
    else:  # data denser than expected — still must emit n_days - m rows
        assert len(got) == n_days - HW_PERIOD


# ---------------------------------------------------------------------------
# split_leakage_safe_groups


def test_group_split_has_zero_leakage(spark):
    rows = {r.method: r for r in split_leakage_safe_groups(spark, SF_TEST_DIR).collect()}
    assert set(rows) == {"doc_hash", "group_hash"}
    g, d = rows["group_hash"], rows["doc_hash"]
    assert g.cross_split_pairs == 0, "group-aware split must never split a group"
    assert g.dup_pairs == d.dup_pairs and g.dup_groups == d.dup_groups
    n_docs = table(spark, SF_TEST_DIR, "documents").count()
    for r in rows.values():
        assert r.train_docs + r.val_docs + r.test_docs == n_docs
        assert r.cross_split_pairs <= r.dup_pairs


def test_doc_hash_split_matches_existing_splitter(spark):
    """The naive leg reuses split_train_val_test's exact hash slots — the
    per-split doc totals must agree with that query."""
    want = {
        s: n
        for s, n in (
            split_train_val_test(spark, SF_TEST_DIR)
            .groupBy("split")
            .agg(F.sum("n_docs").alias("n"))
            .collect()
        )
    }
    r = {
        row.method: row for row in split_leakage_safe_groups(spark, SF_TEST_DIR).collect()
    }["doc_hash"]
    assert want == {"train": r.train_docs, "val": r.val_docs, "test": r.test_docs}


# ---------------------------------------------------------------------------
# dedup_lsh_s_curve_eval


def test_s_curve_theory_and_bounds(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import dedup_lsh_s_curve_eval

    rows = dedup_lsh_s_curve_eval(spark, SF_TEST_DIR).collect()
    assert rows, "panel must produce at least one similarity bucket"
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0 <= r.n_cand <= r.n_pairs
        assert 0.0 <= r.measured_rate <= 1.0
        s = (r.bucket + 0.5) / 10.0
        want = 1.0 - (1.0 - s**4) ** 4
        assert r.theory_rate == pytest.approx(
            math.floor(want * 1e6 + 0.5) / 1e6
        ), f"bucket {r.bucket}: theory term drifted from 1-(1-s^4)^4"
    # the S-curve's defining property: the theoretical rate is strictly
    # increasing in similarity
    rows.sort(key=lambda r: r.bucket)
    for a, b in zip(rows, rows[1:]):
        assert a.theory_rate < b.theory_rate


# ---------------------------------------------------------------------------
# text_kn_continuation_stats


def test_kn_continuation_python_twin(spark):
    """Recompute the continuation ratio in plain Python from the engine's
    own token stream (isolates the count/ratio/ranking logic)."""
    from collections import Counter

    from yelpdatawarehouse_spark.queries.drafts_r12 import (
        _KN_MIN_COUNT,
        _KN_TOP,
        text_kn_continuation_stats,
    )
    from yelpdatawarehouse_spark.functions import text as T

    d = table(spark, SF_TEST_DIR, "documents")
    docs = [r.t for r in d.select(T.tokens("text").alias("t")).collect()]
    uni: Counter = Counter()
    bg_types = set()
    for t in docs:
        uni.update(t)
        bg_types.update(zip(t, t[1:]))
    n = sum(uni.values())
    b = len(bg_types)
    cont: Counter = Counter()
    for _, w2 in bg_types:
        cont[w2] += 1
    scored = []
    for w, c in uni.items():
        if c >= _KN_MIN_COUNT:
            ratio = math.floor((cont[w] * n) / (b * c) * 1e6 + 0.5) / 1e6
            scored.append((ratio, w, c, cont[w]))
    scored.sort()
    want = scored[:_KN_TOP]
    got = text_kn_continuation_stats(spark, SF_TEST_DIR).collect()
    assert [(r.cont_ratio, r.w, r.c_uni, r.n_contexts) for r in got] == [
        (r0, w0, c0, k0) for (r0, w0, c0, k0) in want
    ]


# ---------------------------------------------------------------------------
# mm_wht_fingerprint_pairs


def test_wht_kernel_python_twin(spark):
    """The Arrow kernel must equal a from-scratch WHT on sampled chars."""
    import pandas as pd

    from yelpdatawarehouse_spark.multimodal.columns import wht_fingerprint

    texts = ["hello world this is a longer document " * 4, "short", "a" * 33]
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    got = {
        r.doc_id: r.wh
        for r in wht_fingerprint(spark.createDataFrame(pdf)).collect()
    }
    for doc_id, t in zip([1, 2, 3], texts):
        L = len(t)
        st = L // 32 if L >= 32 else 1
        nc = 32 if L >= 32 else L
        v = [ord(t[i * st]) if i < nc else 0 for i in range(32)]
        wh = 0
        for u in range(1, 17):
            w = sum(
                v[i] * (1 if bin(i & u).count("1") % 2 == 0 else -1)
                for i in range(32)
            )
            if w > 0:
                wh |= 1 << (u - 1)
        assert got[doc_id] == wh, f"doc {doc_id}"


def test_wht_pairs_exact_dup_and_bounds(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import mm_wht_fingerprint_pairs

    rows = mm_wht_fingerprint_pairs(spark, SF_TEST_DIR).collect()
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 1
        assert (r.doc_a, r.doc_b) not in seen, "pair emitted twice"
        seen.add((r.doc_a, r.doc_b))
    # exact duplicates share every fingerprint: hamming-0 pairs exist on
    # this corpus (it contains verbatim copies — the dedup suite's base)
    assert any(r.hamming == 0 for r in rows)


# ---------------------------------------------------------------------------
# t37_ar2_yule_walker


def test_ar2_numpy_twin(spark):
    import numpy as np

    from yelpdatawarehouse_spark.queries.drafts_r12 import t37_ar2_yule_walker

    daily = (
        table(spark, SF_TEST_DIR, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").alias("x"))
        .orderBy("d")
        .collect()
    )
    x = np.array([float(r.x) for r in daily])

    def rho(k: int) -> float:
        a, b = x[k:], x[:-k]
        return float(np.corrcoef(a, b)[0, 1])

    r1, r2 = rho(1), rho(2)
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    got = t37_ar2_yule_walker(spark, SF_TEST_DIR).collect()[0]
    assert got.n_days == len(daily)
    assert got.rho1 == pytest.approx(r1, abs=2e-6)
    assert got.rho2 == pytest.approx(r2, abs=2e-6)
    assert got.phi1 == pytest.approx(phi1, abs=2e-6)
    assert got.phi2 == pytest.approx(phi2, abs=2e-6)
    # stationarity triangle |phi2| < 1, phi2 +- phi1 < 1 is not asserted
    # (data-dependent); the YW identities above are the contract


# ---------------------------------------------------------------------------
# ann_ivf_nprobe_curve


def test_nprobe_curve_monotone_and_matches_pointwise_anchors(spark):
    """The curve must be monotone in nprobe (nested probe sets) and its
    nprobe=1 / nprobe=2 points must agree with the independently
    registered pointwise evals (macro recall = mean of their per-query
    recalls; candidate totals = sum)."""
    from yelpdatawarehouse_spark.queries.drafts_r10 import ann_ivf_nprobe2_recall
    from yelpdatawarehouse_spark.queries.drafts_r12 import ann_ivf_nprobe_curve
    from yelpdatawarehouse_spark.queries.llmops import ann_ivf_recall_eval

    curve = {r.nprobe: r for r in ann_ivf_nprobe_curve(spark, SF_TEST_DIR).collect()}
    assert sorted(curve) == [1, 2, 4]
    for a, b in zip([1, 2], [2, 4]):
        assert curve[a].mean_recall_at_10 <= curve[b].mean_recall_at_10
        assert curve[a].total_candidates <= curve[b].total_candidates
        assert curve[a].total_hits <= curve[b].total_hits
    for np_, anchor_fn in [(1, ann_ivf_recall_eval), (2, ann_ivf_nprobe2_recall)]:
        rows = anchor_fn(spark, SF_TEST_DIR).collect()
        assert curve[np_].total_hits == sum(r.hits for r in rows)
        assert curve[np_].total_candidates == sum(r.n_candidates for r in rows)
        want = math.floor(
            sum(r.hits for r in rows) / (10.0 * len(rows)) * 1e4 + 0.5
        ) / 1e4
        assert curve[np_].mean_recall_at_10 == pytest.approx(want)


# ---------------------------------------------------------------------------
# diag_table_profiler


def test_table_profiler_consistency(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import (
        _PROFILE_COLS,
        diag_table_profiler,
    )

    rows = {r.column_name: r for r in diag_table_profiler(spark, SF_TEST_DIR).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    o = table(spark, SF_TEST_DIR, "orders")
    n = o.count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_non_null <= n
        assert 1 <= r.n_distinct <= r.n_non_null
        assert r.min_value <= r.max_value or r.n_non_null == 0
    assert rows["o_orderkey"].n_distinct == n, "o_orderkey is the PK"


# ---------------------------------------------------------------------------
# g_eccentricity_diameter


def test_eccentricity_identities(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import g_eccentricity_diameter

    r = g_eccentricity_diameter(spark, SF_TEST_DIR).collect()[0]
    assert r.radius <= r.diameter <= 2 * r.radius  # metric-space identity
    assert 1 <= r.n_center <= r.n_nodes
    assert 1 <= r.n_periphery <= r.n_nodes
    edges = trade_edges(spark, SF_TEST_DIR)
    assert r.n_nodes == edges.select("src").distinct().count()


# ---------------------------------------------------------------------------
# sample_ess_lengths


def test_ess_bounds_and_uniform_case(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import sample_ess_lengths

    rows = sample_ess_lengths(spark, SF_TEST_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.ess <= r.n_docs + 1e-9
        assert 0 < r.ess_ratio <= 1.0
    # uniform weights => ESS == n exactly (synthetic single-source table)
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": range(10), "source": ["u"] * 10, "text": ["tok " * 7] * 10,
         "lang": ["en"] * 10, "n_chars": [28] * 10}
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(os.path.join(td, "documents.parquet"))
        got = sample_ess_lengths(spark, td).collect()[0]
        assert got.ess == pytest.approx(10.0)
        assert got.ess_ratio == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# text_term_burstiness_topk


def test_burstiness_python_twin(spark):
    """Recompute the dispersion ranking in plain Python from the engine's
    token stream."""
    from collections import Counter

    from yelpdatawarehouse_spark.queries.drafts_r12 import (
        _BURST_MIN_COUNT,
        _BURST_TOP,
        text_term_burstiness_topk,
    )

    d = table(spark, SF_TEST_DIR, "documents")
    toks = [
        (r.doc_id, r.w)
        for r in d.select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("w"),
        ).collect()
    ]
    n_docs = len({doc for doc, _ in toks})
    per = Counter(toks)
    c: Counter = Counter()
    ssq: Counter = Counter()
    df: Counter = Counter()
    for (_, w), x in per.items():
        c[w] += x
        ssq[w] += x * x
        df[w] += 1
    scored = []
    for w, cw in c.items():
        if cw >= _BURST_MIN_COUNT:
            ex = cw / n_docs
            vmr = (ssq[w] / n_docs - ex * ex) / ex
            scored.append((-(math.floor(vmr * 1e4 + 0.5) / 1e4), w, cw, df[w]))
    scored.sort()
    want = [(w, cw, dfw, -negv) for negv, w, cw, dfw in scored[:_BURST_TOP]]
    got = [
        (r.w, r.term_count, r.doc_freq, r.vmr)
        for r in text_term_burstiness_topk(spark, SF_TEST_DIR).collect()
    ]
    assert got == [(w, cw, dfw, pytest.approx(v)) for w, cw, dfw, v in want]


# ---------------------------------------------------------------------------
# g_degree_assortativity


def test_assortativity_regular_graph_is_null_and_star_is_negative(spark, tmp_path):
    """On the saturated trade graph every nation has equal degree, so the
    variance guard must yield NULL identically on both engines; on a
    planted star graph the statistic must be strongly negative (hubs
    connect to leaves — the textbook disassortative case)."""
    import os

    from yelpdatawarehouse_spark.queries.drafts_r12 import g_degree_assortativity

    got = g_degree_assortativity(spark, SF_TEST_DIR).collect()[0]
    edges = trade_edges(spark, SF_TEST_DIR)
    degs = edges.groupBy("src").count().select("count").distinct().count()
    if degs == 1:  # regular graph (the saturated corpus case)
        assert got.assortativity is None
    # planted star: customer nation 0 trades with supplier nations 1..6
    # only. Build a tiny star corpus: orders/lineitem wiring one hub.
    rows_c = [(i, f"c{i}", i, 0.0, "BUILDING") for i in range(7)]
    rows_s = [(i, f"s{i}", i, 0.0) for i in range(7)]
    rows_n = [(i, f"N{i}", 0) for i in range(7)]
    rows_o = [(k, 0 if k % 2 == 0 else k % 7, "O", 1.0, "1995-01-01", "1-URGENT")
              for k in range(1, 25)]
    # hub pattern: even orders come from nation 0's customer, odd from leaf
    # k%7; line k always supplied by supplier (k % 7) if even else 0 —
    # every edge touches nation 0
    rows_l = [(k, 1, (k % 7) if k % 2 == 0 else 0, 1, 1.0, 1.0, 0.0, 0.0,
               "N", "O", "1995-01-02") for k in range(1, 25)]
    td = str(tmp_path)
    spark.createDataFrame(rows_c, "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE, c_mktsegment STRING").write.parquet(os.path.join(td, "customer.parquet"))
    spark.createDataFrame(rows_s, "s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE").write.parquet(os.path.join(td, "supplier.parquet"))
    spark.createDataFrame(rows_n, "n_nationkey LONG, n_name STRING, n_regionkey LONG").write.parquet(os.path.join(td, "nation.parquet"))
    spark.createDataFrame(rows_o, "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING").write.parquet(os.path.join(td, "orders.parquet"))
    spark.createDataFrame(rows_l, "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate STRING").write.parquet(os.path.join(td, "lineitem.parquet"))
    star = g_degree_assortativity(spark, td).collect()[0]
    assert star.assortativity is not None and star.assortativity < -0.5


# ---------------------------------------------------------------------------
# ann_hubness_stats


def test_hubness_conservation_and_bounds(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import (
        _HUB_K,
        _HUB_PANEL,
        ann_hubness_stats,
    )

    r = ann_hubness_stats(spark, SF_TEST_DIR).collect()[0]
    # mass conservation: sum of k-occurrences = panel * k exactly, so
    # mean * n_listed == PANEL * K (up to the 4dp rounding of the mean)
    total = _HUB_PANEL * _HUB_K
    assert r.n_listed_vectors <= total
    assert abs(r.mean_k_occurrence * r.n_listed_vectors - total) < r.n_listed_vectors * 1e-3
    assert 1 <= r.max_k_occurrence <= _HUB_PANEL


# ---------------------------------------------------------------------------
# a_anova_weekday_revenue


def test_anova_numpy_twin(spark):
    import numpy as np

    from yelpdatawarehouse_spark.queries.drafts_r12 import a_anova_weekday_revenue

    daily = (
        table(spark, SF_TEST_DIR, "orders")
        .groupBy(
            F.col("o_orderdate").cast("date").alias("d"),
            F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow"),
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("c"))
        .collect()
    )
    groups: dict = {}
    for r in daily:
        groups.setdefault(r.dow, []).append(r.c / 100.0)
    xs = [np.array(v) for v in groups.values()]
    allx = np.concatenate(xs)
    gm = allx.mean()
    ssb = sum(len(x) * (x.mean() - gm) ** 2 for x in xs)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in xs)
    k, n = len(xs), len(allx)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = a_anova_weekday_revenue(spark, SF_TEST_DIR).collect()[0]
    assert got.n_days == n and got.n_groups == k
    assert got.ssb_millions == pytest.approx(ssb / 1e6, abs=0.011)
    assert got.ssw_millions == pytest.approx(ssw / 1e6, abs=0.011)
    assert got.f_stat == pytest.approx(f, abs=2e-4)


# ---------------------------------------------------------------------------
# Property twins (hypothesis) for the two round-12 kernels whose
# arithmetic lives outside SQL: the WHT fingerprint (Arrow numpy kernel)
# and the Holt-Winters fold. One Spark job per example keeps each case
# bounded; example counts follow the suite's property-test budget.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        min_size=1,
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


def _wht_twin(t: str) -> int:
    length = len(t)
    stride = length // 32 if length >= 32 else 1
    nc = 32 if length >= 32 else length
    v = [ord(t[i * stride]) if i < nc else 0 for i in range(32)]
    wh = 0
    for u in range(1, 17):
        w = sum(
            v[i] * (1 if bin(i & u).count("1") % 2 == 0 else -1)
            for i in range(32)
        )
        if w > 0:
            wh |= 1 << (u - 1)
    return wh


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_wht_kernel_property_twin(spark, texts):
    """Arbitrary (incl. multi-byte) strings: the Arrow kernel must equal
    the code-point-sampling model exactly — ord() semantics, stride
    rounding, zero padding, sign thresholds."""
    import pandas as pd

    from yelpdatawarehouse_spark.multimodal.columns import wht_fingerprint

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = {
        r.doc_id: r.wh for r in wht_fingerprint(spark.createDataFrame(pdf)).collect()
    }
    want = {i: _wht_twin(t) for i, t in enumerate(texts)}
    assert got == want


# ---------------------------------------------------------------------------
# dedup_minhash_estimate_eval


def test_minhash_estimate_eval_statistics(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import dedup_minhash_estimate_eval

    rows = dedup_minhash_estimate_eval(spark, SF_TEST_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0.0 <= r.mean_estimate <= 1.0
        assert r.mae >= abs(r.bias) - 1e-9  # MAE dominates |bias| always
        # 16 permutations: sd <= sqrt(0.25/16) = 0.125; a decile's MAE
        # beyond ~4 sd means the estimator (or the permutation family)
        # is broken, not noisy
        assert r.mae < 0.5


# ---------------------------------------------------------------------------
# mm_wht_hamming_histogram


def test_wht_histogram_mass_and_bounds(spark):
    from yelpdatawarehouse_spark.queries.drafts_r12 import (
        _WHT_COEFS,
        _WHTH_PANEL,
        mm_wht_hamming_histogram,
    )

    rows = mm_wht_hamming_histogram(spark, SF_TEST_DIR).collect()
    n_docs = (
        table(spark, SF_TEST_DIR, "documents")
        .filter((F.length("text") > 0) & (F.col("doc_id") < _WHTH_PANEL))
        .count()
    )
    assert sum(r.n_pairs for r in rows) == n_docs * (n_docs - 1) // 2
    for r in rows:
        assert 0 <= r.hamming <= _WHT_COEFS
    # consistency with the pair query's threshold: pairs at hamming <= 1
    # inside the panel must equal the near-dup query's panel-internal hits
    from yelpdatawarehouse_spark.queries.drafts_r12 import mm_wht_fingerprint_pairs

    close_mass = sum(r.n_pairs for r in rows if r.hamming <= 1)
    panel_pairs = (
        mm_wht_fingerprint_pairs(spark, SF_TEST_DIR)
        .filter((F.col("doc_a") < _WHTH_PANEL) & (F.col("doc_b") < _WHTH_PANEL))
        .count()
    )
    assert close_mass == panel_pairs
