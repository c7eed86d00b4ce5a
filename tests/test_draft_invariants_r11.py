"""Model-twin and structural invariants for the round-11 drafts
(queries/drafts_r11.py), beyond the oracle-parity/determinism/empty-input
sweeps every registered query already gets."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries.drafts_r11 import (
    CONT_EVAL_MOD,
    RERANK_K,
    ann_two_stage_rerank,
    dedup_containment_est_eval,
    t34_theil_sen_trend,
    w10_cume_dist_spend,
)


def test_w10_window_normalizations_structural(spark):
    rows = w10_cume_dist_spend(spark, SF_TEST_DIR).collect()
    assert rows
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    for seg, rs in by_seg.items():
        cds = [r.spend_cume_dist for r in rs]
        prs = [r.spend_pct_rank for r in rs]
        assert max(cds) == 1.0, f"{seg}: cume_dist must top out at 1"
        assert min(prs) == 0.0, f"{seg}: percent_rank must start at 0"
        assert all(0 <= v <= 1 for v in cds + prs)
        # tie-awareness + monotonicity: sort by spend, both stats must be
        # non-decreasing and EQUAL on equal spends
        rs.sort(key=lambda r: (r.spend, r.c_custkey))
        for a, b in zip(rs, rs[1:]):
            assert a.spend_cume_dist <= b.spend_cume_dist
            assert a.spend_pct_rank <= b.spend_pct_rank
            if a.spend == b.spend:
                assert a.spend_cume_dist == b.spend_cume_dist
                assert a.spend_pct_rank == b.spend_pct_rank


def test_containment_eval_count_consistency(spark):
    row = dedup_containment_est_eval(spark, SF_TEST_DIR).collect()[0]
    assert row.n_hits <= min(row.n_truth, row.n_est_pos)
    assert row.n_truth > 0, "panel should contain true containment pairs"
    if row.n_est_pos:
        assert row.est_precision == pytest.approx(
            math.floor(row.n_hits / row.n_est_pos * 10000 + 0.5) / 10000
        )
    if row.n_truth:
        assert row.est_recall == pytest.approx(
            math.floor(row.n_hits / row.n_truth * 10000 + 0.5) / 10000
        )
    # the ~1/mod sample keeps enough fingerprints on this corpus that the
    # estimator is USEFUL (documented empirical pin, like the SNM recall
    # eval's) — a silent sampling bug (e.g. mod mismatch vs the oracle)
    # craters recall long before it breaks parity
    assert CONT_EVAL_MOD == 4
    assert row.est_recall >= 0.5


def test_theil_sen_matches_numpy_twin(spark):
    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.sources.tables import table

    out = t34_theil_sen_trend(spark, SF_TEST_DIR).collect()[0]
    daily = (
        table(spark, SF_TEST_DIR, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("r_c")
        )
        .collect()
    )
    days = sorted((r.d.toordinal(), r.r_c) for r in daily)
    xs = np.array([d for d, _ in days], dtype=np.float64)
    rs = np.array([r for _, r in days], dtype=np.float64) / 100
    n = len(xs)
    assert out.n_days == n
    assert out.n_pairs == n * (n - 1) // 2
    i, j = np.triu_indices(n, k=1)
    slopes = (rs[j] - rs[i]) / (xs[j] - xs[i])
    want = float(np.median(slopes))
    assert out.theil_sen_slope == pytest.approx(want, abs=2e-6)
    # robustness property the estimator exists for: it sits inside the
    # pairwise-slope range (trivially) and is finite where OLS is too
    assert math.isfinite(out.ols_slope)


def test_two_stage_rerank_agreement_flags_match_numpy(spark):
    from yelpdatawarehouse_spark.sources.tables import table

    out = ann_two_stage_rerank(spark, SF_TEST_DIR).collect()
    assert out
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in table(spark, SF_TEST_DIR, "embeddings").collect()
    }
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    norms = np.linalg.norm(mat, axis=1)
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert sorted(r.rank for r in rs) == list(range(1, RERANK_K + 1))
        # per-query cos_sim non-increasing with rank
        rs.sort(key=lambda r: r.rank)
        for a, b in zip(rs, rs[1:]):
            assert a.cos_sim >= b.cos_sim
        # exact top-k via numpy (6-digit canonicalized ordering, id tiebreak)
        qv = emb[qid]
        cos = (mat @ qv) / (norms * np.linalg.norm(qv))
        scored = [
            (math.floor(c * 1e6 + 0.5) / 1e6, i)
            for c, i in zip(cos, ids)
            if i != qid
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        exact_topk = {i for _, i in scored[:RERANK_K]}
        for r in rs:
            assert r.in_exact_topk == (r.neighbor_id in exact_topk), (
                f"query {qid} neighbor {r.neighbor_id}: flag disagrees with "
                "the numpy exact top-k"
            )
