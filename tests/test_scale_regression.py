"""Guarded scale-regression probe: a superlinear plan fails CI, not a judge.

SCALING.md records the full measured scale-up sweep (tools/scale_probe.py at
5x/10x); this test runs the same importable core on a small factor and query
subset every CI pass, asserting time grows no faster than data (with a wide
host-noise margin). The subset is the queries whose 5x ratios sat closest to
linear — the ones a plan regression (lost broadcast, pair blowup leaving the
salted branch, window spilling) would push superlinear first.

Margin rationale: on this host identical plans show up to ~2.5x wall-clock
noise even min-of-2 (BENCH protocol note), so the gate is factor * 2.5. At
factor 3 a genuinely quadratic regression lands around ratio 9 and still
trips the 7.5 gate; a linear plan has to get 2.5x-unlucky to flake.
"""

from __future__ import annotations

import pytest

FACTOR = 3
MARGIN = 2.5
# closest-to-linear in SCALING.md's 5x sweep, plus the operator whose
# blocking join would go quadratic first if the window contract broke
PROBE = [
    "j6_two_hop_supplier_pairs",
    "w3_running_avg_per_customer",
    "dedup_sorted_neighborhood",
]


def test_probe_subset_is_headline_and_probed():
    """The canary queries must stay in both the bench headline set (so their
    timing history exists) and the full SCALING.md sweep (so a trip here can
    be cross-read against the measured curve)."""
    from tools.plan_report import HEADLINE
    from tools.scale_probe import PROBE_QUERIES

    assert set(PROBE) <= set(HEADLINE)
    assert set(PROBE) <= set(PROBE_QUERIES)


@pytest.mark.slow
def test_time_ratio_at_or_below_data_factor(spark):
    from tools.scale_probe import run_probe

    rows, _build_s = run_probe(
        spark, PROBE, base_dir="/root/testdata/sf0.1", factor=FACTOR, reps=2
    )
    bad = [
        (name, base_s, big_s, ratio)
        for name, base_s, big_s, ratio in rows
        if ratio > FACTOR * MARGIN
    ]
    assert not bad, (
        f"superlinear scale-up at {FACTOR}x data (gate x{FACTOR * MARGIN}): "
        + "; ".join(f"{n}: {a:.2f}s -> {b:.2f}s (x{r:.2f})" for n, a, b, r in bad)
    )
