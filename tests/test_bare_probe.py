"""CI wiring for the bare-session local[8] hash probe (VERDICT r9 #2b).

Every registered query that has NO driver hash evidence yet (the
never-verified set, computed from the CORRECTNESS_r*.json files the same
way queries/__init__._prioritize orders the registry) must pass the
driver-shaped probe — bare session, local[8], hostile timezone — BEFORE
the driver sees it. This is the guard that would have caught the round-9
ANOVA bug pre-driver.

The probe needs its own JVM (the suite's engine session pins different
confs and executor counts), so it runs tools/bare_probe.py as a
subprocess.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _never_verified() -> list[str]:
    from yelpdatawarehouse_spark.queries import _last_green_rounds, all_queries

    reg = all_queries()
    greens = _last_green_rounds()
    if greens is None:
        return []
    hash_green, any_green = greens
    return [
        n for n in reg
        if n not in (hash_green if reg[n].oracle is not None else any_green)
    ]


def _run_probe(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bare_probe.py"), *argv],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )


@pytest.mark.slow
def test_new_registrations_pass_bare_session_probe():
    names = _never_verified()
    if not names:
        pytest.skip("no never-driver-verified registrations to probe")
    proc = _run_probe(",".join(sorted(names)))
    assert proc.returncode == 0, (
        "bare-session local[8] probe FAILED — this is the driver's own "
        f"session shape, fix before registration ships:\n{proc.stdout}\n"
        f"{proc.stderr[-2000:]}"
    )


@pytest.mark.slow
def test_seeded_mismatch_is_detected():
    """The probe must actually fire on divergence: a correct query against
    a deliberately wrong oracle exits non-zero."""
    proc = _run_probe("--seed-mismatch")
    assert proc.returncode == 0 and "seed-mismatch-detected" in proc.stdout, (
        f"probe failed to flag a seeded oracle mismatch:\n{proc.stdout}\n"
        f"{proc.stderr[-2000:]}"
    )
