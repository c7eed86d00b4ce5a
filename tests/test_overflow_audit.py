"""Static exposure audit for the two round-8 wrong-answer bug classes
(VERDICT r8 #2) — pinned as invariants so regressions fail CI.

Class (a) — LONG overflow in product sums — is guarded at the PLAN level
in test_plan_hygiene.py (_LONG_PRODUCT_SUM scans every registered query's
executed plan). This file pins the SOURCE-level invariants:

Class (b) — partition-dependent state. ``spark_partition_id()`` is
nondeterministic: under AQE two consumers of the same unpinned frame can
see different partitionings (r8's exact_prefix_sum corruption — a wrong
pareto boundary). The repo-wide rule is that partition-dependent
primitives live ONLY in operators/ranks.py, which eagerly pins its ranged
frame before any consumer reads it.

Class (c) — float-sum-then-round money. Summing double-typed money then
rounding diverges from the integer-exact answer when the float sum drifts
across a .xx5 boundary (r8's pareto fix: per-row exact cents, integer
sum). Direct ``rfix(sum(money), 2)`` on both engines is bounded-error —
error ≤ n·ulp·max ≈ 2e-5 at 1e7-row groups, and BOTH engines sum doubles
so the compare is apples-to-apples — but any DERIVED money path
(cumulative/prefix sums, cancellation-prone differences) must use the
_cents discipline (queries/drafts_r10.py). The sf0.1 tail parity sweeps
(tools/sf01_parity.py) are the behavioral check for the long tail; this
classification is recorded in SCALING.md ("Overflow / partition-state
audit (round 9)").
"""

from __future__ import annotations

import glob
import os
import re

_PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "yelpdatawarehouse_spark",
)


def _source_files():
    return sorted(glob.glob(os.path.join(_PKG, "**", "*.py"), recursive=True))


def _hits(pattern: str) -> dict[str, list[int]]:
    """Match only CODE: everything after a '#' is stripped per line, so a
    comment explaining the hazard (e.g. drafts_r10's pin note) doesn't
    trip the confinement audit."""
    pat = re.compile(pattern)
    out: dict[str, list[int]] = {}
    for path in _source_files():
        rel = os.path.relpath(path, _PKG)
        with open(path, encoding="utf-8") as fh:
            lines = [
                i
                for i, ln in enumerate(fh, 1)
                if pat.search(ln.split("#", 1)[0])
            ]
        if lines:
            out[rel] = lines
    return out


def test_partition_dependent_state_confined_to_ranks():
    """spark_partition_id / monotonically_increasing_id only inside
    operators/ranks.py (whose eager pin makes them single-evaluation)."""
    hits = _hits(r"spark_partition_id|monotonically_increasing_id")
    assert set(hits) <= {os.path.join("operators", "ranks.py")}, (
        f"partition-dependent primitives escaped operators/ranks.py: {hits} "
        "— route through exact_global_rank/exact_prefix_sum (pinned) instead"
    )


def test_no_rdd_index_primitives():
    """zipWithIndex / mapPartitions carry the same partition-order hazard
    and are additionally RDD-side (off codegen); the repo has none."""
    hits = _hits(r"zipWithIndex|\.mapPartitions\(")
    assert not hits, f"RDD index primitives appeared: {hits}"


def test_ranks_module_still_pins():
    """The class-(b) fix itself: ranks.py must keep the eager pin between
    assigning spark_partition_id and exposing the frame to consumers."""
    with open(os.path.join(_PKG, "operators", "ranks.py"), encoding="utf-8") as fh:
        src = fh.read()
    assert "localCheckpoint" in src, (
        "operators/ranks.py lost its eager pin — spark_partition_id is "
        "nondeterministic under AQE and multi-consumer reads corrupt "
        "chained prefix sums (r8 pareto bug)"
    )
