"""Flat-plan iteration: the eager-localCheckpoint discipline for
DataFrame loops, in one place.

A DataFrame loop that rebinds ``state = step(state)`` nests the logical
plan geometrically: every round re-plans the ENTIRE upstream subtree for
each of its consumers, so by round R an expression consumed k times per
round re-plans the source scan k^R times. Measured here before the fix:
g_kcore_parts reached ~500 FileScans (13.3s → 2.7s at sf0.1 once
pinned); g_adamic_adar_nations re-planned its 4-way fact join 64 times.

The fix is to PIN each round's state with ``localCheckpoint(eager=True)``
— materialize the (node-scale) frame to executor-local storage and cut
the lineage, so the next round plans against a flat RDD scan. This
module centralizes the idiom plus the plan-hygiene assertion that makes
a regression loud: a pinned frame's plan must contain NO FileScan (it is
an ExistingRDD scan by construction — if a FileScan appears, someone
removed the checkpoint and the geometric re-plan is back).

Used by: g_kcore_parts, g_adamic_adar_nations (queries/drafts_r7.py),
g_pagerank_nations (queries/graphq.py), min_label_components
(operators/graph.py). localCheckpoint (executor-local) rather than
checkpoint (HDFS) is deliberate: loop state here is node-scale and
recomputable from the round's inputs; at 100 TB the pin costs one
node-sized materialization per round, vs. re-planning (and re-running)
the fact-scale subtree k^R times without it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def pin(df: DataFrame, label: str = "state") -> DataFrame:
    """Eagerly localCheckpoint ``df`` and assert the result plans flat
    (no FileScan — the lineage cut actually happened)."""
    pinned = df.localCheckpoint(eager=True)
    plan = pinned._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan, (
        f"pin({label}): checkpointed frame still plans a FileScan — "
        "lineage was not cut"
    )
    return pinned


def checkpointed_loop(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_rounds: int,
    stop: Callable[[DataFrame, DataFrame], bool] | None = None,
) -> DataFrame:
    """Iterate ``state = pin(step(state, round_idx))`` for ``max_rounds``
    rounds; ``stop(new_state, old_state)`` (driver-side, may run a small
    action such as a convergence count) ends the loop early when true.

    The input ``state`` is NOT pinned here — pin it at construction if it
    is consumed more than once per round (every current caller does).
    """
    for i in range(max_rounds):
        new = pin(step(state, i), label=f"round_{i}")
        if stop is not None and stop(new, state):
            return new
        state = new
    return state
