"""EXACT physical-plan pins for EVERY registered query (r11 brief #3,
extended registry-wide in round 12).

``python tools/plan_pins.py`` audits the AQE-off executed plan of every
registered query at sf0.001 and writes the exact (shuffles, broadcasts,
windows, pushed-filter scans) tuples to
``tests/registry_plan_pins.json``; this module asserts

* completeness — the pin file covers exactly the registry, so a new
  query cannot land unpinned (the registry-wide twin of
  test_plan_shapes.test_shapes_cover_whole_headline_set), and
* exactness — each query's current shape EQUALS its pin. Any plan
  change, improvement or regression, must ship with a regenerated
  (git-reviewable) pin file.

The bench headline ADDITIONALLY keeps hand-curated ceiling/floor pins
with prose rationale (tests/test_plan_shapes.py) — those document
intent; these pin fact. The registry-wide hygiene guard (no cartesian,
no BatchEvalPython — tests/test_plan_hygiene.py) remains the coarse
backstop.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from tools.plan_report import audit  # noqa: E402

from yelpdatawarehouse_spark.queries import all_queries  # noqa: E402

REGISTRY = all_queries()

SF = "/root/testdata/sf0.001"

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "registry_plan_pins.json")) as _fh:
    _PINS: dict[str, list[int]] = json.load(_fh)


def test_pins_cover_whole_registry():
    missing = sorted(set(REGISTRY) - set(_PINS))
    stale = sorted(set(_PINS) - set(REGISTRY))
    assert not missing, (
        f"registered queries without a plan pin (run tools/plan_pins.py): {missing}"
    )
    assert not stale, f"pins for unregistered queries: {stale}"


# Deterministic rotating quarter per round (tests/rotation.py) so the
# driver's verify window can finish the suite — the plan build (fn() +
# executedPlan per query, including eager pin jobs) dominates, so the
# sample is applied INSIDE the fixture, not just to the parametrization.
# YDW_FULL_TESTS=1 builds and checks all; tools/plan_pins.py --check
# still sweeps the full registry out-of-band each round.
from tests.rotation import sample  # noqa: E402

_WINDOW = set(sample(_PINS))
# names the non-parametrized tests below read directly — always built
_ALWAYS_PINNED = {"t19_acf_daily_orders"}


@pytest.fixture(scope="module")
def static_plans(spark):
    """Executed-plan strings with AQE off (same rationale as
    test_plan_shapes.static_plans: AQE defers stage insertion and would
    hide the static exchange structure being pinned)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield {
            name: REGISTRY[name].fn(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            for name in sorted(_WINDOW | _ALWAYS_PINNED)
            if name in REGISTRY
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


@pytest.mark.parametrize("name", sorted(_WINDOW))
def test_registry_plan_shape(static_plans, name):
    if name not in REGISTRY:
        pytest.skip("stale pin — covered by test_pins_cover_whole_registry")
    a = audit(static_plans[name])
    got = [a["shuffles"], a["broadcasts"], a["windows"], a["pushed"]]
    assert got == _PINS[name], (
        f"{name}: plan shape {got} != pinned {_PINS[name]} "
        "(shuffles, broadcasts, windows, pushed) — if the change is "
        "intentional, regenerate with `python tools/plan_pins.py` and "
        "review the diff"
    )


def test_acf_is_single_pipeline(static_plans):
    """The stack() unpivot must keep ACF one scan→agg→window pipeline —
    the per-lag-union regression re-planned it seven times (measured
    14 scans / 21 exchanges before the rewrite)."""
    plan = static_plans["t19_acf_daily_orders"]
    assert plan.count("FileScan") <= 2
    assert audit(plan)["windows"] == 1
