"""Draft-layer registration invariants.

Round 6 flipped the staged r6/r7 draft layers into the registry
(queries/__init__.all_queries -> draft_layer.register_all), so the oracle
parity / determinism / empty-input sweeps for these queries now run where
every registered query's do: tests/test_parity.py, test_determinism.py,
test_empty_inputs.py. What remains here is the wiring contract."""

from __future__ import annotations

from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.queries.draft_layer import all_drafts

DRAFTS = all_drafts()


def test_drafts_registered_verbatim():
    """Every draft pair is in the registry under the same name, with the
    SAME callable and the SAME oracle string — registration is a flip,
    not a re-implementation."""
    reg = all_queries()
    for name, (fn, oracle) in DRAFTS.items():
        assert name in reg, f"{name} missing from registry"
        assert reg[name].fn is fn, f"{name}: registered fn differs"
        assert reg[name].oracle == oracle, f"{name}: registered oracle differs"


def test_window_reserves_stale_slots():
    """_prioritize caps never-verified queries at 45 of the driver's
    50-query window so >=5 stalest already-verified queries keep getting
    re-checked even during a registration influx."""
    reg = all_queries()
    names = list(reg)[:50]
    from yelpdatawarehouse_spark.queries import _last_green_rounds

    greens = _last_green_rounds()
    assert greens is not None
    hash_green, any_green = greens
    never = [
        n
        for n in names
        if n
        not in (hash_green if reg[n].oracle is not None else any_green)
    ]
    assert len(never) <= 45, f"{len(never)} never-verified entries crowd the window"
