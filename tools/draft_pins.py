"""Autogenerate EXACT plan-shape pins for every staged draft query
(judge r11 brief #3).

The headline bench queries have hand-curated ceiling/floor pins
(tests/test_plan_shapes._SHAPES) with a completeness assertion; the draft
layer had a hand-grown partial dict (~82 of ~128 names) with no
completeness check, so exact-shape drift on the unpinned names was
invisible to CI. This tool closes that: it audits the AQE-off executed
plan of EVERY draft at sf0.001 and writes the exact
(shuffles, broadcasts, windows, pushed-filter scans) tuples to
``tests/draft_plan_pins.json``. tests/test_draft_plan_shapes.py then
asserts (a) the pin file covers the whole draft registry and (b) each
draft's current shape EQUALS its pin — any plan change, better or worse,
must come with a regenerated (git-reviewable) pin file:

    python tools/draft_pins.py          # regenerate after intentional changes
    python tools/draft_pins.py --check  # exit 1 on any drift (no file write)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "draft_plan_pins.json")


def compute_pins() -> dict[str, list[int]]:
    from tools.plan_report import audit

    from yelpdatawarehouse_spark.queries.draft_layer import all_drafts
    from yelpdatawarehouse_spark.session import get_spark

    spark = get_spark(app_name="draft-pins", cpus=8,
                      **{"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    pins: dict[str, list[int]] = {}
    drafts = all_drafts()
    for i, (name, (fn, _oracle)) in enumerate(sorted(drafts.items()), 1):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        pins[name] = [a["shuffles"], a["broadcasts"], a["windows"], a["pushed"]]
        print(f"[{i}/{len(drafts)}] {name}: {pins[name]}", flush=True)
    spark.stop()
    return pins


def main() -> int:
    pins = compute_pins()
    if "--check" in sys.argv:
        with open(OUT) as fh:
            prev = json.load(fh)
        drift = {n: (prev.get(n), pins[n]) for n in pins if prev.get(n) != pins[n]}
        gone = sorted(set(prev) - set(pins))
        if drift or gone:
            print(f"DRIFT: {len(drift)} changed {dict(list(drift.items())[:5])}, "
                  f"{len(gone)} unregistered {gone[:5]}")
            return 1
        print(f"OK: {len(pins)} pins unchanged")
        return 0
    with open(OUT, "w") as fh:
        json.dump(dict(sorted(pins.items())), fh, indent=1)
    print(f"wrote {len(pins)} pins -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
