"""Print the external verifier's 50-query window composition.

The driver hash-checks only the FIRST 50 registry entries each round;
queries/__init__._prioritize() orders never-driver-verified queries first
(registry order), then verified ones stalest-evidence-first, derived from
the CORRECTNESS_r*.json files. Run this before adding queries to see how
much window headroom remains:

    python tools/verify_window.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> None:
    from yelpdatawarehouse_spark.queries import _last_green_rounds, all_queries

    reg = all_queries()
    greens = _last_green_rounds()
    if greens is None:
        last = {}
    else:
        hash_green, any_green = greens
        # strongest-evidence view, mirroring _prioritize: oracled queries
        # count only hash-green rounds, oracle-less ones their rows-only
        last = {
            n: (hash_green if reg[n].oracle is not None else any_green)[n]
            for n in reg
            if n in (hash_green if reg[n].oracle is not None else any_green)
        }
    names = list(reg)
    never = [n for n in names if n not in last]
    in_window_new = sum(1 for n in names[:WINDOW] if n not in last)
    print(f"registry: {len(names)} queries; never driver-verified: {len(never)}")
    print(
        f"window composition: {in_window_new} new + "
        f"{WINDOW - in_window_new} stale re-verifications "
        "(_prioritize reserves >=5 stale slots per round)"
    )
    print("\n-- window (first 50) --")
    for i, n in enumerate(names[:WINDOW]):
        tag = "NEW" if n not in last else f"r{last[n]}"
        print(f"{i:3d} [{tag:>3}] {n}")
    outside = [n for n in never if n not in names[:WINDOW]]
    if outside:
        rounds = (len(outside) + (WINDOW - 5) - 1) // (WINDOW - 5)
        print(
            f"\n{len(outside)} never-verified queries queue BEHIND this "
            f"window (registry-ordered; ~{rounds} more round(s) to drain):"
        )
        for n in outside:
            print(f"  {n}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped through head
        pass
