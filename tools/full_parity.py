"""Full-registry (and draft-layer) DuckDB-oracle parity sweep at sf0.01 —
a local dress rehearsal of the external driver's correctness gate.

The CI suite (tests/test_parity.py) runs the same compare at sf0.001 for
speed; the driver runs sf0.01, where data-dependent edges (ties at a
top-k cutoff, groups that exist only at the larger scale, rounding
boundaries) can differ. This sweep runs every oracled query at the
driver's own scale and prints one line per query plus a failure summary.

    python tools/full_parity.py              # whole registry (~4 min)
    python tools/full_parity.py registry     # same (alias)
    python tools/full_parity.py drafts       # draft-layer names only

Since round 6 the draft layer registers into the registry, so "all" no
longer double-runs drafts; "drafts" sweeps just the names that entered
through the draft layer (useful while staging a new round's module).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from pyspark.sql import SparkSession

    from tests.parity import compare

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    targets: list[tuple[str, object, object]] = []
    if which in ("all", "registry"):
        from yelpdatawarehouse_spark.queries import all_queries

        for name, qd in sorted(all_queries().items()):
            if qd.oracle is not None:
                targets.append((name, qd.fn, qd.oracle))
    elif which == "drafts":
        from yelpdatawarehouse_spark.queries.draft_layer import all_drafts

        for name, (fn, oracle) in sorted(all_drafts().items()):
            targets.append((f"draft:{name}", fn, oracle))

    t0 = time.time()
    failures = []
    timings: dict[str, float] = {}
    for name, fn, oracle in targets:
        tq = time.time()
        try:
            problems = compare(fn(spark, SF), oracle, SF)
            status = "OK" if not problems else "FAIL " + "; ".join(problems)[:200]
        except Exception as e:  # noqa: BLE001 — sweep must report, not stop
            status = "ERR " + repr(e)[:200]
        timings[name] = round(time.time() - tq, 3)
        if status != "OK":
            failures.append(name)
        print(f"{name}: {status}", flush=True)
    print(f"DONE {len(targets)} queries in {time.time() - t0:.1f}s; "
          f"failures: {failures}")
    # Whole-registry timing sidecar: the bench headline times 80 queries
    # of record at sf0.1; this records EVERY query's single-pass sf0.01
    # wall-clock (engine + oracle + compare) so a regression in the long
    # tail is visible round-over-round. Single-pass on a shared host =
    # noisy per query; the signal is in large same-direction moves and in
    # the sorted tail, not in +-30% wiggles.
    import json

    sidecar = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REGISTRY_TIMES.json",
    )
    with open(sidecar, "w") as fh:
        json.dump(
            {
                "sf_dir": SF,
                "n_queries": len(timings),
                "total_sec": round(time.time() - t0, 1),
                "includes": "engine+oracle+hash-compare per query, 1 pass",
                "times": timings,
            },
            fh,
            indent=0,
            sort_keys=True,
        )
    print(f"wrote {sidecar}")
    spark.stop()
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
