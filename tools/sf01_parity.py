"""Headline oracle-parity sweep at sf0.1 — value correctness AT SCALE.

The per-round gates verify values at sf0.001 (pytest) and sf0.01 (the
driver); this tool runs the same DuckDB-oracle comparison for every bench
HEADLINE query at sf0.1, where scale-only bugs live. Its first run
(round 8) caught two real ones the smaller gates could not see:

* ``w_pandas_zscore_outliers`` — LONG overflow in a cents² sum once a
  group passed ~1e5 rows;
* ``exact_prefix_sum`` — nondeterministic ``spark_partition_id`` read by
  two consumers under AQE, silently corrupting chained prefix sums
  (surfaced as a wrong pareto boundary).

Writes SF01_PARITY.json ({name: "OK" | first-mismatch}) at the repo root.

    python tools/sf01_parity.py                 # full headline (~25 min —
                                                # two graph oracles are
                                                # ~450s each in DuckDB)
    SF01_SKIP=g_hits_two_rounds,o7_pareto_front_orders \
        python tools/sf01_parity.py             # quick pass

Cost note: the slow entries are the ORACLES (unrolled recursive CTEs in
DuckDB at sf0.1), not the engine — engine wall-clock per query matches
the bench record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF01_PARITY_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from tests.parity import compare
    from tools.plan_report import HEADLINE

    import __spark_entry__ as E
    from yelpdatawarehouse_spark.queries import all_queries
    from yelpdatawarehouse_spark.session import get_spark

    skip = {n for n in os.environ.get("SF01_SKIP", "").split(",") if n}
    spark = get_spark(app_name="sf01-parity")
    spark.sparkContext.setLogLevel("ERROR")
    reg, osql = all_queries(), E.oracle_sql()
    results: dict[str, str] = {}
    n_fail = 0
    for i, name in enumerate(HEADLINE, start=1):
        if name in skip:
            results[name] = "SKIPPED"
            continue
        t0 = time.perf_counter()
        try:
            errs = compare(reg[name].fn(spark, SF), osql[name], SF)
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            errs = [f"EXC {str(ex)[:200]}"]
        dt = time.perf_counter() - t0
        results[name] = "OK" if not errs else errs[0][:300]
        n_fail += bool(errs)
        print(f"[{i}/{len(HEADLINE)}] {name}: "
              f"{'OK' if not errs else 'FAIL'} ({dt:.1f}s)", flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SF01_PARITY.json"), "w") as fh:
        json.dump({"sf_dir": SF, "n": len(HEADLINE), "n_fail": n_fail,
                   "results": results}, fh, indent=1)
    print(f"failures: {n_fail} -> SF01_PARITY.json")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
