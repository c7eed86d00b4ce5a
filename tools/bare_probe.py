"""Bare-session hash probe — the external driver's own shape (VERDICT r9 #2b).

The driver runs queries on a BARE SparkSession: ``master("local[8]")``,
default confs, any JVM timezone — NOT the engine's tuned session
(``session.get_spark`` pins shuffle partitions, AQE, etc.). That
difference in executor count / partitioning is exactly what exposed the
round-9 ANOVA bug: parity passed on the engine session at three scale
factors while the driver's local[8] hash diverged (summation-order noise
in an absolute-rounded 1e15 float).

This tool replays that shape as a standalone process (it must own the JVM
— an engine-session test run cannot rebuild a bare session in-process):

    python tools/bare_probe.py name1,name2            # probe at sf0.01
    python tools/bare_probe.py name1 --sf-dir DIR
    python tools/bare_probe.py --seed-mismatch        # prove the detector fires

Prints one ``PASS name`` / ``FAIL name`` line per query; exits non-zero on
any FAIL. tests/test_bare_probe.py wires this into CI for every
registration that has no driver evidence yet, so a new query meets the
driver's session shape BEFORE the driver does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.01"


def build_bare_session():
    """The driver's session: bare local[8], default confs, and a hostile
    (non-UTC) JVM timezone so tz-pinning regressions surface too."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("ydw-bare-probe")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("names", nargs="?", default="",
                    help="comma-separated registry query names")
    ap.add_argument("--sf-dir", default=DEFAULT_SF)
    ap.add_argument("--seed-mismatch", action="store_true")
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
    seed = ns.seed_mismatch
    if not seed and not ns.names:
        ap.error("no query names given (silent PASS would verify nothing)")

    from tests.parity import compare
    from yelpdatawarehouse_spark.queries import all_queries

    reg = all_queries()
    spark = build_bare_session()
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    if seed:
        # Detector self-test: a correct query against a WRONG oracle must
        # FAIL — proves the hash-compare path catches divergence end-to-end.
        qd = reg["a1_global_counts"]
        problems = compare(
            qd.fn(spark, sf_dir),
            "SELECT CAST(count(*) + 1 AS BIGINT) AS order_cnt, "
            "CAST(count(DISTINCT o_custkey) + 1 AS BIGINT) AS customer_cnt "
            "FROM orders",
            sf_dir,
        )
        print(("FAIL" if problems else "PASS"), "seed-mismatch-detected"
              if problems else "seed-mismatch-MISSED")
        spark.stop()
        return 0 if problems else 1

    names = [n for n in ns.names.split(",") if n]
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")
    for name in names:
        qd = reg[name]
        if qd.oracle is None:
            print(f"SKIP {name} (rows-only: no oracle)")
            continue
        problems = compare(qd.fn(spark, sf_dir), qd.oracle, sf_dir)
        if problems:
            failed.append(name)
            print(f"FAIL {name}")
            for p in problems[:3]:
                print("     " + p.replace("\n", "\n     "))
        else:
            print(f"PASS {name}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
