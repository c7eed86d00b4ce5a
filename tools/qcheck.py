"""Per-query DuckDB-oracle parity check (optimization-round loop).

    python tools/qcheck.py mm_png_decode_roundtrip mm_wav_decode_features
    python tools/qcheck.py --sf /root/testdata/sf0.1 <names...>

Runs the named registry queries against their oracles at sf0.01 (default)
via the same compare() the CI parity suite and full_parity sweep use, so a
restructured query can be proven result-identical before its pin is
regenerated. Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]

    from tests.parity import compare

    from yelpdatawarehouse_spark.queries import all_queries
    from yelpdatawarehouse_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name="ydw-qcheck")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in args:
        qd = registry[name]
        if qd.oracle is None:
            print(f"{name}: no oracle (rows-only query)")
            continue
        problems = compare(qd.fn(spark, sf), qd.oracle, sf)
        print(f"{name}: {'OK' if not problems else 'FAIL ' + '; '.join(problems)[:400]}")
        if problems:
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
