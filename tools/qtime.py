"""Isolate and time individual registry queries (optimization-round loop).

    python tools/qtime.py q1 q2 ...          # min-of-3 collect timing each
    python tools/qtime.py --n 5 q1           # min-of-5
    python tools/qtime.py --noop q1          # time with the noop sink (guide §1.4)
    python tools/qtime.py --explain q1       # dump .explain("formatted") to stdout

Timing methodology matches bench.py (collect, warm session, min-of-N so the
first pass absorbs codegen); --noop swaps the action for the noop sink to
time computation without result delivery. Jobs are labelled with
setJobDescription for UI readability (guide §1.5).
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i:i + 2]
    noop = "--noop" in args
    explain = "--explain" in args
    args = [a for a in args if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from yelpdatawarehouse_spark.queries import all_queries
    from yelpdatawarehouse_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name="ydw-qtime")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    for name in args:
        qd = registry[name]
        if explain:
            print(f"===== {name} =====")
            qd.fn(spark, sf_dir).explain("formatted")
            continue
        times = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                rows = df.collect()
                del rows
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            gc.collect()
        print(f"{name}: min={min(times)} all={times}")
    spark.stop()


if __name__ == "__main__":
    main()
