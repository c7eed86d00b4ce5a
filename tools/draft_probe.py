"""Scale-probe UNREGISTERED draft queries (queries/draft_layer union).

tools/scale_probe.py drives registered queries through the registry; this
companion applies the identical replicated-facts protocol to the draft
layer, which by design stays out of the registry until the next round
(drafts_r6 docstring). Prints one markdown row per draft, ready to append
to SCALING.md's pre-registration table.

    python tools/draft_probe.py                       # all drafts at 5x
    SCALE_FACTOR=10 python tools/draft_probe.py a,b   # named drafts at 10x
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import BASE, FACTOR, build_scaled, time_query  # noqa: E402


def main() -> None:
    from yelpdatawarehouse_spark.queries.draft_layer import all_drafts
    from yelpdatawarehouse_spark.session import get_spark

    DRAFTS = all_drafts()

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else sorted(DRAFTS)
    unknown = [n for n in names if n not in DRAFTS]
    if unknown:
        raise SystemExit(f"not in DRAFTS: {unknown}")

    spark = get_spark(app_name="ydw-draft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="ydw_scaled_")
    try:
        build_scaled(spark, out, base_dir=BASE, factor=FACTOR)
        for name in names:
            fn, _ = DRAFTS[name]
            b = time_query(fn, spark, BASE)
            g = time_query(fn, spark, out)
            print(f"| {name} | {b:.2f}s | {g:.2f}s | x{g / b:.2f} |")
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
