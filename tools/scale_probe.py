"""Empirical scale-up probe: replicate the sf0.1 tables FACTOR-fold (with
key-shifting that preserves join structure) into a temp directory, then time
a set of heavy queries at both scales and report the time ratio per query.

A plan whose cost is dominated by per-key work scales ~linearly (ratio ≈
FACTOR, usually less on a fixed 32-core box as constant overheads amortize);
a plan hiding quadratic behavior or a serialization point shows a ratio ≫
FACTOR. This is the measured counterpart to PLANS.md's static shuffle audit.

    python tools/scale_probe.py            # writes SCALING.md at the repo root
    SCALE_FACTOR=10 python tools/scale_probe.py

Dimension tables (region, nation) are shared, matching how a real corpus
grows: facts multiply, reference data does not. Text/embedding payloads are
replicated verbatim, so dedup-family queries see FACTOR-fold duplication —
harder than organic growth, which is the right direction for a stress probe.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
FACTOR = int(os.environ.get("SCALE_FACTOR", "5"))
OFF = 10_000_000  # key-shift stride per replica

# table -> columns to shift per replica (preserves every FK relationship;
# nation/region keys are left alone so dims stay shared)
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

PROBE_QUERIES = [
    "dedup_sorted_neighborhood",
    "j5_copurchase_pairs",
    "j6_two_hop_supplier_pairs",
    "a8_distinct_parts_per_customer",
    "a14_customer_summary_rebuild",
    "w3_running_avg_per_customer",
    "t7_hourly_tumbling_window",
    "t8_sessionization",
    "dedup_minhash_lsh_candidates",
    "dedup_span_first_occurrence",
    "text_tfidf_top_terms",
    "g_triangle_support",
    "j1_multiway_revenue",
    "text_entropy_by_source",
    "j17_small_quantity_revenue",
]


def build_scaled(spark, out_dir: str, base_dir: str = BASE,
                 factor: int = FACTOR) -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.sources.tables import TABLES, table

    for name in TABLES:
        df = table(spark, base_dir, name)
        if name in SHIFT:
            replicas = []
            for i in range(factor):
                r = df
                for col in SHIFT[name]:
                    r = r.withColumn(col, F.col(col) + F.lit(i * OFF))
                replicas.append(r)
            df = reduce(lambda a, b: a.unionByName(b), replicas)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def time_query(fn, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def run_probe(spark, names, base_dir: str = BASE, factor: int = FACTOR,
              reps: int = 2):
    """Build a ``factor``-scaled copy of ``base_dir`` in a temp dir, time
    each query at both scales, and return ``(rows, build_seconds)`` where
    rows are ``(name, base_s, big_s, ratio)``. Importable core shared by
    the CLI below and the guarded scale-regression test
    (tests/test_scale_regression.py)."""
    from yelpdatawarehouse_spark.queries import all_queries

    reg = all_queries()
    out_dir = tempfile.mkdtemp(prefix="ydw_scaled_")
    try:
        t0 = time.perf_counter()
        build_scaled(spark, out_dir, base_dir=base_dir, factor=factor)
        build_s = time.perf_counter() - t0
        rows = []
        for name in names:
            base_s = time_query(reg[name].fn, spark, base_dir, reps=reps)
            big_s = time_query(reg[name].fn, spark, out_dir, reps=reps)
            rows.append((name, base_s, big_s, big_s / base_s if base_s else 0.0))
            print(f"{name}: {base_s:.2f}s -> {big_s:.2f}s  (x{big_s/base_s:.2f})")
        return rows, build_s
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> None:
    from yelpdatawarehouse_spark.session import get_spark

    names = [n for n in os.environ.get("SCALE_QUERIES", "").split(",") if n]
    focused = bool(names)
    spark = get_spark(app_name="ydw-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rows, build_s = run_probe(spark, names or PROBE_QUERIES)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        md = os.path.join(root, "SCALING.md")
        if focused:
            # targeted re-probe (e.g. SCALE_FACTOR=10 SCALE_QUERIES=...):
            # append a section, preserving the full-table baseline above
            lines = [
                "",
                f"## Focused probe at {FACTOR}x",
                "",
                f"| query | sf0.1 | {FACTOR}x | time ratio (data x{FACTOR}) |",
                "|---|---|---|---|",
            ]
            for name, a, b, r in rows:
                lines.append(f"| {name} | {a:.2f}s | {b:.2f}s | x{r:.2f} |")
            lines.append("")
            with open(md, "a") as f:
                f.write("\n".join(lines))
            print(f"appended {len(rows)}-query {FACTOR}x section to SCALING.md")
            return

        lines = [
            "# SCALING — measured scale-up probe (auto-generated)",
            "",
            f"`tools/scale_probe.py`: sf0.1 facts replicated **{FACTOR}x** with",
            f"join-preserving key shifts (stride {OFF}); dims shared; payloads",
            "replicated verbatim (dedup queries therefore see the full",
            f"{FACTOR}-fold duplication — harder than organic growth).",
            f"Data build: {build_s:.0f}s. Timings are min-of-2 on local[32].",
            "",
            f"| query | sf0.1 | {FACTOR}x | time ratio (data x{FACTOR}) |",
            "|---|---|---|---|",
        ]
        for name, a, b, r in rows:
            lines.append(f"| {name} | {a:.2f}s | {b:.2f}s | x{r:.2f} |")
        lines += [
            "",
            f"Reading: ratio ≈ x{FACTOR} is linear scaling; below it, fixed",
            "overheads amortize; materially above it flags a plan whose cost",
            "grows faster than its input — none should.",
            "",
        ]
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "SCALING.md"), "w") as f:
            f.write("\n".join(lines))
        print(f"wrote SCALING.md ({len(rows)} queries)")
    finally:
        # run_probe cleans up its own temp dir
        spark.stop()


if __name__ == "__main__":
    main()
