"""Z-order (Morton) clustered parquet writes for multi-column data skipping.

Partitioning prunes on ONE directory hierarchy and range-sorting clusters
ONE column; queries that filter two independent columns (user AND time,
lat AND lon) skip nothing on the second. Interleaving the bits of both
rank-normalized keys into a Morton code and range-partitioning + sorting
on it makes every file's min/max footer stats narrow in BOTH dimensions —
the same layout Delta's OPTIMIZE ZORDER BY builds — so the vectorized
parquet reader's row-group/file skipping engages for either predicate.

Pipeline (all distributed): per-column rank normalization via ntile over a
window (bounded to 2^bits buckets; ranks — not raw values — so skew in
either column cannot collapse the curve), bit interleave as integer
expressions, repartitionByRange + sortWithinPartitions on the code, plain
parquet write. The proof lives in the footer statistics: tests read
per-file min/max for both columns (pyarrow metadata) and assert each
file's coverage fraction shrinks vs an unclustered write — the physical
property data skipping depends on, checked without needing a specific
Spark pruning code path.

At 100 TB the ntile window is the only global stage; swap it for
approx-quantile range boundaries (operators/quantiles.py) when even one
sort pass over the key column is too much — same curve, sketch-derived
buckets.

Reference analog: none (single-node MySQL relies on B-trees);
beyond-reference lakehouse-maintenance surface, companion to
write_partitioned (hive pruning) and write_bucketed (co-located joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def morton_code(a_rank: Column, b_rank: Column, bits: int) -> Column:
    """Interleave two ``bits``-wide ranks into a 2·bits Morton code —
    pure integer expressions, codegen-friendly."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a_rank, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b_rank, i).bitwiseAND(F.lit(1))
        code = (
            code
            .bitwiseOR(F.shiftleft(abit.cast("long"), 2 * i))
            .bitwiseOR(F.shiftleft(bbit.cast("long"), 2 * i + 1))
        )
    return code


def morton_code_sql(x: str, y: str, bits: int) -> str:
    """The identical Morton interleave as an ANSI SQL expression (DuckDB /
    any engine with <<, >>, &, |) — the oracle twin of :func:`morton_code`,
    letting a registry query hash-verify the bit arithmetic the write path
    clusters on. Reads only bits 0..bits-1 of each input, exactly like the
    Column version."""
    parts = []
    for b in range(bits):
        parts.append(f"(((CAST({x} AS BIGINT) >> {b}) & 1) << {2 * b})")
        parts.append(f"(((CAST({y} AS BIGINT) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(parts) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of (col_a, col_b).

    Ranks come from ntile(2^bits) windows so arbitrary value skew in
    either column still fills the curve uniformly; the final layout is
    ``n_files`` range-partitions of the Morton code, each internally
    sorted, giving tight per-file min/max footers on BOTH columns.
    """
    buckets = 1 << bits
    wa = Window.orderBy(F.col(col_a))
    wb = Window.orderBy(F.col(col_b))
    coded = df.withColumn(
        "__z",
        morton_code(
            F.ntile(buckets).over(wa) - 1,
            F.ntile(buckets).over(wb) - 1,
            bits,
        ),
    )
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_coverage_stats(path: str, col_a: str, col_b: str) -> list[dict]:
    """Per-file footer min/max for both columns plus each file's coverage
    fraction of the global range — the data-skipping figure of merit
    (mean coverage ≈ 1/n_files on a well-clustered layout, ≈ 1 on an
    unclustered one). Reads parquet metadata only, no data pages."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    stats = []
    for f in files:
        md = pq.read_metadata(f)
        schema_names = md.schema.to_arrow_schema().names
        ia, ib = schema_names.index(col_a), schema_names.index(col_b)
        mins: dict[int, float] = {}
        maxs: dict[int, float] = {}
        for rg in range(md.num_row_groups):
            for idx in (ia, ib):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                mins[idx] = min(mins.get(idx, st.min), st.min)
                maxs[idx] = max(maxs.get(idx, st.max), st.max)
        if ia in mins and ib in mins:
            stats.append(
                {
                    "file": os.path.basename(f),
                    "a_min": mins[ia],
                    "a_max": maxs[ia],
                    "b_min": mins[ib],
                    "b_max": maxs[ib],
                }
            )
    if not stats:
        return stats
    ga = (min(s["a_min"] for s in stats), max(s["a_max"] for s in stats))
    gb = (min(s["b_min"] for s in stats), max(s["b_max"] for s in stats))
    for s in stats:
        s["a_cover"] = (
            (s["a_max"] - s["a_min"]) / (ga[1] - ga[0]) if ga[1] > ga[0] else 1.0
        )
        s["b_cover"] = (
            (s["b_max"] - s["b_min"]) / (gb[1] - gb[0]) if gb[1] > gb[0] else 1.0
        )
    return stats


def files_matching(path: str, col_a: str, col_b: str,
                   a_val: float | None = None,
                   b_val: float | None = None) -> int:
    """How many files a point predicate would have to read, by footer
    min/max — the skipping a reader achieves on this layout."""
    n = 0
    for s in file_coverage_stats(path, col_a, col_b):
        if a_val is not None and not (s["a_min"] <= a_val <= s["a_max"]):
            continue
        if b_val is not None and not (s["b_min"] <= b_val <= s["b_max"]):
            continue
        n += 1
    return n


def write_unclustered(df: DataFrame, path: str, n_files: int = 16) -> None:
    """Round-robin baseline layout for comparisons."""
    df.repartition(n_files).write.mode("overwrite").parquet(path)


def zorder_report(spark: SparkSession, path: str, col_a: str, col_b: str) -> DataFrame:
    """Coverage stats as a DataFrame (diagnostic surface)."""
    rows = file_coverage_stats(path, col_a, col_b)
    if not rows:
        return spark.createDataFrame(
            [], "file string, a_cover double, b_cover double"
        )
    return spark.createDataFrame(
        [(r["file"], float(r["a_cover"]), float(r["b_cover"])) for r in rows],
        "file string, a_cover double, b_cover double",
    )
