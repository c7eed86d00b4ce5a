"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max-statistics file skipping.

A parquet scan prunes row groups whose column min/max cannot satisfy the
predicate. A LINEAR sort key gives that power to one column only: sorting
by ``l_partkey`` makes partkey ranges skip almost everything, but leaves
``l_suppkey`` uniformly spread through every row group — a suppkey
predicate skips nothing. Interleaving the bits of both keys (the Z-order /
Morton curve — the same layout Delta Lake's OPTIMIZE ZORDER BY and
Databricks liquid clustering build on) bounds each row group to a small
HYPER-RECTANGLE of the key space, so min/max pruning works on EVERY
z-ordered dimension at once. At 100 TB the difference is reading ~1/K of
the files for a 2-D box predicate instead of all of them.

Everything here is plain Spark expressions (shift/and/or inside codegen —
no UDF) plus the standard ``repartitionByRange + sortWithinPartitions``
write idiom, so the layout job is an ordinary distributed sort: one range
exchange on the z-key, no driver state beyond the range sampler's.

Reference parity: the reference tier has no layout story at all (MySQL
secondary indexes stand in, init/mysql_loader.py's CREATE INDEX); this is
the lakehouse-native replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative ints:
    result bit 2b is x's bit b, bit 2b+1 is y's bit b. Pure
    shift/mask/or expression tree — whole-stage-codegen friendly, and
    trivially mirrored in ANSI SQL for oracle checks.

    Callers are responsible for mapping raw values into [0, 2^bits)
    (modulo, bucketing, or rank-scaling); the masking here only guards
    against stray high bits.
    """
    # Column.&/| are LOGICAL in PySpark; bit ops go through bitwiseAND/OR
    mask = F.lit((1 << bits) - 1).cast("long")
    one = F.lit(1).cast("long")
    xl = x.cast("long").bitwiseAND(mask)
    yl = y.cast("long").bitwiseAND(mask)
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, b).bitwiseAND(one), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, b).bitwiseAND(one), 2 * b + 1)
        )
    return z


def interleave_bits_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton interleave as an ANSI SQL expression (DuckDB /
    any engine with <<, >>, &, |) — the oracle twin of
    :func:`interleave_bits`."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x} AS BIGINT) & {mask})"
    ys = f"(CAST({y} AS BIGINT) & {mask})"
    parts = []
    for b in range(bits):
        parts.append(f"((({xs} >> {b}) & 1) << {2 * b})")
        parts.append(f"((({ys} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(parts) + ")"


def _scale_to_bits(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Min/max-scale a numeric column into [0, 2^bits): without this, a
    narrow-domain dimension (say 0-9) never reaches the HIGH interleave
    bits, so curve splits degenerate to a linear sort on the wide
    dimension. Scaling gives every clustered column the full bit width —
    the same reason production z-order implementations bucket each column
    by its own value range (Delta's range-partition ids) before
    interleaving."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    top = float((1 << bits) - 1)
    return F.floor((col.cast("double") - F.lit(lo)) / span * top).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    bits: int = 16,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``(x, y)``: min/max-scale both columns to full bit width (one cheap
    4-scalar aggregate), range-partition on the z-key (each output file
    owns a contiguous curve segment = a bounded rectangle union of key
    space), sort within partitions so row-group min/max stay tight, drop
    the helper column before writing.

    This is the batch layout job a 100 TB table runs once per
    compaction cycle; every later scan with predicates on x AND/OR y
    gets file- and row-group-level skipping from ordinary parquet
    statistics — no index structure to maintain.
    """
    bounds = df.agg(
        F.min(x).alias("xlo"),
        F.max(x).alias("xhi"),
        F.min(y).alias("ylo"),
        F.max(y).alias("yhi"),
    ).collect()[0]
    xs = _scale_to_bits(F.col(x), float(bounds.xlo), float(bounds.xhi), bits)
    ys = _scale_to_bits(F.col(y), float(bounds.ylo), float(bounds.yhi), bits)
    keyed = df.withColumn("__z", interleave_bits(xs, ys, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def rowgroup_extent_profile(path: str, x: str, y: str) -> dict:
    """Measure the pruning power a layout gives each dimension: for every
    parquet row group, the fraction of the column's GLOBAL value range its
    min/max span covers (lower = tighter = more skippable). Returns
    ``{"x_mean_extent": float, "y_mean_extent": float, "n_row_groups": int}``.

    A linear sort on x yields x_mean_extent ≈ 1/n_groups but
    y_mean_extent ≈ 1.0 (no pruning); a Z-order layout pulls BOTH extents
    far below 1 — the property the layout test pins.
    """
    import pyarrow.parquet as pq

    ds = pq.ParquetDataset(path)
    spans: dict[str, list[tuple[float, float]]] = {x: [], y: []}
    for frag in ds.fragments:
        md = frag.metadata
        schema_names = list(md.schema.names)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for col in (x, y):
                idx = schema_names.index(col)
                st = g.column(idx).statistics
                spans[col].append((float(st.min), float(st.max)))
    out = {"n_row_groups": len(spans[x])}
    for col, key in ((x, "x_mean_extent"), (y, "y_mean_extent")):
        lo = min(a for a, _ in spans[col])
        hi = max(b for _, b in spans[col])
        width = (hi - lo) or 1.0
        out[key] = sum((b - a) / width for a, b in spans[col]) / len(spans[col])
    return out
