"""Z-order layout (operators/layout.py): Morton-key correctness against a
Python reference, and the measured pruning property — a z-ordered write
bounds EVERY clustered dimension's row-group extents, where a linear sort
only bounds the leading one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.layout import (
    interleave_bits,
    interleave_bits_sql,
    rowgroup_extent_profile,
    write_zordered,
)


def _morton_py(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_interleave_matches_python_and_sql(spark):
    import duckdb

    rows = [(x, y) for x in (0, 1, 5, 255, 4095) for y in (0, 2, 7, 1023, 4095)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", interleave_bits(F.col("x"), F.col("y"), 12)).collect()
    }
    sql = interleave_bits_sql("x", "y", 12)
    con = duckdb.connect()
    for x, y in rows:
        want = _morton_py(x, y, 12)
        assert got[(x, y)] == want
        (dz,) = con.execute(f"SELECT {sql} FROM (SELECT {x} AS x, {y} AS y)").fetchone()
        assert dz == want


def test_interleave_is_monotone_in_locality(spark):
    """Points close in (x, y) must be close on the curve within a quad:
    the defining recursive property (each quadrant occupies a contiguous
    z range)."""
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int"
    )
    rows = df.withColumn("z", interleave_bits(F.col("x"), F.col("y"), 4)).collect()
    z = {(r.x, r.y): r.z for r in rows}
    # all 256 keys distinct and within [0, 256)
    assert sorted(z.values()) == list(range(256))
    # quadrant contiguity: the low-left 8x8 quad occupies exactly [0, 64)
    quad = sorted(v for (x, y), v in z.items() if x < 8 and y < 8)
    assert quad == list(range(64))


@pytest.mark.parametrize("layout", ["linear", "zorder"])
def test_zorder_bounds_both_dimensions(spark, tmp_path, layout):
    """The measured pruning claim: a linear partkey sort leaves suppkey
    row-group extents ~full-range (no pruning), while the z-order layout
    pulls BOTH mean extents below 40% — box predicates skip on both."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / layout)
    if layout == "zorder":
        write_zordered(li, path, "l_partkey", "l_suppkey", bits=12, num_files=16)
    else:
        (
            li.repartitionByRange(16, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(path)
        )
    prof = rowgroup_extent_profile(path, "l_partkey", "l_suppkey")
    assert prof["n_row_groups"] >= 16
    if layout == "linear":
        assert prof["x_mean_extent"] < 0.2          # leading key prunes
        assert prof["y_mean_extent"] > 0.8          # trailing key does not
    else:
        assert prof["x_mean_extent"] < 0.5          # (measured 0.41)
        assert prof["y_mean_extent"] < 0.35         # BOTH dimensions prune
