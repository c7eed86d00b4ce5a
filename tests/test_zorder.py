"""operators/zorder.py: Morton-clustered writes — footer-stats skipping
proof vs the unclustered baseline."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.zorder import (
    file_coverage_stats,
    files_matching,
    morton_code,
    write_unclustered,
    write_zordered,
)


@pytest.fixture(scope="module")
def grid(spark):
    """20k points over two independent uniform dimensions, shuffled
    arrival order (the layout a raw ingest would have)."""
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(100_000), rng.randrange(100_000)) for i in range(20_000)
    ]
    return spark.createDataFrame(rows, "row_id long, x long, y long")


def test_morton_code_locality(spark):
    """Adjacent ranks differ in the low Morton bits: quadrant ordering."""
    df = spark.range(4).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    )
    codes = {
        (r.a, r.z)
        for r in df.select(
            "a", morton_code(F.col("a"), F.col("b"), 2).alias("z")
        ).collect()
    }
    # interleave(a=b=k) doubles every bit: 0->0, 1->3, 2->12, 3->15
    assert codes == {(0, 0), (1, 3), (2, 12), (3, 15)}


def test_zorder_tightens_both_dimensions(spark, grid, tmp_path):
    zpath, upath = str(tmp_path / "z"), str(tmp_path / "u")
    write_zordered(grid, zpath, "x", "y", bits=8, n_files=16)
    write_unclustered(grid, upath, n_files=16)
    zstats = file_coverage_stats(zpath, "x", "y")
    ustats = file_coverage_stats(upath, "x", "y")
    zmean_a = sum(s["a_cover"] for s in zstats) / len(zstats)
    zmean_b = sum(s["b_cover"] for s in zstats) / len(zstats)
    umean_a = sum(s["a_cover"] for s in ustats) / len(ustats)
    umean_b = sum(s["b_cover"] for s in ustats) / len(ustats)
    # unclustered files each span ~the whole range in both dims
    assert umean_a > 0.9 and umean_b > 0.9
    # z-ordered files cover a strict fraction of BOTH dims
    assert zmean_a < 0.5 * umean_a
    assert zmean_b < 0.5 * umean_b


def test_point_predicates_skip_files_in_either_dimension(spark, grid, tmp_path):
    zpath, upath = str(tmp_path / "z2"), str(tmp_path / "u2")
    write_zordered(grid, zpath, "x", "y", bits=8, n_files=16)
    write_unclustered(grid, upath, n_files=16)
    for probe in (1_000, 50_000, 99_000):
        assert files_matching(zpath, "x", "y", a_val=probe) < files_matching(
            upath, "x", "y", a_val=probe
        )
        assert files_matching(zpath, "x", "y", b_val=probe) < files_matching(
            upath, "x", "y", b_val=probe
        )


def test_no_rows_lost_and_content_identical(spark, grid, tmp_path):
    zpath = str(tmp_path / "z3")
    write_zordered(grid, zpath, "x", "y", bits=6, n_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == grid.count()
    assert (
        back.select(F.sum("row_id"), F.sum("x"), F.sum("y")).collect()
        == grid.select(F.sum("row_id"), F.sum("x"), F.sum("y")).collect()
    )


def test_skewed_values_still_cluster(spark, tmp_path):
    """Rank normalization: a heavily skewed column must not collapse the
    curve (raw-value interleaving would put 99% of rows in one code)."""
    rng = random.Random(11)
    rows = [
        (i, int(rng.paretovariate(1.2) * 10), rng.randrange(100_000))
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "row_id long, x long, y long")
    zpath = str(tmp_path / "zskew")
    write_zordered(df, zpath, "x", "y", bits=8, n_files=16)
    stats = file_coverage_stats(zpath, "x", "y")
    mean_b = sum(s["b_cover"] for s in stats) / len(stats)
    assert mean_b < 0.6  # the well-behaved dim still clusters


def test_morton_code_matches_sql_twin_and_python(spark):
    """Cross-engine pin: the Column morton_code, its SQL twin, and a
    Python reference agree bit-for-bit — the contract that lets
    layout_zorder_cell_counts hash-verify the layout key against DuckDB."""
    import duckdb

    from yelpdatawarehouse_spark.operators.zorder import (
        morton_code,
        morton_code_sql,
    )

    def ref(x, y, bits):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(x, y) for x in (0, 1, 5, 200, 4095) for y in (0, 2, 9, 1023, 4095)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", morton_code(F.col("x"), F.col("y"), 12)
        ).collect()
    }
    con = duckdb.connect()
    sql = morton_code_sql("x", "y", 12)
    for x, y in rows:
        want = ref(x, y, 12)
        assert got[(x, y)] == want
        (dz,) = con.execute(
            f"SELECT {sql} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()
        assert dz == want
