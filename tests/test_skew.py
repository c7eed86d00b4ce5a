"""Skew operators: salted join and salted exact distinct-count must be
result-identical to their unsalted forms on a synthetic hot-key dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.skew import salted_distinct_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 carries 50% of all rows (the hot key); values repeat
    big = spark.range(20_000).select(
        F.when(F.col("id") < 10_000, 0).otherwise((F.col("id") % 100) + 1).alias("k"),
        (F.col("id") % 37).alias("v"),
        F.col("id").alias("row_id"),
    )
    small = spark.range(101).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    return big.cache(), small.cache()


def test_salted_join_matches_plain(skewed):
    big, small = skewed
    plain = big.join(small, "k").select("row_id", "k", "label")
    salted = salted_join(big, small, "k", n_salts=8).select("row_id", "k", "label")
    assert salted.count() == plain.count() == 20_000
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_join_left(skewed):
    big, small = skewed
    # drop some dim rows → left join must preserve unmatched big rows as null
    small_partial = small.filter(F.col("k") < 50)
    plain = big.join(small_partial, "k", "left").select("row_id", "label")
    salted = salted_join(big, small_partial, "k", n_salts=4, how="left").select(
        "row_id", "label"
    )
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_join_spreads_hot_key(skewed):
    big, small = skewed
    out = salted_join(big, small, "k", n_salts=8, salt_source="row_id")
    # the physical join key is (k, __salt): the hot key's rows hash to >1 salt
    salts = (
        big.withColumn("s", F.pmod(F.xxhash64(F.col("row_id").cast("string")), F.lit(8)))
        .filter(F.col("k") == 0)
        .select("s")
        .distinct()
        .count()
    )
    assert salts > 1  # hot key genuinely spread
    assert out.filter(F.col("k") == 0).count() == 10_000


def test_salted_distinct_count_exact(skewed):
    big, _ = skewed
    got = {r.k: r.distinct_cnt for r in salted_distinct_count(big, "k", "v").collect()}
    want = {
        r.k: r.cnt
        for r in big.groupBy("k").agg(F.countDistinct("v").alias("cnt")).collect()
    }
    assert got == want
    assert got[0] == 37  # hot key: all 37 distinct values


def test_j5_hot_basket_salted_branch_exact(spark, tmp_path):
    """j5's pair expansion must stay exact when one parent key is a hot
    basket (>= J5_LARGE_BASKET parts) that routes through the salted
    posexplode branch alongside small inline-path baskets."""
    import itertools
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yelpdatawarehouse_spark.queries import all_queries
    from yelpdatawarehouse_spark.queries.relational import J5_LARGE_BASKET

    rows = [(1, p) for p in range(J5_LARGE_BASKET * 3)]  # hot basket
    for o in range(2, 12):  # small baskets with overlapping pairs
        rows += [(o, p) for p in range(o, o + 4)]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

    q = all_queries()["j5_copurchase_pairs"]
    got = {(r.part_a, r.part_b): r.together_cnt for r in q.fn(spark, str(tmp_path)).collect()}

    exp: Counter = Counter()
    baskets: dict[int, set[int]] = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    for parts in baskets.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            exp[(a, b)] += 1
    assert got == {k: v for k, v in exp.items() if v >= 3}


def test_j6_hot_hub_salted_branch_exact(spark, tmp_path):
    """j6's two-hop pair expansion must stay exact when one hub part has a
    supplier set >= J5_LARGE_BASKET routed through the salted posexplode
    branch (the co-reviewer 2-hop hot-hub shape, reference workload
    webapp/neo4j_routes.py:459-467), and the salted branch must actually
    be in the plan."""
    import itertools
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yelpdatawarehouse_spark.queries import all_queries
    from yelpdatawarehouse_spark.queries.relational import J5_LARGE_BASKET

    rows = [(1, s) for s in range(J5_LARGE_BASKET * 2)]  # hot hub part
    for p in range(2, 30):  # small hubs with overlapping supplier windows
        rows += [(p, s) for s in range(p % 7, p % 7 + 6)]
    tbl = pa.table(
        {
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

    qd = all_queries()["j6_two_hop_supplier_pairs"]
    df = qd.fn(spark, str(tmp_path))
    assert "posexplode" in df._jdf.queryExecution().optimizedPlan().toString()
    got = {(r.supp_a, r.supp_b): r.shared_parts for r in df.collect()}

    hubs: dict[int, set[int]] = {}
    for p, s in rows:
        hubs.setdefault(p, set()).add(s)
    exp: Counter = Counter()
    for supps in hubs.values():
        for a, b in itertools.combinations(sorted(supps), 2):
            exp[(a, b)] += 1
    assert got == {k: v for k, v in exp.items() if v >= 5}
    assert got  # threshold actually kept some pairs


@pytest.mark.parametrize("threshold", [2, 4, 1000])
def test_basket_pair_rows_property(spark, threshold):
    """_basket_pair_rows must equal itertools.combinations of each sorted
    basket regardless of which branch (inline HOF vs salted posexplode)
    baskets route through — thresholds straddle both regimes."""
    import itertools
    from collections import Counter

    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.queries.relational import _basket_pair_rows

    baskets = [
        [1], [2, 7], [3, 1, 9, 4], list(range(10, 22)), [5, 5],  # dup collapses? no: raw arrays
        [8, 2, 6, 4, 0, 11, 3],
    ]
    df = spark.createDataFrame(
        [(i, sorted(set(b))) for i, b in enumerate(baskets)], ["k", "arr"]
    )
    out = _basket_pair_rows(df, "arr", "a", "b", threshold, 4)
    got = Counter((r.p.a, r.p.b) for r in out.collect())
    exp = Counter()
    for b in baskets:
        for x, y in itertools.combinations(sorted(set(b)), 2):
            exp[(x, y)] += 1
    assert got == exp
