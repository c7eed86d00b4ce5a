"""Data-quality operator (operators/quality.py): injected corruption must
be counted exactly, clean data must pass, and the row-level suite must
stay a single-scan plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.quality import (
    bounds,
    check_referential,
    check_rules,
    in_set,
    not_null,
)
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _report(df):
    return {r["rule"]: r for r in df.collect()}


def test_clean_table_passes(spark):
    o = table(spark, SF, "orders")
    rep = _report(
        check_rules(
            o,
            [
                not_null("d", "o_orderdate"),
                in_set("s", "o_orderstatus", ("O", "F", "P")),
                bounds("p", "o_totalprice", lo=0),
            ],
            unique_key="o_orderkey",
        )
    )
    n = o.count()
    for rule in ("d", "s", "p", "unique_o_orderkey"):
        assert rep[rule]["n_rows"] == n
        assert rep[rule]["n_violations"] == 0
        assert rep[rule]["passed"] is True


def test_injected_corruption_is_counted_exactly(spark):
    o = table(spark, SF, "orders").limit(100)
    bad = o.limit(7).select(
        F.col("o_orderkey"),  # duplicate keys -> 7 uniqueness violations
        F.col("o_custkey"),
        F.lit("X").alias("o_orderstatus"),  # 7 domain violations
        F.lit(-1.0).alias("o_totalprice"),  # 7 bounds violations
        F.lit(None).cast("date").alias("o_orderdate"),  # 7 null violations
        F.col("o_orderpriority"),
    )
    df = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ).unionByName(bad)
    rep = _report(
        check_rules(
            df,
            [
                not_null("d", "o_orderdate"),
                in_set("s", "o_orderstatus", ("O", "F", "P")),
                bounds("p", "o_totalprice", lo=0),
            ],
            unique_key="o_orderkey",
        )
    )
    for rule in ("d", "s", "p", "unique_o_orderkey"):
        assert rep[rule]["n_rows"] == 107
        assert rep[rule]["n_violations"] == 7
        assert rep[rule]["passed"] is False


def test_null_predicate_counts_as_violation(spark):
    """A rule whose condition evaluates to NULL (not TRUE) must count as
    a violation — unknown is not a pass."""
    df = spark.createDataFrame([(1,), (None,)], "x int")
    rep = _report(check_rules(df, [bounds("b", "x", lo=0)]))
    assert rep["b"]["n_violations"] == 1


def test_referential_counts_orphans_and_null_fks(spark):
    o = table(spark, SF, "orders").select("o_custkey").limit(50)
    ghost = spark.createDataFrame([(98765431,), (None,)], "o_custkey bigint")
    df = o.unionByName(ghost)
    c = table(spark, SF, "customer")
    rep = _report(check_referential("ri", df, "o_custkey", c, "c_custkey"))
    assert rep["ri"]["n_rows"] == 52
    assert rep["ri"]["n_violations"] == 2
    assert rep["ri"]["passed"] is False


def test_observed_metrics_match_check_rules(spark, tmp_path):
    """observe_rules must report the same counts as check_rules, computed
    as a side effect of a WRITE action (no second scan)."""
    from yelpdatawarehouse_spark.operators.quality import observe_rules

    o = table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    rules = [
        not_null("d", "o_orderdate"),
        in_set("s", "o_orderstatus", ("O", "F", "P")),
        bounds("p", "o_totalprice", lo=0),
    ]
    observed, obs = observe_rules(o, rules)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out.parquet"))
    got = obs.get
    want = {r["rule"]: r["n_violations"] for r in check_rules(o, rules).collect()}
    assert got["n_rows"] == o.count()
    for rule in ("d", "s", "p"):
        assert got[rule] == want[rule]


def test_gated_ingest_routes_bad_batches_to_quarantine(spark, tmp_path):
    """Three micro-batches, one corrupted: the clean two must land in the
    live table, the bad one wholesale in quarantine, rows conserved."""
    import glob

    from yelpdatawarehouse_spark.streaming.pipeline import (
        event_file_stream,
        run_gated_ingest,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    ev = table(spark, SF, "events")
    n_per = {}
    for i in range(3):
        chunk = ev.filter(F.col("event_id") % 3 == i).toPandas()
        chunk["ts"] = chunk["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        if i == 1:  # corrupt the middle batch: negative values
            chunk.loc[chunk.index[:5], "value"] = -999.0
        n_per[i] = len(chunk)
        chunk.to_json(src / f"chunk_{i}.json", orient="records", lines=True)

    out, quar = tmp_path / "live", tmp_path / "quarantine"
    q = run_gated_ingest(
        spark,
        event_file_stream(spark, str(src)),
        [bounds("value_nonneg", "value", lo=0)],
        str(out),
        str(quar),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    live_batches = sorted(glob.glob(str(out / "batch_*")))
    quar_batches = sorted(glob.glob(str(quar / "batch_*")))
    assert len(live_batches) == 2
    assert len(quar_batches) == 1
    n_live = spark.read.parquet(*live_batches).count()
    n_quar = spark.read.parquet(*quar_batches).count()
    assert n_live + n_quar == sum(n_per.values())
    quar_rows = spark.read.parquet(*quar_batches)
    assert quar_rows.filter(F.col("value") < 0).count() == 5


def test_row_rules_are_single_scan(spark):
    """All predicate rules must fold into one aggregate over one scan —
    the plan reads the parquet exactly once."""
    o = table(spark, SF, "orders")
    df = check_rules(
        o,
        [
            not_null("d", "o_orderdate"),
            in_set("s", "o_orderstatus", ("O", "F", "P")),
            bounds("p", "o_totalprice", lo=0),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
