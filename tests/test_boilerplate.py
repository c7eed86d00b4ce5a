"""operators/boilerplate.py: C4-style line-level boilerplate removal."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.boilerplate import (
    line_frequencies,
    strip_boilerplate,
)

BANNER = "Accept cookies to continue"
FOOTER = "© example corp"


def _docs(spark):
    rows = [
        (0, f"{BANNER}\nunique prose zero\n{FOOTER}"),
        (1, f"{BANNER}\nunique prose one\n{FOOTER}"),
        (2, f"{BANNER}\ndifferent words two\n{FOOTER}"),
        (3, "entirely original document"),
        (4, f"{BANNER}\n{FOOTER}"),  # nothing but boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_frequencies_counts_distinct_docs(spark):
    freq = {r.line: r.n_docs for r in line_frequencies(_docs(spark)).collect()}
    assert freq[BANNER] == 4 and freq[FOOTER] == 4
    assert freq["unique prose zero"] == 1


def test_strip_removes_frequent_keeps_unique(spark):
    out = {r.doc_id: r for r in strip_boilerplate(_docs(spark), min_docs=3).collect()}
    assert out[0].text == "unique prose zero"
    assert out[1].text == "unique prose one"
    assert out[2].text == "different words two"
    assert out[3].text == "entirely original document"
    assert out[4].text == "" and out[4].n_lines_kept == 0
    assert out[0].n_lines_removed == 2 and out[3].n_lines_removed == 0
    assert len(out) == 5  # all-boilerplate docs survive as empty rows


def test_normalization_collapses_case_and_whitespace(spark):
    rows = [
        (0, "  ACCEPT COOKIES TO CONTINUE  \nreal text a"),
        (1, "accept cookies to continue\nreal text b"),
        (2, "Accept Cookies To Continue\nreal text c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out == {0: "real text a", 1: "real text b", 2: "real text c"}


def test_line_order_preserved(spark):
    rows = [(i, f"common\nz last {i}\na first {i}\ncommon") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_boilerplate(docs, min_docs=2).collect()
    for r in out:
        # original relative order, not sorted content
        assert r.text == f"z last {r.doc_id}\na first {r.doc_id}"


def test_threshold_boundary(spark):
    docs = _docs(spark)
    # min_docs above the banner frequency: nothing removed
    out = strip_boilerplate(docs, min_docs=5).collect()
    assert all(r.n_lines_removed == 0 for r in out)
    joined = docs.alias("a").join(
        strip_boilerplate(docs, min_docs=5).alias("b"), "doc_id"
    )
    assert joined.filter(F.col("a.text") != F.col("b.text")).count() == 0


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert strip_boilerplate(empty).count() == 0
    assert line_frequencies(empty).count() == 0


def test_determinism_across_partitioning(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, strip_boilerplate(docs, min_docs=3).collect()))
    b = sorted(
        map(tuple, strip_boilerplate(docs.repartition(7), min_docs=3).collect())
    )
    assert a == b
