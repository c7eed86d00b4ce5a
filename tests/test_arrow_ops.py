"""mapInArrow kernel (functions/arrow_ops.py): the Arrow-native token
counter must agree exactly with the JVM expression it mirrors — same
regex, same empty-field semantics — including on whitespace edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.functions.arrow_ops import token_count_arrow
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_counts_equal_jvm_expression_on_corpus(spark):
    d = table(spark, SF, "documents")
    got = {
        r["doc_id"]: r["n_tokens"] for r in token_count_arrow(d).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split("text", r"\s+")).alias("n")
        ).collect()
    }
    assert got == want


def test_whitespace_edge_cases(spark):
    rows = [
        (0, ""),            # split("") -> [""] -> 1
        (1, "   "),         # leading run -> ["", ""] -> 2
        (2, "a"),
        (3, " a  b "),      # leading + trailing empties kept
        (4, "a\tb\nc"),     # any whitespace class
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in token_count_arrow(df).collect()}
    want = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(F.split("text", r"\s+")).alias("n")
        ).collect()
    }
    assert got == want
