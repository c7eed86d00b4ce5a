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


def test_compression_ratio_separates_repetition_from_noise(spark):
    """The filter property the signal exists for: highly repetitive text
    compresses far better than high-entropy text, with prose between;
    plus zlib-determinism across partitionings."""
    import random
    import zlib

    from yelpdatawarehouse_spark.functions.arrow_ops import (
        compression_ratio_arrow,
    )

    rng = random.Random(7)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(8))
        for _ in range(200)
    )
    repetitive = "the same line again and again. " * 60
    prose = (
        "Distributed engines trade shuffle cost against parallelism; a plan "
        "that avoids moving data usually wins at scale, but only when the "
        "partitioning already matches the keys the query groups by. " * 10
    )
    df = spark.createDataFrame(
        [(0, repetitive), (1, prose), (2, noise)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in compression_ratio_arrow(df).collect()}
    assert rows[0].compression_ratio < rows[1].compression_ratio < rows[2].compression_ratio
    assert rows[0].compression_ratio < 0.1     # boilerplate band
    assert rows[2].compression_ratio > 0.5     # noise band
    # bit-determinism: equals a direct zlib call, regardless of partitioning
    for n_parts in (1, 7):
        got = {
            r.doc_id: (r.n_compressed, r.compression_ratio)
            for r in compression_ratio_arrow(df.repartition(n_parts)).collect()
        }
        for did, text in ((0, repetitive), (1, prose), (2, noise)):
            want = len(zlib.compress(text.encode(), 6))
            assert got[did][0] == want


def test_compression_ratio_empty_and_null_safe(spark):
    from yelpdatawarehouse_spark.functions.arrow_ops import (
        compression_ratio_arrow,
    )

    df = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
    rows = {r.doc_id: r for r in compression_ratio_arrow(df).collect()}
    assert rows[0].n_bytes == 0 and rows[1].n_bytes == 0
    assert rows[0].n_compressed == rows[1].n_compressed > 0  # fixed envelope


def test_compression_ratio_output_follows_id_col(spark):
    """Pin the ADVICE r7/r8 contract: schema AND batch column names both
    derive from id_col, so a caller keyed on vec_id keeps its name (the
    r8 fix made the kernel's from_arrays names track the schema — this
    is the regression test the fix was missing)."""
    from yelpdatawarehouse_spark.functions.arrow_ops import (
        compression_ratio_arrow,
    )

    df = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "zzzz " * 40)],
        "vec_id long, body string",
    )
    out = compression_ratio_arrow(df, text_col="body", id_col="vec_id")
    assert out.columns == ["vec_id", "n_bytes", "n_compressed", "compression_ratio"]
    rows = {r.vec_id: r for r in out.collect()}
    assert set(rows) == {10, 11}
    assert rows[11].compression_ratio < rows[10].compression_ratio
