"""Stream ≡ batch for the r11 LIBRARY operators.

Every stateless textops/sampling function (pure row expressions — no
window, no aggregation) must produce, over a file stream consumed with
availableNow, exactly the rows its batch form produces on the same data.
This extends the engine's standing stream≡batch invariant (streaming
pipeline suite) to the new library surface: a curation pipeline can run
its quality gate / chunker / redactor / sampler on a stream without a
separate code path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

from yelpdatawarehouse_spark.operators import sampling, textops

SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("source", StringType()),
    StructField("text", StringType()),
])

DOCS = [
    (1, "web", "the quick brown fox jumps over the lazy dog"),
    (2, "web", "spam spam spam spam spam"),
    (3, "wiki", "a reasonably diverse document about stream processing"),
    (4, "wiki", "short"),
    (5, "books", "one more body of text to chunk and to redact a token or two"),
    (6, "books", "secret token stream"),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """Three single-file chunks, as a micro-batch file source sees them."""
    d = str(tmp_path_factory.mktemp("textops_stream"))
    for i, lo in enumerate(range(0, len(DOCS), 2)):
        spark.createDataFrame(DOCS[lo:lo + 2], SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(d, f"chunk{i}"))
    return d


def _stream_vs_batch(spark, corpus_dir, tmp_path, name, transform):
    stream = spark.readStream.schema(SCHEMA).parquet(
        os.path.join(corpus_dir, "chunk*"))
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    batch = spark.read.schema(SCHEMA).parquet(os.path.join(corpus_dir, "chunk*"))
    want = sorted(map(tuple, transform(batch).collect()))
    assert got == want
    assert len(want) > 0


def test_quality_scores_stream_equals_batch(spark, corpus_dir, tmp_path):
    _stream_vs_batch(spark, corpus_dir, tmp_path, "tq_stream",
                     lambda df: textops.quality_scores(df))


def test_chunk_sliding_stream_equals_batch(spark, corpus_dir, tmp_path):
    _stream_vs_batch(spark, corpus_dir, tmp_path, "tc_stream",
                     lambda df: textops.chunk_sliding(df, chunk=4, stride=3))


def test_redact_tokens_stream_equals_batch(spark, corpus_dir, tmp_path):
    _stream_vs_batch(
        spark, corpus_dir, tmp_path, "tr_stream",
        lambda df: textops.redact_tokens(df, denylist=("secret", "token")))


def test_stratified_sample_stream_equals_batch(spark, corpus_dir, tmp_path):
    _stream_vs_batch(
        spark, corpus_dir, tmp_path, "ts_stream",
        lambda df: sampling.stratified_hash_sample(
            df, rates={"web": 100, "wiki": 50}, default_pct=0, salt="st:"))


def test_hash_split_stream_equals_batch(spark, corpus_dir, tmp_path):
    _stream_vs_batch(
        spark, corpus_dir, tmp_path, "th_stream",
        lambda df: sampling.hash_split(df, boundaries=((60, "train"),),
                                       default_label="eval", salt="sp:"))
