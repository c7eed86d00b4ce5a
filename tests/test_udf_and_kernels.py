"""UDF registration surface (SURVEY §2.10) + randomized kernel cross-checks:
the JVM expression kernels (shingles, normalize, minhash perms) must agree
with independent pure-Python reference implementations on a seeded random
corpus — the property-test layer under the DuckDB oracle gate."""

from __future__ import annotations

import hashlib
import random
import re

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.functions import hashing
from yelpdatawarehouse_spark.functions import text as T
from yelpdatawarehouse_spark.functions.udf import register_udfs


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(20260813)
    vocab = ["alpha", "beta", "Gamma!", "d-e", "ε", "x1", "", "The", "the", "a,b"]
    rows = []
    for i in range(200):
        n = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows += [(200, None), (201, ""), (202, "   "), (203, "one two")]
    return spark.createDataFrame(rows, "doc_id INT, text STRING").cache()


def test_shingles_match_python_reference(spark, corpus):
    got = {
        r.doc_id: list(r.sh)
        for r in corpus.filter(F.col("text").isNotNull())
        .select("doc_id", T.shingles(T.tokens("text"), 3).alias("sh"))
        .collect()
    }
    for r in corpus.filter(F.col("text").isNotNull()).collect():
        toks = re.split(r"\s+", r.text)  # Spark split semantics incl. "" tokens
        want = (
            [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else []
        )
        assert got[r.doc_id] == want, (r.doc_id, r.text)


def test_normalize_matches_python_reference(spark, corpus):
    got = {r.doc_id: r.n for r in corpus.select("doc_id", T.normalize("text").alias("n")).collect()}
    for r in corpus.collect():
        if r.text is None:
            assert got[r.doc_id] is None
        else:
            want = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", r.text.lower())).strip()
            assert got[r.doc_id] == want, (r.doc_id, r.text)


def test_md5_long_matches_python_reference(spark, corpus):
    got = {
        r.doc_id: r.h
        for r in corpus.filter(F.col("text").isNotNull())
        .select("doc_id", hashing.md5_long(F.col("text")).alias("h"))
        .collect()
    }
    for r in corpus.filter(F.col("text").isNotNull()).collect():
        want = int(hashlib.md5(r.text.encode()).hexdigest()[:15], 16)
        assert got[r.doc_id] == want


def test_perm_family_range_and_determinism(spark):
    df = spark.range(1000).select(
        (F.col("id") % hashing.MERSENNE).alias("h"),
        *[hashing.perm(F.col("id") % hashing.MERSENNE, i).alias(f"p{i}") for i in range(4)],
    )
    rows = df.collect()
    for r in rows:
        for i in range(4):
            a, b = hashing.PERM_COEFFS[i]
            assert r[f"p{i}"] == (a * r["h"] + b) % hashing.MERSENNE
            assert 0 <= r[f"p{i}"] < hashing.MERSENNE


def test_registered_udfs(spark):
    register_udfs(spark)
    row = spark.sql(
        "SELECT ydw_normalize('Ab, C!') AS n, "
        "ydw_md5_long('x') AS h, "
        "ydw_quality('a a b') AS q, "
        "ydw_cosine(array(1.0d, 0.0d), array(0.6d, 0.8d)) AS c"
    ).collect()[0]
    assert row.n == "ab c"
    assert row.h == int(hashlib.md5(b"x").hexdigest()[:15], 16)
    assert abs(row.q - (2 / 3) * 3 / 100) < 1e-9
    assert abs(row.c - 0.6) < 1e-9


def test_sql_udfs_are_jvm_side(spark):
    """The SQL scalar functions must not appear as Python UDFs in the plan
    (no BatchEvalPython / ArrowEvalPython node)."""
    register_udfs(spark)
    df = spark.sql("SELECT ydw_normalize('X') AS n, ydw_md5_long('X') AS h")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
