"""The engine's user-definable function surface (SURVEY.md §2.10).

The reference has NO UDF story — imperative Python fills every gap. Our
engine exposes the standard Spark mechanism, pre-registering the engine's
own scalar kernels as SQL-callable functions so `spark.sql` users get the
same primitives the DataFrame layer uses:

* `ydw_normalize(s)`      — canonical text form (functions/text.normalize)
* `ydw_md5_long(s)`       — 60-bit portable hash (functions/hashing)
* `ydw_quality(s)`        — cheap quality score: uniq-token ratio × capped len
* `ydw_cosine(a, b)`      — dense-vector cosine (functions/vectors)

All are registered from COLUMN EXPRESSIONS (no Python rows): registration
wraps them as SQL macros via DataFrame-API lambdas where Spark allows, else
as pandas_udf (vectorized, Arrow-batched) — never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def register_udfs(spark: SparkSession) -> None:
    """Idempotently register the engine's SQL-callable functions."""

    # Python-side kernels: Arrow-vectorized pandas_udfs, one call per batch.

    @F.pandas_udf(DoubleType())
    def ydw_quality(s: pd.Series) -> pd.Series:
        toks = s.fillna("").str.split()
        n = toks.str.len().astype("float64")
        uniq = toks.map(lambda t: len(set(t)), na_action=None).astype("float64")
        ratio = (uniq / n.where(n > 0, 1.0)).where(n > 0, 0.0)
        return ratio * n.clip(upper=100.0) / 100.0

    spark.udf.register("ydw_quality", ydw_quality)

    @F.pandas_udf(DoubleType())
    def ydw_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        def cos(x, y):
            if x is None or y is None:
                return None
            xa, ya = np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")
            den = np.linalg.norm(xa) * np.linalg.norm(ya)
            return float(xa @ ya / den) if den else None

        return pd.Series([cos(x, y) for x, y in zip(a, b)], dtype="float64")

    spark.udf.register("ydw_cosine", ydw_cosine)

    # Pure-expression kernels: SQL scalar functions (SQL UDF, Spark 4) —
    # JVM-side, codegen-able, no Python at run time.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION ydw_normalize(s STRING)
        RETURNS STRING
        RETURN trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9\\\\s]', ''), '\\\\s+', ' '))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION ydw_md5_long(s STRING)
        RETURNS BIGINT
        RETURN cast(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
        """
    )
