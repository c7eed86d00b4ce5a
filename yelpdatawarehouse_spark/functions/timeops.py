"""Event-time column helpers shared by the time-join operators and queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(c: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-safe.

    Parquet written as ``timestamp[us]`` with no timezone reads as
    TIMESTAMP_NTZ under PySpark 4.1 defaults, and ``unix_micros`` rejects
    NTZ input (the round-2 breakage class). Sessions are pinned to UTC at
    the table reader (sources/tables.py), so casting NTZ -> TIMESTAMP is
    value-preserving and ``unix_micros`` then matches DuckDB's
    ``epoch_us`` exactly.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))
