"""Reusable event-time join operators: as-of join and bounded-interval
(range) join.

Spark has neither operator natively; the scalable encodings here are the
ones the query layer proved against DuckDB oracles (queries/sessions.py
j11/j12) — generalized so any caller can use them on arbitrary frames:

* **as-of join** — union both streams on the shared (key, time) axis and
  carry the reference side forward/backward with ``last(..., ignorenulls)``
  over one window: ONE shuffle on the key, no per-probe subquery, no
  inequality-join explosion. This beats the broadcast-nested-loop plan
  Spark picks for a raw ``t_r <= t_l`` join at any scale where the right
  side isn't broadcastable.
* **bounded range join** — equi-join on a coarse time bucket whose width
  equals the interval length (each probe touches exactly two buckets),
  then apply the exact predicate: the join stays a shuffled hash join,
  work is O(matches), AQE skew splitting applies as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import epoch_us


def _orderable(dtype) -> bool:
    """True when Spark can sort values of this type (MapType cannot be
    used in a window ORDER BY; structs/arrays are orderable iff their
    element/field types are)."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.MapType):
        return False
    if isinstance(dtype, T.ArrayType):
        return _orderable(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return all(_orderable(f.dataType) for f in dtype.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    asof_col: str = "asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right row per key at or
    before (``backward``) / at or after (``forward``) the left row's time,
    as a struct column ``asof_col`` (null when no such right row exists).

    Tie semantics are inclusive: a right row at exactly the left row's
    time matches in both directions (the right side sorts first at equal
    times). When several RIGHT rows share one (key, right_time) — e.g. a
    versioned dim with duplicate valid_from — the winner is deterministic:
    the row with the greatest ``tiebreak`` column when given, else the
    greatest payload struct (skipped only when the payload contains an
    unorderable Map column, in which case the caller should supply
    ``tiebreak``). Left columns pass through unchanged; ``left_time`` /
    ``right_time`` name timestamp columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    r_payload = F.struct(*[F.col(c) for c in payload_cols])
    r_struct_type = right.select(r_payload.alias("_p")).schema["_p"].dataType
    l_payload = F.struct(*[F.col(c) for c in left.columns if c not in keys])
    l_struct_type = left.select(l_payload.alias("_l")).schema["_l"].dataType

    ls = left.select(
        *keys,
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__probe"),
        l_payload.alias("__lrow"),
        F.lit(None).cast(r_struct_type).alias("__rrow"),
    )
    rs = right.select(
        *keys,
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__probe"),
        F.lit(None).cast(l_struct_type).alias("__lrow"),
        r_payload.alias("__rrow"),
    )
    merged = ls.unionByName(rs)
    # Deterministic tie-break among right rows sharing (key, __t): the
    # LAST right row in window order wins, so ascending tiebreak picks the
    # greatest value. Left rows sort after rights at equal __t via
    # __probe, so the extra key never reorders probe rows.
    if tiebreak is not None:
        tie = [F.asc(F.col("__rrow")[tiebreak])]
    elif _orderable(r_struct_type):
        tie = [F.asc("__rrow")]
    else:
        tie = []
    if direction == "backward":
        order = [F.asc("__t"), F.asc("__probe"), *tie]
    elif direction == "forward":
        order = [F.desc("__t"), F.asc("__probe"), *tie]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__rrow", ignorenulls=True).over(w)
    out = merged.withColumn(asof_col, carried).filter(F.col("__probe") == 1)
    left_cols = [c for c in left.columns if c not in keys]
    return out.select(
        *keys, *[F.col(f"__lrow.{c}").alias(c) for c in left_cols], asof_col
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    window_seconds: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join left rows to all right rows of the same key with
    ``left_time <= right_time < left_time + window_seconds`` (half-open).

    The equi-join runs on (keys..., bucket) where bucket width equals the
    window, so a right row in bucket b only probes left buckets b and b-1;
    the exact predicate filters after. Right's non-key columns come back
    prefixed with ``right_prefix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    width_us = window_seconds * 1_000_000
    bucket = lambda c: F.floor(epoch_us(c) / width_us)  # noqa: E731

    ls = left.withColumn("__bucket", bucket(left_time))
    r_cols = [c for c in right.columns if c not in keys]
    rs = right.select(
        *keys,
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols],
        F.explode(
            F.array(bucket(right_time), bucket(right_time) - 1)
        ).alias("__bucket"),
    )
    rt = f"{right_prefix}{right_time}"
    joined = ls.join(rs, [*keys, "__bucket"]).filter(
        (epoch_us(rt) >= epoch_us(left_time))
        & (epoch_us(rt) < epoch_us(left_time) + width_us)
    )
    return joined.drop("__bucket")
