"""Distributed exact global ranking — the scalable replacement for
``row_number()/dense_rank() OVER (ORDER BY col)`` with no PARTITION BY.

An un-partitioned window funnels the whole input through ONE task; at a
billion-row dimension that single sort is the job. The classic fix (the
same trick TeraSort and Spark's own ``sortBy`` ecosystem use) is:

1. ``repartitionByRange`` on the key — partition i holds a contiguous,
   ordered key range, so partition order == key order;
2. rank *locally* inside each partition (a PARTITION BY pid window —
   fully parallel);
3. add the number of rows in all earlier partitions (a per-partition
   count — at most ``num_partitions`` rows, prefix-summed through a
   window that is global but bounded to that tiny frame, then broadcast
   back onto the data).

The result is the exact 1-based global rank, bit-identical to the naive
global window, with driver/exchange state bounded by the partition count
instead of the row count.

Determinism: RangePartitioner's boundary sampling is seeded per input
partition index (XORShiftRandom(byteswap64(idx))), so boundaries are
stable for a given input; and even if boundaries moved, ranks are
corrected by the measured offsets, so the OUTPUT is a pure function of
the key multiset either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pin(df: DataFrame, reliable: bool) -> DataFrame:
    """Materialize the ranged frame so ``spark_partition_id`` is read by
    every consumer under ONE partitioning (correctness-mandated — see the
    callers' comments). ``reliable=True`` uses ``checkpoint()`` (HDFS/DFS
    files via ``spark.sparkContext.setCheckpointDir``): survives executor
    loss mid-job and frees executor storage, at the cost of a write to
    reliable storage — the escape hatch for long-lived sessions
    composing many ranked frames (ADVICE r8). Default stays the cheap
    eager ``localCheckpoint`` (executor-storage blocks, lineage
    truncated)."""
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint()


def _guarded_pid(key: str, op: str) -> Column:
    """spark_partition_id(), but raising on a NULL ranking key.

    NULL keys would silently diverge from any ANSI oracle: Spark windows
    and RangePartitioner order NULLS FIRST while DuckDB/ANSI ``ORDER BY``
    defaults to NULLS LAST, so a nullable-key caller would get
    oracle-divergent ranks with no error (ADVICE r6 #3). Embedding the
    check in ``__pid`` — a column every downstream step consumes — keeps
    Catalyst from pruning it, and it costs one null-check per row inside
    codegen. Callers with NULL keys must pre-filter or coalesce.
    """
    return F.when(
        F.col(key).isNull(),
        F.raise_error(
            F.lit(
                f"{op}: NULL value in ranking key '{key}' — NULLS FIRST "
                "(Spark) vs NULLS LAST (ANSI) makes NULL ranks "
                "oracle-divergent; pre-filter or coalesce the key"
            )
        ).cast("int"),
    ).otherwise(F.spark_partition_id())


def exact_global_rank(
    df: DataFrame,
    key: str,
    *,
    rank_col: str = "rank",
    num_partitions: int = 32,
    reliable: bool = False,
) -> DataFrame:
    """Return ``df`` with an exact 1-based global ``row_number`` over
    ``ORDER BY key`` in ``rank_col``, computed without an un-partitioned
    window.

    Keys must be orderable and NON-NULL (enforced at runtime — see
    :func:`_guarded_pid`); ties are broken arbitrarily-but-
    deterministically only if the key is unique — pass a unique key (or
    pre-distinct the frame) when rank stability matters, exactly as you
    would have to for the naive global window.

    EAGER: this is not a lazy plan builder — it localCheckpoints the
    range-partitioned input at CALL time (required for correctness:
    ``__pid`` is ``spark_partition_id()``, nondeterministic, and feeds
    two consumers — see the in-body comment), which triggers a Spark job
    and pins the frame's blocks in EXECUTOR storage (not reliable
    storage) for the session, with lineage truncated — the same trade
    documented at operators/graph.min_label_components. Long-lived
    sessions composing many ranked frames should release references
    promptly (the bench harness gc.collect()s between queries for this
    reason) or pass ``reliable=True`` to pin via ``.checkpoint()``
    instead (requires ``spark.sparkContext.setCheckpointDir``): survives
    executor loss mid-job and keeps blocks out of executor storage, at
    the cost of a reliable-storage write.
    """
    # Pinned for __pid consistency across the two consumers (counts +
    # data join) — spark_partition_id() is nondeterministic and a
    # re-evaluated subtree may land on a different partitioning when the
    # input is a shuffle output; see the exact_prefix_sum comment (the
    # sf0.1 pareto corruption, round 8).
    ranged = _pin(
        df.repartitionByRange(num_partitions, F.col(key)).withColumn(
            "__pid", _guarded_pid(key, "exact_global_rank")
        ),
        reliable,
    )
    # Bounded exchange: one row per partition. The unboundedPreceding
    # window below runs over <= num_partitions rows by construction.
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__off")
    )
    local_w = Window.partitionBy("__pid").orderBy(key)
    return (
        ranged.withColumn("__lr", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lr")).cast("long"))
        .drop("__pid", "__lr", "__off")
    )


def exact_prefix_sums(
    df: DataFrame,
    order_key: str,
    value_cols: "list[tuple[str, str]]",
    *,
    num_partitions: int = 32,
    reliable: bool = False,
) -> DataFrame:
    """EXCLUSIVE running sums of SEVERAL value columns over the same
    ``ORDER BY order_key``, in ONE range pass: ``value_cols`` is a list of
    ``(value_col, out_col)`` pairs. Chaining :func:`exact_prefix_sum` once
    per column pays the range exchange + eager pin + offset pass N times
    over for the identical ordering; this computes all N sums from a
    single ranged frame (one exchange, one pin, one offsets broadcast),
    with each column's arithmetic unchanged. Same key contract
    (unique, NON-NULL) and eager-materialization trade as
    :func:`exact_prefix_sum`.
    """
    # Pin rationale (round 8, the sf0.1 pareto corruption): __pid is
    # spark_partition_id() — NONDETERMINISTIC — and `ranged` feeds TWO
    # consumers (the per-partition totals and the data join). Unpinned,
    # each consumer re-evaluates the subtree, and when the INPUT is itself
    # a shuffle output, AQE may give the two evaluations different
    # partitionings — offsets computed against one boundary set get
    # applied to another, silently corrupting the prefix sums. The pin
    # guarantees one evaluation, one partitioning, one consistent __pid.
    ranged = _pin(
        df.repartitionByRange(num_partitions, F.col(order_key)).withColumn(
            "__pid", _guarded_pid(order_key, "exact_prefix_sums")
        ),
        reliable,
    )
    totals = ranged.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__tot{i}") for i, (v, _) in enumerate(value_cols)]
    )
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__tot{i}").over(off_w), F.lit(0)).alias(f"__off{i}")
            for i in range(len(value_cols))
        ],
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = ranged
    for i, (v, _) in enumerate(value_cols):
        out = out.withColumn(
            f"__lps{i}", F.coalesce(F.sum(v).over(local_w), F.lit(0))
        )
    out = out.join(F.broadcast(offsets), "__pid")
    for i, (_, oc) in enumerate(value_cols):
        out = out.withColumn(oc, F.col(f"__off{i}") + F.col(f"__lps{i}"))
    drop = ["__pid"]
    for i in range(len(value_cols)):
        drop += [f"__lps{i}", f"__off{i}"]
    return out.drop(*drop)


def exact_prefix_sum(
    df: DataFrame,
    order_key: str,
    value_col: str,
    *,
    out_col: str = "prefix_sum",
    num_partitions: int = 32,
    reliable: bool = False,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` over ``ORDER BY order_key``
    (sum of all STRICTLY-earlier keys), without an un-partitioned window —
    the same range-partition + offset construction as
    :func:`exact_global_rank`.

    Keys must be unique and NON-NULL (the latter enforced at runtime —
    see :func:`_guarded_pid`; pre-aggregate to one row per key first —
    the natural shape: this exists to scan value-domain collapses, CDFs,
    and rank statistics whose key domain is too large for a single task
    but whose per-key row is already aggregated). Sums are computed with
    Spark's sum over the column's own type — use an exact type (long /
    decimal) when cross-engine bit-equality matters.

    EAGER: like :func:`exact_global_rank`, calling this triggers a Spark
    job (correctness-mandated localCheckpoint of the ranged frame) and
    pins blocks in executor storage for the session — see that
    function's docstring for the storage/lineage trade and the
    reliable-checkpoint escape hatch.
    """
    # Thin wrapper over the multi-column form (ADVICE r13: the two copies
    # of the pin/totals/offsets/local-window construction could drift —
    # bit-equality of this delegation is pinned by
    # tests/test_ranks.py::test_prefix_sums_multi_matches_chained).
    return exact_prefix_sums(
        df, order_key, [(value_col, out_col)],
        num_partitions=num_partitions, reliable=reliable,
    )
