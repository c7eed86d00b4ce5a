"""Keyed MERGE (upsert) into a parquet/Delta table directory.

The reference upserts with ``INSERT ... ON DUPLICATE KEY UPDATE``
(init/mysql_loader.py:435-439; streaming/consumer.py:417-441). The
transactional equivalent on a lakehouse is ``MERGE INTO`` on Delta/Iceberg;
this operator probes for delta-spark at runtime and uses a real
``DeltaTable.merge`` when (a) the package is importable and (b) the target
directory is a Delta table. Everywhere else — including this container,
which ships no lake format — it falls back to the read → anti-join/union →
atomic-directory-swap equivalent that the streaming consumer already proves
convergent (tests/test_yelp_streaming.py).

Crash-safety of the fallback matches operators/maintenance.compact: two
renames with ``._old`` recovery on entry. Single-rename atomicity and
concurrent writers are exactly what the Delta path buys at production
scale.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _probe_delta(spark: SparkSession, target_dir: str):
    """Return a DeltaTable handle when delta-spark is importable AND the
    target is a Delta table; None otherwise (fallback path)."""
    try:
        from delta.tables import DeltaTable  # noqa: PLC0415
    except ImportError:
        return None
    try:
        if DeltaTable.isDeltaTable(spark, target_dir):
            return DeltaTable.forPath(spark, target_dir)
    except Exception:
        pass
    return None


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: list[str],
    insert_only: bool = False,
) -> None:
    """MERGE ``updates`` into the table at ``target_dir`` on ``keys``:
    matched rows are replaced by the update row (or left untouched when
    ``insert_only`` — the dim insert-if-absent shape), unmatched rows are
    inserted. Duplicate keys WITHIN ``updates`` are resolved to one
    arbitrary-but-deterministic row first (max over the non-key columns'
    struct), mirroring MERGE's one-source-row-per-target-row requirement.
    """
    non_keys = [c for c in updates.columns if c not in keys]
    from pyspark.sql import functions as F

    if non_keys:
        dedup = (
            updates.groupBy(*keys)
            .agg(F.max(F.struct(*non_keys)).alias("__p"))
            .select(*keys, *[F.col(f"__p.{c}").alias(c) for c in non_keys])
        )
    else:
        # Pure key-set upsert (insert-only membership): nothing to pick
        # among duplicates, so dedup is just DISTINCT over the keys.
        dedup = updates.dropDuplicates(keys)

    dt = _probe_delta(spark, target_dir)
    if dt is not None:
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        m = dt.alias("t").merge(dedup.alias("s"), cond)
        if not insert_only:
            m = m.whenMatchedUpdateAll()
        m.whenNotMatchedInsertAll().execute()
        return

    # Fallback: read-modify-swap with the maintenance-operator crash protocol.
    tmp = target_dir.rstrip("/") + "._merging"
    old = target_dir.rstrip("/") + "._old"
    if os.path.exists(old):
        if not os.path.exists(target_dir):
            os.rename(old, target_dir)
        else:
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
        if insert_only:
            merged = current.unionByName(
                dedup.join(current.select(*keys), keys, "left_anti")
            )
        else:
            merged = current.join(dedup.select(*keys), keys, "left_anti").unionByName(
                dedup
            )
    else:
        merged = dedup
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old)
    else:
        os.rename(tmp, target_dir)
