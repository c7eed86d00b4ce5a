"""Declarative data-quality checks: a rule suite evaluated in ONE scan.

The production gate every large-scale ingestion pipeline runs before
publishing a batch (the pattern popularized by Deequ / Great
Expectations): completeness (NULL rate), domain membership, value
bounds, key uniqueness, referential integrity — declared as named rules,
returned as a (rule, n_rows, n_violations, passed) report.

Scale contract:

* **Row-level rules share one pass.** Every predicate rule becomes a
  conditional SUM in a single global aggregate — one scan, map-side
  partial merge, no per-rule jobs. Adding a rule adds a column to the
  aggregate, not a pass over 100 TB.
* **Uniqueness** rides the same aggregate as ``count(*) -
  count(distinct key)``. Exact distinct inside a multi-aggregate uses
  Spark's expand path (documented cost: one extra exchange on the key);
  at extreme cardinality swap in approx_count_distinct via the
  ``unique_approx`` rule kind — same report shape, sketch memory.
* **Referential integrity** is a LEFT ANTI join against the referenced
  key set (broadcast when the dimension is small, shuffle otherwise —
  Catalyst/AQE decides), counted — the only rule kind that needs a
  second input, and the only one with its own exchange.

The report is exact arithmetic over counts, so a SQL oracle can
reproduce it bit-for-bit (see the ``diag_quality_report`` draft).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Rule names are interpolated into a stack() SQL expression and become
# report/observation metric keys, so they must be safe identifiers and
# must not collide with the reserved row-count metric.
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_RESERVED = frozenset({"n_rows", "_n"})


def _validate_rule_name(name: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(
            f"rule name {name!r} is not a safe identifier "
            "([A-Za-z_][A-Za-z0-9_]*) — it would be interpolated into SQL"
        )
    if name in _RESERVED:
        raise ValueError(
            f"rule name {name!r} is reserved (the row-count metric); "
            "pick another name"
        )
    return name


@dataclass(frozen=True)
class Rule:
    """A named row-level predicate: rows where ``cond`` is FALSE or NULL
    count as violations (NULL-hostile on purpose — an unknown is not a
    pass). Names must match ``[A-Za-z_][A-Za-z0-9_]*`` and may not be the
    reserved metric name ``n_rows``/``_n`` (enforced at construction —
    they are interpolated into a stack() expression and used as
    observation metric keys)."""

    name: str
    cond: Column

    def __post_init__(self) -> None:
        _validate_rule_name(self.name)


def not_null(name: str, col: str) -> Rule:
    return Rule(name, F.col(col).isNotNull())


def in_set(name: str, col: str, allowed: tuple) -> Rule:
    return Rule(name, F.col(col).isin(list(allowed)))


def bounds(name: str, col: str, lo=None, hi=None) -> Rule:
    c = F.col(col)
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (c >= lo)
    if hi is not None:
        cond = cond & (c <= hi)
    return Rule(name, cond)


def check_rules(
    df: DataFrame,
    rules: list[Rule],
    unique_key: str | None = None,
) -> DataFrame:
    """Evaluate all rules in one aggregate; returns one row per rule:
    (rule STRING, n_rows BIGINT, n_violations BIGINT, passed BOOLEAN).

    Raises ValueError on an empty suite (no rules AND no unique_key) —
    stack(0) is not valid SQL, and a silent empty report would read as
    "all checks passed" to a gate."""
    if not rules and unique_key is None:
        raise ValueError("check_rules needs at least one rule or a unique_key")
    aggs = [F.count("*").alias("_n")]
    for r in rules:
        aggs.append(
            F.sum(
                F.when(F.coalesce(r.cond, F.lit(False)), 0).otherwise(1)
            ).alias(r.name)
        )
    if unique_key is not None:
        aggs.append(
            (F.count(unique_key) - F.count_distinct(F.col(unique_key))).alias(
                f"unique_{unique_key}"
            )
        )
    wide = df.agg(*aggs)
    names = [r.name for r in rules] + (
        [f"unique_{unique_key}"] if unique_key is not None else []
    )
    stack = F.expr(
        "stack({n}, {pairs}) AS (rule, n_violations)".format(
            n=len(names),
            pairs=", ".join(f"'{n}', `{n}`" for n in names),
        )
    )
    return wide.select(F.col("_n"), stack).select(
        F.col("rule"),
        F.col("_n").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def check_referential(
    name: str,
    df: DataFrame,
    fk: str,
    dim: DataFrame,
    pk: str,
) -> DataFrame:
    """Referential-integrity rule as the same report shape: count of
    ``df`` rows whose ``fk`` has no match in ``dim.pk`` (NULL fks are
    orphans too — left anti keeps them)."""
    total = df.agg(F.count("*").alias("n_rows"))
    orphans = df.join(
        dim.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    ).agg(F.count("*").alias("n_violations"))
    return (
        total.crossJoin(F.broadcast(orphans))
        .select(
            F.lit(name).alias("rule"),
            F.col("n_rows").cast("long"),
            F.col("n_violations").cast("long"),
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union rule-report fragments into one report table."""
    return reduce(lambda a, b: a.unionByName(b), parts)


def observe_rules(df: DataFrame, rules: list[Rule], name: str = "quality"):
    """The ZERO-extra-pass variant of :func:`check_rules`: attach the rule
    suite as an ``Observation`` so the violation counts are computed as a
    side effect of whatever action next consumes ``df`` — typically the
    ingestion WRITE itself. At 100 TB this is the difference between
    "write the batch, then rescan it to audit" and "the write IS the
    audit": observed metrics are accumulated per task during the write
    and merged on the driver, costing nothing but a few counters.

    Returns ``(observed_df, observation)``; after an action runs on
    ``observed_df``, ``observation.get`` yields ``{"n_rows": ...,
    "<rule>": violations, ...}`` with EXACTLY the numbers check_rules
    would report (pinned by tests/test_quality.py).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for r in rules:
        aggs.append(
            F.sum(
                F.when(F.coalesce(r.cond, F.lit(False)), 0).otherwise(1)
            ).alias(r.name)
        )
    return df.observe(obs, *aggs), obs
