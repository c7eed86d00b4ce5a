"""Standing CI guard for the round-9 wrong-answer class: absolute-decimal
rounding below double resolution (VERDICT r9 #2a).

Executes EVERY registered oracle at sf0.01 on DuckDB (disk-cached — a
warm run costs seconds) and fails on any FLOAT output column whose
magnitude exceeds 1e12 without a recorded exact-integer or
sequential-accumulation justification (tools/magnitude_audit.ALLOWLIST).
A float rounded at absolute decimals past ~15-16 significant digits is
summation-order noise: it flips with executor count even though parity
passes on one box (the a_anova_weekday_revenue incident, SCALING.md).

No Spark session needed: the oracle emits the same columns as the engine,
so every exposed output is scanned on the DuckDB side alone.
"""

from __future__ import annotations

import duckdb
import pytest

from tools import magnitude_audit, oracle_cache
from tests.parity import duck_con
from yelpdatawarehouse_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_registry_floats_within_double_resolution():
    reg = all_queries()
    fp = oracle_cache.dataset_fingerprint(SF_DIR)
    con = duck_con(SF_DIR)
    problems: list[str] = []
    for name, qd in sorted(reg.items()):
        if qd.oracle is None:
            continue
        maxima = magnitude_audit.audited_maxima(con, name, qd.oracle, fp)
        problems.extend(magnitude_audit.violations(name, maxima))
    assert not problems, "\n".join(problems)


def test_allowlist_entries_still_registered():
    """An allowlist row for a renamed/removed query would silently stop
    guarding anything — require every entry to point at a live oracle."""
    reg = all_queries()
    for (name, _col), why in magnitude_audit.ALLOWLIST.items():
        assert name in reg and reg[name].oracle is not None, (
            f"ALLOWLIST entry {name} no longer registered with an oracle")
        assert why  # justification must be non-empty


def test_seeded_regression_is_red():
    """The guard must actually fire: a synthetic parallel-float-sum oracle
    at ~1e15 magnitude (the exact ANOVA shape) is flagged; the same value
    emitted in millions (the fix) passes; exact integers pass."""
    con = duckdb.connect()
    bad = magnitude_audit.float_column_maxima(
        con, "SELECT 1.23456789012345e15 AS ss, 'x' AS k")
    assert magnitude_audit.violations("seeded_bug", bad), (
        "seeded 1e15 float output was NOT flagged — the guard is dead")
    fixed = magnitude_audit.float_column_maxima(
        con, "SELECT 1.23456789012345e15 / 1e6 AS ss_millions")
    assert not magnitude_audit.violations("seeded_fix", fixed)
    exact = magnitude_audit.float_column_maxima(
        con, "SELECT CAST(2000000000000000 AS BIGINT) AS cnt")
    assert exact == {}  # integer column: not float-exposed, skipped


def test_seeded_float_array_is_scanned():
    """Nested float arrays are part of the exposed surface too."""
    con = duckdb.connect()
    arr = magnitude_audit.float_column_maxima(
        con, "SELECT [1.0, 5.5e14]::DOUBLE[] AS vals")
    assert magnitude_audit.violations("seeded_arr", arr)
