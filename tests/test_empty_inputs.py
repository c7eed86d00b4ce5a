"""Empty-input robustness: every registered query must plan and execute
against ZERO-row tables without raising.

At 100 TB this is not a corner case — date-partition pruning, a dead
upstream, or a filter that eliminates a whole split routinely hands an
operator empty input, and an engine whose window/aggregate/collect paths
assume ≥1 row fails at 3 a.m., not in review. Every query here runs over
schema-identical empty parquet tables; the assertion is "no exception and
a well-formed (possibly empty) result", plus spot checks that global
aggregates degrade to their documented zero-row forms.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.sources.tables import TABLES

SF = "/root/testdata/sf0.001"

# Queries whose contract REQUIRES data and says so in their docstring:
# k-means seeds centroids from the first K vectors (collect of an empty
# index is a documented precondition failure, not a crash path we hide).
_REQUIRES_DATA: set[str] = set()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Schema-identical 0-row twins of every testdata table."""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = pq.read_schema(os.path.join(SF, f"{t}.parquet"))
        pq.write_table(src.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def registry():
    return all_queries()


def test_every_query_survives_empty_input(spark, empty_sf_dir, registry):
    failures = []
    for name, qd in registry.items():
        if name in _REQUIRES_DATA:
            continue
        try:
            rows = qd.fn(spark, empty_sf_dir).collect()
            assert isinstance(rows, list)
        except Exception as e:  # noqa: BLE001 - collecting a full report
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
    assert not failures, "queries crashing on empty input:\n" + "\n".join(failures)


def test_global_aggregates_zero_row_forms(spark, empty_sf_dir, registry):
    """Ungrouped aggregates must yield their documented zero-row form
    (COUNT 0 / SUM NULL), not an error or a missing row."""
    rows = registry["a1_global_counts"].fn(spark, empty_sf_dir).collect()
    assert len(rows) == 5  # one COUNT(*) row per table, all zero
    assert all(r["row_cnt"] == 0 for r in rows)
