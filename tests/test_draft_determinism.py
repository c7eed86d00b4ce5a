"""Cross-partitioning determinism for the DRAFT layer: the same sweep
test_determinism.py runs over the registry (re-execute under a different
shuffle-partition count, demand the identical canonical result), applied
BEFORE registration — so a partition-order-dependent draft is caught in
the round it is written, not by a flaky driver check after it ships."""

from __future__ import annotations

import pytest

from tests.parity import SF_TEST_DIR
from tests.test_determinism import _canon, _same
from yelpdatawarehouse_spark.queries.draft_layer import all_drafts

DRAFTS = all_drafts()


@pytest.mark.parametrize("name", sorted(DRAFTS))
def test_draft_rerun_is_identical(spark, name):
    fn, _ = DRAFTS[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    cols1, rows1 = _canon(fn(spark, SF_TEST_DIR))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        cols2, rows2 = _canon(fn(spark, SF_TEST_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert cols1 == cols2, f"{name}: column set changed"
    assert len(rows1) == len(rows2), f"{name}: row count changed"
    for a, b in zip(rows1, rows2):
        assert _same(a, b), f"{name}: row diverged: {a} vs {b}"
