"""Round-6 draft queries must already pass the registry's oracle gate
(tests/parity.compare) so next round's registration is a move, not a build.
They are intentionally NOT in the registry yet — see drafts_r6 docstring."""

from __future__ import annotations

import pytest

from tests.parity import SF_TEST_DIR, compare
from yelpdatawarehouse_spark.queries.draft_layer import all_drafts

DRAFTS = all_drafts()


@pytest.mark.parametrize("name", sorted(DRAFTS))
def test_draft_matches_oracle(spark, name):
    fn, oracle = DRAFTS[name]
    df = fn(spark, SF_TEST_DIR)
    problems = compare(df, oracle, SF_TEST_DIR)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_drafts_not_registered(spark):
    """Window-protection invariant for round 5: drafts stay out of the
    registry until round 6 flips them on."""
    from yelpdatawarehouse_spark.queries import all_queries

    reg = all_queries()
    for name in DRAFTS:
        assert name not in reg
