"""The registry-sweep sampler (tests/rotation.py) must tile the registry:
four consecutive rounds cover every query exactly once, the slice is
deterministic, and YDW_FULL_TESTS=1 disables sampling entirely."""

from __future__ import annotations

import os
from unittest import mock

from tests.rotation import MOD, in_window, round_seq, sample
from yelpdatawarehouse_spark.queries import all_queries

REGISTRY = sorted(all_queries())


def test_four_rounds_tile_the_registry():
    seen: dict[str, int] = {}
    for seq in range(MOD):
        for n in REGISTRY:
            if in_window(n, seq):
                seen[n] = seen.get(n, 0) + 1
    assert set(seen) == set(REGISTRY)
    assert all(v == 1 for v in seen.values())


def test_window_is_deterministic_and_balanced():
    w0 = [n for n in REGISTRY if in_window(n, 0)]
    assert w0 == [n for n in REGISTRY if in_window(n, 0)]
    # md5 split: every quarter within 2x of the even share
    for seq in range(MOD):
        size = sum(in_window(n, seq) for n in REGISTRY)
        assert len(REGISTRY) / (2 * MOD) <= size <= 2 * len(REGISTRY) / MOD


def test_full_tests_env_disables_sampling():
    with mock.patch.dict(os.environ, {"YDW_FULL_TESTS": "1"}):
        assert round_seq() is None
        assert sample(REGISTRY) == REGISTRY


def test_seq_advances_with_round_records():
    seq = round_seq()
    assert isinstance(seq, int) and seq >= 13  # 13 committed rounds so far
