"""Registry-wide plan hygiene: every registered query's physical plan must
be free of the two scale-killers the pinned headline shapes
(test_plan_shapes.py) guard in detail — unconditional cartesian products
and accidental row-at-a-time Python evaluation.

This started life as the draft layer's pre-registration gate; round 6
promoted it to the whole registry when the drafts registered, so a future
edit that knocks ANY query off codegen (a lost Arrow batch path, an
expression that silently compiles to BatchEvalPython) or into a
CartesianProduct fails CI repo-wide, not just for headliners."""

from __future__ import annotations

import pytest

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries import all_queries

REGISTRY = all_queries()

# Queries whose WHOLE POINT is a Python-evaluation operator. Arrow-batched
# mapInPandas/applyInPandas (MapInPandas / FlatMapGroupsInPandas nodes) are
# not in the banned list at all — only the row-at-a-time / lateral-UDTF
# markers below need an explicit opt-in.
_PYTHON_OK = {"text_chunk_udtf"}

# Arrow-batched SCALAR pandas UDFs (ArrowEvalPython) — the documented fast
# Python path, allowed where the kernel is genuinely non-relational (the
# greedy BPE segmenter closure over the learned merge table). Row-at-a-time
# BatchEvalPython stays banned even for these.
_ARROW_OK = {"text_bpe_one_merge_compression", "text_bpe_subword_stats"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_has_no_scale_killers(spark, name):
    fn = REGISTRY[name].fn
    plan = fn(spark, SF_TEST_DIR)._jdf.queryExecution().executedPlan().toString()
    # A CartesianProduct node is an unconditional fact x fact blow-up;
    # deliberate 1-row/broadcast cross joins compile to
    # BroadcastNestedLoopJoin instead, which is allowed.
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _PYTHON_OK:
        markers = ("BatchEvalPython", "PythonUDTF") + (
            () if name in _ARROW_OK else ("ArrowEvalPython",)
        )
        for marker in markers:
            assert marker not in plan, f"{name} fell off codegen into {marker}"
