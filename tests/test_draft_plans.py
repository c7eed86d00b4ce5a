"""Plan hygiene for the draft layer: before a draft ever reaches the
registry, its physical plan must already be free of the scale-killers the
headline suite guards against (test_plan_shapes.py) — unpartitioned
cartesian products and accidental Python evaluation."""

from __future__ import annotations

import pytest

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries.draft_layer import all_drafts

DRAFTS = all_drafts()

# The one draft whose WHOLE POINT is the Python path (lateral UDTF).
_PYTHON_OK = {"text_chunk_udtf"}


@pytest.mark.parametrize("name", sorted(DRAFTS))
def test_draft_plan_has_no_scale_killers(spark, name):
    fn, _ = DRAFTS[name]
    plan = fn(spark, SF_TEST_DIR)._jdf.queryExecution().executedPlan().toString()
    # A CartesianProduct node is an unconditional fact x fact blow-up;
    # deliberate 1-row/broadcast cross joins compile to
    # BroadcastNestedLoopJoin instead, which is allowed.
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _PYTHON_OK:
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDTF"):
            assert marker not in plan, f"{name} fell off codegen into {marker}"
