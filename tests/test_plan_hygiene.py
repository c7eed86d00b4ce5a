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

# --- r9 overflow audit (VERDICT r8 #2, class a) -------------------------
# sum(long * long) overflows silently past ~9.2e18: r8's
# w_pandas_zscore_outliers bug (cents² LONG sum, wraps at ~1e5 rows/group)
# is the class; the fix discipline is decimal(38,0) accumulation. This
# regex finds every sum/partial_sum over a product of two BARE LongType
# refs in the executed plan (decimal/double-cast operands don't match —
# they print as cast(x as ...)). Registry scan hits (r9): the three below,
# each provably safe because one operand is a small bounded value so the
# sum is O(const · rows) ≈ 1e13 at 100 TB fact scale, 5 orders of
# magnitude under LONG max. g_hits_two_rounds WAS a real exposure
# (Σ w·a1 ~ 1e20 at full scale) and now accumulates decimal(38,0).
_LONG_PRODUCT_SUM = __import__("re").compile(r"sum\(+\w+#\d+L \* \w+#\d+L\)")
_LONG_PRODUCT_OK = {
    # Σ quantity·count over the value-domain collapse = total quantity
    # (quantity ≤ 50 per row)
    "a_trimmed_mean_quantity",
    # Σ word_freq·symbols_per_word = corpus symbol count (nsym ≤ ~40)
    "text_bpe_one_merge_compression",
    "text_bpe_subword_stats",
}


# Deterministic rotating quarter per round (tests/rotation.py) so the
# driver's verify window can finish the suite; YDW_FULL_TESTS=1 runs all.
from tests.rotation import sample  # noqa: E402


@pytest.mark.parametrize("name", sample(REGISTRY))
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
    if name not in _LONG_PRODUCT_OK:
        m = _LONG_PRODUCT_SUM.findall(plan)
        assert not m, (
            f"{name} sums a long×long product {sorted(set(m))} — overflow "
            "risk past ~9.2e18; accumulate in decimal(38,0) or add a "
            "magnitude-bound justification to _LONG_PRODUCT_OK"
        )
