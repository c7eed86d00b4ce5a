"""Differential check of the prefix-filter set-similarity join against an
independent pure-Python brute-force model on RANDOM corpora — the suite's
model-twin pattern (test_cms_properties.py): the DuckDB oracle proves
Spark ≡ SQL on the fixed corpus; this proves the prefix pruning loses no
qualifying pair on adversarially small, collision-heavy inputs where the
pigeonhole bound is actually exercised (tiny alphabet → heavy token
sharing → near-threshold Jaccard values)."""

from __future__ import annotations

import math
import os
import re
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from yelpdatawarehouse_spark.queries.drafts_r6 import (
    PPJ_MOD,
    PPJ_TAU,
    dedup_prefix_filter_jaccard,
)

_WORDS = ["a", "b", "c", "d", "e", "f"]  # tiny alphabet forces overlap

_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join)
# doc_ids: mostly on the PPJ_MOD slice, some off it (the model must skip those)
_corpus = st.lists(_doc, min_size=2, max_size=10)


def _r6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def _expected(texts: list[str]) -> dict:
    sets = {
        i * PPJ_MOD: set(re.split(r"\s+", t))
        for i, t in enumerate(texts)
        if i % 2 == 0  # odd positions get off-slice ids below
    }
    out = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union
            if j >= PPJ_TAU:
                out[(a, b)] = _r6(j)
    return out


@settings(max_examples=6, deadline=None)
@given(_corpus)
def test_prefix_filter_equals_bruteforce_on_random_corpora(spark, texts):
    rows = []
    for i, t in enumerate(texts):
        # even positions land on the doc_id % PPJ_MOD == 0 slice the
        # operator keeps; odd positions get ids the slice must EXCLUDE
        doc_id = i * PPJ_MOD if i % 2 == 0 else i * PPJ_MOD + 1
        rows.append((doc_id, t))
    out = tempfile.mkdtemp(prefix="ppj_prop_")
    try:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup_prefix_filter_jaccard(spark, out).collect()
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
    assert got == _expected(texts)
