"""Focused tests for the round-13 optimization-round internals changes.

Each test pins the EQUIVALENCE argument an optimization relied on, so a
future edit that breaks the assumption fails loudly:

* ``min_label_components`` now composes neighbor-min with a pointer-jump
  (label-of-label) step and carries convergence as a ``changed`` flag —
  the fixpoint must still be "min reachable node id", including on path
  graphs (the worst case for plain propagation, where the jump does the
  heavy lifting) and within the SAME max_rounds budget.
* The multimodal encode→decode queries now COMPOSE their two batch
  kernels inside one mapInPandas worker; the composition must be
  row-identical to running the kernels as two separate stages.
* ``a_approx_distinct_check`` aggregates the HLL over pre-deduplicated
  (group, key) pairs — valid only because an HLL sketch is a set
  function (duplicates cannot move its registers).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.graph import min_label_components


def _cc(spark, edges, max_rounds=15):
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src LONG, dst LONG")
    rows = min_label_components(df, max_rounds=max_rounds).collect()
    return {int(r["node"]): int(r["label"]) for r in rows}


def test_min_label_path_graph(spark):
    # 0-1-2-...-9 chain: plain neighbor-min needs ~9 rounds; the pointer
    # jump must converge inside the same 15-round budget with every node
    # labelled by the chain minimum.
    labels = _cc(spark, [(i, i + 1) for i in range(9)])
    assert labels == {i: 0 for i in range(10)}


def test_min_label_two_components_and_cycle(spark):
    labels = _cc(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_min_label_long_path_tight_budget(spark):
    # 33-node chain: diameter 32 >> 15 rounds — only the O(log) pointer
    # jumping converges inside the default budget.
    labels = _cc(spark, [(i, i + 1) for i in range(32)])
    assert labels == {i: 0 for i in range(33)}


def test_min_label_schema_has_no_loop_columns(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src LONG, dst LONG")
    assert min_label_components(df).columns == ["node", "label"]


def _batches(pdf, n=3):
    for i in range(0, len(pdf), n):
        yield pdf.iloc[i : i + n].reset_index(drop=True)


def test_image_kernel_composition_matches_two_stage():
    from yelpdatawarehouse_spark.multimodal.columns import image_features_kernel
    from yelpdatawarehouse_spark.multimodal.png import encode_png_gray

    payloads = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 5, 12],
            "payload": [
                encode_png_gray(4 + d % 13, 4 + d % 7, bytes([d % 256]) * ((4 + d % 13) * (4 + d % 7)))
                for d in [0, 1, 2, 5, 12]
            ],
        }
    )
    two_stage = pd.concat(list(image_features_kernel()(_batches(payloads))), ignore_index=True)
    composed = pd.concat(
        list(image_features_kernel()(iter([payloads]))), ignore_index=True
    ).sort_values("doc_id", ignore_index=True)
    assert two_stage.sort_values("doc_id", ignore_index=True).equals(composed)
    # and the decode is REAL: dimensions follow the arithmetic contract
    for _, r in composed.iterrows():
        d = int(r["doc_id"])
        assert (r["width"], r["height"]) == (4 + d % 13, 4 + d % 7)


def test_audio_kernel_composition_matches_two_stage():
    import numpy as np

    from yelpdatawarehouse_spark.multimodal.wav import (
        audio_features_kernel,
        encode_wav_pcm16,
    )

    def payload(d):
        n = 32 + d % 97
        samples = ((d * 37 + np.arange(n, dtype=np.int64) * 25) % 256 - 128) * 64
        return encode_wav_pcm16(samples, sample_rate=8000)

    pdf = pd.DataFrame({"doc_id": [0, 3, 7, 40], "payload": [payload(d) for d in [0, 3, 7, 40]]})
    a = pd.concat(list(audio_features_kernel()(_batches(pdf, 2))), ignore_index=True)
    b = pd.concat(list(audio_features_kernel()(iter([pdf]))), ignore_index=True)
    assert a.sort_values("doc_id", ignore_index=True).equals(
        b.sort_values("doc_id", ignore_index=True)
    )
    assert (a["sample_rate"] == 8000).all()
    assert (a["n_samples"].to_numpy() == (32 + a["doc_id"].to_numpy() % 97)).all()


def test_pq_arrow_codes_match_expression_encode(spark):
    # encode_codes_arrow (numpy matmul argmin) must produce EXACTLY the
    # codes of the expression path (HOF-dot argmin, ties to lower cid)
    # for every vector — the equivalence the ADC queries rely on.
    import numpy as np

    from yelpdatawarehouse_spark.operators.pq import train_pq

    rng = [(i, [float(((i * 37 + j * 13) % 29) - 14) / 7.0 for j in range(16)])
           for i in range(60)]
    emb = spark.createDataFrame(rng, "vec_id LONG, embedding ARRAY<DOUBLE>")
    model = train_pq(emb, m=4, k=5, max_iters=0)
    expr = {r["vec_id"]: list(r["codes"])
            for r in model.encode(emb).select("vec_id", "codes").collect()}
    arrow = {r["vec_id"]: list(r["codes"])
             for r in model.encode_codes_arrow(emb).collect()}
    assert expr == arrow and len(arrow) == 60


def test_pq_arrow_codes_empty_model(spark):
    from yelpdatawarehouse_spark.operators.pq import PQModel

    empty = PQModel(m=4, dim=0, codebooks=[{} for _ in range(4)])
    emb = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<DOUBLE>")
    assert empty.encode_codes_arrow(emb).count() == 0


def test_hll_is_a_set_function(spark):
    # The a_approx_distinct_check rewrite feeds the HLL deduplicated
    # (group, key) pairs; the sketch value must be bit-identical to the
    # duplicated-input form for ANY input multiset.
    rows = [(g, k) for g in ("A", "B") for k in range(50) for _ in range(1 + k % 3)]
    df = spark.createDataFrame(rows, "g STRING, k LONG")
    dup = {
        r["g"]: r["h"]
        for r in df.groupBy("g").agg(F.approx_count_distinct("k", 0.01).alias("h")).collect()
    }
    dedup = {
        r["g"]: r["h"]
        for r in df.distinct()
        .groupBy("g")
        .agg(F.approx_count_distinct("k", 0.01).alias("h"))
        .collect()
    }
    assert dup == dedup
