"""Targeted regressions for the round-4 ADVICE findings — each pins the
fixed behavior on an input CONSTRUCTED to hit the latent branch, which the
sf test corpora never exercise (that is what made the bugs latent).

1. ann_ivf_recall_eval / ann_recall_eval: a query-panel vector alone in
   its coarse cell / LSH bucket must still emit a row (n_candidates = 0),
   matching the oracle's correlated COUNT (llmops.py left-join+coalesce).
2. sources/tables.py events branch: table() must memoize the scan key so
   spread() skips the partition probe, same as every other table.
3. a_sketch_vocab_overlap's diag twin: the signed estimator error must be
   emitted and numerically consistent with the boolean envelope verdict.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.parity import SF_TEST_DIR


@pytest.fixture(scope="module")
def lone_cell_sf_dir(spark, tmp_path_factory):
    """A synthetic sf dir whose embeddings leave query vector 0 ALONE in
    its IVF cell: vec 0 is the e0 basis vector, every other vector sits
    in a tight cluster around e1, so assignment (max rounded cosine,
    ties to lower cid) puts 0 -> cell 0 with no co-members."""
    out = str(tmp_path_factory.mktemp("lone_cell"))
    # identical cluster vectors: centroids 1..7 tie at rounded cosine 1.0,
    # the tie-break sends every cluster member to cid 1 — one shared cell
    rows = [(0, [1.0, 0.0, 0.0, 0.0], 0)]
    for i in range(1, 16):
        rows.append((i, [0.0, 1.0, 0.0, 0.0], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def test_ivf_recall_eval_keeps_zero_candidate_queries(spark, lone_cell_sf_dir):
    from yelpdatawarehouse_spark.queries.llmops import ann_ivf_recall_eval

    rows = {r.query_id: r for r in ann_ivf_recall_eval(spark, lone_cell_sf_dir).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4], "every panel query must survive"
    lone = rows[0]
    assert lone.n_candidates == 0
    assert lone.hits == 0
    assert lone.recall_at_10 == 0.0
    # the clustered queries really do have candidates (cell 1 has 14 others)
    assert all(rows[q].n_candidates > 0 for q in (1, 2, 3, 4))


def test_lsh_recall_eval_panel_is_total(spark, lone_cell_sf_dir):
    from yelpdatawarehouse_spark.queries.llmops import ann_recall_eval

    rows = {r.query_id: r for r in ann_recall_eval(spark, lone_cell_sf_dir).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4], "every panel query must survive"
    for r in rows.values():
        assert r.n_candidates >= 0
        assert 0.0 <= r.recall_at_10 <= 1.0


def test_events_table_memoizes_scan_key(spark):
    from yelpdatawarehouse_spark.sources import tables as tb

    df = tb.table(spark, SF_TEST_DIR, "events")
    key = getattr(df, "_ydw_scan_key", None)
    assert key is not None, "events branch must set the memo key"
    tb._SCAN_PARTS.pop(key, None)
    tb.spread(df)
    assert key in tb._SCAN_PARTS, "spread() must memoize the partition probe"
    probed = tb._SCAN_PARTS[key]
    tb.spread(df)  # second call must reuse, not re-probe to a new value
    assert tb._SCAN_PARTS[key] == probed


def test_vocab_overlap_diag_err_consistent_with_envelope(spark):
    from yelpdatawarehouse_spark.queries.sketches import (
        sketch_vocab_overlap_diag,
    )

    rows = sketch_vocab_overlap_diag(spark, SF_TEST_DIR).collect()
    assert rows
    for r in rows:
        exact_union = r.exact_union
        # the boolean is DERIVED from the emitted signed error (2dp
        # canonicalization can sit on the 5% line, hence the tolerance)
        inside = abs(r.est_signed_err) <= 0.05 * exact_union + 0.005
        if r.inter_in_envelope:
            assert inside, f"flag says inside but err={r.est_signed_err}"


# ---------------------------------------------------------------------------
# Round-5 ADVICE items


def test_cms_fold_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-folded
    batch_id must not re-add its counters (the fold is associative but
    not idempotent — the pointer file's batch_id dedupe is what makes
    the exactly-once claim true)."""
    from yelpdatawarehouse_spark.operators.cms import cms_build, cms_merge
    from yelpdatawarehouse_spark.streaming.pipeline import (
        _fold_versioned,
        _read_state,
    )

    keys = spark.range(0, 50).select(F.col("id").alias("k"))
    delta = cms_build(keys, "k")
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)

    def fold(state):
        return delta if state is None else cms_merge(state, delta)

    _fold_versioned(spark, state_dir, 0, fold)
    first = {
        (r.seed, r.bucket): r.c for r in _read_state(spark, state_dir).collect()
    }
    _fold_versioned(spark, state_dir, 0, fold)  # replay: must no-op
    replayed = {
        (r.seed, r.bucket): r.c for r in _read_state(spark, state_dir).collect()
    }
    assert replayed == first, "replay of batch 0 double-counted"
    _fold_versioned(spark, state_dir, 1, fold)  # a NEW batch still folds
    second = {
        (r.seed, r.bucket): r.c for r in _read_state(spark, state_dir).collect()
    }
    assert second == {k: 2 * v for k, v in first.items()}


def test_gated_ingest_replay_moves_batch_across_destinations(spark, tmp_path):
    """If a batch's routing outcome changes between the original delivery
    and a replay (rule suite edited / data repaired), the replay must MOVE
    the batch, not leave a stale copy in the other destination."""
    import json

    from yelpdatawarehouse_spark.operators.quality import bounds
    from yelpdatawarehouse_spark.streaming.pipeline import run_gated_ingest

    src = tmp_path / "incoming"
    src.mkdir()
    with open(src / "chunk.json", "w") as fh:
        for i in range(10):
            fh.write(json.dumps({"k": i, "v": 100 + i}) + "\n")

    out_dir, quarantine = str(tmp_path / "out"), str(tmp_path / "quarantine")

    def run(rules, ckpt):
        stream = (
            spark.readStream.schema("k long, v long")
            .json(str(src))
        )
        q = run_gated_ingest(
            spark, stream, rules, out_dir, quarantine, str(tmp_path / ckpt)
        )
        q.awaitTermination(120)

    # Delivery 1: rule fails (v <= 50 violated) -> quarantine/batch_0.
    run([bounds("v_small", "v", hi=50)], "ckpt1")
    assert os.path.exists(os.path.join(quarantine, "batch_0"))
    # Replay with a repaired rule suite (fresh checkpoint re-delivers the
    # same data as batch_0): must land in out AND clear the quarantine copy.
    run([bounds("v_ok", "v", hi=500)], "ckpt2")
    assert os.path.exists(os.path.join(out_dir, "batch_0"))
    assert not os.path.exists(
        os.path.join(quarantine, "batch_0")
    ), "stale quarantine copy survived the replay — duplicated rows"


def test_rule_names_are_validated():
    """Rule names are interpolated into stack() SQL and used as metric
    keys: quotes/backticks and the reserved 'n_rows' must be rejected at
    construction, and an empty suite must raise instead of stack(0,)."""
    from yelpdatawarehouse_spark.operators.quality import Rule, check_rules

    for bad in ("it's", "a`b", "n_rows", "_n", "a-b", "", "1x"):
        with pytest.raises(ValueError):
            Rule(bad, F.lit(True))


def test_check_rules_empty_suite_raises(spark):
    from yelpdatawarehouse_spark.operators.quality import check_rules

    df = spark.range(3)
    with pytest.raises(ValueError):
        check_rules(df, [], unique_key=None)


def test_wav_encoder_rejects_non_integer_samples():
    """np.asarray(dtype=int64) silently truncates floats — the encoder
    must raise (struct.pack parity), not corrupt audio."""
    import struct

    from yelpdatawarehouse_spark.multimodal.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    with pytest.raises(struct.error):
        encode_wav_pcm16([1.5, 2.0, 3.25])
    with pytest.raises(struct.error):
        encode_wav_pcm16(["1", "2"])
    with pytest.raises(struct.error):
        encode_wav_pcm16([0, 40000])  # out of int16 range, still raises
    rate, samples = decode_wav_pcm16(encode_wav_pcm16([0, -5, 7]))
    assert samples == [0, -5, 7]
    assert encode_wav_pcm16([]) == encode_wav_pcm16([])  # empty OK


# --- round-6 ADVICE regressions ------------------------------------------


def test_exact_rank_operators_raise_on_null_keys(spark):
    """ADVICE r6 #3: NULL ranking keys would silently produce ANSI-
    divergent ranks (Spark NULLS FIRST vs DuckDB NULLS LAST). The guard
    embedded in __pid must fail loudly instead."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from yelpdatawarehouse_spark.operators.ranks import (
        exact_global_rank,
        exact_prefix_sum,
    )

    nullable = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "k int, v int"
    )
    with pytest.raises(SparkRuntimeException, match="NULL value in ranking key"):
        exact_global_rank(nullable, "k").collect()
    with pytest.raises(SparkRuntimeException, match="NULL value in ranking key"):
        exact_prefix_sum(nullable, "k", "v").collect()
    # non-null inputs are unaffected
    clean = spark.createDataFrame([(2, 10), (1, 20), (3, 5)], "k int, v int")
    got = {r.k: r.rank for r in exact_global_rank(clean, "k").collect()}
    assert got == {1: 1, 2: 2, 3: 3}
    ps = {r.k: r.prefix_sum for r in exact_prefix_sum(clean, "k", "v").collect()}
    assert ps == {1: 0, 2: 20, 3: 30}


def test_pareto_concentration_is_integer_exact(spark):
    """ADVICE r6 #1: the 80% boundary must be decided in integer cents.
    Constructed input sits the boundary EXACTLY on a customer edge:
    4 customers spending 100.00 each -> 0.8*total = 320.00 lands on the
    inclusive >= edge, so k must be exactly ceil(320/100) = 4... with a
    5th small spender, total=410, target=328 -> k=4 (3*100=300 < 328,
    4*100=400 >= 328; ceil((328-300)/100)=1, cnt_above=3)."""
    import os

    from yelpdatawarehouse_spark.queries.drafts_r9 import (
        a_pareto_8020_concentration,
    )

    rows = [(i, float(100.0), "1995-01-01") for i in range(4)]
    rows.append((4, 10.0, "1995-01-02"))
    sf = "/tmp/pareto_edge_sf"
    spark.createDataFrame(
        [(i, c, p, d) for i, (c, p, d) in enumerate(
            [(c, p, d) for c, p, d in rows]
        )],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "orders.parquet")
    )
    out = a_pareto_8020_concentration(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_customers == 5
    # total = 410.00 -> target 328.00 cents-exact; 3 customers above the
    # boundary value contribute 300 < 328; one more 100-spender crosses it
    assert r.n_top_customers == 4


# ---------------------------------------------------------------------------
# round-10 ADVICE regressions
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def empty_probe_sf_dir(spark, tmp_path_factory):
    """A synthetic sf dir where panel query 0's own SRP bucket AND its four
    1-bit-flip probe buckets contain no other vector — the sparse-corpus
    branch where the pre-fix INNER join dropped the query row entirely
    (r10 ADVICE #1)."""
    import hashlib

    from yelpdatawarehouse_spark.operators.ann import srp_planes

    planes = srp_planes(4, 64)

    def bucket(v):
        b = 0
        for p, plane in enumerate(planes):
            if sum(x * w for x, w in zip(v, plane)) >= 0:
                b |= 1 << p
        return b

    def vec(seed):
        # deterministic pseudo-vector from a seed (no RNG)
        return [((int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
                  % 2001) - 1000) / 1000.0 for i in range(64)]

    v0 = vec("probe-lone")
    probes0 = {bucket(v0) ^ m for m in (0, 1, 2, 4, 8)}
    others = []
    seed = 0
    while len(others) < 14:
        v = vec(f"bg-{seed}")
        seed += 1
        if bucket(v) not in probes0:
            others.append(v)
    rows = [(0, v0, 0)] + [(i + 1, v, 0) for i, v in enumerate(others)]
    out = str(tmp_path_factory.mktemp("empty_probe"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def test_multiprobe_recall_keeps_zero_candidate_queries(spark, empty_probe_sf_dir):
    """Engine must match the oracle's LEFT JOIN semantics: a panel query
    whose five probes all land in empty buckets still emits a row with
    n_candidates = 0 / hits = 0 / recall 0.0."""
    from yelpdatawarehouse_spark.queries.drafts_r13 import (
        ann_srp_multiprobe_recall,
    )

    rows = {r.query_id: r
            for r in ann_srp_multiprobe_recall(spark, empty_probe_sf_dir).collect()}
    assert 0 in rows, "zero-candidate panel query must survive (left join)"
    assert rows[0].n_candidates == 0
    assert rows[0].hits == 0
    assert rows[0].recall_at_10 == 0.0
    # the fixture really does exercise the branch: panel ids 1..7 sit in
    # populated buckets or at least exist as rows
    assert sorted(rows) == list(range(8))


def test_bare_probe_requires_names(tmp_path):
    """bare_probe with no query names must error (exit 2), not silently
    PASS having verified nothing (r10 ADVICE #2)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for argv in ([], ["--sf-dir", "/root/testdata/sf0.01"]):
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "bare_probe.py"), *argv],
            capture_output=True, text=True,
        )
        assert proc.returncode == 2
        assert "no query names" in proc.stderr


def test_oracle_cache_prune_removes_only_orphans(tmp_path, monkeypatch):
    """prune() deletes entries whose key matches no registered oracle and
    keeps live ones (r10 ADVICE #4)."""
    import gzip
    import hashlib

    from tools import oracle_cache
    from yelpdatawarehouse_spark.queries import all_queries

    fake_dir = str(tmp_path / "cache")
    os.makedirs(fake_dir)
    monkeypatch.setattr(oracle_cache, "_DIR", fake_dir)

    name, qd = next((n, q) for n, q in all_queries().items() if q.oracle)
    fp = oracle_cache.dataset_fingerprint("/root/testdata/sf0.001")
    live_key = hashlib.md5(f"{name}|{qd.oracle}|{fp}".encode()).hexdigest()
    with gzip.open(os.path.join(fake_dir, f"{live_key}.repr.gz"), "wt") as fh:
        fh.write("[['a'], []]")
    with gzip.open(os.path.join(fake_dir, "deadbeef00.repr.gz"), "wt") as fh:
        fh.write("[['x'], []]")
    with open(os.path.join(fake_dir, "magaudit-deadbeef.repr"), "w") as fh:
        fh.write("{}")

    removed = oracle_cache.prune(sf_dirs=["/root/testdata/sf0.001"])
    assert sorted(removed) == ["deadbeef00.repr.gz", "magaudit-deadbeef.repr"]
    assert os.listdir(fake_dir) == [f"{live_key}.repr.gz"]
