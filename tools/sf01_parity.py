"""Oracle-parity sweep at sf0.1 — value correctness AT SCALE.

The per-round gates verify values at sf0.001 (pytest) and sf0.01 (the
driver); this tool runs the same DuckDB-oracle comparison at sf0.1, where
scale-only bugs live. Its first run (round 8) caught two real ones the
smaller gates could not see:

* ``w_pandas_zscore_outliers`` — LONG overflow in a cents² sum once a
  group passed ~1e5 rows;
* ``exact_prefix_sum`` — nondeterministic ``spark_partition_id`` read by
  two consumers under AQE, silently corrupting chained prefix sums
  (surfaced as a wrong pareto boundary).

Coverage (round 9, VERDICT r8 #1): every run sweeps the full bench
HEADLINE **plus a rotating window of the registry tail** (default 60
queries, oldest-checked first, tracked in SF01_TAIL_STATE.json) — so the
~175 non-headline queries get sf0.1 value evidence on a ~3-round cycle
instead of never. DuckDB oracle results are cached on disk keyed by
(name, SQL, dataset content hash) — see tools/oracle_cache.py — so the
two ~450 s recursive-CTE oracles and the rest are paid once; warm re-runs
cost roughly engine time.

Writes SF01_PARITY.json at the repo root:
    {"results": {headline name: "OK"|first-mismatch},
     "tail_results": {tail name: ...}, "n_fail": total}

    python tools/sf01_parity.py                 # headline + next tail window
    SF01_MODE=headline python tools/sf01_parity.py
    SF01_MODE=tail SF01_TAIL_N=80 python tools/sf01_parity.py
    SF01_SKIP=g_hits_two_rounds python tools/sf01_parity.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF01_PARITY_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_PATH = os.path.join(ROOT, "SF01_TAIL_STATE.json")


def _load_state() -> dict:
    if os.path.exists(STATE_PATH):
        with open(STATE_PATH) as fh:
            return json.load(fh)
    return {"seq": 0, "checked": {}}


def _pick_tail(registry_names, headline, state, n: int) -> list[str]:
    tail = sorted(set(registry_names) - set(headline))
    checked = state["checked"]
    # never-checked first (-1), then stalest; name tiebreak for determinism
    tail.sort(key=lambda name: (checked.get(name, -1), name))
    return tail[:n]


def _compare_cached(name, fn, osql, spark, fingerprint):
    """compare() with the oracle half served from the disk cache."""
    from tests.parity import compare_with_canon, oracle_canon
    from tools import oracle_cache

    cached = oracle_cache.get(name, osql, fingerprint)
    if cached is None:
        ocols, o_canon = oracle_canon(osql, SF)
        oracle_cache.put(name, osql, fingerprint, ocols, o_canon)
        hit = False
    else:
        ocols, o_canon = cached
        hit = True
    return compare_with_canon(fn(spark, SF), ocols, o_canon), hit


def main() -> int:
    from tools import oracle_cache
    from tools.plan_report import HEADLINE

    import __spark_entry__ as E
    from yelpdatawarehouse_spark.queries import all_queries
    from yelpdatawarehouse_spark.session import get_spark

    mode = os.environ.get("SF01_MODE", "all")
    tail_n = int(os.environ.get("SF01_TAIL_N", "60"))
    skip = {n for n in os.environ.get("SF01_SKIP", "").split(",") if n}

    spark = get_spark(app_name="sf01-parity")
    spark.sparkContext.setLogLevel("ERROR")
    reg, osql = all_queries(), E.oracle_sql()
    fingerprint = oracle_cache.dataset_fingerprint(SF)

    state = _load_state()
    state["seq"] += 1
    seq = state["seq"]

    plan: list[tuple[str, str]] = []
    if mode in ("all", "headline"):
        plan += [("headline", n) for n in HEADLINE]
    tail_names: list[str] = []
    if mode in ("all", "tail"):
        tail_names = _pick_tail(reg.keys(), HEADLINE, state, tail_n)
        plan += [("tail", n) for n in tail_names]
    if mode == "names":  # explicit list, e.g. a fresh registration batch
        tail_names = [n for n in os.environ.get("SF01_NAMES", "").split(",") if n]
        unknown = [n for n in tail_names if n not in reg]
        if unknown:
            raise SystemExit(f"not registered: {unknown}")
        plan += [("tail", n) for n in tail_names]

    import gc

    results: dict[str, str] = {}
    tail_results: dict[str, str] = {}
    n_fail = n_hit = 0
    for i, (kind, name) in enumerate(plan, start=1):
        # release prior queries' localCheckpoint blocks (bench.py's r8
        # lesson: pinned blocks accumulate in executor storage across a
        # long sweep and degrade later queries)
        gc.collect()
        bucket = results if kind == "headline" else tail_results
        if name in skip:
            bucket[name] = "SKIPPED"
            continue
        t0 = time.perf_counter()
        try:
            if name in osql:
                errs, hit = _compare_cached(name, reg[name].fn, osql[name],
                                            spark, fingerprint)
            else:  # rows-only queries (no oracle) just have to run
                reg[name].fn(spark, SF).collect()
                errs, hit = [], False
            n_hit += hit
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            errs, hit = [f"EXC {str(ex)[:200]}"], False
        dt = time.perf_counter() - t0
        bucket[name] = "OK" if not errs else errs[0][:300]
        n_fail += bool(errs)
        if not errs and kind == "tail":
            state["checked"][name] = seq
        print(f"[{i}/{len(plan)}] {kind[0]} {name}: "
              f"{'OK' if not errs else 'FAIL'} ({dt:.1f}s"
              f"{', cache' if hit else ''})", flush=True)

    # MERGE into the existing record rather than overwrite: a tail-only
    # run must not blank the headline section (and vice versa) — the file
    # accumulates the registry-wide sf0.1 picture across rotating windows
    out_path = os.path.join(ROOT, "SF01_PARITY.json")
    merged_results, merged_tail = {}, {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as fh:
                prev = json.load(fh)
            merged_results = dict(prev.get("results", {}))
            merged_tail = dict(prev.get("tail_results", {}))
        except (json.JSONDecodeError, OSError):
            pass
    merged_results.update(results)
    merged_tail.update(tail_results)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": SF, "mode": mode, "n": len(plan),
                   "n_fail": n_fail, "oracle_cache_hits": n_hit,
                   "results": merged_results, "tail_window": tail_names,
                   "tail_results": merged_tail}, fh, indent=1)
    with open(STATE_PATH, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    print(f"failures: {n_fail}, cache hits: {n_hit}/{len(plan)} "
          f"-> SF01_PARITY.json")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
