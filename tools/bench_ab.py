"""Controlled same-box bench A/B: current tree vs a prior git ref.

Tool form of the interleaved close-out comparison the round-10 builder ran
by hand (judge r10 brief #5). Host throughput on this box drifts ±13%
between days (measured: r9's own code read 97.4–111.6 s against its
committed 92.39 s record), so a raw round-over-round headline delta cannot
distinguish regression from weather. The discriminating experiment is to
run BOTH trees NOW, interleaved A/B/A/B so load noise hits them equally,
and compare them to each other.

    python tools/bench_ab.py <ref>            # e.g. a prior round's commit
    python tools/bench_ab.py <ref> --rounds 3 # more interleaved passes
    python tools/bench_ab.py <ref> --no-md    # don't append to SCALING.md

Run it whenever the committed idle headline moves >1.15x round-over-round.
Each pass is one full `python bench.py` invocation (itself min-of-2 per
query); the comparison is on the queries PRESENT IN BOTH detail maps
(headlines grow between rounds), min across passes per tree. Appends the
result table to SCALING.md and prints one JSON line.

The prior tree runs from a detached `git worktree` (no checkout churn in
the working tree); the current tree's BENCH_DETAIL.json is snapshotted and
restored so the A/B never clobbers the committed idle record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str) -> dict[str, float]:
    """One bench.py pass in `tree`; returns the per-query detail map."""
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, capture_output=True, text=True,
        check=True,
    )
    detail = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except ValueError:
                continue  # brace-prefixed log noise, not the detail line
            if isinstance(obj, dict) and obj.get("detail") == "per_query_sec":
                detail = obj["queries"]
    if detail is None:
        raise RuntimeError(f"bench.py in {tree} printed no detail line:\n"
                           f"{out.stdout[-2000:]}")
    return detail


def ab(ref: str, rounds: int = 2) -> dict:
    wt = tempfile.mkdtemp(prefix="ydw_ab_")
    subprocess.run(["git", "worktree", "add", "--detach", wt, ref],
                   cwd=ROOT, check=True, capture_output=True)
    snap_path = os.path.join(ROOT, "BENCH_DETAIL.json")
    snapshot = open(snap_path).read() if os.path.exists(snap_path) else None
    cur_passes: list[dict[str, float]] = []
    ref_passes: list[dict[str, float]] = []
    try:
        for i in range(rounds):
            # interleave: load noise within a pass hits both trees alike
            cur_passes.append(run_bench(ROOT))
            print(f"pass {i + 1}: current  "
                  f"{sum(cur_passes[-1].values()):.1f}s "
                  f"({len(cur_passes[-1])} queries)", flush=True)
            ref_passes.append(run_bench(wt))
            print(f"pass {i + 1}: {ref[:9]:9s} "
                  f"{sum(ref_passes[-1].values()):.1f}s "
                  f"({len(ref_passes[-1])} queries)", flush=True)
    finally:
        if snapshot is not None:
            with open(snap_path, "w") as fh:
                fh.write(snapshot)
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=ROOT, capture_output=True)
    common = sorted(set.intersection(*[set(p) for p in cur_passes + ref_passes]))
    cur_min = {q: min(p[q] for p in cur_passes) for q in common}
    ref_min = {q: min(p[q] for p in ref_passes) for q in common}
    cur_spans = [sum(p[q] for q in common) for p in cur_passes]
    ref_spans = [sum(p[q] for q in common) for p in ref_passes]
    cur_total, ref_total = sum(cur_min.values()), sum(ref_min.values())
    movers = sorted(
        ((q, cur_min[q], ref_min[q], cur_min[q] / ref_min[q])
         for q in common if ref_min[q] > 0),
        key=lambda t: -t[3],
    )[:5]
    return {
        "ref": ref,
        "rounds": rounds,
        "n_common": len(common),
        "current_total_minof_sec": round(cur_total, 2),
        "ref_total_minof_sec": round(ref_total, 2),
        "ratio_current_over_ref": round(cur_total / ref_total, 3) if ref_total else None,
        "current_pass_spans_sec": [round(s, 1) for s in cur_spans],
        "ref_pass_spans_sec": [round(s, 1) for s in ref_spans],
        "top_movers": [
            {"query": q, "cur_s": round(a, 2), "ref_s": round(b, 2),
             "ratio": round(r, 2)} for q, a, b, r in movers
        ],
    }


def append_md(res: dict) -> None:
    md = os.path.join(ROOT, "SCALING.md")
    lines = [
        "",
        f"## Bench A/B vs {res['ref']} (tools/bench_ab.py, interleaved "
        f"min-of-{res['rounds']}, {res['n_common']} common queries)",
        "",
        "| tree | pass spans (s) | min-of total (s) |",
        "|---|---|---|",
        f"| current | {', '.join(str(s) for s in res['current_pass_spans_sec'])} "
        f"| {res['current_total_minof_sec']} |",
        f"| {res['ref']} | {', '.join(str(s) for s in res['ref_pass_spans_sec'])} "
        f"| {res['ref_total_minof_sec']} |",
        "",
        f"Ratio current/ref on the common set: "
        f"**{res['ratio_current_over_ref']}x**. Top movers: "
        + "; ".join(f"{m['query']} x{m['ratio']}" for m in res["top_movers"])
        + ".",
    ]
    with open(md, "a") as fh:
        fh.write("\n".join(lines) + "\n")


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Interleaved same-box bench A/B: current tree vs a git ref")
    ap.add_argument("ref", help="prior git ref (e.g. a round commit)")
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved passes per tree (default 2)")
    ap.add_argument("--no-md", action="store_true",
                    help="don't append the result table to SCALING.md")
    ns = ap.parse_args()
    res = ab(ns.ref, rounds=ns.rounds)
    if not ns.no_md:
        append_md(res)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
