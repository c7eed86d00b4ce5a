"""Round-over-round long-tail drift radar: diff two REGISTRY_TIMES.json
snapshots (per-query sf0.01 single-pass wall-clock, written by
tools/full_parity.py) and flag queries whose time moved more than the
threshold in either direction.

    python tools/registry_drift.py                  # HEAD-committed vs working tree
    python tools/registry_drift.py OLD.json NEW.json
    DRIFT_RATIO=2.0 python tools/registry_drift.py

A flagged query with an UNCHANGED plan (PLANS.md / draft pins) is either
host noise (re-measure idle) or a silent physical-plan change inside an
unpinned subtree — both worth a look before the next scale-up.  Single-pass
sf0.01 numbers are noisy (sub-second queries swing 1.5-2x on load), so the
radar reports; humans classify.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DRIFT_RATIO = float(os.environ.get("DRIFT_RATIO", "1.5"))
MIN_SEC = float(os.environ.get("DRIFT_MIN_SEC", "0.3"))  # ignore micro-queries


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def load_git_head(path: str) -> dict | None:
    try:
        out = subprocess.run(
            ["git", "show", f"HEAD:{os.path.basename(path)}"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(path)) or ".",
        ).stdout
        return json.loads(out)
    except (subprocess.CalledProcessError, json.JSONDecodeError):
        return None


def diff(old: dict, new: dict, ratio: float = DRIFT_RATIO,
         min_sec: float = MIN_SEC) -> list[tuple[str, float, float, float]]:
    """Rows (name, old_s, new_s, ratio) where max(old,new) >= min_sec and
    the time moved by >= ratio in either direction; also surfaces queries
    present on only one side (ratio reported as 0/inf)."""
    ot, nt = old.get("times", old), new.get("times", new)
    rows = []
    for name in sorted(set(ot) | set(nt)):
        a, b = ot.get(name), nt.get(name)
        if a is None or b is None:
            rows.append((name, a or 0.0, b or 0.0, float("inf") if a is None else 0.0))
            continue
        if max(a, b) < min_sec or min(a, b) <= 0:
            continue
        r = b / a
        if r >= ratio or r <= 1 / ratio:
            rows.append((name, a, b, r))
    return rows


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cur = os.path.join(root, "REGISTRY_TIMES.json")
    if len(sys.argv) == 3:
        old, new = load(sys.argv[1]), load(sys.argv[2])
        src = f"{sys.argv[1]} -> {sys.argv[2]}"
    else:
        old, new = load_git_head(cur), load(cur)
        src = "HEAD:REGISTRY_TIMES.json -> working tree"
        if old is None:
            print("no committed REGISTRY_TIMES.json to diff against")
            return 0
    rows = diff(old, new)
    print(f"registry drift ({src}; threshold x{DRIFT_RATIO}, "
          f"min {MIN_SEC}s; {len(new.get('times', new))} queries)")
    if not rows:
        print("no drift above threshold")
        return 0
    for name, a, b, r in sorted(rows, key=lambda t: -t[3]):
        print(f"  {name}: {a:.2f}s -> {b:.2f}s  (x{r:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
