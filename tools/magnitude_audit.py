"""Registry-wide FLOAT-magnitude audit (standing CI form of the round-9
one-off, SCALING.md "absolute rounding below double resolution").

The wrong-answer class: a PARALLEL float aggregate of magnitude ~1e15,
rounded at 2 ABSOLUTE decimals, rounds at the ~17th significant digit —
below a double's 15-16-digit resolution — so the rounded digit is pure
summation-order noise and flips with executor count (caught live on
`a_anova_weekday_revenue` by a bare local[8] probe after it had passed
parity on local[16]).

Rule (SCALING.md): a FLOAT output with |v| > 1e12 is legitimate ONLY when
it is (a) exact-integer-derived (decimal/long arithmetic presented as
float), or (b) sequentially accumulated (ordered single-partition window —
both engines add in the identical order). Everything else must round
relative to magnitude (emit millions, ratios, or log-scale).

This module scans ORACLE results (DuckDB at sf0.01): the oracle emits the
same columns as the engine, so any exposed column shows up here without
paying a Spark session. Per-oracle results are cached on disk keyed by
md5(name | sql | dataset fingerprint) — same invalidation discipline as
tools/oracle_cache.py.
"""

from __future__ import annotations

import ast
import hashlib
import math
import os

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".oracle_cache")

THRESHOLD = 1e12

# (query name, column) -> why an over-threshold float output is safe.
# Additions require the SCALING.md justification discipline: exact-integer
# derivation or sequential (ordered single-partition) accumulation.
ALLOWLIST: dict[tuple[str, str], str] = {
    ("t29_binary_segmentation_split", "sse_reduction"): (
        "sums ride an ORDERED single-partition cumulative window (the "
        "ADVICE-r6 sequential-cumsum discipline) — both engines accumulate "
        "in the identical order, bit-deterministic at any parallelism "
        "(SCALING.md round-9 audit)"
    ),
}


def float_column_maxima(con, sql: str) -> dict[str, float]:
    """Run ``sql`` on ``con`` and return {column: max |v|} for every
    DOUBLE/FLOAT output column (non-float columns — exact integers,
    decimals, strings — are not exposed to the hazard and are skipped).
    Nested float arrays count via their elements."""
    rel = con.sql(sql)
    cols, types = rel.columns, [str(t).upper() for t in rel.types]
    rows = rel.fetchall()
    out: dict[str, float] = {}
    for i, (c, t) in enumerate(zip(cols, types)):
        is_float = t in ("FLOAT", "DOUBLE") or t.endswith("[]") and (
            "FLOAT" in t or "DOUBLE" in t)
        if not is_float:
            continue
        mx = 0.0
        for r in rows:
            v = r[i]
            if v is None:
                continue
            vals = v if isinstance(v, (list, tuple)) else (v,)
            for x in vals:
                if x is not None and math.isfinite(x):
                    mx = max(mx, abs(x))
        out[c] = mx
    return out


def _cache_path(name: str, sql: str, fingerprint: str) -> str:
    key = hashlib.md5(f"{name}|{sql}|{fingerprint}".encode()).hexdigest()
    return os.path.join(_DIR, f"magaudit-{key}.repr")


def audited_maxima(con, name: str, sql: str, fingerprint: str) -> dict[str, float]:
    """Cached :func:`float_column_maxima` — the maxima are a pure function
    of (sql, dataset), so cache on the same key discipline as the oracle
    result cache."""
    path = _cache_path(name, sql, fingerprint)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            return ast.literal_eval(fh.read())
    out = float_column_maxima(con, sql)
    os.makedirs(_DIR, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(repr(out))
    os.replace(tmp, path)
    return out


def violations(name: str, maxima: dict[str, float]) -> list[str]:
    """Columns over THRESHOLD that carry no recorded justification."""
    return [
        f"{name}.{col}: max |v| = {mx:.3e} > {THRESHOLD:.0e} float output "
        "with no ALLOWLIST justification — round relative to magnitude "
        "(emit millions/ratios) or record the exact-integer / "
        "sequential-accumulation justification"
        for col, mx in sorted(maxima.items())
        if mx > THRESHOLD and (name, col) not in ALLOWLIST
    ]
