"""Union view over the per-round draft layers (`drafts_r6`, `drafts_r7`, …).

Each round's queries are WRITTEN into a draft module first, where the full
gate battery (oracle parity, plan hygiene, determinism, empty input,
timezone, invariants, scale probes) sweeps them from day one; the round
AFTER they are written, `register_all()` flips the whole union into the
registry (round 6 did this for the r6+r7 layers). The two-step exists so
a fresh cohort never displaces stale re-verifications from the external
verifier's bounded window in the round it is staged."""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from .drafts_r6 import DRAFTS as _R6
from .drafts_r7 import DRAFTS as _R7
from .drafts_r8 import DRAFTS as _R8
from .drafts_r9 import DRAFTS as _R9
from .drafts_r10 import DRAFTS as _R10
from .drafts_r11 import DRAFTS as _R11
from .drafts_r12 import DRAFTS as _R12
from .drafts_r13 import DRAFTS as _R13
from .drafts_r14 import DRAFTS as _R14
from .drafts_r15 import DRAFTS as _R15
from .drafts_r16 import DRAFTS as _R16
from .registry import register

_REGISTERED = False


def all_drafts() -> Dict[str, Tuple[Callable, str]]:
    merged: Dict[str, Tuple[Callable, str]] = {}
    for layer in (_R6, _R7, _R8, _R9, _R10, _R11, _R12, _R13, _R14, _R15,
                  _R16):
        for name, pair in layer.items():
            assert name not in merged, f"duplicate draft name: {name}"
            merged[name] = pair
    return merged


def register_all() -> None:
    """Register every staged draft (idempotent; called by
    queries.all_queries after the core modules import)."""
    global _REGISTERED
    if _REGISTERED:
        return
    for name, (fn, oracle) in all_drafts().items():
        register(name, oracle=oracle)(fn)
    _REGISTERED = True
