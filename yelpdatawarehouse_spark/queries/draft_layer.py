"""Union view over the staged (unregistered) draft layers.

Each round's drafts live in their own module (`drafts_r6`, `drafts_r7`, …)
so registration stays a per-round move; every draft gate test sweeps the
UNION so a newly staged round inherits the full battery (oracle parity,
plan hygiene, determinism, empty input) the day it is written."""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from .drafts_r6 import DRAFTS as _R6
from .drafts_r7 import DRAFTS as _R7


def all_drafts() -> Dict[str, Tuple[Callable, str]]:
    merged: Dict[str, Tuple[Callable, str]] = {}
    for layer in (_R6, _R7):
        for name, pair in layer.items():
            assert name not in merged, f"duplicate draft name: {name}"
            merged[name] = pair
    return merged
