"""Public query surface. Importing this package registers every query."""

from __future__ import annotations

from .registry import REGISTRY, oracles, queries  # noqa: F401


def all_queries():
    """Import every query module (registration side effect) and return the
    registry."""
    from . import (  # noqa: F401
        dynamic,
        graphq,
        llmops,
        mmops,
        relational,
        sessions,
        sketches,
    )

    return REGISTRY
