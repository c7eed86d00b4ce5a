from . import graph, pagination  # noqa: F401
