from .builder import SearchParams, search  # noqa: F401
