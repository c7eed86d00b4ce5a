from .tables import TABLES, load_tables, register_views, table  # noqa: F401
