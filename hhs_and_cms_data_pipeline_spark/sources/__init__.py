from .tables import TABLES, load_all, spread, table  # noqa: F401
