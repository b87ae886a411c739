from .loader import TABLES, load_table, load_tables  # noqa: F401
from .registry import SOURCE_REGISTRY, expected_schema  # noqa: F401
