from .csv_flexible import is_probably_csv, read_csv_flexible
from .tables import TABLE_NAMES, fan_out, load_table, load_tables, register_views

__all__ = [
    "TABLE_NAMES",
    "fan_out",
    "is_probably_csv",
    "load_table",
    "load_tables",
    "read_csv_flexible",
    "register_views",
]
