from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .api_logs import read_api_logs
from .libsvm import read_libsvm, write_libsvm_text

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_api_logs",
    "read_libsvm",
    "write_libsvm_text",
]
