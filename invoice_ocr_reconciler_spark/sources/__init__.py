from .registers import read_register_csv, read_register_json, normalize_register
from .pages import write_pages_bucketed, read_pages, salt_hot_hosts

__all__ = [
    "read_register_csv",
    "read_register_json",
    "normalize_register",
    "write_pages_bucketed",
    "read_pages",
    "salt_hot_hosts",
]
