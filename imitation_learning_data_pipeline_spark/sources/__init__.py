from .readers import TABLE_SCHEMAS, load_table, register_views

__all__ = ["TABLE_SCHEMAS", "load_table", "register_views"]
