from .catalog import CATALOG, QuerySpec, oracle_sql, queries

__all__ = ["CATALOG", "QuerySpec", "queries", "oracle_sql"]
