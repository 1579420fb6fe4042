from .queries import QUERIES, entry_query, oracle_sql, queries  # noqa: F401
