from .registry import QuerySpec, all_specs, queries, oracle_sql
