"""Driver-contract query registry: Spark callables + DuckDB oracle SQL.

``registry.QUERIES`` maps query name -> QuerySpec(spark_fn, oracle_sql).
``__spark_entry__.py`` at the repo root re-exports these for the driver.
"""

from .registry import QUERIES, QuerySpec, oracle_sql_dict, queries_dict

__all__ = ["QUERIES", "QuerySpec", "oracle_sql_dict", "queries_dict"]
