"""Query catalog: named queries over the driver test tables, each paired
with a DuckDB oracle SQL string (the driver's correctness gate)."""

from pipeline_spark.plans.catalog import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "query_map", "oracle_sql_map"]
