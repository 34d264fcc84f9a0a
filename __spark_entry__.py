"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog (pipeline_spark.plans.catalog)
for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: CDC LWW latest-state over the
    events stream (the engine's central operator, SURVEY.md §2.6 A9)."""
    from pipeline_spark.plans import query_map

    return query_map()["cdc_lww_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pipeline_spark.plans import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    from pipeline_spark.plans import oracle_sql_map

    return oracle_sql_map()
