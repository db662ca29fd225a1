"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship block-DSL pipeline on sf0.001;
`queries()` / `oracle_sql()` expose every implemented SURVEY §2 operator
(and §7 scale extension) from query_engine_spark.registry, each as a
(Spark DataFrame query, DuckDB oracle SQL) pair compared by the driver at
sf0.01 (row count + schema + order-insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from query_engine_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.pipeline_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
