"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the central registry in
``mapreduce_framework_simple_spark.registry`` — every operator module
registers its Spark implementation and (when SQL-expressible) the
equivalent DuckDB oracle with identically-aliased columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_framework_simple_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mapreduce_framework_simple_spark.operators.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
