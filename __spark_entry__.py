"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the central registry in
``mapreduce_framework_simple_spark.registry`` — every operator module
registers its Spark implementation and (when SQL-expressible) the
equivalent DuckDB oracle with identically-aliased columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_framework_simple_spark import ephemeral, registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mapreduce_framework_simple_spark.operators.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def _released(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Release the PREVIOUS query's scoped caches at call time, so a
    consumer that sweeps every registered query in one session (the
    round driver) holds at most one query's intra-query caches at any
    moment.
    Safe: by the time the next query is invoked, the previous result has
    been materialized by the consumer. Queries composing other queries
    call the raw registry functions, not these wrappers, so an outer
    query's caches are never dropped mid-flight."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ephemeral.release_caches()
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One callable per declared query, each wrapped with cache-release.

    CONTRACT — strictly sequential consumption: materialize (collect/
    count/write) each query's result BEFORE invoking the next callable.
    Invoking query B releases query A's scoped caches, so holding two
    un-materialized lazy frames silently recomputes A's plan uncached;
    the module-global cache registry is likewise not safe for concurrent
    query execution from multiple threads. This matches every known
    consumer (the round driver's sweep, bench.py, the oracle suite);
    concurrent serving would wrap each query in its own
    ``ephemeral.cache_scope()`` instead of this release-on-next-call
    discipline."""
    registry.load_all()
    return {name: _released(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
