"""Central query registry — the correctness contract.

Every declared operator (SURVEY.md §2.3) registers two things:

* a Spark implementation ``(spark, sf_dir) -> DataFrame``
* (when SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB
  runs on the same parquet tables (views: region nation customer supplier
  part orders lineitem events documents embeddings).

The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json); the
in-repo tests do the same at sf0.001. Column names are part of the
contract: the compare sorts columns by name before hashing, so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a declared query; ``oracle=None`` marks a non-SQL-expressible
    operator (driver records the weaker rows-only check)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from mapreduce_framework_simple_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        relational,
        sampling,
        similarity,
        temporal,
        text,
    )
    from mapreduce_framework_simple_spark.functions import udfs  # noqa: F401
    from mapreduce_framework_simple_spark.operators import iterative  # noqa: F401
    from mapreduce_framework_simple_spark.streaming import windows  # noqa: F401
