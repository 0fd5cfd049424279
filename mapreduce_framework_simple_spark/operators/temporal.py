"""Temporal join operators over ``events``.

The reference has no joins at all (SURVEY.md §2.3: no join-like logic
anywhere in Simple.pm) — an as-of join there would be hand-written inside
a mapper closure over pre-sorted chunks. Here it is the classic
union-and-window formulation, which is the only formulation that survives
100 TB:

* A naive as-of join as a range join (``l.ts >= r.ts`` theta condition)
  explodes to O(|L|·|R|) comparisons per key before taking the max —
  at skewed keys that is quadratic work.
* The union+window formulation is a single shuffle on the key, then one
  linear ordered scan per partition carrying "last right-side row seen"
  — O((|L|+|R|) log) for the sort, no pair materialization, and it
  whole-stage-codegens.

DuckDB's native ``ASOF JOIN`` implements the same semantics; the oracle
here uses the portable ``last_value IGNORE NULLS`` window identity so
both engines execute bit-identical logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_simple_spark.registry import query
from mapreduce_framework_simple_spark.sources.io import load_table


@query(
    "q82_asof_join",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
      FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ts, event_id, kind,
             last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, kind, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS click_id
      FROM u
    )
    SELECT event_id AS purchase_id, user_id, click_id
    FROM w WHERE kind = 1
    """,
)
def q82_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest click of the same
    user at-or-before the purchase timestamp (NULL when none precedes).

    Implementation: tag both sides, union, then one window per user
    ordered by (ts, kind, event_id) carrying the last click id forward.
    ``kind`` orders clicks before purchases at equal ``ts`` (at-or-before
    semantics); ``event_id`` breaks exact click ties deterministically.

    Scale: ONE shuffle (hash on user_id) + per-partition sort — no
    pairwise range-join blowup, state is a single value per scan, and the
    whole pipeline stays in whole-stage codegen. Skewed users cost
    O(n log n) locally instead of O(n²) pairs."""
    e = load_table(spark, "events", sf_dir)
    u = e.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0)).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "click_id",
        F.last(F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"), "user_id", "click_id"
    )
