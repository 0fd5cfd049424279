"""Temporal join operators.

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
uses the portable ``last_value IGNORE NULLS`` window identity, which is
equivalent to the operator whenever ``carry`` and ``ts`` are non-NULL
(true of the oracle tables). For NULL carries/timestamps the operator
pins its own explicit semantics (see :func:`asof_backward`) rather than
inheriting either engine's NULL-sort default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_simple_spark.registry import query
from mapreduce_framework_simple_spark.sources.io import load_table


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    carry: str,
    alias: str,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains ``alias`` = the
    ``carry`` value of the latest ``right`` row with the same ``on`` key
    and ``right.ts <= left.ts`` (NULL when none precedes).

    Semantics pinned for determinism: "at-or-before" is inclusive (a
    right row at exactly ``left.ts`` matches); ties among right rows at
    the same timestamp resolve to the greatest non-NULL ``carry`` value
    (a NULL carry loses ties). NULL handling is explicit, never left to
    an engine's NULL-sort default (Spark sorts NULLS FIRST, DuckDB
    NULLS LAST): a right row with NULL ``ts`` can never satisfy
    ``ts <= left.ts`` and is excluded; a left row with NULL ``ts`` gets
    NULL. A matched right row whose ``carry`` IS NULL yields NULL — the
    latest row's value, not a stale older carry (the match marker is a
    struct wrapper, so "no right row yet" and "right row carrying NULL"
    stay distinguishable).

    Implementation: tag both sides, union, and run ONE window per key
    ordered by (ts, side, carry) carrying the last right-side value
    forward — a single hash exchange plus a linear per-partition scan,
    never a pairwise range join. Left rows ride along as a packed struct
    and are re-expanded after the window, so callers keep every column.
    """
    if alias in left.columns:
        # fail fast: select('__row.*', alias) would otherwise expand to
        # TWO columns named `alias` and AMBIGUOUS_REFERENCE far downstream
        raise ValueError(
            f"asof_backward: alias {alias!r} collides with a left column; "
            "pick a name not present on the left side"
        )
    if alias in ("__on", "__ts", "__kind", "__carry", "__row", "__m"):
        # the operator's internal sentinel columns: withColumn(alias)
        # would REPLACE one of them mid-pipeline — e.g. alias='__kind'
        # overwrites the side tag so the final where(__kind == 1)
        # filters on carry values, silently returning wrong rows rather
        # than erroring
        raise ValueError(
            f"asof_backward: alias {alias!r} collides with an internal "
            "sentinel column; pick another name"
        )
    carry_type = right.schema[carry].dataType
    row_struct = F.struct(*[F.col(c) for c in left.columns])
    lsel = left.select(
        F.col(on).alias("__on"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(carry_type).alias("__carry"),
        row_struct.alias("__row"),
    )
    rsel = right.where(F.col(ts).isNotNull()).select(
        F.col(on).alias("__on"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__kind"),
        F.col(carry).alias("__carry"),
        F.lit(None).cast(lsel.schema["__row"].dataType).alias("__row"),
    )
    w = (
        Window.partitionBy("__on")
        # __carry ascending with NULLS FIRST pinned IN CODE: the "a NULL
        # carry loses ties" rule must not ride on Spark's implicit
        # NULL-sort default the docstring warns about
        .orderBy("__ts", "__kind", F.col("__carry").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        rsel.unionByName(lsel)
        .withColumn(
            "__m",
            # the struct wrapper is the match MARKER: it is non-NULL for
            # every right row even when __carry itself is NULL, so
            # ignorenulls skips only left rows — a NULL carry on the
            # latest right row comes through as NULL instead of being
            # skipped over to a stale older carry
            F.last(
                F.when(F.col("__kind") == 0, F.struct(F.col("__carry"))),
                ignorenulls=True,
            ).over(w),
        )
        .withColumn(
            # a left row with NULL ts has no defined "at-or-before" —
            # masked explicitly, not left to NULL-sort order
            alias,
            F.when(F.col("__ts").isNotNull(), F.col("__m.__carry")),
        )
    )
    return matched.where(F.col("__kind") == 1).select("__row.*", alias)


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
    user at-or-before the purchase timestamp (NULL when none precedes);
    click-id ties at equal ts resolve to the greater id. Built on the
    generic :func:`asof_backward` operator.

    Scale: ONE shuffle (hash on user_id) + per-partition sort — no
    pairwise range-join blowup, state is a single value per scan, and the
    whole pipeline stays in whole-stage codegen. Skewed users cost
    O(n log n) locally instead of O(n²) pairs."""
    e = load_table(spark, "events", sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    return asof_backward(
        purchases, clicks, on="user_id", ts="ts", carry="event_id", alias="click_id"
    ).select("purchase_id", "user_id", "click_id")


@query(
    "q103_scd2_intervals",
    oracle="""
    SELECT user_id, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current,
           value,
           event_id
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q103_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval construction: each
    purchase becomes a validity row [valid_from, valid_to) per user, the
    open interval marking the current record — the standard history-
    table build that point-in-time (as-of, q82) joins consume.

    Scale: ONE shuffle on the dimension key, one window pass; interval
    assembly never joins the table against itself (the naive SCD2 build
    is a self-join on "next change", which skew-explodes on hot keys).
    Timestamps pass through exactly (no arithmetic), so the oracle
    comparison needs no rounding discipline."""
    e = load_table(spark, "events", sf_dir)
    # NULLS LAST pinned IN CODE (the module invariant): Spark's
    # ascending default is NULLS FIRST while the oracle's ORDER BY uses
    # DuckDB's NULLS LAST — a NULL-ts purchase would sort to opposite
    # ends and shift every lead(). Latent (the generators emit no NULL
    # ts) but the pin costs nothing.
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    nxt = F.lead("ts").over(w)
    return (
        e.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
            "value",
            "event_id",
        )
    )
