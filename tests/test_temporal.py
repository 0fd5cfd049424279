"""Edge-case semantics of the generic as-of join operator: the cases a
scale run never isolates — empty right side, exact-timestamp ties,
duplicate right rows at one timestamp — pinned on tiny in-memory frames.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from mapreduce_framework_simple_spark.operators.temporal import asof_backward


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_t(10), lid=100),  # clicks at 5 and 10 precede
            Row(k=1, ts=_t(3), lid=101),   # no click at-or-before
            Row(k=2, ts=_t(20), lid=102),  # user with no clicks at all
            Row(k=3, ts=_t(7), lid=103),   # two clicks tie at ts=7
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_t(5), rid=500),
            Row(k=1, ts=_t(10), rid=501),  # exactly at left ts → matches
            Row(k=1, ts=_t(11), rid=502),  # after → never matches
            Row(k=3, ts=_t(7), rid=503),
            Row(k=3, ts=_t(7), rid=504),   # tie → greater rid wins
        ]
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["matched"]
        for r in asof_backward(
            left, right, on="k", ts="ts", carry="rid", alias="matched"
        ).collect()
    }
    assert out == {
        100: 501,  # at-or-before is inclusive: ts=10 click beats ts=5
        101: None,  # nothing precedes
        102: None,  # key absent from right side
        103: 504,  # equal-ts tie resolves to greatest carry value
    }


def test_asof_backward_keeps_all_left_columns_and_rows(spark):
    left, right = _frames(spark)
    out = asof_backward(left, right, on="k", ts="ts", carry="rid", alias="matched")
    assert set(out.columns) == {"k", "ts", "lid", "matched"}
    assert out.count() == left.count()


def test_asof_backward_null_semantics(spark):
    """Explicit NULL contract: the latest right row's NULL carry comes
    through as NULL (not skipped over to a stale older carry); a right
    row with NULL ts can never match; a left row with NULL ts gets NULL
    — none of it inherited from an engine's NULL-sort default."""
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_t(12), lid=200),  # latest right row carries NULL
            Row(k=2, ts=_t(12), lid=201),  # only right row has NULL ts
            Row(k=1, ts=None, lid=202),    # left NULL ts → no match
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_t(5), rid=700),
            Row(k=1, ts=_t(10), rid=None),  # latest at-or-before 12: NULL
            Row(k=2, ts=None, rid=701),     # NULL ts: excluded entirely
        ]
    )
    out = {
        r["lid"]: r["matched"]
        for r in asof_backward(
            left, right, on="k", ts="ts", carry="rid", alias="matched"
        ).collect()
    }
    assert out == {200: None, 201: None, 202: None}
    # and a NULL carry LOSES an equal-ts tie to a real value
    right2 = spark.createDataFrame(
        [Row(k=1, ts=_t(10), rid=None), Row(k=1, ts=_t(10), rid=800)]
    )
    (row,) = asof_backward(
        left.where("lid = 200"), right2, on="k", ts="ts", carry="rid",
        alias="matched",
    ).collect()
    assert row["matched"] == 800


def test_recursive_and_window_chain_depth_agree(spark, sf_dir):
    """q92 (WITH RECURSIVE) and q93 (gaps-and-islands windows) are two
    plans for the same relation; their outputs must be identical."""
    from mapreduce_framework_simple_spark.operators.relational import (
        q92_recursive_chain,
        q93_chain_depth_window,
    )

    # sorted multisets, not sets: a fan-out bug that duplicates a row in
    # one plan must fail, and set() would silently collapse it
    a = sorted(tuple(r) for r in q92_recursive_chain(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in q93_chain_depth_window(spark, sf_dir).collect())
    assert a == b
