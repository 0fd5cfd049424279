"""Bucketing and salting: result-equivalence + plan-shape assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_simple_spark.operators.layout import (
    bucketed_join,
    salted_agg,
    salted_join,
    write_bucketed,
)
from mapreduce_framework_simple_spark.plans.explain import formatted_plan
from mapreduce_framework_simple_spark.sources.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", "l_orderkey", 8
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Same-bucketed join must plan WITHOUT a shuffle on either side —
    the storage-layout answer to the q05 fact⋈fact exchange. Broadcast is
    disabled for the check (at test SF the dim fits the threshold and a
    broadcast would mask the bucketing)."""
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        plan = formatted_plan(joined)
        shuffles = [
            l for l in plan.splitlines()
            if "Exchange" in l and "BroadcastExchange" not in l
        ]
        assert "SortMergeJoin" in plan
        assert not shuffles, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # and it returns the same rows as the plain join
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    salted = (
        salted_agg(
            li,
            "l_returnflag",
            [
                (F.col("l_quantity"), F.sum, F.sum, "sum_qty"),
                (F.lit(1), F.count, F.sum, "n"),
            ],
            salt_n=8,
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert (plain["n"] == salted["n"]).all()
    assert (abs(plain["sum_qty"] - salted["sum_qty"]) < 1e-6).all()


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    plain = li.join(p, li.l_partkey == p.p_partkey).count()
    salted = salted_join(li, "l_partkey", p, "p_partkey", salt_n=4).count()
    assert salted == plain
