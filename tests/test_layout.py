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


def test_upsert_parquet_replaces_and_inserts(spark, sf_dir, tmp_path):
    from mapreduce_framework_simple_spark.operators.layout import upsert_parquet
    from mapreduce_framework_simple_spark.sources.io import load_table

    path = str(tmp_path / "orders_upsert")
    load_table(spark, "orders", sf_dir).write.parquet(path)
    before = spark.read.parquet(path)
    n_before = before.count()
    keys = [r.o_orderkey for r in before.select("o_orderkey").limit(2).collect()]

    updates = spark.createDataFrame(
        [
            # replace an existing order, insert a brand-new key
            (keys[0], 1, "X", 999.0, None, "1-URGENT"),
            (10**12, 1, "N", 1.0, None, "5-LOW"),
        ],
        schema=before.schema,
    )
    upsert_parquet(spark, path, updates, key="o_orderkey")
    after = spark.read.parquet(path)

    assert after.count() == n_before + 1  # one replaced, one inserted
    row = after.where(F.col("o_orderkey") == keys[0]).collect()
    assert len(row) == 1 and row[0].o_orderstatus == "X"
    assert after.where(F.col("o_orderkey") == 10**12).count() == 1
    assert after.where(F.col("o_orderkey") == keys[1]).count() == 1  # untouched


def test_upsert_keeps_caller_cached_updates_persisted(spark, tmp_path):
    """A caller-cached updates frame must STAY cached after upsert:
    cache() on an already-cached handle is a no-op on the SAME handle,
    so an unconditional finally-unpersist would silently drop the
    caller's persisted data (their later actions recompute). The sink
    only owns the cache lifetime when it created the cache."""
    from mapreduce_framework_simple_spark.operators.layout import upsert_parquet

    target = str(tmp_path / "upsert_cached")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(
        target
    )
    updates = spark.createDataFrame([(1, "x"), (3, "c")], "k long, v string").cache()
    try:
        updates.count()  # materialize the caller's cache
        upsert_parquet(spark, target, updates, key="k")
        assert updates.storageLevel.useMemory, (
            "upsert dropped the CALLER's cache — it may only unpersist "
            "a cache it created itself"
        )
        assert spark.read.parquet(target).count() == 3
    finally:
        updates.unpersist()


def test_range_partitioned_write_has_disjoint_file_ranges(spark, sf_dir, tmp_path):
    import glob

    from mapreduce_framework_simple_spark.operators.layout import (
        write_range_partitioned,
    )
    from mapreduce_framework_simple_spark.sources.io import load_table

    path = str(tmp_path / "orders_ranged")
    write_range_partitioned(
        load_table(spark, "orders", sf_dir), path, col="o_totalprice", n_files=4
    )
    # per-file min/max must not overlap — that disjointness is what lets
    # a range predicate prune to one file
    ranges = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        pdf = spark.read.parquet(f).agg(
            F.min("o_totalprice"), F.max("o_totalprice")
        ).collect()[0]
        ranges.append((pdf[0], pdf[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {hi1} > {lo2}"


def test_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    """MERGE contract: multiple update rows for one key must fail loudly
    (Delta/DuckDB MERGE semantics), not silently insert both."""
    import pytest

    from mapreduce_framework_simple_spark.operators.layout import upsert_parquet

    target = str(tmp_path / "upsert_dup")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(target)
    dup_updates = spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        upsert_parquet(spark, target, dup_updates, key="k")
    # target unchanged by the rejected merge
    assert sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(target).collect()
    ) == [(1, "a"), (2, "b")]


def test_upsert_rejects_null_update_keys(spark, tmp_path):
    """NULL keys can never MERGE (NULL = NULL never matches the
    anti-join), so a NULL-key update would silently land BESIDE a
    NULL-key target row — the guard fails loudly instead."""
    import pytest

    from mapreduce_framework_simple_spark.operators.layout import upsert_parquet

    target = str(tmp_path / "upsert_null")
    spark.createDataFrame([(None, "a"), (2, "b")], "k long, v string").write.parquet(
        target
    )
    null_updates = spark.createDataFrame([(None, "x")], "k long, v string")
    with pytest.raises(ValueError, match="NULL"):
        upsert_parquet(spark, target, null_updates, key="k")
    assert spark.read.parquet(target).count() == 2  # target untouched


def test_salted_ops_reject_reserved_salt_column(spark):
    """'_salt' is reserved working space: withColumn would silently
    overwrite a caller's column of that name and the final drop would
    eat it — both operators must refuse instead."""
    import pytest

    from mapreduce_framework_simple_spark.operators.layout import (
        salted_agg,
        salted_join,
    )

    df = spark.createDataFrame([(1, 5)], "k long, _salt long")
    clean = spark.createDataFrame([(1, 7)], "k long, w long")
    with pytest.raises(ValueError, match="_salt"):
        salted_agg(df, "k", [(F.col("_salt"), F.sum, F.sum, "s")])
    with pytest.raises(ValueError, match="_salt"):
        salted_join(df, "k", clean, "k")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(clean, "k", df, "k")  # small side reserved too
