"""Plan-quality assertions (the 100 TB story, made testable):
filters/projections reach the parquet scan, dimension joins broadcast,
hot paths stay inside whole-stage codegen, top-k avoids global sorts.
"""

from __future__ import annotations

from mapreduce_framework_simple_spark.operators.relational import (
    q01_pricing_summary,
    q02_filter_project,
    q03_top_revenue,
    q05_join_chain,
    q07_broadcast_brand,
    q13_window_topk,
    q17_sort_limit,
)
from mapreduce_framework_simple_spark.plans.explain import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = q02_filter_project(spark, sf_dir)
    assert has_pushed_filters(df), "predicates did not push into the parquet scan"


def test_column_pruning(spark, sf_dir):
    plan = formatted_plan(q01_pricing_summary(spark, sf_dir))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, "no scan in plan"
    # q01 touches 7 of 11 lineitem columns; unused ones must not be read
    assert "l_orderkey" not in scan_lines[0]
    assert "l_partkey" not in scan_lines[0]


def test_dim_joins_broadcast(spark, sf_dir):
    for q in (q03_top_revenue, q05_join_chain, q07_broadcast_brand):
        assert has_broadcast_join(q(spark, sf_dir)), f"{q.__name__} lost its broadcast"


def test_no_cartesian_in_star_join(spark, sf_dir):
    plan = formatted_plan(q05_join_chain(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen_present(spark, sf_dir):
    for q in (q01_pricing_summary, q02_filter_project, q13_window_topk):
        df = q(spark, sf_dir)
        df.collect()  # AQE annotates codegen ids only in the final executed plan
        assert codegen_stage_count(df) >= 1, f"{q.__name__} fell out of codegen"


def test_global_topk_avoids_total_sort(spark, sf_dir):
    plan = formatted_plan(q17_sort_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT planned as a global sort"


def test_window_topk_group_limit_pushdown(spark, sf_dir):
    plan = formatted_plan(q13_window_topk(spark, sf_dir))
    assert "WindowGroupLimit" in plan, "rank filter not pushed below the window sort"
