#!/usr/bin/env python
"""Scale probe: replicate the fact tables N× (join keys offset per
replica so join fan-out stays realistic), then compare per-query wall
time at 1× vs N×. Sub-linear ratios on a multi-core local session mean
the plan parallelizes; a super-linear ratio flags a scale bug
(quadratic operator, driver collect, broadcast overflow).

Usage: python tools/scale_probe.py [N] [queries...]
       (typed positionals via argparse — a flag-looking argument exits
       non-zero with usage instead of being swallowed as data)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "q01_pricing_summary", "q05_join_chain", "q03_top_revenue",
    "q13_window_topk", "q27_range_join", "q35_dedup_exact",
]


def main() -> None:
    from replica import ensure_replica, replicate_table

    from mapreduce_framework_simple_spark.ephemeral import release_caches
    from mapreduce_framework_simple_spark.session import get_session
    from mapreduce_framework_simple_spark.sources.io import load_table
    from mapreduce_framework_simple_spark.registry import QUERIES, load_all

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("n", type=int, nargs="?", default=10,
                    help="replication factor (default 10)")
    ap.add_argument("queries", nargs="*", default=[],
                    help=f"query names (default: {' '.join(DEFAULT_QUERIES)})")
    args = ap.parse_args()
    n = args.n
    names = args.queries or DEFAULT_QUERIES
    load_all()
    spark = get_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def build(dst: str) -> None:
        # dims stay as-is (replicating them would change join semantics)
        for t in ["region", "nation", "supplier", "customer", "part"]:
            os.symlink(os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet"))
        # large tables replicate with offset keys. NOTE: replicated
        # documents are exact cross-replica duplicates — that makes the
        # probe a dup-heavy stress for the dedup operators (every doc has
        # n-1 exact copies), which is the interesting regime anyway.
        for t, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey"),
                       ("documents", "doc_id"), ("events", "event_id"),
                       ("embeddings", "vec_id")]:
            replicate_table(load_table(spark, t, src), key, n).write.mode(
                "overwrite"
            ).parquet(os.path.join(dst, f"{t}.parquet"))

    dst = ensure_replica(f"/tmp/mfss_scale_x{n}", build)

    def cold() -> None:
        # cold-for-cold timing (the bench.py discipline): the warm run
        # populates scoped caches and the CacheManager, and the 1× plan
        # is IDENTICAL to the warm plan — without this the 1× leg times
        # cache hits against a fully cold N× leg, biasing every caching
        # query's ratio super-linear (the exact signal this tool calls a
        # scale bug)
        release_caches()
        spark.catalog.clearCache()

    for name in names:
        QUERIES[name](spark, src).count()  # warm plan shapes
        cold()
        t0 = time.perf_counter()
        QUERIES[name](spark, src).count()
        t1 = time.perf_counter() - t0
        cold()
        t0 = time.perf_counter()
        QUERIES[name](spark, dst).count()
        tn = time.perf_counter() - t0
        cold()
        print(f"{name}: 1x={t1:.2f}s {n}x={tn:.2f}s ratio={tn / max(t1, 1e-9):.1f}")


if __name__ == "__main__":
    main()
