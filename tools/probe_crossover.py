#!/usr/bin/env python
"""Cold-for-cold head-to-head of ivf_probe_bucketed's two scan-pruning
branches (driver-collected `isin` IN-list vs broadcast LEFT SEMI join +
dynamic partition pruning) across distinct-probed-cell counts — the
measurement PROBE_ISIN_MAX_CELLS is derived from.

Round 10 set the bound at 10**4 on a REASONED basis (plan-literal cost
grows with the IN-list; the broadcast join's overhead is flat) — the
round-10 verdict's one residual was that, unlike JACCARD_FANOUT_DISPATCH
(docs/jaccard_crossover_r9.json), the crossover itself had never been
timed. This probe times it, under the repo's crossover discipline:

* The corpus axis the dispatch guards is DISTINCT PROBED CELLS, which
  the real sf0.1 index cannot sweep (2,000 vectors → 65 cells), so the
  probe synthesizes a bucketed layout shaped exactly like
  write_ivf_index output (partitionBy("cell_id"), K=1e5 directories,
  2 rows/cell): per-cell row mass is deliberately tiny because BOTH
  branches read the same pruned files — the branch DIFFERENCE is pure
  pruning mechanics (plan-literal compile + planner partition pruning
  vs broadcast exchange + DPP subquery), which is what the constant
  bounds. similarity.py:ivf_probe_bucketed is the measured contract.
* SHARED costs are equalized, not hidden: the file listing is warmed
  once per session (36 s cold at 1e5 dirs — paid identically by both
  branches in the engine too, where one spark.read serves both) and the
  OS page cache is hot after warm-up; scoped caches AND the Spark cache
  manager are cleared before every timed run, and each run re-plans
  from a fresh DataFrame, so plan construction/optimization/partition
  pruning — the asymmetric costs — are re-paid every run.
* The IN-list branch is timed INCLUDING its driver collect of the cell
  ids (intrinsic to building the literal list; the engine's dispatch
  collect is capped at bound+1 and paid on both branches, so it cancels
  at the crossover). Both branches are asserted row-identical per point.

Prints one JSON line per point:
  {"cells": C, "isin_s": a, "semi_s": b, "rows": n, "loadavg": [...]}
and a summary line with the measured crossover bracket + the bench.py
calibration anchor (environment context for cross-round reads).

Usage: python tools/probe_crossover.py [--cells C ...] [--runs N]
       (defaults: cells = 100 1000 10000 30000 100000, runs = 2,
        K = 100000 total cells; the synthetic index is built once and
        reused via a completion marker at /tmp/mfss_probe_idx_k<K>)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K_DEFAULT = 100_000
ROWS_PER_CELL = 2


def main() -> None:
    from replica import ensure_replica

    import bench as _bench
    from mapreduce_framework_simple_spark import ephemeral
    from mapreduce_framework_simple_spark.session import get_session

    from pyspark.sql import functions as F

    ap = argparse.ArgumentParser(
        description="measure the isin-vs-semi-join probe dispatch crossover"
    )
    ap.add_argument("--cells", type=int, nargs="*",
                    default=[100, 1_000, 10_000, 30_000, 100_000],
                    help="distinct probed-cell counts to sweep")
    ap.add_argument("--runs", type=int,
                    default=int(os.environ.get(
                        "SPARK_GRAFT_CROSSOVER_RUNS", "2")),
                    help="timed runs per branch per point (min taken)")
    ap.add_argument("--k", type=int, default=K_DEFAULT,
                    help="total cells in the synthetic bucketed index")
    args = ap.parse_args()
    k = args.k

    spark = get_session("probe-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    def build(dst: str) -> None:
        # the synthetic index: write_ivf_index's exact layout
        # (partitionBy cell_id), K cells × ROWS_PER_CELL rows. ~12.5 min
        # one-time at K=1e5 on the anchor box (1e5 directories), hence
        # the completion-marker reuse.
        spark.range(ROWS_PER_CELL * k).select(
            (F.col("id") % k).alias("cell_id"),
            F.col("id").alias("vec_id"),
            (F.col("id") * 2).alias("payload"),
        ).repartition("cell_id").write.partitionBy("cell_id").mode(
            "overwrite"
        ).parquet(os.path.join(dst, "index"))

    idx_path = os.path.join(
        ensure_replica(f"/tmp/mfss_probe_idx_k{k}", build), "index"
    )

    calib_1t, calib_32t = _bench.calibrate()

    def cold() -> None:
        ephemeral.release_caches()
        spark.catalog.clearCache()

    # one read serves a point's branches, exactly as in
    # ivf_probe_bucketed where a single spark.read.parquet(index_path)
    # feeds both; the first touch pays the 1e5-directory listing once
    # per session (shared, branch-symmetric)
    idx = spark.read.parquet(idx_path)
    cell_t = idx.schema["cell_id"].dataType

    def cells_df(c: int):
        # C distinct cells spread uniformly over [0, K) — probes hit
        # arbitrary cells; cast to the partition column's inferred type
        # so neither branch pays a spurious join-key cast
        return spark.range(c).select(
            (F.col("id") * (k // c)).cast(cell_t).alias("cell_id")
        )

    def run_isin(c: int) -> int:
        ids = sorted(r["cell_id"] for r in cells_df(c).collect())
        return idx.where(F.col("cell_id").isin(ids)).count()

    def run_semi(c: int) -> int:
        return idx.join(
            F.broadcast(cells_df(c).where(F.col("cell_id") >= 0)),
            "cell_id",
            "left_semi",
        ).count()

    branches = {"isin": run_isin, "semi": run_semi}
    results = []
    for c in args.cells:
        if c > k:
            print(json.dumps({"cells": c, "skipped": f"exceeds K={k}"}),
                  flush=True)
            continue
        # untimed warm-up of BOTH branch shapes at this point (page
        # cache + Python/JVM one-time costs; plan work is NOT cached
        # across DataFrames, so the timed runs still re-pay it)
        counts = {}
        for name, fn in branches.items():
            cold()
            counts[name] = fn(c)
        if counts["isin"] != counts["semi"]:
            raise AssertionError(
                f"branches disagree at C={c}: {counts} — the measurement "
                "is only meaningful over row-identical plans"
            )
        timing = {}
        for name, fn in branches.items():
            best = None
            for _ in range(args.runs):
                cold()
                t0 = time.perf_counter()
                n = fn(c)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timing[name] = round(best, 3)
        cold()
        row = {
            "cells": c,
            "isin_s": timing["isin"],
            "semi_s": timing["semi"],
            "rows": n,
            "loadavg": [round(x, 2) for x in os.getloadavg()],
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # crossover bracket: the cell-count band between the largest point
    # where the IN-list wins and the smallest where the semi-join wins
    # (None-bounded when one branch wins everywhere measured)
    isin_wins = [r["cells"] for r in results if r["isin_s"] <= r["semi_s"]]
    semi_wins = [r["cells"] for r in results if r["semi_s"] < r["isin_s"]]
    print(json.dumps({
        "crossover_low": max(isin_wins) if isin_wins else None,
        "crossover_high": min(semi_wins) if semi_wins else None,
        "k_cells": k,
        "rows_per_cell": ROWS_PER_CELL,
        "runs_per_point": args.runs,
        "aggregation": "min",
        "calibration_1t_s": round(calib_1t, 3),
        "calibration_32t_s": round(calib_32t, 3),
        "calibration_ratio_32t": round(
            calib_32t / _bench.CALIB_REF_32T_S, 6
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
