#!/usr/bin/env python
"""Run the end-to-end curation pipeline from the command line.

Usage: python tools/curate.py [sf_dir] [out_dir] [--lsh-max-bucket N]

``--lsh-max-bucket`` tunes the near-dup stage's hot-bucket boilerplate
cap per-corpus without editing source (default: dedup.LSH_MAX_BUCKET).
Prints the audit report as one JSON line (same shape the pipeline test
asserts invariants over).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description="Run the end-to-end curation pipeline."
    )
    ap.add_argument(
        "sf_dir",
        nargs="?",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="input table directory (default: $SPARK_GRAFT_SF_DIR)",
    )
    ap.add_argument(
        "out_dir", nargs="?", default="/tmp/mfss_curated",
        help="output directory for the curated corpus",
    )
    ap.add_argument(
        "--lsh-max-bucket",
        type=int,
        default=None,
        metavar="N",
        help="hot-bucket boilerplate cap for the near-dup stage "
        "(default: dedup.LSH_MAX_BUCKET)",
    )
    ns = ap.parse_args(argv)
    # pipeline sentinel: ... keeps the module-default cap
    cap = ns.lsh_max_bucket if ns.lsh_max_bucket is not None else ...

    from mapreduce_framework_simple_spark.pipeline import curate
    from mapreduce_framework_simple_spark.session import get_session

    spark = get_session("mfss-curate")
    spark.sparkContext.setLogLevel("ERROR")
    report = curate(spark, ns.sf_dir, ns.out_dir, lsh_max_bucket=cap)
    report["out_dir"] = ns.out_dir
    print(json.dumps(report))


if __name__ == "__main__":
    main()
