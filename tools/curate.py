#!/usr/bin/env python
"""Run the end-to-end curation pipeline from the command line.

Usage: python tools/curate.py [sf_dir] [out_dir] [--lsh-max-bucket N]

``--lsh-max-bucket`` tunes the near-dup stage's hot-bucket boilerplate
cap per-corpus without editing source (default: dedup.LSH_MAX_BUCKET).
Prints the audit report as one JSON line (same shape the pipeline test
asserts invariants over).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    cap = ...  # pipeline sentinel: keep the module-default cap
    if "--lsh-max-bucket" in args:
        i = args.index("--lsh-max-bucket")
        cap = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = args[0] if len(args) > 0 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = args[1] if len(args) > 1 else "/tmp/mfss_curated"

    from mapreduce_framework_simple_spark.pipeline import curate
    from mapreduce_framework_simple_spark.session import get_session

    spark = get_session("mfss-curate")
    spark.sparkContext.setLogLevel("ERROR")
    report = curate(spark, sf_dir, out_dir, lsh_max_bucket=cap)
    report["out_dir"] = out_dir
    print(json.dumps(report))


if __name__ == "__main__":
    main()
