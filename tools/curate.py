#!/usr/bin/env python
"""Run the end-to-end curation pipeline from the command line.

Usage: python tools/curate.py [sf_dir] [out_dir]

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mfss_curated"

    from mapreduce_framework_simple_spark.pipeline import curate
    from mapreduce_framework_simple_spark.session import get_session

    spark = get_session("mfss-curate")
    spark.sparkContext.setLogLevel("ERROR")
    report = curate(spark, sf_dir, out_dir)
    report["out_dir"] = out_dir
    print(json.dumps(report))


if __name__ == "__main__":
    main()
