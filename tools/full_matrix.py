"""Emit CORRECTNESS_full.json — the FULL-matrix correctness artifact.

The round driver hash-samples ~50 of the declared queries per round, so
most of the surface never gets a driver CORRECTNESS row in any given
round. This tool runs EVERY registered query through the same protocol
(vanilla SparkSession, sf0.01 parquet, DuckDB oracle, strict
column-sorted/dtype-sensitive value compare) and writes one row per
query in the driver's exact format, as a committed per-round artifact
the judge can audit without rerunning.

Usage:  python tools/full_matrix.py [out_path]
        SPARK_GRAFT_SF_DIR overrides the scale-factor directory.

Must be run with cwd OUTSIDE the repo only if you want the closure-
serialization check too (tests/drive_entry.py covers that); this tool
focuses on the compare matrix.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "CORRECTNESS_full.json")

# The only queries allowed to lack a DuckDB oracle — each annotated with
# the stronger check that stands in for the hash compare (mirrors
# tests/test_oracle.py::ROWS_ONLY, which pins this set against growth).
ROWS_ONLY_TWINS = {
    "q41_ann_ivf": "recall >= 0.6 vs exact q40 (tests/test_similarity_dedup.py)",
    "q45_approx_distinct": "HLL sketch; exact twin q12 oracle-checked",
    "q68_kmeans": "deterministic seeding + convergence trace (tests/test_iterative.py)",
    "q72_approx_percentile": "sketch; exact twin q58 oracle-checked",
    "q104_pagerank": "L1-delta monotonicity + mass invariants (tests/test_iterative.py)",
}


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("full-matrix")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from oracle_harness import compare_frames, duck_connection

    qs = E.queries()
    oracles = E.oracle_sql()
    con = duck_connection(SF_DIR)

    results: dict[str, dict] = {}
    n_fail = 0
    t_all = time.time()
    for name in sorted(qs):
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            row["spark_rows"] = int(len(sdf))
        except Exception as ex:  # noqa: BLE001 — the artifact records the error
            row["err"] = f"spark: {type(ex).__name__}: {str(ex)[:300]}"
            results[name] = row
            n_fail += 1
            print(f"  {name}: SPARK ERROR")
            continue
        if name not in oracles:
            row["err"] = "no_oracle"
            row["rows_only_check"] = ROWS_ONLY_TWINS.get(
                name, "UNDOCUMENTED rows-only query — add a twin/recall check"
            )
            results[name] = row
            print(f"  {name}: rows-only ({row['spark_rows']} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
            row["oracle_rows"] = int(len(ddf))
        except Exception as ex:  # noqa: BLE001
            row["err"] = f"duckdb: {type(ex).__name__}: {str(ex)[:300]}"
            results[name] = row
            n_fail += 1
            print(f"  {name}: DUCK ERROR")
            continue
        try:
            problems = compare_frames(sdf, ddf, strict=True)
        except Exception as ex:  # noqa: BLE001 — a compare crash (e.g.
            # mixed-type object column breaking sort_values) must record
            # ONE row's error, not abort the whole matrix artifact
            row["err"] = f"compare: {type(ex).__name__}: {str(ex)[:300]}"
            results[name] = row
            n_fail += 1
            print(f"  {name}: COMPARE ERROR")
            continue
        row["rows_match"] = len(sdf) == len(ddf)
        # None (unknown), not True, when the compare short-circuited on
        # row count before the dtype/column checks ever ran
        row["schema_match"] = (
            None
            if any("row counts differ" in p for p in problems)
            else not any(
                "dtype drift" in p or "columns differ" in p for p in problems
            )
        )
        row["hash_match"] = not problems
        if problems:
            row["err"] = "; ".join(p[:160] for p in problems[:3])
            n_fail += 1
        results[name] = row
        print(f"  {name}: {'OK' if not problems else 'MISMATCH'}")

    # the tree this run actually measured — makes artifact staleness
    # machine-checkable (round-6 lesson: a committed matrix predated 5
    # semantics-touching commits while claiming to be the final tree).
    # "-dirty" marks uncommitted changes in the run's working tree.
    try:
        import subprocess

        git_head = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=REPO, text=True).strip()
        # dirtiness scoped to the CODE the matrix measures — the round
        # driver appends to PROGRESS.jsonl continuously and this tool
        # itself overwrites the artifact files, either of which would
        # false-flag every run as dirty
        code_paths = ["mapreduce_framework_simple_spark", "__spark_entry__.py",
                      "bench.py", "tools", "tests"]
        # untracked NEW code files count as dirty too — `git diff HEAD`
        # ignores them, but registry.load_all imports the whole package,
        # so an uncommitted new operator module changes what this run
        # measures exactly like an edit to a tracked file would
        untracked = subprocess.check_output(
            ["git", "ls-files", "--others", "--exclude-standard", "--",
             *code_paths],
            cwd=REPO, text=True,
        ).strip()
        if untracked or subprocess.run(
            ["git", "diff", "--quiet", "HEAD", "--", *code_paths],
            cwd=REPO,
        ).returncode:
            git_head += "-dirty"
    except Exception:
        git_head = "unknown"

    artifact = {
        "_meta": {
            "git_head": git_head,
            "sf_dir": SF_DIR,
            "n_queries": len(qs),
            "n_oracle_checked": sum(
                1 for r in results.values() if r["hash_match"] is not None
            ),
            "n_pass": sum(1 for r in results.values() if r["hash_match"] is True),
            "n_rows_only": sum(
                1 for r in results.values() if r["err"] == "no_oracle"
            ),
            "n_fail": n_fail,
            "wall_s": round(time.time() - t_all, 1),
            "protocol": "strict compare_frames (exact floats, dtype kinds), "
                        "columns sorted by name — mirrors the driver hash",
        },
        **results,
    }
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1)
    m = artifact["_meta"]
    print(
        f"\n{m['n_pass']}/{m['n_oracle_checked']} oracle-checked pass, "
        f"{m['n_rows_only']} rows-only, {n_fail} failures "
        f"({m['wall_s']}s) -> {OUT}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
