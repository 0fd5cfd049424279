"""The main correctness gate, in-repo edition: every registered query
with an oracle is run through Spark AND DuckDB at sf0.001 and compared
(sorted columns, canonical row order, STRICT float equality and dtype
kinds — compare_frames' strict=True default; the 4-dp rounded tolerance
is the legacy strict=False mode, used only for sketch/approx checks) —
the same protocol the driver applies at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare_frames, duck_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # >= 0 could never fail; the flagship query has rows
    assert df.columns


# The ONLY queries allowed to skip the DuckDB hash check — each is a
# sketch/iterative operator with an exact twin or recall test instead.
ROWS_ONLY = {
    "q41_ann_ivf",  # recall-tested vs exact q40
    "q45_approx_distinct",  # HLL sketch; exact twin q12
    "q68_kmeans",  # iterative float fixpoint; convergence-tested
    "q72_approx_percentile",  # sketch; exact twin q58
    "q104_pagerank",  # iterative float fixpoint; invariants tested
}


def test_every_query_has_runnable_spark_impl():
    assert len(QUERIES) >= 40
    # oracle coverage: everything outside the named rows-only set must be
    # hash-checkable, and the rows-only set must not silently grow
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY


def test_every_rows_only_query_has_a_bounded_matrix_check():
    """The full-matrix artifact must never carry a bare `no_oracle` row:
    every rows-only query needs an inline machine-checked bound
    (error/recall/invariant vs an independent DuckDB exact side) wired
    into tools/full_matrix.py — a new rows-only query without one fails
    here before it can ship an unverified artifact row."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "full_matrix",
        os.path.join(os.path.dirname(__file__), "..", "tools", "full_matrix.py"),
    )
    fm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fm)
    assert set(fm.BOUNDED_CHECKS) == ROWS_ONLY
    assert set(fm.ROWS_ONLY_TWINS) == ROWS_ONLY


@pytest.fixture(scope="module")
def duck(sf_dir):
    """One DuckDB connection (+ parquet views) for all ~125 oracle cases —
    a per-test duck_connection would leak a live connection per case."""
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible operators — toPandas()
        # never returns None, so assert something that CAN fail
        assert len(sdf.columns) > 0 and len(sdf) > 0
        return
    ddf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare_frames(sdf, ddf)
    assert not problems, f"{name}: {problems[:5]} (spark rows={len(sdf)}, duck rows={len(ddf)})"


def test_strict_compare_flags_hugeint_dtype_drift():
    """Harness-level guard for the q26 class of failure: a DuckDB oracle
    whose integer sum comes back HUGEINT (surfacing as float/object in
    pandas) must FAIL strict comparison even when every value is equal —
    the driver's canonical hash is dtype-sensitive, so the repo harness
    must be too."""
    import duckdb
    import pandas as pd

    spark_like = pd.DataFrame({"g": ["a", "b"], "n": pd.array([1, 2], dtype="int64")})
    # deliberately uncast: DuckDB sum() over INTEGER yields HUGEINT
    duck = duckdb.sql(
        "SELECT g, sum(n) AS n FROM (VALUES ('a', 1), ('b', 2)) t(g, n) GROUP BY g"
    ).fetchdf()
    problems = compare_frames(spark_like, duck, strict=True)
    assert problems and "dtype drift" in problems[0]
    # the cast version is clean
    duck_cast = duckdb.sql(
        "SELECT g, CAST(sum(n) AS BIGINT) AS n FROM (VALUES ('a', 1), ('b', 2)) t(g, n) GROUP BY g"
    ).fetchdf()
    assert compare_frames(spark_like, duck_cast, strict=True) == []


def test_strict_compare_flags_ulp_float_drift():
    """1-ULP float differences (the q22 ln() class) must fail strict
    comparison but pass the legacy 4-dp tolerance."""
    import pandas as pd

    a = pd.DataFrame({"x": [10.81438556982772]})
    b = pd.DataFrame({"x": [10.814385569827719]})
    assert compare_frames(a, b, strict=True)
    assert compare_frames(a, b, strict=False) == []
