"""The main correctness gate, in-repo edition: every registered query
with an oracle is run through Spark AND DuckDB at sf0.001 and compared
(sorted columns, canonical row order, rounded floats) — the same protocol
the driver applies at sf0.01.
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
    assert len(rows) >= 0
    assert df.columns


def test_every_query_has_runnable_spark_impl():
    assert len(QUERIES) >= 40
    # oracle coverage: the vast majority must be hash-checkable
    assert len(ORACLES) >= len(QUERIES) - 4


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible operators
        assert sdf is not None
        return
    con = duck_connection(sf_dir)
    ddf = con.execute(ORACLES[name]).fetchdf()
    problems = compare_frames(sdf, ddf)
    assert not problems, f"{name}: {problems[:5]} (spark rows={len(sdf)}, duck rows={len(ddf)})"
