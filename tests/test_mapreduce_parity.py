"""Parity tests for the map_reduce API — the reference's own test suite
(t/00_compile.t, t/01_basic.t) plus its POD showcase workloads, ported per
SURVEY.md §5.
"""

from __future__ import annotations

import pytest

from mapreduce_framework_simple_spark.operators.mapreduce import (
    MapReduceEngine,
    create_assigned_data,
    map_reduce,
)


def test_module_imports():
    """≙ t/00_compile.t — the package loads."""
    import mapreduce_framework_simple_spark  # noqa: F401


def test_basic_sum_count_avg(spark):
    """≙ t/01_basic.t:8-51 — 4 chunks × 1000 × 5.5; golden values
    sum=22000, avg=5.5, num=4000."""
    data = [[5.5] * 1000 for _ in range(4)]

    def mapper(chunk):
        total = sum(chunk)
        return {"sum": total, "num": len(chunk), "avg": total / len(chunk)}

    def reducer(mapped):
        total = sum(m["sum"] for m in mapped)
        num = sum(m["num"] for m in mapped)
        return {"sum": total, "num": num, "avg": total / num}

    res = MapReduceEngine(spark).map_reduce(data, mapper, reducer, 4, pre_chunked=True)
    assert res["sum"] == 22000.0
    assert res["num"] == 4000
    assert res["avg"] == 5.5


def test_flat_data_auto_chunking(spark):
    """Flat element list → engine chunks (≙ auto-assign, Simple.pm:166-168)."""
    res = map_reduce(
        list(range(100)),
        lambda chunk: sum(chunk),
        lambda partials: sum(partials),
        max_proc=8,
        spark=spark,
    )
    assert res == sum(range(100))


def test_skip_none_filter(spark):
    """≙ skip_undef_result (Simple.pm:22,328-335): None mapper outputs are
    dropped before the reducer sees them."""
    data = [[1], [2], [3], [4]]

    def mapper(chunk):
        return None if chunk[0] % 2 == 0 else chunk[0]

    seen = []

    def reducer(mapped):
        seen.extend(mapped)
        return sum(mapped)

    res = MapReduceEngine(spark).map_reduce(data, mapper, reducer, 4, pre_chunked=True)
    assert res == 4  # 1 + 3
    assert None not in seen

    eng = MapReduceEngine(spark, skip_none=False)
    collected = eng.map_reduce(data, mapper, lambda m: m, 4, pre_chunked=True)
    assert None in collected

    # the module-level wrapper must route skip_none to the CONSTRUCTOR
    # (forwarding it to engine.map_reduce would TypeError)
    from mapreduce_framework_simple_spark.operators.mapreduce import (
        map_reduce as mr_fn,
    )

    kept = mr_fn(data, mapper, lambda m: m, 4, spark=spark,
                 skip_none=False, pre_chunked=True)
    assert None in kept
    assert mr_fn(data, mapper, sum, 4, spark=spark, pre_chunked=True) == 4


def test_word_count_showcase(spark):
    """The reference's motivating use case (Simple.pm:612): word count as
    mapper/reducer."""
    docs = ["a b a", "b c", "a"]

    def mapper(chunk):
        counts: dict[str, int] = {}
        for doc in chunk:
            for w in doc.split():
                counts[w] = counts.get(w, 0) + 1
        return counts

    def reducer(mapped):
        total: dict[str, int] = {}
        for part in mapped:
            for w, c in part.items():
                total[w] = total.get(w, 0) + c
        return total

    res = map_reduce(docs, mapper, reducer, 3, spark=spark)
    assert res == {"a": 3, "b": 2, "c": 1}


def test_prime_sum_showcase(spark):
    """The reference's POD benchmark workload (Simple.pm:836-929), small
    range; cross-checked against a plain Python loop."""

    def is_prime(n):
        if n < 2:
            return False
        d = 2
        while d * d <= n:
            if n % d == 0:
                return False
            d += 1
        return True

    lo, hi = 10_001, 11_001
    expected = sum(n for n in range(lo, hi) if is_prime(n))

    def mapper(chunk):
        return sum(n for n in chunk if is_prime(n))

    res = map_reduce(list(range(lo, hi)), mapper, sum, 8, spark=spark)
    assert res == expected


def test_objects_and_closures_in_data(spark):
    """≙ the Storable path (Simple.pm:733-751): arbitrary Python objects —
    including callables — travel through chunks (cloudpickle ≙ Storable
    with Deparse/Eval)."""

    class Acc:
        def __init__(self, v):
            self.v = v

    data = [Acc(i) for i in range(10)]

    def mapper(chunk):
        return sum(x.v * 2 for x in chunk)

    assert map_reduce(data, mapper, sum, 4, spark=spark) == 2 * sum(range(10))


# --- create_assigned_data (≙ Simple.pm:34-146) ---------------------------

def test_chunking_sequential():
    chunks = create_assigned_data(list(range(10)), 3, method="element_sequential")
    assert chunks == [[0, 3, 6, 9], [1, 4, 7], [2, 5, 8]]


def test_chunking_shuffle_partitions_everything():
    chunks = create_assigned_data(list(range(100)), 7, method="element_shuffle", seed=1)
    assert sorted(x for c in chunks for x in c) == list(range(100))
    assert len(chunks) == 7


def test_chunking_volume_uniform_balances_bytes():
    """volume_uniform (Simple.pm:133-144): size-skewed elements spread so
    chunk byte totals stay balanced."""
    import pickle

    data = ["x" * (1000 if i < 8 else 1) for i in range(64)]
    chunks = create_assigned_data(data, 8, method="volume_uniform")
    sizes = [sum(len(pickle.dumps(x)) for x in c) for c in chunks]
    assert max(sizes) - min(sizes) <= 1100  # each chunk gets exactly one big element


def test_chunking_rejects_bad_args():
    with pytest.raises(ValueError):
        create_assigned_data([1], 0)
    with pytest.raises(ValueError):
        create_assigned_data([1], 2, method="nope")


def test_map_reduce_iter(spark):
    res = MapReduceEngine(spark).map_reduce_iter(
        range(1000), lambda part: sum(part), sum, num_partitions=16
    )
    assert res == sum(range(1000))


def test_mapper_failure_fails_fast(spark):
    """Deliberate divergence from the reference (which silently DISCARDS
    twice-failed chunks, Simple.pm:321-327): mapper errors must surface
    as job failure — no silent data loss."""
    def bad_mapper(chunk):
        raise ValueError("boom")

    with pytest.raises(Exception, match="boom"):
        map_reduce([[1], [2]], bad_mapper, sum, 2, spark=spark, pre_chunked=True)


def test_sql_temp_views(spark, sf_dir):
    """spark.sql over the registered star-schema views (the SQL entry
    surface next to the DataFrame API)."""
    from mapreduce_framework_simple_spark.sources.io import register_temp_views

    register_temp_views(spark, sf_dir)
    row = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]
    assert row["n"] > 0


def test_capacity_weighted_method_aliases():
    """Reference methods 1d-1f (Simple.pm:66-132) are accepted as no-op
    parity shims — a ported caller runs unmodified; chunking equals the
    sequential striping (capacity weighting steered worker placement,
    which Spark's scheduler owns)."""
    from mapreduce_framework_simple_spark.operators.mapreduce import (
        CAPACITY_METHOD_ALIASES,
        create_assigned_data,
    )

    data = list(range(17))
    expected = create_assigned_data(data, 4, method="element_sequential")
    for alias in CAPACITY_METHOD_ALIASES:
        assert create_assigned_data(data, 4, method=alias) == expected
    import pytest

    with pytest.raises(ValueError, match="unknown method"):
        create_assigned_data(data, 4, method="element_bogus")


def test_map_reduce_iter_never_feeds_empty_chunks(spark):
    """More partitions than elements: empty gloms must be dropped before
    the mapper (the reference's never-empty-chunk contract) — an avg
    mapper dividing by len(chunk) must not crash."""
    from mapreduce_framework_simple_spark.operators.mapreduce import MapReduceEngine

    eng = MapReduceEngine(spark)
    out = eng.map_reduce_iter(
        [1.0, 2.0, 3.0, 4.0, 5.0],
        mapper=lambda chunk: sum(chunk) / len(chunk),
        reducer=lambda xs: sorted(xs),
        num_partitions=32,
    )
    assert all(isinstance(x, float) for x in out) and len(out) <= 5
