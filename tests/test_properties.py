"""Property-based tests (hypothesis) for the pure-Python engine pieces
and cross-engine hash determinism invariants."""

from __future__ import annotations

import pickle

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_framework_simple_spark.operators.mapreduce import create_assigned_data

elements = st.lists(st.integers(-1000, 1000), max_size=200)
chunk_counts = st.integers(1, 17)
methods = st.sampled_from(["element_sequential", "element_shuffle", "volume_uniform"])


@settings(max_examples=200, deadline=None)
@given(data=elements, n=chunk_counts, method=methods)
def test_chunking_preserves_multiset(data, n, method):
    """No element lost or duplicated by any strategy (≙ the reference's
    contract that assigned data covers the input, Simple.pm:34-146)."""
    chunks = create_assigned_data(data, n, method=method, seed=0)
    assert sorted(x for c in chunks for x in c) == sorted(data)


@settings(max_examples=200, deadline=None)
@given(data=elements, n=chunk_counts, method=methods)
def test_chunking_bounds(data, n, method):
    chunks = create_assigned_data(data, n, method=method, seed=0)
    assert len(chunks) <= n
    assert all(c for c in chunks)  # never emits empty chunks
    if data and method == "element_sequential":
        # round-robin: sizes differ by at most 1
        sizes = sorted(len(c) for c in chunks)
        assert sizes[-1] - sizes[0] <= 1


@settings(max_examples=50, deadline=None)
@given(data=st.lists(st.binary(max_size=500), min_size=8, max_size=64))
def test_volume_uniform_beats_sequential_on_skew(data):
    """Size balancing: volume_uniform's max-chunk byte load never exceeds
    (greedy bound) the largest element plus a balanced share."""
    n = 4
    chunks = create_assigned_data(data, n, method="volume_uniform")
    loads = [sum(len(pickle.dumps(x)) for x in c) for c in chunks]
    total = sum(loads)
    biggest = max(len(pickle.dumps(x)) for x in data)
    assert max(loads) <= total / n + biggest  # classic LPT-style bound


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40), st.text(max_size=40))
def test_minhash_permutation_is_injective_enough(a, b):
    """The md5→60-bit shingle id used by q36-q38 collides only when the
    md5 prefixes collide — equal inputs map equal, and the Python/md5
    semantics match what both engines compute."""
    import hashlib

    def sid(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    if a == b:
        assert sid(a) == sid(b)
    else:
        # not a guarantee of inequality (collisions allowed), but the ids
        # must be stable and 60-bit bounded
        assert 0 <= sid(a) < 2**60 and 0 <= sid(b) < 2**60
