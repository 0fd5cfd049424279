"""Hyperplane-LSH near-dup: recall on planted near-duplicates (the
testdata embeddings top out at cos≈0.55, below the near-dup regime LSH
targets, so duplicates are planted: base vectors + tiny noise)."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_framework_simple_spark.operators.similarity import hyperplane_lsh_pairs


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(200, 64)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant 40 near-dups: copy of vector i with 1% noise, cos > 0.99
    for j in range(40):
        v = base[j] + 0.01 * rng.randn(64)
        rows.append((1000 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = {(j, 1000 + j) for j in range(40)}
    return df, truth


def test_lsh_recall_on_planted_dups(spark, planted):
    df, truth = planted
    got = hyperplane_lsh_pairs(df, threshold=0.95).toPandas()
    found = set(zip(got.vec_a, got.vec_b))
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f}, found {len(found)} pairs"
    # verification step keeps precision perfect at this threshold
    assert all((a, b) in truth or abs(a - b) != 1000 for a, b in found)


def test_lsh_no_false_positives_above_threshold(spark, planted):
    df, truth = planted
    got = hyperplane_lsh_pairs(df, threshold=0.95).toPandas()
    # every reported pair really has cos >= 0.95 (verified, not just bucketed)
    assert (got.cos_sim >= 0.95).all()
