"""K-means convergence properties (rows-only query → behavioral tests)."""

from __future__ import annotations

from mapreduce_framework_simple_spark.operators.iterative import K, kmeans, q68_kmeans


def test_kmeans_converges_and_is_deterministic(spark, sf_dir):
    assigned, trace = kmeans(spark, sf_dir)
    # objective (mean cosine to assigned centroid) must improve overall
    assert trace[-1] >= trace[0] - 1e-9, f"objective regressed: {trace}"
    # deterministic: same seeding, same result
    df = q68_kmeans(spark, sf_dir).toPandas()
    df2 = q68_kmeans(spark, sf_dir).toPandas()
    assert df.equals(df2)
    # full partition of the corpus, no empty output
    assert df.n_members.sum() == 500
    assert len(df) <= K
