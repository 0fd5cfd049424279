"""Iterative algorithms on DataFrames — k-means over the embeddings
table.

SURVEY.md flags "iterative algorithms" as the genuinely
non-SQL-expressible corner of the surface (the driver records a weaker
rows-only check; convergence properties are asserted in
tests/test_iterative.py instead).

Spark-first shape of an iteration:

* centroids live on the DRIVER between iterations (K × dim doubles —
  tiny), and ride into each assignment pass via the mapInPandas closure
  (an implicit broadcast);
* each iteration is one distributed pass: vectorized assignment (numpy
  argmax of cosine against the centroid matrix per Arrow batch) feeding
  a groupBy(cluster) mean — partial aggregation keeps the shuffle at
  K × dim per partition;
* the loop is driver-side Python, exactly how MLlib structures Lloyd's
  algorithm. At 100 TB: same code, plus persisting the input once up
  front so ten iterations scan memory/SSD instead of object storage.

The reference could express this only as repeated whole map_reduce
calls with the model shipped inside the mapper source each round
(Simple.pm:164) — the structure here is identical, minus the re-eval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_simple_spark.registry import query
from mapreduce_framework_simple_spark.sources.io import load_table

K = 8
N_ITER = 5


def _assign(df: DataFrame, centroids) -> DataFrame:
    """One assignment pass: nearest centroid by cosine, vectorized."""
    import numpy as np

    cent = np.asarray(centroids, dtype="float64")
    cent_unit = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
            unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = unit @ cent_unit.T
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(dtype="int64"),
                "embedding": pdf["embedding"],
                "cluster": sims.argmax(axis=1).astype("int32"),
                "sim": sims.max(axis=1),
            })

    return df.mapInPandas(
        run, "vec_id long, embedding array<float>, cluster int, sim double"
    )


def kmeans(spark: SparkSession, sf_dir: str, k: int = K,
           n_iter: int = N_ITER) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means (cosine flavor) with deterministic seeding (every
    (N/k)-th vector). Returns (final assignments DataFrame, per-iteration
    mean-similarity trace — monotone non-decreasing up to fp noise)."""
    em = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    em = em.persist()
    n = em.count()
    stride = max(n // k, 1)
    seeds = (
        em.where(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(k)
        .toPandas()["embedding"]
        .tolist()
    )
    centroids = [list(map(float, s)) for s in seeds]
    trace: list[float] = []
    assigned = None
    for _ in range(n_iter):
        assigned = _assign(em, centroids)
        agg = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.avg(F.element_at(F.col("embedding"), i + 1).cast("double")).alias(f"c{i}")
                    for i in range(len(centroids[0]))
                ],
                F.avg("sim").alias("mean_sim"),
                F.count("*").alias("n_members"),
            )
            .toPandas()
            .sort_values("cluster")
        )
        trace.append(float((agg["mean_sim"] * agg["n_members"]).sum() / agg["n_members"].sum()))
        new_centroids = list(centroids)
        for _, row in agg.iterrows():
            new_centroids[int(row["cluster"])] = [
                float(row[f"c{i}"]) for i in range(len(centroids[0]))
            ]
        centroids = new_centroids
    em.unpersist()
    return assigned, trace


@query("q68_kmeans")  # rows-only: iterative, not SQL-expressible (SURVEY §2.3)
def q68_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster sizes + cohesion after 5 iterations (deterministic
    seeding ⇒ deterministic output; the oracle-less rows-only check is
    backed by the convergence test in tests/test_iterative.py)."""
    assigned, _ = kmeans(spark, sf_dir)
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n_members"), F.round(F.avg("sim"), 6).alias("mean_sim"))
        .orderBy("cluster")
    )
