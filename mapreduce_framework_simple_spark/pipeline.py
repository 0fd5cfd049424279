"""End-to-end training-data curation pipeline.

Composes the declared operators into the pass a pretraining pipeline
actually runs over a raw corpus, in the standard order (cheap row-local
gates first, pairwise-ish work last, every stage narrowing the next
stage's input):

1. **quality gate** — Gopher-style integer-threshold rules (q98);
2. **exact dedup** — keep min doc_id per normalized-text hash (q35);
3. **near-dup collapse** — MinHash-LSH pairs → connected components →
   keep each component's representative (q38/q79/q89);
4. **decontamination** — drop docs overlapping the benchmark probe set
   above a shingle-containment threshold (q91);
5. **curated write** — parquet of survivors + a one-row audit report.

Every stage is the SAME operator the oracle suite hash-verifies
individually; the composition test (tests/test_pipeline.py) asserts the
audit invariants (stage counts telescope; survivors contain no exact-dup
pair and no near-dup pair; no survivor exceeds the contamination cut).

Scale: stage order is the scale argument — the quality gate is a
map-side filter that typically removes a large corpus fraction before
any shuffle; exact dedup is one 16-byte-key shuffle; the LSH stages run
on the doubly-thinned corpus; decontamination broadcasts the (tiny)
probe set. Nothing here collects the corpus to the driver; the report is
a handful of scalar aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_simple_spark.operators.dedup import (
    band_signatures_from,
    connected_components,
    lsh_candidate_pairs,
    norm_expr,
    shingle_sets_from,
)
from mapreduce_framework_simple_spark.operators.text import q98_gopher_rules
from mapreduce_framework_simple_spark.sources.io import load_table

CONTAMINATION_MAX = 0.5  # drop docs with > 50% probe-shingle overlap


def _lsh_pairs_from(docs: DataFrame) -> DataFrame:
    """q38's banded candidate join over an arbitrary (doc_id, text) frame
    — same candidate rule as the oracle-verified query (shared helper)."""
    return lsh_candidate_pairs(band_signatures_from(docs))


def curate(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Run the full curation pass; write survivors to ``out_dir`` and
    return the audit report (python ints — driver-sized by construction).

    Audit counts ride the pipeline's OWN jobs via ``df.observe``
    (Spark's Observation metrics): each stage boundary carries a
    count-metric node that fires when that stage first materializes —
    populating its cache for the next stage — so the report costs ZERO
    extra passes over any stage frame. (The previous shape ran a driver
    ``count()`` per stage: free while the caches fit, five extra corpus
    scans at 100 TB once they don't.) The only driver actions are the
    convergence checks inside connected_components (tiny label frames,
    algorithmically required) and the final parquet write."""
    from pyspark.sql import Observation

    obs = {
        name: Observation(f"curate_{name}")
        for name in ("total", "quality", "exact", "neardup", "curated")
    }

    def observed(df: DataFrame, name: str) -> DataFrame:
        return df.observe(obs[name], F.count(F.lit(1)).alias("n"))

    docs = observed(load_table(spark, "documents", sf_dir), "total").cache()

    # 1. quality gate (q98's keep flag, broadcast back onto the corpus —
    #    at scale the flag computation IS the corpus pass, so this join
    #    is written id-to-id and stays a single shuffle)
    keep_ids = q98_gopher_rules(spark, sf_dir).where(F.col("keep")).select("doc_id")
    gated = observed(docs.join(keep_ids, "doc_id"), "quality").cache()

    # 2. exact dedup: keep min doc_id per normalized-text hash
    exact_keep = (
        gated.groupBy(F.md5(norm_expr()).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact = observed(gated.join(exact_keep, "doc_id"), "exact").cache()

    # 3. near-dup collapse on the thinned corpus: LSH pairs → components
    #    → drop non-representatives (the tiny drop list broadcasts).
    #    connected_components' convergence counts materialize `exact`
    #    (and its ancestors) here, firing the total/quality/exact
    #    observations while populating the caches every later stage hits.
    pairs = _lsh_pairs_from(exact)
    comp = connected_components(pairs)
    drop = comp.where(F.col("doc_id") != F.col("component")).select("doc_id")
    neardup_free = observed(
        exact.join(F.broadcast(drop), "doc_id", "left_anti"), "neardup"
    ).cache()

    # 4. decontamination: probe = benchmark stand-in (doc_id % 97 == 0
    #    over the ORIGINAL corpus — the benchmark is external, curation
    #    must not thin it); drop survivors above the containment cut
    sh_all = shingle_sets_from(docs)
    probe = (
        sh_all.where(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    sh_surv = shingle_sets_from(neardup_free)
    contaminated = (
        sh_surv.join(F.broadcast(probe), "shingle", "left")
        .groupBy("doc_id")
        .agg((F.count("hit") / F.count("*")).alias("contamination"))
        .where(F.col("contamination") > CONTAMINATION_MAX)
        .select("doc_id")
    )
    curated = observed(
        neardup_free.join(F.broadcast(contaminated), "doc_id", "left_anti"), "curated"
    )
    # the ONE corpus-wide action: the durable write fires the curated
    # (and any not-yet-fired upstream) observations
    curated.write.mode("overwrite").parquet(out_dir)

    counts = {name: int(o.get["n"]) for name, o in obs.items()}
    report = {
        "n_total": counts["total"],
        "n_after_quality": counts["quality"],
        "n_after_exact_dedup": counts["exact"],
        "n_after_neardup": counts["neardup"],
        "n_curated": counts["curated"],
        "dropped_quality": counts["total"] - counts["quality"],
        "dropped_exact": counts["quality"] - counts["exact"],
        "dropped_neardup": counts["exact"] - counts["neardup"],
        "dropped_contaminated": counts["neardup"] - counts["curated"],
    }
    for d in (docs, gated, exact, neardup_free):
        d.unpersist()
    return report
