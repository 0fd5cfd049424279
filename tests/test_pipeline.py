"""End-to-end curation pipeline: audit invariants over the composed
operators (each stage is individually hash-verified by the oracle suite;
this asserts the COMPOSITION is coherent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_framework_simple_spark.operators.dedup import norm_expr
from mapreduce_framework_simple_spark.pipeline import CONTAMINATION_MAX, curate


def test_curate_invariants(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    rep = curate(spark, sf_dir, out)

    # every stage is monotone non-increasing
    assert (
        rep["n_total"]
        >= rep["n_after_quality"]
        >= rep["n_after_exact_dedup"]
        >= rep["n_after_neardup"]
        >= rep["n_curated"]
        > 0
    )
    # INDEPENDENT recomputation of the stage counters — the report's
    # dropped_* keys are defined as differences of these very counters,
    # so asserting the "telescoping" arithmetic was a tautology that
    # could never fail; fresh recomputation from the source corpus can
    from mapreduce_framework_simple_spark.operators.text import q98_gopher_rules
    from mapreduce_framework_simple_spark.sources.io import load_table as _lt

    assert rep["n_total"] == _lt(spark, "documents", sf_dir).count()
    assert rep["n_after_quality"] == (
        q98_gopher_rules(spark, sf_dir).where(F.col("keep")).count()
    )

    curated = spark.read.parquet(out)
    assert curated.count() == rep["n_curated"]
    # exact-dedup counter: survivors-of-quality grouped by normalized
    # hash, recomputed from scratch (not the report's own groupBy)
    gated_ids = q98_gopher_rules(spark, sf_dir).where(F.col("keep")).select("doc_id")
    gated = _lt(spark, "documents", sf_dir).join(gated_ids, "doc_id")
    assert rep["n_after_exact_dedup"] == (
        gated.groupBy(F.md5(norm_expr()).alias("h")).count().count()
    )

    # no exact-dup pair survives: normalized-text hashes are unique
    dup_groups = (
        curated.groupBy(F.md5(norm_expr()).alias("h"))
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup_groups == 0

    # no LSH near-dup candidate pair survives among the curated docs
    from mapreduce_framework_simple_spark.pipeline import _lsh_pairs_from

    assert _lsh_pairs_from(curated).count() == 0

    # no survivor exceeds the contamination cut
    from mapreduce_framework_simple_spark.operators.dedup import shingle_sets_from
    from mapreduce_framework_simple_spark.sources.io import load_table

    docs = load_table(spark, "documents", sf_dir)
    probe = (
        shingle_sets_from(docs)
        .where(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    over = (
        shingle_sets_from(curated)
        .join(F.broadcast(probe), "shingle", "left")
        .groupBy("doc_id")
        .agg((F.count("hit") / F.count("*")).alias("c"))
        .where(F.col("c") > CONTAMINATION_MAX)
        .count()
    )
    assert over == 0


def test_curate_lsh_max_bucket_knob(spark, sf_dir, tmp_path):
    """The per-corpus hot-bucket cap knob plumbs through to the near-dup
    stage: at cap=1 every bucket holding >=2 docs is dropped, so no LSH
    candidate pair can be emitted and the near-dup stage drops nothing —
    while the default cap drops real near-dups on the same corpus."""
    rep_default = curate(spark, sf_dir, str(tmp_path / "cur_a"))
    rep_cap1 = curate(spark, sf_dir, str(tmp_path / "cur_b"), lsh_max_bucket=1)
    assert rep_default["dropped_neardup"] > 0  # the knob has something to tune
    assert rep_cap1["dropped_neardup"] == 0
    # all other stages unaffected by the knob
    for k in ("n_total", "n_after_quality", "n_after_exact_dedup",
              "dropped_quality", "dropped_exact"):
        assert rep_cap1[k] == rep_default[k]
