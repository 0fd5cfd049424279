"""Deterministic sampling operators over ``documents``.

A 100 TB training-data pipeline samples constantly — holdout splits,
per-source mixing ratios, quick-look subsets — and at that scale the
sample must be (a) a single filter pushed to the scan (no shuffle, no
global coordination) and (b) reproducible across engines and reruns.
``df.sample()`` is neither: its RNG is seed+partition-layout dependent,
so repartitioning changes the sample. Hash-based sampling — keep a row
iff ``hash(key) mod M < threshold`` — is stable under any layout, and is
the same trick the reference's size-balanced partitioner plays with
deterministic striping (Simple.pm:133-144: layout decided by a pure
function of the data, not by an RNG).

md5 is the shared hash (identical in Spark and DuckDB — same convention
as the dedup/MinHash modules), so every query here is value-hash
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec

from mapreduce_framework_simple_spark.registry import query
from mapreduce_framework_simple_spark.sources.io import load_table


def hash_bucket(col: Column, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets): md5 of the key's string form,
    first 4 hex digits as an integer, mod buckets. DuckDB twin:
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4))::BIGINT % buckets``."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("bigint")
    return h % buckets


def _duck_bucket(expr: str, buckets: int) -> str:
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 4))::BIGINT % {buckets}"


def md5_rank_window(partition_col: str, id_col: str) -> WindowSpec:
    """The ONE definition of the "top-K per stratum by hash permutation"
    ordering (q84 strata, q106 quotas): row_number over
    ``ORDER BY md5(CAST(id AS string)), id`` within the stratum — the
    md5 hex string is the shared pseudo-random permutation, the id the
    total tie-break. Centralized (like :func:`hash_bucket` for the
    bucket idiom) so a retune can never silently diverge one query from
    its oracle; the SQL twin is :func:`_duck_md5_rank`."""
    return Window.partitionBy(partition_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )


def _duck_md5_rank(partition_col: str, id_col: str) -> str:
    """DuckDB twin of :func:`md5_rank_window` (the OVER(...) body)."""
    return (f"PARTITION BY {partition_col} "
            f"ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}")


@query(
    "q83_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_duck_bucket("doc_id", 20)} = 0
    """,
)
def q83_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample: keep documents whose md5 bucket (of 20)
    is 0. Membership depends only on doc_id — stable across runs,
    partitionings, and engines.

    Scale: a scan-level filter — no shuffle, no state; the projection
    prunes to 3 columns at the parquet reader. On 100 TB this reads every
    row group once and emits 5%; nothing else moves."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.where(hash_bucket(F.col("doc_id"), 20) == 0).select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "q84_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT doc_id, lang,
             row_number() OVER ({_duck_md5_rank("lang", "doc_id")}) AS rnk
      FROM documents)
    WHERE rnk <= 5
    """,
)
def q84_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 5 documents per language, chosen by
    md5-rank — a deterministic stand-in for "uniform k per stratum"
    (the md5 hex ordering is the shared pseudo-random permutation, same
    convention as the MinHash module).

    Scale: one shuffle on the stratum key; Spark's WindowGroupLimit
    pushes the k=5 cut below the sort so each partition keeps a 5-row
    heap instead of materializing the stratum."""
    docs = load_table(spark, "documents", sf_dir)
    w = md5_rank_window("lang", "doc_id")
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "lang", F.col("rnk").cast("bigint").alias("rnk"))
    )


@query(
    "q85_dataset_mix",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE {_duck_bucket("doc_id", 100)}
          < ('0x' || substr(md5(source), 1, 2))::BIGINT % 91 + 5
    """,
)
def q85_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: every source gets its own sampling rate (5–95%,
    derived here deterministically from md5(source) so the query is
    self-contained at any scale factor) and each document is kept iff its
    own hash bucket falls under its source's rate — the standard way a
    training pipeline blends corpora at per-source ratios.

    Scale: pure row-local filter, no shuffle; with a real rate table the
    rates join in as a broadcast. Membership is layout-independent, so
    the same mix reproduces on any cluster."""
    docs = load_table(spark, "documents", sf_dir)
    rate = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 2), 16, 10).cast("bigint") % 91 + 5
    )
    return docs.where(hash_bucket(F.col("doc_id"), 100) < rate).select(
        "doc_id", "source", "lang"
    )


@query(
    "q106_source_quota",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER ({_duck_md5_rank("source", "doc_id")}) AS rk
        FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 12
    """,
)
def q106_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota downsampling: cap every source at K=12 documents,
    chosen by md5(doc_id) rank — how a pipeline rebalances a corpus where
    one crawl dominates (quota-capping overrepresented domains). The
    hash-order rank makes the winners a deterministic uniform sample of
    each source, not "whatever sorted first".

    Scale: one shuffle on source. A window over a giant skewed source
    would bottleneck on its single partition, so the plan pre-prunes with
    an AQE-friendly shape: rows are ranked only within each source and
    the filter is pushed into the window via WindowGroupLimit (Spark's
    top-k-per-group rewrite keeps at most K rows per source per map task
    before the shuffle)."""
    docs = load_table(spark, "documents", sf_dir)
    w = md5_rank_window("source", "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 12)
        .withColumn("rk", F.col("rk").cast("long"))
    )


@query(
    "q124_weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               -- Efraimidis-Spirakis: rank by ln(u)/w, u = deterministic
               -- md5 uniform in (0,1); larger key = more likely kept
               round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
                        / 4294967297.0) / n_chars, 12) AS es_key
        FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY es_key DESC, doc_id) AS rk
          FROM keyed)
    WHERE rk <= 50
    """,
)
def q124_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis): keep
    the top-50 documents by ln(u)/weight where u is a DETERMINISTIC
    md5-derived uniform and weight = n_chars — longer documents
    proportionally likelier, yet the sample is reproducible across runs,
    layouts, and engines (the same layout-independence contract as q83,
    extended to weighted draws; this is how a pipeline takes a
    length-weighted corpus sample for inspection or eval).

    Determinism note: the ES key uses ln/division — transcendental — and
    with UNEQUAL weights two documents' keys can in principle land
    arbitrarily close, so the key is rounded to 12 dp before ranking
    (identical rounding in both engines; exact ties then break on
    doc_id) — a 1-ULP libm difference can no longer reorder the rank-50
    boundary. The emitted columns are all integers.

    Scale: key is a row-local expression; global top-k plans as
    TakeOrderedAndProject (no full sort); at 100 TB the same key feeds a
    per-partition top-k then a 50-row driver merge."""
    docs = load_table(spark, "documents", sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967297.0
    # try_divide: an empty doc (n_chars = 0) would abort the whole query
    # under ANSI mode (Spark 4 default), while the DuckDB oracle's plain
    # / yields NULL (the row then sorts after every real key — DESC
    # NULLS LAST — i.e. a zero-weight doc is never sampled, the ES
    # semantics for weight → 0)
    es_key = F.round(F.try_divide(F.log(u), F.col("n_chars")), 12)
    w = Window.orderBy(F.desc(es_key), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", es_key.alias("es_key"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 50)
        .drop("es_key")
    )
