"""Physical-layout operators: bucketing and skew salting.

These are the two storage/shuffle levers the relational queries point at
in docs/SCALE.md:

* **Bucketing** deletes the fact⋈fact exchange entirely: write both
  tables bucketed+sorted by the join key and Spark plans a zip-join of
  co-located buckets — the difference between shuffling TBs and
  shuffling nothing on every subsequent join. (The reference has no
  storage layer at all, so this is pure north-star surface.)
* **Salting** splits a hot key across `salt_n` sub-keys so one skewed
  customer/user cannot serialize a stage behind a single straggler task.
  AQE skew-join handles sort-merge cases automatically; explicit salting
  remains the tool for broadcast-ineligible skewed aggregations and for
  engines/pipelines where AQE is off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_col: str, n_buckets: int = 32,
                   sort_col: str | None = None) -> None:
    """Persist as a bucketed + sorted managed table; joins/aggregations
    keyed on ``bucket_col`` between same-bucketed tables need no exchange.

    Buckets are ALWAYS sorted — ``sort_col=None`` means "sort by
    ``bucket_col``", not "unsorted": sorted buckets are what let the
    bucketed sort-merge join skip its per-task Sort as well as the
    exchange (asserted in tests/test_layout.py)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two pre-bucketed tables on their bucket key (exchange-free —
    asserted in tests/test_layout.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_agg(df: DataFrame, key: str, agg_exprs: list, salt_n: int = 16,
               salt_cols: list[str] | None = None) -> DataFrame:
    """Two-phase skew-proof aggregation: partial-agg on (key, salt), then
    final-agg on key. Correct for decomposable aggregates (sum/count/min/
    max); the partial pass bounds any single task's share of a hot key to
    1/salt_n.

    ``agg_exprs``: list of (col_expr, partial_fn, final_fn, name) where
    partial/final are e.g. (F.sum, F.sum) for sum or (F.count, F.sum)
    for count.

    The salt is a CONTENT hash of the row, never rand(): a seeded rand
    is still partition-layout- and row-order-dependent, so a task retry
    after a fetch failure would re-draw different salts — reducers that
    already consumed the old map output keep stale (key, salt) partials
    while re-run ones see the new assignment, double-counting or
    dropping hot-key rows (the determinism rule sampling.py documents;
    dedup.py salts the same way). Exact-duplicate rows share a salt —
    acceptable here: duplicates of a hot key collapse in the partial agg
    anyway. ``salt_cols`` restricts the hash to named columns (unique id
    spreading, or frames with xxhash64-unhashable map columns).
    """
    if "_salt" in df.columns:  # withColumn would silently overwrite it
        raise ValueError("salted_agg: input already has a '_salt' column "
                         "(reserved); rename it before salting")
    salt_src = salt_cols if salt_cols is not None else df.columns
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(salt_n)).alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        *[pf(expr).alias(f"_p_{name}") for expr, pf, _, name in agg_exprs]
    )
    return partial.groupBy(key).agg(
        *[ff(F.col(f"_p_{name}")).alias(name) for _, _, ff, name in agg_exprs]
    )


def salted_join(skewed: DataFrame, skew_key: str, small: DataFrame,
                small_key: str, salt_n: int = 16,
                salt_cols: list[str] | None = None) -> DataFrame:
    """Skew-proof equi-join: salt the skewed side with a shard id,
    explode the small side across all shard ids, join on (key, salt).
    Output rows identical to the plain join; the hot key's rows spread
    over ``salt_n`` tasks instead of one. The shard id is a row-content
    hash, not rand() — see salted_agg for why a seeded rand is not
    retry-safe.

    Content-hash caveats: EXACT-duplicate rows share a salt, so a hot
    key made of identical repeated rows still lands in one shard — pass
    ``salt_cols`` naming a unique (or high-cardinality) column to spread
    those, and dedupe truly-identical rows upstream if they are
    semantically one row. ``salt_cols`` is also the escape hatch for
    frames with unhashable column types (xxhash64 rejects maps)."""
    if "_salt" in skewed.columns or "_salt" in small.columns:
        raise ValueError("salted_join: an input already has a '_salt' column "
                         "(reserved); rename it before salting — withColumn "
                         "would overwrite it and the final drop would eat it")
    salt_src = salt_cols if salt_cols is not None else skewed.columns
    salted_big = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt_n))
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    joined = salted_big.join(
        exploded_small,
        (salted_big[skew_key] == exploded_small[small_key])
        & (salted_big["_salt"] == exploded_small["_salt"]),
    )
    return joined.drop("_salt")


def upsert_parquet(spark: SparkSession, target_path: str, updates: DataFrame,
                   key: str) -> None:
    """MERGE/upsert into a parquet dataset: rows in ``updates`` replace
    target rows with the same ``key``; unmatched update rows are inserted.

    Plain parquet has no transactional MERGE (that is a table-format
    feature — Delta/Iceberg/Hudi), so this is the rewrite formulation:
    anti-join the target against the update keys, union the updates, and
    atomically swap via overwrite. At 100 TB the same operator runs
    per-partition: partition the target by a key prefix (write_parquet's
    partition_by), derive the touched partitions from the update set, and
    rewrite only those — the anti-join side then reads a pruned subset,
    not the whole table.

    The update side is broadcast (updates ≪ target in any real upsert),
    so the target pass is one map-side anti-join — no shuffle of the
    target.

    Durability: the merged result is written to a sibling staging path
    and swapped in with filesystem renames THROUGH THE HADOOP FS API (so
    the same code path works on local paths, HDFS, and anything else
    Spark can write to), and the original dataset stays on disk as
    ``<target>.backup`` until the new data is in place — a crash before
    the swap leaves the target untouched, a crash mid-swap is recovered
    on the next call (the backup is restored before reading). The rename
    pair is still not a single atomic operation; object stores without
    atomic rename need a transactional table format (Delta/Iceberg/Hudi)
    for true atomic MERGE."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    def _p(s: str):
        return jvm.org.apache.hadoop.fs.Path(s)

    target = target_path.rstrip("/")
    staging, backup = target + ".staging", target + ".backup"
    fs = _p(target).getFileSystem(hconf)
    # crash recovery: a previous call that renamed target→backup but died
    # before promoting staging left no target — restore the backup
    if not fs.exists(_p(target)) and fs.exists(_p(backup)):
        if not fs.rename(_p(backup), _p(target)):
            raise IOError(f"upsert recovery: cannot restore {backup} → {target}")

    current = spark.read.parquet(target)
    # updates feeds THREE computations (the validation aggregate, the
    # anti-join's broadcast key set, the merge write) — cached for the
    # call so an expensive update lineage computes once, unpersisted in
    # the finally (this is a sink, fully materialized before return).
    # UNLESS the caller already persisted it: cache() on a cached
    # handle is a no-op on the SAME handle, so the finally's unpersist
    # would silently drop the CALLER's persisted data (their later
    # actions recompute — slow, not wrong). Caller-cached frames keep
    # caller-owned lifetime.
    sl = updates.storageLevel
    caller_cached = sl.useMemory or sl.useDisk
    if not caller_cached:
        updates = updates.cache()
    try:
        # MERGE contract, ONE validation job for both rules (each used
        # to be its own job over the full updates lineage):
        # * at most one update row per key — duplicates would silently
        #   land BOTH rows after the anti-join, corrupting
        #   key-uniqueness for every later upsert (Delta/DuckDB MERGE
        #   error on multiple matches too);
        # * no NULL keys — the anti-join's NULL = NULL never matches, so
        #   a NULL-key target row would be RETAINED and the NULL-key
        #   update row inserted BESIDE it (Delta MERGE conditions reject
        #   NULL the same way, by never matching).
        bad = (
            updates.groupBy(key)
            .agg(F.count("*").alias("n"))
            .where((F.col("n") > 1) | F.col(key).isNull())
            .limit(1)
            .collect()
        )
        if bad:
            if bad[0][key] is None:
                raise ValueError(
                    f"upsert: updates batch has a NULL {key}; NULL join "
                    "keys never match — assign real keys before merging"
                )
            raise ValueError(
                f"upsert: updates batch has multiple rows for {key}="
                f"{bad[0][key]!r}; deduplicate the batch before merging"
            )
        remaining = current.join(
            F.broadcast(updates.select(key).distinct()), key, "left_anti"
        )
        merged = remaining.unionByName(updates.select(*current.columns))
        try:
            # staging write reads the ORIGINAL target path — no
            # self-overwrite
            merged.write.mode("overwrite").parquet(staging)
            if fs.exists(_p(backup)):
                fs.delete(_p(backup), True)
            if not fs.rename(_p(target), _p(backup)):
                raise IOError(f"upsert swap: cannot move {target} aside")
            if not fs.rename(_p(staging), _p(target)):
                # put the original back rather than leaving no dataset —
                # and report what ACTUALLY happened if that rename fails
                # too (the next call's recovery branch restores the
                # backup then)
                restored = fs.rename(_p(backup), _p(target))
                raise IOError(
                    f"upsert swap: cannot promote {staging}; "
                    + ("original restored"
                       if restored
                       else f"RESTORE ALSO FAILED — data is intact at "
                            f"{backup} and the next upsert call restores it")
                )
        except BaseException:
            # never strand a table-sized .staging copy: a failed merge
            # write or swap used to leave it on disk forever, making the
            # disk pressure that (often) caused the failure permanently
            # worse. After a successful promote the path no longer
            # exists and this delete is a no-op; the merged data is
            # always reproducible from the (intact) original + updates.
            try:
                fs.delete(_p(staging), True)
            except Exception:
                pass
            raise
        fs.delete(_p(backup), True)
    finally:
        if not caller_cached:
            updates.unpersist(blocking=False)


def write_range_partitioned(df: DataFrame, path: str, col: str,
                            n_files: int = 8) -> None:
    """Range-partitioned sorted write: global range-shuffle on ``col``,
    sort within each output file, so every file covers a disjoint value
    range and its parquet footer min/max statistics are tight.

    This is the data-skipping layout: a later read filtered on ``col``
    prunes to the one or two files whose range intersects the predicate
    (row-group skipping via footer stats), instead of scanning all files.
    At 100 TB the same pattern is the difference between a full-table
    scan and touching a handful of files for any range query on the sort
    key."""
    (df.repartitionByRange(n_files, F.col(col))
       .sortWithinPartitions(col)
       .write.mode("overwrite").parquet(path))
