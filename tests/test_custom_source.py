"""Custom Python DataSource connector (synthetic events)."""

from __future__ import annotations

from mapreduce_framework_simple_spark.sources import synthetic


def _load(spark, **opts):
    synthetic.register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_generates_requested_rows(spark):
    df = _load(spark, rows=5000, partitions=8, seed=42)
    assert df.count() == 5000
    assert set(df.columns) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert df.rdd.getNumPartitions() == 8


def test_source_is_deterministic(spark):
    a = _load(spark, rows=1000, partitions=4, seed=7).toPandas().sort_values("event_id")
    b = _load(spark, rows=1000, partitions=4, seed=7).toPandas().sort_values("event_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    c = _load(spark, rows=1000, partitions=4, seed=8).toPandas().sort_values("event_id")
    assert not a.reset_index(drop=True).equals(c.reset_index(drop=True))


def test_source_composes_with_engine_ops(spark):
    from pyspark.sql import functions as F

    df = _load(spark, rows=2000, partitions=4, seed=42)
    agg = df.groupBy("event_type").agg(F.count("*").alias("n")).toPandas()
    assert agg.n.sum() == 2000
    assert len(agg) == 5


def test_source_filter_pushdown(spark):
    from pyspark.sql import functions as F

    df = _load(spark, rows=2000, partitions=4, seed=42)
    clicks = df.where(F.col("event_type") == "click")
    pdf = clicks.toPandas()
    assert (pdf.event_type == "click").all()
    # pushdown result must equal the post-hoc filter of the full scan
    full = _load(spark, rows=2000, partitions=4, seed=42).toPandas()
    assert len(pdf) == (full.event_type == "click").sum()


def test_source_streaming_reader(spark, tmp_path):
    """The same connector as a micro-batch stream: 3 bounded batches
    drain under availableNow, rows deterministic per (seed, offset)."""
    synthetic.register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 100)
        .option("partitions", 2)
        .option("batches", 3)
        .option("seed", 42)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT count(*) n, count(DISTINCT event_id) d FROM t_synth_stream"
    ).collect()[0]
    assert got["n"] == 300
    assert got["d"] == 300


def test_validate_schema_checks_types(spark, sf_dir):
    """validate_schema enforces NAMES and TYPES (a string 'value' column
    must fail loudly, not deep inside a query), while accepting the
    documented timestamp/timestamp_ntz physical variance on every
    shipped table."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_framework_simple_spark.sources.io import (
        TABLES,
        load_table,
        validate_schema,
    )

    for t in TABLES:
        validate_schema(load_table(spark, t, sf_dir), t)  # all pass as-is

    ev = load_table(spark, "events", sf_dir).withColumn(
        "value", F.col("value").cast("string")
    )
    with pytest.raises(ValueError, match="dtype drift"):
        validate_schema(ev, "events")
    with pytest.raises(ValueError, match="missing columns"):
        validate_schema(ev.drop("props"), "events")
    # additive evolution: an undeclared EXTRA column is accepted (with a
    # warning) — declared queries prune it, so failing would block every
    # benign schema evolution of the input
    validate_schema(
        load_table(spark, "events", sf_dir).withColumn("extra", F.lit(1)),
        "events",
    )


def test_ntz_normalization_pins_utc_on_non_events_tables(spark, tmp_path):
    """_normalize_ntz's NTZ→TIMESTAMP cast is value-exact only under a
    UTC session: a NON-events table with an NTZ column loaded on a
    non-UTC session must pin UTC too (the pin used to live only on the
    events branch, so orders/lineitem loads silently shifted instants
    by the zone offset)."""
    import pandas as pd

    from mapreduce_framework_simple_spark.sources.io import load_table

    sf = tmp_path / "ntzsf"
    sf.mkdir()
    pdf = pd.DataFrame(
        {
            "o_orderkey": [1],
            "o_custkey": [1],
            "o_orderstatus": ["O"],
            "o_totalprice": [10.0],
            # pandas→parquet writes TIMESTAMP(isAdjustedToUTC=false):
            # surfaces as timestamp_ntz in Spark
            "o_orderdate": [pd.Timestamp("2024-06-01 12:00:00")],
            "o_orderpriority": ["1-URGENT"],
        }
    )
    # micros, not pandas' default nanos: TIMESTAMP(NANOS) would read as
    # bigint under the engine's nanosAsLong conf instead of surfacing
    # the timestamp_ntz this test targets
    pdf.to_parquet(sf / "orders.parquet", coerce_timestamps="us")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_table(spark, "orders", str(sf))
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert dict(df.dtypes)["o_orderdate"] == "timestamp"
        got = df.toPandas()["o_orderdate"][0]
        assert got == pd.Timestamp("2024-06-01 12:00:00"), got
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_pushdown_conjunction_of_equalities(spark):
    """pushFilters' contract is the AND of the accepted filters: two
    different pushed event_type equalities are unsatisfiable and must
    yield 0 rows — keeping only the last one silently dropped the
    earlier pushed-and-trusted predicate."""
    from pyspark.sql import functions as F

    synthetic.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 500).option("seed", 7).load()
        .where(F.col("event_type") == "view")
        .where(F.col("event_type") == "click")
    )
    assert df.count() == 0


def test_row_content_independent_of_partitioning(spark):
    """The generator's documented invariant: the (global-row-range →
    rows) mapping is identical however the range is split. The same
    (rows, seed) with different partition counts must produce the
    IDENTICAL table — the property every stream-vs-batch content
    comparison rests on."""
    synthetic.register(spark)

    def table(parts):
        return (
            spark.read.format("synthetic_events")
            .option("rows", 300).option("seed", 11)
            .option("partitions", parts).load()
            .toPandas().sort_values("event_id").reset_index(drop=True)
        )

    assert table(1).equals(table(4))
    assert table(4).equals(table(7))
