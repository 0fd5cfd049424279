"""Multimodal plumbing + source/sink round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_framework_simple_spark.operators.multimodal import (
    decode_image_meta,
    with_binary_payload,
)
from mapreduce_framework_simple_spark.sources.io import (
    load_table,
    read_csv,
    read_json,
    write_parquet,
)


def test_real_decode_flags_undecodable_bytes(spark, sf_dir):
    """The REAL decode path (default since round 11) over bytes that are
    NOT a PNG (documents.text as payload) must not fake anything and
    must not fail the query: every row comes back decode_ok=False with
    NULL dims but a real n_bytes — decode loss is queryable, never
    silent (module doc's error-semantics contract)."""
    docs = with_binary_payload(load_table(spark, "documents", sf_dir))
    pdf = decode_image_meta(docs).toPandas()
    has_payload = pdf.n_bytes.notna()
    assert has_payload.any()
    assert (pdf.loc[has_payload, "decode_ok"] == False).all()  # noqa: E712
    assert pdf.loc[has_payload, "width"].isna().all()
    assert (pdf.loc[has_payload, "n_bytes"] > 0).all()


def test_fake_decode_is_deterministic_and_typed(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, "documents", sf_dir))
    a = decode_image_meta(docs, fake=True).toPandas().sort_values("doc_id")
    b = decode_image_meta(docs, fake=True).toPandas().sort_values("doc_id")
    assert (a.reset_index(drop=True) == b.reset_index(drop=True)).all().all()
    assert a.width.between(1, 64).all() and a.height.between(1, 64).all()
    assert (a.channels == 3).all()
    assert (a.n_bytes > 0).all()
    # the executor closure duplicates _fake_decode by necessity (it must
    # be cloudpickle-self-contained); pin the two copies output-identical
    # so editing one without the other fails here instead of drifting
    from mapreduce_framework_simple_spark.operators.multimodal import (
        _fake_decode,
    )

    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in docs.select("doc_id", "payload").collect()
    }
    for row in a.itertuples():
        w, h, c = _fake_decode(payloads[row.doc_id])
        assert (row.width, row.height, row.channels) == (w, h, c)


def test_binary_payload_is_binary(spark, sf_dir):
    docs = with_binary_payload(load_table(spark, "documents", sf_dir))
    assert isinstance(docs.schema["payload"].dataType, T.BinaryType)


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out.parquet")
    df = load_table(spark, "nation", sf_dir)
    write_parquet(df, out, partition_by=("n_regionkey",))
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    # partition pruning works on the partitioned sink
    pruned = back.where(F.col("n_regionkey") == 1)
    assert pruned.count() == df.where(F.col("n_regionkey") == 1).count()


def test_csv_json_sources_roundtrip(spark, tmp_path):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], schema)
    csv_path = str(tmp_path / "t.csv")
    json_path = str(tmp_path / "t.json")
    df.coalesce(1).write.option("header", True).csv(csv_path)
    df.coalesce(1).write.json(json_path)
    assert sorted(read_csv(spark, csv_path, schema).collect()) == sorted(df.collect())
    assert sorted(read_json(spark, json_path, schema).collect()) == sorted(df.collect())


def test_in_memory_source(spark):
    """≙ the reference's only source: a caller-built in-memory array
    (Simple.pm:536-546)."""
    data = [(i, float(i) * 1.5) for i in range(100)]
    df = spark.createDataFrame(data, "id long, v double")
    assert df.agg(F.sum("v")).collect()[0][0] == sum(v for _, v in data)


def test_resize_real_and_fake_paths(spark, sf_dir):
    from mapreduce_framework_simple_spark.operators.multimodal import resize_images

    docs = with_binary_payload(load_table(spark, "documents", sf_dir))
    # the REAL path over non-PNG bytes NULLs the row instead of failing
    real = resize_images(docs.limit(5), 32, 32).toPandas()
    assert real.payload.isna().all() and real.width.isna().all()
    out = resize_images(docs, 32, 32, fake=True)
    assert isinstance(out.schema["payload"].dataType, T.BinaryType)
    pdf = out.toPandas()
    assert (pdf.width == 32).all() and (pdf.height == 32).all()
    assert pdf.payload.map(len).eq(20).all()  # md5 + 2x2 dim bytes


def test_audio_features_real_and_fake_paths(spark, sf_dir):
    from mapreduce_framework_simple_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = with_binary_payload(load_table(spark, "documents", sf_dir))
    # the REAL path over non-WAV bytes NULLs the row instead of failing
    real = extract_audio_features(docs.limit(5)).toPandas()
    assert real.duration_s.isna().all() and real.mfcc.isna().all()
    pdf = extract_audio_features(docs, fake=True).toPandas()
    assert pdf.mfcc.map(len).eq(13).all()
    assert pdf.duration_s.gt(0).all()
    assert pdf.rms.between(0, 1).all()


def test_null_payload_propagates_as_null(spark):
    """NULL-text documents (a class production crawls contain —
    test_properties pins the same contract for the text operators) must
    decode to NULL metadata/features in every kernel, never TypeError
    the whole query; the q70 oracle NULL-propagates identically."""
    from mapreduce_framework_simple_spark.operators.multimodal import (
        decode_image_meta,
        extract_audio_features,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "real text"), (2, None)], "doc_id long, text string"
    )
    payload = with_binary_payload(docs)

    meta = {r["doc_id"]: r for r in decode_image_meta(payload, fake=True).collect()}
    assert meta[1]["width"] is not None and meta[1]["channels"] == 3
    assert all(meta[2][c] is None for c in ("n_bytes", "width", "height", "channels"))

    rz = {r["doc_id"]: r for r in resize_images(payload, 32, 32, fake=True).collect()}
    assert rz[1]["payload"] is not None and rz[1]["width"] == 32
    assert rz[2]["payload"] is None and rz[2]["width"] is None

    au = {r["doc_id"]: r
          for r in extract_audio_features(payload, fake=True).collect()}
    assert au[1]["mfcc"] is not None
    assert au[2]["duration_s"] is None and au[2]["mfcc"] is None
