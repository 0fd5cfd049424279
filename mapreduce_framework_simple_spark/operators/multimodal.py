"""Multimodal column handling: opaque binary payloads + typed metadata.

North-star surface (no reference equivalent — the closest is the
reference's "any blessed object in the data" Storable path,
Simple.pm:733-751, which we type as BinaryType instead of schema-less).

Design for 100 TB:

* media lives in a ``binary`` column (or object-store URIs + byte ranges),
  metadata in typed sibling columns — so relational pruning/filtering
  happens WITHOUT touching bytes, and the scan only materializes payloads
  for rows that survive predicates;
* decode / feature-extract run as ``mapInPandas`` over Arrow batches —
  one Python worker per partition, bytes never pass through the driver;
* actual codec work (PIL/ffmpeg/torchaudio) is STUBBED here (libs absent
  in this container, per task brief): ``decode_image_meta`` raises
  NotImplementedError unless ``fake=True``, whose deterministic
  md5-derived pseudo-decoder keeps the Spark-side plumbing (schema,
  batching, partitioning) real and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_framework_simple_spark.registry import query
from mapreduce_framework_simple_spark.sources.io import load_table

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decoder: md5(payload) → (width, height, ch).

    Stands in for PIL.Image.open(); same bytes → same "image shape" on
    every executor, which is what the plumbing tests need.

    NOTE: this is the REFERENCE implementation; the copy that actually
    runs lives inside decode_image_meta's closure (which must be
    self-contained for cloudpickle — it cannot reference this module's
    globals). test_fake_decode_is_deterministic_and_typed asserts the
    two stay output-identical, so editing one without the other fails
    fast instead of drifting silently."""
    h = hashlib.md5(payload).hexdigest()
    return (1 + int(h[0:2], 16) % 64, 1 + int(h[2:4], 16) % 64, 3)


def decode_image_meta(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Extract (width, height, channels) from a binary image column via
    mapInPandas. Real codec path is stubbed (see module doc)."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic pseudo-decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: no references to this module's globals,
        # so cloudpickle ships it by value and executors need neither the
        # package on PYTHONPATH nor an addPyFile
        import hashlib as _hashlib

        def _decode(payload) -> tuple:
            # NULL payload (e.g. NULL-text document, a class production
            # crawls contain) decodes to NULL metadata, not a TypeError
            # that fails the whole query — matching the oracle's NULL
            # propagation
            if payload is None:
                return (None, None, None)
            h = _hashlib.md5(bytes(payload)).hexdigest()
            return (1 + int(h[0:2], 16) % 64, 1 + int(h[2:4], 16) % 64, 3)

        for pdf in batches:
            metas = [_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pd.array(
                    [len(bytes(p)) if p is not None else None
                     for p in pdf[payload_col]],
                    dtype="Int32",
                ),
                "width": pd.array([m[0] for m in metas], dtype="Int32"),
                "height": pd.array([m[1] for m in metas], dtype="Int32"),
                "channels": pd.array([m[2] for m in metas], dtype="Int32"),
            })

    return df.mapInPandas(run, IMAGE_META_SCHEMA)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize a binary media column from text (UTF-8 bytes) — the
    testdata has no real media, so documents.text doubles as the payload;
    the column is genuinely BinaryType so downstream code is real."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


@query(
    "q70_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 AS INT) AS width,
           CAST(1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 AS INT) AS height,
           CAST(CASE WHEN text IS NULL THEN NULL ELSE 3 END AS INT) AS channels
    FROM documents
    """,
)
def q70_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: text → BinaryType payload →
    mapInPandas pseudo-decode → typed metadata. The oracle reproduces the
    md5-derived fake decode in SQL, so the whole Arrow/binary plumbing is
    hash-checked, not just smoke-tested."""
    docs = load_table(spark, "documents", sf_dir)
    return decode_image_meta(with_binary_payload(docs), fake=True)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_hash", T.StringType()),
])


@query(
    "q71_frame_sample",
    oracle="""
    WITH f AS (
        SELECT doc_id, text, unnest(range(0, 4)) AS frame_idx
        FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_hash
    FROM f
    """,
)
def q71_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: explode each
    payload into 4 deterministic "frames" (hash-identified). Real frame
    extraction would replace the hash with decoded bytes; the explode +
    per-frame schema is the part that must be right at scale (rows
    multiply by frame count — partition sizing accounts for it)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.md5(F.concat(F.col("text"), F.lit(":"), F.col("frame_idx").cast("string"))).alias(
                "frame_hash"
            ),
        )
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload", id_col: str = "doc_id",
                  fake: bool = False) -> DataFrame:
    """Resize stub over binary image payloads (real codec absent in this
    container). The Spark-side contract is real: binary in → binary out
    with typed target dims, Arrow-batched; the fake path emits a
    deterministic md5-tagged payload so downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic pseudo-resize"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            out = [
                None if p is None else
                _hashlib.md5(bytes(p)).digest() + width.to_bytes(2, "big")
                + height.to_bytes(2, "big")
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                # NULL payload → NULL resize, dims included: the target
                # dims describe the emitted image, and none was emitted
                "width": pd.array(
                    [None if p is None else width for p in pdf[payload_col]],
                    dtype="Int32",
                ),
                "height": pd.array(
                    [None if p is None else height for p in pdf[payload_col]],
                    dtype="Int32",
                ),
                "payload": out,
            })

    return df.mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("mfcc", T.ArrayType(T.DoubleType())),
])


def extract_audio_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Audio feature-extraction stub (duration/RMS/MFCC-shaped vector).
    Real torchaudio/librosa work is stubbed; the fake path derives
    deterministic features from the payload bytes so the schema,
    batching and array-column handling are exercised for real."""
    if not fake:
        raise NotImplementedError(
            "audio codecs are not available in this environment; "
            "pass fake=True for the deterministic pseudo-extractor"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            dur, rms, mfcc = [], [], []
            for p in pdf[payload_col]:
                if p is None:  # NULL payload → NULL features, not a crash
                    dur.append(None); rms.append(None); mfcc.append(None)
                    continue
                h = _hashlib.md5(bytes(p)).digest()
                dur.append(len(bytes(p)) / 16000.0)
                rms.append(h[0] / 255.0)
                mfcc.append([b / 255.0 for b in h[:13]])
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "duration_s": dur,
                "rms": rms,
                "mfcc": mfcc,
            })

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)
