"""Pure-stdlib codec correctness (operators/codecs.py) + the real
multimodal paths end-to-end on Spark.

The PNG decoder is additionally checked against an INDEPENDENT forward
implementation of all five scanline filters written here in the test
(the encoder only ever emits filter 0, so without this the decoder's
Sub/Up/Average/Paeth reconstruction would be dead code verified by
nothing)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mapreduce_framework_simple_spark.operators.codecs import (
    mfcc_fn,
    png_codec,
    wav_codec,
)


def _manual_png(a: np.ndarray, ftype: int) -> bytes:
    """Independent PNG writer applying filter ``ftype`` to every
    scanline — the test-side forward transform the decoder must invert."""
    h, w, c = a.shape
    rows = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        raw = a[y].reshape(-1).astype(np.int32)
        f = np.zeros_like(raw)
        for i in range(len(raw)):
            left = raw[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (
                    up if pb <= pc else ul
                )
            f[i] = (raw[i] - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(f.astype(np.uint8)))
        prev = raw

    def chunk(tag, d):
        return (struct.pack(">I", len(d)) + tag + d
                + struct.pack(">I", zlib.crc32(tag + d) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c],
                       0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


def test_png_roundtrip_all_shapes_and_meta():
    enc, dec, meta = png_codec()
    rng = np.random.default_rng(7)
    for shape in [(5, 3), (1, 1, 1), (4, 7, 3), (8, 2, 4), (3, 3, 2),
                  (64, 64, 3)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        data = enc(a)
        out, w, h, c = dec(data)
        exp = a if a.ndim == 3 else a[:, :, None]
        assert np.array_equal(out, exp)
        assert (w, h, c) == (exp.shape[1], exp.shape[0], exp.shape[2])
        assert meta(data) == (w, h, c)


def test_png_decoder_inverts_all_five_filters():
    _, dec, _ = png_codec()
    rng = np.random.default_rng(11)
    for c in (1, 3, 4):
        a = rng.integers(0, 256, size=(6, 5, c), dtype=np.uint8)
        for ftype in range(5):
            out, _, _, _ = dec(_manual_png(a, ftype))
            assert np.array_equal(out, a), f"filter {ftype}, channels {c}"


def test_png_filters_at_realistic_width():
    """Round-12 filter rewrite at a realistic scanline width (2048 px
    RGB): Sub must decode through the vectorized per-channel cumsum
    (measured ~107x the former per-byte loop), Average/Paeth through
    the list loop — all bit-exact against the independent test-side
    forward filter."""
    _, dec, _ = png_codec()
    rng = np.random.default_rng(19)
    a = rng.integers(0, 256, size=(4, 2048, 3), dtype=np.uint8)
    for ftype in (1, 3, 4):
        out, w, h, c = dec(_manual_png(a, ftype))
        assert (w, h, c) == (2048, 4, 3)
        assert np.array_equal(out, a), f"filter {ftype}"


def _png_chunk(tag: bytes, d: bytes) -> bytes:
    return (struct.pack(">I", len(d)) + tag + d
            + struct.pack(">I", zlib.crc32(tag + d) & 0xFFFFFFFF))


def test_png_rejects_corrupt_and_bombs():
    enc, dec, _ = png_codec()
    good = enc(np.zeros((4, 4, 3), dtype=np.uint8))
    for bad in (
        b"",                                   # empty
        b"not a png at all",                   # bad signature
        good[:20],                             # truncated mid-IHDR body
        good[:30],                             # truncated mid-chunk
        good[:-4] + b"\x00\x00\x00\x00",       # IEND CRC corrupted
        good[:33] + bytes([good[33] ^ 0xFF]) + good[34:],  # flipped byte
    ):
        with pytest.raises(ValueError):
            dec(bad)
    # IHDR length field lies (5-byte body, CRC valid): the spec
    # violation must surface as ValueError — the pre-round-12 decoder
    # let struct.unpack raise struct.error here, which escaped the
    # kernels' NULL-row contract (ADVICE r11)
    lying = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", b"\x00" * 5)
             + _png_chunk(b"IDAT", zlib.compress(b"\x00"))
             + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        dec(lying)
    # bomb guard: IHDR claims 1x1 but IDAT inflates to far more
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 1_000_000))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        dec(bomb)


def test_png_meta_rejection_matrix():
    """meta() exercised on ITS OWN rejection inputs (ADVICE r11: the
    old test conditionally fell back to dec(), so meta() was never
    tested on payloads >= 29 bytes and its truncated-header
    struct.error escape went unnoticed)."""
    enc, _, meta = png_codec()
    good = enc(np.zeros((4, 4, 3), dtype=np.uint8))
    assert meta(good) == (4, 4, 3)
    for bad in (
        b"",                         # empty
        b"not a png at all",         # bad signature
        good[:12],                   # sig ok, IHDR tag cut off
        good[:16],                   # sig + tag, body absent
        good[:20],                   # truncated mid-IHDR (the ADVICE case)
        good[:28],                   # one byte short of a full header
        good[:24] + bytes([7]) + good[25:],   # depth 7 unsupported
        good[:25] + bytes([3]) + good[26:],   # palette color unsupported
        good[:28] + bytes([1]) + good[29:],   # interlaced unsupported
    ):
        with pytest.raises(ValueError):
            meta(bad)


def test_wav_roundtrip_and_channel_mixdown():
    enc, dec = wav_codec()
    pcm = (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 12000
           ).astype(np.int16)
    x, rate = dec(enc(pcm, 16000))
    assert rate == 16000 and len(x) == 16000
    assert np.allclose(x, pcm / 32768.0)
    # stereo mixdown: hand-build a 2-channel PCM16 file
    stereo = np.empty(200, dtype=np.int16)
    stereo[0::2], stereo[1::2] = 1000, 3000
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    data = stereo.tobytes()
    buf = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    x2, rate2 = dec(buf)
    assert rate2 == 8000 and len(x2) == 100
    assert np.allclose(x2, 2000 / 32768.0)
    for bad in (b"", b"RIFFxxxxNOPE", buf[:20]):
        with pytest.raises(ValueError):
            dec(bad)


def test_wav_rejection_matrix():
    """Every invalid-WAV class must raise ValueError — the pre-round-12
    decoder let a short fmt chunk raise struct.error and accepted
    rate=0 (ZeroDivisionError downstream at duration = samples/rate),
    both escaping the kernels' NULL-row contract (ADVICE r11)."""
    _, dec = wav_codec()

    def riff(fmt_body: bytes, data_body: bytes = b"\x00\x00") -> bytes:
        inner = (b"WAVE"
                 + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                 + b"data" + struct.pack("<I", len(data_body)) + data_body)
        return b"RIFF" + struct.pack("<I", len(inner)) + inner

    good = riff(struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
    x, rate = dec(good)
    assert rate == 8000 and len(x) == 1  # the harness itself is valid
    for bad_fmt in (
        struct.pack("<HHI", 1, 1, 16000),                  # 8-byte fmt (short)
        b"",                                               # empty fmt
        struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16),         # rate 0
        struct.pack("<HHIIHH", 1, 0, 16000, 32000, 2, 16),  # 0 channels
        struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32),  # float PCM
        struct.pack("<HHIIHH", 1, 1, 16000, 48000, 3, 24),  # 24-bit
    ):
        with pytest.raises(ValueError):
            dec(riff(bad_fmt))


def test_mfcc_is_deterministic_and_discriminative():
    mf = mfcc_fn()
    rng = np.random.default_rng(3)
    sine = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
    v1, v2 = mf(sine, 16000), mf(sine, 16000)
    assert v1 == v2 and len(v1) == 13
    noise = rng.normal(0, 0.3, 16000)
    assert abs(v1[1] - mf(noise, 16000)[1]) > 0.1  # tonal vs broadband
    assert mf(sine * 0.01, 16000)[0] < v1[0]  # c0 tracks energy
    assert len(mf(np.zeros(10), 16000)) == 13  # sub-frame input padded


def test_real_resize_pixels_match_numpy_reference(spark):
    """resize_images (real path) must produce EXACTLY the nearest-
    neighbor sample the index map promises — checked pixel-for-pixel
    against numpy on the driver, through the full Spark round trip."""
    from mapreduce_framework_simple_spark.operators.multimodal import (
        resize_images,
    )

    enc, dec, _ = png_codec()
    rng = np.random.default_rng(5)
    imgs = {i: rng.integers(0, 256, size=(7 + i, 5 + i, 3), dtype=np.uint8)
            for i in range(3)}
    df = spark.createDataFrame(
        [(i, bytearray(enc(a))) for i, a in imgs.items()],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in resize_images(df, 4, 3).collect()}
    for i, a in imgs.items():
        h0, w0 = a.shape[:2]
        ys, xs = (np.arange(3) * h0) // 3, (np.arange(4) * w0) // 4
        got, w, h, c = dec(bytes(out[i]["payload"]))
        assert (w, h, c) == (4, 3, 3)
        assert np.array_equal(got, a[ys][:, xs])


def test_real_paths_null_and_corrupt_propagation(spark):
    """REAL decode/resize/features over a mixed batch: NULL payload →
    NULL outputs (decode_ok NULL), corrupt payload → NULL outputs
    (decode_ok False), valid payload → decoded. One query, no failure."""
    from mapreduce_framework_simple_spark.operators.multimodal import (
        decode_image_meta,
        extract_audio_features,
        resize_images,
    )

    enc, _, _ = png_codec()
    wenc, _ = wav_codec()
    png = bytearray(enc(np.full((2, 3, 3), 9, dtype=np.uint8)))
    wav = bytearray(wenc(np.full(1600, 3000, dtype=np.int16), 16000))
    # doc 4: header truncated mid-IHDR (the ADVICE r11 struct.error
    # escape class — must be a NULL row, not a query crash)
    df = spark.createDataFrame(
        [(1, png), (2, bytearray(b"garbage")), (3, None),
         (4, bytearray(bytes(png)[:20]))],
        "doc_id long, payload binary",
    )
    meta = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["channels"],
            meta[1]["decode_ok"]) == (3, 2, 3, True)
    assert meta[2]["decode_ok"] is False and meta[2]["width"] is None
    assert meta[3]["decode_ok"] is None and meta[3]["n_bytes"] is None
    assert meta[4]["decode_ok"] is False and meta[4]["n_bytes"] == 20

    rz = {r["doc_id"]: r for r in resize_images(df, 2, 2).collect()}
    assert rz[1]["payload"] is not None and rz[1]["width"] == 2
    assert rz[2]["payload"] is None and rz[3]["payload"] is None
    assert rz[4]["payload"] is None

    # doc 4: fmt chunk truncated; doc 5: rate 0 — both former crash
    # classes (struct.error / ZeroDivisionError), now NULL rows
    adf = spark.createDataFrame(
        [(1, wav), (2, bytearray(b"garbage")), (3, None),
         (4, bytearray(bytes(wav)[:30])),
         (5, bytearray(
             b"RIFF" + struct.pack("<I", 38) + b"WAVE"
             + b"fmt " + struct.pack("<I", 16)
             + struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
             + b"data" + struct.pack("<I", 2) + b"\x00\x00"))],
        "doc_id long, payload binary",
    )
    au = {r["doc_id"]: r for r in extract_audio_features(adf).collect()}
    assert au[1]["duration_s"] == 0.1
    assert au[1]["rms"] == 3000 / 32768.0  # exact dyadic rational
    assert len(au[1]["mfcc"]) == 13
    assert au[2]["duration_s"] is None and au[3]["mfcc"] is None
    assert au[4]["duration_s"] is None and au[5]["duration_s"] is None


def test_video_container_roundtrip_and_rejection():
    from mapreduce_framework_simple_spark.operators.codecs import (
        video_container,
    )

    pack, unpack = video_container()
    frames = [b"one", b"", b"three" * 100]
    assert unpack(pack(frames)) == frames
    assert unpack(pack([])) == []
    good = pack(frames)
    for bad in (b"", b"NOPE" + good[4:], good[:-3],       # magic/truncation
                good + b"xx",                              # trailing bytes
                good[:4] + struct.pack(">I", 99) + good[8:]):  # count lies
        with pytest.raises(ValueError):
            unpack(bad)


def test_sample_frames_mixed_rows(spark):
    """One query over a NULL payload, a corrupt container, a container
    with one corrupt FRAME, and a good container: per-row/per-frame
    NULLs, never a query failure; stride sampling keeps idx 0,2,4."""
    from mapreduce_framework_simple_spark.operators.codecs import (
        png_codec,
        video_container,
    )
    from mapreduce_framework_simple_spark.operators.multimodal import (
        sample_frames,
    )

    enc, _, _ = png_codec()
    pack, _ = video_container()
    f = [enc(np.full((2, 2), v, dtype=np.uint8)) for v in (10, 20, 30, 40, 50)]
    good = pack(f)                      # 5 frames -> sampled idx 0,2,4
    one_bad = pack([f[0], b"corrupt", f[2]])  # idx 0 ok, idx 2 ok (stride 2)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a container")),
         (3, None), (4, bytearray(one_bad))],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, every_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [(r["frame_idx"], r["mean_px"]) for r in
            sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [
        (0, 10.0), (2, 30.0), (4, 50.0)]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["frame_idx"] is None
    assert len(by_doc[3]) == 1 and by_doc[3][0]["frame_idx"] is None
    assert [(r["frame_idx"], r["mean_px"]) for r in
            sorted(by_doc[4], key=lambda r: r["frame_idx"])] == [
        (0, 10.0), (2, 30.0)]


def test_sample_frames_max_frames_cap(spark):
    """The per-payload row-explosion bound: the MFV1 container admits
    up to 2**20 frames, so max_frames caps what one payload can emit
    into a batch — 10 frames at stride 2 capped to 3 keeps idx 0,2,4."""
    from mapreduce_framework_simple_spark.operators.codecs import (
        png_codec,
        video_container,
    )
    from mapreduce_framework_simple_spark.operators.multimodal import (
        sample_frames,
    )

    enc, _, _ = png_codec()
    pack, _ = video_container()
    frames = [enc(np.full((1, 1), v, dtype=np.uint8)) for v in range(10)]
    df = spark.createDataFrame(
        [(1, bytearray(pack(frames)))], "doc_id long, payload binary",
    )
    rows = sample_frames(df, every_k=2, max_frames=3).collect()
    assert sorted((r["frame_idx"], r["mean_px"]) for r in rows) == [
        (0, 0.0), (2, 2.0), (4, 4.0)]
    with pytest.raises(ValueError):
        sample_frames(df, every_k=2, max_frames=0)


def test_png_bomb_guard_catches_flush_boundary_bombs():
    """The decompression cap must reject surplus compressed input even
    when the cap lands exactly on a zlib flush boundary — there the
    output-buffer probe reads empty and only the stream-end (eof) check
    catches the bomb."""
    _, dec, _ = png_codec()
    co = zlib.compressobj()
    part = co.compress(b"\x00\x00") + co.flush(zlib.Z_FULL_FLUSH)
    rest = co.compress(b"\x00" * 100_000) + co.flush()

    def chunk(tag, d):
        return (struct.pack(">I", len(d)) + tag + d
                + struct.pack(">I", zlib.crc32(tag + d) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", part + rest) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        dec(bomb)
