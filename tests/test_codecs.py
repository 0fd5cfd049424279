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

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c],
                       0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _png_chunk(b"IEND", b""))


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
        good[:26] + bytes([9]) + good[27:],   # compression 9 unsupported
        good[:8] + struct.pack(">I", 5) + good[12:],  # lying IHDR length
    ):
        with pytest.raises(ValueError):
            meta(bad)
    # dims decode() would refuse must be refused by meta() too — a
    # crafted header must not report decode_ok=True with dims the
    # pixel path rejects (code-review r12 finding)
    def hdr(w, h):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(b"\x00"))
                + _png_chunk(b"IEND", b""))
    for w, h in ((0, 0), (0, 4), (4, 0), (65536, 65536)):
        with pytest.raises(ValueError, match="outside supported bound"):
            meta(hdr(w, h))


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

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", part + rest) + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        dec(bomb)


# ---------------------------------------------------------------------------
# Fuzz: the NULL-row contract says a corrupt payload yields ValueError
# (which the mapInPandas kernels turn into a NULL row) — ANY other
# exception class escaping a decoder crashes the whole query. ADVICE r11
# found two such escapes by hand (struct.error, ZeroDivisionError);
# these hypothesis cases search the input space systematically. Two
# regimes: pure-random bytes (shallow — dies at the magic check) and
# structure-aware mutations of VALID payloads (penetrate the parsers;
# PNG chunk CRCs are recomputed after mutation so corruption reaches the
# deflate layer, the zlib.error path).

from hypothesis import given, settings
from hypothesis import strategies as st


def _png_rechunk_crc(buf: bytes) -> bytes:
    """Recompute every chunk CRC of a (possibly mutated) PNG so the
    mutation survives past the CRC check — an attacker does exactly
    this for free."""
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        return buf
    out, pos = [buf[:8]], 8
    while pos + 12 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        if pos + 12 + length > len(buf):
            break
        tag_body = buf[pos + 4:pos + 8 + length]
        out.append(buf[pos:pos + 8 + length])
        out.append(struct.pack(">I", zlib.crc32(tag_body) & 0xFFFFFFFF))
        pos += 12 + length
    out.append(buf[pos:])
    return b"".join(out)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=600))
def test_fuzz_random_bytes_only_valueerror(data):
    enc_p, dec_p, meta_p = png_codec()
    _, dec_w = wav_codec()
    from mapreduce_framework_simple_spark.operators.codecs import (
        video_container,
    )
    _, unpack = video_container()
    for fn in (dec_p, meta_p, dec_w, unpack):
        try:
            fn(data)
        except ValueError:
            pass  # the contract


@settings(max_examples=300, deadline=None)
@given(
    trunc=st.integers(0, 200),
    flip_at=st.integers(0, 199),
    flip_to=st.integers(0, 255),
    rechunk=st.booleans(),
)
def test_fuzz_mutated_png_only_valueerror(trunc, flip_at, flip_to, rechunk):
    enc, dec, meta = png_codec()
    good = enc(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    buf = bytearray(good)
    if flip_at < len(buf):
        buf[flip_at] = flip_to
    mutated = bytes(buf)[: max(1, min(len(buf), trunc + len(buf) - 200))]
    if rechunk:  # survive the CRC check → reach deflate/IHDR validation
        mutated = _png_rechunk_crc(mutated)
    for fn in (dec, meta):
        try:
            out = fn(mutated)
        except ValueError:
            continue
        if fn is dec:  # a survivable mutation must still decode sanely
            arr, w, h, c = out
            assert arr.shape == (h, w, c)


@settings(max_examples=300, deadline=None)
@given(
    flip_at=st.integers(0, 127),
    flip_to=st.integers(0, 255),
    trunc_tail=st.integers(0, 128),
)
def test_fuzz_mutated_wav_only_valueerror_and_bounded(flip_at, flip_to,
                                                     trunc_tail):
    enc, dec = wav_codec()
    mfcc = mfcc_fn()
    good = enc(np.arange(-20, 20, dtype=np.int16), 8000)
    buf = bytearray(good)
    if flip_at < len(buf):
        buf[flip_at] = flip_to
    mutated = bytes(buf)[: len(buf) - trunc_tail] if trunc_tail else bytes(buf)
    try:
        x, rate = dec(mutated)
    except ValueError:
        return  # the contract
    # a survivable mutation must leave the downstream feature path safe:
    # rate bounded (no ZeroDivision, no MFCC padding bomb), finite signal
    assert 1 <= rate <= 1_000_000
    assert len(mfcc(x, rate)) == 13


def test_wav_rejects_memory_bomb_rates():
    """A crafted rate of 4 GHz would make the MFCC framer pad a
    10-sample clip to ~10^8 samples (~800 MB) — the WAV analogue of the
    PNG decompression bomb. The decoder must reject it outright."""
    enc, dec = wav_codec()
    good = bytearray(enc(np.zeros(10, dtype=np.int16), 8000))
    # fmt chunk starts at byte 20; sample rate is its u32 at offset +4
    struct.pack_into("<I", good, 20 + 4, 0xEE6B2800)  # 4_000_000_000 Hz
    with pytest.raises(ValueError, match="outside supported bound"):
        dec(bytes(good))
    dec(bytes(enc(np.zeros(10, dtype=np.int16), 384_000)))  # top real rate ok


def test_png_corrupt_idat_with_valid_crc_is_valueerror():
    """Corrupt deflate data behind a RECOMPUTED (valid) CRC must raise
    ValueError, not zlib.error — the CRC check is free for an attacker
    to satisfy, so it is not the layer the contract can rely on."""
    enc, dec, _ = png_codec()
    good = bytearray(enc(np.zeros((4, 4, 3), dtype=np.uint8)))
    # IDAT body starts after sig(8) + IHDR chunk(12+13); corrupt its
    # middle byte, then fix every CRC
    idat_body_at = 8 + 25 + 8
    good[idat_body_at + 6] ^= 0xFF
    with pytest.raises(ValueError):
        dec(_png_rechunk_crc(bytes(good)))


def test_mfcc_table_cache_is_bounded():
    """The per-rate table cache must not grow with adversarial rate
    diversity (each entry holds ~200 KB of window/filterbank/DCT; the
    1 MHz rate cap alone would admit ~10^6 keys). Past the cap the
    computation falls back to uncached — identical values, no growth."""
    mfcc = mfcc_fn()
    x = np.zeros(512)
    for rate in range(1000, 1000 + 200):  # 200 distinct rates
        mfcc(x, rate)
    # _per_rate lives in _tables' closure; reach it through mfcc's cell
    tables_fn = next(c.cell_contents for c in mfcc.__closure__
                     if callable(c.cell_contents)
                     and getattr(c.cell_contents, "__name__", "") == "_tables")
    caches = [c.cell_contents for c in tables_fn.__closure__
              if isinstance(c.cell_contents, dict)]
    assert len(caches) == 1 and len(caches[0]) <= 64
    # an uncached rate still computes, bit-identical to a fresh factory
    assert mfcc(x, 999_999) == mfcc_fn()(x, 999_999)


@settings(max_examples=300, deadline=None)
@given(
    flip_at=st.integers(0, 149),
    flip_to=st.integers(0, 255),
    trunc_tail=st.integers(0, 80),
)
def test_fuzz_mutated_mfv1_only_valueerror(flip_at, flip_to, trunc_tail):
    """Structure-aware MFV1 mutations (count/length fields and frame
    bytes all reachable by a single flip) must obey the same contract
    as the other codecs: unpack either succeeds with sane framing or
    raises exactly ValueError."""
    from mapreduce_framework_simple_spark.operators.codecs import (
        video_container,
    )

    pack, unpack = video_container()
    good = pack([b"frame-one", b"", b"x" * 60, b"last"])
    buf = bytearray(good)
    if flip_at < len(buf):
        buf[flip_at] = flip_to
    mutated = bytes(buf)[: len(buf) - trunc_tail] if trunc_tail else bytes(buf)
    try:
        frames = unpack(mutated)
    except ValueError:
        return  # the contract
    # a survivable mutation must still frame exactly the payload bytes
    assert sum(4 + len(f) for f in frames) + 8 == len(mutated)
