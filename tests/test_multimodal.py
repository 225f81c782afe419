"""Multimodal plumbing tests: schemas, Arrow batch flow, 1→N frame
sampling, and payload pruning for metadata-only queries."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from crossbar_data_process_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_stub,
    attach_media_stats,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id="m1", payload=bytes(range(16)),
            meta=Row(mime="image/png", width=4, height=4)),
        Row(media_id="m2", payload=b"\xff\x00\xff\x00abcdef",
            meta=Row(mime="image/jpeg", width=2, height=5)),
        Row(media_id="m3", payload=b"xyz",
            meta=Row(mime="audio/wav", width=None, height=None)),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_extract_features(spark, media):
    out = {r.media_id: r for r in extract_features(media, dim=4).collect()}
    assert set(out) == {"m1", "m2", "m3"}
    assert out["m1"].n_bytes == 16
    # deterministic stub: same bytes -> same features
    assert out["m1"].features == pytest.approx(_decode_stub(bytes(range(16)), 4))
    assert len(out["m3"].features) == 4


def test_frame_sample(spark, media):
    frames = frame_sample(media, every_n_bytes=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["m1"]) == 4          # 16 bytes / 4
    assert len(by_id["m2"]) == 3          # 10 bytes -> 3 frames (last short)
    assert len(by_id["m3"]) == 1
    assert by_id["m1"][0].frame_bytes == bytes(range(4))


def test_metadata_only_prunes_payload(spark, media, tmp_path):
    # write to parquet and verify the metadata-only plan never reads payload
    path = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(path)
    df = attach_media_stats(spark.read.parquet(path))
    plan = df.queryExecution if hasattr(df, "queryExecution") else None
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in explained.split("ReadSchema")[-1]
    rows = {r.media_id: r.pixels for r in df.collect()}
    assert rows == {"m1": 16, "m2": 10, "m3": None}


# ---------- r04 de-stub: real header parsing from magic bytes


def _tiny_bmp(width=2, height=3) -> bytes:
    """A real, viewable 24-bit BMP built with stdlib struct: 54-byte header
    + rows padded to 4 bytes."""
    import struct

    row = width * 3
    pad = (4 - row % 4) % 4
    pixels = b"".join(
        bytes([(x * 40) % 256, (y * 80) % 256, 200]) for y in range(height) for x in range(width)
    )
    # re-chunk into padded rows
    body = b"".join(
        pixels[y * row : (y + 1) * row] + b"\x00" * pad for y in range(height)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def _tiny_png(width=7, height=5) -> bytes:
    """PNG signature + a real IHDR chunk (CRC included) — enough of a real
    file for any header reader."""
    import struct
    import zlib

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _tiny_wav(rate=8000, samples=(0, 16384, -16384, 32767)) -> bytes:
    """A complete, playable 16-bit mono PCM WAV via the stdlib wave module."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack("<%dh" % len(samples), *samples))
    return buf.getvalue()


def test_parse_media_header_exact_values():
    from crossbar_data_process_spark.operators.multimodal import (
        _parse_media_header,
    )

    bmp = _parse_media_header(_tiny_bmp(2, 3))
    assert (bmp["mime"], bmp["width"], bmp["height"]) == ("image/bmp", 2, 3)
    png = _parse_media_header(_tiny_png(7, 5))
    assert (png["mime"], png["width"], png["height"]) == ("image/png", 7, 5)
    wav = _parse_media_header(_tiny_wav(rate=8000))
    assert wav["mime"] == "audio/wav"
    assert wav["sample_rate"] == 8000
    assert wav["n_channels"] == 1
    assert wav["bits_per_sample"] == 16
    # unknown and garbage never raise — NULL row, not NotImplementedError
    assert _parse_media_header(b"not a media file")["mime"] is None
    assert _parse_media_header(None)["mime"] is None
    assert _parse_media_header(b"BM")["mime"] is None  # truncated


def test_probe_media_end_to_end(spark):
    from pyspark.sql import Row

    from crossbar_data_process_spark.operators.multimodal import probe_media

    rows = [
        Row(media_id="bmp", payload=_tiny_bmp(2, 3), meta=None),
        Row(media_id="png", payload=_tiny_png(7, 5), meta=None),
        Row(media_id="wav", payload=_tiny_wav(44100), meta=None),
        Row(media_id="junk", payload=b"\x00\x01\x02junkjunkjunk", meta=None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in probe_media(df).collect()}
    assert (out["bmp"].mime, out["bmp"].width, out["bmp"].height) == (
        "image/bmp", 2, 3,
    )
    assert (out["png"].width, out["png"].height) == (7, 5)
    assert out["wav"].sample_rate == 44100
    assert out["wav"].bits_per_sample == 16
    assert out["junk"].mime is None and out["junk"].width is None


# ---------- r06 de-stub: real PNG pixel decode (zlib IDAT + unfilter)


def _encode_png(pixels, ctype, filters) -> bytes:
    """Forward-filter a known pixel grid into a complete PNG, cycling the
    given filter types per scanline — the decoder must invert every one."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    h, w = len(pixels), len(pixels[0])
    flat = []
    for row in pixels:
        b = []
        for px in row:
            b.extend([px] if ch == 1 else list(px))
        flat.append(b)
    raw = b""
    prev = [0] * (w * ch)
    for y, cur in enumerate(flat):
        f = filters[y % len(filters)]
        out = []
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            up = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (a + up) >> 1
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
            out.append((cur[x] - pred) % 256)
        raw += bytes([f]) + bytes(out)
        prev = cur

    def chunk(cid, data):
        return (
            struct.pack(">I", len(data))
            + cid + data
            + struct.pack(">I", zlib.crc32(cid + data))
        )

    ihdr = struct.pack(">II5B", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_roundtrips_every_filter_and_color_type():
    import numpy as np

    from crossbar_data_process_spark.operators.multimodal import _decode_png

    rng = [(x * 37 + y * 91) % 256 for y in range(6) for x in range(5)]
    gray = [[rng[y * 5 + x] for x in range(5)] for y in range(6)]
    rgb = [
        [((v := rng[y * 5 + x]), (v * 3) % 256, (v * 7) % 256) for x in range(5)]
        for y in range(6)
    ]
    rgba = [[px + ((px[0] * 11) % 256,) for px in row] for row in rgb]
    for pixels, ctype, ch in ((gray, 0, 1), (rgb, 2, 3), (rgba, 6, 4)):
        # 6 rows cycle through all five filter types (and repeat Paeth)
        payload = _encode_png(pixels, ctype, filters=[0, 1, 2, 3, 4])
        img = _decode_png(payload)
        assert img is not None and img.shape == (6, 5, ch)
        expect = np.array(
            [[([px] if ch == 1 else list(px)) for px in row] for row in pixels],
            dtype=np.uint8,
        ).reshape(6, 5, ch)
        assert (img == expect).all(), (ctype, img, expect)


def test_png_decode_rejects_unsupported_forms():
    from crossbar_data_process_spark.operators.multimodal import _decode_png

    assert _decode_png(None) is None
    assert _decode_png(b"not png") is None
    assert _decode_png(_tiny_png(7, 5)) is None  # header-only, no IDAT
    # truncated IDAT → zlib error → None, never an exception
    full = _encode_png([[1, 2], [3, 4]], 0, [0])
    assert _decode_png(full[:-20]) is None


def test_extract_features_uses_real_pixels_for_png(spark):
    from crossbar_data_process_spark.operators.multimodal import (
        _decode_png,
        _pixel_features,
    )

    pixels = [[(x * 50 % 256, y * 60 % 256, 128) for x in range(4)] for y in range(4)]
    payload = _encode_png(pixels, 2, filters=[0, 1, 2, 4])
    rows = [
        Row(media_id="png", payload=payload, meta=None),
        Row(media_id="raw", payload=bytes(range(16)), meta=None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(df, dim=4).collect()}
    expect = _pixel_features(_decode_png(payload), 4)
    assert out["png"].features == pytest.approx(expect)
    assert all(0.0 <= v <= 1.0 for v in out["png"].features)
    # non-PNG still takes the deterministic stub path
    assert out["raw"].features == pytest.approx(_decode_stub(bytes(range(16)), 4))


def test_wav_stats_require_integer_pcm(spark):
    import struct

    from crossbar_data_process_spark.operators.multimodal import (
        wav_audio_stats,
    )

    # hand-built WAV with wFormatTag=3 (IEEE float) but bits_per_sample=16:
    # passes the header probe, must be refused by the PCM decode
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    data = struct.pack("<4h", 0, 1000, -1000, 32767)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame(
        [Row(media_id="f32", payload=payload, meta=None)], schema=MEDIA_SCHEMA
    )
    out = wav_audio_stats(df).collect()[0]
    assert out.n_samples is None and out.rms is None


def test_wav_audio_stats_real_decode(spark):
    import math

    from pyspark.sql import Row

    from crossbar_data_process_spark.operators.multimodal import (
        wav_audio_stats,
    )

    samples = (0, 16384, -16384, 32767)
    rows = [
        Row(media_id="wav", payload=_tiny_wav(8000, samples), meta=None),
        Row(media_id="junk", payload=b"nope", meta=None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in wav_audio_stats(df).collect()}
    a = [s / 32768.0 for s in samples]
    assert out["wav"].n_samples == 4
    assert out["wav"].rms == pytest.approx(
        math.sqrt(sum(x * x for x in a) / 4), rel=1e-6
    )
    assert out["wav"].peak == pytest.approx(32767 / 32768.0, rel=1e-6)
    assert out["junk"].n_samples is None


def test_resize_images_real_roundtrip(spark):
    """resize: an 8x6 PNG capped at max_side=4 comes back as a REAL 4x3
    PNG whose pixels equal the nearest-neighbor downsample of the
    original; small/undecodable payloads pass through untouched."""
    import numpy as np

    from crossbar_data_process_spark.operators.multimodal import (
        _decode_png,
        resize_images,
    )

    pixels = [
        [((x * 30) % 256, (y * 40) % 256, (x * y) % 256) for x in range(8)]
        for y in range(6)
    ]
    payload = _encode_png(pixels, 2, filters=[0, 1, 2, 3, 4])
    rows = [
        Row(media_id="big", payload=payload, meta=None),
        Row(media_id="small", payload=_encode_png([[1, 2], [3, 4]], 0, [0]), meta=None),
        Row(media_id="junk", payload=b"not an image", meta=None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(df, max_side=4).collect()}

    big = out["big"]
    assert big.resized and (big.width, big.height) == (4, 3)
    img = _decode_png(bytes(big.payload))
    assert img is not None and img.shape == (3, 4, 3)
    src = _decode_png(payload)
    ys = (np.arange(3) * 6 // 3).astype(int)
    xs = (np.arange(4) * 8 // 4).astype(int)
    assert (img == src[ys][:, xs]).all()

    assert not out["small"].resized and (out["small"].width, out["small"].height) == (2, 2)
    assert bytes(out["small"].payload) == _encode_png([[1, 2], [3, 4]], 0, [0])
    assert not out["junk"].resized and out["junk"].width is None
    assert bytes(out["junk"].payload) == b"not an image"


def test_jpeg_media_pipeline_end_to_end(spark):
    """JPEG through the full Spark surface (r07, closes the stub codec):
    probe_media reads SOF dimensions, extract_features pools REAL decoded
    pixels, resize_images downsamples and re-encodes as PNG."""
    import numpy as np

    from crossbar_data_process_spark.operators.jpeg_codec import decode_jpeg
    from crossbar_data_process_spark.operators.multimodal import (
        _decode_png,
        _pixel_features,
        probe_media,
        resize_images,
    )
    from tests.jpeg_encoder import encode_jpeg

    yy, xx = np.mgrid[0:12, 0:10]
    img = np.stack(
        [(yy * 9) % 256, (xx * 11) % 256, ((yy + xx) * 5) % 256], axis=2
    ).astype(np.uint8)
    payload = encode_jpeg(img)
    df = spark.createDataFrame(
        [Row(media_id="j1", payload=payload, meta=None)], schema=MEDIA_SCHEMA
    )

    probe = probe_media(df).collect()[0]
    assert (probe.mime, probe.width, probe.height) == ("image/jpeg", 10, 12)

    feats = extract_features(df, dim=4).collect()[0]
    assert feats.features == pytest.approx(
        _pixel_features(decode_jpeg(payload), 4)
    )
    # real-pixel path, not the byte stub
    assert feats.features != pytest.approx(_decode_stub(payload, 4))

    out = resize_images(df, max_side=6).collect()[0]
    assert out.resized and (out.width, out.height) == (5, 6)
    resized = _decode_png(bytes(out.payload))
    src = decode_jpeg(payload)
    ys = (np.arange(6) * 12 // 6).astype(int)
    xs = (np.arange(5) * 10 // 5).astype(int)
    assert (resized == src[ys][:, xs]).all()


def test_wav_spectral_features_sine(spark):
    """A pure 440 Hz tone must put the dominant frequency and centroid on
    440 Hz, the zero-crossing rate at 2f/rate, and nearly all band energy
    in the band containing 440 Hz — exact DSP, no codec library."""
    import numpy as np

    from crossbar_data_process_spark.operators.multimodal import (
        wav_spectral_features,
    )

    rate, f = 8000, 440.0
    t = np.arange(rate)  # one full second → 1 Hz FFT resolution
    sine = (0.8 * 32767 * np.sin(2 * np.pi * f * t / rate)).astype(int)
    rows = [
        Row(media_id="tone", payload=_tiny_wav(rate, tuple(sine)), meta=None),
        Row(media_id="junk", payload=b"nope", meta=None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in wav_spectral_features(df, n_bands=8).collect()}

    tone = out["tone"]
    assert tone.sample_rate == rate and tone.n_samples == rate
    assert tone.dominant_hz == pytest.approx(f, abs=1.5)
    assert tone.spectral_centroid_hz == pytest.approx(f, abs=5.0)
    assert tone.rolloff_hz == pytest.approx(f, abs=5.0)
    assert tone.zero_crossing_rate == pytest.approx(2 * f / rate, rel=0.02)
    bands = list(tone.band_energy)
    assert sum(bands) == pytest.approx(1.0, abs=1e-5)
    # log-spaced 20..4000 over 8 bands: 440 Hz falls in one band that
    # should hold essentially all energy for a pure tone
    assert max(bands) > 0.99
    assert out["junk"].dominant_hz is None and out["junk"].band_energy is None


def test_wav_spectral_features_stereo_and_silence(spark):
    """Stereo interleave averages to mono before the FFT; digital silence
    yields zero features rather than NaNs."""
    import io
    import struct
    import wave

    import numpy as np

    from crossbar_data_process_spark.operators.multimodal import (
        wav_spectral_features,
    )

    rate, f = 8000, 1000.0
    t = np.arange(2000)
    mono = (0.5 * 32767 * np.sin(2 * np.pi * f * t / rate)).astype(int)
    inter = np.empty(2 * mono.size, dtype=int)
    inter[0::2] = mono  # L
    inter[1::2] = mono  # R — identical, so the mono mean is the tone itself
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack("<%dh" % inter.size, *inter))
    stereo = buf.getvalue()

    rows = [
        Row(media_id="stereo", payload=stereo, meta=None),
        Row(media_id="silent", payload=_tiny_wav(rate, (0,) * 64), meta=None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in wav_spectral_features(df).collect()}
    assert out["stereo"].dominant_hz == pytest.approx(f, abs=5.0)
    assert out["stereo"].n_samples == 2000  # mono frames, not raw samples
    silent = out["silent"]
    assert silent.dominant_hz == 0.0 and silent.zero_crossing_rate == 0.0
    assert sum(silent.band_energy) == 0.0


def test_png_zip_bomb_and_fuzz_never_raise():
    """A small IDAT must never inflate past the declared raster (bounded
    decompressobj), a huge IHDR is refused outright, and corrupted PNGs
    return None rather than raising."""
    import struct
    import zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crossbar_data_process_spark.operators.multimodal import _decode_png

    def chunk(cid, data):
        return (
            struct.pack(">I", len(data)) + cid + data
            + struct.pack(">I", zlib.crc32(cid + data))
        )

    # declared 4x4 gray, but the IDAT inflates to 1 MB of zeros
    ihdr = struct.pack(">II5B", 4, 4, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
        + chunk(b"IEND", b"")
    )
    assert _decode_png(bomb) is None

    huge = struct.pack(">II5B", 65535, 65535, 8, 0, 0, 0, 0)
    giant = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", huge)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    assert _decode_png(giant) is None

    valid = bytearray(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (4 * 5)))
        + chunk(b"IEND", b"")
    )
    assert _decode_png(bytes(valid)) is not None  # baseline sanity

    @settings(max_examples=150, deadline=None)
    @given(st.data())
    def corrupt(data):
        p = bytearray(valid)
        for _ in range(data.draw(st.integers(1, 6))):
            pos = data.draw(st.integers(8, len(p) - 1))
            p[pos] = data.draw(st.integers(0, 255))
        out = _decode_png(bytes(p))
        assert out is None or out.dtype.name == "uint8"

    corrupt()


# -------------------- r07: perceptual image hashing + hamming near-dup pairs
def _gradient_pixels(h, w, bump=None):
    """Grayscale gradient image as nested [row][pixel] ints; `bump`
    optionally brightens one (y, x) cell to perturb the image."""
    px = [[(x * 255) // (w + y + 1) for x in range(w)] for y in range(h)]
    if bump:
        y, x = bump
        px[y][x] = min(255, px[y][x] + 120)
    return px


def test_dhash_identical_and_resized_images_collide(spark):
    from crossbar_data_process_spark.operators.multimodal import image_dhash

    big = _encode_png(_gradient_pixels(64, 64), 0, [0])
    small = _encode_png(
        [row[::2] for row in _gradient_pixels(64, 64)[::2]], 0, [0]
    )  # the same image at half resolution
    other = _encode_png(
        [[255 - v for v in row] for row in _gradient_pixels(64, 64)], 0, [0]
    )  # inverted gradient: structurally opposite
    df = spark.createDataFrame(
        [("a", big, None), ("b", big, None), ("c", small, None), ("d", other, None)],
        "media_id string, payload binary, meta string",
    )
    got = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    assert got["a"] == got["b"]  # bit-identical for identical payloads
    assert bin((got["a"] ^ got["c"]) & ((1 << 64) - 1)).count("1") <= 6
    assert bin((got["a"] ^ got["d"]) & ((1 << 64) - 1)).count("1") > 20


def test_hamming_pairs_banded_exact_recall(spark):
    """Pairs within max_hamming < bands are ALWAYS found (pigeonhole);
    distant hashes never pair. Verified against brute force on a planted
    set including negative int64 hashes (sign-safe slicing)."""
    from crossbar_data_process_spark.operators.multimodal import hamming_pairs

    base = 0x1234_5678_9ABC_DEF0
    rows = [
        ("h0", _signed(base)),
        ("h1", _signed(base ^ 0b101)),            # hamming 2
        ("h2", _signed(base ^ (1 << 63))),        # hamming 1, flips the sign bit
        ("h3", _signed(~base & ((1 << 64) - 1))), # hamming 64
        ("h4", None),                              # ignored
    ]
    df = spark.createDataFrame(rows, "media_id string, dhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs(df, max_hamming=6).collect()
    }
    assert got == {("h0", "h1"): 2, ("h0", "h2"): 1, ("h1", "h2"): 3}

    # max_hamming >= bands silently voids the pigeonhole guarantee — it
    # must raise, mirroring the bands-divides-64 check (r7 review finding)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hamming"):
        hamming_pairs(df, max_hamming=8, bands=8)
    # …and a wider band count restores validity for the same distance
    assert hamming_pairs(df, max_hamming=8, bands=16).count() >= 3


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def test_image_dedup_end_to_end(spark):
    """decode -> dhash -> hamming pairs: re-encoded/perturbed copies pair
    up, unrelated images do not — image near-dup dedup without any pixel
    joins."""
    from crossbar_data_process_spark.operators.multimodal import (
        hamming_pairs,
        image_dhash,
    )

    orig = _encode_png(_gradient_pixels(32, 32), 0, [0])
    tweaked = _encode_png(_gradient_pixels(32, 32, bump=(5, 5)), 0, [0])
    inverted = _encode_png(
        [[255 - v for v in row] for row in _gradient_pixels(32, 32)], 0, [0]
    )
    df = spark.createDataFrame(
        [("orig", orig, None), ("tweak", tweaked, None), ("inv", inverted, None)],
        "media_id string, payload binary, meta string",
    )
    pairs = {
        (r.id_a, r.id_b) for r in hamming_pairs(image_dhash(df), max_hamming=6).collect()
    }
    assert ("orig", "tweak") in pairs
    assert not any("inv" in p for p in pairs)


# ----------------------------------- r07: perceptual audio fingerprinting
def _wav_from_samples(samples, rate=8000):
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_fingerprint_gain_invariant_and_discriminative(spark):
    """The fingerprint is built from band-energy RATIOS: a gain-scaled copy
    hashes within a few bits; a different signal (chirp vs tone) is far."""
    import math

    from crossbar_data_process_spark.operators.multimodal import (
        audio_fingerprint,
        hamming_pairs,
    )

    import numpy as np

    # broadband program material: every log band carries real energy, so
    # the ratio bits are decided by signal, not numeric noise (a pure tone
    # leaves most bands empty and their bits are sign-of-noise coin flips)
    n, rate = 4096, 8000
    rng = np.random.default_rng(3)
    base = np.cumsum(rng.normal(size=n))  # brownish: energy at all scales
    base = base / np.abs(base).max()
    tone = [int(24000 * v) for v in base]
    quiet = [v // 3 for v in tone]
    chirp = [
        int(12000 * math.sin(2 * math.pi * (200 + 1500 * t / n) * t / rate))
        for t in range(n)
    ]
    df = spark.createDataFrame(
        [
            Row(media_id="tone", payload=_wav_from_samples(tone), meta=None),
            Row(media_id="quiet", payload=_wav_from_samples(quiet), meta=None),
            Row(media_id="chirp", payload=_wav_from_samples(chirp), meta=None),
            Row(media_id="junk", payload=b"\x00\x01\x02", meta=None),
        ],
        schema=MEDIA_SCHEMA,
    )
    fps = {r.media_id: r.afp for r in audio_fingerprint(df).collect()}
    assert fps["junk"] is None
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fps["tone"], fps["quiet"]) <= 6
    assert ham(fps["tone"], fps["chirp"]) > 12

    # the image-dedup machinery is modality-agnostic: same pairs operator
    pairs = {
        (r.id_a, r.id_b)
        for r in hamming_pairs(
            audio_fingerprint(df), hash_col="afp", max_hamming=6
        ).collect()
    }
    assert ("quiet", "tone") in pairs
    assert not any("chirp" in p for p in pairs)
