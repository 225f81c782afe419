"""Multimodal (image/audio/video) column operators for training-data
pipelines (engine extension; repo charter: "multimodal columns").

Representation: media are opaque ``binary`` columns plus a typed metadata
struct (mime, width/height or sample_rate/duration, codec). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the only operators in the engine allowed to enter
Python, because codec work is genuinely not expressible in Spark SQL.

Codec status (r07): header-level metadata is REAL for recognized formats —
``_parse_media_header`` reads BMP, PNG, and JPEG dimensions and WAV RIFF
sample-rate/channels/bit-depth from magic bytes with pure stdlib;
``wav_audio_stats`` decodes 16-bit integer-PCM WAV samples (numpy
``frombuffer``, ``wFormatTag == 1`` enforced) for real amplitude
statistics; ``_decode_png`` does REAL pixel decode for 8-bit
non-interlaced PNG (stdlib ``zlib`` IDAT inflate + numpy scanline
unfiltering, all five filter types); and ``jpeg_codec.decode_jpeg`` does
REAL pixel decode for baseline JPEG (pure-numpy Huffman + dequant + IDCT
+ chroma upsampling + YCbCr→RGB — see that module). Only formats with no
stdlib-expressible codec (progressive JPEG, video) remain behind
``_decode_stub`` — a deterministic fake. Everything around it (schemas,
batch iteration, partition sizing, output contract) is the real
production plumbing and is tested.

Scale notes: media rows are large — keep ``spark.sql.files.maxPartitionBytes``
low for media tables so a partition's batch fits executor memory, and
project metadata columns *before* shuffles so the binary payload never
travels through an exchange it doesn't need to (late materialization).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .jpeg_codec import decode_jpeg, jpeg_dimensions

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
    ]
)

_UNKNOWN = {
    "mime": None,
    "width": None,
    "height": None,
    "sample_rate": None,
    "n_channels": None,
    "bits_per_sample": None,
}


def _wav_fmt_chunk(payload: bytes) -> tuple[int, int] | None:
    """(offset, size) of the ``fmt `` chunk, walking the RIFF chunk list —
    never assume fmt sits at byte 12 (LIST/INFO chunks may precede it)."""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            return pos + 8, size
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    return None


def _parse_media_header(payload: bytes | None) -> dict:
    """Pure-stdlib header probe: BMP / PNG dimensions, WAV RIFF audio
    parameters, straight from the magic bytes — no codec library needed.
    Unknown or truncated payloads get the all-NULL row (no exception: a
    100 TB probe pass must classify garbage, not die on it)."""
    if payload is None or len(payload) < 12:
        return dict(_UNKNOWN)
    if payload[:2] == b"BM" and len(payload) >= 26:
        # BITMAPINFOHEADER: int32 LE width at 18, height at 22 (negative
        # height = top-down row order; magnitude is the pixel height)
        return dict(
            _UNKNOWN,
            mime="image/bmp",
            width=int.from_bytes(payload[18:22], "little", signed=True),
            height=abs(int.from_bytes(payload[22:26], "little", signed=True)),
        )
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        # IHDR is always the first chunk: uint32 BE width at 16, height at 20
        return dict(
            _UNKNOWN,
            mime="image/png",
            width=int.from_bytes(payload[16:20], "big"),
            height=int.from_bytes(payload[20:24], "big"),
        )
    if payload[:2] == b"\xff\xd8":
        dims = jpeg_dimensions(payload)
        if dims is None:
            return dict(_UNKNOWN, mime="image/jpeg")
        return dict(_UNKNOWN, mime="image/jpeg", width=dims[0], height=dims[1])
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        fmt = _wav_fmt_chunk(payload)
        if fmt is None or fmt[1] < 16 or fmt[0] + 16 > len(payload):
            return dict(_UNKNOWN, mime="audio/wav")
        off = fmt[0]
        return dict(
            _UNKNOWN,
            mime="audio/wav",
            n_channels=int.from_bytes(payload[off + 2 : off + 4], "little"),
            sample_rate=int.from_bytes(payload[off + 4 : off + 8], "little"),
            bits_per_sample=int.from_bytes(
                payload[off + 14 : off + 16], "little"
            ),
        )
    return dict(_UNKNOWN)


def probe_media(media: DataFrame) -> DataFrame:
    """Header-probe every payload via Arrow-batched ``mapInPandas``:
    recognized formats (BMP, PNG, WAV) get REAL dimensions / audio
    parameters parsed from their headers; unknown formats get NULLs. This
    is the de-stubbed metadata path — prefer it over trusting a ``meta``
    struct supplied upstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_media_header(p) for p in pdf["payload"]]
            out = {"media_id": pdf["media_id"]}
            for field in (
                "mime", "width", "height",
                "sample_rate", "n_channels", "bits_per_sample",
            ):
                out[field] = pd.array(
                    [d[field] for d in parsed],
                    dtype="string" if field == "mime" else "Int32",
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=PROBE_SCHEMA)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", FloatType()),
        StructField("peak", FloatType()),
    ]
)


def _wav_pcm(payload: bytes | None):
    """(samples float64 in [-1,1] — channels interleaved, sample_rate,
    n_channels) for 16-bit integer-PCM WAV; None otherwise. Shared by
    the stats and spectral kernels."""
    import numpy as np

    hdr = _parse_media_header(payload)
    if hdr["mime"] != "audio/wav" or hdr["bits_per_sample"] != 16:
        return None
    fmt = _wav_fmt_chunk(payload)
    if fmt is None or int.from_bytes(
        payload[fmt[0] : fmt[0] + 2], "little"
    ) != 1:
        return None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"data":
            raw = payload[pos + 8 : pos + 8 + size]
            x = np.frombuffer(raw[: len(raw) - (len(raw) % 2)], dtype="<i2")
            return (
                x.astype("float64") / 32768.0,
                hdr["sample_rate"],
                max(hdr["n_channels"] or 1, 1),
            )
        pos += 8 + size + (size & 1)
    return None


def wav_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode for 16-bit PCM WAV — numpy ``frombuffer`` over the
    ``data`` chunk, amplitude normalized to [-1, 1] — rms/peak per file.
    Non-WAV / non-16-bit payloads yield the NULL-stats row. This is the
    audio analogue of the probe: everything a quality gate needs (silence
    detection, clipping) without any codec dependency."""
    import numpy as np

    def _stats(payload: bytes | None):
        # _wav_pcm enforces integer PCM (wFormatTag == 1); float/ADPCM/
        # extensible WAVs would "decode" into garbage stats
        pcm = _wav_pcm(payload)
        if pcm is None:
            return None, None, None
        a = pcm[0]
        if a.size == 0:
            return 0, 0.0, 0.0
        return (
            int(a.size),
            float(np.sqrt(np.mean(a * a))),
            float(np.max(np.abs(a))),
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.array(
                        [s[0] for s in stats], dtype="Int32"
                    ),
                    "rms": pd.array(
                        [s[1] for s in stats], dtype="Float32"
                    ),
                    "peak": pd.array(
                        [s[2] for s in stats], dtype="Float32"
                    ),
                }
            )

    return media.mapInPandas(run, schema=WAV_STATS_SCHEMA)


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("dominant_hz", FloatType()),
        StructField("spectral_centroid_hz", FloatType()),
        StructField("rolloff_hz", FloatType()),
        StructField("zero_crossing_rate", FloatType()),
        StructField("band_energy", ArrayType(FloatType())),
    ]
)


def wav_spectral_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """REAL spectral analysis for 16-bit PCM WAV — numpy rfft, no librosa:
    dominant frequency, spectral centroid, 85% rolloff, zero-crossing
    rate, and ``n_bands`` log-spaced band energies (normalized to sum 1) —
    the audio-side quality/fingerprint signals a curation gate filters on
    (tone vs noise vs silence, bandwidth, speech-band energy share).
    Multichannel audio is averaged to mono before the FFT. Non-PCM /
    non-WAV payloads yield the all-NULL row. Same Arrow ``mapInPandas``
    posture as the other media kernels."""
    import numpy as np

    def _spec(payload: bytes | None):
        pcm = _wav_pcm(payload)
        if pcm is None:
            return None
        a, rate, nch = pcm
        if not rate or a.size < 2 * nch:
            return None
        if nch > 1:  # interleaved → mono mean
            a = a[: (a.size // nch) * nch].reshape(-1, nch).mean(axis=1)
        n = a.size
        zcr = float(np.mean(np.signbit(a[1:]) != np.signbit(a[:-1])))
        p = np.abs(np.fft.rfft(a * np.hanning(n))) ** 2
        p[0] = 0.0  # DC carries no pitch information
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        total = float(p.sum())
        if total <= 0.0:  # digital silence
            return (rate, n, 0.0, 0.0, 0.0, zcr, [0.0] * n_bands)
        dominant = float(freqs[int(p.argmax())])
        centroid = float((freqs * p).sum() / total)
        rolloff = float(freqs[int(np.searchsorted(np.cumsum(p), 0.85 * total))])
        # log-spaced band edges from ~20 Hz to Nyquist
        edges = np.geomspace(20.0, rate / 2.0, n_bands + 1)
        idx = np.clip(np.searchsorted(edges, freqs) - 1, 0, n_bands - 1)
        bands = np.bincount(idx, weights=p, minlength=n_bands) / total
        return (rate, n, dominant, centroid, rolloff, zcr,
                [float(b) for b in bands])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        none = (None,) * 6 + (None,)
        for pdf in batches:
            rows = [_spec(p) or none for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.array([r[0] for r in rows], dtype="Int32"),
                    "n_samples": pd.array([r[1] for r in rows], dtype="Int32"),
                    "dominant_hz": pd.array([r[2] for r in rows], dtype="Float32"),
                    "spectral_centroid_hz": pd.array(
                        [r[3] for r in rows], dtype="Float32"
                    ),
                    "rolloff_hz": pd.array([r[4] for r in rows], dtype="Float32"),
                    "zero_crossing_rate": pd.array(
                        [r[5] for r in rows], dtype="Float32"
                    ),
                    "band_energy": [r[6] for r in rows],
                }
            )

    return media.mapInPandas(run, schema=SPECTRAL_SCHEMA)


def _png_unfilter(raw: bytes, h: int, w: int, ch: int):
    """Reverse the per-scanline PNG filters (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) → (h, w, ch) uint8 pixel array, or None on an
    unknown filter byte. Up is vectorized; Sub/Average/Paeth are serial
    along x by definition (each byte's predictor uses the just-decoded
    left neighbor)."""
    import numpy as np

    stride = w * ch
    prev = np.zeros(stride, dtype=np.int32)
    rows = []
    pos = 0
    for _ in range(h):
        f = raw[pos]
        line = np.frombuffer(
            raw[pos + 1 : pos + 1 + stride], dtype=np.uint8
        ).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:
            cur = (line + prev) % 256
        elif f in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            return None
        rows.append(cur)
        prev = cur
    return np.stack(rows).astype(np.uint8).reshape(h, w, ch)


def _decode_png(payload: bytes | None):
    """REAL stdlib PNG pixel decode: walk the chunk list, inflate the IDAT
    stream with ``zlib``, unfilter scanlines with numpy. Supports 8-bit
    depth, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA), no
    interlace — i.e. what encoders emit by default. Returns an
    (h, w, channels) uint8 array, or None for anything else (palette,
    16-bit, Adam7, truncated, non-PNG) so the caller can fall back."""
    import zlib

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat = 8, b""
    w = h = None
    depth = ctype = interlace = -1
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        cid = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if cid == b"IHDR" and size >= 13:
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, interlace = data[8], data[9], data[12]
        elif cid == b"IDAT":
            idat += data
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + payload + crc
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if not w or not h or depth != 8 or ch is None or interlace != 0:
        return None
    from .jpeg_codec import MAX_PIXELS

    if h * w > MAX_PIXELS:
        return None  # decompression-bomb guard, same cap as JPEG
    expected = h * (w * ch + 1)
    try:
        # bound the inflate to the declared raster size: a zip-bomb IDAT
        # must not allocate past it even when IHDR looks sane
        d = zlib.decompressobj()
        raw = d.decompress(idat, expected)
        if len(raw) == expected and not d.eof:
            # either just the stream trailer remains (fine) or the stream
            # keeps inflating past the declared size (bomb — reject)
            if d.decompress(d.unconsumed_tail, 1):
                return None
    except zlib.error:
        return None
    if len(raw) != expected or not d.eof:
        return None  # truncated or over-long stream
    return _png_unfilter(raw, h, w, ch)


def _decode_image(payload: bytes | None):
    """Unified REAL pixel decode: 8-bit non-interlaced PNG
    (:func:`_decode_png`) or baseline JPEG (:func:`jpeg_codec.decode_jpeg`)
    → (h, w, ch) uint8 array, None for everything else."""
    if payload is None:
        return None
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    return _decode_png(payload)


def _pixel_features(img, dim: int) -> list[float]:
    """``dim`` floats in [0, 1] from REAL pixels: channel-mean luminance
    (alpha dropped) average-pooled into ``dim`` equal row-major buckets."""
    import numpy as np

    x = img.astype(np.float64)
    if x.shape[2] in (2, 4):
        x = x[:, :, :-1]
    g = x.mean(axis=2).ravel() / 255.0
    idx = (np.arange(g.size) * dim) // g.size
    sums = np.bincount(idx, weights=g, minlength=dim)
    counts = np.bincount(idx, minlength=dim)
    return [float(v) for v in sums / np.maximum(counts, 1)]


def _encode_png(img) -> bytes:
    """Minimal PNG encoder (filter 0, one zlib-deflated IDAT) for the
    output side of :func:`resize_images` — the exact inverse shape of
    :func:`_decode_png`, stdlib-only."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(cid: bytes, data: bytes) -> bytes:
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


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BooleanType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """REAL image resize (charter: "decode / feature-extract / resize /
    frame-sample"): decodable images (PNG or baseline JPEG — see
    :func:`_decode_image`) larger than ``max_side`` on either axis
    are nearest-neighbor downsampled (aspect preserved) and re-encoded as
    PNG; already-small PNGs and undecodable payloads pass through
    unchanged with ``resized = false``. Arrow-batched ``mapInPandas``,
    same late-materialization posture as the other media kernels."""
    import numpy as np

    def _one(mid, p):
        img = _decode_image(p)
        if img is None:
            return (mid, p, None, None, False)
        h, w = img.shape[:2]
        if max(h, w) <= max_side:
            return (mid, p, w, h, False)
        scale = max_side / max(h, w)
        nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
        ys = (np.arange(nh) * h // nh).astype(int)
        xs = (np.arange(nw) * w // nw).astype(int)
        out = img[ys][:, xs]
        return (mid, _encode_png(out), nw, nh, True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_one(m, p) for m, p in zip(pdf["media_id"], pdf["payload"])]
            yield pd.DataFrame(
                {
                    "media_id": [r[0] for r in rows],
                    "payload": [r[1] for r in rows],
                    "width": pd.array([r[2] for r in rows], dtype="Int32"),
                    "height": pd.array([r[3] for r in rows], dtype="Int32"),
                    "resized": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def _decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake decoder for formats whose codecs are NOT in this
    container (progressive JPEG, video). Real deployments replace this
    with Pillow/torchvision/librosa. Derives ``dim`` floats from byte
    content so tests can assert exact outputs."""
    if payload is None:
        raise NotImplementedError("real codec not available in this container")
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [a / 997.0 for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas. One Python
    worker per partition; batches stream through Arrow, so peak memory is
    one batch of payloads, not the partition.

    Decodable payloads (8-bit non-interlaced PNG or baseline JPEG — see
    :func:`_decode_image`) get features from REAL pixels (pooled
    luminance); everything else falls back to the deterministic
    byte-content stub."""

    def _features(p: bytes | None) -> list[float]:
        img = _decode_image(p)
        return _pixel_features(img, dim) if img is not None else _decode_stub(p, dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": pdf["payload"].map(_features),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 4) -> DataFrame:
    """"Frame sampling" over the stub codec: emit one row per sampled frame
    (1 row → N rows, the video analogue of X9 explode). Real plumbing:
    output schema widens with a frame_no, payload slicing happens
    batch-wise in Arrow."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for no, start in enumerate(range(0, len(payload), every_n_bytes)):
                    out_ids.append(mid)
                    out_nos.append(no)
                    out_frames.append(bytes(payload[start : start + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame_bytes": out_frames}
            )

    return media.mapInPandas(run, schema=schema)


def attach_media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only stats stay in pure Column expressions — no Python, and
    Catalyst prunes the binary payload out of the scan entirely (verify:
    ReadSchema excludes ``payload``)."""
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        (F.col("meta.width") * F.col("meta.height")).alias("pixels"),
    )


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("dhash", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over REAL pixels — the image analogue of
    the text fingerprint family: near-identical images (re-encoded,
    resized, lightly edited) land within a few Hamming bits, so image
    dedup becomes :func:`hamming_pairs` over a long column instead of
    pixel comparison.

    Decode (PNG/baseline JPEG) → luminance → area-average pooling onto a
    9x8 grid → 64 bits of "brighter than the pixel to the left" →
    two's-complement int64. Area pooling (not nearest-neighbor) makes the
    hash resolution-robust: every source pixel votes, so the same image at
    2x scale pools to near-identical grid values. Undecodable payloads
    yield NULL. Deterministic end-to-end; Arrow ``mapInPandas`` like every
    media kernel."""
    import numpy as np

    def _hash(p: bytes | None):
        img = _decode_image(p)
        if img is None:
            return None
        h, w = img.shape[:2]
        x = img.astype(np.float64)
        if x.shape[2] in (2, 4):
            x = x[:, :, :-1]
        g = x.mean(axis=2)
        # area-average pooling onto 8 rows x 9 cols via bucket means
        ridx = (np.arange(h) * 8) // h
        cidx = (np.arange(w) * 9) // w
        flat_idx = (ridx[:, None] * 9 + cidx[None, :]).ravel()
        sums = np.bincount(flat_idx, weights=g.ravel(), minlength=72)
        cnts = np.bincount(flat_idx, minlength=72)
        grid = (sums / np.maximum(cnts, 1)).reshape(8, 9)
        bits = (grid[:, 1:] > grid[:, :-1]).ravel()
        v = 0
        for b in bits:
            v = (v << 1) | int(b)
        if v >= 1 << 63:
            v -= 1 << 64  # two's complement into signed int64
        return (v, w, h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_hash(p) or (None, None, None) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.array([r[0] for r in rows], dtype="Int64"),
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                }
            )

    return media.mapInPandas(run, schema=DHASH_SCHEMA)


def hamming_pairs(
    hashes: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "media_id",
    max_hamming: int = 6,
    bands: int = 8,
) -> DataFrame:
    """Near-dup pairs over any 64-bit fingerprint column: split the hash
    into ``bands`` equal bit-slices, bucket-join on (band, slice), verify
    with ``bit_count(xor)``. By pigeonhole, any pair within
    ``max_hamming < bands`` bits shares at least one untouched slice —
    EXACT recall, no candidate missed (the same guarantee simhash_pairs
    gives text). Shuffles on small slice keys, never all-pairs; returns
    (id_a < id_b, hamming)."""
    if not 64 % bands == 0:
        raise ValueError("bands must divide 64")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} >= bands={bands}: the pigeonhole "
            "exact-recall guarantee requires max_hamming < bands — raise "
            "bands (any divisor of 64) or lower max_hamming"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    rows = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(F.col("h"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("slice"),
            )
            for bi in range(bands)
        ]
    )
    buckets = rows.select("id", "h", F.explode(band_arr).alias("bk")).select(
        "id", "h", F.col("bk.band").alias("band"), F.col("bk.slice").alias("slice")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("afp", LongType()),
        StructField("sample_rate", IntegerType()),
    ]
)


def audio_fingerprint(media: DataFrame, n_frames: int = 8, n_bands: int = 9) -> DataFrame:
    """Perceptual audio fingerprint (Haitsma-Kalker shape): the clip is cut
    into ``n_frames`` equal windows, each window's spectrum is folded into
    ``n_bands`` log-spaced band energies, and each bit answers "did this
    band gain energy relative to the previous band and previous frame?" —
    ``n_frames x (n_bands-1)`` = 64 bits, an int64 that near-identical
    audio (re-encoded, slightly trimmed, gain-changed) reproduces within a
    few Hamming bits. Energy RATIOS make it gain-invariant by
    construction. Feed :func:`hamming_pairs` (the image-dedup machinery —
    one fingerprint family, three modalities). Non-PCM payloads → NULL."""
    import numpy as np

    if n_frames * (n_bands - 1) != 64:
        raise ValueError("n_frames * (n_bands - 1) must equal 64")

    def _fp(payload: bytes | None):
        pcm = _wav_pcm(payload)
        if pcm is None:
            return None
        a, rate, nch = pcm
        if not rate or a.size < 2 * nch:
            return None
        if nch > 1:
            a = a[: (a.size // nch) * nch].reshape(-1, nch).mean(axis=1)
        if a.size < 2 * n_frames:
            return None
        step = a.size // n_frames
        edges = np.geomspace(20.0, rate / 2.0, n_bands + 1)
        E = np.zeros((n_frames, n_bands))
        for fi in range(n_frames):
            seg = a[fi * step : (fi + 1) * step]
            p = np.abs(np.fft.rfft(seg * np.hanning(seg.size))) ** 2
            p[0] = 0.0
            freqs = np.fft.rfftfreq(seg.size, d=1.0 / rate)
            idx = np.clip(np.searchsorted(edges, freqs) - 1, 0, n_bands - 1)
            E[fi] = np.bincount(idx, weights=p, minlength=n_bands)[:n_bands]
        v = 0
        for fi in range(n_frames):
            for bi in range(n_bands - 1):
                d = E[fi, bi] - E[fi, bi + 1]
                if fi > 0:
                    d -= E[fi - 1, bi] - E[fi - 1, bi + 1]
                v = (v << 1) | int(d > 0)
        if v >= 1 << 63:
            v -= 1 << 64
        return (v, rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fp(p) or (None, None) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": pd.array([r[0] for r in rows], dtype="Int64"),
                    "sample_rate": pd.array([r[1] for r in rows], dtype="Int32"),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_FP_SCHEMA)
