"""Round-trip tests for the baseline JPEG decoder (operators/jpeg_codec).

The encoder lives test-side (`tests/jpeg_encoder.py`) and emits REAL
entropy-coded baseline JPEG with the standard Annex K Huffman tables and
(by default) all-ones quantization, so the decoder is exercised on honest
bitstreams and tolerances stay tight: error is DCT float rounding plus
(for color) the two YCbCr rounding steps.
"""

from __future__ import annotations

import numpy as np
import pytest

from crossbar_data_process_spark.operators.jpeg_codec import (
    decode_jpeg,
    jpeg_dimensions,
)
from tests.jpeg_encoder import encode_jpeg


def _gradient_gray(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 7 + xx * 3) % 251).astype(np.uint8)


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = ((yy * 2 + xx) % 256).astype(np.uint8)
    g = ((yy + xx * 2) % 256).astype(np.uint8)
    b = ((255 - yy * 3 + xx) % 256).astype(np.uint8)
    # Smooth it so AC magnitudes stay inside the Annex-K size range.
    img = np.stack([r, g, b], axis=2).astype(np.float64)
    for _ in range(2):
        img[1:] = (img[1:] + img[:-1]) / 2
        img[:, 1:] = (img[:, 1:] + img[:, :-1]) / 2
    return img.astype(np.uint8)


def test_grayscale_roundtrip_exact_blocks():
    img = _gradient_gray(16, 24)
    out = decode_jpeg(encode_jpeg(img))
    assert out is not None and out.shape == (16, 24, 1)
    # All-ones quant: only FDCT/IDCT float rounding separates the two.
    assert np.max(np.abs(out[:, :, 0].astype(int) - img.astype(int))) <= 1


def test_rgb_444_roundtrip():
    img = _gradient_rgb(24, 17)  # width not a block multiple → crop path
    out = decode_jpeg(encode_jpeg(img))
    assert out is not None and out.shape == (24, 17, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert np.max(err) <= 4  # two color-transform roundings + DCT rounding
    assert np.mean(err) < 1.5


def test_rgb_420_subsampled_roundtrip():
    # Chroma-flat image: 4:2:0 averaging loses nothing → tight tolerance
    # proves MCU interleave + upsample geometry, not codec lossiness.
    img = np.zeros((32, 24, 3), np.uint8)
    img[:, :, 0] = _gradient_gray(32, 24)
    img[:, :, 1] = _gradient_gray(32, 24)
    img[:, :, 2] = _gradient_gray(32, 24)
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out is not None and out.shape == (32, 24, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert np.max(err) <= 4


def test_420_odd_dimensions_cropped():
    img = _gradient_rgb(21, 13)  # neither axis divides the 16x16 MCU
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out is not None and out.shape == (21, 13, 3)
    # Luma channel survives subsampling; compare through the luma proxy.
    to_y = np.array([0.299, 0.587, 0.114])
    y_in = img.astype(np.float64) @ to_y
    y_out = out.astype(np.float64) @ to_y
    assert np.max(np.abs(y_in - y_out)) <= 6


def test_restart_markers_match_unrestarted():
    img = _gradient_gray(32, 32)
    plain = decode_jpeg(encode_jpeg(img))
    restarted = decode_jpeg(encode_jpeg(img, restart_interval=3))
    assert restarted is not None
    assert np.array_equal(plain, restarted)


def test_nontrivial_quant_still_decodes():
    q = np.concatenate([np.full(8, 4), np.full(56, 16)]).astype(np.int32)
    img = _gradient_gray(16, 16)
    out = decode_jpeg(encode_jpeg(img, quant=q))
    assert out is not None and out.shape == (16, 16, 1)
    # Lossy now, but coarse structure must hold (dequant path correct).
    assert np.max(np.abs(out[:, :, 0].astype(int) - img.astype(int))) <= 24


def test_jpeg_dimensions_probe():
    img = _gradient_rgb(40, 56)
    payload = encode_jpeg(img)
    assert jpeg_dimensions(payload) == (56, 40, 3)
    assert jpeg_dimensions(payload[:2]) is None
    assert jpeg_dimensions(b"\x89PNG") is None


def test_progressive_marker_rejected():
    payload = bytearray(encode_jpeg(_gradient_gray(8, 8)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    assert decode_jpeg(bytes(payload)) is None


def test_truncated_stream_returns_none():
    payload = encode_jpeg(_gradient_gray(16, 16))
    assert decode_jpeg(payload[: len(payload) // 2]) is None
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"") is None


@pytest.mark.parametrize("shape", [(8, 8), (64, 48), (9, 31)])
def test_shapes_parametrized(shape):
    img = _gradient_gray(*shape)
    out = decode_jpeg(encode_jpeg(img))
    assert out is not None and out.shape == (*shape, 1)
    assert np.max(np.abs(out[:, :, 0].astype(int) - img.astype(int))) <= 1


# --- robustness: a 100 TB media pass must classify garbage, never die ---

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_decode_never_raises_on_random_bytes(data):
    out = decode_jpeg(data)
    assert out is None or out.dtype.name == "uint8"
    jpeg_dimensions(data)  # must also never raise


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_decode_never_raises_on_corrupted_valid_jpeg(data):
    """Start from a VALID baseline JPEG and corrupt bytes — exercises the
    deep decode paths (Huffman, MCU loop) far better than random blobs."""
    img = _gradient_gray(16, 16)
    payload = bytearray(encode_jpeg(img))
    n_flips = data.draw(st.integers(1, 8))
    for _ in range(n_flips):
        pos = data.draw(st.integers(2, len(payload) - 1))  # keep SOI
        payload[pos] = data.draw(st.integers(0, 255))
    out = decode_jpeg(bytes(payload))
    assert out is None or (out.dtype.name == "uint8" and out.ndim == 3)


@settings(max_examples=100, deadline=None)
@given(st.integers(4, len(encode_jpeg(_gradient_gray(16, 16))) - 1))
def test_decode_never_raises_on_any_truncation(cut):
    payload = encode_jpeg(_gradient_gray(16, 16))
    out = decode_jpeg(payload[:cut])
    assert out is None or out.dtype.name == "uint8"


def test_decompression_bomb_sof_rejected():
    """A SOF declaring a huge frame must be refused before any
    data-sized allocation (MAX_PIXELS guard)."""
    import struct

    payload = bytearray(encode_jpeg(_gradient_gray(8, 8)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    assert decode_jpeg(bytes(payload)) is None
