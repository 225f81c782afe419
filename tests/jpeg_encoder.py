"""Minimal baseline JPEG ENCODER — test fixture only, never shipped in the
engine (the engine only decodes; `resize_images` re-encodes as PNG).

Exists so `tests/test_jpeg_codec.py` can round-trip REAL entropy-coded
baseline JPEG through `operators/jpeg_codec.decode_jpeg` without any
external imaging library. Emits SOF0 + DQT + DHT + SOS with the standard
T.81 Annex K Huffman tables (public spec constants), optional 2x2 chroma
subsampling, optional restart markers, and — deliberately — all-ones
quantization tables by default so round-trip error is bounded by DCT
float rounding alone and tests can assert tight tolerances.
"""

from __future__ import annotations

import struct

import numpy as np

from crossbar_data_process_spark.operators.jpeg_codec import (
    _DCT_M,
    _ZIGZAG,
    build_huffman_table,
)

# T.81 Annex K.3 typical Huffman tables: (bits[16], huffval)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _encode_table(bits, huffval):
    """symbol -> (length, code), inverted from the shared canonical
    builder so encoder and decoder cannot drift."""
    return {sym: lc for lc, sym in build_huffman_table(bits, huffval).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _magnitude(v: int):
    """(size, low-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, coefs, dc_pred, dc_tab, ac_tab):
    """One zigzag-ordered 64-coefficient block."""
    size, bits = _magnitude(int(coefs[0]) - dc_pred)
    length, code = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coefs[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        if coefs[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(int(coefs[k]))
        length, code = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        length, code = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return int(coefs[0])


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (n_blocks, 64) zigzag ints,
    blocks in raster order for this plane."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    freq = np.einsum("ux,nxy,yv->nuv", _DCT_M, blocks, _DCT_M.T)
    zz = freq.reshape(-1, 64)[:, _ZIGZAG]
    return np.rint(zz / q[np.newaxis, :]).astype(np.int32)


def _pad_to(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate pad so dimensions hit multiples of the block grid."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw_
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) or (h, w, 1) grayscale or (h, w, 3) RGB uint8
    array as baseline JPEG. ``quant`` is a 64-long zigzag-order table
    applied to every component (default all-ones: near-lossless).
    ``subsample=True`` uses 2x2 luma sampling (4:2:0), averaging chroma
    2x2. ``restart_interval`` emits DRI + RSTn markers every N MCUs."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.ones(64, dtype=np.int32) if quant is None else np.asarray(quant, np.int32)

    if gray:
        comps = [(1, 1, 1)]  # (id, H, V)
        planes = [img.astype(np.float64) - 128.0]
    else:
        x = img.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        else:
            comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
        planes = [yy - 128.0, cb - 128.0, cr - 128.0]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # Quantized zigzag blocks per component, raster order within the plane.
    qblocks = []
    for (cid, ch, cv), plane in zip(comps, planes):
        padded = _pad_to(plane, mcus_y * cv * 8, mcus_x * ch * 8)
        qblocks.append(_fdct_quant(padded, q))

    # --- markers ---
    out = bytearray(b"\xff\xd8")  # SOI
    dqt = bytes([0x00]) + bytes(int(v) & 0xFF for v in q)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    huff_specs = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if not gray:
        huff_specs += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tcth, (bits, huffval) in huff_specs:
        seg = bytes([tcth]) + bytes(bits) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for idx, (cid, _ch, _cv) in enumerate(comps):
        tsel = 0x00 if idx == 0 or gray else 0x11
        sos += bytes([cid, tsel])
    sos += bytes([0, 63, 0])  # Ss, Se, AhAl
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # --- entropy-coded data, MCU-interleaved ---
    tabs = []
    for idx in range(len(comps)):
        if idx == 0:
            tabs.append((_encode_table(*DC_LUMA), _encode_table(*AC_LUMA)))
        else:
            tabs.append((_encode_table(*DC_CHROMA), _encode_table(*AC_CHROMA)))
    dc_pred = [0] * len(comps)
    bw_ = _BitWriter()
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw_.flush()
            out += bw_.out
            bw_ = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            dc_pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for c, (cid, ch, cv) in enumerate(comps):
            row_blocks = mcus_x * ch  # plane block-grid width
            for v in range(cv):
                for u in range(ch):
                    bi = (my * cv + v) * row_blocks + (mx * ch + u)
                    dc_pred[c] = _encode_block(
                        bw_, qblocks[c][bi], dc_pred[c], tabs[c][0], tabs[c][1]
                    )
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
