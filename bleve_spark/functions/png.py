"""Pure-stdlib PNG codec (zlib + numpy) — closes the image decode seam
for real without PIL/cv2: PNG is DEFLATE over per-row filtered
scanlines (RFC 2083). Supports 8-bit grayscale (color type 0), RGB (2),
gray+alpha (4) and RGBA (6), non-interlaced — the overwhelmingly common
shapes. The encoder exists so tests and corpora can synthesize REAL
PNG payloads; it can emit any of the five filter types per row, which
lets tests exercise every unfilter path against a numpy-computed
expectation (round-trip is not trusted on its own).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (int16 to avoid uint8 wrap in the
    distance arithmetic)."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    out = np.where(
        (pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16)
    )
    return out.astype(np.uint8)


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array (C ∈ {1,2,3,4}) as a
    PNG, filtering every row with ``filter_type`` (0..4)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = arr.reshape(h, w * c)
    bpp = c
    out_rows = []
    prior = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = flat[y]
        left = np.zeros_like(row)
        left[bpp:] = row[:-bpp]
        pl = np.zeros_like(prior)
        pl[bpp:] = prior[:-bpp]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prior
        elif filter_type == 3:
            avg = (
                (left.astype(np.int16) + prior.astype(np.int16)) // 2
            ).astype(np.uint8)
            filt = row - avg
        elif filter_type == 4:
            filt = row - _paeth(left, prior, pl)
        else:
            raise ValueError(f"bad filter {filter_type}")
        out_rows.append(bytes([filter_type]) + filt.tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows), 6)
    return (
        _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, C) uint8 array. 8-bit depth, color
    types 0/2/4/6, non-interlaced; raises ValueError on anything
    else."""
    if not is_png(data):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color = depth = interlace = None
    idat = []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if typ == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    c = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * c
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    bpp = c
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1,
        ).copy()
        if ft == 0:
            recon = row
        elif ft == 2:  # Up — fully vectorized
            recon = row + prior
        elif ft == 1:  # Sub — prefix sum per channel, mod 256
            px = row.reshape(width, bpp).astype(np.uint32)
            recon = np.cumsum(px, axis=0, dtype=np.uint32) \
                .astype(np.uint8).reshape(stride)
        else:  # Average (3) / Paeth (4): sequential in x per pixel
            recon = np.zeros(stride, dtype=np.uint8)
            pr16 = prior.astype(np.int16)
            for x in range(width):
                off = x * bpp
                left = (
                    recon[off - bpp:off].astype(np.int16)
                    if x > 0 else np.zeros(bpp, dtype=np.int16)
                )
                up = pr16[off:off + bpp]
                ul = (
                    pr16[off - bpp:off]
                    if x > 0 else np.zeros(bpp, dtype=np.int16)
                )
                seg = row[off:off + bpp].astype(np.int16)
                if ft == 3:
                    pred = (left + up) // 2
                elif ft == 4:
                    pred = _paeth(
                        left.astype(np.uint8), up.astype(np.uint8),
                        ul.astype(np.uint8),
                    ).astype(np.int16)
                else:
                    raise ValueError(f"bad filter byte {ft}")
                recon[off:off + bpp] = ((seg + pred) % 256).astype(
                    np.uint8
                )
        out[y] = recon
        prior = recon
    return out.reshape(height, width, c)
