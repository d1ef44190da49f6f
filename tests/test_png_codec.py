"""Pure-stdlib PNG codec (functions/png.py) — round-trips across all
five filter types and color types, plus a hand-built spec fixture so
an encoder bug can't silently cancel a decoder bug."""

import struct
import zlib

import numpy as np
import pytest

from bleve_spark.functions.png import is_png, png_decode, png_encode


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(5, 7, 3), (8, 8, 1), (3, 4, 4),
                                   (6, 2, 2), (1, 1, 3)])
def test_round_trip(ft, shape):
    rng = np.random.RandomState(ft * 100 + shape[0])
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    data = png_encode(img, ft)
    assert is_png(data)
    assert np.array_equal(png_decode(data), img)


def test_hand_built_fixture_decodes():
    """2x2 RGB PNG assembled byte-by-byte from the spec (filter 0)."""
    raw = (b"\x00" + bytes([255, 0, 0, 0, 255, 0])
           + b"\x00" + bytes([0, 0, 255, 255, 255, 255]))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert png_decode(data).tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [255, 255, 255]],
    ]


def test_sub_filter_hand_computed():
    """Filter 1 (Sub) fixture with hand-computed filtered bytes:
    row = [10, 20, 30] gray → filtered = [10, 10, 10]."""
    raw = b"\x01" + bytes([10, 10, 10])
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert png_decode(data).reshape(-1).tolist() == [10, 20, 30]


def test_unsupported_rejected():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(png_encode(img))
    data[24] = 16  # bit depth 16
    with pytest.raises(ValueError):
        png_decode(bytes(data))
    with pytest.raises(ValueError):
        png_decode(b"JFIF not a png")


def test_decode_seam_uses_real_png():
    from bleve_spark.functions.multimodal import _decode_image

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    # metadata dimensions deliberately wrong: the PNG header wins
    out = _decode_image(png_encode(img, 4), 999, 999)
    assert np.array_equal(out, img)
    # RGBA / gray normalize to (H, W, 3)
    rgba = np.dstack([img, np.full((4, 5), 7, np.uint8)])
    assert _decode_image(png_encode(rgba), 0, 0).shape == (4, 5, 3)
    gray = img[:, :, 0]
    out = _decode_image(png_encode(gray), 0, 0)
    assert out.shape == (4, 5, 3)
    assert np.array_equal(out[:, :, 0], gray)
