"""From-scratch PNG codec (operators/multimodal.py): pixel-exact
roundtrips through every scanline filter, palette/gray/RGBA decode,
CRC verification, unsupported-feature seams, and the real_decode
integration."""

import struct
import zlib

import numpy as np
import pytest

from pyppeteer_scraper_spark.operators.multimodal import (
    _PNG_SIG,
    _png_chunk,
    decode_png,
    encode_png,
    image_features,
    real_decode,
)


def _img(h=13, w=17, seed=5):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_truecolor_every_filter(ft):
    img = _img()
    payload = encode_png(img, filter_type=ft)
    out = decode_png(payload)
    assert out.shape == img.shape
    assert np.array_equal(out, img), f"filter {ft}"


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_gray_every_filter(ft):
    img = _img()[:, :, 0]
    out = decode_png(encode_png(img, filter_type=ft))
    assert np.array_equal(out, img)


def test_png_hand_built_golden():
    """A 2x2 truecolor PNG built byte-by-byte from the spec (no
    encoder involved): IHDR + one zlib stream of two filter-0 rows."""
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [7, 8, 9]]], np.uint8
    )
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = b"\x00" + px[0].tobytes() + b"\x00" + px[1].tobytes()
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), px)


def test_png_palette_decode():
    """Color type 3: indices + PLTE → expanded RGB."""
    plte = np.array([[10, 20, 30], [200, 100, 0], [0, 0, 0]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), plte[idx])


def test_png_rgba_and_gray_alpha():
    rng = np.random.RandomState(3)
    rgba = rng.randint(0, 256, (4, 5, 4), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), rgba)
    # gray+alpha keeps the gray plane
    ga = rng.randint(0, 256, (3, 3, 2), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 4, 0, 0, 0)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(3))
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), ga[:, :, 0])


def test_png_multiple_idat_chunks():
    img = _img(9, 7)
    payload = encode_png(img, filter_type=4)
    # split the single IDAT into two: re-chunk the zlib stream
    i = 8
    chunks = []
    while i + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, i)
        tag = payload[i + 4 : i + 8]
        chunks.append((tag, payload[i + 8 : i + 8 + ln]))
        i += 12 + ln
    rebuilt = _PNG_SIG
    for tag, data in chunks:
        if tag == b"IDAT":
            mid = len(data) // 2
            rebuilt += _png_chunk(b"IDAT", data[:mid])
            rebuilt += _png_chunk(b"IDAT", data[mid:])
        else:
            rebuilt += _png_chunk(tag, data)
    assert np.array_equal(decode_png(rebuilt), img)


def test_png_error_paths():
    img = _img(4, 4)
    payload = bytearray(encode_png(img))
    payload[60] ^= 0xFF  # corrupt inside a chunk body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    # 16-bit and interlaced raise the documented seam
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    p16 = _PNG_SIG + _png_chunk(b"IHDR", ihdr16) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(p16)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    pi = _PNG_SIG + _png_chunk(b"IHDR", ihdr_i) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(pi)


def test_real_decode_sniffs_png():
    img = _img(16, 16)
    f = real_decode(encode_png(img, filter_type=2))
    assert np.allclose(f, image_features(img))
    assert f.shape == (69,)
    # gray feature path: replicated channels -> all three means equal
    g = real_decode(encode_png(img[:, :, 0]))
    assert g[2] == g[3] == g[4]
