"""Baseline JPEG codec (operators/jpeg.py): decode pinned against a
REAL-WORLD encoder artifact (CPython's 16x16 python.jpg test fixture —
the decoder must reproduce the Python-logo blue/yellow layout), plus
encoder→decoder roundtrips (flat-exact at quality 100, PSNR floors
across quality/subsampling), grayscale, byte stuffing, and the
progressive/unsupported seams."""

import base64

import numpy as np
import pytest

from pyppeteer_scraper_spark.operators.jpeg import (
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)

# CPython Lib/test/test_email/data/python.jpg (PSF license): 16x16
# Python logo, baseline 4:2:0, produced by a real encoder.
_PYTHON_LOGO_B64 = (
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_zigzag_matches_published_table_prefix():
    # first 16 entries of the T.81 zigzag sequence — transcribed from
    # the spec as an independent anchor for the derived walk
    assert ZIGZAG[:16].tolist() == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    ]
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()


def test_real_world_decode_python_logo():
    img = decode_jpeg(base64.b64decode(_PYTHON_LOGO_B64))
    assert img.shape == (16, 16, 3)
    r = img[:, :, 0].astype(int)
    g = img[:, :, 1].astype(int)
    b = img[:, :, 2].astype(int)
    blue = (b > 120) & (b > r + 30)
    yellow = (r > 140) & (g > 110) & (b < 110)
    # the logo's two snakes: blue mass in the top-left quadrant,
    # yellow mass in the bottom-right — and plenty of both overall
    assert blue.sum() > 40 and yellow.sum() > 40
    assert blue[:8, :8].sum() > blue[8:, 8:].sum()
    assert yellow[8:, 8:].sum() > yellow[:8, :8].sum()


def test_flat_image_exact_at_quality_100():
    for val, mode in ((77, "4:4:4"), (200, "4:2:0")):
        flat = np.full((24, 24, 3), val, np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=100, subsample=mode))
        assert out.shape == flat.shape
        assert np.abs(out.astype(int) - val).max() == 0, mode
    gflat = np.full((17, 19), 130, np.uint8)  # non-multiple-of-8 dims
    out = decode_jpeg(encode_jpeg(gflat, quality=100))
    assert out.shape == (17, 19) and (out == 130).all()


def _gradient(h=33, w=41):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 5) % 256, (y * 7) % 256, ((x + y) * 3) % 256], axis=2
    ).astype(np.uint8)


def test_roundtrip_psnr_floors():
    img = _gradient()
    floors = {
        (95, "4:4:4"): 48.0,
        (95, "4:2:0"): 38.0,
        (75, "4:2:0"): 33.0,
        (50, "4:4:4"): 35.0,
    }
    for (q, ss), floor in floors.items():
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=ss))
        assert out.shape == img.shape
        got = _psnr(img, out)
        assert got > floor, (q, ss, got)


def test_grayscale_roundtrip():
    y, x = np.mgrid[0:30, 0:22]
    g = ((x * 11 + y * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == g.shape and out.ndim == 2
    assert _psnr(g, out) > 38.0


def test_noise_roundtrip_exercises_byte_stuffing():
    # high-entropy content produces 0xFF bytes in the entropy stream
    # with near-certainty, exercising stuff/unstuff
    y, x = np.mgrid[0:32, 0:32]
    n = ((x * 2654435761 + y * 40503 + x * y * 97) % 256).astype(np.uint8)
    img = np.stack([n, n[::-1], n[:, ::-1]], axis=2).astype(np.uint8)
    payload = encode_jpeg(img, quality=95, subsample="4:4:4")
    out = decode_jpeg(payload)
    assert _psnr(img, out) > 25.0


def test_unsupported_seams():
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG")
    # progressive: splice an SOF2 marker into a minimal stream
    prog = b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + bytes(9) + b"\xff\xd9"
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)
