"""Perceptual dHash over the real image codecs: container invariance
(same pixels through PPM / BMP / PNG hash identical), brightness
invariance, discrimination, and area-resize correctness."""

import numpy as np

from pyppeteer_scraper_spark.operators.multimodal import (
    _area_resize_gray,
    decode_image,
    dhash64,
    encode_bmp,
    encode_png,
    encode_ppm,
)


def _img(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(
        np.uint8
    )


def test_area_resize_exact_block_means():
    # 4x4 → 2x2 with equal blocks: each output cell is the block mean
    g = np.array(
        [
            [0, 0, 8, 8],
            [0, 4, 8, 12],
            [100, 100, 50, 50],
            [100, 100, 50, 50],
        ],
        dtype=np.float64,
    )
    out = _area_resize_gray(g, 2, 2)
    assert np.allclose(out, [[1.0, 9.0], [100.0, 50.0]])


def test_area_resize_handles_tiny_inputs():
    g = np.array([[10.0, 20.0]])  # 1x2 → 8x9 must not crash
    out = _area_resize_gray(g, 8, 9)
    assert out.shape == (8, 9)
    assert out.min() >= 10.0 and out.max() <= 20.0


def test_dhash_container_invariant():
    # palette-constrained pixels so the SAME image is losslessly
    # expressible in all four containers, including indexed GIF
    from pyppeteer_scraper_spark.operators.multimodal import encode_gif

    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8).astype(np.uint8)
    idx = rng.integers(0, 256, size=(24, 32), dtype=np.uint8).astype(np.uint8)
    img = pal[idx]
    hashes = {
        dhash64(decode_image(encode_ppm(img))),
        dhash64(decode_image(encode_bmp(img))),
        dhash64(decode_image(encode_png(img, filter_type=4))),
        dhash64(decode_image(encode_gif(idx, pal))),
    }
    assert len(hashes) == 1, "same pixels, different container → same hash"


def test_dhash_brightness_invariant_and_discriminative():
    img = _img(11).astype(np.int16)
    # uniform brightness shift on a mid-range image preserves all
    # horizontal orderings → identical dHash
    mid = np.clip(img, 40, 215).astype(np.uint8)
    brighter = (mid + 30).astype(np.uint8)
    assert dhash64(mid) == dhash64(brighter)
    # different content → different hash (64 bits; random collision
    # probability ~5e-20)
    assert dhash64(_img(1)) != dhash64(_img(2))


def test_dhash_is_64bit_and_deterministic():
    h = dhash64(_img(3))
    assert 0 <= h < 2**64
    assert h == dhash64(_img(3))
    assert format(h, "016x")  # hex form used by the dedup query
