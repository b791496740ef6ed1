"""GIF codec (operators/multimodal.py): LZW lockstep roundtrips, an
independent uncompressed-mode stream check, a real-world external
fixture (the canonical 1x1 transparent tracking pixel), interlace,
transparency/disposal composition, and the decode_image wire-in."""

import base64

import numpy as np
import pytest

from pyppeteer_scraper_spark.operators.multimodal import (
    _interlace_order,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_image,
    encode_gif,
    image_features,
    real_decode,
)


def _rng_indices(n, n_colors, seed):
    # deterministic pseudo-random index stream without RandomState
    x = np.arange(n, dtype=np.int64)
    return ((x * 2654435761 + seed * 40503) % 2**31 % n_colors).astype(
        np.uint8
    )


def test_lzw_roundtrip_across_palette_sizes_and_lengths():
    for n_colors, mcs in ((2, 2), (4, 2), (16, 4), (256, 8)):
        for n in (1, 7, 255, 256, 5000):
            idx = _rng_indices(n, n_colors, seed=n_colors + n)
            got = _lzw_decode(_lzw_encode(idx, mcs), mcs)
            assert got == idx.tolist(), (n_colors, n)


def test_lzw_table_overflow_clear_roundtrip():
    # >4096 distinct phrases forces the 12-bit table to fill and the
    # encoder to emit a mid-stream clear; low-entropy long runs grow
    # the dictionary fastest.
    idx = np.concatenate(
        [np.repeat(np.arange(256, dtype=np.uint8), 40) for _ in range(6)]
    )
    assert len(idx) > 60000
    got = _lzw_decode(_lzw_encode(idx, 8), 8)
    assert got == idx.tolist()


def test_lzw_decoder_against_independent_uncompressed_stream():
    """Feed the decoder a stream built WITHOUT the encoder under test:
    the classic 'uncompressed GIF' technique emits only root codes,
    inserting a clear before the decoder's next_code would force a
    width change — its validity depends only on the spec, so it checks
    the decoder independently of encoder/decoder lockstep bugs."""
    mcs = 2
    clear, end = 4, 5
    width = mcs + 1
    idx = _rng_indices(997, 4, seed=3)
    codes = [clear]
    room = (1 << width) - end - 2  # defines until next_code hits 2^w
    for i, px in enumerate(idx):
        if i and i % room == 0:
            codes.append(clear)
        codes.append(int(px))
    codes.append(end)
    acc = v = 0
    out = bytearray()
    for c in codes:
        v |= c << acc
        acc += width
        while acc >= 8:
            out.append(v & 0xFF)
            v >>= 8
            acc -= 8
    if acc:
        out.append(v & 0xFF)
    assert _lzw_decode(bytes(out), mcs) == idx.tolist()


_TRACKING_PIXEL_B64 = (
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def test_real_world_1x1_tracking_pixel():
    frames, delays = decode_gif(base64.b64decode(_TRACKING_PIXEL_B64))
    assert frames.shape == (1, 1, 1, 3)
    assert len(delays) == 1


# CPython's idlelib/Icons/tk.gif (PSF license) — a real-world GIF from
# a real encoder, 14x11, 2 colors, with actual LZW dictionary growth;
# pins the decoder against an artifact we did not produce.
_TK_ICON_B64 = (
    "R0lGODlhDgALAPABAP8AAMDAwCH5BAUAAAEALAAAAAAOAAsAAAIfDI4Qu+naEmvRTGq"
    "gZVqd+1keyI1TKGlb9nVdxV1XAQA7"
)


def test_real_world_idlelib_icon():
    frames, _ = decode_gif(base64.b64decode(_TK_ICON_B64))
    assert frames.shape == (1, 11, 14, 3)
    colors = {tuple(c) for c in frames[0].reshape(-1, 3)}
    # tk-logo red; the gray (192,192,192) palette slot is declared
    # TRANSPARENT by the GCE, so it composes to the black canvas
    assert colors == {(255, 0, 0), (0, 0, 0)}


def _checker(h, w, n_colors):
    y, x = np.mgrid[0:h, 0:w]
    return ((x + y) % n_colors).astype(np.uint8)


def test_gif_roundtrip_pixels_exact():
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    img = _checker(13, 17, 4)
    frames, _ = decode_gif(encode_gif(img, pal))
    assert frames.shape == (1, 13, 17, 3)
    assert (frames[0] == pal[img]).all()


def test_gif_interlaced_roundtrip():
    pal = np.stack(
        [np.arange(256)] * 3, axis=1
    ).astype(np.uint8)  # gray ramp palette
    img = _rng_indices(31 * 9, 256, seed=7).reshape(31, 9)
    frames, _ = decode_gif(encode_gif(img, pal, interlace=True))
    assert (frames[0] == pal[img]).all()
    # interlace order itself: a permutation of all rows, pass 1 first
    order = _interlace_order(31)
    assert sorted(order) == list(range(31))
    assert order[:4] == [0, 8, 16, 24]


def test_gif_animation_transparency_and_disposal():
    pal = np.array(
        [[9, 9, 9], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    f0 = np.full((4, 4), 1, np.uint8)       # all red
    f1 = np.full((4, 4), 0, np.uint8)       # transparent idx 0 ...
    f1[1, 1] = 2                             # ... except one green px
    payload = encode_gif(
        [f0, f1], pal, delays_ms=[20, 40], transparent=0
    )
    frames, delays = decode_gif(payload)
    assert delays == [20, 40]
    assert (frames[0] == pal[1]).all()
    # frame 1 composites over frame 0: red everywhere, green at (1,1)
    assert (frames[1][1, 1] == pal[2]).all()
    mask = np.ones((4, 4), bool)
    mask[1, 1] = False
    assert (frames[1][mask] == pal[1]).all()


def test_decode_image_and_features_wirein():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    img = _checker(16, 16, 2)
    payload = encode_gif(img, pal)
    first = decode_image(payload)
    assert first.shape == (16, 16, 3)
    feats = real_decode(payload)
    ref = image_features(pal[img])
    assert np.allclose(feats, ref)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
