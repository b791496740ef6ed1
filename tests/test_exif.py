"""Round-4 session-10: from-scratch EXIF/TIFF metadata parsing."""

import struct

import pytest

from pyppeteer_scraper_spark.operators.exif import (
    encode_exif,
    exif_metadata,
    parse_exif,
)


def test_roundtrip_both_endiannesses():
    for be in (False, True):
        blob = encode_exif(
            orientation=6, make="acme", datetime="2026:08:20 12:00:00",
            width=640, height=480,
            lat=((37, 1), (46, 1), (300, 10), "N"),
            lon=((122, 1), (25, 1), (0, 1), "W"),
            big_endian=be,
        )
        m = parse_exif(blob)
        assert m["orientation"] == 6 and m["make"] == "acme"
        assert (m["width"], m["height"]) == (640, 480)
        assert abs(m["lat"] - (37 + 46 / 60 + 30 / 3600)) < 1e-9
        assert abs(m["lon"] + (122 + 25 / 60)) < 1e-9  # W -> negative


def test_inline_vs_offset_values_and_no_gps():
    # make "x" (2 bytes w/ NUL) packs INLINE; "acme" (5) goes offset —
    # the parser must handle both addressing modes.
    m = parse_exif(encode_exif(orientation=1, make="x", width=2, height=3))
    assert m["make"] == "x" and "lat" not in m
    m = parse_exif(encode_exif(orientation=1, make="acme", width=2, height=3))
    assert m["make"] == "acme"


def test_malformed_raises():
    with pytest.raises(ValueError):
        parse_exif(b"JUNK")
    with pytest.raises(ValueError):
        parse_exif(b"II" + struct.pack("<HI", 41, 8))  # bad magic


def test_exif_metadata_quarantines_bad_blobs(spark):
    good = encode_exif(orientation=3, make="ok", width=10, height=20)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not exif at all"))],
        ["doc_id", "payload"],
    )
    got = {r["doc_id"]: r for r in exif_metadata(df).collect()}
    assert got[1]["orientation"] == 3 and got[1]["make"] == "ok"
    assert got[2]["orientation"] is None and got[2]["make"] is None
