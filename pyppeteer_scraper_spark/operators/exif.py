"""EXIF/TIFF metadata extraction, from scratch (stdlib struct only).

A multimodal Common-Crawl pipeline reads EXIF constantly — orientation
(to un-rotate before feature extraction), capture time, camera make,
pixel dimensions, GPS (for PII scrubbing: geotags are doxxable).  No
PIL in this sandbox, and none is needed: EXIF is a TIFF container
(ISO 12234-2 / EXIF 2.32 spec, public), i.e. a byte-order mark, a
linked list of IFDs (image file directories), and typed 12-byte tag
entries — fully parseable with ``struct``.

Implemented: both byte orders (II little / MM big), IFD0 chain, the
EXIF sub-IFD (0x8769) and GPS sub-IFD (0x8825), tag types BYTE, ASCII,
SHORT, LONG, RATIONAL (incl. values packed inline when <= 4 bytes vs
offset-addressed), and GPS degree/minute/second rational triplets
folded to signed decimal degrees.

Spark-side: ``exif_metadata`` runs the parser inside one Arrow-batched
``mapInPandas`` pass — binary payloads never shuffle (they stay in the
scan's partitions), only the small typed metadata columns come out.
Malformed payloads yield NULL columns, never task failures (quarantine
semantics, same policy as the crawl's shape guard).

Reference analog: the reference saves screenshots but reads no image
metadata (scraper/costco.py:123-128) — training-data-pipeline
extension (SURVEY.md §6 multimodal).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame


# --- tag ids (EXIF 2.32, public) ------------------------------------------
TAG_MAKE = 0x010F
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _pack_entries(entries, data_offset, bo):
    """Lay out one IFD: 12-byte entries plus an out-of-line data area.
    entries: list of (tag, type, values|bytes)."""
    body = b""
    out = struct.pack(bo + "H", len(entries))
    for tag, typ, val in sorted(entries):
        if typ == 2:  # ASCII, NUL-terminated
            raw = val.encode("ascii") + b"\x00"
            count = len(raw)
        elif typ == 5:  # RATIONAL pairs
            raw = b"".join(struct.pack(bo + "II", n, d) for n, d in val)
            count = len(val)
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            raw = b"".join(struct.pack(bo + fmt, v) for v in val)
            count = len(val)
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            out += struct.pack(bo + "HHI", tag, typ, count) + inline
        else:
            out += struct.pack(
                bo + "HHII", tag, typ, count, data_offset + len(body)
            )
            body += raw
    return out, body


def encode_exif(
    orientation: int = 1,
    make: str = "cam",
    datetime: str = "2026:01:01 00:00:00",
    width: int = 0,
    height: int = 0,
    lat: tuple | None = None,  # ((d,1),(m,1),(s_num,s_den), ref)
    lon: tuple | None = None,
    big_endian: bool = False,
) -> bytes:
    """Build a minimal valid EXIF/TIFF blob (IFD0 + EXIF sub-IFD +
    optional GPS sub-IFD) for fixtures and tests."""
    bo = ">" if big_endian else "<"
    header = (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, 8)

    # Fixed layout: IFD0 at 8.  Entry counts are known up front, so
    # compute section offsets, then pack with final numbers.
    n0 = 4 + (1 if lat or lon else 0)
    ifd0_size = 2 + 12 * n0 + 4
    # IFD0 out-of-line data directly after IFD0
    # (make + datetime strings); sub-IFDs follow.
    make_raw = len(make.encode("ascii")) + 1
    dt_raw = len(datetime.encode("ascii")) + 1
    ifd0_data = 8 + ifd0_size
    exif_off = ifd0_data + ((make_raw if make_raw > 4 else 0)
                            + (dt_raw if dt_raw > 4 else 0))
    exif_size = 2 + 12 * 2 + 4
    gps_off = exif_off + exif_size
    entries0 = [
        (TAG_MAKE, 2, make),
        (TAG_ORIENTATION, 3, [orientation]),
        (TAG_DATETIME, 2, datetime),
        (TAG_EXIF_IFD, 4, [exif_off]),
    ]
    if lat or lon:
        entries0.append((TAG_GPS_IFD, 4, [gps_off]))
    ifd0, body0 = _pack_entries(entries0, ifd0_data, bo)
    ifd0 += struct.pack(bo + "I", 0)  # next-IFD pointer

    exif_entries = [
        (TAG_PIXEL_X, 4, [width]),
        (TAG_PIXEL_Y, 4, [height]),
    ]
    # EXIF sub-IFD has no out-of-line data (LONGs pack inline)
    exif_ifd, _ = _pack_entries(exif_entries, 0, bo)
    exif_ifd += struct.pack(bo + "I", 0)

    gps_blob = b""
    if lat or lon:
        gps_entries = []
        gps_data = gps_off + 2 + 12 * 4 + 4
        if lat:
            d, m, s, ref = lat
            gps_entries.append((GPS_LAT_REF, 2, ref))
            gps_entries.append((GPS_LAT, 5, [d, m, s]))
        if lon:
            d, m, s, ref = lon
            gps_entries.append((GPS_LON_REF, 2, ref))
            gps_entries.append((GPS_LON, 5, [d, m, s]))
        gps_ifd, gps_body = _pack_entries(gps_entries, gps_data, bo)
        gps_blob = gps_ifd + struct.pack(bo + "I", 0) + gps_body

    return header + ifd0 + body0 + exif_ifd + gps_blob


def _read_ifd(buf: bytes, off: int, bo: str) -> dict:
    """Parse one IFD into {tag: value}; values decoded per type."""
    (n,) = struct.unpack_from(bo + "H", buf, off)
    out = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, base)
        if typ not in _TYPE_SIZES:
            continue
        nbytes = _TYPE_SIZES[typ] * count
        if nbytes <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", buf, base + 8)
        if typ == 2:
            raw = buf[voff : voff + count]
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 5:
            vals = [
                struct.unpack_from(bo + "II", buf, voff + 8 * j)
                for j in range(count)
            ]
            out[tag] = vals
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            out[tag] = [
                struct.unpack_from(bo + fmt, buf, voff + _TYPE_SIZES[typ] * j)[0]
                for j in range(count)
            ]
    (nxt,) = struct.unpack_from(bo + "I", buf, off + 2 + 12 * n)
    out["__next"] = nxt
    return out


def _dms_to_degrees(rats, ref: str) -> float:
    d = rats[0][0] / rats[0][1]
    m = rats[1][0] / rats[1][1] if len(rats) > 1 else 0.0
    s = rats[2][0] / rats[2][1] if len(rats) > 2 else 0.0
    val = d + m / 60.0 + s / 3600.0
    return -val if ref in ("S", "W") else val


def parse_exif(payload: bytes) -> dict:
    """Parse an EXIF/TIFF blob into a flat dict: orientation, make,
    datetime, width, height, lat, lon (decimal degrees, signed).
    Missing fields are absent; malformed input raises ValueError."""
    if len(payload) < 8:
        raise ValueError("too short")
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad byte-order mark")
    magic, first = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    ifd0 = _read_ifd(payload, first, bo)
    out: dict = {}
    if TAG_ORIENTATION in ifd0:
        out["orientation"] = int(ifd0[TAG_ORIENTATION][0])
    if TAG_MAKE in ifd0:
        out["make"] = ifd0[TAG_MAKE]
    if TAG_DATETIME in ifd0:
        out["datetime"] = ifd0[TAG_DATETIME]
    if TAG_EXIF_IFD in ifd0:
        sub = _read_ifd(payload, ifd0[TAG_EXIF_IFD][0], bo)
        if TAG_PIXEL_X in sub:
            out["width"] = int(sub[TAG_PIXEL_X][0])
        if TAG_PIXEL_Y in sub:
            out["height"] = int(sub[TAG_PIXEL_Y][0])
    if TAG_GPS_IFD in ifd0:
        gps = _read_ifd(payload, ifd0[TAG_GPS_IFD][0], bo)
        if GPS_LAT in gps and GPS_LAT_REF in gps:
            out["lat"] = _dms_to_degrees(gps[GPS_LAT], gps[GPS_LAT_REF])
        if GPS_LON in gps and GPS_LON_REF in gps:
            out["lon"] = _dms_to_degrees(gps[GPS_LON], gps[GPS_LON_REF])
    return out


_EXIF_SCHEMA = (
    "doc_id long, orientation int, make string, dt string, "
    "width int, height int, lat double, lon double"
)


def exif_metadata(
    media: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Extract EXIF metadata from a binary column in ONE Arrow-batched
    mapInPandas pass: payloads never shuffle, malformed blobs become
    all-NULL metadata rows (quarantine, not task failure)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = parse_exif(bytes(payload))
                except (ValueError, struct.error, IndexError):
                    m = {}
                rows.append(
                    (
                        int(i),
                        m.get("orientation"),
                        m.get("make"),
                        m.get("datetime"),
                        m.get("width"),
                        m.get("height"),
                        m.get("lat"),
                        m.get("lon"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "orientation", "make", "dt",
                    "width", "height", "lat", "lon",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=_EXIF_SCHEMA
    )
