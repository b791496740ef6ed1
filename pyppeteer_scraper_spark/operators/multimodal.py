"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

Decode is REAL for every format expressible without external libs:
binary netpbm (PPM/PGM), uncompressed 24-bit BMP, PCM WAV, — from
stdlib ``zlib`` — 8-bit PNG (gray / truecolor / palette / alpha, all
five scanline filters, CRC-verified chunks), GIF87a/89a (from-scratch
variable-width LZW, interlace, transparency, multi-frame animation),
and baseline JPEG (from-scratch Huffman + DCT, operators/jpeg.py —
both codecs validated against real-world encoder artifacts, see
tests/test_gif_codec.py and tests/test_jpeg_codec.py) are decoded with
numpy + stdlib (``real_decode``), including a real block-average
resize (``thumbnail_gray``) and image/audio feature extraction.  Only
formats whose codecs are genuinely out of reach here (MP4/H.264,
progressive JPEG) remain a NotImplementedError seam (``real_decode_stub``) —
PIL/ffmpeg are not in this container.  Everything Spark-side is real and tested: schemas,
batch shapes, partitioning, and the UDF signatures.  Reference analog:
the screenshot binary sink (/root/reference/scraper/costco.py:123-128)
— binary payloads ride in ordinary columns.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: folds the payload
    bytes into a fixed-dim float vector.  Replace with a real
    PIL/ffmpeg decode when the libs exist."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return arr.reshape(-1, dim).mean(axis=0).astype(np.float32) / 255.0


def real_decode_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """The seam a real decoder fills.  Kept explicit so downstream code
    paths exercise the error contract too."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this container; "
        "pass decoder=fake_decode or plug in PIL/ffmpeg here"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    batch_note_dim: int = 8,
) -> DataFrame:
    """media(media_id, kind, payload, meta) → per-item feature vectors.

    mapInPandas keeps one Arrow batch in flight per task; the binary
    column never round-trips through the driver.  Partitioning of the
    input is preserved — repartition upstream by size if payloads are
    skewed (e.g. video >> image).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index, computed from metadata only (the decode itself is the
    stubbed step).  Demonstrates the explode-shaped UDTF plumbing."""
    from pyspark.sql import functions as F

    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idxs = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idxs).alias("frame_idx"))
    )


# --- real decoders for container-expressible formats -----------------------
# PPM/PGM (netpbm), uncompressed 24-bit BMP, PCM WAV, and zlib-based
# PNG decode with numpy + stdlib only — no PIL/ffmpeg required, so the
# decode step is REAL for these formats; JPEG (DCT/Huffman) and MP4
# (H.264) remain the documented NotImplementedError seam
# (real_decode_stub).


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → (h, w, 3) or (h, w) uint8."""
    if not payload.startswith((b"P6", b"P5")):
        raise ValueError("not a binary netpbm payload")
    parts = []
    i = 2
    while len(parts) < 3:  # width, height, maxval (comments skipped)
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    assert maxval == 255, "only 8-bit netpbm supported"
    if payload.startswith(b"P6"):
        return np.frombuffer(payload, np.uint8, h * w * 3, i).reshape(h, w, 3)
    return np.frombuffer(payload, np.uint8, h * w, i).reshape(h, w)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (BGR, bottom-up,
    4-byte row padding)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    import struct

    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hsize, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    rows = [
        np.frombuffer(payload, np.uint8, row, offset + y * stride).reshape(w, 3)
        for y in range(h)
    ]
    img = np.stack(rows[::-1] if flip else rows)
    return img[:, :, ::-1]  # BGR → RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → PCM WAV container (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (int16 mono samples, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        assert f.getsampwidth() == 2, "only 16-bit PCM supported"
        raw = f.readframes(f.getnframes())
        sr = f.getframerate()
        arr = np.frombuffer(raw, dtype="<i2")
        if f.getnchannels() > 1:
            arr = arr.reshape(-1, f.getnchannels()).mean(axis=1).astype(np.int16)
    return arr, sr


# --- PNG codec (stdlib zlib only) -------------------------------------------
# A Common-Crawl multimodal pipeline sees PNGs constantly; unlike
# JPEG/MP4, PNG needs nothing beyond DEFLATE (zlib) + per-row
# un-filtering, so the decode step is implementable from scratch here.
# Spec: https://www.w3.org/TR/png-3/ (chunks §5, filters §9).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → 8-bit PNG.  ``filter_type``
    applies that scanline filter (0..4) to every row — exercising each
    un-filter path in the decoder via exact roundtrips."""
    import struct
    import zlib

    assert img.dtype == np.uint8
    if img.ndim == 2:
        color, bpp = 0, 1
        flat = img[:, :, None]
    else:
        assert img.shape[2] == 3
        color, bpp = 2, 3
        flat = img
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    prev = np.zeros(w * bpp, dtype=np.int32)
    lines = []
    for y in range(h):
        cur = flat[y].reshape(-1).astype(np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        b = prev
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - a
        elif filter_type == 2:
            out = cur - b
        elif filter_type == 3:
            out = cur - ((a + b) >> 1)
        elif filter_type == 4:
            out = cur - _paeth(a, b, c)
        else:
            raise ValueError(f"filter_type {filter_type}")
        lines.append(bytes([filter_type]) + (out & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit PNG → uint8 array: (h, w) for grayscale, (h, w, 3) for
    truecolor and palette, (h, w, 4) for RGBA (alpha preserved).

    Supports color types 0/2/3/4/6 at bit depth 8, scanline filters
    0-4, multiple IDAT chunks, CRC verification.  Sub-byte palette
    depths and Adam7 interlace raise NotImplementedError."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i, idat, plte, ihdr = 8, [], None, None
    while i + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, i)
        tag = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, i + 8 + ln)
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        i += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} not supported (8 only)")
    if comp or filt:
        raise ValueError("invalid compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    bpp = channels
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += stride + 1
        if ft == 0:
            cur = line
        elif ft == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub — serial in x
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, channels) if channels > 1 else out.reshape(h, w)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[img]
    if color == 4:  # gray+alpha → keep gray plane
        return img[:, :, 0]
    return img


def thumbnail_gray(img: np.ndarray, size: int = 8) -> np.ndarray:
    """Block-average grayscale thumbnail (the resize step, real): crop
    to a size-divisible grid, then mean-pool — O(pixels), vectorized."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    bh, bw = max(h // size, 1), max(w // size, 1)
    img = img[: bh * size, : bw * size]
    return (
        img.reshape(size, bh, size, bw).mean(axis=(1, 3)).astype(np.float32)
        / 255.0
    )


def image_features(img: np.ndarray) -> np.ndarray:
    """[w, h, mean_r, mean_g, mean_b] + flattened 8×8 gray thumbnail —
    69 floats, deterministic.  Grayscale inputs replicate to three
    channels; RGBA drops alpha."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    return np.concatenate(
        [[w, h], means, thumbnail_gray(img).ravel()]
    ).astype(np.float32)


def audio_features(samples: np.ndarray, sr: int) -> np.ndarray:
    """[duration_s, rms, zero_crossing_rate, peak] — deterministic."""
    x = samples.astype(np.float64) / 32768.0
    dur = len(x) / sr if sr else 0.0
    rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    return np.array([dur, rms, zcr, peak], dtype=np.float32)


def mime_sniff_col(col):
    """Magic-byte MIME sniffing as a PURE CODEGEN column expression —
    no Python touches the payload: ``hex(substring(payload, 1, 12))``
    prefix tests cover every container this engine can produce or
    decode (PNG/GIF/JPEG/BMP/PPM/PGM/WAV-RIFF/MP4-ftyp).  At 100 TB
    this is the dispatch column a multimodal pipeline partitions by
    BEFORE any decoder runs, so each format's decode stage reads only
    its own rows; being codegen it costs one whole-stage projection.
    """
    from pyspark.sql import functions as F

    h = F.hex(F.substring(col, 1, 12))
    return (
        F.when(h.startswith("89504E470D0A1A0A"), F.lit("image/png"))
        .when(h.startswith("474946383761")
              | h.startswith("474946383961"), F.lit("image/gif"))
        .when(h.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(h.startswith("424D"), F.lit("image/bmp"))
        .when(h.startswith("5036"),
              F.lit("image/x-portable-pixmap"))
        .when(h.startswith("5035"),
              F.lit("image/x-portable-graymap"))
        .when(
            h.startswith("52494646")
            & (F.hex(F.substring(col, 9, 4)) == "57415645"),
            F.lit("audio/wav"),
        )
        .when(
            F.hex(F.substring(col, 5, 4)) == "66747970",
            F.lit("video/mp4"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )


def _mel_filterbank(
    n_mels: int, n_fft: int, sr: int
) -> np.ndarray:
    """Triangular mel filterbank (n_mels, n_fft//2+1), HTK mel scale
    mel(f) = 2595 log10(1 + f/700), filters spanning 0..Nyquist."""
    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64)
                                 / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    freqs = np.arange(n_bins) * (sr / n_fft)
    edges = from_mel(np.linspace(0.0, float(to_mel(sr / 2)), n_mels + 2))
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, ctr, hi = edges[m], edges[m + 1], edges[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-12)
        down = (hi - freqs) / max(hi - ctr, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def audio_spectral_features(
    samples: np.ndarray,
    sr: int,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 16,
) -> np.ndarray:
    """Real frequency-domain audio features — numpy FFT, from scratch:
    Hann-windowed frames → rfft power spectrum averaged over frames →
    [n_frames, peak_bin, peak_hz, centroid_hz, bandwidth_hz,
    rolloff85_hz, flatness] + n_mels log-mel filterbank energies
    (7 + n_mels floats).  peak_bin of a bin-exact sine is analytically
    known, which is what the SQL oracle pins; the continuous features
    are pytest-pinned against analytic expectations (centroid→f0,
    sine flatness ≪ broadband flatness)."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    spec = np.abs(np.fft.rfft(x[idx] * window, axis=1)) ** 2
    s = spec.mean(axis=0)
    freqs = np.arange(len(s)) * (sr / n_fft)
    total = s.sum()
    if total <= 0:
        centroid = bandwidth = rolloff = 0.0
        flatness = 1.0
        peak_bin = 0
    else:
        p = s / total
        centroid = float((freqs * p).sum())
        bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * p).sum()))
        rolloff = float(freqs[np.searchsorted(np.cumsum(p), 0.85)])
        flatness = float(
            np.exp(np.mean(np.log(s + 1e-20))) / (s.mean() + 1e-20))
        peak_bin = int(np.argmax(s))
    mel = _mel_filterbank(n_mels, n_fft, sr) @ s
    logmel = np.log10(mel + 1e-12)
    return np.concatenate(
        [[n_frames, peak_bin, peak_bin * (sr / n_fft), centroid,
          bandwidth, rolloff, flatness], logmel]
    ).astype(np.float32)


def _area_resize_gray(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Exact area-average resize to (rows, cols) via an integral image
    — the box-filter downscale perceptual hashing expects, O(pixels),
    any input size (tiny inputs are nearest-repeated up first so every
    output cell covers ≥1 source pixel)."""
    g = gray.astype(np.float64)
    h, w = g.shape
    if h < rows:
        g = np.repeat(g, -(-rows // h), axis=0)
        h = g.shape[0]
    if w < cols:
        g = np.repeat(g, -(-cols // w), axis=1)
        w = g.shape[1]
    integral = np.zeros((h + 1, w + 1))
    integral[1:, 1:] = g.cumsum(0).cumsum(1)
    ys = (np.arange(rows + 1) * h) // rows
    xs = (np.arange(cols + 1) * w) // cols
    areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    sums = (
        integral[ys[1:]][:, xs[1:]]
        - integral[ys[:-1]][:, xs[1:]]
        - integral[ys[1:]][:, xs[:-1]]
        + integral[ys[:-1]][:, xs[:-1]]
    )
    return sums / areas


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): area-resize to 8×9 grayscale,
    emit one bit per horizontally-adjacent cell pair (left < right).
    Invariant to uniform brightness/contrast shifts and to the encoding
    container (the same pixels through PPM, BMP, or PNG hash equal —
    pytest-pinned), tolerant of small rescales — the standard cheap
    near-dup signature for web images (Krawetz's dHash, as used in
    image-corpus dedup pipelines)."""
    if img.ndim == 3:
        if img.shape[2] == 4:
            img = img[:, :, :3]
        img = img.mean(axis=2)
    g = _area_resize_gray(img, 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    return int(
        np.packbits(bits.astype(np.uint8)).view(">u8")[0]
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode an IMAGE payload to a pixel array (PPM/PGM/BMP/
    PNG/GIF — the real codecs in this module; GIF yields its first
    frame); NotImplementedError on the compressed-format seam,
    ValueError on non-image payloads."""
    if payload.startswith((b"P6", b"P5")):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return decode_gif(payload)[0][0]
    if payload[:2] == b"\xff\xd8":
        from pyppeteer_scraper_spark.operators.jpeg import decode_jpeg

        # baseline SOF0/SOF1 decodes for real (operators/jpeg.py,
        # validated against real-encoder artifacts); progressive SOF2
        # raises NotImplementedError from inside the codec
        return decode_jpeg(payload)
    raise ValueError("not a recognized image payload")


def real_decode(payload: bytes, dim: int = 0) -> np.ndarray:
    """Format-sniffing REAL decoder for PPM/BMP/WAV; raises the
    documented NotImplementedError for compressed formats (the
    PIL/ffmpeg seam).  Drop-in for ``extract_features(decoder=...)``."""
    if payload is None or len(payload) < 4:
        return np.zeros(4, dtype=np.float32)
    if payload.startswith((b"P6", b"P5")):
        return image_features(decode_ppm(payload))
    if payload.startswith(b"BM"):
        return image_features(decode_bmp(payload))
    if payload.startswith(b"RIFF"):
        return audio_features(*decode_wav(payload))
    if payload.startswith(_PNG_SIG):
        return image_features(decode_png(payload))
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return image_features(decode_gif(payload)[0][0])
    if payload[:2] == b"\xff\xd8":
        from pyppeteer_scraper_spark.operators.jpeg import decode_jpeg

        return image_features(decode_jpeg(payload))
    raise NotImplementedError(
        "MP4/H.264 and progressive-JPEG decode need ffmpeg/libjpeg — "
        "absent in this container; PPM/PGM/BMP/WAV/PNG/GIF/baseline-"
        "JPEG decode is real"
    )


# --- GIF codec (pure stdlib + numpy) -----------------------------------------
# GIF needs only variable-width LZW (spec Appendix F) — implementable
# from scratch, unlike JPEG/MP4.  Covers GIF87a/89a: global/local color
# tables, interlace, Graphic Control Extensions (per-frame delay,
# transparency, disposal 0-2), multi-frame animations.
# Spec: https://www.w3.org/Graphics/GIF/spec-gif89a.txt

_GIF_MAX_CODE = 4096  # 12-bit code space


def _lzw_decode(data: bytes, mcs: int) -> list[int]:
    """GIF variable-width LZW decode (LSB-first bit packing).

    Width grows when next_code reaches 1<<width (the code that CAN
    appear next is next_code itself — the cScSc special case — so the
    reader must widen as soon as that value needs the extra bit);
    at 4096 the table freezes until a clear code (deferred clear)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: dict[int, list[int]] = {}
    next_code = end + 1
    prev: list[int] | None = None
    out: list[int] = []
    bitpos, total = 0, len(data) * 8
    while bitpos + width <= total:
        byte = bitpos >> 3
        chunk = int.from_bytes(data[byte : byte + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = {i: [i] for i in range(clear)}
            width, next_code, prev = mcs + 1, end + 1, None
            continue
        if code == end:
            break
        if not table:
            raise ValueError("LZW data before first clear code")
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            if next_code < _GIF_MAX_CODE:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
    return out


def _lzw_encode(indices, mcs: int) -> bytes:
    """GIF variable-width LZW encode — exact lockstep with
    _lzw_decode: the encoder widens one assignment EARLIER (when
    next_code == (1<<width)+1, i.e. the just-assigned code value hit
    1<<width) because its very next emitted code may be that value."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    bits: list[int] = []  # (little-endian bit accumulation)
    acc = [0, 0]  # value, nbits

    out = bytearray()

    def emit(code: int) -> None:
        acc[0] |= code << acc[1]
        acc[1] += width
        while acc[1] >= 8:
            out.append(acc[0] & 0xFF)
            acc[0] >>= 8
            acc[1] -= 8

    emit(clear)
    buf: tuple = ()
    for px in map(int, indices):
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        if next_code < _GIF_MAX_CODE:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: clear and restart (decoder resets in sync)
            emit(clear)
            table = {(i,): i for i in range(clear)}
            width, next_code = mcs + 1, end + 1
        buf = (px,)
    if buf:
        emit(table[buf])
    emit(end)
    if acc[1]:
        out.append(acc[0] & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into GIF 255-byte size-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames,
    palette: np.ndarray,
    delays_ms: list[int] | None = None,
    transparent: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Palette-index frames (each (h, w) uint8) + (n, 3) palette →
    GIF89a bytes.  Multi-frame inputs get a Graphic Control Extension
    per frame (delay in 10 ms units, optional transparent index)."""
    import struct

    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    h, w = frames[0].shape
    n_colors = len(palette)
    gct_bits = max(1, (int(n_colors) - 1).bit_length())
    gct_size = 1 << gct_bits
    mcs = max(2, gct_bits)  # LZW min code size >= 2 per spec
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    pal = np.zeros((gct_size, 3), np.uint8)
    pal[:n_colors] = palette
    out += pal.tobytes()
    for i, frame in enumerate(frames):
        assert frame.shape == (h, w) and frame.max(initial=0) < n_colors
        if len(frames) > 1 or transparent is not None:
            delay = (delays_ms[i] if delays_ms else 100) // 10
            packed = (1 << 2) | (1 if transparent is not None else 0)
            out += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, packed, delay,
                transparent if transparent is not None else 0, 0,
            )
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
        )
        px = frame[_interlace_order(h), :] if interlace else frame
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(px.ravel(), mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF87a/89a → ((n_frames, h, w, 3) uint8 RGB, per-frame delays
    in ms).  Handles global+local color tables, interlace, transparency
    and disposal methods 0-2 (3 'restore previous' raises)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_ms = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            subs = []
            while payload[pos]:
                ln = payload[pos]
                subs.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and subs:
                gce = subs[0]
                disposal = (gce[0] >> 2) & 0x07
                delay_ms = struct.unpack_from("<H", gce, 1)[0] * 10
                transparent = gce[3] if gce[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("GIF image without any color table")
        mcs = payload[pos]
        pos += 1
        raw = bytearray()
        while payload[pos]:
            ln = payload[pos]
            raw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(bytes(raw), mcs), np.int32)
        if len(idx) < fw * fh:
            raise ValueError("truncated GIF frame")
        idx = idx[: fw * fh].reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: rows arrived pass-reordered
            deinter = np.empty_like(idx)
            deinter[_interlace_order(fh), :] = idx
            idx = deinter
        if disposal == 3:
            raise NotImplementedError("disposal 3 (restore previous)")
        region = canvas[top : top + fh, left : left + fw]
        rgb = lct[np.clip(idx, 0, len(lct) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[...] = np.where(mask, rgb, region)
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore to background (transparent black)
            canvas[top : top + fh, left : left + fw] = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return np.stack(frames), delays
