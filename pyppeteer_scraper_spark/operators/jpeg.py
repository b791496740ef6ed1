"""Baseline JPEG codec — pure numpy + stdlib, from scratch.

Closes the last reachable compressed-image seam in
operators/multimodal.py: baseline sequential DCT JPEG (SOF0) decode —
the overwhelming majority of web images — needs only Huffman coding,
8x8 DCT and YCbCr math, all expressible in numpy.  Progressive (SOF2),
arithmetic coding and hierarchical modes remain NotImplementedError;
they are rare on the web and a real deployment swaps in libjpeg-turbo
at this seam.

Decoder (``decode_jpeg``): full marker parse (APPn/COM skipped, DQT
8/16-bit, DHT canonical code construction, SOF0/SOF1, DRI + RSTn
restart handling, byte unstuffing), arbitrary sampling factors (4:4:4,
4:2:2, 4:2:0 and anything else SOF declares), dequantize → inverse
zigzag → IDCT, nearest-neighbor chroma upsample, JFIF YCbCr→RGB.
Validated against real-world files from real encoders (CPython's test
JPEGs — see tests/test_jpeg_codec.py), not just this module's own
encoder.

Encoder (``encode_jpeg``): grayscale / 4:4:4 / 4:2:0, Annex-K quant
tables scaled by libjpeg's quality curve, simple-but-valid canonical
Huffman tables declared via DHT (fixed widths; a production encoder
ships Annex K or optimized tables — the DECODER reads whatever DHT
declares, so table choice affects size only).  The DCT uses the
orthonormal basis matrix, which equals the JPEG FDCT scaling exactly.

The zigzag order is DERIVED (diagonal walk), not transcribed, so a
transcription typo cannot silently corrupt both codec directions.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_order() -> np.ndarray:
    """Scan-position → row-major block index, derived from the walk:
    even diagonals run bottom-left→top-right, odd ones the reverse."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()  # start at (s, 0): up-right
        order.extend(i * 8 + j for i, j in ij)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto web
# standard bases that quality scaling multiplies).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→scale curve (jcparam.c semantics)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# Orthonormal 8-point DCT-II basis — equals the JPEG FDCT/IDCT scaling.
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C)


def _idct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, blocks, _C)


# --- Huffman -----------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: bytes) -> dict:
    return {
        sym: (length, code)
        for (length, code), sym in _build_decode_table(bits, vals).items()
    }


# Simple-but-valid tables for the ENCODER: 12 DC categories at 4 bits,
# all 162 AC symbols at 8 bits (canonical, all-ones code unused per the
# spec's BITS construction).  Poor compression, exact correctness.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = [0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriter, coefs: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict
) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    length, code = dc_tab[s]
    w.write(code, length)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0]
    run = 0
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for pos in range(1, last_nz + 1):
        v = int(zz[pos])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tab[0xF0]
            w.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_tab[(run << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_tab[0x00]  # EOB
        w.write(code, length)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane → (n, 8, 8) blocks, row-major MCU-less."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_to(img: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = img.shape
    ph, pw = (-h) % mult_y, (-w) % mult_x
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray, quality: int = 75, subsample: str = "4:2:0"
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes."""
    assert img.dtype == np.uint8
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    if gray:
        comps = [(1, 1, 1, 0, img.astype(np.float64))]  # id, hs, vs, tq
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "4:2:0":
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            comps = [(1, 2, 2, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
        elif subsample == "4:4:4":
            comps = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
        else:
            raise ValueError(f"subsample {subsample!r}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # quantized blocks per component, padded so every component spans
    # the same MCU grid (edge-replicated — the spec-recommended fill)
    dc_tab = _build_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _build_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)
    quant = {0: qy, 1: qc}
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, tq, plane in comps:
        need_h, need_w = mcuy * 8 * vs, mcux * 8 * hs
        p = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        qb = np.round(
            _fdct(_plane_blocks(p - 128.0)) / quant[tq]
        ).astype(np.int64)
        planes[cid] = (hs, vs, qb.reshape(need_h // 8, need_w // 8, 8, 8))

    wtr = _BitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hs, vs, tq, _p in comps:
                _hs, _vs, grid = planes[cid]
                for by in range(vs):
                    for bx in range(hs):
                        blk = grid[my * vs + by, mx * hs + bx]
                        preds[cid] = _encode_block(
                            wtr, blk, preds[cid], dc_tab, ac_tab
                        )
    wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, qy), (1, qc)) if not gray else ((0, qy),):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(q.reshape(64)[ZIGZAG].astype(np.uint8))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, hs, vs, tq, _p in comps:
        out += struct.pack("BBB", cid, (hs << 4) | vs, tq)
    for cls, tid, bits, vals in (
        (0, 0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, 0, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(vals), (cls << 4) | tid
        ) + bytes(bits) + vals
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, *_ in comps:
        out += struct.pack("BB", cid, 0x00)  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss, Se, AhAl
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


class _BitReader:
    """Entropy-segment reader: unstuffs FF00, stops at markers, and
    byte-aligns across RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        while self.nbits < 25:
            if self.pos >= len(d):
                return False
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    self.marker = nxt
                    return self.nbits > 0
                else:
                    self.marker = nxt
                    return self.nbits > 0
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise ValueError("truncated JPEG entropy data")
            if self.nbits < n and self.marker is not None:
                # pad with zero bits at segment end (spec-allowed)
                self.acc <<= 8
                self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip to marker (we may have buffered up to it already)
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise ValueError("missing restart marker")

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) RGB uint8, or (h, w) for grayscale.
    SOF0/SOF1 only; SOF2 (progressive) raises NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    t = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    t = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                qtables[tq] = t[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = seg[i + 17 : i + 17 + n]
                htables[(cls, tid)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (fh, fw, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            return _decode_scan(
                payload, pos + seglen, sof, scan, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(
    payload, datapos, sof, scan, qtables, htables, restart_interval
):
    fh, fw, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    planes = {
        cid: np.zeros((mcuy * 8 * vs, mcux * 8 * hs))
        for cid, hs, vs, tq in comps
    }
    rdr = _BitReader(payload, datapos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                rdr.restart()
                preds = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for cs, dct, act in scan:
                hs, vs, tq = byid[cs]
                dc_tab = htables[(0, dct)]
                ac_tab = htables[(1, act)]
                q = qtables[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, np.int64)
                        s = rdr.decode_huff(dc_tab)
                        diff = _extend(rdr.read(s), s) if s else 0
                        preds[cs] += diff
                        zz[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = rdr.decode_huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(rdr.read(s), s)
                            k += 1
                        blk = (zz * q.reshape(64)[ZIGZAG])[UNZIGZAG].reshape(
                            8, 8
                        )
                        px = _idct(blk[None].astype(np.float64))[0] + 128.0
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = px
    # upsample to full frame grid and crop
    full = {}
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, 0), hmax // hs, 1)
        full[cid] = p[:fh, :fw]
    if len(comps) == 1:
        return np.clip(np.round(full[comps[0][0]]), 0, 255).astype(np.uint8)
    y, cb, cr = (full[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )
