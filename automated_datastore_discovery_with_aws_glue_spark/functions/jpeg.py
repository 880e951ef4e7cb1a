"""Minimal pure-Python baseline JPEG codec (stdlib only).

Third vendored image kernel (after ``functions.png`` and
``functions.gif``): gives ``operators.multimodal.decode_images`` a real
JPEG decode path without Pillow. Covers the baseline sequential DCT
subset of the public specification (ITU-T T.81 / ISO 10918-1): 8-bit
samples, Huffman entropy coding, grayscale and YCbCr with 4:4:4 /
4:2:2 / 4:2:0 sampling, restart intervals. Progressive and arithmetic
modes raise ``ValueError`` with the reason — never a wrong decode.

The encoder exists for fixtures/tests (round-trip evidence): baseline
4:4:4 (or grayscale) with the specification's Annex K example
quantization and Huffman tables, quality-scaled per the public IJG
formula. JPEG is lossy, so round-trip tests assert dimensions exactly
and pixels within a tolerance (flat-color blocks reconstruct almost
exactly; the decoder's IDCT is the spec's separable float transform).

This is a correctness kernel for modest fixtures and capability
parity, not a fast imaging library — Pillow, where importable, is
preferred by the caller.
"""

from __future__ import annotations

import math
import struct

# -- Annex K example tables (public specification) --------------------------

_STD_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_STD_CHROMA_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
# (counts[1..16], symbols) per Annex K
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct_2d(block: list[float]) -> list[float]:
    tmp = [0.0] * 64
    # rows (u over columns)
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * block[y * 8 + u] * _COS[x][u]
            tmp[y * 8 + x] = s / 2
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[y][v]
            out[y * 8 + x] = s / 2
    return out


def _fdct_2d(block: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += block[y * 8 + x] * _COS[x][u]
            tmp[y * 8 + u] = s * _C[u] / 2
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[y][v]
            out[v * 8 + u] = s * _C[v] / 2
    return out


class _Huff:
    """Canonical Huffman table: (counts per length 1..16, symbols)."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        self.codes: dict[int, tuple[int, int]] = {}  # symbol -> (code, length)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                self.lookup[(length, code)] = sym
                self.codes[sym] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt  # hit a marker: feed zero bits hereafter
                b = 0
                self.pos -= 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def align_to_marker(self) -> int:
        """Consume the pending RSTn marker (after byte-aligning)."""
        self.bits = 0
        self.nbits = 0
        # self.pos points at the 0xFF of the marker
        while self.pos < len(self.data) and self.data[self.pos] == 0xFF:
            self.pos += 1
        m = self.data[self.pos]
        self.pos += 1
        self.marker = None
        return m


def _extend(v: int, n: int) -> int:
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode a baseline JPEG. Returns ``(width, height, mode,
    pixels)`` — mode 'L' (1 byte/px) or 'RGB' (3 bytes/px)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad signature)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], _Huff] = {}
    restart_interval = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG contains no scan data")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qtabs[tq] = list(body[p : p + 64])
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                n = sum(counts)
                syms = list(body[p + 17 : p + 17 + n])
                htabs[(tc, th)] = _Huff(counts, syms)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("progressive/extended JPEG unsupported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0x0F})
            return _decode_scan(
                data, pos + seglen, frame, scan, qtabs, htabs, restart_interval
            )
        # all other markers (APPn, COM): skip
        pos += seglen
    raise ValueError("JPEG contains no scan data")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in scan:
        planes[c["id"]] = [
            [0] * (mcx * c["h"] * 8) for _ in range(mcy * c["v"] * 8)
        ]
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected restart marker")
                preds = {c["id"]: 0 for c in scan}
            for c in scan:
                q = qtabs[c["tq"]]
                dct_t = htabs[(0, c["dc"])]
                act_t = htabs[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = [0] * 64
                        t = br.decode_huff(dct_t)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]] * q[0]
                        kk = 1
                        while kk < 64:
                            rs = br.decode_huff(act_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("AC coefficient overflow")
                            zz[kk] = _extend(br.read_bits(s), s) * q[kk]
                            kk += 1
                        blk = [0.0] * 64
                        for i in range(64):
                            blk[_ZIGZAG[i]] = float(zz[i])
                        pix = _idct_2d(blk)
                        plane = planes[c["id"]]
                        oy = (my * c["v"] + by) * 8
                        ox = (mx * c["h"] + bx) * 8
                        for yy in range(8):
                            row = plane[oy + yy]
                            for xx in range(8):
                                v = int(round(pix[yy * 8 + xx] + 128))
                                row[ox + xx] = 0 if v < 0 else (255 if v > 255 else v)
            mcu_count += 1
    if len(scan) == 1:
        plane = planes[scan[0]["id"]]
        out = bytearray()
        for y in range(h):
            out.extend(plane[y][:w])
        return w, h, "L", bytes(out)
    # color: upsample chroma by replication, JFIF YCbCr -> RGB
    ids = [c["id"] for c in scan]
    sub = {c["id"]: (hmax // c["h"], vmax // c["v"]) for c in scan}
    yp, cbp, crp = planes[ids[0]], planes[ids[1]], planes[ids[2]]
    sb, sr = sub[ids[1]], sub[ids[2]]
    out = bytearray()
    for y in range(h):
        for x in range(w):
            Y = yp[y][x]
            cb = cbp[y // sb[1]][x // sb[0]] - 128
            cr = crp[y // sr[1]][x // sr[0]] - 128
            r = int(round(Y + 1.402 * cr))
            g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
            b = int(round(Y + 1.772 * cb))
            out.append(0 if r < 0 else (255 if r > 255 else r))
            out.append(0 if g < 0 else (255 if g > 255 else g))
            out.append(0 if b < 0 else (255 if b > 255 else b))
    return w, h, "RGB", bytes(out)


# -- encoder (fixtures) -----------------------------------------------------


def _scale_q(table: list[int], quality: int) -> list[int]:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return [max(1, min(255, (t * scale + 50) // 100)) for t in table]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    a = abs(v)
    n = 0
    while a:
        a >>= 1
        n += 1
    return n


def _encode_block(bw, samples, q, dc_t, ac_t, pred):
    blk = [float(s) - 128.0 for s in samples]
    coef = _fdct_2d(blk)
    zz = [int(round(coef[_ZIGZAG[i]] / q[i])) for i in range(64)]
    diff = zz[0] - pred
    t = _category(diff)
    code, ln = dc_t.codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t.codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_t.codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_t.codes[0x00]
        bw.write(code, ln)
    return zz[0]


def encode_jpeg(
    width: int,
    height: int,
    mode: str,
    pixels: bytes,
    *,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode baseline JFIF (fixtures/round-trip tests): mode 'L'
    (1 byte/px) or 'RGB' (3 bytes/px), 4:4:4 or 4:2:0 sampling,
    optional restart intervals, Annex K tables quality-scaled by the
    public IJG formula."""
    if mode not in ("L", "RGB"):
        raise ValueError("encode_jpeg supports modes L and RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("encode_jpeg supports 444 and 420 subsampling")
    nch = 1 if mode == "L" else 3
    sub420 = nch == 3 and subsampling == "420"
    if len(pixels) != width * height * nch:
        raise ValueError("pixel buffer size mismatch")
    ql = _scale_q(_STD_LUMA_Q, quality)
    qc = _scale_q(_STD_CHROMA_Q, quality)
    # the DQT segment stores tables in ZIGZAG order (spec B.2.4.1);
    # _encode_block and the decoder both index their table by zigzag
    # position, so convert the natural-order Annex K tables once here
    ql_z = [ql[_ZIGZAG[i]] for i in range(64)]
    qc_z = [qc[_ZIGZAG[i]] for i in range(64)]

    # plane extraction (RGB -> YCbCr JFIF)
    planes: list[list[list[int]]] = []
    mcu = 16 if sub420 else 8
    pw = (width + mcu - 1) // mcu * mcu
    ph = (height + mcu - 1) // mcu * mcu

    def pad(plane):
        for row in plane:
            row.extend([row[-1]] * (pw - len(row)))
        plane.extend([list(plane[-1]) for _ in range(ph - len(plane))])
        return plane

    if mode == "L":
        planes.append(pad([[pixels[y * width + x] for x in range(width)] for y in range(height)]))
    else:
        yp, cbp, crp = [], [], []
        for y in range(height):
            ry, rcb, rcr = [], [], []
            for x in range(width):
                r, g, b = pixels[(y * width + x) * 3 : (y * width + x) * 3 + 3]
                Y = 0.299 * r + 0.587 * g + 0.114 * b
                cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
                cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
                ry.append(max(0, min(255, int(round(Y)))))
                rcb.append(max(0, min(255, int(round(cb)))))
                rcr.append(max(0, min(255, int(round(cr)))))
            yp.append(ry), cbp.append(rcb), crp.append(rcr)
        planes = [pad(yp), pad(cbp), pad(crp)]

    if sub420:
        # 2x2 box average; pw/ph are multiples of 16, so the chroma
        # planes are multiples of 8
        def down(plane):
            return [
                [
                    (plane[2 * y][2 * x] + plane[2 * y][2 * x + 1]
                     + plane[2 * y + 1][2 * x] + plane[2 * y + 1][2 * x + 1] + 2) // 4
                    for x in range(pw // 2)
                ]
                for y in range(ph // 2)
            ]

        planes = [planes[0], down(planes[1]), down(planes[2])]

    dcl, acl = _Huff(*_STD_DC_LUMA), _Huff(*_STD_AC_LUMA)
    dcc, acc = _Huff(*_STD_DC_CHROMA), _Huff(*_STD_AC_CHROMA)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tab in ([(0, ql_z)] + ([(1, qc_z)] if nch == 3 else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(tab)
    y_hv = 0x22 if sub420 else 0x11
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nch])
    sof += bytes([1, y_hv, 0])
    if nch == 3:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (counts, syms) in (
        [(0, 0, _STD_DC_LUMA), (1, 0, _STD_AC_LUMA)]
        + ([(0, 1, _STD_DC_CHROMA), (1, 1, _STD_AC_CHROMA)] if nch == 3 else [])
    ):
        seg = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nch, 1, 0x00]) + (bytes([2, 0x11, 3, 0x11]) if nch == 3 else b"") + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * nch
    mcu_count = 0
    rst = 0

    def blocks_for(ci: int, my: int, mx: int):
        """Yield the 8x8 sample blocks of component ci in MCU (my, mx),
        interleave order per the spec (row-major within the MCU)."""
        hv = (2, 2) if (sub420 and ci == 0) else (1, 1)
        plane = planes[ci]
        for by in range(hv[1]):
            for bx in range(hv[0]):
                oy = (my * hv[1] + by) * 8
                ox = (mx * hv[0] + bx) * 8
                yield [plane[oy + yy][ox + xx] for yy in range(8) for xx in range(8)]

    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * nch
            for ci in range(nch):
                q = ql_z if ci == 0 else qc_z
                dc_t, ac_t = (dcl, acl) if ci == 0 else (dcc, acc)
                for samples in blocks_for(ci, my, mx):
                    preds[ci] = _encode_block(bw, samples, q, dc_t, ac_t, preds[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
