"""Minimal pure-Python JPEG codec (stdlib only).

Third vendored image kernel (after ``functions.png`` and
``functions.gif``): gives ``operators.multimodal.decode_images`` a real
JPEG decode path without Pillow. Covers the Huffman DCT subset of the
public specification (ITU-T T.81 / ISO 10918-1): 8-bit samples,
BASELINE sequential (grayscale and YCbCr, 4:4:4 / 4:2:2 / 4:2:0,
restart intervals) and — since r9 — PROGRESSIVE (SOF2: spectral
selection, successive approximation with DC/AC refinement scans, EOB
runs; Annex G). Lossless/extended/arithmetic modes raise ``ValueError``
with the reason — never a wrong decode.

The encoders exist for fixtures/tests (round-trip evidence): baseline
4:4:4 (or grayscale) with the specification's Annex K example
quantization and Huffman tables, quality-scaled per the public IJG
formula, plus a progressive encoder (``encode_jpeg_progressive``)
whose scans carry the SAME quantized coefficients — so progressive and
baseline encodes of one image must decode to IDENTICAL pixels, which is
the differential property the tests pin (no tolerance hides an EOB-run
or refinement bug). JPEG is lossy, so round-trip tests against the
ORIGINAL pixels assert dimensions exactly and pixels within a tolerance
(flat-color blocks reconstruct almost exactly; the decoder's IDCT is
the spec's separable float transform).

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
    prog: dict | None = None  # progressive coefficient store
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if prog is not None:
                return _progressive_finish(frame, prog, qtabs)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "lossless/extended/arithmetic JPEG unsupported "
                "(baseline + progressive Huffman only)"
            )
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
            if not frame.get("progressive"):
                return _decode_scan(
                    data, pos + seglen, frame, scan, qtabs, htabs, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog is None:
                prog = _prog_state(frame)
            pos = _progressive_scan(
                data, pos + seglen, frame, scan, htabs, restart_interval,
                prog, ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
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
    return _planes_to_pixels(planes, scan, w, h, hmax, vmax)


def _planes_to_pixels(planes, comps, w, h, hmax, vmax):
    """Assemble decoded component planes into the output buffer —
    shared by the baseline and progressive paths (grayscale pass-through
    or chroma upsample-by-replication + JFIF YCbCr -> RGB)."""
    if len(comps) == 1:
        plane = planes[comps[0]["id"]]
        out = bytearray()
        for y in range(h):
            out.extend(plane[y][:w])
        return w, h, "L", bytes(out)
    ids = [c["id"] for c in comps]
    sub = {c["id"]: (hmax // c["h"], vmax // c["v"]) for c in comps}
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


# -- progressive decoding (ITU T.81 Annex G, Huffman) ------------------------
#
# A progressive stream carries the SAME quantized coefficients as the
# equivalent baseline stream, split across scans by spectral band
# (Ss..Se) and bit plane (successive approximation, Ah/Al). Decoding
# accumulates coefficients per block across scans; the final dequantize
# + IDCT is shared with the baseline path. The round-trip property the
# tests pin: progressive and baseline encodes of one image decode to
# IDENTICAL pixels (identical coefficients), so any EOB-run or
# refinement bug is a hard failure, not a tolerance miss.


def _prog_state(frame) -> dict:
    """Per-component coefficient grids, sized to the interleaved MCU
    superset (covers both interleaved DC scans and per-component AC
    scans)."""
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = {}
    for c in frame["comps"]:
        coefs[c["id"]] = [
            [[0] * 64 for _ in range(mcx * c["h"])] for _ in range(mcy * c["v"])
        ]
    return {"coefs": coefs, "mcx": mcx, "mcy": mcy, "hmax": hmax, "vmax": vmax}


def _comp_block_dims(frame, c, prog) -> tuple[int, int]:
    """Non-interleaved block grid of one component: ceil over the
    component's OWN sample dimensions (T.81 A.2.2), bounded by the
    allocated MCU superset."""
    hmax, vmax = prog["hmax"], prog["vmax"]
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next non-stuffed, non-restart marker at/after
    ``pos`` (end of a progressive scan's entropy segment)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("truncated JPEG (no trailing marker)")


def _progressive_scan(
    data, pos, frame, scan, htabs, restart_interval, prog, ss, se, ah, al
):
    br = _BitReader(data, pos)
    coefs = prog["coefs"]

    def restart(state_reset):
        m = br.align_to_marker()
        if not (0xD0 <= m <= 0xD7):
            raise ValueError("expected restart marker")
        state_reset()

    if ss == 0:  # DC scan (interleaved or single-component)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        preds = {c["id"]: 0 for c in scan}

        def blocks():
            if len(scan) > 1:
                for my in range(prog["mcy"]):
                    for mx in range(prog["mcx"]):
                        for c in scan:
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    yield c, coefs[c["id"]][my * c["v"] + by][mx * c["h"] + bx]
            else:
                c = scan[0]
                bw_, bh_ = _comp_block_dims(frame, c, prog)
                for y in range(bh_):
                    for x in range(bw_):
                        yield c, coefs[c["id"]][y][x]

        unit = 0
        per_unit = (
            sum(c["h"] * c["v"] for c in scan) if len(scan) > 1 else 1
        )
        n_in_unit = 0
        for c, blk in blocks():
            if (
                restart_interval
                and n_in_unit == 0
                and unit
                and unit % restart_interval == 0
            ):
                restart(lambda: preds.update({k: 0 for k in preds}))
            if ah == 0:
                t = br.decode_huff(htabs[(0, c["dc"])])
                diff = _extend(br.read_bits(t), t) if t else 0
                preds[c["id"]] += diff
                blk[0] = preds[c["id"]] << al
            else:
                if br.read_bit():
                    blk[0] |= 1 << al
            n_in_unit += 1
            if n_in_unit == per_unit:
                n_in_unit = 0
                unit += 1
        return _next_marker(data, br.pos)

    # AC scan: exactly one component (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan[0]
    act = htabs[(1, c["ac"])]
    bw_, bh_ = _comp_block_dims(frame, c, prog)
    grid = coefs[c["id"]]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    unit = 0
    for y in range(bh_):
        for x in range(bw_):
            if restart_interval and unit and unit % restart_interval == 0:
                def _reset():
                    nonlocal eobrun
                    eobrun = 0

                restart(_reset)
            unit += 1
            blk = grid[y][x]
            if ah == 0:  # first pass for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.decode_huff(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC coefficient overflow (progressive)")
                    blk[k] = _extend(br.read_bits(s), s) * (1 << al)
                    k += 1
            else:  # refinement pass (T.81 G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.decode_huff(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            val = 0  # ZRL: skip 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "invalid magnitude in AC refinement scan"
                                )
                            val = p1 if br.read_bit() else m1
                        while k <= se:
                            if blk[k] != 0:
                                if br.read_bit() and (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if r == 0:
                                    if val:
                                        blk[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            if br.read_bit() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return _next_marker(data, br.pos)


def _progressive_finish(frame, prog, qtabs):
    """Dequantize + IDCT every accumulated block; assemble via the
    shared baseline tail."""
    coefs = prog["coefs"]
    planes = {}
    for c in frame["comps"]:
        q = qtabs[c["tq"]]
        grid = coefs[c["id"]]
        plane = [
            [0] * (len(grid[0]) * 8) for _ in range(len(grid) * 8)
        ]
        for by, row in enumerate(grid):
            for bx, zz in enumerate(row):
                blk = [0.0] * 64
                for i in range(64):
                    blk[_ZIGZAG[i]] = float(zz[i] * q[i])
                pix = _idct_2d(blk)
                oy, ox = by * 8, bx * 8
                for yy in range(8):
                    prow = plane[oy + yy]
                    for xx in range(8):
                        v = int(round(pix[yy * 8 + xx] + 128))
                        prow[ox + xx] = 0 if v < 0 else (255 if v > 255 else v)
        planes[c["id"]] = plane
    return _planes_to_pixels(
        planes, frame["comps"], frame["w"], frame["h"], prog["hmax"], prog["vmax"]
    )


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


def _coef_grids(width, height, mode, pixels, quality):
    """Quantized zigzag coefficient grids per component (4:4:4 or
    grayscale) — the shared front half of both encoders. Returns
    ``(grids, ql_z, qc_z, nch)`` with ``grids[ci][by][bx]`` a 64-int
    zigzag block."""
    nch = 1 if mode == "L" else 3
    if len(pixels) != width * height * nch:
        raise ValueError("pixel buffer size mismatch")
    ql = _scale_q(_STD_LUMA_Q, quality)
    qc = _scale_q(_STD_CHROMA_Q, quality)
    ql_z = [ql[_ZIGZAG[i]] for i in range(64)]
    qc_z = [qc[_ZIGZAG[i]] for i in range(64)]
    pw = (width + 7) // 8 * 8
    ph = (height + 7) // 8 * 8

    def pad(plane):
        for row in plane:
            row.extend([row[-1]] * (pw - len(row)))
        plane.extend([list(plane[-1]) for _ in range(ph - len(plane))])
        return plane

    if mode == "L":
        planes = [pad([[pixels[y * width + x] for x in range(width)] for y in range(height)])]
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

    grids = []
    for ci in range(nch):
        q = ql_z if ci == 0 else qc_z
        plane = planes[ci]
        grid = []
        for by in range(ph // 8):
            row = []
            for bx in range(pw // 8):
                samples = [
                    plane[by * 8 + yy][bx * 8 + xx] for yy in range(8) for xx in range(8)
                ]
                coef = _fdct_2d([float(s) - 128.0 for s in samples])
                row.append([int(round(coef[_ZIGZAG[i]] / q[i])) for i in range(64)])
            grid.append(row)
        grids.append(grid)
    return grids, ql_z, qc_z, nch


# a single flat canonical AC table valid for EVERY progressive AC
# symbol (EOBn 0x00..0xE0, ZRL 0xF0, (r<<4)|s for s 1..10): all 176
# symbols at code length 8, the all-ones code unused as required
_PROG_AC_SYMS = sorted(
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC = ([0] * 7 + [len(_PROG_AC_SYMS)] + [0] * 8, _PROG_AC_SYMS)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: divide by 2^al rounding toward zero
    (T.81 G.1.2.2 — DC uses the arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


class _AcFirstWriter:
    """AC first-pass scan encoder with deferred EOB runs."""

    def __init__(self, bw: _BitWriter, act: _Huff):
        self.bw, self.act = bw, act
        self.eobrun = 0

    def flush(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.act.codes[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0

    def block(self, band: list[int]) -> None:
        last = -1
        for i, v in enumerate(band):
            if v:
                last = i
        if last < 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()
            return
        self.flush()
        r = 0
        for i in range(last + 1):
            v = band[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, ln = self.act.codes[0xF0]
                self.bw.write(code, ln)
                r -= 16
            s = _category(v)
            code, ln = self.act.codes[(r << 4) | s]
            self.bw.write(code, ln)
            self.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last < len(band) - 1:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()


class _AcRefineWriter:
    """AC refinement scan encoder (T.81 G.1.2.3 shape: newly-nonzero
    coefficients as run/1 + sign, correction bits buffered and emitted
    after the next symbol or EOB run)."""

    def __init__(self, bw: _BitWriter, act: _Huff, al: int):
        self.bw, self.act, self.al = bw, act, al
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.act.codes[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def block(self, coefs: list[int]) -> None:
        al = self.al
        absv = [abs(v) >> al for v in coefs]
        eob = -1
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        r = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self.flush()
                code, ln = self.act.codes[0xF0]
                self.bw.write(code, ln)
                r -= 16
                for b in br:
                    self.bw.write(b, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            self.flush()
            code, ln = self.act.codes[(r << 4) | 1]
            self.bw.write(code, ln)
            self.bw.write(1 if coefs[i] >= 0 else 0, 1)
            for b in br:
                self.bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF or len(self.pending) > 900:
                self.flush()


def encode_jpeg_progressive(
    width: int,
    height: int,
    mode: str,
    pixels: bytes,
    *,
    quality: int = 90,
    al_dc: int = 1,
    al_ac: int = 1,
    split_at: int = 6,
) -> bytes:
    """Encode progressive JFIF (SOF2, Huffman): spectral selection
    (DC scan, then per-component AC bands split at ``split_at``) AND
    successive approximation (``al_dc``/``al_ac`` bit-plane splits with
    refinement scans). 4:4:4 / grayscale. Carries the SAME quantized
    coefficients as :func:`encode_jpeg` at equal quality, so decoding
    both must produce IDENTICAL pixels — the differential round-trip
    the tests pin."""
    if mode not in ("L", "RGB"):
        raise ValueError("encode_jpeg_progressive supports modes L and RGB")
    grids, ql_z, qc_z, nch = _coef_grids(width, height, mode, pixels, quality)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tab in ([(0, ql_z)] + ([(1, qc_z)] if nch == 3 else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(tab)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nch, 1, 0x11, 0])
    if nch == 3:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0, 0, _STD_DC_LUMA), (1, 0, _PROG_AC)]
    if nch == 3:
        tables.append((0, 1, _STD_DC_CHROMA))
    for tc, th, (counts, syms) in tables:
        seg = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    dct = {0: _Huff(*_STD_DC_LUMA), 1: _Huff(*_STD_DC_CHROMA)}
    act = _Huff(*_PROG_AC)

    def sos(comps: list[tuple[int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for cid, tdta in comps:
            body += bytes([cid, tdta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def blocks(ci):
        for row in grids[ci]:
            yield from row

    # scan 1: DC of all components, interleaved, top bits
    out += sos([(ci + 1, (0 if ci == 0 else 1) << 4) for ci in range(nch)], 0, 0, 0, al_dc)
    bw = _BitWriter()
    preds = [0] * nch
    for by in range(len(grids[0])):
        for bx in range(len(grids[0][0])):
            for ci in range(nch):
                v = grids[ci][by][bx][0] >> al_dc  # DC: arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                t = _category(diff)
                dc_t = dct[0 if ci == 0 else 1]
                code, ln = dc_t.codes[t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    out += bw.out

    # per component: AC first passes (two spectral bands), top bits
    for ci in range(nch):
        for ss, se in ((1, split_at - 1), (split_at, 63)):
            out += sos([(ci + 1, 0x00)], ss, se, 0, al_ac)
            bw = _BitWriter()
            wr = _AcFirstWriter(bw, act)
            for zz in blocks(ci):
                wr.block([_trunc_shift(zz[k], al_ac) for k in range(ss, se + 1)])
            wr.flush()
            bw.flush()
            out += bw.out

    # per component: AC refinement passes down to bit 0
    for al in range(al_ac - 1, -1, -1):
        for ci in range(nch):
            out += sos([(ci + 1, 0x00)], 1, 63, al + 1, al)
            bw = _BitWriter()
            wr = _AcRefineWriter(bw, act, al)
            for zz in blocks(ci):
                wr.block(zz[1:64])
            wr.flush()
            bw.flush()
            out += bw.out

    # DC refinement passes (no Huffman, one raw bit per block)
    for al in range(al_dc - 1, -1, -1):
        out += sos([(ci + 1, 0x00) for ci in range(nch)], 0, 0, al + 1, al)
        bw = _BitWriter()
        for by in range(len(grids[0])):
            for bx in range(len(grids[0][0])):
                for ci in range(nch):
                    bw.write((grids[ci][by][bx][0] >> al) & 1, 1)
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


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
