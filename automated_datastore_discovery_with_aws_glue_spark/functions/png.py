"""Minimal pure-Python PNG codec (stdlib ``zlib`` only).

Gives ``operators.multimodal.decode_images`` a REAL decode path in
environments without Pillow (this container): the full baseline-PNG
subset — 8-bit depth, color types greyscale/RGB/palette/grey+alpha/RGBA,
non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth per
the public PNG specification, ISO/IEC 15948 §9). Anything outside that
subset raises ``ValueError`` with the reason — never a wrong decode.

The encoder exists for fixtures/tests (round-trip evidence) and writes
one IHDR + one IDAT + IEND with a caller-chosen filter type per row, so
tests can force every unfilter branch.

This is an intentionally small kernel, not an imaging library: when
Pillow IS importable, ``decode_images`` prefers it (wider format
coverage); this module keeps the PNG capability unconditional.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> (channels, Pillow-compatible mode name)
_COLOR_TYPES = {0: (1, "L"), 2: (3, "RGB"), 3: (1, "P"), 4: (2, "LA"), 6: (4, "RGBA")}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode a baseline PNG. Returns ``(width, height, mode, pixels)``
    where ``pixels`` is the unfiltered raw scanline data (row-major,
    ``channels`` bytes per pixel; palette images return index bytes and
    mode 'P')."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _COLOR_TYPES:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    channels, mode = _COLOR_TYPES[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    expected = (stride + 1) * height
    if len(raw) != expected:
        raise ValueError(f"PNG data length {len(raw)} != expected {expected}")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                upleft = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, mode, bytes(out)


def _filter_line(ftype: int, line: bytes, prev: bytes, channels: int) -> bytes:
    stride = len(line)
    out = bytearray(stride)
    for i in range(stride):
        x = line[i]
        left = line[i - channels] if i >= channels else 0
        up = prev[i]
        upleft = prev[i - channels] if i >= channels else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - left) & 0xFF
        elif ftype == 2:
            out[i] = (x - up) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((left + up) >> 1)) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(left, up, upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    mode: str,
    pixels: bytes,
    *,
    filter_type: int = 0,
) -> bytes:
    """Encode raw pixels as a baseline PNG (fixture/round-trip helper).
    ``filter_type`` applies to every scanline — tests use it to force a
    specific unfilter branch in :func:`decode_png`."""
    by_mode = {m: (ct, ch) for ct, (ch, m) in _COLOR_TYPES.items()}
    if mode not in by_mode:
        raise ValueError(f"unsupported mode {mode!r}")
    color_type, channels = by_mode[mode]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"pixel length {len(pixels)} != {stride * height}")
    body = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        body.append(filter_type)
        body.extend(_filter_line(filter_type, line, prev, channels))
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body)))
        + _chunk(b"IEND", b"")
    )
