"""Minimal pure-Python GIF codec (stdlib only).

Companion to ``functions.png``: gives ``operators.multimodal.
decode_images`` a second UNCONDITIONAL real decode path in environments
without Pillow. Covers the public GIF87a/GIF89a specification subset a
data pipeline actually meets: global/local color tables, LZW image
data (variable code width, 12-bit max, per the public spec's
Appendix F algorithm), interlaced and non-interlaced frames, frames
smaller than the logical screen (pasted onto a background-filled
canvas). Decodes the FIRST frame of an animation; anything outside the
subset raises ``ValueError`` with the reason — never a wrong decode.

The encoder exists for fixtures/tests (round-trip evidence). It writes
literal codes only, re-emitting CLEAR whenever the decoder's table
would outgrow the current code width — the classic "uncompressed GIF"
technique — so the decoder exercises its table-growth and clear-reset
paths on every fixture.
"""

from __future__ import annotations

import struct

_CLEAR_GUARD = 4093  # re-emit CLEAR before next_code hits 2^12


def _color_table(data: bytes, pos: int, packed: int) -> tuple[list[bytes], int]:
    n = 2 << (packed & 0x07)
    if pos + 3 * n > len(data):
        raise ValueError("truncated GIF color table")
    table = [data[pos + 3 * i : pos + 3 * i + 3] for i in range(n)]
    return table, pos + 3 * n


def _deinterlace_rows(height: int) -> list[int]:
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []
    code_size = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        prev = None

    reset()
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out.extend(entry)
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= expected:
                return out
    return out


def decode_gif(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode the first frame of a GIF. Returns ``(width, height,
    "RGB", pixels)`` — logical-screen dimensions, pixels mapped through
    the active color table (row-major, 3 bytes per pixel); a frame
    smaller than the screen is pasted onto a background-color canvas.
    Truncated or out-of-subset inputs raise ``ValueError`` — never a
    wrong decode."""
    try:
        return _decode_gif(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated GIF: {exc}") from exc


def _decode_gif(data: bytes) -> tuple[int, int, str, bytes]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, bg_index, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: list[bytes] | None = None
    if packed & 0x80:
        gct, pos = _color_table(data, pos, packed)
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        lct: list[bytes] | None = None
        if fpacked & 0x80:
            lct, pos = _color_table(data, pos, fpacked)
        palette = lct or gct
        if palette is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            n = data[pos]
            lzw.extend(data[pos + 1 : pos + 1 + n])
            pos += 1 + n
        indices = _lzw_decode(min_code_size, bytes(lzw), fw * fh)
        if len(indices) != fw * fh:
            # short = truncated stream; long = a final LZW entry crossed
            # the frame boundary (corrupt) — either way, raise rather
            # than return a wrong-shaped buffer
            raise ValueError(
                f"corrupt GIF frame: {len(indices)} pixels decoded, {fw * fh} expected"
            )
        if fpacked & 0x40:  # interlaced: rows arrive in 4-pass order
            rows = [indices[r * fw : (r + 1) * fw] for r in range(fh)]
            ordered: list[bytes | bytearray] = [b""] * fh
            for src_row, dst_row in enumerate(_deinterlace_rows(fh)):
                ordered[dst_row] = rows[src_row]
            indices = bytearray(b"".join(bytes(r) for r in ordered))
        if (left, top, fw, fh) == (0, 0, sw, sh):
            canvas = indices
        else:
            if left + fw > sw or top + fh > sh:
                raise ValueError("GIF frame rect exceeds logical screen")
            canvas = bytearray([bg_index]) * (sw * sh)
            for r in range(fh):
                dst = (top + r) * sw + left
                canvas[dst : dst + fw] = indices[r * fw : (r + 1) * fw]
        nc = len(palette)
        pixels = b"".join(
            palette[i] if i < nc else b"\x00\x00\x00" for i in canvas
        )
        return sw, sh, "RGB", pixels
    raise ValueError("GIF contains no image data")


def _lzw_encode_literals(min_code_size: int, indices: bytes) -> bytes:
    """Literal-only LZW stream (the public 'uncompressed GIF' trick):
    every pixel is a root code, with CLEAR re-emitted before the
    decoder's table would exceed 12 bits. The decoder still grows its
    table/ code width exactly as for a compressing encoder."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    next_code = end + 1
    emit(clear, code_size)
    first = True
    for idx in indices:
        emit(idx, code_size)
        if first:
            first = False
            continue
        next_code += 1
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= _CLEAR_GUARD:
            emit(clear, code_size)
            code_size = min_code_size + 1
            next_code = end + 1
            first = True
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: bytes,
    *,
    interlace: bool = False,
    frame: tuple[int, int, int, int] | None = None,
    bg_index: int = 0,
) -> bytes:
    """Encode one frame as GIF89a (fixtures/round-trip tests).
    ``frame=(left, top, w, h)`` writes a sub-rectangle frame (indices
    are then the frame's own pixels); default is a full-screen frame."""
    left, top, fw, fh = frame or (0, 0, width, height)
    if len(indices) != fw * fh:
        raise ValueError("indices length must equal frame w*h")
    gct_bits = 1
    while (2 << gct_bits) < len(palette) + 1 and gct_bits < 7:
        gct_bits += 1
    n_entries = 2 << gct_bits
    if len(palette) > n_entries:
        raise ValueError("palette too large for GIF (max 256)")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | gct_bits, bg_index, 0)
    for i in range(n_entries):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    if interlace:
        rows = [indices[r * fw : (r + 1) * fw] for r in range(fh)]
        indices = b"".join(rows[r] for r in _deinterlace_rows(fh))
    out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0x40 if interlace else 0)
    min_code_size = max(2, gct_bits + 1)
    out.append(min_code_size)
    stream = _lzw_encode_literals(min_code_size, indices)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
