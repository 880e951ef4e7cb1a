"""Minimal pure-Python GIF codec (stdlib only).

Companion to ``functions.png``: gives ``operators.multimodal.
decode_images`` a second UNCONDITIONAL real decode path in environments
without Pillow. Covers the public GIF87a/GIF89a specification subset a
data pipeline actually meets: global/local color tables, LZW image
data (variable code width, 12-bit max, per the public spec's
Appendix F algorithm), interlaced and non-interlaced frames, frames
smaller than the logical screen (pasted onto a background-filled
canvas), and multi-frame animations (``decode_gif_frames``: running-
canvas compositing with GCE delay/transparency and disposal methods
keep/restore-background; ``decode_gif`` returns the first frame).
Anything outside the subset raises ``ValueError`` with the reason —
never a wrong decode.

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
    for sw, sh, mode, pixels, _delay in iter_gif_frames(data):
        return sw, sh, mode, pixels
    raise ValueError("GIF contains no image data")


def decode_gif_frames(data: bytes) -> list[tuple[int, int, str, bytes, int]]:
    """Decode EVERY frame of a (possibly animated) GIF. Returns
    ``[(width, height, "RGB", pixels, delay_cs), ...]`` in presentation
    order: each frame is the full composited logical screen after that
    frame renders (sub-rectangle frames paste onto the running canvas),
    with its Graphic Control delay in centiseconds (0 when absent).
    Disposal methods none/keep(1) and restore-background(2) and
    transparency are honored; restore-previous(3) raises honestly."""
    return list(iter_gif_frames(data))


def iter_gif_frames(data: bytes):
    try:
        yield from _iter_gif_frames(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated GIF: {exc}") from exc


def _iter_gif_frames(data: bytes):
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, bg_index, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: list[bytes] | None = None
    if packed & 0x80:
        gct, pos = _color_table(data, pos, packed)
    canvas: bytearray | None = None  # composited RGB, lazily allocated
    bg_rgb: bytes | None = None
    delay_cs = 0
    disposal = 0
    transparent: int | None = None
    yielded = False
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension for NEXT image
                n = data[pos]
                if n >= 4:
                    gpacked = data[pos + 1]
                    delay_cs = struct.unpack("<H", data[pos + 2 : pos + 4])[0]
                    disposal = (gpacked >> 2) & 0x7
                    transparent = data[pos + 4] if gpacked & 0x1 else None
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
        pos += 1  # the sub-block terminator
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
        if left + fw > sw or top + fh > sh:
            raise ValueError("GIF frame rect exceeds logical screen")
        if disposal == 3:
            raise ValueError(
                "GIF disposal method 3 (restore previous) is outside the "
                "supported subset"
            )
        # The canvas stores composited RGB, not indices: each frame's
        # pixels map through ITS OWN active palette at paint time, so a
        # later frame's local color table can never recolor pixels an
        # earlier frame painted (index-canvas formulations have exactly
        # that silent-wrong-decode bug with per-frame LCTs). Background
        # is the GLOBAL table's bg_index per the spec (black without a
        # GCT); out-of-palette indices paint black as in single-frame.
        nc = len(palette)
        rgb_row_cache: dict[bytes, bytes] = {}

        def _rgb(row: bytes) -> bytes:
            got = rgb_row_cache.get(row)
            if got is None:
                got = b"".join(
                    palette[i] if i < nc else b"\x00\x00\x00" for i in row
                )
                rgb_row_cache[row] = got
            return got

        if bg_rgb is None:
            bg_rgb = (
                bytes(gct[bg_index])
                if gct is not None and bg_index < len(gct)
                else b"\x00\x00\x00"
            )
        if canvas is None:
            canvas = bytearray(bg_rgb * (sw * sh))
        if transparent is None and (left, top, fw, fh) == (0, 0, sw, sh):
            canvas = bytearray(_rgb(bytes(indices)))
        else:
            for r in range(fh):
                dst = 3 * ((top + r) * sw + left)
                row = bytes(indices[r * fw : (r + 1) * fw])
                if transparent is None:
                    canvas[dst : dst + 3 * fw] = _rgb(row)
                else:
                    for c, i in enumerate(row):
                        if i != transparent:
                            canvas[dst + 3 * c : dst + 3 * c + 3] = (
                                palette[i] if i < nc else b"\x00\x00\x00"
                            )
        yield sw, sh, "RGB", bytes(canvas), delay_cs
        yielded = True
        if disposal == 2:  # restore the frame rect to background
            for r in range(fh):
                dst = 3 * ((top + r) * sw + left)
                canvas[dst : dst + 3 * fw] = bg_rgb * fw
        delay_cs = 0
        disposal = 0
        transparent = None
    if not yielded:
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


def encode_gif_animation(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[tuple[int, int, int, int, bytes, int]],
    *,
    bg_index: int = 0,
) -> bytes:
    """Encode a multi-frame GIF89a animation. Each frame is
    ``(left, top, fw, fh, indices, delay_cs)``: a sub-rectangle (or
    full-screen) frame with its Graphic Control delay in centiseconds.
    Disposal is "do not dispose" (1) — frames composite onto the running
    canvas, the shape :func:`decode_gif_frames` replays."""
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
    min_code_size = max(2, gct_bits + 1)
    for left, top, fw, fh, indices, delay_cs in frames:
        if len(indices) != fw * fh:
            raise ValueError("indices length must equal frame w*h")
        # GCE: disposal=1 (keep), no transparency, the frame's delay
        out += b"\x21\xf9\x04" + bytes((0x04,)) + struct.pack("<H", delay_cs)
        out += b"\x00\x00"  # transparent index (unused) + terminator
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        out.append(min_code_size)
        stream = _lzw_encode_literals(min_code_size, indices)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
