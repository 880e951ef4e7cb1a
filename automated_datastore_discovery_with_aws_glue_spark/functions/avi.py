"""Minimal AVI (RIFF) container for MJPEG video — pure Python, public
format documentation only (Microsoft RIFF/AVI spec: 'RIFF'-'AVI ' with
LIST hdrl (avih + strl(strh/strf)), LIST movi of '00dc' chunks, idx1).

The brief names video as a first-class multimodal column; the reference
repo has no media pipeline at all, so this is beyond-parity surface
(SURVEY §2.11). MJPEG is the composition point the r8 verdict called
out: each '00dc' chunk IS a baseline JPEG, so the vendored
`functions/jpeg.py` decoder turns container parsing + frame sampling
into real decoded pixels with no new codec.

Same capability-gap policy as the image/audio kernels: a non-MJPEG
video stream raises NotImplementedError LOUDLY (listing what it found),
never silently yields NULLs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    *,
    fps: int = 10,
) -> bytes:
    """Wrap pre-encoded baseline-JPEG frames into a valid single-stream
    MJPEG AVI (with idx1 index; chunks word-aligned per RIFF)."""
    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    n = len(frames)
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            us_per_frame,  # dwMicroSecPerFrame
            max_bytes * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            n,  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            max_bytes,  # dwSuggestedBufferSize
            width,
            height,
            0, 0, 0, 0,  # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHH8I4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (varies per frame)
            0, 0, width, height,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            width,
            height,
            1,  # biPlanes
            24,  # biBitCount
            b"MJPG",  # biCompression
            width * height * 3,  # biSizeImage
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks: list[bytes] = []
    idx_entries: list[bytes] = []
    # idx1 offsets are relative to the first byte of 'movi' (the list
    # type fourcc), offset 4 = first chunk header
    off = 4
    for f in frames:
        movi_chunks.append(_chunk(b"00dc", f))
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        )
        off += 8 + len(f) + (len(f) % 2)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """(fourcc, payload_start, payload_size) triples of a chunk run,
    honoring word alignment; truncated chunks raise."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(
                f"AVI: chunk {fourcc!r} at {pos} overruns its parent "
                f"({size} bytes, {end - pos - 8} available)"
            )
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def iter_avi_mjpeg_frames(data: bytes) -> Iterator[bytes]:
    """Yield each video frame's JPEG bytes from a single-stream MJPEG
    AVI. Validates the container signature and the stream handler;
    any other codec raises NotImplementedError (capability gap, loud)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file (RIFF/'AVI ' signature missing)")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    handler: bytes | None = None
    # stream NUMBER matters (r10, ADVICE r9): strl entries are ordered,
    # and stream N's movi chunks carry the two-digit prefix f"{N:02d}" —
    # yielding every ##dc chunk regardless of stream would feed a second
    # stream's non-JPEG frames to decode_jpeg
    vids_streams: list[int] = []
    stream_idx = 0
    movi: tuple[int, int] | None = None
    for fourcc, start, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[start : start + 4]
        if ltype == b"hdrl":
            for f2, s2, z2 in _iter_chunks(data, start + 4, start + size):
                if f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for f3, s3, z3 in _iter_chunks(data, s2 + 4, s2 + z2):
                        if f3 == b"strh" and z3 >= 8:
                            if data[s3 : s3 + 4] == b"vids":
                                vids_streams.append(stream_idx)
                                handler = data[s3 + 4 : s3 + 8]
                    stream_idx += 1
        elif ltype == b"movi":
            movi = (start + 4, start + size)
    if handler is None or movi is None:
        raise ValueError("AVI: no video stream header / movi list found")
    if len(vids_streams) > 1:
        raise NotImplementedError(
            f"AVI has {len(vids_streams)} video streams (indexes "
            f"{vids_streams}); multi-video-stream files are not supported "
            f"— demux to single-stream MJPEG first"
        )
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video codec {handler!r} not supported (MJPEG only — "
            f"the vendored decoder set covers baseline JPEG)"
        )
    prefix = b"%02d" % vids_streams[0]
    for fourcc, start, size in _iter_chunks(data, movi[0], movi[1]):
        # the validated video stream's ##dc (compressed) / ##db
        # (uncompressed-marked — some MJPEG writers use it anyway)
        # chunks only; audio (##wb), other streams, and rec lists are
        # skipped, not errors
        if fourcc[:2] == prefix and fourcc[2:4] in (b"dc", b"db"):
            yield data[start : start + size]
