"""Vendored IMA/DVI ADPCM WAV codec (WAVE format tag 0x0011), pure
Python — extends the audio surface past PCM (the stdlib ``wave`` module
refuses compressed formats).

Public algorithm: IMA "Recommended Practices for Enhancing Digital
Audio Compatibility in Multimedia Systems" rev 3.00 (1992) — the 89-step
quantizer table, the 8-entry index-adaptation table, and the
``step>>3 (+step>>2|step>>1|step)`` nibble expansion. Container layout
(block headers of ``predictor:int16, index:uint8, reserved``) per the
Microsoft WAVE spec for format 17.

Mono decodes a contiguous nibble stream; multi-channel (r9) follows
the Microsoft WAVE layout for tag 17 — per-channel 4-byte block
headers, then the data area interleaving one 4-byte word (8 samples)
per channel, round-robin, each channel carrying its own
(predictor, index) state across its words. Blocks whose data area is
not a whole number of channel word groups raise (capability gap =
ERROR, never a silently wrong decode — house rule, see
``functions/jpeg.py``).

The encoder exists to build test fixtures (same IMA reference
quantization); round-trip equality is NOT expected — ADPCM is lossy —
the tests hand-step the decoder against independently computed samples
and bound the reconstruction error instead.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]

INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_index(i: int) -> int:
    return 0 if i < 0 else (88 if i > 88 else i)


def decode_nibbles(
    nibbles: list[int], predictor: int, index: int
) -> list[int]:
    """Expand ADPCM nibbles from a (predictor, index) seed — the IMA
    reference decoder loop."""
    return decode_nibbles_state(nibbles, predictor, index)[0]


def decode_nibbles_state(
    nibbles: list[int], predictor: int, index: int
) -> tuple[list[int], int, int]:
    """Like :func:`decode_nibbles` but also returns the FINAL
    (predictor, index) — multi-channel decoding carries each channel's
    state across its interleaved 4-byte words."""
    out: list[int] = []
    for nib in nibbles:
        step = STEP_TABLE[index]
        delta = step >> 3
        if nib & 1:
            delta += step >> 2
        if nib & 2:
            delta += step >> 1
        if nib & 4:
            delta += step
        predictor = _clamp16(predictor - delta if nib & 8 else predictor + delta)
        index = _clamp_index(index + INDEX_TABLE[nib & 7])
        out.append(predictor)
    return out, predictor, index


def encode_samples(
    samples: list[int], predictor: int = 0, index: int = 0
) -> tuple[list[int], int, int]:
    """IMA reference encoder (fixture builder): quantize each sample's
    delta to a nibble, tracking the decoder's reconstruction so encoder
    and decoder states never drift. Returns (nibbles, predictor, index)
    with the FINAL state for block chaining."""
    nibbles: list[int] = []
    for s in samples:
        step = STEP_TABLE[index]
        diff = s - predictor
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        delta = step >> 3
        if nib & 1:
            delta += step >> 2
        if nib & 2:
            delta += step >> 1
        if nib & 4:
            delta += step
        predictor = _clamp16(predictor - delta if nib & 8 else predictor + delta)
        index = _clamp_index(index + INDEX_TABLE[nib & 7])
        nibbles.append(nib)
    return nibbles, predictor, index


def decode_ima_adpcm_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode an IMA-ADPCM WAV (mono or multi-channel): returns
    ``(sample_rate, n_channels, samples)`` as 16-bit PCM values,
    channel-interleaved. Raises ``NotImplementedError`` on anything but
    format 17 (capability gap = error)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    frames = b""
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)
    if fmt is None:
        raise NotImplementedError("WAV without fmt chunk")
    tag, channels, rate, _bps, block_align, _bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != 0x0011:
        raise NotImplementedError(
            f"WAV format tag {tag:#06x} is not IMA ADPCM (0x0011)"
        )
    if channels < 1:
        raise NotImplementedError("IMA ADPCM WAV with zero channels")
    samples: list[int] = []
    for off in range(0, len(frames) - (len(frames) % block_align), block_align):
        block = frames[off : off + block_align]
        if channels == 1:
            # mono: one header, then a CONTIGUOUS nibble stream (no
            # word-interleave constraint — the data area may be any
            # even nibble count)
            predictor = struct.unpack_from("<h", block, 0)[0]
            index = _clamp_index(block[2])
            samples.append(predictor)  # the header carries sample 0
            nibbles: list[int] = []
            for byte in block[4:]:
                nibbles.append(byte & 0x0F)  # low nibble first (IMA order)
                nibbles.append(byte >> 4)
            samples.extend(decode_nibbles(nibbles, predictor, index))
            continue
        # multi-channel (r9): per-channel 4-byte headers, then the data
        # area interleaves one 4-byte word (8 nibbles = 8 samples) PER
        # CHANNEL, round-robin — the Microsoft WAVE layout for tag 17
        hdr = 4 * channels
        if (len(block) - hdr) % (4 * channels):
            raise NotImplementedError(
                f"IMA ADPCM block data ({len(block) - hdr} bytes) is not "
                f"a whole number of {channels}-channel 4-byte word groups"
            )
        preds = [struct.unpack_from("<h", block, 4 * ch)[0] for ch in range(channels)]
        idxs = [_clamp_index(block[4 * ch + 2]) for ch in range(channels)]
        samples.extend(preds)  # sample 0 of every channel, interleaved
        pos_b = hdr
        while pos_b < len(block):
            group: list[list[int]] = []
            for ch in range(channels):
                word = block[pos_b : pos_b + 4]
                pos_b += 4
                nibbles = []
                for byte in word:
                    nibbles.append(byte & 0x0F)
                    nibbles.append(byte >> 4)
                decoded, preds[ch], idxs[ch] = decode_nibbles_state(
                    nibbles, preds[ch], idxs[ch]
                )
                group.append(decoded)
            for k in range(8):
                for ch in range(channels):
                    samples.append(group[ch][k])
    return rate, channels, samples


def encode_ima_adpcm_wav(
    samples: list[int], sample_rate: int, *, block_samples: int = 505, channels: int = 1
) -> bytes:
    """Fixture encoder: 16-bit PCM (channel-interleaved when
    ``channels`` > 1) -> IMA-ADPCM WAV with ``block_samples`` samples
    PER CHANNEL per block (1 header sample + an even nibble run; 505
    mono -> the canonical 256-byte block). Multi-channel blocks require
    ``block_samples - 1`` divisible by 8 (whole 4-byte channel words).
    Trailing partial blocks are zero-padded in the nibble area
    (decoders emit the pad — callers slice to the sample count they
    asked for, as the tests do)."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if (block_samples - 1) % 2:
        raise ValueError("block_samples - 1 must be even (2 nibbles per byte)")
    if channels > 1 and (block_samples - 1) % 8:
        raise ValueError(
            "multi-channel blocks need block_samples - 1 divisible by 8 "
            "(one 4-byte word = 8 samples per channel per group)"
        )
    block_align = (4 + (block_samples - 1) // 2) * channels
    chans = [samples[ch::channels] for ch in range(channels)]
    n_per = len(chans[0])
    if any(len(c) != n_per for c in chans):
        raise ValueError("interleaved sample count must be a channel multiple")
    blocks = []
    i = 0
    index = [0] * channels  # carried ACROSS blocks (each header stores
    # the running value) — resetting per block slope-overloads fast
    # signals right after every boundary
    while i < n_per:
        per_ch_nibbles: list[list[int]] = []
        header = bytearray()
        for ch in range(channels):
            chunk = chans[ch][i : i + block_samples]
            predictor = _clamp16(chunk[0])
            block_index = index[ch]  # header stores the STARTING state
            nibbles, _p, index[ch] = encode_samples(chunk[1:], predictor, block_index)
            nibbles += [0] * ((block_samples - 1) - len(nibbles))
            per_ch_nibbles.append(nibbles)
            header += struct.pack("<hBB", predictor, block_index, 0)
        i += block_samples
        body = bytearray(header)
        if channels == 1:
            nibbles = per_ch_nibbles[0]
            for j in range(0, len(nibbles), 2):
                body.append((nibbles[j + 1] << 4) | nibbles[j])
        else:
            for g in range(0, block_samples - 1, 8):
                for ch in range(channels):
                    w = per_ch_nibbles[ch][g : g + 8]
                    for j in range(0, 8, 2):
                        body.append((w[j + 1] << 4) | w[j])
        blocks.append(bytes(body))
    data = b"".join(blocks)
    byte_rate = sample_rate * block_align // block_samples
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, channels, sample_rate, byte_rate, block_align,
        4, 2, block_samples,
    )
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
