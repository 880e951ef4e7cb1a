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


def _parse_wav_container(data: bytes) -> tuple[int, int, int, bytes]:
    """RIFF walk of an IMA-ADPCM WAV: ``(rate, channels, block_align,
    frames)``. Raises ``NotImplementedError`` on anything but format 17
    (capability gap = error)."""
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
    return rate, channels, block_align, frames


def _nibble_matrix(data, np):
    """(B, K) byte matrix -> (B, 2K) nibble matrix, LOW nibble first per
    byte (IMA order)."""
    b, k = data.shape
    nib = np.empty((b, 2 * k), dtype=np.uint8)
    nib[:, 0::2] = data & 0x0F
    nib[:, 1::2] = data >> 4
    return nib


def _decode_streams(nib, pred, idx, np):
    """Vectorized IMA recurrence: ``nib`` is (N, T) nibbles with per-row
    seeds ``pred`` / ``idx``; returns the (N, T) decoded samples. The
    per-step math is IDENTICAL to :func:`decode_nibbles_state` (the
    hand-stepped reference), run across all N streams at once — every
    value stays well inside int32 (|pred| <= 32768 after each clamp,
    delta < 2 * STEP_TABLE[88])."""
    step_tab = np.asarray(STEP_TABLE, dtype=np.int32)
    idx_tab = np.asarray(INDEX_TABLE, dtype=np.int32)
    n_rows, t_len = nib.shape
    out = np.empty((t_len, n_rows), dtype=np.int32)
    # (T, N) int32 once: each step's nibble vector is then a contiguous
    # row instead of a strided column copy
    nib_t = np.ascontiguousarray(nib.T).astype(np.int32)
    pred = pred.astype(np.int32, copy=True)
    idx = idx.astype(np.int32, copy=True)
    for t in range(t_len):
        n = nib_t[t]
        step = step_tab[idx]
        delta = step >> 3
        delta += (step >> 2) * (n & 1)
        delta += (step >> 1) * ((n >> 1) & 1)
        delta += step * ((n >> 2) & 1)
        pred = np.where(n & 8, pred - delta, pred + delta)
        np.clip(pred, -32768, 32767, out=pred)
        idx += idx_tab[n & 7]
        np.clip(idx, 0, 88, out=idx)
        out[t] = pred
    return np.ascontiguousarray(out.T)


def decode_ima_adpcm_wavs(
    datas: list[bytes | None],
) -> list[tuple[int, int, list[int]] | None]:
    """Batch decoder: decode many IMA-ADPCM WAVs with ONE numpy-
    vectorized recurrence across every (block, channel) nibble stream in
    the batch (a block header reseeds (predictor, index), so streams are
    independent and the sequential recurrence runs per STEP across all
    streams, not per nibble in Python). Per-row work is bounded at the
    container parse: WAVs group by (channels, block_align) layout and
    each group's header split, word de-interleave, nibble expansion and
    sample re-interleave run as single whole-group array ops. ``None``
    inputs pass through as ``None``; per-row sample values equal
    :func:`decode_ima_adpcm_wav`'s bit-for-bit (pinned by tests), but
    arrive as an int32 ``numpy.ndarray`` (callers that want Python ints
    pay the boxing themselves — the hot kernels never do)."""
    import numpy as np

    # phase 1: parse containers (pure bytes work per row), group by layout
    metas: list[tuple | None] = []  # (rate, channels, block_align, n_blocks)
    groups: dict[tuple[int, int], list] = {}  # layout -> [frame bytes]
    for row, data in enumerate(datas):
        if data is None:
            metas.append(None)
            continue
        rate, channels, block_align, frames = _parse_wav_container(data)
        n_blocks = len(frames) // block_align if block_align else 0
        metas.append((rate, channels, block_align, n_blocks))
        if n_blocks == 0:
            continue
        hdr = 4 * channels
        if channels > 1 and (block_align - hdr) % (4 * channels):
            raise NotImplementedError(
                f"IMA ADPCM block data ({block_align - hdr} bytes) is not "
                f"a whole number of {channels}-channel 4-byte word groups"
            )
        groups.setdefault((channels, block_align), []).append(
            frames[: n_blocks * block_align]
        )

    # phase 2: per layout group, split headers / de-interleave words /
    # expand nibbles across ALL the group's blocks at once; collect the
    # streams for one shared padded recurrence
    stream_mats: list = []  # (B_g * channels, T_g) nibble matrices
    seed_p: list = []
    seed_i: list = []
    group_plan: list = []  # (key, channels, t_len, B_total, stream_slot)
    for key, parts in groups.items():
        channels, block_align = key
        blk = np.frombuffer(b"".join(parts), dtype=np.uint8).reshape(-1, block_align)
        b_total = blk.shape[0]
        hdr = 4 * channels
        t_len = (block_align - hdr) // channels * 2
        # (B, channels) seeds straight from the per-channel headers
        head_bytes = blk[:, :hdr].reshape(b_total, channels, 4)
        preds = (
            np.ascontiguousarray(head_bytes[:, :, :2])
            .view("<i2")
            .reshape(b_total, channels)
            .astype(np.int32)
        )
        idxs = np.clip(head_bytes[:, :, 2].astype(np.int32), 0, 88)
        body = blk[:, hdr:]
        if channels > 1:
            # word de-interleave: channel ch's 4-byte words concatenate
            # into ONE contiguous stream per block (the state carries
            # across a channel's words — chaining == concatenation);
            # axes (B, G, ch, 4) -> (B, ch, G*4)
            body = (
                body.reshape(b_total, -1, channels, 4)
                .transpose(0, 2, 1, 3)
                .reshape(b_total * channels, -1)
            )
        nib = _nibble_matrix(np.ascontiguousarray(body), np)
        stream_mats.append(nib)
        seed_p.append(preds.ravel())
        seed_i.append(idxs.ravel())
        group_plan.append((key, channels, t_len, b_total))

    # phase 3: ONE padded recurrence over every stream in the batch
    group_out: dict[tuple[int, int], object] = {}
    if stream_mats:
        t_max = max(m.shape[1] for m in stream_mats)
        n_streams = sum(m.shape[0] for m in stream_mats)
        nib_all = np.zeros((n_streams, t_max), dtype=np.uint8)
        row = 0
        bounds = []
        for m in stream_mats:
            nib_all[row : row + m.shape[0], : m.shape[1]] = m
            bounds.append((row, row + m.shape[0]))
            row += m.shape[0]
        all_p = np.concatenate(seed_p)
        out = _decode_streams(nib_all, all_p, np.concatenate(seed_i), np)
        # per group: (B, channels, T) -> sample-major/channel-minor block
        # rows with the header sample of every channel up front —
        # exactly the reference loop's interleave
        for (a, b), (key, channels, t_len, b_total) in zip(bounds, group_plan):
            chans = out[a:b, :t_len].reshape(b_total, channels, t_len)
            heads = all_p[a:b].reshape(b_total, channels)
            block_mat = np.concatenate(
                [heads[:, None, :], chans.transpose(0, 2, 1)], axis=1
            ).reshape(b_total, -1)
            group_out[key] = block_mat

    # phase 4: slice each WAV's blocks back out, in arrival order per group
    results: list[tuple[int, int, list[int]] | None] = [None] * len(datas)
    cursor: dict[tuple[int, int], int] = dict.fromkeys(groups, 0)
    for row, meta in enumerate(metas):
        if meta is None:
            continue
        rate, channels, block_align, n_blocks = meta
        if n_blocks == 0:
            results[row] = (rate, channels, np.empty(0, dtype=np.int32))
            continue
        key = (channels, block_align)
        block_mat = group_out[key]
        at = cursor[key]
        cursor[key] = at + n_blocks
        results[row] = (rate, channels, block_mat[at : at + n_blocks].ravel())
    return results


def decode_ima_adpcm_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode an IMA-ADPCM WAV (mono or multi-channel): returns
    ``(sample_rate, n_channels, samples)`` as 16-bit PCM values,
    channel-interleaved. Raises ``NotImplementedError`` on anything but
    format 17 (capability gap = error). One-row front of
    :func:`decode_ima_adpcm_wavs` (a single vectorized code path keeps
    the batch and scalar decoders bit-identical by construction)."""
    rate, channels, samples = decode_ima_adpcm_wavs([data])[0]
    return rate, channels, samples.tolist()


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
