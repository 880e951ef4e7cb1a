"""Vendored IMA-ADPCM codec (`functions/adpcm.py`) — the sf0.01 oracle
run (`mm_audio_adpcm`) differentially checks the decoder against a
recursive-CTE reference; these pin the kernel against hand-stepped
vectors, bound the encoder's reconstruction error, and exercise the
capability-gap errors and the Spark dispatch seam."""

from __future__ import annotations

import math

import pytest

from automated_datastore_discovery_with_aws_glue_spark.functions.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    decode_ima_adpcm_wav,
    decode_nibbles,
    encode_ima_adpcm_wav,
    encode_samples,
)


def test_decode_nibbles_hand_stepped():
    """Step the reference recurrence by hand from (pred=0, ix=0):
    nibble 7 -> delta = 0+1+3+7 = 11... with step=7: delta = 7>>3 +
    7>>2 + 7>>1 + 7 = 0+1+3+7 = 11, pred=11, ix += 8 -> 8 (step 16);
    nibble 8 -> delta = 16>>3 = 2, sign bit: pred = 9, ix -= 1 -> 7."""
    assert decode_nibbles([7], 0, 0) == [11]
    assert decode_nibbles([7, 8], 0, 0) == [11, 9]
    # clamping: from pred near the rail, a max-magnitude nibble pins to
    # the int16 range instead of wrapping
    out = decode_nibbles([7] * 30, 32000, 88)
    assert max(out) == 32767
    lo = decode_nibbles([15] * 30, -32000, 88)
    assert min(lo) == -32768


def test_index_adaptation_follows_table():
    """Small nibbles shrink the step index, large ones grow it — the
    exact table walk: nibble 0 from ix=5 -> ix 4; nibble 4 -> ix 7."""
    assert INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]
    assert len(STEP_TABLE) == 89 and STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    # decode twice with engineered seeds and confirm the index effect
    # via the step magnitude: after nibble 4 (index +2) deltas grow
    a = decode_nibbles([4, 4], 0, 10)
    b = decode_nibbles([4, 4], 0, 12)
    assert a[1] - a[0] < b[1] - b[0]


def test_wav_roundtrip_is_lossy_but_bounded():
    """encode -> decode of a sine reconstructs within the quantizer's
    step bound once the step has adapted (ADPCM is lossy AND has an
    attack transient from index 0 — exact equality, or a tight bound
    over the first samples, would both be wrong tests)."""
    n = 600
    pcm = [int(8000 * math.sin(i / 10)) for i in range(n)]
    wav = encode_ima_adpcm_wav(pcm, 8000)
    rate, ch, out = decode_ima_adpcm_wav(wav)
    assert (rate, ch) == (8000, 1)
    out = out[:n]
    assert len(out) == n
    steady = max(abs(a - b) for a, b in zip(pcm[32:], out[32:]))
    assert steady <= 500  # adapted-step quantization bound (measured ~120)
    # block boundaries (505 samples) show NO transient: the encoder
    # carries the step index across blocks
    boundary = max(abs(a - b) for a, b in zip(pcm[500:540], out[500:540]))
    assert boundary <= 500
    # and the reconstruction actually tracks the signal
    corr = sum(a * b for a, b in zip(pcm, out))
    assert corr > 0.8 * sum(a * a for a in pcm)


def test_encoder_decoder_state_never_drifts():
    """The encoder tracks the decoder's reconstruction: decoding the
    encoder's nibbles from the same seed reproduces the encoder's own
    predictor trajectory exactly (the property that keeps long streams
    from diverging)."""
    pcm = [((i * 37) % 2000) - 1000 for i in range(200)]
    nibbles, final_pred, final_ix = encode_samples(pcm, 0, 0)
    decoded = decode_nibbles(nibbles, 0, 0)
    assert decoded[-1] == final_pred


def test_capability_gaps_raise():
    with pytest.raises(NotImplementedError, match="RIFF"):
        decode_ima_adpcm_wav(b"\x00" * 64)
    # a PCM WAV (tag 1) through the ADPCM kernel names the tag
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1), w.setsampwidth(2), w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    with pytest.raises(NotImplementedError, match="0x0001"):
        decode_ima_adpcm_wav(buf.getvalue())


def test_spark_audio_paths_dispatch_adpcm(spark):
    """decode_audio and audio_frame_features route tag-0x0011 bytes
    through the vendored kernel inside mapInPandas — metadata and
    features come from the DECODED stream."""
    import math as m

    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import (
        audio_frame_features,
        decode_audio,
    )

    pcm = [int(4000 * m.sin(i / 5)) for i in range(161)]
    wav = encode_ima_adpcm_wav(pcm, 8000, block_samples=161)
    df = spark.createDataFrame([(1, bytearray(wav))], "id long, content binary")
    meta = decode_audio(df).collect()[0]
    assert (meta["sample_rate"], meta["n_channels"], meta["sample_width"]) == (
        8000, 1, 2,
    )
    assert meta["n_frames"] == 161
    frames = audio_frame_features(df, frame_len=16).collect()
    assert len(frames) == 161 // 16
    _r, _c, samples = decode_ima_adpcm_wav(wav)
    fr0 = samples[:16]
    assert frames[0]["peak"] == max(abs(s) for s in fr0)
    assert frames[0]["rms"] == round(
        m.sqrt(sum(s * s for s in fr0) / 16), 4
    )


def test_stereo_roundtrip_decoder_matches_encoder_reconstruction():
    """Multi-channel decode: the decoder must reproduce the encoder's
    internal per-channel reconstruction EXACTLY (lossy vs the original,
    exact vs the codec's own state machine), with each channel carrying
    its own (predictor, index) across its interleaved 4-byte words."""
    import math

    from automated_datastore_discovery_with_aws_glue_spark.functions.adpcm import (
        _clamp16,
        decode_nibbles_state,
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
        encode_samples,
    )

    n = 200
    left = [int(8000 * math.sin(2 * math.pi * 440 * t / 8000)) for t in range(n)]
    right = [int(5000 * math.sin(2 * math.pi * 220 * t / 8000 + 1.0)) for t in range(n)]
    inter = [v for pair in zip(left, right) for v in pair]
    wav = encode_ima_adpcm_wav(inter, 8000, block_samples=65, channels=2)
    rate, ch, out = decode_ima_adpcm_wav(wav)
    assert (rate, ch) == (8000, 2)

    def reference(sig):
        idx, recon, i = 0, [], 0
        while i < len(sig):
            chunk = sig[i : i + 65]
            i += 65
            pred = _clamp16(chunk[0])
            nibs, _, nxt = encode_samples(chunk[1:], pred, idx)
            nibs += [0] * (64 - len(nibs))
            recon.append(pred)
            recon.extend(decode_nibbles_state(nibs, pred, idx)[0])
            idx = nxt
        return recon

    l_ref, r_ref = reference(left), reference(right)
    assert out[0::2][: len(l_ref)] == l_ref
    assert out[1::2][: len(r_ref)] == r_ref


def test_stereo_channels_are_independent():
    """A cross-channel state leak is the classic stereo-ADPCM bug: a
    LOUD left channel must not disturb a silent right channel (decodes
    to tiny adaptation noise only), and mono behavior is unchanged."""
    import math

    from automated_datastore_discovery_with_aws_glue_spark.functions.adpcm import (
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
    )

    n = 128
    loud = [int(30000 * math.sin(2 * math.pi * 1000 * t / 8000)) for t in range(n)]
    silent = [0] * n
    inter = [v for pair in zip(loud, silent) for v in pair]
    _, ch, out = decode_ima_adpcm_wav(
        encode_ima_adpcm_wav(inter, 8000, block_samples=65, channels=2)
    )
    assert ch == 2
    assert max(abs(v) for v in out[1::2]) <= 16  # adaptation noise only
    assert max(abs(v) for v in out[0::2]) > 20000

    # mono path byte-for-byte unchanged by the channels parameter default
    m1 = encode_ima_adpcm_wav(loud, 8000, block_samples=65)
    m2 = encode_ima_adpcm_wav(loud, 8000, block_samples=65, channels=1)
    assert m1 == m2


def test_stereo_encoder_validation_and_partial_word_error():
    import pytest

    from automated_datastore_discovery_with_aws_glue_spark.functions.adpcm import (
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
    )

    with pytest.raises(ValueError, match="divisible by 8"):
        encode_ima_adpcm_wav([0, 0, 0, 0], 8000, block_samples=3, channels=2)
    # a stereo block whose data area breaks word-group alignment raises
    wav = bytearray(encode_ima_adpcm_wav([0] * 36, 8000, block_samples=9, channels=2))
    # fmt block_align field (offset 32 in the canonical header layout)
    import struct

    ba = struct.unpack_from("<H", wav, 32)[0]
    struct.pack_into("<H", wav, 32, ba - 2)  # no longer whole word groups
    with pytest.raises(NotImplementedError, match="word group"):
        decode_ima_adpcm_wav(bytes(wav))
