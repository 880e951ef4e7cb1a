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
