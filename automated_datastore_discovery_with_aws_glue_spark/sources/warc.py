"""WARC-shape crawl-container source (r12, VERDICT r11 item 4).

A raw web crawl arrives as multi-record CONTAINERS: each record is a
version line, a header block, and a Content-Length-delimited payload —
the WARC format CommonCrawl publishes. Splitting on a delimiter string
is WRONG (payloads may contain ``WARC/1.0`` or blank lines); the only
correct scan is offset arithmetic driven by ``Content-Length`` — the
same vendored record-header discipline ``functions/avi.py`` applies to
RIFF containers.

Record grammar (the WARC/1.x subset a crawl reader needs)::

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n   (one per header; Content-Length required)
    \\r\\n
    <payload: exactly Content-Length BYTES>
    \\r\\n\\r\\n

:func:`parse_warc` is the pure-Python byte scanner (unit-testable
without Spark); :func:`warc_records` lifts it over a DataFrame of
containers with ``mapInPandas`` (Arrow-batched — the documented slow
path, used because a stateful byte scan is not expressible as native
expressions). Parallelism is per-container: a 100 TB crawl is millions
of container files, so one task per container saturates any executor
count; records inside one container are inherently sequential (each
record's offset depends on the previous Content-Length).

Malformed input is LOUD, not silent, at the granularity the framing
allows: a FRAMING failure (bad version line, Content-Length,
terminator) yields a ``valid=false`` row and stops the container scan
— offsets past a corrupt length are untrusted, and resyncing risks
emitting attacker-shaped phantom records — while a PAYLOAD failure
(HTTP envelope, charset, utf-8) quarantines only its own record,
because the next record's offset is already validated and aborting
would silently discard every later page. Pipelines route the
``valid=false`` rows to quarantine and count them either way.

r13 adds the HTTP layer real crawls need: ``WARC-Type: response``
payloads carry a full HTTP response message, so
``warc_records(http_envelope=True)`` splits status line + headers +
body (:func:`parse_http_response`), resolves the body charset
(Content-Type param > BOM > the windows-1252 browser default),
transcodes to utf-8, and emits :data:`HTTP_FIELDS` so ingest can gate
on ``http_status == 200`` instead of swallowing error-page bodies.
:func:`gunzip_text` decodes possibly-gzipped text bodies (the
``.xml.gz`` sitemap form) through the same gzip member scanner.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output fields appended to the container's passthrough columns
RECORD_FIELDS: tuple[StructField, ...] = (
    StructField("rec_idx", IntegerType()),
    StructField("warc_version", StringType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("content_length", LongType()),
    # r14: WARC-Payload-Digest as written (e.g. 'sha1:<base32>') —
    # real archives dedup via `revisit` records pointing at an
    # original's digest, and surfacing it enables exact dedup with
    # ZERO payload decode, the cheapest dedup tier there is
    StructField("payload_digest", StringType()),
    StructField("payload", StringType()),
    StructField("valid", BooleanType()),
    StructField("error", StringType()),
)

#: extra fields emitted with ``http_envelope=True`` (r13): real
#: ``WARC-Type: response`` payloads carry an HTTP response message —
#: ``HTTP/1.x <status> <reason>\\r\\nheaders\\r\\n\\r\\n<body>`` — and a
#: reader that hands the raw payload to text extraction pollutes the
#: corpus with status lines and ingests 404/301 bodies as content.
HTTP_FIELDS: tuple[StructField, ...] = (
    StructField("http_status", IntegerType()),
    StructField("http_content_type", StringType()),
    StructField("http_charset", StringType()),
    StructField("http_charset_src", StringType()),
    # r14: the Location header as written — 3xx targets are frontier
    # edges exactly like sitemap locs (resolve relative forms against
    # target_uri with operators/web.url_resolve, then canonicalize)
    StructField("http_location", StringType()),
    # r14b: the caching validators — a recrawl scheduler that has these
    # can revalidate with If-None-Match / If-Modified-Since instead of
    # refetching bodies (the engine's UPDATE_IN_DATABASE discipline
    # applied to the web: fingerprint-skip without the fetch)
    StructField("http_etag", StringType()),
    StructField("http_last_modified", StringType()),
)


class _Malformed(Exception):
    pass


def _ascii(b: bytes) -> str:
    return b.decode("utf-8", errors="replace")


#: HTTP status line: version, 3-digit status, optional reason. The
#: minor version is OPTIONAL (r14): archives captured over HTTP/2 or
#: HTTP/3 write ``HTTP/2 200 OK`` — no ``.minor`` — and a reader that
#: requires ``HTTP/\d.\d`` wholesale-drops every such record.
_HTTP_STATUS_RE = re.compile(rb"^HTTP/\d(?:\.\d)? (\d{3})(?: .*)?$")
#: charset parameter of a Content-Type value (token or quoted-string)
_CHARSET_PARAM_RE = re.compile(
    rb"""(?i);\s*charset\s*=\s*"?([A-Za-z0-9._\-]+)"?"""
)

#: IANA charset labels this reader transcodes -> Python codec. r13
#: shipped the cp1252 cluster; r14 folds in the families real
#: multilingual crawls declare (CJK, the iso-8859 row, cyrillic,
#: utf-16) — every codec here is Python stdlib, so "supported" costs
#: nothing. Labels follow the WHATWG encoding standard where it
#: diverges from IANA (gb2312 decodes as GBK, euc-kr as the cp949
#: superset, shift_jis as the cp932 superset — what browsers actually
#: do with legacy pages that declare the narrow label but serve the
#: vendor superset). A label NOT in this table is still a LOUD
#: malformed record, never a silent mojibake decode.
CHARSET_ALIASES: dict[str, str] = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "us-ascii": "ascii",
    "ascii": "ascii",
    # -- CJK (r14): WHATWG maps the legacy label to the vendor superset
    "gbk": "gbk",
    "gb2312": "gbk",
    "gb18030": "gb18030",
    "shift_jis": "cp932",
    "shift-jis": "cp932",
    "sjis": "cp932",
    "x-sjis": "cp932",
    "ms_kanji": "cp932",
    "euc-jp": "euc_jp",
    "euc-kr": "cp949",
    "ks_c_5601-1987": "cp949",
    "big5": "big5",
    "big5-hkscs": "big5hkscs",
    # -- iso-8859 row + cyrillic
    "iso-8859-2": "iso8859-2",
    "iso8859-2": "iso8859-2",
    "iso-8859-5": "iso8859-5",
    "iso8859-5": "iso8859-5",
    "iso-8859-7": "iso8859-7",
    "iso8859-7": "iso8859-7",
    "iso-8859-9": "iso8859-9",
    "iso8859-9": "iso8859-9",
    "iso-8859-15": "iso8859-15",
    "iso8859-15": "iso8859-15",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "windows-1253": "cp1253",
    "windows-1254": "cp1254",
    "windows-1256": "cp1256",
    "windows-874": "cp874",
    "tis-620": "cp874",
    # -- utf-16: header-declared now decodes like the BOM branch
    #    always has (the r13 asymmetry VERDICT flagged). The bare
    #    'utf-16' label is BOM-aware and defaults little-endian
    #    without one (the WHATWG read); the endian-explicit labels get
    #    their matching BOM consumed in parse_http_response.
    "utf-16": "utf-16",
    "utf16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

#: BOM -> (codec that CONSUMES the BOM, reported charset)
_BOMS: tuple[tuple[bytes, str, str], ...] = (
    (b"\xef\xbb\xbf", "utf-8-sig", "utf-8"),
    (b"\xff\xfe", "utf-16", "utf-16-le"),
    (b"\xfe\xff", "utf-16", "utf-16-be"),
)

#: non-``text/*`` mimes whose bodies are still TEXT for the corpus
#: pipeline; every other declared mime (images, pdf, octet-stream…)
#: is BINARY and must never be charset-decoded — cp1252 "succeeds" on
#: almost any byte sequence, so transcoding a PNG would silently mint
#: mojibake corpus text
TEXT_MIMES: frozenset[str] = frozenset(
    {
        "application/xhtml+xml",
        "application/xml",
        "application/json",
        "application/javascript",
        "application/rss+xml",
        "application/atom+xml",
    }
)

#: one HTTP/1.1 chunk-size line: hex size, optional extensions
_CHUNK_SIZE_RE = re.compile(rb"^([0-9A-Fa-f]+)(?:;.*)?$")

#: HTML5 meta-charset prescan: covers both <meta charset=X> and
#: <meta http-equiv="Content-Type" content="text/html; charset=X">
#: (the 'charset=' attribute/param is the common spine of both forms).
#: The tag boundary ``[\s/]`` keeps '<metadata charset=...>' (a real
#: XML element name) from hijacking the decode; 'charset=' inside an
#: UNRELATED meta's content attribute can still match — the documented
#: regex-level trade, only reachable on HTML mimes (the prescan never
#: runs on plain text or XML, see :data:`_META_PRESCAN_MIMES`).
_META_CHARSET_RE = re.compile(
    rb"""(?is)<meta[\s/][^>]*?charset\s*=\s*["']?([A-Za-z0-9._\-]+)"""
)
#: the prescan window the HTML5 spec gives user agents
_META_PRESCAN_BYTES = 1024
#: mimes the prescan applies to — browsers prescan when PARSING HTML;
#: a declared text/plain or XML body never consults markup (None =
#: no Content-Type at all, where HTML is the only safe guess)
_META_PRESCAN_MIMES: frozenset[str | None] = frozenset(
    {None, "text/html", "application/xhtml+xml"}
)

#: magic prefixes of binary formats commonly served WITHOUT a
#: Content-Type header (r14, ADVICE r13): a response with no declared
#: mime used to fall straight to the cp1252 default, which "succeeds"
#: on almost any byte sequence — a header-less PNG minted mojibake
#: corpus text, the exact silent failure the declared-binary gate
#: documents itself as preventing. Checked together with a NUL-byte
#: scan over the prescan window (NUL is the sharpest text/binary
#: discriminator: no supported text charset emits it, every raster /
#: executable / archive format does within the first KB).
_BINARY_MAGIC: tuple[bytes, ...] = (
    b"\x89PNG\r\n\x1a\n",  # png
    b"GIF87a",
    b"GIF89a",
    b"\xff\xd8\xff",  # jpeg
    b"%PDF-",
    b"PK\x03\x04",  # zip family (docx/xlsx/jar…)
    b"\x1f\x8b",  # gzip file served raw
    b"RIFF",  # wav/avi/webp
    b"OggS",
    b"ID3",  # mp3 with id3 tag
    b"\x00\x00\x01\x00",  # ico
    b"wOFF",
    b"wOF2",
)


def _sniffs_binary(body: bytes) -> bool:
    """Cheap content sniff for UNDECLARED-mime bodies: a known binary
    magic at offset 0, or any NUL byte inside the meta-prescan window.
    utf-16 text DOES carry NULs — but an undeclared-mime utf-16 body
    is saved by its BOM, which is checked BEFORE this sniff runs."""
    if body.startswith(_BINARY_MAGIC):
        return True
    return b"\x00" in body[:_META_PRESCAN_BYTES]


def dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 ``Transfer-Encoding: chunked`` body: each
    chunk is ``<hex-size>[;ext]\\r\\n<data>\\r\\n``, terminated by a
    zero-size chunk (optional trailers ignored). Raises
    :class:`_Malformed` on a bad size line, a truncated chunk, or a
    missing chunk terminator — the loud per-record quarantine route."""
    out: list[bytes] = []
    pos, n = 0, len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise _Malformed("chunked body: unterminated chunk-size line")
        m = _CHUNK_SIZE_RE.match(body[pos:eol])
        if not m:
            raise _Malformed(
                f"chunked body: bad chunk-size line {_ascii(body[pos:eol])!r}"
            )
        size = int(m.group(1), 16)
        pos = eol + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) are ignored
        end = pos + size
        if end + 2 > n:
            raise _Malformed("chunked body: truncated chunk data")
        if body[end : end + 2] != b"\r\n":
            raise _Malformed("chunked body: missing chunk terminator")
        out.append(body[pos:end])
        pos = end + 2


def parse_http_response(
    msg: bytes,
) -> tuple[
    int,
    str | None,
    str | None,
    str | None,
    str | None,
    str | None,
    str | None,
    str | None,
]:
    """Split one HTTP response message into ``(status, content_type,
    charset, charset_src, body_text, location, etag, last_modified)``.

    ``etag`` and ``last_modified`` are the caching validators as
    written (r14b) — they surface on every status and on binary
    records, like ``location``, so a recrawl scheduler can plan
    If-None-Match / If-Modified-Since revalidation without refetching
    bodies.

    ``location`` is the ``Location`` header as written (utf-8-lenient
    decoded), ``None`` when absent — the redirect-frontier half of
    discovery: 3xx targets are crawl edges exactly like sitemap locs,
    and a reader that drops the header discards a double-digit
    percentage of a real crawl's out-links. It surfaces on EVERY
    status (a 200 with a stray Location is data too) and on binary
    records (it lives in the header block, which parsed before the
    mime gate fired).

    Framing layers are peeled in wire order: ``Transfer-Encoding:
    chunked`` is de-chunked first (:func:`dechunk`), then
    ``Content-Encoding`` is decompressed — ``gzip``/``x-gzip`` via the
    member scanner, ``deflate`` via zlib accepting BOTH the
    RFC-correct zlib-wrapped form and the bare-deflate form
    misconfigured servers ship (browsers try wbits=15, then -15;
    ``identity`` is a no-op; any other coding is loud-malformed). A
    declared mime outside ``text/*`` and :data:`TEXT_MIMES` is BINARY:
    the record stays valid but ``charset``/``charset_src``/
    ``body_text`` come back ``None`` — charset-decoding a PNG under
    the cp1252 default would "succeed" and mint mojibake corpus text,
    the silent failure this gate exists to prevent. A MISSING
    Content-Type is treated as text only after a cheap content sniff
    (:func:`_sniffs_binary` — known magics, NUL in the prescan
    window); a sniffed-binary body is withheld exactly like a declared
    one (ADVICE r13: the undeclared-PNG hole).

    Charset resolution order for text bodies (the HTML5 / browser
    discipline): the ``Content-Type`` header's ``charset`` parameter
    wins (labels per :data:`CHARSET_ALIASES`, incl. the CJK/iso-8859/
    cyrillic/utf-16 families real multilingual crawls declare; a
    BOM matching a declared utf-8/utf-16 is consumed as signature);
    else a BOM; else an HTML ``<meta charset>`` / ``http-equiv``
    declaration found in the first 1024 bytes (the spec's prescan
    window; unknown meta labels are ignored like browsers do, and a
    meta claiming utf-16 decodes as utf-8 — the WHATWG rule: a body
    readable enough to find the tag is not utf-16); else windows-1252
    (what browsers actually assume for legacy pages — NOT the RFC 2616
    iso-8859-1 default, which real content ignores). ``charset_src``
    records which branch fired (``header`` / ``bom`` / ``meta`` /
    ``default``). An unknown charset label, a malformed status line or
    header, bad chunk framing, or a body that does not decode under
    the resolved charset raises :class:`_Malformed` — the same loud
    quarantine route every other malformation takes."""
    sep = msg.find(b"\r\n\r\n")
    if sep < 0:
        raise _Malformed("HTTP message missing header terminator")
    head, body = msg[:sep], msg[sep + 4 :]
    lines = head.split(b"\r\n")
    m = _HTTP_STATUS_RE.match(lines[0])
    if not m:
        raise _Malformed(f"malformed HTTP status line {_ascii(lines[0])!r}")
    status = int(m.group(1))
    ctype: bytes | None = None
    te: bytes = b""
    ce: bytes = b""
    location: str | None = None
    etag: str | None = None
    last_modified: str | None = None
    for line in lines[1:]:
        key, sep2, val = line.partition(b":")
        if not sep2:
            raise _Malformed(f"malformed HTTP header line {_ascii(line)!r}")
        k = key.strip().lower()
        if k == b"content-type":
            ctype = val.strip()
        elif k == b"transfer-encoding":
            te = val.strip().lower()
        elif k == b"content-encoding":
            ce = val.strip().lower()
        elif k == b"location":
            location = _ascii(val.strip()) or None
        elif k == b"etag":
            etag = _ascii(val.strip()) or None
        elif k == b"last-modified":
            last_modified = _ascii(val.strip()) or None
    mime: str | None = None
    declared: str | None = None
    if ctype is not None:
        mime = _ascii(ctype.split(b";", 1)[0].strip().lower()) or None
        cm = _CHARSET_PARAM_RE.search(ctype)
        if cm:
            declared = cm.group(1).decode("ascii").lower()
    if mime is not None and not mime.startswith("text/") and mime not in TEXT_MIMES:
        # binary body: withheld from the text lane, so never pay for
        # de-chunking or decompressing it (a gzip-bombed image would
        # otherwise cost full materialization just to be discarded)
        return status, mime, None, None, None, location, etag, last_modified
    if te:
        if te != b"chunked":
            raise _Malformed(f"unsupported transfer-encoding {_ascii(te)!r}")
        body = dechunk(body)
    if ce and ce != b"identity":
        if ce in (b"gzip", b"x-gzip"):
            try:
                body = b"".join(split_gzip_members(body))
            except ValueError as exc:
                raise _Malformed(f"content-encoding gzip: {exc}") from None
        elif ce == b"deflate":
            import zlib

            try:
                body = zlib.decompress(body)
            except zlib.error:
                try:
                    # bare deflate, no zlib wrapper — the server bug
                    # browsers tolerate, so a polite reader does too
                    body = zlib.decompress(body, -15)
                except zlib.error as exc:
                    raise _Malformed(
                        f"content-encoding deflate: {exc}"
                    ) from None
        else:
            raise _Malformed(f"unsupported content-encoding {_ascii(ce)!r}")
    if declared is not None:
        codec = CHARSET_ALIASES.get(declared)
        if codec is None:
            raise _Malformed(f"unsupported charset {declared!r}")
        charset, src = codec, "header"
        # a BOM matching the DECLARED charset is data the author meant
        # as a signature, not text — consume it like the sniffing
        # branch. The bare utf-16 codec is BOM-aware by itself but
        # endian-ambiguous without one: pin the no-BOM case to LE (the
        # WHATWG read) instead of the platform's native order.
        if codec == "utf-8" and body.startswith(b"\xef\xbb\xbf"):
            codec = "utf-8-sig"
        elif codec == "utf-16":
            if not body.startswith((b"\xff\xfe", b"\xfe\xff")):
                codec = "utf-16-le"
        elif codec == "utf-16-le" and body.startswith(b"\xff\xfe"):
            body = body[2:]
        elif codec == "utf-16-be" and body.startswith(b"\xfe\xff"):
            body = body[2:]
    else:
        for bom, bom_codec, reported in _BOMS:
            if body.startswith(bom):
                codec, charset, src = bom_codec, reported, "bom"
                break
        else:
            # no declared mime AND no BOM: sniff before assuming text
            # (ADVICE r13) — a header-less PNG/zip/NUL-ridden body
            # must be withheld like a declared-binary one, not decoded
            # "successfully" under the cp1252 default. BOM-carrying
            # utf-16 already won above, so its NULs never reach this.
            if mime is None and _sniffs_binary(body):
                return status, None, None, None, None, location, etag, last_modified
            # HTML5 meta prescan over the first 1024 bytes: HTML pages
            # that declare their charset only in markup must not fall
            # to the cp1252 default (a utf-8 page would silently
            # mojibake). HTML mimes only — a text/plain log line or an
            # XML element mentioning 'charset=' must not hijack the
            # decode. An UNKNOWN meta label is ignored, not loud —
            # that is what browsers do, and unlike the HTTP header the
            # tag is page content, not an operator assertion.
            meta_codec = None
            if mime in _META_PRESCAN_MIMES:
                mm = _META_CHARSET_RE.search(body[:_META_PRESCAN_BYTES])
                if mm:
                    meta_codec = CHARSET_ALIASES.get(
                        mm.group(1).decode("ascii").lower()
                    )
                    # the WHATWG meta rule: a tag readable enough to
                    # find cannot be inside a utf-16 body — decode utf-8
                    if meta_codec is not None and meta_codec.startswith(
                        "utf-16"
                    ):
                        meta_codec = "utf-8"
            if meta_codec is not None:
                # a BOM would have won above, so no BOM handling here
                codec, charset, src = meta_codec, meta_codec, "meta"
            else:
                codec, charset, src = "cp1252", "cp1252", "default"
    try:
        text = body.decode(codec)
    except (UnicodeDecodeError, ValueError) as exc:
        raise _Malformed(f"body does not decode as {charset} ({exc})") from None
    return status, mime, charset, src, text, location, etag, last_modified


def _empty_rec(idx: int, error: str | None) -> dict:
    """All-NULL record skeleton (both the loud-malformed row and the
    base every valid record fills in)."""
    return {
        "rec_idx": idx,
        "warc_version": None,
        "warc_type": None,
        "target_uri": None,
        "content_length": None,
        "payload_digest": None,
        "payload": None,
        "valid": error is None,
        "error": error,
        "http_status": None,
        "http_content_type": None,
        "http_charset": None,
        "http_charset_src": None,
        "http_location": None,
        "http_etag": None,
        "http_last_modified": None,
    }


def parse_warc(data: bytes, *, http_envelope: bool = False) -> list[dict]:
    """Scan one container into record dicts (see module docstring).

    Payload bytes are returned utf-8-decoded in ``payload`` (a decode
    failure is a malformed record — this engine's crawl fixtures are
    text; a binary-payload pipeline would carry the slice as bytes
    instead, same offsets). ``content_length`` is the header's BYTE
    count — multi-byte text makes it differ from ``len(payload)``.

    With ``http_envelope=True``, each ``WARC-Type: response`` payload
    is interpreted as an HTTP response message
    (:func:`parse_http_response`): ``payload`` becomes the BODY,
    transcoded to text by the declared/sniffed charset, and the
    ``http_*`` keys carry status / content-type / charset so a
    pipeline can gate on ``http_status == 200`` instead of ingesting
    error-page bodies. Non-response records keep the plain utf-8
    payload decode and NULL http fields."""
    recs: list[dict] = []
    pos, idx, n = 0, 0, len(data)

    def err(msg: str) -> dict:
        return _empty_rec(idx, f"offset {pos}: {msg}")

    while pos < n:
        try:
            if not data.startswith(b"WARC/", pos):
                raise _Malformed("expected 'WARC/' version line")
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise _Malformed("unterminated version line")
            version = data[pos + 5 : eol]
            hdr_end = data.find(b"\r\n\r\n", eol)
            if hdr_end < 0:
                raise _Malformed("unterminated header block")
            headers: dict[bytes, bytes] = {}
            for line in data[eol + 2 : hdr_end].split(b"\r\n"):
                key, sep, val = line.partition(b":")
                if not sep:
                    raise _Malformed(f"malformed header line {_ascii(line)!r}")
                headers[key.strip().lower()] = val.strip()
            clen_raw = headers.get(b"content-length")
            if clen_raw is None or not clen_raw.isdigit():
                raise _Malformed(
                    f"missing or non-numeric Content-Length {_ascii(clen_raw or b'')!r}"
                )
            clen = int(clen_raw)
            body_start = hdr_end + 4
            body_end = body_start + clen
            if body_end + 4 > n:
                raise _Malformed(
                    f"truncated payload (need {clen} bytes + terminator)"
                )
            if data[body_end : body_end + 4] != b"\r\n\r\n":
                raise _Malformed("missing record terminator after payload")
            raw_payload = data[body_start:body_end]
            rec = _empty_rec(idx, None)
            rec.update(
                warc_version=_ascii(version),
                warc_type=_ascii(headers.get(b"warc-type", b"")) or None,
                target_uri=_ascii(headers.get(b"warc-target-uri", b"")) or None,
                content_length=clen,
                payload_digest=_ascii(headers.get(b"warc-payload-digest", b""))
                or None,
            )
            # PAYLOAD-level failures (HTTP envelope, charset, utf-8)
            # quarantine THIS record only: the WARC framing and the next
            # offset are already validated, so later records are
            # trustworthy — aborting the container here would silently
            # discard them (e.g. one gbk page hiding 500 good ones).
            # Only FRAMING failures (bad version line, Content-Length,
            # terminator) stop the scan, where offsets are untrusted.
            try:
                if (
                    http_envelope
                    and headers.get(b"warc-type", b"").lower() == b"response"
                ):
                    (
                        status,
                        mime,
                        charset,
                        src,
                        body_text,
                        location,
                        etag,
                        last_modified,
                    ) = parse_http_response(raw_payload)
                    rec.update(
                        payload=body_text,
                        http_status=status,
                        http_content_type=mime,
                        http_charset=charset,
                        http_charset_src=src,
                        http_location=location,
                        http_etag=etag,
                        http_last_modified=last_modified,
                    )
                else:
                    try:
                        rec["payload"] = raw_payload.decode("utf-8")
                    except UnicodeDecodeError as exc:
                        raise _Malformed(
                            f"payload is not valid utf-8 ({exc})"
                        ) from None
            except _Malformed as exc:
                rec.update(valid=False, error=f"offset {pos}: {exc}")
            recs.append(rec)
            pos = body_end + 4
            idx += 1
        except _Malformed as exc:
            recs.append(err(str(exc)))
            break
    return recs


def iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Yield the decompressed payload of each gzip MEMBER in a
    concatenation — the layout real WARC archives ship (one gzip
    member per record, so a reader can seek to a member boundary and
    start there). ``zlib.decompressobj(wbits=47)`` stops at each
    member's end and hands back ``unused_data``; looping that is the
    member-boundary scan. Raises ``ValueError`` on corrupt or
    truncated gzip bytes AT that member — members already yielded
    before the corruption are good (their boundaries were proven by
    the framing itself). The single home of the boundary logic:
    :func:`split_gzip_members` and :func:`parse_warc_gz` both ride
    it."""
    import zlib

    rest, i = data, 0
    while rest:
        d = zlib.decompressobj(wbits=47)
        try:
            out = d.decompress(rest)
            out += d.flush()
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member {i}: {exc}") from None
        if not d.eof:
            raise ValueError(f"truncated gzip member {i}")
        yield out
        rest = d.unused_data
        i += 1


def split_gzip_members(data: bytes) -> list[bytes]:
    """All members of :func:`iter_gzip_members` as a list — the
    all-or-nothing form (any corruption raises before anything is
    returned), right for single-document bodies like ``.xml.gz``
    sitemaps and ``Content-Encoding: gzip`` payloads."""
    return list(iter_gzip_members(data))


def gunzip_text(
    df: DataFrame, data_col: str, *, out: str = "text", error: str = "gunzip_error"
) -> DataFrame:
    """Decode a possibly-gzipped BINARY column to utf-8 text — the
    ``.xml.gz`` form real sitemaps ship in: bodies starting with the
    gzip magic (``1F 8B``) are decompressed via
    :func:`split_gzip_members` (members concatenated — a multi-member
    body is still one document), everything else decodes as utf-8
    directly. Failures are LOUD per row (``out`` NULL + ``error``
    set), never a silent skip. Arrow-batched ``mapInPandas`` like the
    container scan — per-file parallelism, which is the only
    parallelism a compressed body allows."""
    import pandas as pd

    for c in (out, error):
        if c in df.columns:
            raise ValueError(f"gunzip_text: output column {c!r} already exists")
    passthrough = [f for f in df.schema.fields]
    schema = StructType(
        list(passthrough)
        + [StructField(out, StringType()), StructField(error, StringType())]
    )
    names = [f.name for f in passthrough] + [out, error]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # column-array walk, not iterrows: payload parsing dominates,
            # but materializing a Series per row is pure overhead on wide
            # passthrough frames (VERDICT r13 nit)
            texts: list[str | None] = []
            errs: list[str | None] = []
            for data in pdf[data_col].tolist():
                text = err = None
                if data is None:
                    err = "NULL body"
                else:
                    raw = bytes(data) if not isinstance(data, str) else data.encode("utf-8")
                    try:
                        if raw[:2] == b"\x1f\x8b":
                            raw = b"".join(split_gzip_members(raw))
                        text = raw.decode("utf-8")
                    except (ValueError, UnicodeDecodeError) as exc:
                        err = str(exc)
                texts.append(text)
                errs.append(err)
            res = pdf[[f.name for f in passthrough]].copy()
            res[out] = pd.Series(texts, index=pdf.index, dtype="object")
            res[error] = pd.Series(errs, index=pdf.index, dtype="object")
            yield res[names]

    return df.mapInPandas(gen, schema)


def parse_warc_gz(data: bytes, *, http_envelope: bool = False) -> list[dict]:
    """Scan a RECORD-GZIPPED container (one gzip member per record,
    the compression layout the public crawl archives use): each member
    decompresses to exactly one :func:`parse_warc`-shaped record.
    Member boundaries come from the gzip framing itself, so a payload
    containing ``WARC/1.0`` or CRLF runs still cannot confuse the
    scan — and a bad MEMBER (multi-record, bad WARC framing, payload
    failure) quarantines that member alone, because the next member's
    boundary is still trustworthy. Only corrupt/truncated gzip bytes
    stop the scan (the boundary of everything after them is unknown);
    members already decoded before the corruption survive."""
    recs: list[dict] = []
    members = iter_gzip_members(data)
    i = 0
    while True:
        try:
            member = next(members)
        except StopIteration:
            break
        except ValueError as exc:
            recs.append(_empty_rec(i, str(exc)))
            break
        sub = parse_warc(member, http_envelope=http_envelope)
        if len(sub) != 1:
            recs.append(
                _empty_rec(i, f"gzip member {i} holds {len(sub)} records, expected 1")
            )
        else:
            rec = dict(sub[0])
            rec["rec_idx"] = i
            recs.append(rec)
        i += 1
    return recs


def warc_records(
    df: DataFrame,
    data_col: str,
    *,
    compression: str = "none",
    http_envelope: bool = False,
) -> DataFrame:
    """Explode each container row into its records: every column of
    ``df`` except ``data_col`` passes through; :data:`RECORD_FIELDS`
    are appended. ``data_col`` may be BINARY (the honest form) or a
    utf-8 STRING (encoded before scanning). ``compression='gzip'``
    scans record-gzipped containers (:func:`parse_warc_gz` — the
    public crawl archives' member-per-record layout); ``'none'`` scans
    plain concatenations. ``http_envelope=True`` additionally splits
    each response record's HTTP message (status line + headers +
    charset-decoded body — :func:`parse_http_response`) and appends
    :data:`HTTP_FIELDS`, so downstream can gate on ``http_status``.
    A NULL container yields one ``valid=false`` row. Arrow-batched
    ``mapInPandas`` — one task per container partition, the scan
    itself sequential per container by construction (offsets chain
    through Content-Length)."""
    import pandas as pd

    if compression not in ("none", "gzip"):
        raise ValueError(
            f"warc_records: unknown compression {compression!r} (none | gzip)"
        )
    parse = parse_warc_gz if compression == "gzip" else parse_warc
    out_fields = list(RECORD_FIELDS) + (list(HTTP_FIELDS) if http_envelope else [])
    passthrough = [f for f in df.schema.fields if f.name != data_col]
    reserved = {f.name for f in out_fields}
    clash = [f.name for f in passthrough if f.name in reserved]
    if clash:
        raise ValueError(
            f"warc_records: passthrough column(s) {clash} collide with "
            f"record output fields — rename them before scanning"
        )
    names = [f.name for f in passthrough] + [f.name for f in out_fields]
    schema = StructType(list(passthrough) + out_fields)

    pass_names = [f.name for f in passthrough]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: list[dict] = []
            # column-array walk, not iterrows (VERDICT r13 nit): the
            # byte scan dominates, but a Series per container row is
            # avoidable overhead on wide passthrough frames
            pass_cols = [pdf[n].tolist() for n in pass_names]
            for j, data in enumerate(pdf[data_col].tolist()):
                if data is None:
                    recs = [_empty_rec(0, "NULL container")]
                else:
                    if isinstance(data, str):
                        data = data.encode("utf-8")
                    recs = parse(bytes(data), http_envelope=http_envelope)
                base = {n: col[j] for n, col in zip(pass_names, pass_cols)}
                # take ONLY the declared output fields from the record
                # dict — it always carries the http_* keys internally,
                # and a blind merge would clobber a passthrough column
                # of that name when http_envelope is off
                rows.extend(
                    {**base, **{f.name: rec[f.name] for f in out_fields}}
                    for rec in recs
                )
            yield pd.DataFrame(rows, columns=names)[names]

    return df.mapInPandas(gen, schema)
