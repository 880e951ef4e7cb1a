"""WARC-shape container source (`sources/warc.py`, r12; r13 adds the
HTTP envelope layer): byte-offset record scanning, Content-Length byte
math on multi-byte payloads, and LOUD malformed handling at the
granularity the framing allows — FRAMING failures stop the container
scan (offsets untrusted, no resync), PAYLOAD failures (HTTP envelope,
charset, utf-8, bad gzip member) quarantine only their own record and
the scan continues."""

from __future__ import annotations

import pyspark.sql.functions as F

from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_warc, warc_records


def _rec(uri: str, payload: str, *, clen: int | None = None, headers: str = "") -> bytes:
    body = payload.encode("utf-8")
    n = len(body) if clen is None else clen
    return (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
        f"{headers}Content-Length: {n}\r\n\r\n"
    ).encode("utf-8") + body + b"\r\n\r\n"


def test_parse_warc_multi_record_and_byte_lengths():
    # the second payload contains CRLFCRLF and a fake version line —
    # only Content-Length arithmetic survives that; the third is
    # multi-byte (bytes != chars)
    payloads = ["plain text", "tricky\r\n\r\nWARC/1.0\r\nnot a record", "Café—漢字"]
    data = b"".join(_rec(f"urn:doc:{i}", p) for i, p in enumerate(payloads))
    recs = parse_warc(data)
    assert [r["valid"] for r in recs] == [True, True, True]
    assert [r["payload"] for r in recs] == payloads
    assert [r["rec_idx"] for r in recs] == [0, 1, 2]
    assert [r["target_uri"] for r in recs] == [f"urn:doc:{i}" for i in range(3)]
    assert recs[2]["content_length"] == len(payloads[2].encode("utf-8"))
    assert recs[2]["content_length"] != len(payloads[2])
    assert all(r["warc_type"] == "response" and r["warc_version"] == "1.0" for r in recs)


def test_parse_warc_malformed_is_loud_and_stops():
    good = _rec("urn:doc:0", "ok")
    # truncated payload: Content-Length overruns the container
    recs = parse_warc(good + _rec("urn:doc:1", "short", clen=9999))
    assert [r["valid"] for r in recs] == [True, False]
    assert "truncated" in recs[1]["error"]
    # non-numeric Content-Length
    bad_len = b"WARC/1.0\r\nContent-Length: abc\r\n\r\nx\r\n\r\n"
    recs = parse_warc(good + bad_len)
    assert [r["valid"] for r in recs] == [True, False]
    assert "Content-Length" in recs[1]["error"]
    # wrong length -> terminator check fails (off-by-one mis-slice)
    recs = parse_warc(_rec("urn:doc:0", "abcdef", clen=5))
    assert recs[0]["valid"] is False and "terminator" in recs[0]["error"]
    # garbage between records: stop, do NOT resync onto the later record
    recs = parse_warc(good + b"GARBAGE" + good)
    assert [r["valid"] for r in recs] == [True, False]
    assert "WARC/" in recs[1]["error"]
    # malformed header line
    recs = parse_warc(b"WARC/1.0\r\nno-colon-here\r\n\r\n")
    assert recs[0]["valid"] is False and "header" in recs[0]["error"]
    # invalid utf-8 payload
    raw = b"WARC/1.0\r\nContent-Length: 2\r\n\r\n\xff\xfe\r\n\r\n"
    recs = parse_warc(raw)
    assert recs[0]["valid"] is False and "utf-8" in recs[0]["error"]
    # empty container -> no records
    assert parse_warc(b"") == []


def test_warc_records_spark_passthrough_and_null(spark):
    rows = [
        (1, bytearray(_rec("urn:doc:10", "hello world") + _rec("urn:doc:11", "zwei"))),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "cid int, wdata binary")
    got = warc_records(df, "wdata").collect()
    by_cid = {}
    for r in got:
        by_cid.setdefault(r["cid"], []).append(r)
    assert [r["payload"] for r in sorted(by_cid[1], key=lambda r: r["rec_idx"])] == [
        "hello world",
        "zwei",
    ]
    assert by_cid[2][0]["valid"] is False and "NULL" in by_cid[2][0]["error"]
    # string containers are encoded before scanning
    sdf = spark.createDataFrame(
        [(3, _rec("urn:doc:12", "Café—漢字").decode("utf-8"))], "cid int, wdata string"
    )
    [r] = warc_records(sdf, "wdata").collect()
    assert r["valid"] and r["payload"] == "Café—漢字"
    assert r["content_length"] == len("Café—漢字".encode("utf-8"))


def test_parse_warc_gz_member_per_record():
    import gzip

    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_warc_gz

    payloads = ["first body", "tricky\r\n\r\nWARC/1.0\r\nfake", "Café—漢字"]
    data = b"".join(
        gzip.compress(_rec(f"urn:doc:{i}", p)) for i, p in enumerate(payloads)
    )
    recs = parse_warc_gz(data)
    assert [r["valid"] for r in recs] == [True, True, True]
    assert [r["payload"] for r in recs] == payloads
    assert [r["rec_idx"] for r in recs] == [0, 1, 2]
    # empty container
    assert parse_warc_gz(b"") == []


def test_parse_warc_gz_malformed_is_loud():
    import gzip

    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_warc_gz

    good = gzip.compress(_rec("urn:doc:0", "ok"))
    # truncated second member: the good member BEFORE it survives (its
    # boundary was already proven), the corruption itself is loud
    recs = parse_warc_gz(good + gzip.compress(_rec("urn:doc:1", "late"))[:-5])
    assert [r["valid"] for r in recs] == [True, False]
    assert "truncated" in recs[1]["error"] or "corrupt" in recs[1]["error"]
    # plain (uncompressed) bytes are not gzip
    recs = parse_warc_gz(_rec("urn:doc:0", "ok"))
    assert recs[0]["valid"] is False
    # a member holding TWO records violates the seekable convention
    two = gzip.compress(_rec("urn:doc:0", "a") + _rec("urn:doc:1", "b"))
    recs = parse_warc_gz(two)
    assert recs[0]["valid"] is False and "expected 1" in recs[0]["error"]
    # a malformed record INSIDE a good member quarantines that member
    # (boundaries are gzip-framed, so the scan can continue past it)
    recs = parse_warc_gz(
        good
        + gzip.compress(b"WARC/1.0\r\nContent-Length: abc\r\n\r\nx\r\n\r\n")
        + gzip.compress(_rec("urn:doc:2", "after"))
    )
    assert [r["valid"] for r in recs] == [True, False, True]
    assert recs[2]["payload"] == "after"


def test_warc_records_gzip_mode(spark):
    import gzip

    rows = [
        (1, bytearray(gzip.compress(_rec("urn:doc:1", "hello")) + gzip.compress(_rec("urn:doc:2", "zwei")))),
    ]
    df = spark.createDataFrame(rows, "cid int, wdata binary")
    got = sorted(
        (r["rec_idx"], r["payload"], r["valid"])
        for r in warc_records(df, "wdata", compression="gzip").collect()
    )
    assert got == [(0, "hello", True), (1, "zwei", True)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compression"):
        warc_records(df, "wdata", compression="lz4")


def test_warc_records_passthrough_collision_raises(spark):
    # a passthrough column named like a RECORD_FIELDS output would be
    # silently overwritten by the record dict merge — must refuse loudly
    import pytest

    df = spark.createDataFrame(
        [(1, "x", bytearray(_rec("urn:doc:1", "body")))],
        "cid int, payload string, wdata binary",
    )
    with pytest.raises(ValueError, match="payload"):
        warc_records(df, "wdata")


def _http_rec(uri: str, head: bytes, body: bytes) -> bytes:
    msg = head + b"\r\n\r\n" + body
    return (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(msg)}\r\n\r\n"
    ).encode("utf-8") + msg + b"\r\n\r\n"


def test_parse_warc_http_envelope_charsets_and_gate_fields():
    recs = parse_warc(
        _http_rec("urn:a", b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8", "Café漢".encode("utf-8"))
        + _http_rec("urn:b", b"HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=ISO-8859-1", b"caf\xe9")
        + _http_rec("urn:c", b'HTTP/1.1 200 OK\r\nContent-Type: text/html; charset="Windows-1252"', b"a\x80b")
        + _http_rec("urn:d", b"HTTP/1.1 200 OK\r\nContent-Type: text/html", b"\xef\xbb\xbfbom text")
        + _http_rec("urn:e", b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html; charset=utf-8", b"gone")
        + _http_rec("urn:f", b"HTTP/1.1 301 Moved Permanently\r\nLocation: http://x/", b"moved \x93q\x94"),
        http_envelope=True,
    )
    assert [r["valid"] for r in recs] == [True] * 6
    assert [r["http_status"] for r in recs] == [200, 200, 200, 200, 404, 301]
    assert [r["payload"] for r in recs] == [
        "Café漢", "café", "a€b", "bom text", "gone", "moved “q”"
    ]
    assert [r["http_charset"] for r in recs] == [
        "utf-8", "latin-1", "cp1252", "utf-8", "utf-8", "cp1252"
    ]
    assert [r["http_charset_src"] for r in recs] == [
        "header", "header", "header", "bom", "header", "default"
    ]
    assert recs[1]["http_content_type"] == "text/html"
    assert recs[5]["http_content_type"] is None
    # content_length is the whole HTTP MESSAGE in bytes, not the body
    assert recs[0]["content_length"] > len("Café漢")


def test_parse_warc_http_envelope_malformed_is_loud():
    # each malformation yields valid=false + stop, never a silent decode
    cases = [
        (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=x-mystery", b"x", "charset"),
        (b"HTP/1.1 200 OK", b"x", "status line"),
        (b"HTTP/1.1 200 OK\r\nNoColon", b"x", "header line"),
        (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8", b"\xff\xfe", "decode"),
        (b"HTTP/1.1 200 OK", b"\x81", "decode"),  # cp1252-undefined byte
    ]
    for head, body, token in cases:
        recs = parse_warc(_http_rec("urn:x", head, body), http_envelope=True)
        assert recs[0]["valid"] is False and token in recs[0]["error"], recs[0]
    # an HTTP message with no header terminator at all
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 10\r\n\r\n"
        b"0123456789\r\n\r\n"
    )
    recs = parse_warc(raw, http_envelope=True)
    assert recs[0]["valid"] is False and "terminator" in recs[0]["error"]


def test_parse_warc_http_envelope_non_response_passthrough():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"software!\r\n\r\n"
    )
    recs = parse_warc(info, http_envelope=True)
    assert recs[0]["valid"] and recs[0]["payload"] == "software!"
    assert recs[0]["http_status"] is None


def test_warc_records_http_envelope_spark_and_gzip(spark):
    import gzip

    recs_plain = (
        _http_rec("urn:doc:1", b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1", b"caf\xe9 body"),
        _http_rec("urn:doc:2", b"HTTP/1.1 404 Not Found", b"nope"),
    )
    gz = b"".join(gzip.compress(r) for r in recs_plain)
    df = spark.createDataFrame([(1, bytearray(gz))], "cid int, wdata binary")
    got = sorted(
        warc_records(df, "wdata", compression="gzip", http_envelope=True).collect(),
        key=lambda r: r["rec_idx"],
    )
    assert [r["http_status"] for r in got] == [200, 404]
    assert got[0]["payload"] == "café body"
    assert got[0]["http_charset"] == "latin-1"
    assert got[1]["http_charset_src"] == "default"


def test_fixture_documents_text_is_ascii(spark):
    # the src_warc_http fixture couples to documents.text TWICE: the
    # latin-1/cp1252 arms F.encode the wrapped page as ISO-8859-1
    # (needs <= U+00FF), and the CHUNKED arm declares chunk sizes from
    # F.length() CHARS against a utf-8-encoded body (needs pure ASCII,
    # the stronger bound — 'é' is latin-1-encodable yet would desync
    # the chunk framing). Pin the STRONGER invariant loudly here so a
    # regenerated fixture fails at the cause, not in a far-off hash.
    from tests.conftest import SF_DIR

    import pyspark.sql.functions as F

    n = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(~F.col("text").rlike(r"^[\x00-\x7F]*$"))
        .count()
    )
    assert n == 0, "documents.text gained non-ASCII chars"

def test_parse_warc_http_payload_failure_quarantines_record_only():
    # an unknown-charset page must not hide the good records behind
    # it — the WARC framing is validated, so the scan continues
    recs = parse_warc(
        _http_rec("urn:a", b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=x-mystery", b"x")
        + _http_rec("urn:b", b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8", b"good page"),
        http_envelope=True,
    )
    assert [r["valid"] for r in recs] == [False, True]
    assert "charset" in recs[0]["error"] and recs[0]["target_uri"] == "urn:a"
    assert recs[1]["payload"] == "good page"
    # same record-local quarantine for a non-envelope utf-8 failure
    bad = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\n"
        b"\xff\xfe\r\n\r\n"
    )
    recs = parse_warc(bad + _rec("urn:d", "fine"))
    assert [r["valid"] for r in recs] == [False, True]
    assert "utf-8" in recs[0]["error"] and recs[1]["payload"] == "fine"


def test_parse_warc_gz_member_failures_do_not_hide_later_members():
    import gzip

    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_warc_gz

    good1 = gzip.compress(_rec("urn:doc:0", "first"))
    multi = gzip.compress(_rec("urn:doc:x", "a") + _rec("urn:doc:y", "b"))
    good2 = gzip.compress(_rec("urn:doc:2", "third"))
    recs = parse_warc_gz(good1 + multi + good2)
    assert [r["valid"] for r in recs] == [True, False, True]
    assert recs[2]["payload"] == "third"
    # gzip-stream corruption still stops (boundaries unknown past it),
    # but members BEFORE it survive
    recs = parse_warc_gz(good1 + b"\x1f\x8b garbage")
    assert [r["valid"] for r in recs] == [True, False]
    assert recs[0]["payload"] == "first"


def test_parse_warc_http_chunked_and_content_encoding():
    import gzip

    # two-chunk body, sizes in hex (mixed case), extension ignored
    chunked = b"10;ext=1\r\n0123456789abcdef\r\n3\r\nxyz\r\n0\r\n\r\n"
    recs = parse_warc(
        _http_rec(
            "urn:a",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Transfer-Encoding: chunked",
            chunked,
        ),
        http_envelope=True,
    )
    assert recs[0]["valid"] and recs[0]["payload"] == "0123456789abcdefxyz"
    # chunked + gzip content-encoding peel in wire order, then charset
    gz = gzip.compress("café chunked gz".encode("utf-8"))
    ch = hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    recs = parse_warc(
        _http_rec(
            "urn:b",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip",
            ch,
        ),
        http_envelope=True,
    )
    assert recs[0]["valid"] and recs[0]["payload"] == "café chunked gz"
    # malformations are loud and record-local
    for head, body, token in [
        (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", b"zz\r\nx\r\n0\r\n\r\n", "chunk-size"),
        (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked", b"10\r\nshort", "truncated"),
        (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: deflate", b"x", "transfer-encoding"),
        (b"HTTP/1.1 200 OK\r\nContent-Encoding: br", b"x", "content-encoding"),
        (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip", b"not gzip", "gzip"),
    ]:
        recs = parse_warc(
            _http_rec("urn:x", head, body) + _http_rec("urn:ok", b"HTTP/1.1 200 OK", b"fine"),
            http_envelope=True,
        )
        assert [r["valid"] for r in recs] == [False, True], token
        assert token in recs[0]["error"], recs[0]["error"]


def test_parse_warc_http_binary_mime_withheld_from_text_lane():
    # an image body must NOT be charset-decoded (cp1252 would "succeed"
    # and mint mojibake) — the record stays valid, payload is withheld
    png = b"\x89PNG\r\n\x1a\n" + bytes(range(0xA0, 0xC0))
    recs = parse_warc(
        _http_rec("urn:img", b"HTTP/1.1 200 OK\r\nContent-Type: image/png", png)
        + _http_rec("urn:txt", b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8", b"words"),
        http_envelope=True,
    )
    assert recs[0]["valid"] and recs[0]["payload"] is None
    assert recs[0]["http_content_type"] == "image/png"
    assert recs[0]["http_charset"] is None and recs[0]["http_charset_src"] is None
    assert recs[1]["payload"] == "words"
    # text-like application/* mimes still decode
    recs = parse_warc(
        _http_rec("urn:j", b'HTTP/1.1 200 OK\r\nContent-Type: application/json; charset=utf-8', b'{"a": 1}'),
        http_envelope=True,
    )
    assert recs[0]["payload"] == '{"a": 1}'


def test_parse_warc_http_meta_charset_prescan():
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    def msg(head: bytes, body: bytes) -> bytes:
        return head + b"\r\n\r\n" + body

    plain_html = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
    utf8_body = '<meta charset="UTF-8"><p>Café—漢字</p>'.encode("utf-8")
    # meta drives the decode when header has no charset and no BOM
    assert parse_http_response(msg(plain_html, utf8_body))[2:5] == (
        "utf-8", "meta", '<meta charset="UTF-8"><p>Café—漢字</p>'
    )
    # the http-equiv form works through the same spine
    he = b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">caf\xe9'
    assert parse_http_response(msg(plain_html, he))[2:4] == ("latin-1", "meta")
    # header charset BEATS a contradicting meta
    hdr = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1"
    got = parse_http_response(msg(hdr, b'<meta charset="utf-8">caf\xe9'))
    assert got[2:4] == ("latin-1", "header") and got[4].endswith("café")
    # a BOM BEATS meta
    got = parse_http_response(msg(plain_html, b"\xef\xbb\xbf" + b'<meta charset="windows-1252">x'))
    assert got[2:4] == ("utf-8", "bom")
    # unknown meta labels are IGNORED (browser behavior), not loud
    got = parse_http_response(msg(plain_html, b'<meta charset="x-mystery">plain ascii'))
    assert got[2:4] == ("cp1252", "default")
    # a meta label claiming utf-16 decodes as utf-8 (the WHATWG rule:
    # a tag readable enough to find is not inside a utf-16 body)
    got = parse_http_response(msg(plain_html, '<meta charset="utf-16">Café'.encode("utf-8")))
    assert got[2:4] == ("utf-8", "meta") and got[4].endswith("Café")
    # a meta tag outside the 1024-byte prescan window is not seen
    far = b" " * 1100 + b'<meta charset="utf-8">'
    assert parse_http_response(msg(plain_html, far))[2:4] == ("cp1252", "default")


# -- r14: HTTP/2 status lines, Location, charset families, deflate, ----------
# -- undeclared-binary sniff, payload digests / revisit records     ----------


def test_parse_warc_http2_status_lines():
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    # HTTP/2 and HTTP/3 captures write NO minor version — real archives
    # contain them and a reader must not wholesale-drop those records
    for version in (b"HTTP/2", b"HTTP/3", b"HTTP/1.1", b"HTTP/1.0"):
        got = parse_http_response(
            version + b" 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\nok"
        )
        assert got[0] == 200 and got[4] == "ok", version
    # a reasonless status line is fine; garbage versions stay loud
    assert parse_http_response(b"HTTP/2 404\r\n\r\n")[0] == 404
    recs = parse_warc(_http_rec("urn:x", b"HTTP/x 200 OK", b"y"), http_envelope=True)
    assert recs[0]["valid"] is False and "status line" in recs[0]["error"]


def test_parse_warc_http_location_surfaced():
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    # absolute, relative, and protocol-relative Location forms all
    # surface AS WRITTEN (resolution is the frontier query's job)
    for loc in (b"https://example.org/new", b"/moved/here", b"//cdn.example/x"):
        got = parse_http_response(
            b"HTTP/1.1 301 Moved Permanently\r\nLocation: " + loc
            + b"\r\nContent-Type: text/html; charset=utf-8\r\n\r\nstub"
        )
        assert got[0] == 301 and got[5] == loc.decode("ascii")
    # absent -> None; present on a 200 it still surfaces (data is data)
    assert parse_http_response(b"HTTP/1.1 200 OK\r\n\r\nhi")[5] is None
    got = parse_http_response(b"HTTP/1.1 200 OK\r\nLocation: /odd\r\n\r\nhi")
    assert got[5] == "/odd"
    # binary records keep their Location: the header block parsed
    # before the mime gate withheld the body
    got = parse_http_response(
        b"HTTP/1.1 302 Found\r\nLocation: /img\r\nContent-Type: image/png\r\n\r\n\x89PNG"
    )
    assert got[1] == "image/png" and got[4] is None and got[5] == "/img"
    # and it rides warc_records rows end-to-end
    recs = parse_warc(
        _http_rec("urn:r", b"HTTP/1.1 302 Found\r\nLocation: /next?p=1", b"go"),
        http_envelope=True,
    )
    assert recs[0]["http_location"] == "/next?p=1" and recs[0]["http_status"] == 302


def test_parse_warc_http_charset_families():
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    text = "text 漢字 テスト 한글 中文 Ελληνικά Привет"
    cases = [
        ("shift_jis", "cp932", "text 漢字 テスト"),
        ("gb2312", "gbk", "text 漢字 中文"),
        ("gbk", "gbk", "text 漢字 中文"),
        ("euc-kr", "cp949", "text 한글"),
        ("big5", "big5", "text 中文"),
        ("euc-jp", "euc_jp", "text 漢字 テスト"),
        ("iso-8859-7", "iso8859-7", "text Ελληνικά"),
        ("koi8-r", "koi8-r", "text Привет"),
        ("windows-1251", "cp1251", "text Привет"),
        ("iso-8859-2", "iso8859-2", "text čšž"),
        ("iso-8859-15", "iso8859-15", "text €uro"),
    ]
    for label, codec, sample in cases:
        body = sample.encode(codec)
        got = parse_http_response(
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset={label}\r\n\r\n".encode()
            + body
        )
        assert got[4] == sample, (label, got[4])
        assert got[2] == codec and got[3] == "header", label
    # the declared byte count differs from the char count on multibyte
    assert len("漢字".encode("cp932")) == 4 and len("漢字") == 2


def test_parse_warc_http_utf16_header_declared():
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    text = "utf16 Café 漢字"

    def hdr(label: str) -> bytes:
        return f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset={label}\r\n\r\n".encode()

    # endian-explicit labels, with and without their matching BOM
    # (a matching BOM is a signature and must be CONSUMED, not kept
    # as a U+FEFF in the corpus text)
    assert parse_http_response(hdr("utf-16le") + text.encode("utf-16-le"))[4] == text
    assert (
        parse_http_response(hdr("utf-16le") + b"\xff\xfe" + text.encode("utf-16-le"))[4]
        == text
    )
    assert parse_http_response(hdr("utf-16be") + text.encode("utf-16-be"))[4] == text
    assert (
        parse_http_response(hdr("utf-16be") + b"\xfe\xff" + text.encode("utf-16-be"))[4]
        == text
    )
    # the bare label: BOM decides when present, LE assumed otherwise
    # (the WHATWG read — NOT the platform's native order)
    assert parse_http_response(hdr("utf-16") + b"\xfe\xff" + text.encode("utf-16-be"))[4] == text
    assert parse_http_response(hdr("utf-16") + text.encode("utf-16-le"))[4] == text
    # an odd byte count is loud, never a silent truncation
    recs = parse_warc(
        _http_rec("urn:x", b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-16le", b"a\x00b"),
        http_envelope=True,
    )
    assert recs[0]["valid"] is False and "decode" in recs[0]["error"]


def test_parse_warc_http_deflate_and_xgzip():
    import gzip
    import zlib

    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    text = "deflated Café body"

    def msg(ce: str, body: bytes) -> bytes:
        return (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            f"Content-Encoding: {ce}\r\n\r\n"
        ).encode() + body

    # RFC-correct zlib-wrapped deflate
    assert parse_http_response(msg("deflate", zlib.compress(text.encode())))[4] == text
    # bare deflate (no zlib wrapper) — the server bug browsers tolerate
    raw = zlib.compressobj(wbits=-15)
    bare = raw.compress(text.encode()) + raw.flush()
    assert parse_http_response(msg("deflate", bare))[4] == text
    # x-gzip is a legacy alias of gzip
    assert parse_http_response(msg("x-gzip", gzip.compress(text.encode())))[4] == text
    # corrupt deflate is loud and record-local
    recs = parse_warc(
        _http_rec("urn:x", b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate", b"not deflate")
        + _http_rec("urn:ok", b"HTTP/1.1 200 OK", b"fine"),
        http_envelope=True,
    )
    assert [r["valid"] for r in recs] == [False, True]
    assert "deflate" in recs[0]["error"]


def test_parse_warc_http_undeclared_binary_sniffed():
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    head = b"HTTP/1.1 200 OK\r\nServer: fixture\r\n\r\n"  # no Content-Type
    # known magics and NUL bytes withhold the body like declared-binary
    for body in (
        b"\x89PNG\r\n\x1a\n" + bytes(range(0xA0, 0xC0)),
        b"GIF89a...",
        b"\xff\xd8\xff\xe0jpeg",
        b"%PDF-1.7 ...",
        b"PK\x03\x04zipzip",
        b"plain text then a \x00 NUL",
    ):
        got = parse_http_response(head + body)
        assert got[1] is None and got[4] is None and got[3] is None, body[:8]
    # headerless TEXT still decodes under the browser default
    got = parse_http_response(head + b"legacy caf\xe9 page")
    assert got[4] == "legacy café page" and got[3] == "default"
    # a BOM saves an undeclared utf-16 body from its own NULs (BOM is
    # checked BEFORE the sniff)
    got = parse_http_response(head + "bom text".encode("utf-16"))
    assert got[4] == "bom text" and got[3] == "bom"
    # a DECLARED text mime is an operator assertion: never sniffed
    got = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=latin-1\r\n\r\nnul \x00 kept"
    )
    assert got[4] == "nul \x00 kept"


def test_parse_warc_payload_digest_and_revisit():
    # response carries WARC-Payload-Digest; a revisit record points at
    # the SAME digest with no body — digest-keyed dedup needs no decode
    body = "the original page body"
    digest = "sha1:EXAMPLEDIGESTBASE32VALUE"
    resp = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: urn:doc:0\r\n"
        f"WARC-Payload-Digest: {digest}\r\nContent-Length: {len(body)}\r\n\r\n"
        f"{body}\r\n\r\n"
    ).encode()
    revisit = (
        f"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: urn:doc:9\r\n"
        f"WARC-Payload-Digest: {digest}\r\nContent-Length: 0\r\n\r\n"
        f"\r\n\r\n"
    ).encode()
    recs = parse_warc(resp + revisit)
    assert [r["warc_type"] for r in recs] == ["response", "revisit"]
    assert [r["payload_digest"] for r in recs] == [digest, digest]
    assert recs[0]["payload"] == body and recs[1]["payload"] == ""
    # no digest header -> NULL, and the column rides warc_records
    recs = parse_warc(_rec("urn:plain", "x"))
    assert recs[0]["payload_digest"] is None


def test_warc_records_digest_and_location_columns(spark):
    data = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u:1\r\n"
        b"WARC-Payload-Digest: sha1:AAA\r\nContent-Length: 52\r\n\r\n"
        b"HTTP/2 301 Moved\r\nLocation: /n\r\n\r\nredirect stub body"
        b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: u:2\r\n"
        b"WARC-Payload-Digest: sha1:AAA\r\nContent-Length: 0\r\n\r\n"
        b"\r\n\r\n"
    )
    df = spark.createDataFrame([(1, bytearray(data))], "cid int, wdata binary")
    got = sorted(
        warc_records(df, "wdata", http_envelope=True).collect(),
        key=lambda r: r["rec_idx"],
    )
    assert [r["payload_digest"] for r in got] == ["sha1:AAA", "sha1:AAA"]
    assert got[0]["http_location"] == "/n" and got[0]["http_status"] == 301
    assert got[1]["warc_type"] == "revisit" and got[1]["http_status"] is None


def test_parse_warc_http_caching_validators():
    from automated_datastore_discovery_with_aws_glue_spark.sources.warc import parse_http_response

    got = parse_http_response(
        b'HTTP/1.1 200 OK\r\nETag: "v1-abc"\r\n'
        b"Last-Modified: Tue, 20 Feb 2024 10:00:00 GMT\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n\r\nbody"
    )
    assert got[6] == '"v1-abc"'
    assert got[7] == "Tue, 20 Feb 2024 10:00:00 GMT"
    # weak ETags surface as written; absent validators are None
    got = parse_http_response(b'HTTP/1.1 200 OK\r\nETag: W/"weak"\r\n\r\nx')
    assert got[6] == 'W/"weak"' and got[7] is None
    assert parse_http_response(b"HTTP/1.1 200 OK\r\n\r\nx")[6:8] == (None, None)
    # validators survive the binary-mime gate (they live in the header
    # block, parsed before the body is withheld)
    got = parse_http_response(
        b'HTTP/1.1 200 OK\r\nETag: "img9"\r\nContent-Type: image/png\r\n\r\n\x89PNG'
    )
    assert got[4] is None and got[6] == '"img9"'
    # and they ride warc_records rows
    recs = parse_warc(
        _http_rec(
            "urn:v",
            b'HTTP/1.1 200 OK\r\nETag: "r7"\r\nLast-Modified: Mon, 01 Jan 2024 00:00:00 GMT',
            b"page",
        ),
        http_envelope=True,
    )
    assert recs[0]["http_etag"] == '"r7"'
    assert recs[0]["http_last_modified"] == "Mon, 01 Jan 2024 00:00:00 GMT"
