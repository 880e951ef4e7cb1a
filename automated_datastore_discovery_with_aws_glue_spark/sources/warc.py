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

Malformed input is LOUD, not silent: the first malformed record yields
a ``valid=false`` row carrying the error and the scan of that container
stops (offsets past a corrupt length are untrusted — resyncing risks
emitting attacker-shaped phantom records), so a pipeline can route bad
containers to quarantine and count them.
"""

from __future__ import annotations

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
    StructField("payload", StringType()),
    StructField("valid", BooleanType()),
    StructField("error", StringType()),
)


class _Malformed(Exception):
    pass


def _ascii(b: bytes) -> str:
    return b.decode("utf-8", errors="replace")


def parse_warc(data: bytes) -> list[dict]:
    """Scan one container into record dicts (see module docstring).

    Payload bytes are returned utf-8-decoded in ``payload`` (a decode
    failure is a malformed record — this engine's crawl fixtures are
    text; a binary-payload pipeline would carry the slice as bytes
    instead, same offsets). ``content_length`` is the header's BYTE
    count — multi-byte text makes it differ from ``len(payload)``."""
    recs: list[dict] = []
    pos, idx, n = 0, 0, len(data)

    def err(msg: str) -> dict:
        return {
            "rec_idx": idx,
            "warc_version": None,
            "warc_type": None,
            "target_uri": None,
            "content_length": None,
            "payload": None,
            "valid": False,
            "error": f"offset {pos}: {msg}",
        }

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
            try:
                payload = data[body_start:body_end].decode("utf-8")
            except UnicodeDecodeError as exc:
                raise _Malformed(f"payload is not valid utf-8 ({exc})") from None
            recs.append(
                {
                    "rec_idx": idx,
                    "warc_version": _ascii(version),
                    "warc_type": _ascii(headers.get(b"warc-type", b"")) or None,
                    "target_uri": _ascii(headers.get(b"warc-target-uri", b""))
                    or None,
                    "content_length": clen,
                    "payload": payload,
                    "valid": True,
                    "error": None,
                }
            )
            pos = body_end + 4
            idx += 1
        except _Malformed as exc:
            recs.append(err(str(exc)))
            break
    return recs


def warc_records(df: DataFrame, data_col: str) -> DataFrame:
    """Explode each container row into its records: every column of
    ``df`` except ``data_col`` passes through; :data:`RECORD_FIELDS`
    are appended. ``data_col`` may be BINARY (the honest form) or a
    utf-8 STRING (encoded before scanning). A NULL container yields one
    ``valid=false`` row. Arrow-batched ``mapInPandas`` — one task per
    container partition, the scan itself sequential per container by
    construction (offsets chain through Content-Length)."""
    import pandas as pd

    passthrough = [f for f in df.schema.fields if f.name != data_col]
    names = [f.name for f in passthrough] + [f.name for f in RECORD_FIELDS]
    schema = StructType(list(passthrough) + list(RECORD_FIELDS))

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: list[dict] = []
            for _, row in pdf.iterrows():
                data = row[data_col]
                if data is None:
                    recs = [
                        {
                            "rec_idx": 0,
                            "warc_version": None,
                            "warc_type": None,
                            "target_uri": None,
                            "content_length": None,
                            "payload": None,
                            "valid": False,
                            "error": "NULL container",
                        }
                    ]
                else:
                    if isinstance(data, str):
                        data = data.encode("utf-8")
                    recs = parse_warc(bytes(data))
                base = {f.name: row[f.name] for f in passthrough}
                rows.extend({**base, **rec} for rec in recs)
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(gen, schema)
