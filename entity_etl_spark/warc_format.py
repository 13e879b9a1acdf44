"""WARC/WET (ISO 28500) text-corpus container files, pure Python.

The canonical 100 TB text-corpus source is CommonCrawl, distributed as
WARC files and their text-extraction twins (WET: ``conversion``
records). The framing is public and small — a record is one
``WARC/1.0`` version line, CRLF-terminated named headers
(``Content-Length`` gives the exact payload size, so payloads may
contain anything including blank lines), one blank line, the payload,
and a two-CRLF trailer. CommonCrawl compresses each record as its OWN
gzip member, concatenated — a reader can split work at member
boundaries and a streaming consumer never holds more than one record.
This module implements that framing with stdlib ``gzip``/``zlib`` only
and exposes it Spark-first, the :mod:`avro_format` /
:mod:`rest_datasource` precedent:

- ``spark.read.format("warc_py").load(path)`` — one ``InputPartition``
  per ``.warc.gz`` file (executor-parallel across files, the same
  parallelism contract CommonCrawl jobs use: ~64k WET files per
  crawl). Fixed schema :data:`WET_SCHEMA`; every record is a row
  (``warcinfo`` included) so the query layer filters on ``warc_type``.
- ``df.write.format("warc_py").save(path)`` — input columns
  ``(target_uri, content_language, payload)``; one ``.warc.gz`` per
  task partition led by a ``warcinfo`` record, each record its own
  gzip member, temp-staged and renamed at job commit (fail-fast: a
  failed job leaves only ``.tmp`` litter).

Determinism (oracle-pairing contract): ``WARC-Record-ID`` is
``uuid5(NAMESPACE_URL, target_uri)`` and ``WARC-Date`` is a fixed
constant, so byte output is a pure function of the rows and an oracle
can restate every read-back value from the source table.

Scale notes: the codec is per-record Python at the source/sink
boundary (it IS the format implementation, not an expression in a hot
path); files stream record-at-a-time in both directions and blobs
never shuffle — downstream sees columns, not containers.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
import zlib
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_VERSION = b"WARC/1.0"
# Fixed so container bytes are a pure function of the rows (an oracle
# restates read-back values from the source table; a wall-clock date
# would be unverifiable). A production deployment would pass the crawl
# timestamp through instead.
_FIXED_DATE = "2026-01-01T00:00:00Z"
_SOFTWARE = "entity-etl-spark warc_py"

WET_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_language", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)

WRITE_COLUMNS = ("target_uri", "content_language", "payload")


# --------------------------------------------------------------- encoding

def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"".join(
        [_VERSION, b"\r\n"]
        + [f"{k}: {v}\r\n".encode("utf-8") for k, v in headers]
        + [f"Content-Length: {len(payload)}\r\n\r\n".encode("ascii")]
    )
    return head + payload + b"\r\n\r\n"


def record_id_for(target_uri: str) -> str:
    """Deterministic ISO 28500 record id: ``<urn:uuid:...>`` from the URI."""
    return f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, target_uri)}>"


def _warcinfo_bytes(filename: str) -> bytes:
    body = (
        f"software: {_SOFTWARE}\r\nformat: WARC File Format 1.0\r\n"
    ).encode("utf-8")
    return _record_bytes(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", record_id_for(f"warcinfo:{filename}")),
            ("WARC-Date", _FIXED_DATE),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def _gzip_member(data: bytes) -> bytes:
    # mtime=0: reproducible bytes (gzip headers embed wall-clock otherwise)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


def write_wet_file(
    path: str,
    rows: Iterator[tuple],
    *,
    filename: str | None = None,
) -> int:
    """Write ``(target_uri, content_language, payload)`` rows as WET
    ``conversion`` records, one gzip member per record (the CommonCrawl
    layout). Returns the record count (excl. the leading warcinfo)."""
    name = filename or os.path.basename(path)
    n = 0
    with open(path, "wb") as fh:
        fh.write(_gzip_member(_warcinfo_bytes(name)))
        for target_uri, language, payload in rows:
            body = ("" if payload is None else payload).encode("utf-8")
            headers = [
                ("WARC-Type", "conversion"),
                ("WARC-Record-ID", record_id_for(target_uri)),
                ("WARC-Date", _FIXED_DATE),
                ("WARC-Target-URI", target_uri),
            ]
            if language is not None:
                # the CommonCrawl WET language annotation header
                headers.append(
                    ("WARC-Identified-Content-Language", language)
                )
            headers.append(("Content-Type", "text/plain"))
            fh.write(_gzip_member(_record_bytes(headers, body)))
            n += 1
    return n


# --------------------------------------------------------------- decoding

def _parse_records(stream: io.BufferedIOBase) -> Iterator[tuple]:
    """Yield :data:`WET_SCHEMA` tuples from a decompressed WARC stream.

    ``Content-Length`` frames the payload exactly, so payloads may
    contain blank lines or even ``WARC/`` strings; the inter-record
    blank lines are skipped by the version-line scan."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if hline in (b"\r\n", b"\n", b""):
                break
            key, _, val = hline.decode("utf-8").partition(":")
            headers[key.strip().lower()] = val.strip()
        if "content-length" not in headers:
            raise ValueError("truncated or malformed WARC record headers")
        length = int(headers["content-length"])
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield (
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-identified-content-language"),
            headers.get("content-type"),
            length,
            payload.decode("utf-8"),
        )


def read_wet_file(path: str) -> Iterator[tuple]:
    """Stream one ``.warc.gz`` file's records. ``gzip.GzipFile`` reads
    concatenated members transparently, so per-record-member
    (CommonCrawl) and single-member files both parse."""
    with gzip.open(path, "rb") as gz:
        yield from _parse_records(io.BufferedReader(gz))


def count_gzip_members(path: str) -> int:
    """Diagnostic: number of gzip members (CommonCrawl layout has one
    per record + 1 warcinfo). Walks member boundaries with zlib."""
    data = open(path, "rb").read()
    n = 0
    while data:
        d = zlib.decompressobj(31)
        d.decompress(data)
        data = d.unused_data
        n += 1
    return n


# --------------------------------------------------------------- datasource

def _warc_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".warc.gz")
    )


class WarcFilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class WarcPyReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        files = _warc_files(self.options["path"])
        if not files:
            raise ValueError(f"no .warc.gz files under {self.options['path']}")
        return [WarcFilePartition(f) for f in files]

    def read(self, partition: WarcFilePartition) -> Iterator[tuple]:
        yield from read_wet_file(partition.file_path)


class WarcCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, final_file: str):
        self.tmp_file = tmp_file
        self.final_file = final_file


RESPONSE_WRITE_COLUMNS = ("target_uri", "status", "content_type", "payload")


class WarcPyWriter(DataSourceWriter):
    """One ``.warc.gz`` per task partition, temp-staged then renamed at
    job commit; overwrite removes pre-existing files only after every
    task staged (the :class:`avro_format.AvroPyWriter` contract).
    ``option("record_type", "response")`` switches from WET
    ``conversion`` records to raw-crawl ``response`` records (HTTP
    message payloads, :func:`write_response_file`)."""

    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        self.record_type = options.get("record_type", "conversion")
        expected = (
            RESPONSE_WRITE_COLUMNS
            if self.record_type == "response"
            else WRITE_COLUMNS
        )
        if tuple(schema.fieldNames()) != expected:
            raise ValueError(
                f"warc_py writer needs columns {expected} for "
                f"record_type={self.record_type}, "
                f"got {tuple(schema.fieldNames())}"
            )
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> WarcCommit:
        os.makedirs(self.path, exist_ok=True)
        stem = f"part-{uuid.uuid4().hex}"
        tmp = os.path.join(self.path, stem + ".tmp")
        final = os.path.join(self.path, stem + ".warc.gz")
        writer = (
            write_response_file
            if self.record_type == "response"
            else write_wet_file
        )
        writer(
            tmp,
            (tuple(r) for r in rows),
            filename=os.path.basename(final),
        )
        return WarcCommit(tmp, final)

    def commit(self, messages) -> None:
        if self.overwrite:
            keep = {m.final_file for m in messages}
            for old in _warc_files(self.path):
                if old not in keep:
                    os.remove(old)
        for m in messages:
            os.rename(m.tmp_file, m.final_file)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_file)
            except OSError:
                pass


class WarcPyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc_py"

    def schema(self) -> T.StructType:
        return WET_SCHEMA

    def reader(self, schema: T.StructType) -> WarcPyReader:
        return WarcPyReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> WarcPyWriter:
        return WarcPyWriter(schema, self.options, overwrite)


def register_warc(spark) -> None:
    spark.dataSource.register(WarcPyDataSource)


# ------------------------------------------------- response records / WET

# The raw-crawl side of the format: a WARC ``response`` record's payload
# is the full HTTP message (status line, CRLF headers, blank line, body
# — RFC 9112 framing inside ISO 28500 framing). The CommonCrawl WET
# files the engine already reads/writes are DERIVED from these by
# exactly the extraction below; implementing it closes the loop so raw
# crawl archives are ingestible, not just the pre-extracted text.

def write_response_file(
    path: str,
    rows: Iterator[tuple],
    *,
    filename: str | None = None,
) -> int:
    """Write ``(target_uri, status, content_type, body_text)`` rows as
    WARC ``response`` records whose payload is the HTTP message. One
    gzip member per record, the :func:`write_wet_file` layout."""
    name = filename or os.path.basename(path)
    n = 0
    with open(path, "wb") as fh:
        fh.write(_gzip_member(_warcinfo_bytes(name)))
        for target_uri, status, content_type, body in rows:
            payload_body = ("" if body is None else body).encode("utf-8")
            http = (
                f"HTTP/1.1 {status} "
                f"{'OK' if status == 200 else 'X'}\r\n"
                f"Content-Type: {content_type}\r\n"
                f"Content-Length: {len(payload_body)}\r\n\r\n"
            ).encode("ascii") + payload_body
            fh.write(
                _gzip_member(
                    _record_bytes(
                        [
                            ("WARC-Type", "response"),
                            ("WARC-Record-ID", record_id_for(target_uri)),
                            ("WARC-Date", _FIXED_DATE),
                            ("WARC-Target-URI", target_uri),
                            (
                                "Content-Type",
                                "application/http; msgtype=response",
                            ),
                        ],
                        http,
                    )
                )
            )
            n += 1
    return n


def parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """RFC 9112 response parse: (status, content-type, body). The body
    is taken from the HTTP Content-Length when present (trailing CRLFs
    from the WARC framing never leak into it), else everything after
    the header block."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        raise ValueError("no HTTP header terminator in response payload")
    head_lines = payload[:head_end].split(b"\r\n")
    status_parts = head_lines[0].split(b" ", 2)
    if len(status_parts) < 2 or not status_parts[0].startswith(b"HTTP/"):
        raise ValueError(f"bad HTTP status line: {head_lines[0][:40]!r}")
    status = int(status_parts[1])
    headers: dict[str, str] = {}
    for ln in head_lines[1:]:
        k, _, v = ln.decode("utf-8", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()
    body = payload[head_end + 4 :]
    if "content-length" in headers:
        body = body[: int(headers["content-length"])]
    return status, headers.get("content-type", ""), body


def wet_convert(df, spark=None):
    """The WARC→WET conversion operator: rows of the :data:`WET_SCHEMA`
    reader output (``warc_type = 'response'``) → extracted-text rows
    ``(record_id, target_uri, status, http_content_type, text,
    text_bytes)``. Arrow ``mapInPandas``; HTTP payloads stay inside the
    map seam (the multimodal blob discipline) — only extracted text and
    scalars come out."""
    import pandas as pd
    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("record_id", ST.StringType()),
            ST.StructField("target_uri", ST.StringType()),
            ST.StructField("status", ST.IntegerType()),
            ST.StructField("http_content_type", ST.StringType()),
            ST.StructField("text", ST.StringType()),
            ST.StructField("text_bytes", ST.LongType()),
        ]
    )

    def conv(batches):
        for pdf in batches:
            rows = []
            for rid, uri, wtype, payload in zip(
                pdf["record_id"],
                pdf["target_uri"],
                pdf["warc_type"],
                pdf["payload"],
            ):
                if wtype != "response":
                    continue
                status, ctype, body = parse_http_response(
                    payload.encode("utf-8")
                )
                text = body.decode("utf-8")
                rows.append(
                    (rid, uri, status, ctype, text, len(body))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_id", "target_uri", "status",
                    "http_content_type", "text", "text_bytes",
                ],
            )

    return df.select(
        "record_id", "target_uri", "warc_type", "payload"
    ).mapInPandas(conv, schema)
