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

- ``spark.read.format("warc_py").load(path)`` — executor-parallel
  across files (the parallelism contract CommonCrawl jobs use: ~64k
  WET files per crawl) AND within a file: because each record is its
  own gzip member, a large archive is split into byte ranges
  (``split_size`` option, default 128 MiB — the
  ``maxPartitionBytes`` role) and each range partition scans forward
  to the first verified member boundary, then owns every member whose
  FIRST byte falls inside its range (the classic split-ownership rule,
  so one outsized ``.warc.gz`` no longer serializes onto one core).
  Fixed schema :data:`WET_SCHEMA`; every record is a row
  (``warcinfo`` included) so the query layer filters on ``warc_type``.
- ``df.write.format("warc_py").save(path)`` — input columns
  ``(target_uri, content_language, payload)``; one ``.warc.gz`` per
  task partition led by a ``warcinfo`` record, each record its own
  gzip member, temp-staged and renamed at job commit (fail-fast: a
  failed job leaves only ``.tmp`` litter).
- ``option("mode", "cdx")`` on the reader — a CDX(J)-style capture
  index (:data:`CDX_SCHEMA`, the cc-index layout): per record, the
  byte coordinates of its gzip member plus payload digest, built with
  the same range-split parallelism. :func:`surt_urlkey` derives the
  SURT sort key columnar; :func:`fetch_records` is the other half —
  random access to exactly the indexed records by (filename, offset)
  without scanning archives.

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
import hashlib
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
        # payload twice: the string leg is a lossless view ONLY for
        # UTF-8 payloads (invalid sequences are U+FFFD-replaced, never
        # raised — real crawls carry latin-1/gzip/image bytes);
        # payload_bytes is the exact on-disk payload, so binary bodies
        # round-trip and wet_convert can charset-sniff lazily.
        T.StructField("payload", T.StringType()),
        T.StructField("payload_bytes", T.BinaryType()),
    ]
)

WRITE_COLUMNS = ("target_uri", "content_language", "payload")

# CDX(J)-style capture index (the CommonCrawl cc-index layout): one row
# per record with the byte coordinates of its gzip member, so a reader
# can range-request exactly the records it wants instead of scanning
# whole archives — the 100 TB random-access path. ``offset``/``length``
# address the COMPRESSED member (usable as an HTTP Range header);
# ``digest`` is the md5 hex of the exact payload bytes.
CDX_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)


# --------------------------------------------------------------- encoding

def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"".join(
        [_VERSION, b"\r\n"]
        + [f"{k}: {v}\r\n".encode("utf-8") for k, v in headers]
        + [f"Content-Length: {len(payload)}\r\n\r\n".encode("ascii")]
    )
    return head + payload + b"\r\n\r\n"


def _payload_bytes(payload) -> bytes:
    """Writer payloads may be str (encoded UTF-8) or raw bytes (binary
    bodies round-trip exactly); None writes an empty payload."""
    if payload is None:
        return b""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        return bytes(payload)
    return payload.encode("utf-8")


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
            body = _payload_bytes(payload)
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

def _iter_raw_records(
    stream: io.BufferedIOBase,
) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per record from a decompressed WARC
    stream — header keys lowercased, payload framed exactly by
    ``Content-Length`` (so payloads may contain blank lines or even
    ``WARC/`` strings; the inter-record blank lines are skipped by the
    version-line scan)."""
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
        yield headers, payload


def _parse_records(stream: io.BufferedIOBase) -> Iterator[tuple]:
    """Yield :data:`WET_SCHEMA` tuples from a decompressed WARC stream."""
    for headers, payload in _iter_raw_records(stream):
        yield (
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-identified-content-language"),
            headers.get("content-type"),
            len(payload),
            payload.decode("utf-8", errors="replace"),
            payload,
        )


def read_wet_file(path: str) -> Iterator[tuple]:
    """Stream one ``.warc.gz`` file's records. ``gzip.GzipFile`` reads
    concatenated members transparently, so per-record-member
    (CommonCrawl) and single-member files both parse."""
    with gzip.open(path, "rb") as gz:
        yield from _parse_records(io.BufferedReader(gz))


# ------------------------------------------------ member-boundary splits

_GZ_MAGIC = b"\x1f\x8b\x08"
DEFAULT_SPLIT_SIZE = 128 << 20  # the maxPartitionBytes role


def _read_member(fh, pos: int, chunk: int = 1 << 20) -> tuple[bytes, int]:
    """Decompress exactly one gzip member starting at byte ``pos``.
    Returns ``(decompressed, next_member_offset)``; streams in
    ``chunk``-sized reads so memory is bounded by the decompressed
    member, never the file."""
    fh.seek(pos)
    d = zlib.decompressobj(31)
    out = []
    fed = 0
    while not d.eof:
        data = fh.read(chunk)
        if not data:
            raise ValueError(f"truncated gzip member at offset {pos}")
        out.append(d.decompress(data))
        fed += len(data)
    return b"".join(out), pos + fed - len(d.unused_data)


def _find_member_start(
    fh, start: int, end: int, chunk: int = 1 << 20
) -> int | None:
    """First byte offset in ``[start, end)`` where a gzip member whose
    payload begins with ``WARC/`` starts, or None. The gzip magic can
    occur inside compressed data, so every candidate is VERIFIED by
    decompressing its head — a false positive either raises
    ``zlib.error`` or yields non-WARC bytes and the scan continues.
    Scans in a rolling chunked window (the boundary is typically within
    the first record's length of ``start``), never materializing the
    whole split range."""
    pos = start
    window = b""
    win_base = start
    while True:
        hit = window.find(_GZ_MAGIC)
        while hit < 0:
            fh.seek(pos)
            more = fh.read(chunk)
            if not more or win_base + len(window) >= end + len(_GZ_MAGIC):
                return None
            # keep a magic-spanning tail so a boundary split across
            # chunk reads is still found
            tail = window[-(len(_GZ_MAGIC) - 1) :] if window else b""
            win_base = pos - len(tail)
            window = tail + more
            pos += len(more)
            hit = window.find(_GZ_MAGIC)
        cand = win_base + hit
        if cand >= end:
            return None
        fh.seek(cand)
        probe = fh.read(1 << 16)
        try:
            head = zlib.decompressobj(31).decompress(probe, 16)
        except zlib.error:
            head = b""
        if head.startswith(b"WARC/"):
            return cand
        window = window[hit + 1 :]
        win_base = cand + 1


def read_wet_range(path: str, start: int, end: int) -> Iterator[tuple]:
    """Read the records of every gzip member whose first byte lies in
    ``[start, end)`` — the split-ownership rule: a member straddling
    ``end`` is fully read by the partition that owns its start, and a
    non-zero ``start`` first scans forward to a verified member
    boundary (so arbitrary byte splits compose to exactly-once
    coverage). A single-member (repacked) archive yields rows only for
    the partition containing offset 0."""
    with open(path, "rb") as fh:
        pos = 0 if start == 0 else _find_member_start(fh, start, end)
        while pos is not None and pos < end:
            data, nxt = _read_member(fh, pos)
            yield from _parse_records(io.BufferedReader(io.BytesIO(data)))
            pos = nxt


def read_cdx_range(path: str, start: int, end: int) -> Iterator[tuple]:
    """Yield :data:`CDX_SCHEMA` tuples for every record whose gzip
    member starts in ``[start, end)`` — the index-build scan. Same
    split-ownership rule as :func:`read_wet_range`, but per member it
    records the byte coordinates ``(offset, length)`` and the payload
    digest instead of retaining the payload, so the index rows are tiny
    regardless of record size. A repacked (single-member) archive
    indexes every record at the member's coordinates; fetch then
    disambiguates by ``record_id``."""
    fname = os.path.basename(path)
    with open(path, "rb") as fh:
        pos = 0 if start == 0 else _find_member_start(fh, start, end)
        while pos is not None and pos < end:
            data, nxt = _read_member(fh, pos)
            raw = _iter_raw_records(io.BufferedReader(io.BytesIO(data)))
            for headers, payload in raw:
                yield (
                    headers.get("warc-record-id"),
                    headers.get("warc-type"),
                    headers.get("warc-target-uri"),
                    headers.get("warc-date"),
                    headers.get("content-type"),
                    len(payload),
                    hashlib.md5(payload).hexdigest(),
                    fname,
                    pos,
                    nxt - pos,
                )
            pos = nxt


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
    def __init__(self, file_path: str, start: int, end: int):
        self.file_path = file_path
        self.start = start
        self.end = end


class WarcPyReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        files = _warc_files(self.options["path"])
        if not files:
            raise ValueError(f"no .warc.gz files under {self.options['path']}")
        split = int(self.options.get("split_size", DEFAULT_SPLIT_SIZE))
        parts: list[WarcFilePartition] = []
        for f in files:
            size = os.path.getsize(f)
            if split <= 0 or size <= split:
                parts.append(WarcFilePartition(f, 0, size))
            else:
                # byte-range splits; each partition resolves its own
                # member boundary executor-side (no driver decompress)
                for off in range(0, size, split):
                    parts.append(
                        WarcFilePartition(f, off, min(off + split, size))
                    )
        return parts

    def read(self, partition: WarcFilePartition) -> Iterator[tuple]:
        rng = (
            read_cdx_range
            if self.options.get("mode") == "cdx"
            else read_wet_range
        )
        yield from rng(partition.file_path, partition.start, partition.end)


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
        if self.options.get("mode") == "cdx":
            return CDX_SCHEMA
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
            payload_body = _payload_bytes(body)
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


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked-coding decode: ``size-hex CRLF data CRLF``
    repeated, terminated by a zero-size chunk (trailers ignored)."""
    out = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("truncated chunk-size line")
        size_field = body[pos:nl].split(b";", 1)[0].strip()
        size = int(size_field, 16)
        if size == 0:
            return b"".join(out)
        data = body[nl + 2 : nl + 2 + size]
        if len(data) != size:
            raise ValueError("truncated chunk data")
        out.append(data)
        pos = nl + 2 + size + 2  # skip the chunk-terminating CRLF


def charset_of(content_type: str) -> str:
    """The ``charset=`` parameter of a Content-Type value, lowercased,
    default ``utf-8`` (the HTML5 default; real crawl extraction would
    add meta-tag sniffing behind this)."""
    for part in (content_type or "").split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset":
            return v.strip().strip('"').lower() or "utf-8"
    return "utf-8"


def parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """RFC 9112 response parse: (status, content-type, body). The body
    is taken from the HTTP Content-Length when present (trailing CRLFs
    from the WARC framing never leak into it), else everything after
    the header block; ``Transfer-Encoding: chunked`` bodies are
    de-chunked (crawlers store the wire form verbatim)."""
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
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    elif "content-length" in headers:
        body = body[: int(headers["content-length"])]
    return status, headers.get("content-type", ""), body


def wet_convert(df, spark=None):
    """The WARC→WET conversion operator: rows of the :data:`WET_SCHEMA`
    reader output (``warc_type = 'response'``) → extracted-text rows
    ``(record_id, target_uri, status, http_content_type, text,
    text_bytes)``. Arrow ``mapInPandas``; HTTP payloads stay inside the
    map seam (the multimodal blob discipline) — only extracted text and
    scalars come out. Works from ``payload_bytes`` (the exact on-disk
    payload), decoding the extracted body by the HTTP Content-Type
    charset with U+FFFD replacement — non-UTF-8 crawl content converts
    instead of raising."""
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
                pdf["payload_bytes"],
            ):
                if wtype != "response":
                    continue
                status, ctype, body = parse_http_response(bytes(payload))
                try:
                    text = body.decode(charset_of(ctype), errors="replace")
                except LookupError:  # unknown charset label in the wild
                    text = body.decode("utf-8", errors="replace")
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
        "record_id", "target_uri", "warc_type", "payload_bytes"
    ).mapInPandas(conv, schema)


# ------------------------------------------------------ CDX index / fetch

def surt_urlkey(uri):
    """SURT canonical url key as a pure-codegen Column expression:
    scheme dropped, host lowercased and label-reversed comma-joined,
    ``)/`` + lowercased path — ``https://www.Example.org/Doc/5`` →
    ``org,example,www)/doc/5`` (the cc-index sort key, minus the
    optional www-strip/query-normalize steps). Built-ins only
    (``parse_url``/``split``/``reverse``) so key derivation over a
    billion-row index stays inside whole-stage codegen."""
    from pyspark.sql import functions as F

    host = F.lower(F.parse_url(uri, F.lit("HOST")))
    path = F.lower(F.parse_url(uri, F.lit("PATH")))
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    return F.concat(rev, F.lit(")"), path)


def canonical_urlkey(uri):
    """URL-dedup canonical key: :func:`surt_urlkey` plus the two
    normalizations crawl dedup pipelines apply before keying — strip a
    leading ``www`` host label and drop the query string (``parse_url
    PATH`` already excludes it). Pure codegen; two spellings of the
    same page (`http://www.X/p?utm=...` vs `https://X/p`) key
    identically. The www label is stripped from the HOST before the
    key is assembled (not from the finished key, where a path that
    happens to contain the literal ``,www)`` — both are legal path
    characters — would be rewritten too and distinct URLs could
    collide onto one canonical key)."""
    from pyspark.sql import functions as F

    host = F.regexp_replace(
        F.lower(F.parse_url(uri, F.lit("HOST"))), "^www\\.", ""
    )
    path = F.lower(F.parse_url(uri, F.lit("PATH")))
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    return F.concat(rev, F.lit(")"), path)


def fetch_records(df_index, warc_dir: str, offset_buckets: int = 16):
    """Random-access fetch: given CDX index rows (``filename``,
    ``offset``, ``record_id``), read EXACTLY those records — the
    100 TB access pattern (an HTTP Range request per member against an
    object store; here a seek). Partition-clusters by ``(filename,
    offset bucket)`` and reads each distinct member once in offset
    order within its task (a multi-record member fetched for several
    ids is decompressed once per task), emitting only the requested
    ``record_id`` rows; archives are never scanned.

    ``offset_buckets`` (r11, guide §2.5 skew): partitioning by filename
    ALONE serializes one hot archive — an index with 10^6 records
    against a single member file became ONE task. The deterministic
    offset-hash bucket (``pmod(xxhash64(offset), buckets)``; hash-based,
    so retried tasks reproduce the assignment) fans a hot archive out
    across up to ``offset_buckets`` tasks while keeping each (file,
    bucket) group's offsets sorted and fetched once within its task.
    Records sharing an offset but split across buckets decompress that
    member once per bucket — bounded duplicate work, unchanged output.
    Returns :data:`WET_SCHEMA` rows via an Arrow ``mapInPandas`` seam —
    payload bytes appear only inside the fetch batch."""
    import pandas as pd

    from pyspark.sql import functions as F

    cols = [f.name for f in WET_SCHEMA.fields]

    def fetch(batches):
        for pdf in batches:
            rows = []
            for fname, grp in pdf.groupby("filename", sort=True):
                path = os.path.join(warc_dir, fname)
                with open(path, "rb") as fh:
                    for off in sorted(grp["offset"].unique()):
                        want = set(
                            grp.loc[grp["offset"] == off, "record_id"]
                        )
                        data, _ = _read_member(fh, int(off))
                        buf = io.BufferedReader(io.BytesIO(data))
                        for rec in _parse_records(buf):
                            if rec[0] in want:
                                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    # explicit partition COUNT (REPARTITION_BY_NUM): a column-only
    # repartition lets AQE coalesce by shuffle BYTES, and index rows are
    # slim — a hot archive's 10^6-record index is ~50 MB and would
    # collapse back into one task even though the real cost (member
    # decompression) is invisible to AQE. Cluster-width keeps the fetch
    # stage scale-adaptive without being byte-fooled.
    parts = df_index.sparkSession.sparkContext.defaultParallelism
    return (
        df_index.select("filename", "offset", "record_id")
        .repartition(
            parts,
            F.col("filename"),
            F.pmod(F.xxhash64(F.col("offset")), F.lit(offset_buckets)),
        )
        .mapInPandas(fetch, WET_SCHEMA)
    )
