"""WARC/WET container (entity_etl_spark/warc_format.py, round 9).

Framing internals against ISO 28500 / the CommonCrawl WET layout
(Content-Length payload framing, per-record gzip members, header
parsing incl. the language annotation, deterministic record ids) plus
the Spark DataSource surface: write -> read row fidelity, per-file
partitioning, overwrite/commit atomicity.
"""

import glob
import gzip
import io
import os

import pytest

from entity_etl_spark import warc_format as wf

ROWS = [
    ("https://web.example.org/doc/1", "en", "hello world"),
    # payload containing a blank line AND a WARC version string:
    # Content-Length framing must carry it through untouched
    ("https://web.example.org/doc/2", "de", "a\r\n\r\nWARC/1.0\r\nb"),
    ("https://web.example.org/doc/3", None, "unicode: é中文"),
    ("https://web.example.org/doc/4", "en", ""),
]


def _write(tmp_path):
    path = os.path.join(str(tmp_path), "f.warc.gz")
    n = wf.write_wet_file(path, iter(ROWS))
    assert n == len(ROWS)
    return path


def test_roundtrip_records(tmp_path):
    path = _write(tmp_path)
    recs = list(wf.read_wet_file(path))
    assert recs[0][1] == "warcinfo"
    conv = [r for r in recs if r[1] == "conversion"]
    assert len(conv) == len(ROWS)
    for (uri, lang, payload), rec in zip(ROWS, conv):
        rid, wtype, target, language, ctype, length, body, raw = rec
        assert target == uri
        assert language == lang
        assert ctype == "text/plain"
        assert body == payload
        assert raw == payload.encode("utf-8")
        assert length == len(payload.encode("utf-8"))
        assert rid == wf.record_id_for(uri)  # deterministic uuid5


def test_record_id_deterministic():
    a = wf.record_id_for("https://x.example/1")
    b = wf.record_id_for("https://x.example/1")
    c = wf.record_id_for("https://x.example/2")
    assert a == b != c
    assert a.startswith("<urn:uuid:") and a.endswith(">")


def test_one_gzip_member_per_record(tmp_path):
    # the CommonCrawl layout: warcinfo + one member per record, so a
    # reader can split work at member boundaries
    path = _write(tmp_path)
    assert wf.count_gzip_members(path) == 1 + len(ROWS)


def test_reader_accepts_single_member_file(tmp_path):
    # a WET file recompressed as ONE gzip stream (a common repack)
    # must parse identically: the parser frames on Content-Length,
    # not member boundaries
    path = _write(tmp_path)
    raw = gzip.decompress(open(path, "rb").read())
    single = os.path.join(str(tmp_path), "single.warc.gz")
    with gzip.open(single, "wb") as fh:
        fh.write(raw)
    assert list(wf.read_wet_file(single)) == list(wf.read_wet_file(path))


def test_truncated_payload_raises(tmp_path):
    path = _write(tmp_path)
    raw = gzip.decompress(open(path, "rb").read())
    trunc = os.path.join(str(tmp_path), "trunc.warc.gz")
    with gzip.open(trunc, "wb") as fh:
        fh.write(raw[:-20])
    with pytest.raises(ValueError):
        list(wf.read_wet_file(trunc))


def test_datasource_roundtrip_and_partitioning(spark, tmp_path):
    wf.register_warc(spark)
    out = os.path.join(str(tmp_path), "wet")
    df = spark.createDataFrame(ROWS, schema=list(wf.WRITE_COLUMNS))
    df.repartition(3).write.format("warc_py").mode("append").option(
        "path", out
    ).save()
    files = glob.glob(os.path.join(out, "*.warc.gz"))
    assert len(files) == 3  # one container per task partition
    back = spark.read.format("warc_py").option("path", out).load()
    conv = back.filter("warc_type = 'conversion'").collect()
    assert {(r.target_uri, r.content_language, r.payload) for r in conv} == {
        (u, l, p) for u, l, p in ROWS
    }
    # reader parallelism = file count
    assert back.rdd.getNumPartitions() == 3
    info = back.filter("warc_type = 'warcinfo'").count()
    assert info == 3


def test_datasource_overwrite_replaces(spark, tmp_path):
    wf.register_warc(spark)
    out = os.path.join(str(tmp_path), "wet")
    df = spark.createDataFrame(ROWS, schema=list(wf.WRITE_COLUMNS))
    df.coalesce(1).write.format("warc_py").mode("append").option(
        "path", out
    ).save()
    df.coalesce(1).write.format("warc_py").mode("overwrite").option(
        "path", out
    ).save()
    files = glob.glob(os.path.join(out, "*.warc.gz"))
    assert len(files) == 1
    back = spark.read.format("warc_py").option("path", out).load()
    assert back.filter("warc_type = 'conversion'").count() == len(ROWS)


def test_writer_rejects_wrong_columns(spark, tmp_path):
    wf.register_warc(spark)
    df = spark.createDataFrame([(1, "x")], schema=["a", "b"])
    with pytest.raises(Exception, match="warc_py writer needs columns"):
        df.write.format("warc_py").mode("append").option(
            "path", os.path.join(str(tmp_path), "bad")
        ).save()


RESP_ROWS = [
    ("https://web.example.org/p/1", 200, "text/html", "hello\r\n\r\nworld"),
    ("https://web.example.org/p/2", 404, "text/plain", ""),
    ("https://web.example.org/p/3", 200, "text/html", "é 中文"),
]


def test_response_records_roundtrip(tmp_path):
    path = os.path.join(str(tmp_path), "r.warc.gz")
    assert wf.write_response_file(path, iter(RESP_ROWS)) == len(RESP_ROWS)
    resp = [r for r in wf.read_wet_file(path) if r[1] == "response"]
    assert len(resp) == len(RESP_ROWS)
    for (uri, status, ctype, body), rec in zip(RESP_ROWS, resp):
        assert rec[2] == uri
        assert rec[4] == "application/http; msgtype=response"
        st, ct, extracted = wf.parse_http_response(rec[6].encode("utf-8"))
        assert (st, ct) == (status, ctype)
        # Content-Length framing carries CRLF-bearing bodies exactly
        assert extracted.decode("utf-8") == body


def test_parse_http_response_rejects_garbage():
    with pytest.raises(ValueError, match="header terminator"):
        wf.parse_http_response(b"HTTP/1.1 200 OK\r\nno-blank-line")
    with pytest.raises(ValueError, match="status line"):
        wf.parse_http_response(b"not-http\r\n\r\nbody")


def test_parse_http_response_without_content_length():
    # body = everything after the header block when no Content-Length
    st, ct, body = wf.parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nabc"
    )
    assert (st, ct, body) == (200, "text/plain", b"abc")


def test_datasource_response_mode_and_wet_convert(spark, tmp_path):
    wf.register_warc(spark)
    out = os.path.join(str(tmp_path), "resp")
    df = spark.createDataFrame(
        RESP_ROWS, schema=list(wf.RESPONSE_WRITE_COLUMNS)
    )
    df.coalesce(1).write.format("warc_py").option(
        "record_type", "response"
    ).mode("append").option("path", out).save()
    back = spark.read.format("warc_py").option("path", out).load()
    ext = wf.wet_convert(back).collect()
    got = {(r.target_uri, r.status, r.http_content_type, r.text,
            r.text_bytes) for r in ext}
    assert got == {
        (u, s, c, b, len(b.encode("utf-8"))) for u, s, c, b in RESP_ROWS
    }
    # warcinfo rows are dropped by the conversion, not surfaced
    assert len(ext) == len(RESP_ROWS)


def test_non_utf8_payload_roundtrips_via_bytes(tmp_path):
    # real crawls carry latin-1 / binary bodies: the bytes column is
    # exact, the string leg is U+FFFD-replaced instead of raising
    latin = "caf\xe9".encode("latin-1")
    path = os.path.join(str(tmp_path), "b.warc.gz")
    wf.write_wet_file(path, iter([("https://x.example/b", None, latin)]))
    rec = [r for r in wf.read_wet_file(path) if r[1] == "conversion"][0]
    assert rec[7] == latin  # exact bytes
    assert "�" in rec[6]  # replaced, not UnicodeDecodeError
    assert rec[5] == len(latin)


def test_split_range_reading_covers_exactly_once(tmp_path):
    # arbitrary byte splits compose to exactly-once member coverage
    rows = [
        (f"https://web.example.org/s/{i}", "en", f"payload {i} " + "x" * 50)
        for i in range(40)
    ]
    path = os.path.join(str(tmp_path), "s.warc.gz")
    wf.write_wet_file(path, iter(rows))
    size = os.path.getsize(path)
    whole = list(wf.read_wet_file(path))
    for nsplits in (1, 2, 3, 7, size):  # incl. degenerate 1-byte ranges
        step = max(1, size // nsplits)
        got = []
        for off in range(0, size, step):
            got.extend(
                wf.read_wet_range(path, off, min(off + step, size))
            )
        assert sorted(got) == sorted(whole), f"nsplits={nsplits}"


def test_split_range_single_member_file_owned_by_partition_zero(tmp_path):
    path = _write(tmp_path)
    raw = gzip.decompress(open(path, "rb").read())
    single = os.path.join(str(tmp_path), "single.warc.gz")
    with gzip.open(single, "wb") as fh:
        fh.write(raw)
    size = os.path.getsize(single)
    mid = size // 2
    p0 = list(wf.read_wet_range(single, 0, mid))
    p1 = list(wf.read_wet_range(single, mid, size))
    assert p1 == []  # no member starts in [mid, size)
    assert p0 == list(wf.read_wet_file(single))


def test_datasource_split_size_partitions(spark, tmp_path):
    wf.register_warc(spark)
    out = os.path.join(str(tmp_path), "wet")
    rows = [
        (f"https://web.example.org/d/{i}", "en", f"doc {i} " + "y" * 80)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, schema=list(wf.WRITE_COLUMNS))
    df.coalesce(1).write.format("warc_py").mode("append").option(
        "path", out
    ).save()
    files = glob.glob(os.path.join(out, "*.warc.gz"))
    assert len(files) == 1
    back = spark.read.format("warc_py").option("path", out).option(
        "split_size", "512"
    ).load()
    # ONE outsized archive fans out across >1 input partition
    assert back.rdd.getNumPartitions() > 1
    conv = back.filter("warc_type = 'conversion'").collect()
    assert {(r.target_uri, r.payload) for r in conv} == {
        (u, p) for u, _, p in rows
    }


def test_parse_http_response_chunked():
    msg = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n8;ext=1\r\n, world!\r\n0\r\n\r\n"
    )
    st, ct, body = wf.parse_http_response(msg)
    assert (st, body) == (200, b"hello, world!")


def test_charset_of():
    assert wf.charset_of("text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert wf.charset_of('text/html; charset="utf-8"') == "utf-8"
    assert wf.charset_of("text/plain") == "utf-8"
    assert wf.charset_of(None) == "utf-8"


def test_wet_convert_charset_sniffing(spark, tmp_path):
    # a latin-1 body declared by its Content-Type decodes correctly
    wf.register_warc(spark)
    out = os.path.join(str(tmp_path), "resp")
    body = "d\xe9j\xe0 vu"
    path = os.path.join(out, "part-0.warc.gz")
    os.makedirs(out)
    wf.write_response_file(
        path,
        iter(
            [
                (
                    "https://x.example/l1",
                    200,
                    "text/html; charset=iso-8859-1",
                    body.encode("latin-1"),
                )
            ]
        ),
    )
    back = spark.read.format("warc_py").option("path", out).load()
    ext = wf.wet_convert(back).collect()
    assert len(ext) == 1
    assert ext[0].text == body
    assert ext[0].text_bytes == len(body.encode("latin-1"))


def test_response_writer_rejects_wet_columns(spark, tmp_path):
    wf.register_warc(spark)
    df = spark.createDataFrame(ROWS, schema=list(wf.WRITE_COLUMNS))
    with pytest.raises(Exception, match="record_type=response"):
        df.write.format("warc_py").option("record_type", "response").mode(
            "append"
        ).option("path", os.path.join(str(tmp_path), "bad")).save()


# ------------------------------------------------------ CDX index / fetch


def test_cdx_offsets_address_the_right_members(tmp_path):
    path = _write(tmp_path)
    size = os.path.getsize(path)
    idx = list(wf.read_cdx_range(path, 0, size))
    # one row per record incl. warcinfo, lengths tile the file exactly
    assert len(idx) == len(ROWS) + 1
    assert sum(r[9] for r in idx) == size
    assert [r[8] for r in idx] == sorted(r[8] for r in idx)
    import hashlib

    for rid, wtype, uri, date, ctype, length, digest, fname, off, ln in idx:
        assert fname == os.path.basename(path)
        assert date == "2026-01-01T00:00:00Z"
        # re-read the member at (offset) and find exactly this record
        with open(path, "rb") as fh:
            data, nxt = wf._read_member(fh, off)
        assert nxt - off == ln
        recs = list(
            wf._parse_records(io.BufferedReader(io.BytesIO(data)))
        )
        match = [r for r in recs if r[0] == rid]
        assert len(match) == 1
        assert match[0][7] is not None
        assert hashlib.md5(match[0][7]).hexdigest() == digest
        assert length == len(match[0][7])


def test_cdx_range_splits_cover_exactly_once(tmp_path):
    rows = [
        (f"https://web.example.org/c/{i}", "en", f"doc {i} " + "y" * 40)
        for i in range(25)
    ]
    path = os.path.join(str(tmp_path), "c.warc.gz")
    wf.write_wet_file(path, iter(rows))
    size = os.path.getsize(path)
    whole = sorted(wf.read_cdx_range(path, 0, size))
    for nsplits in (2, 5, size):
        step = max(1, size // nsplits)
        got = []
        for off in range(0, size, step):
            got.extend(
                wf.read_cdx_range(path, off, min(off + step, size))
            )
        assert sorted(got) == whole, f"nsplits={nsplits}"


def test_cdx_repacked_single_member_archive(tmp_path):
    # every record of a repacked archive indexes at the one member's
    # coordinates; fetch disambiguates by record_id
    path = _write(tmp_path)
    raw = gzip.decompress(open(path, "rb").read())
    single = os.path.join(str(tmp_path), "single.warc.gz")
    with gzip.open(single, "wb") as fh:
        fh.write(raw)
    size = os.path.getsize(single)
    idx = list(wf.read_cdx_range(single, 0, size))
    assert len(idx) == len(ROWS) + 1
    assert {(r[8], r[9]) for r in idx} == {(0, size)}


def test_datasource_cdx_mode(spark, tmp_path):
    wf.register_warc(spark)
    out = str(tmp_path / "w")
    df = spark.createDataFrame(ROWS, schema=list(wf.WRITE_COLUMNS))
    df.write.format("warc_py").mode("append").option("path", out).save()
    idx = (
        spark.read.format("warc_py")
        .option("path", out)
        .option("mode", "cdx")
        .load()
    )
    assert idx.schema == wf.CDX_SCHEMA
    rows = idx.filter("warc_type = 'conversion'").collect()
    assert {r.target_uri for r in rows} == {r[0] for r in ROWS}
    assert all(r.length > 0 and r.offset >= 0 for r in rows)


def test_surt_urlkey(spark):
    df = spark.createDataFrame(
        [("https://www.Example.org/Doc/5",), ("http://a.b.co/x?q=1",)],
        ["uri"],
    )
    got = [
        r.k
        for r in df.select(wf.surt_urlkey("uri").alias("k")).collect()
    ]
    assert got == ["org,example,www)/doc/5", "co,b,a)/x"]


def test_fetch_records_exact_subset_multi_file(spark, tmp_path):
    wf.register_warc(spark)
    out = str(tmp_path / "w")
    rows = [
        (f"https://web.example.org/f/{i}", "en", f"body {i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, schema=list(wf.WRITE_COLUMNS))
    df.repartition(3).write.format("warc_py").mode("append").option(
        "path", out
    ).save()
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == 3
    idx = (
        spark.read.format("warc_py")
        .option("path", out)
        .option("mode", "cdx")
        .load()
        .filter("warc_type = 'conversion' AND target_uri LIKE '%0'")
    )
    fetched = wf.fetch_records(idx, out).collect()
    want = {u for (u, _, _) in rows if u.endswith("0")}
    assert {r.target_uri for r in fetched} == want
    assert all(
        r.payload == f"body {r.target_uri.rsplit('/', 1)[1]}"
        for r in fetched
    )


def test_fetch_records_disambiguates_within_member(spark, tmp_path):
    # repacked single-member archive: index rows share coordinates,
    # fetch must return only the requested ids (decompress once)
    wf.register_warc(spark)
    path = _write(tmp_path)
    raw = gzip.decompress(open(path, "rb").read())
    out = str(tmp_path / "rp")
    os.makedirs(out)
    with gzip.open(os.path.join(out, "r.warc.gz"), "wb") as fh:
        fh.write(raw)
    idx = (
        spark.read.format("warc_py")
        .option("path", out)
        .option("mode", "cdx")
        .load()
        .filter("warc_type = 'conversion' AND target_uri LIKE '%/1'")
    )
    fetched = wf.fetch_records(idx, out).collect()
    assert [r.target_uri for r in fetched] == [ROWS[0][0]]


def test_canonical_urlkey_collapses_spellings(spark):
    df = spark.createDataFrame(
        [
            ("http://www.Example.org/p/5?utm_source=feed",),
            ("https://example.org/p/5",),
            ("https://www.example.org/p/5?x=1&y=2",),
            # a host whose LAST label is legitimately www-like must not
            # be stripped mid-host: only the leading label matches ,www)
            ("https://www.example.org/www/5",),
        ],
        ["uri"],
    )
    got = [
        r.k
        for r in df.select(wf.canonical_urlkey("uri").alias("k")).collect()
    ]
    assert got[0] == got[1] == got[2] == "org,example)/p/5"
    assert got[3] == "org,example)/www/5"


def test_fetch_records_hot_archive_fans_out(spark, tmp_path):
    # r11 skew guard (guide §2.5): ONE archive holding every indexed
    # record must not serialize into one task — the (filename,
    # offset-bucket) repartition spreads a hot file across tasks while
    # the fetch output stays exactly the requested subset.
    import pyspark.sql.functions as F

    wf.register_warc(spark)
    out = str(tmp_path / "hot")
    rows = [
        (f"https://hot.example.org/d/{i}", "en", f"body {i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, schema=list(wf.WRITE_COLUMNS))
    # ONE member file = the skew case
    df.coalesce(1).write.format("warc_py").mode("append").option(
        "path", out
    ).save()
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == 1
    idx = (
        spark.read.format("warc_py")
        .option("path", out)
        .option("mode", "cdx")
        .load()
        .filter("warc_type = 'conversion'")
    )
    fetched_df = wf.fetch_records(idx, out)
    # partition-count assertion: the repartition stage must spread the
    # single hot filename across >1 non-empty partition (offsets hash
    # into up to offset_buckets groups; 60 distinct offsets make an
    # all-in-one-bucket hash accident ~16^-59)
    parts = spark.sparkContext.defaultParallelism
    nonempty = (
        idx.select("filename", "offset", "record_id")
        .repartition(
            parts,
            F.col("filename"),
            F.pmod(F.xxhash64(F.col("offset")), F.lit(16)),
        )
        .rdd.glom()
        .map(len)
        .filter(lambda n: n > 0)
        .count()
    )
    assert nonempty > 1
    fetched = fetched_df.collect()
    assert {r.target_uri for r in fetched} == {u for (u, _, _) in rows}
    assert all(
        r.payload == f"body {r.target_uri.rsplit('/', 1)[1]}"
        for r in fetched
    )
