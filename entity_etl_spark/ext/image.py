"""Image columns with REAL decoders (E5 upgrade, SURVEY §2.3).

Uncompressed 24-bit BMP needs no codec library — a 54-byte header plus raw
BGR pixel rows, fully parseable with numpy. PNG (round 8) is the first
REAL COMPRESSED format: stdlib ``zlib`` covers the DEFLATE stream and the
chunk CRCs, and the five scanline filters (None/Sub/Up/Average/Paeth, PNG
spec §9 "Filtering") are pure byte arithmetic. Together with :mod:`audio`
(WAV/PCM) this makes the multimodal decode path genuine for three formats;
only codecs needing external libraries (JPEG/MP3/H.264) remain behind the
:mod:`multimodal` stub seam.

- :func:`synthesize_bmp` — test-harness encoder: an 8x8 grayscale-in-RGB
  BMP per row whose 64 pixel values quantize the row's embedding
  (``floor((x + 1) / 2 * 255 + 0.5)`` clamped to a byte; 8x8 x 3 bytes =
  24-byte rows, already 4-byte aligned, so no padding ambiguity).
- :func:`decode_bmp_features` — the real decode: parse the
  BITMAPINFOHEADER, ``np.frombuffer`` the pixel array, re-flip the
  bottom-up rows, and emit (width, height, mean pixel value). Pixel
  values are integers, so the mean is exact in double precision and a
  relational oracle can re-derive it from the source floats through the
  full binary round trip.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SIDE = 8  # 8x8 pixels; 24-bit rows are 4-byte aligned with no padding


def _encode_bmp(gray: np.ndarray) -> bytes:
    """8x8 24-bit BMP with R=G=B=gray[i] per pixel, bottom-up row order."""
    px = gray.reshape(SIDE, SIDE)[::-1]  # BMP stores rows bottom-up
    bgr = np.repeat(px.astype(np.uint8).reshape(-1, 1), 3, axis=1)
    pixels = bgr.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(pixels), 0, 0, 54,
        40, SIDE, SIDE, 1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    return header + pixels


def _decode_bmp(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24-bit BMP; returns (width, height, HxWx3)."""
    if blob[0:2] != b"BM":
        raise ValueError("not a BMP blob")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError("decoder supports uncompressed 24-bit BMP only")
    row_bytes = (width * 3 + 3) // 4 * 4
    raw = np.frombuffer(blob, dtype=np.uint8, offset=data_off,
                        count=row_bytes * abs(height))
    rows = raw.reshape(abs(height), row_bytes)[:, : width * 3]
    img = rows.reshape(abs(height), width, 3)
    if height > 0:  # bottom-up → top-down
        img = img[::-1]
    return width, abs(height), img


def synthesize_bmp(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bmp binary) — embedding mapped half-up onto 0..255 gray."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("bmp", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                g = np.clip(np.floor((x + 1.0) / 2.0 * 255.0 + 0.5), 0, 255)
                blobs.append(_encode_bmp(g))
            yield pd.DataFrame({"vec_id": pdf[id_col], "bmp": blobs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


BMP_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_bmp_features(
    df: DataFrame, id_col: str = "vec_id", bmp_col: str = "bmp"
) -> DataFrame:
    """Real binary decode → per-image features, one Arrow pass."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[bmp_col]):
                w, h, img = _decode_bmp(bytes(blob))
                rows.append(
                    (int(vid), w, h, round(float(img.astype(np.float64).mean()), 6))
                )
            yield pd.DataFrame(
                rows, columns=["vec_id", "width", "height", "mean_pixel"]
            )

    return df.mapInPandas(feats, BMP_FEATURE_SCHEMA)


# ------------------------------------------------------------------ PNG
# Real compressed-format decode with no codec library (r8, VERDICT r7
# item 5): PNG's container is length-prefixed chunks with CRC32 (stdlib
# zlib.crc32), IDAT is a DEFLATE stream (stdlib zlib), and the per-
# scanline filters are byte arithmetic (PNG spec: None/Sub/Up/Average/
# Paeth). The synthesizer CYCLES all five filter types across scanlines
# (row i uses filter i % 5) so a decoder that skips defiltering — or
# fumbles the Paeth predictor's tie-breaking order — produces wrong
# pixel values, not accidentally-right ones.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    a + b - c, ties broken left, then up, then up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _encode_png(gray: np.ndarray) -> bytes:
    """8x8 8-bit grayscale PNG (color type 0), one filter per scanline
    cycling 0..4, IDAT deflated at the default zlib level."""
    px = gray.astype(np.uint8).reshape(SIDE, SIDE)
    raw = bytearray()
    prev = np.zeros(SIDE, dtype=np.int64)
    for y in range(SIDE):
        row = px[y].astype(np.int64)
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            filt = row
        elif ftype == 1:  # Sub: x - left
            filt = row - np.concatenate(([0], row[:-1]))
        elif ftype == 2:  # Up: x - up
            filt = row - prev
        elif ftype == 3:  # Average: x - floor((left + up) / 2)
            filt = row - (np.concatenate(([0], row[:-1])) + prev) // 2
        else:  # Paeth
            filt = np.empty(SIDE, dtype=np.int64)
            for x in range(SIDE):
                a = int(row[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                filt[x] = int(row[x]) - _paeth(a, b, c)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", SIDE, SIDE, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _decode_png(blob: bytes) -> tuple[int, int, np.ndarray, int]:
    """Parse an 8-bit grayscale non-interlaced PNG: walk the chunks
    (verifying every CRC), inflate IDAT, defilter each scanline.
    Returns (width, height, HxW uint8, n_paeth_rows)."""
    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG blob")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_px, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype_px, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "decoder supports 8-bit grayscale non-interlaced "
                    "PNG only"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG has no IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1  # 1 filter byte + width bytes (1 byte/px gray)
    if len(raw) != stride * height:
        raise ValueError("IDAT length does not match IHDR dimensions")
    img = np.zeros((height, width), dtype=np.int64)
    n_paeth = 0
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, filt = line[0], np.frombuffer(
            line, dtype=np.uint8, offset=1
        ).astype(np.int64)
        prev = img[y - 1] if y else np.zeros(width, dtype=np.int64)
        if ftype == 0:
            img[y] = filt
        elif ftype == 1:
            acc = 0
            for x in range(width):
                acc = (filt[x] + acc) % 256
                img[y, x] = acc
        elif ftype == 2:
            img[y] = (filt + prev) % 256
        elif ftype == 3:
            for x in range(width):
                left = img[y, x - 1] if x else 0
                img[y, x] = (filt[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:
            n_paeth += 1
            for x in range(width):
                a = int(img[y, x - 1]) if x else 0
                b = int(prev[x])
                c = int(img[y - 1, x - 1]) if x and y else 0
                img[y, x] = (filt[x] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return width, height, img.astype(np.uint8), n_paeth


def synthesize_png(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, png binary) — the embedding quantized onto 0..255 gray with
    the SAME half-up byte mapping as :func:`synthesize_bmp`, deflated
    through a real zlib/filtered PNG encode."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("png", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                g = np.clip(np.floor((x + 1.0) / 2.0 * 255.0 + 0.5), 0, 255)
                blobs.append(_encode_png(g))
            yield pd.DataFrame({"vec_id": pdf[id_col], "png": blobs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


PNG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("paeth_rows", T.IntegerType()),
    ]
)


def decode_png_features(
    df: DataFrame, id_col: str = "vec_id", png_col: str = "png"
) -> DataFrame:
    """Real compressed decode → per-image features, one Arrow pass.
    ``paeth_rows`` (scanlines carrying filter type 4) pins that the
    decoder read the filter bytes rather than treating IDAT as raw."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[png_col]):
                w, h, img, n_paeth = _decode_png(bytes(blob))
                rows.append(
                    (
                        int(vid),
                        w,
                        h,
                        round(float(img.astype(np.float64).mean()), 6),
                        n_paeth,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "vec_id", "width", "height", "mean_pixel", "paeth_rows",
                ],
            )

    return df.mapInPandas(feats, PNG_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# GIF87a (round 8): the second REAL COMPRESSED format, and a genuinely
# different compression family from PNG's DEFLATE — GIF image data is
# LZW with variable-width codes (GIF89a spec appendix F; start width
# min_code_size+1, grow when the next free code would not fit, cap 12
# bits), packed LSB-first into 255-byte-max sub-blocks. The decoder
# below implements the real algorithm including the clear/EOI codes and
# the "code == next free entry" (cScSc) special case; nothing is
# special-cased to the 8x8 test shape.

_GIF_HDR = b"GIF87a"


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Greedy-longest-match GIF LZW: emit CLEAR, dictionary-code the
    byte stream, emit EOI; codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: spec says CLEAR and restart
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> tuple[bytes, int]:
    """GIF LZW decode. Returns (bytes, n_clear_codes_seen)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh() -> tuple[list[bytes], int, int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], eoi + 1, (
            min_code_size + 1
        )

    table, next_code, width = fresh()
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n_clear = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            n_clear += 1
            continue
        if code == eoi:
            return bytes(out), n_clear
        if code < next_code and code < len(table) and (
            code < clear or table[code]
        ):
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the cScSc case
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            if next_code < len(table):
                table[next_code] = prev + entry[:1]
            else:
                table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _encode_gif(gray: np.ndarray) -> bytes:
    """8x8 grayscale GIF87a: 256-entry gray global color table (pixel
    value == palette index) and a real LZW-compressed image block."""
    px = gray.astype(np.uint8).reshape(SIDE, SIDE)
    screen = struct.pack("<HHBBB", SIDE, SIDE, 0xF7, 0, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, SIDE, SIDE, 0)
    lzw = _lzw_encode(px.tobytes(), 8)
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)  # block terminator
    return _GIF_HDR + screen + palette + img_desc + bytes(blocks) + b"\x3b"


def _decode_gif(blob: bytes) -> tuple[int, int, np.ndarray, int, int]:
    """Parse a GIF87a/89a stream: screen descriptor, global color table,
    image descriptor, de-block the sub-blocks, LZW-decompress, map
    palette indices through the color table (graded as luminance).
    Returns (width, height, HxW uint8 luma, n_clear_codes, n_subblocks).
    """
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF blob")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(blob):
        marker = blob[pos]
        if marker == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos + 1)
            pos += 10
            if ipacked & 0x80:  # local color table overrides
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    blob, np.uint8, n * 3, pos
                ).reshape(n, 3)
                pos += n * 3
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            min_code = blob[pos]
            pos += 1
            lzw = bytearray()
            n_blocks = 0
            while True:
                if pos >= len(blob):
                    raise ValueError("truncated GIF image data")
                blen = blob[pos]
                pos += 1
                if blen == 0:
                    break
                if pos + blen > len(blob):
                    raise ValueError("truncated GIF sub-block")
                lzw.extend(blob[pos : pos + blen])
                pos += blen
                n_blocks += 1
            idx_bytes, n_clear = _lzw_decode(bytes(lzw), min_code)
            if len(idx_bytes) != w * h:
                raise ValueError("LZW output does not match dimensions")
            if palette is None:
                raise ValueError("GIF has no color table")
            idx = np.frombuffer(idx_bytes, np.uint8)
            # integer luma of the palette entry; gray palettes (r=g=b)
            # reduce to the index value exactly
            rgb = palette[idx].astype(np.int64)
            luma = (rgb[:, 0] + rgb[:, 1] + rgb[:, 2]) // 3
            return w, h, luma.reshape(h, w).astype(np.uint8), n_clear, n_blocks
        elif marker == 0x21:  # extension: skip sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
        elif marker == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block marker {marker:#x}")
    raise ValueError("GIF has no image block")


def synthesize_gif(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, gif binary) — the embedding quantized onto 0..255 gray with
    the SAME half-up byte mapping as :func:`synthesize_bmp`, compressed
    through a real GIF87a/LZW encode."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("gif", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                g = np.clip(np.floor((x + 1.0) / 2.0 * 255.0 + 0.5), 0, 255)
                blobs.append(_encode_gif(g))
            yield pd.DataFrame({"vec_id": pdf[id_col], "gif": blobs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


GIF_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("clear_codes", T.IntegerType()),
    ]
)


def decode_gif_features(
    df: DataFrame, id_col: str = "vec_id", gif_col: str = "gif"
) -> DataFrame:
    """Real LZW decode → per-image features, one Arrow pass.
    ``clear_codes`` counts CLEAR codes consumed (exactly 1 for streams
    under 4096 dictionary entries) — a decoder that skips the control
    codes or mis-reads the variable code width cannot produce it."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[gif_col]):
                w, h, img, n_clear, _nb = _decode_gif(bytes(blob))
                rows.append(
                    (
                        int(vid),
                        w,
                        h,
                        round(float(img.astype(np.float64).mean()), 6),
                        n_clear,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "vec_id", "width", "height", "mean_pixel", "clear_codes",
                ],
            )

    return df.mapInPandas(feats, GIF_FEATURE_SCHEMA)
