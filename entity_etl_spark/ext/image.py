"""Image columns with REAL decoders (E5 upgrade, SURVEY §2.3).

Uncompressed 24-bit BMP needs no codec library — a 54-byte header plus raw
BGR pixel rows, fully parseable with numpy. PNG (round 8) is the first
REAL COMPRESSED format: stdlib ``zlib`` covers the DEFLATE stream and the
chunk CRCs, and the five scanline filters (None/Sub/Up/Average/Paeth, PNG
spec §9 "Filtering") are pure byte arithmetic. GIF87a (round 8) adds a
second compression family (variable-width LZW), and baseline JPEG/JFIF
(round 9) the first LOSSY one — DCT + quantization + zigzag/RLE +
canonical Huffman, ITU-T T.81, stdlib+numpy only. Together with
:mod:`audio` (WAV/PCM) the multimodal decode path is genuine for five
formats; only codecs needing external libraries (MP3/H.264) remain
behind the :mod:`multimodal` stub seam.

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


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("hhi", T.LongType()),
        T.StructField("hlo", T.LongType()),
    ]
)


def decode_png_ahash(
    df: DataFrame, id_col: str = "vec_id", png_col: str = "png"
) -> DataFrame:
    """Real PNG decode → 64-bit average hash (aHash) per image, as two
    unsigned 32-bit halves in BIGINT columns so downstream Hamming math
    (``bit_count(hhi ^ hhi')``) stays sign-safe and cross-engine
    restatable. Any HxW image is first average-pooled onto the
    canonical 8x8 aHash grid (:func:`_pool_8x8`; identity for 8x8
    inputs). Bit i (row-major over the grid) is set iff
    ``cell_i > mean(cells)`` — strict, with the 8x8 mean an exact
    power-of-two division, so an oracle recomputing from the source
    floats lands on bit-identical hashes for the fixture shape. One
    Arrow pass; blobs never leave the seam."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[png_col]):
                _w, _h, img, _n = _decode_png(bytes(blob))
                p = _pool_8x8(img.astype(np.float64)).ravel()
                bits = p > (p.sum() / p.size)
                w32 = (1 << np.arange(32, dtype=np.int64))
                hhi = int((bits[:32] * w32).sum())
                hlo = int((bits[32:] * w32).sum())
                rows.append((int(vid), hhi, hlo))
            yield pd.DataFrame(rows, columns=["vec_id", "hhi", "hlo"])

    return df.mapInPandas(hashes, AHASH_SCHEMA)


def _pool_8x8(img: np.ndarray) -> np.ndarray:
    """aHash's canonical downsample: average-pool any HxW grayscale
    image onto the 8x8 grid (near-equal cell tiling via array_split —
    deterministic, no interpolation). An 8x8 input is the identity, so
    the fixture-size hash is unchanged."""
    if img.shape == (8, 8):
        return img
    if img.ndim != 2 or min(img.shape) < 8:
        raise ValueError(
            f"aHash needs a 2-D grayscale image of at least 8x8, "
            f"got shape {img.shape}"
        )
    return np.array(
        [
            [cell.mean() for cell in np.array_split(band, 8, axis=1)]
            for band in np.array_split(img, 8, axis=0)
        ]
    )


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


# ---------------------------------------------------------------------------
# Baseline JPEG / JFIF (round 9, VERDICT r8 item 4): the third REAL
# COMPRESSED format and the first LOSSY one — the format a web corpus is
# actually made of. Everything here is public knowledge (ITU-T T.81):
# level-shift, 8x8 forward DCT, all-ones quantization (finest legal
# table — the error budget is then ONLY forward-DCT coefficient
# rounding, giving a provable reconstruction bound the query gates on),
# zigzag scan, DC difference coding across MCUs, AC run/size RLE with
# ZRL and EOB, canonical Huffman with the Annex K.3.3 luminance tables
# CARRIED IN the DHT segments (the decoder builds its codes from the
# stream, never from this module's constants), MSB-first bit packing
# with 0xFF 0x00 byte stuffing.
#
# Fixture shape: each embedding (64 floats) quantizes to an 8x8 gray
# block g via the repo-wide half-up byte mapping; the encoded image is
# 16x8 = TWO MCUs — [g | reverse(g)] — so DC prediction, per-block AC
# patterns, and the MCU loop are all genuinely exercised while the
# whole-image pixel sum stays EXACTLY derivable from the source floats
# (sum(g) + sum(reverse g) = 2*sum(g)).

_ZIGZAG = []  # (row, col) pairs in JPEG zigzag scan order, generated
for _s in range(15):
    _d = range(_s + 1)
    for _i in (_d if _s % 2 else reversed(_d)):
        _r, _c = _i, _s - _i
        if _r < 8 and _c < 8:
            _ZIGZAG.append((_r, _c))
del _s, _d, _i, _r, _c

# ITU-T T.81 Annex K.3.3 typical luminance Huffman specs (BITS, HUFFVAL).
# Only the ENCODER consults these; the DHT segments ship them in-stream
# and the decoder rebuilds its tables from the bytes it reads, so a typo
# here would break symbol coverage loudly, never silently skew a decode.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: forward F = M P M^T, inverse
    P = M^T F M (T.81 A.3.3 with the 1/2 C(u) scaling folded in)."""
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_DCT_M = _dct_matrix()


class _BitWriter:
    """MSB-first entropy-coded segment writer with 0xFF 0x00 stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing (T.81 B.1.1.5)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:  # pad with 1-bits (T.81 F.1.2.3)
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """MSB-first entropy-coded segment reader; un-stuffs 0xFF 0x00 and
    stops at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise ValueError("entropy segment ran past end of data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _category(v: int) -> int:
    """Magnitude category: smallest s with |v| < 2**s (0 for v == 0)."""
    s = 0
    a = abs(v)
    while a:
        a >>= 1
        s += 1
    return s


def _extend(receive: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit received value to its signed
    coefficient (negatives are sent as v + 2**s - 1)."""
    if s == 0:
        return 0
    if receive < (1 << (s - 1)):
        return receive - (1 << s) + 1
    return receive


def _encode_block(
    block: np.ndarray, prev_dc: int, wr: _BitWriter,
    dc_codes: dict[int, tuple[int, int]], ac_codes: dict[int, tuple[int, int]],
    qt: np.ndarray | None = None,
) -> int:
    """Forward-DCT one level-shifted 8x8 block, quantize by ``qt``
    (natural-order 8x8; None = all-ones, where quantization reduces to
    plain half-away rounding), zigzag, entropy-code. Returns the
    block's quantized DC for the next block's prediction."""
    f = _DCT_M @ (block.astype(np.float64) - 128.0) @ _DCT_M.T
    if qt is not None:
        f = f / qt
    q = np.floor(np.abs(f) + 0.5) * np.sign(f)  # round half away from 0
    zz = [int(q[r, c]) for r, c in _ZIGZAG]
    diff = zz[0] - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    wr.put(code, length)
    if s:
        wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, 64):
        v = zz[i]
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            wr.put(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        wr.put(code, length)
        wr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        wr.put(code, length)
    return zz[0]


def _encode_jpeg(gray: np.ndarray) -> bytes:
    """16x8 baseline JFIF from a 64-value gray vector: MCU 0 is the 8x8
    block, MCU 1 its element-reversed twin (so the image pixel sum is
    exactly 2x the block sum — relationally derivable — while DC
    prediction and fresh AC patterns are exercised)."""
    g = gray.astype(np.uint8).reshape(-1)
    if g.size != 64:
        raise ValueError("expected a 64-value gray vector")
    blocks = [g.reshape(8, 8), g[::-1].reshape(8, 8)]
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    wr = _BitWriter()
    prev_dc = 0
    for b in blocks:
        prev_dc = _encode_block(b, prev_dc, wr, dc_codes, ac_codes)
    scan = wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # Pq=0 Tq=0, all 1s
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, 8, 16, 1)  # precision, h=8, w=16, 1 comp
        + bytes([1, 0x11, 0]),  # comp id 1, 1x1 sampling, quant table 0
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    jfif = seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0]))
    return (
        b"\xff\xd8" + jfif + dqt + sof + dht + sos + scan + b"\xff\xd9"
    )


def _build_huff_decoder(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map for canonical codes."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff_symbol(
    rd: _BitReader, table: dict[tuple[int, int], int]
) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _decode_scan_block(rd: _BitReader, dct, act, prev_dc: int):
    """Entropy-decode one block's 64 zigzag coefficients (Huffman +
    EXTEND + DC prediction); returns (zz array, new prev_dc)."""
    zz = np.zeros(64, dtype=np.float64)
    s = _read_huff_symbol(rd, dct)
    prev_dc += _extend(rd.bits(s), s) if s else 0
    zz[0] = prev_dc
    i = 1
    while i < 64:
        sym = _read_huff_symbol(rd, act)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("invalid zero-size AC symbol")
            i += 16  # ZRL
            continue
        i += run
        if i > 63:
            raise ValueError("AC run past end of block")
        zz[i] = _extend(rd.bits(size), size)
        i += 1
    return zz, prev_dc


def _idct_block(zz: np.ndarray, q: np.ndarray) -> np.ndarray:
    coeffs = np.zeros((8, 8), dtype=np.float64)
    for idx, (r, c) in enumerate(_ZIGZAG):
        coeffs[r, c] = zz[idx] * q[idx]
    return _DCT_M.T @ coeffs @ _DCT_M + 128.0


def _decode_jpeg_planes(
    blob: bytes,
) -> tuple[int, int, list[np.ndarray], int]:
    """Parse a baseline JFIF stream with 1 or 3 components and
    arbitrary sampling factors (1x1 grayscale and 4:2:0 YCbCr both
    land here): marker walk, DQT (8-bit, zigzag order) / SOF0 / DHT
    (tables rebuilt FROM the stream) / SOS, then the interleaved MCU
    scan — per-component DC prediction, each MCU carrying h*v blocks
    of every component in SOF order (T.81 A.2.3), dequantize, inverse
    DCT, level-shift back, half-up round, clamp. Returns (width,
    height, [per-component planes at that component's OWN resolution —
    chroma stays subsampled, upsampling is a display concern],
    n_blocks)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict[tuple[int, int], int]] = {}
    ac_tables: dict[int, dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    scan_tables: dict[int, tuple[int, int]] = {}  # cid -> (dc id, ac id)
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", blob, pos + 2)
        payload = blob[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    payload, np.uint8, 64, p + 1
                ).astype(np.float64)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", payload)
            if ncomp not in (1, 3):
                raise ValueError("decoder supports 1- or 3-component only")
            for i in range(ncomp):
                cid = payload[6 + 3 * i]
                samp = payload[7 + 3 * i]
                tq = payload[8 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential DCT (SOF0) supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                table = _build_huff_decoder(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                p += 17 + n
        elif marker == 0xDD:  # DRI: restart interval
            # RSTn markers inside the entropy stream would be consumed
            # as Huffman bits by the MCU walk below — refuse loudly
            # rather than decode garbage (the hbs unsupported-token
            # policy; restart support is a documented non-goal)
            if len(payload) < 2:
                raise ValueError("truncated DRI segment")
            if struct.unpack_from(">H", payload)[0] != 0:
                raise ValueError(
                    "restart intervals (DRI/RSTn) unsupported by this "
                    "baseline decoder"
                )
        elif marker == 0xDA:  # SOS: entropy data follows the payload
            ns = payload[0]
            scan_order = []
            for i in range(ns):
                cid = payload[1 + 2 * i]
                t = payload[2 + 2 * i]
                scan_tables[cid] = (t >> 4, t & 0x0F)
                scan_order.append(cid)
            pos += 2 + length
            break
        pos += 2 + length
    if width is None or not qtables or not dc_tables or not scan_tables:
        raise ValueError("missing SOF0/DQT/DHT before SOS")
    # the MCU walk below interleaves components in SOF order; a scan
    # that lists fewer components (progressive-style per-component
    # scans) or a different order would misassign blocks to tables
    if scan_order != [cid for cid, _, _, _ in comps]:
        raise ValueError(
            "SOS component set/order must match SOF0 (single "
            "interleaved scan); per-component scans unsupported"
        )
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mx = (width + 8 * hmax - 1) // (8 * hmax)
    my = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((my * v * 8, mx * h * 8), dtype=np.float64)
        for _, h, v, _ in comps
    ]
    prev_dc = [0] * len(comps)
    rd = _BitReader(blob, pos)
    n_blocks = 0
    for myi in range(my):
        for mxi in range(mx):
            for ci, (cid, h, v, tq) in enumerate(comps):
                dct = dc_tables[scan_tables[cid][0]]
                act = ac_tables[scan_tables[cid][1]]
                for dv in range(v):
                    for dh in range(h):
                        zz, prev_dc[ci] = _decode_scan_block(
                            rd, dct, act, prev_dc[ci]
                        )
                        block = _idct_block(zz, qtables[tq])
                        r0 = (myi * v + dv) * 8
                        c0 = (mxi * h + dh) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
                        n_blocks += 1
    out = []
    for (cid, h, v, tq), plane in zip(comps, planes):
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        out.append(
            np.clip(np.floor(plane + 0.5), 0, 255).astype(np.uint8)[
                :ch, :cw
            ]
        )
    return width, height, out, n_blocks


def _decode_jpeg(blob: bytes) -> tuple[int, int, np.ndarray, int]:
    """Single-component convenience wrapper over
    :func:`_decode_jpeg_planes`; returns (width, height, HxW uint8,
    n_blocks)."""
    width, height, planes, n_blocks = _decode_jpeg_planes(blob)
    if len(planes) != 1:
        raise ValueError("gray decode path got a multi-component image")
    return width, height, planes[0], n_blocks


# ---- color 4:2:0 with real quantization (round 10, VERDICT r9 item 5)
#
# The mono fixture uses the all-ones table (finest legal quantization)
# so its error budget is pure DCT rounding. Real web JPEGs quantize
# hard; this section adds the ITU-T T.81 Annex K.1/K.2 example tables
# (the de-facto "quality 50" tables every camera/libjpeg derivative
# scales) and 4:2:0 YCbCr — luma sampled 2x2, chroma 1x1 — the single
# most common layout in a web corpus. The error claim changes shape:
# with quantizer steps q_i, each dequantized coefficient is within
# q_i/2 of the true one, and the DCT is orthonormal, so per-block
# pixel-domain L2 error <= sqrt(sum_i (q_i/2)^2), plus sqrt(64*0.5^2)
# for the final half-up pixel rounding — a PROVABLE per-block SSE
# bound, a module constant the oracle can restate.

_QT_LUMA = np.array([  # T.81 Table K.1, natural (row-major) order
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

_QT_CHROMA = np.array([  # T.81 Table K.2, natural order
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

# T.81 Annex K.3.3 typical CHROMINANCE Huffman specs. As with the
# luminance tables above, only the encoder consults these — the DHT
# segments carry them in-stream and the decoder rebuilds from bytes.
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _block_sse_bound(qt: np.ndarray) -> float:
    """Provable per-block pixel-domain SSE bound for quantizer ``qt``:
    (||q/2||_2 via Parseval + 0.5-per-pixel rounding L2)^2. Clamping to
    [0,255] only shrinks error (the true pixel is in range)."""
    return float(
        (np.sqrt(np.sum((qt / 2.0) ** 2)) + np.sqrt(64 * 0.25)) ** 2
    )


JPEG420_Y_SSE_BOUND = int(np.ceil(4 * _block_sse_bound(_QT_LUMA)))
JPEG420_C_SSE_BOUND = int(np.ceil(_block_sse_bound(_QT_CHROMA)))


def _zigzag_bytes(qt: np.ndarray) -> bytes:
    """Natural-order 8x8 table -> the zigzag byte order DQT ships."""
    return bytes(int(qt[r, c]) for r, c in _ZIGZAG)


def _encode_jpeg_420(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Baseline JFIF, 3 components, 4:2:0 (luma 2x2, chroma 1x1), the
    Annex K.1/K.2 quant tables and K.3.3 luma+chroma Huffman tables.
    ``y`` is 16x16 (one MCU = four luma blocks in 2x2 order), ``cb`` /
    ``cr`` are the 8x8 subsampled chroma planes."""
    if y.shape != (16, 16) or cb.shape != (8, 8) or cr.shape != (8, 8):
        raise ValueError("fixture shape is y 16x16, cb/cr 8x8")
    dc_l = _huff_codes(_DC_BITS, _DC_VALS)
    ac_l = _huff_codes(_AC_BITS, _AC_VALS)
    dc_c = _huff_codes(_DC_BITS_C, _DC_VALS_C)
    ac_c = _huff_codes(_AC_BITS_C, _AC_VALS_C)
    wr = _BitWriter()
    prev = 0
    for dv in range(2):  # the one MCU: Y blocks in 2x2 raster order
        for dh in range(2):
            blk = y[dv * 8 : dv * 8 + 8, dh * 8 : dh * 8 + 8]
            prev = _encode_block(blk, prev, wr, dc_l, ac_l, _QT_LUMA)
    prev = _encode_block(cb, 0, wr, dc_c, ac_c, _QT_CHROMA)
    prev = _encode_block(cr, 0, wr, dc_c, ac_c, _QT_CHROMA)
    scan = wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(
        0xDB,
        bytes([0x00]) + _zigzag_bytes(_QT_LUMA)
        + bytes([0x01]) + _zigzag_bytes(_QT_CHROMA),
    )
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0])   # Y: 2x2 sampling, quant table 0
        + bytes([2, 0x11, 1])   # Cb: 1x1, quant table 1
        + bytes([3, 0x11, 1]),  # Cr
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
        + bytes([0x01]) + bytes(_DC_BITS_C) + bytes(_DC_VALS_C)
        + bytes([0x11]) + bytes(_AC_BITS_C) + bytes(_AC_VALS_C),
    )
    sos = seg(
        0xDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    jfif = seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0]))
    return (
        b"\xff\xd8" + jfif + dqt + sof + dht + sos + scan + b"\xff\xd9"
    )


def synthesize_jpeg(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, jpeg binary) — the embedding quantized onto 0..255 gray with
    the SAME half-up byte mapping as :func:`synthesize_bmp`, encoded
    through a real baseline-JFIF DCT/Huffman pipeline as a 16x8 two-MCU
    image [g | reverse(g)]."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("jpeg", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                g = np.clip(np.floor((x + 1.0) / 2.0 * 255.0 + 0.5), 0, 255)
                blobs.append(_encode_jpeg(g))
            yield pd.DataFrame({"vec_id": pdf[id_col], "jpeg": blobs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


JPEG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def decode_jpeg_pixels(
    df: DataFrame, id_col: str = "vec_id", jpeg_col: str = "jpeg"
) -> DataFrame:
    """Real lossy decode → (dims, MCU count, row-major decoded pixels),
    one Arrow pass. The pixel array goes back to the caller so the
    reconstruction-error gate can be computed JVM-side against the
    relationally-derivable source gray (JPEG is lossy: the decoded mean
    itself has no ANSI restatement, the error BOUND does)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[jpeg_col]):
                w, h, img, n_blocks = _decode_jpeg(bytes(blob))
                rows.append(
                    (int(vid), w, h, n_blocks,
                     [int(v) for v in img.reshape(-1)])
                )
            yield pd.DataFrame(
                rows,
                columns=["vec_id", "width", "height", "n_blocks", "pixels"],
            )

    return df.mapInPandas(feats, JPEG_DECODE_SCHEMA)


def synthesize_jpeg_420(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, jpeg binary) — a color 4:2:0 fixture from the embedding's
    half-up byte gray g (8x8): Y is the 16x16 quadrant tiling
    [g, rev(g); rev(g), g], Cb the byte complement 255-g, Cr the
    element reversal rev(g) — every plane exactly derivable
    relationally from the source floats."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("jpeg", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                g = np.clip(
                    np.floor((x + 1.0) / 2.0 * 255.0 + 0.5), 0, 255
                ).astype(np.uint8)
                gb = g.reshape(8, 8)
                rb = g[::-1].reshape(8, 8)
                y = np.vstack([np.hstack([gb, rb]), np.hstack([rb, gb])])
                blobs.append(_encode_jpeg_420(y, 255 - gb, rb))
            yield pd.DataFrame({"vec_id": pdf[id_col], "jpeg": blobs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


JPEG420_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("y_pixels", T.ArrayType(T.IntegerType())),
        T.StructField("cb_pixels", T.ArrayType(T.IntegerType())),
        T.StructField("cr_pixels", T.ArrayType(T.IntegerType())),
    ]
)


def decode_jpeg_420_planes(
    df: DataFrame, id_col: str = "vec_id", jpeg_col: str = "jpeg"
) -> DataFrame:
    """Real 3-component 4:2:0 decode → per-plane row-major pixels at
    each plane's own resolution (chroma stays subsampled). The planes
    go back to the caller so the per-plane SSE gates (the provable
    quantizer bounds ``JPEG420_Y_SSE_BOUND`` / ``JPEG420_C_SSE_BOUND``)
    run JVM-side against the relationally-derived sources."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[jpeg_col]):
                w, h, planes, n_blocks = _decode_jpeg_planes(bytes(blob))
                if len(planes) != 3:
                    raise ValueError("expected a 3-component image")
                rows.append(
                    (int(vid), w, h, n_blocks)
                    + tuple(
                        [int(v) for v in p.reshape(-1)] for p in planes
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "vec_id", "width", "height", "n_blocks",
                    "y_pixels", "cb_pixels", "cr_pixels",
                ],
            )

    return df.mapInPandas(feats, JPEG420_DECODE_SCHEMA)
