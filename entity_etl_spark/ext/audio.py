"""Audio columns with a REAL decoder (E5 upgrade, SURVEY §2.3).

Unlike the generic media stub (:mod:`multimodal`), WAV/PCM needs no codec
library — the format is a 44-byte RIFF header plus a raw little-endian
sample array, fully parseable with numpy. This module carries genuine
binary audio through the engine:

- :func:`synthesize_wav` — test-harness encoder: per row, a 16-bit mono
  PCM WAV whose samples quantize the row's embedding vector
  (``floor(x * 32767 + 0.5)`` clamped to int16 — half-up rounding chosen
  because every SQL engine's ``round``/``floor`` matches it, so an oracle
  can re-derive the exact samples from the source floats).
- :func:`decode_wav_features` — the real decode path: validate the RIFF
  structure, read the header fields, ``np.frombuffer`` the PCM block, and
  emit per-clip features (sample count, rate, RMS, peak). Arrow-batched
  ``mapInPandas``; blobs never shuffle (features only from here on — the
  :mod:`multimodal` discipline).

All sample math is exact: int16 values squared and summed stay within
double precision, so RMS/peak are bit-identical to a relational
restatement over the original floats — that is what the driver oracle
checks end-to-end through the binary round trip.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SAMPLE_RATE = 8000


def _encode_wav(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    """Minimal canonical RIFF/WAVE encoder: 16-bit mono PCM."""
    pcm = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16,
        1,              # PCM
        1,              # mono
        rate,
        rate * 2,       # byte rate
        2,              # block align
        16,             # bits per sample
        b"data", len(pcm),
    )
    return hdr + pcm


def _iter_riff_chunks(blob: bytes):
    """Walk a RIFF/WAVE container chunk by chunk (word-aligned sizes),
    yielding ``(chunk_id, body)``. One parser for every WAV flavor the
    module reads — PCM and ADPCM dispatch on the fmt tag, and external
    files with fmt extensions or LIST/fact chunks before data parse
    correctly instead of misreading fixed offsets."""
    if blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # a silently short body would decode to fewer samples with
            # no error (quietly wrong durations downstream) — corrupt
            # input must be loud
            raise ValueError(
                f"truncated RIFF chunk {cid!r}: declared {size} bytes, "
                f"{len(body)} present"
            )
        yield cid, body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned


def _decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a 16-bit mono PCM WAV; returns (sample_rate, n_samples,
    data). Chunk-walking, so fmt extensions / LIST / fact chunks ahead
    of data are tolerated."""
    fmt = data_body = None
    for cid, body in _iter_riff_chunks(blob):
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data_body = body
    if fmt is None or data_body is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if (audio_fmt, channels, bits) != (1, 1, 16):
        raise ValueError("decoder supports 16-bit mono PCM only")
    data = np.frombuffer(data_body, dtype="<i2", count=len(data_body) // 2)
    return rate, len(data), data


def synthesize_wav(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, wav binary) — embedding quantized half-up to int16 PCM."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("wav", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wavs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                s = np.clip(np.floor(x * 32767.0 + 0.5), -32768, 32767)
                wavs.append(_encode_wav(s))
            yield pd.DataFrame({"vec_id": pdf[id_col], "wav": wavs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak_abs", T.IntegerType()),
    ]
)


def decode_wav_features(
    df: DataFrame, id_col: str = "vec_id", wav_col: str = "wav"
) -> DataFrame:
    """Real binary decode → per-clip features. One Arrow pass; output
    carries features only (never re-shuffle the blobs)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[wav_col]):
                rate, n, data = _decode_wav(bytes(blob))
                d = data.astype(np.float64)
                rows.append(
                    (
                        int(vid),
                        rate,
                        n,
                        round(float(np.sqrt(np.mean(d * d))), 6) if n else 0.0,
                        # widen before abs: np.abs(int16(-32768)) overflows
                        int(np.max(np.abs(data.astype(np.int32)))) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["vec_id", "sample_rate", "n_samples", "rms", "peak_abs"]
            )

    return df.mapInPandas(feats, WAV_FEATURE_SCHEMA)


# ------------------------------------------------------------- IMA ADPCM
#
# The first COMPRESSED audio codec in the engine (4.1:1 vs 16-bit PCM):
# IMA/DVI ADPCM as carried in WAV files (wFormatTag 0x11). The algorithm
# is public (IMA Digital Audio Pack, 1992; the same tables appear in
# RFC 3551 §4.5.1's DVI4 registration) and table-driven: a 89-entry
# adaptive step table, a per-sample 4-bit code (sign + 3 magnitude
# bits), predictor feedback, and an index-adaptation table. Each WAV
# block opens with the EXACT first sample (int16) + step index, so one
# value per block round-trips losslessly — the oracle-pairing anchor —
# while the remaining samples carry bounded quantization noise (the
# lossy claim, gated like JPEG's reconstruction bound).

_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8) * 2  # low 3 bits + sign


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One decoder state transition (shared by encode feedback)."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble]))
    return predictor, index


def _encode_nibbles(samples) -> tuple[int, list[int]]:
    """Quantize ``samples`` to the IMA 4-bit code stream: returns the
    exact first sample (block-header anchor) and one nibble per
    remaining sample."""
    first = int(samples[0])
    predictor, index = first, 0
    nibbles = []
    for s in samples[1:]:
        step = _IMA_STEP_TABLE[index]
        diff = int(s) - predictor
        n = 0
        if diff < 0:
            n = 8
            diff = -diff
        if diff >= step:
            n |= 4
            diff -= step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            n |= 1
        predictor, index = _ima_step(predictor, index, n)
        nibbles.append(n)
    return first, nibbles


def _pack_nibbles(nibbles: list[int]) -> bytes:
    if len(nibbles) % 2:
        nibbles = nibbles + [0]
    return bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )


def _adpcm_encode_block(samples) -> bytes:
    """One mono IMA ADPCM block: 4-byte header (first sample int16,
    step index, reserved) + one 4-bit code per remaining sample, packed
    low-nibble-first, zero-padded to a whole byte. An empty clip emits
    a header-only block (first=0) so zero-length vectors don't kill an
    Arrow batch."""
    if len(samples) == 0:
        return struct.pack("<hBB", 0, 0, 0)
    first, nibbles = _encode_nibbles(samples)
    return struct.pack("<hBB", first, 0, 0) + _pack_nibbles(nibbles)


def _unpack_nibbles(data: bytes) -> list[int]:
    """Low-nibble-first 4-bit code stream."""
    out: list[int] = []
    for b in data:
        out.append(b & 0x0F)
        out.append(b >> 4)
    return out


def _adpcm_decode_block(block: bytes, n_samples: int) -> np.ndarray:
    if n_samples == 0:
        return np.empty(0, dtype=np.int16)
    if len(block) < 4 + (n_samples - 1 + 1) // 2:
        raise ValueError("truncated ADPCM block")
    predictor, index = struct.unpack_from("<hB", block, 0)
    return _decode_nibbles(
        predictor, index, _unpack_nibbles(block[4:]), n_samples
    )


# Stereo blocks (the RIFF multimedia spec's layout for wFormatTag 0x11,
# nChannels 2): one 4-byte state header PER CHANNEL (left then right),
# then the code stream interleaved in 4-byte words — 8 left nibbles,
# 8 right nibbles, repeating. Each channel runs its own independent
# predictor/step state, so the mono quantizer applies per channel.

def _decode_nibbles(predictor: int, index: int, nibbles, n: int) -> np.ndarray:
    if not 0 <= index <= 88:
        raise ValueError("ADPCM step index out of range")
    out = np.empty(n, dtype=np.int16)
    out[0] = predictor
    for i, nib in zip(range(1, n), nibbles):
        predictor, index = _ima_step(predictor, index, nib)
        out[i] = predictor
    return out


def _adpcm_encode_block_stereo(left, right) -> bytes:
    """One stereo IMA ADPCM block: per-channel headers + 4-byte-word
    interleave. Both channels must be the same length (sample frames);
    each channel's trailing word is zero-nibble padded."""
    n = len(left)
    if len(right) != n:
        raise ValueError("stereo channels must have equal length")
    if n == 0:
        return struct.pack("<hBBhBB", 0, 0, 0, 0, 0, 0)
    fl, nl = _encode_nibbles(left)
    fr, nr = _encode_nibbles(right)
    groups = (len(nl) + 7) // 8
    nl += [0] * (groups * 8 - len(nl))
    nr += [0] * (groups * 8 - len(nr))
    out = [struct.pack("<hBB", fl, 0, 0), struct.pack("<hBB", fr, 0, 0)]
    for g in range(groups):
        out.append(_pack_nibbles(nl[g * 8 : g * 8 + 8]))
        out.append(_pack_nibbles(nr[g * 8 : g * 8 + 8]))
    return b"".join(out)


def _adpcm_decode_block_stereo(
    block: bytes, n_samples: int
) -> tuple[np.ndarray, np.ndarray]:
    if n_samples == 0:
        e = np.empty(0, dtype=np.int16)
        return e, e
    groups = (n_samples - 1 + 7) // 8
    if len(block) < 8 + groups * 8:
        # a short read here must raise, not spin: the interleave walk
        # below would otherwise loop forever on empty slices
        raise ValueError("truncated stereo ADPCM block")
    pl, il = struct.unpack_from("<hB", block, 0)
    pr, ir = struct.unpack_from("<hB", block, 4)
    nl: list[int] = []
    nr: list[int] = []
    pos = 8
    while len(nl) < n_samples - 1:
        for target in (nl, nr):
            target.extend(_unpack_nibbles(block[pos : pos + 4]))
            pos += 4
    return (
        _decode_nibbles(pl, il, nl, n_samples),
        _decode_nibbles(pr, ir, nr, n_samples),
    )


def _encode_adpcm_wav(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    """RIFF/WAVE, wFormatTag 0x11 (IMA ADPCM), mono, one block per clip
    (clips here are embedding-length — far under the 4-byte-header
    amortization point where real encoders split blocks). fmt carries
    the spec's cbSize=2 wSamplesPerBlock extension; a fact chunk holds
    the exact sample count (required for compressed WAV formats)."""
    n = len(samples)
    block = _adpcm_encode_block(samples)
    block_align = len(block)
    fmt = struct.pack(
        "<4sI HHIIHH H H",
        b"fmt ", 20,
        0x11,            # IMA ADPCM
        1,               # mono
        rate,
        rate * block_align // max(n, 1),   # avg bytes/sec for this layout
        block_align,
        4,               # bits per (compressed) sample
        2,               # cbSize
        n,               # wSamplesPerBlock
    )
    fact = struct.pack("<4sII", b"fact", 4, n)
    data = struct.pack("<4sI", b"data", len(block)) + block
    body = b"WAVE" + fmt + fact + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def _decode_adpcm_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Chunk-walking parse; returns (rate, n_samples, int16 samples)."""
    rate, channels, n_samples, block = _parse_adpcm_chunks(blob)
    if channels != 1:
        raise ValueError("mono decode path got a multi-channel clip")
    return rate, n_samples, _adpcm_decode_block(block, n_samples)


def _decode_adpcm_wav_stereo(
    blob: bytes,
) -> tuple[int, int, np.ndarray, np.ndarray]:
    """Returns (rate, n_sample_frames, left, right)."""
    rate, channels, n_samples, block = _parse_adpcm_chunks(blob)
    if channels != 2:
        raise ValueError("stereo decode path needs a 2-channel clip")
    left, right = _adpcm_decode_block_stereo(block, n_samples)
    return rate, n_samples, left, right


def _parse_adpcm_chunks(blob: bytes) -> tuple[int, int, int, bytes]:
    """Shared RIFF walk for IMA ADPCM WAVs; returns
    (rate, channels, n_sample_frames, data block)."""
    rate = channels = n_samples = block = None
    for cid, body in _iter_riff_chunks(blob):
        if cid == b"fmt ":
            tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            if tag != 0x11 or channels not in (1, 2):
                raise ValueError(
                    "decoder supports mono/stereo IMA ADPCM (0x11)"
                )
        elif cid == b"fact":
            (n_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            block = body
    if rate is None or n_samples is None or block is None:
        raise ValueError("missing fmt/fact/data chunk")
    return rate, channels, n_samples, block


def _encode_adpcm_wav_stereo(
    left: np.ndarray, right: np.ndarray, rate: int = SAMPLE_RATE
) -> bytes:
    """RIFF/WAVE, wFormatTag 0x11, nChannels 2, one stereo block per
    clip (per-channel 4-byte headers + 4-byte-word interleave)."""
    n = len(left)
    block = _adpcm_encode_block_stereo(left, right)
    block_align = len(block)
    fmt = struct.pack(
        "<4sI HHIIHH H H",
        b"fmt ", 20,
        0x11,            # IMA ADPCM
        2,               # stereo
        rate,
        rate * block_align // max(n, 1),
        block_align,
        4,               # bits per (compressed) sample
        2,               # cbSize
        n,               # wSamplesPerBlock (frames)
    )
    fact = struct.pack("<4sII", b"fact", 4, n)
    data = struct.pack("<4sI", b"data", len(block)) + block
    body = b"WAVE" + fmt + fact + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def synthesize_adpcm(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, wav binary) — the same half-up int16 quantization as
    :func:`synthesize_wav`, then IMA ADPCM compression (4-bit codes)."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("wav", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wavs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                s = np.clip(np.floor(x * 32767.0 + 0.5), -32768, 32767)
                wavs.append(_encode_adpcm_wav(s.astype(np.int64)))
            yield pd.DataFrame({"vec_id": pdf[id_col], "wav": wavs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


ADPCM_SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_block_bytes", T.IntegerType()),
        T.StructField("first_sample", T.IntegerType()),
        T.StructField("refix_ok", T.BooleanType()),
        T.StructField("samples", T.ArrayType(T.IntegerType())),
    ]
)


def decode_adpcm_samples(
    df: DataFrame, id_col: str = "vec_id", wav_col: str = "wav"
) -> DataFrame:
    """Real compressed decode → per-clip decoded samples (for the
    JVM-side error gate) + exactly-restatable header facts.
    ``n_block_bytes`` is the ACTUAL data-chunk size read from the
    container (not recomputed from n). ``refix_ok`` pins the codec's
    fixed-point property: re-encoding the decoded signal and decoding
    again must reproduce it EXACTLY (each already-reconstructable diff
    re-quantizes to the same 4-bit code, so the second pass is
    lossless — verified across seeds in tests). One Arrow pass; blobs
    never leave the map seam."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[wav_col]):
                rate, ch, n, block = _parse_adpcm_chunks(bytes(blob))
                if ch != 1:
                    raise ValueError(
                        "mono decode path got a multi-channel clip"
                    )
                data = _adpcm_decode_block(block, n)
                refix = _adpcm_decode_block(
                    _adpcm_encode_block(data.astype(np.int64)), n
                )
                rows.append(
                    (
                        int(vid),
                        rate,
                        n,
                        len(block),
                        int(data[0]) if n else 0,
                        bool(np.array_equal(data, refix)),
                        [int(v) for v in data],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "vec_id", "sample_rate", "n_samples", "n_block_bytes",
                    "first_sample", "refix_ok", "samples",
                ],
            )

    return df.mapInPandas(dec, ADPCM_SAMPLES_SCHEMA)


def synthesize_adpcm_stereo(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, wav binary) — the embedding de-interleaved into L/R sample
    frames (even 0-based positions left, odd right; a trailing odd
    element is dropped), each channel quantized half-up to int16 and
    compressed as one stereo IMA ADPCM block."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("wav", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wavs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                s = np.clip(np.floor(x * 32767.0 + 0.5), -32768, 32767)
                frames = len(s) // 2
                s = s[: frames * 2].astype(np.int64)
                wavs.append(_encode_adpcm_wav_stereo(s[0::2], s[1::2]))
            yield pd.DataFrame({"vec_id": pdf[id_col], "wav": wavs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


ADPCM_STEREO_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_block_bytes", T.IntegerType()),
        T.StructField("first_left", T.IntegerType()),
        T.StructField("first_right", T.IntegerType()),
        T.StructField("refix_ok", T.BooleanType()),
        T.StructField("left_samples", T.ArrayType(T.IntegerType())),
        T.StructField("right_samples", T.ArrayType(T.IntegerType())),
    ]
)


def decode_adpcm_stereo_samples(
    df: DataFrame, id_col: str = "vec_id", wav_col: str = "wav"
) -> DataFrame:
    """Stereo twin of :func:`decode_adpcm_samples`: per-channel decoded
    samples + exactly-restatable container facts (both block-header
    first samples are lossless; ``n_block_bytes`` is the on-disk data
    chunk: 8 header bytes + 8 bytes per interleave group). ``refix_ok``
    pins the per-channel fixed point through the stereo interleave."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[wav_col]):
                rate, ch, n, block = _parse_adpcm_chunks(bytes(blob))
                if ch != 2:
                    raise ValueError("stereo decode path needs 2 channels")
                left, right = _adpcm_decode_block_stereo(block, n)
                rl, rr = _adpcm_decode_block_stereo(
                    _adpcm_encode_block_stereo(
                        left.astype(np.int64), right.astype(np.int64)
                    ),
                    n,
                )
                rows.append(
                    (
                        int(vid),
                        rate,
                        n,
                        len(block),
                        int(left[0]) if n else 0,
                        int(right[0]) if n else 0,
                        bool(
                            np.array_equal(left, rl)
                            and np.array_equal(right, rr)
                        ),
                        [int(v) for v in left],
                        [int(v) for v in right],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "vec_id", "sample_rate", "n_frames", "n_block_bytes",
                    "first_left", "first_right", "refix_ok",
                    "left_samples", "right_samples",
                ],
            )

    return df.mapInPandas(dec, ADPCM_STEREO_SCHEMA)
