"""IMA/DVI ADPCM codec (entity_etl_spark/ext/audio.py, round 9).

Hand-derived state-machine vectors (worked in comments below against
the public IMA tables), container framing, the fixed-point
(re-encode-is-exact) property, and the Spark seam.
"""

import struct

import numpy as np
import pytest

from entity_etl_spark.ext import audio as au

# Hand derivation, step table starts (7, 8, ..., index 8 -> 16,
# index 16 -> 34), index table (-1,-1,-1,-1,2,4,6,8)*2:
#   start: predictor=100, index=0 (step 7)
#   nibble 0x0: diff = 7>>3 = 0            -> 100, index -1 -> clamp 0
#   nibble 0x7: diff = 0+1+3+7 = 11        -> 111, index +8 -> 8 (16)
#   nibble 0xF: diff = 2+4+8+16 = 30, sign -> 81,  index +8 -> 16 (34)
#   nibble 0x3: diff = 4+8+17 = 29         -> 110, index -1 -> 15
HAND_SAMPLES = [100, 100, 111, 81, 110]
# nibbles [0,7,15,3] packed low-first: 0|7<<4 = 0x70, 15|3<<4 = 0x3F
HAND_BLOCK = struct.pack("<hBB", 100, 0, 0) + bytes([0x70, 0x3F])


def test_decode_hand_vector():
    out = au._adpcm_decode_block(HAND_BLOCK, 5)
    assert out.tolist() == HAND_SAMPLES


def test_encode_hand_vector_exact_bytes():
    assert au._adpcm_encode_block(np.array(HAND_SAMPLES)) == HAND_BLOCK


def test_step_clamps():
    # predictor clamps to int16; index clamps to [0, 88]
    p, i = au._ima_step(32760, 88, 0x7)
    assert p == 32767 and i == 88
    p, i = au._ima_step(-32760, 0, 0xF)
    assert p == -32768 and i == 8


def test_wav_container_roundtrip():
    rng = np.random.default_rng(3)
    x = np.clip(
        np.floor(rng.uniform(-1, 1, 64) * 32767 + 0.5), -32768, 32767
    ).astype(np.int64)
    blob = au._encode_adpcm_wav(x)
    rate, n, dec = au._decode_adpcm_wav(blob)
    assert (rate, n) == (au.SAMPLE_RATE, 64)
    assert dec[0] == x[0]  # block header carries sample 0 exactly
    assert dec.dtype == np.int16
    # container facts: data chunk is 4-byte header + 32 nibble bytes
    _, ch, _, block = au._parse_adpcm_chunks(blob)
    assert ch == 1
    assert len(block) == 4 + 64 // 2


def test_odd_sample_count_padding():
    x = np.array([5, -4000, 8000, 123, -9], dtype=np.int64)
    rate, n, dec = au._decode_adpcm_wav(au._encode_adpcm_wav(x))
    assert n == 5
    _, _, _, block = au._parse_adpcm_chunks(au._encode_adpcm_wav(x))
    assert len(block) == 4 + 5 // 2  # 4 nibbles -> 2 bytes


def test_reencode_fixed_point():
    # decoding then re-encoding reproduces the decoded signal EXACTLY:
    # every already-reconstructable diff re-quantizes to its own code
    for seed in range(10):
        rng = np.random.default_rng(seed)
        x = np.clip(
            np.floor(rng.uniform(-1, 1, 64) * 32767 + 0.5), -32768, 32767
        ).astype(np.int64)
        _, _, d1 = au._decode_adpcm_wav(au._encode_adpcm_wav(x))
        _, _, d2 = au._decode_adpcm_wav(
            au._encode_adpcm_wav(d1.astype(np.int64))
        )
        assert np.array_equal(d1, d2)


def test_rejects_non_adpcm():
    pcm = au._encode_wav(np.zeros(4))
    with pytest.raises(ValueError, match="IMA ADPCM"):
        au._decode_adpcm_wav(pcm)


def test_empty_clip_guard():
    # zero-length clips emit/accept a header-only block instead of
    # IndexError-ing the whole Arrow batch (ADVICE r9)
    blk = au._adpcm_encode_block(np.array([], dtype=np.int64))
    assert blk == struct.pack("<hBB", 0, 0, 0)
    assert au._adpcm_decode_block(blk, 0).tolist() == []
    sblk = au._adpcm_encode_block_stereo(
        np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    )
    l, r = au._adpcm_decode_block_stereo(sblk, 0)
    assert l.tolist() == [] and r.tolist() == []


def test_pcm_decode_chunk_walk_tolerates_extra_chunks():
    # an external WAV with a LIST chunk between fmt and data must parse
    # (ADVICE r9: the PCM path now shares the RIFF chunk walker)
    x = np.array([1, -2, 3, -4], dtype=np.int64)
    blob = au._encode_wav(x)
    # splice a LIST chunk after fmt (offset 12..36 is fmt in our layout)
    fmt_end = 12 + 8 + 16
    listc = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    spliced = blob[:fmt_end] + listc + blob[fmt_end:]
    rate, n, dec = au._decode_wav(spliced)
    assert (rate, n) == (au.SAMPLE_RATE, 4)
    assert dec.tolist() == [1, -2, 3, -4]


# Stereo hand vector: left channel = HAND_SAMPLES, right = all-zero
# (nibble 0 stream: predictor stays 0, index clamps at 0). Layout per
# the RIFF spec: two 4-byte channel headers, then 4 bytes of LEFT
# nibbles (codes 0,7,15,3 + four pad zeros -> 0x70 0x3F 0x00 0x00)
# followed by 4 bytes of RIGHT nibbles (all zero).
def test_stereo_hand_vector_layout():
    left = np.array(HAND_SAMPLES, dtype=np.int64)
    right = np.zeros(5, dtype=np.int64)
    blk = au._adpcm_encode_block_stereo(left, right)
    expect = (
        struct.pack("<hBB", 100, 0, 0)
        + struct.pack("<hBB", 0, 0, 0)
        + bytes([0x70, 0x3F, 0x00, 0x00])
        + bytes([0x00, 0x00, 0x00, 0x00])
    )
    assert blk == expect
    l, r = au._adpcm_decode_block_stereo(blk, 5)
    assert l.tolist() == HAND_SAMPLES
    assert r.tolist() == [0, 0, 0, 0, 0]


def test_stereo_container_roundtrip_and_fixed_point():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        q = np.clip(
            np.floor(rng.uniform(-1, 1, 64) * 32767 + 0.5), -32768, 32767
        ).astype(np.int64)
        left, right = q[0::2], q[1::2]
        blob = au._encode_adpcm_wav_stereo(left, right)
        rate, n, dl, dr = au._decode_adpcm_wav_stereo(blob)
        assert (rate, n) == (au.SAMPLE_RATE, 32)
        assert dl[0] == left[0] and dr[0] == right[0]  # exact headers
        # channels decode independently: mono-encoding each channel
        # alone gives the same samples as the stereo interleave
        ml = au._adpcm_decode_block(au._adpcm_encode_block(left), 32)
        mr = au._adpcm_decode_block(au._adpcm_encode_block(right), 32)
        assert np.array_equal(dl, ml) and np.array_equal(dr, mr)
        # fixed point through the interleave
        blob2 = au._encode_adpcm_wav_stereo(
            dl.astype(np.int64), dr.astype(np.int64)
        )
        _, _, d2l, d2r = au._decode_adpcm_wav_stereo(blob2)
        assert np.array_equal(dl, d2l) and np.array_equal(dr, d2r)
        # container facts: 8 header bytes + 8 per interleave group
        _, ch, _, block = au._parse_adpcm_chunks(blob)
        assert ch == 2
        assert len(block) == 8 + ((32 - 1 + 7) // 8) * 8


def test_stereo_rejects_mismatched_channels():
    with pytest.raises(ValueError, match="equal length"):
        au._adpcm_encode_block_stereo(
            np.array([1, 2], dtype=np.int64), np.array([1], dtype=np.int64)
        )
    mono = au._encode_adpcm_wav(np.array([1, 2, 3], dtype=np.int64))
    with pytest.raises(ValueError, match="2-channel"):
        au._decode_adpcm_wav_stereo(mono)


def test_stereo_spark_seam(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.5, -0.25, 0.0, 1.0]),
            Row(vec_id=2, embedding=[-1.0, 0.75, 0.1, -0.3, 0.9]),
        ]
    )
    out = au.decode_adpcm_stereo_samples(
        au.synthesize_adpcm_stereo(df)
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert by_id[1].n_frames == 2
    assert by_id[2].n_frames == 2  # trailing odd element dropped
    assert by_id[1].first_left == int(np.floor(0.5 * 32767 + 0.5))
    assert by_id[1].first_right == int(np.floor(-0.25 * 32767 + 0.5))
    assert all(r.refix_ok for r in out)
    assert all(r.n_block_bytes == 8 + 8 for r in out)  # 1 group
    assert all(
        len(r.left_samples) == len(r.right_samples) == r.n_frames
        for r in out
    )


def test_spark_seam(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.5, -0.25, 0.0, 1.0]),
            Row(vec_id=2, embedding=[-1.0, 0.75, 0.1, -0.3]),
        ]
    )
    out = au.decode_adpcm_samples(au.synthesize_adpcm(df)).collect()
    by_id = {r.vec_id: r for r in out}
    assert by_id[1].n_samples == 4
    assert by_id[1].first_sample == int(np.floor(0.5 * 32767 + 0.5))
    assert by_id[2].first_sample == -32767  # floor(-32767 + 0.5) = -32767
    assert all(r.refix_ok for r in out)
    assert all(r.n_block_bytes == 4 + 4 // 2 for r in out)
    assert all(len(r.samples) == 4 for r in out)


def test_truncated_blocks_raise_not_hang():
    # a fact chunk claiming more frames than the data holds must raise,
    # never spin (code-review r10: the stereo walk looped forever on
    # empty slices) — both layouts
    x = np.arange(16, dtype=np.int64) * 100
    mono = au._adpcm_encode_block(x)
    with pytest.raises(ValueError, match="truncated"):
        au._adpcm_decode_block(mono[:5], 16)
    st = au._adpcm_encode_block_stereo(x, x)
    with pytest.raises(ValueError, match="truncated"):
        au._adpcm_decode_block_stereo(st[:10], 16)


def test_mono_spark_seam_rejects_stereo_clip(spark):
    # decode_adpcm_samples must not silently garbage-decode a stereo
    # blob (code-review r10: the channels guard had moved out of
    # _parse_adpcm_chunks and this path lost it)
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.5, -0.25, 0.0, 1.0])]
    )
    stereo = au.synthesize_adpcm_stereo(df)
    with pytest.raises(Exception, match="multi-channel"):
        au.decode_adpcm_samples(stereo).collect()
