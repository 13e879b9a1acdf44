"""Round-9 additions: baseline JPEG/JFIF codec (E5's first LOSSY real
format — VERDICT r8 item 4).

The oracle-facing gate (image_jpeg_features) pins dims/MCU count/source
mean/error bound cross-engine; the tests here pin the codec INTERNALS
against hand-derived vectors, the PNG/GIF precedent: zigzag order, DCT
orthonormality, EXTEND coding, canonical Huffman code assignment (a
constant-128 image's entropy segment is exactly two hand-computed
bytes), byte stuffing, and the reconstruction-error bound on adversarial
random blocks (worst case for the all-ones quant table).
"""

import numpy as np
import pytest

from entity_etl_spark.ext.image import (
    _BitReader,
    _BitWriter,
    _category,
    _DCT_M,
    _decode_jpeg,
    _encode_jpeg,
    _extend,
    _ZIGZAG,
)


def test_zigzag_order():
    # T.81 figure 5: the first diagonals, hand-enumerated
    assert _ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert _ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(_ZIGZAG)) == 64


def test_dct_matrix_orthonormal():
    assert np.allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)
    # constant block: DC = 8 * value, all AC zero
    f = _DCT_M @ np.full((8, 8), 2.0) @ _DCT_M.T
    assert abs(f[0, 0] - 16.0) < 1e-9
    assert np.abs(f).sum() - abs(f[0, 0]) < 1e-9


def test_category_and_extend_roundtrip():
    assert _category(0) == 0
    assert _category(1) == _category(-1) == 1
    assert _category(255) == _category(-255) == 8
    for v in range(-255, 256):
        if v == 0:
            continue
        s = _category(v)
        receive = v if v >= 0 else v + (1 << s) - 1
        assert _extend(receive, s) == v, v


def test_bit_writer_stuffing_and_reader_unstuffing():
    wr = _BitWriter()
    wr.put(0xFF, 8)
    wr.put(0x1, 1)
    data = wr.flush()
    assert data[:2] == b"\xff\x00"  # stuffed zero after 0xFF
    rd = _BitReader(data, 0)
    assert rd.bits(8) == 0xFF
    assert rd.bit() == 1


def test_constant_128_scan_bytes_hand_derived():
    """g = 128 everywhere: level shift 0, every coefficient 0. Per MCU:
    DC category 0 -> Annex-K DC code '00' (2 bits), EOB -> AC code
    '1010' (4 bits). Two MCUs = 001010 001010, padded with 1111 =
    0x28 0xAF exactly."""
    blob = _encode_jpeg(np.full(64, 128.0))
    sos = blob.rindex(b"\xff\xda")
    scan = blob[sos + 2 + 8 : -2]  # SOS length field = 8 (6-byte payload)
    assert scan == b"\x28\xaf"
    w, h, img, n_blocks = _decode_jpeg(blob)
    assert (w, h, n_blocks) == (16, 8, 2)
    assert (img == 128).all()


def test_constant_block_roundtrips_exactly():
    for v in (0.0, 1.0, 130.0, 255.0):
        w, h, img, _ = _decode_jpeg(_encode_jpeg(np.full(64, v)))
        assert (img == int(v)).all(), v


def test_roundtrip_error_bound_random_blocks():
    """All-ones quant leaves forward-DCT coefficient rounding as the only
    loss; uniform-random blocks are the adversarial case and must stay
    within the gate bound (|err| <= 2; measured max 1)."""
    rng = np.random.default_rng(7)
    worst = 0
    for _ in range(50):
        g = rng.integers(0, 256, 64).astype(np.float64)
        w, h, img, n_blocks = _decode_jpeg(_encode_jpeg(g))
        assert (w, h, n_blocks) == (16, 8, 2)
        exp = np.concatenate(
            [g.reshape(8, 8), g[::-1].reshape(8, 8)], axis=1
        ).astype(np.int64)
        worst = max(worst, int(np.abs(img.astype(np.int64) - exp).max()))
    assert worst <= 2, worst


def test_decoder_rejects_non_baseline_and_garbage():
    blob = bytearray(_encode_jpeg(np.full(64, 90.0)))
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg(b"\x89PNG1234")
    # flip SOF0 -> SOF2 (progressive)
    sof = bytes(blob).index(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        _decode_jpeg(bytes(blob))


def test_decoder_reads_tables_from_stream_not_constants():
    """Swapping the two DHT value lists in the STREAM must change the
    decode outcome (proving the decoder builds its Huffman tables from
    the bytes it reads): with DC/AC specs exchanged the entropy segment
    no longer parses as valid codes."""
    blob = _encode_jpeg(np.arange(64, dtype=np.float64) * 4 % 256)
    dht = blob.index(b"\xff\xc4")
    (seg_len,) = int.from_bytes(blob[dht + 2 : dht + 4], "big"),
    payload = blob[dht + 4 : dht + 2 + seg_len]
    # payload = 0x00 + dc_spec + 0x10 + ac_spec; swap the class nibbles
    dc_end = 1 + 16 + sum(payload[1:17])
    swapped = (
        bytes([0x10]) + payload[1:dc_end] + bytes([0x00])
        + payload[dc_end + 1 :]
    )
    tampered = blob[: dht + 4] + swapped + blob[dht + 2 + seg_len :]
    with pytest.raises(ValueError):
        _decode_jpeg(tampered)


# ---- round 10: color 4:2:0 with the Annex K quant tables


def test_k_tables_shape_and_zigzag_serialization():
    from entity_etl_spark.ext.image import _QT_CHROMA, _QT_LUMA, _zigzag_bytes

    assert _QT_LUMA[0, 0] == 16 and _QT_LUMA[7, 7] == 99
    assert _QT_CHROMA[0, 0] == 17 and _QT_CHROMA[7, 7] == 99
    zz = _zigzag_bytes(_QT_LUMA)
    # zigzag starts (0,0),(0,1),(1,0),(2,0),(1,1),(0,2): 16,11,12,14,12,10
    assert list(zz[:6]) == [16, 11, 12, 14, 12, 10]
    assert len(zz) == 64


def test_chroma_huffman_specs_well_formed():
    from entity_etl_spark.ext.image import (
        _AC_BITS_C,
        _AC_VALS_C,
        _DC_BITS_C,
        _DC_VALS_C,
        _huff_codes,
    )

    assert sum(_DC_BITS_C) == len(_DC_VALS_C) == 12
    assert sum(_AC_BITS_C) == len(_AC_VALS_C) == 162
    assert len(set(_AC_VALS_C)) == 162  # no duplicate symbols
    # every run/size symbol the encoder can emit is covered
    ac = _huff_codes(_AC_BITS_C, _AC_VALS_C)
    for run in range(16):
        for size in range(1, 11):
            assert (run << 4) | size in ac
    assert 0x00 in ac and 0xF0 in ac  # EOB + ZRL
    # canonical codes are prefix-free by construction; check lengths
    assert all(1 <= length <= 16 for _, length in ac.values())


def test_420_roundtrip_within_provable_bound():
    from entity_etl_spark.ext.image import (
        JPEG420_C_SSE_BOUND,
        JPEG420_Y_SSE_BOUND,
        _decode_jpeg_planes,
        _encode_jpeg_420,
    )

    for seed in range(8):
        rng = np.random.default_rng(seed)
        g = (
            np.clip(np.floor(rng.uniform(0, 1, 64) * 255 + 0.5), 0, 255)
            .astype(np.uint8)
        )
        gb, rb = g.reshape(8, 8), g[::-1].reshape(8, 8)
        y = np.vstack([np.hstack([gb, rb]), np.hstack([rb, gb])])
        cb, cr = 255 - gb, rb
        w, h, planes, n_blocks = _decode_jpeg_planes(
            _encode_jpeg_420(y, cb, cr)
        )
        assert (w, h, n_blocks) == (16, 16, 6)
        assert [p.shape for p in planes] == [(16, 16), (8, 8), (8, 8)]
        ysse = float(((planes[0].astype(float) - y) ** 2).sum())
        assert ysse <= JPEG420_Y_SSE_BOUND
        for p, src in ((planes[1], cb), (planes[2], cr)):
            assert float(((p.astype(float) - src) ** 2).sum()) <= (
                JPEG420_C_SSE_BOUND
            )


def test_420_smooth_block_decodes_near_exact():
    # a constant image quantizes to DC-only blocks; with q[0,0]=16 the
    # DC step bounds the flat-field error at q/2 * (1/8 DC basis) < 1.5
    from entity_etl_spark.ext.image import _decode_jpeg_planes, _encode_jpeg_420

    y = np.full((16, 16), 200, dtype=np.uint8)
    cb = np.full((8, 8), 30, dtype=np.uint8)
    cr = np.full((8, 8), 99, dtype=np.uint8)
    _, _, planes, _ = _decode_jpeg_planes(_encode_jpeg_420(y, cb, cr))
    assert np.abs(planes[0].astype(int) - 200).max() <= 2
    assert np.abs(planes[1].astype(int) - 30).max() <= 2
    assert np.abs(planes[2].astype(int) - 99).max() <= 2


def test_420_decoder_reads_sampling_from_sof():
    # tamper the SOF luma sampling byte 0x22 -> 0x11: the MCU geometry
    # changes and the scan cannot parse as 6 valid blocks
    from entity_etl_spark.ext.image import _decode_jpeg_planes, _encode_jpeg_420

    y = np.arange(256, dtype=np.float64).reshape(16, 16) % 256
    blob = bytearray(
        _encode_jpeg_420(y, np.full((8, 8), 7.0), np.full((8, 8), 9.0))
    )
    sof = bytes(blob).index(b"\xff\xc0")
    assert blob[sof + 11] == 0x22
    blob[sof + 11] = 0x11
    try:
        w, h, planes, _ = _decode_jpeg_planes(bytes(blob))
        # if it parses at all, the luma plane must now be wrong
        assert planes[0].shape != (16, 16) or not np.allclose(
            planes[0].astype(float), y, atol=3
        )
    except ValueError:
        pass  # invalid codes mid-scan is the other acceptable outcome


def test_420_spark_seam(spark):
    from pyspark.sql import Row

    from entity_etl_spark.ext.image import (
        decode_jpeg_420_planes,
        synthesize_jpeg_420,
    )

    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[((i * 37) % 128) / 64.0 - 1.0 for i in range(64)]),
            Row(vec_id=2, embedding=[((i * 11) % 97) / 48.0 - 1.0 for i in range(64)]),
        ]
    )
    out = decode_jpeg_420_planes(synthesize_jpeg_420(df)).collect()
    assert len(out) == 2
    for r in out:
        assert (r.width, r.height, r.n_blocks) == (16, 16, 6)
        assert len(r.y_pixels) == 256
        assert len(r.cb_pixels) == len(r.cr_pixels) == 64


# -------------------------------------------------------- aHash (round 10)


def test_png_ahash_hand_derived(spark):
    from pyspark.sql import Row

    from entity_etl_spark.ext.image import decode_png_ahash, synthesize_png

    # pixels g_i = 4i: mean = 126, bit set iff 4i > 126 iff i >= 32
    # -> hhi = 0, hlo = 0xFFFFFFFF; reversed image flips the halves
    ramp = [(2 * (4 * i) - 255) / 255.0 for i in range(64)]
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=ramp),
         Row(vec_id=2, embedding=ramp[::-1])]
    )
    got = {
        r.vec_id: (r.hhi, r.hlo)
        for r in decode_png_ahash(synthesize_png(df)).collect()
    }
    assert got[1] == (0, 0xFFFFFFFF)
    assert got[2] == (0xFFFFFFFF, 0)


def test_png_ahash_matches_numpy_reference(spark):
    from pyspark.sql import Row

    from entity_etl_spark.ext.image import decode_png_ahash, synthesize_png

    rng = np.random.default_rng(7)
    vecs = rng.uniform(-1, 1, size=(20, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)]
    )
    got = {
        r.vec_id: (r.hhi, r.hlo)
        for r in decode_png_ahash(synthesize_png(df)).collect()
    }
    for i, v in enumerate(vecs):
        g = np.clip(np.floor((v.astype(np.float64) + 1) / 2 * 255 + 0.5), 0, 255)
        bits = g > g.sum() / g.size
        w = 1 << np.arange(32, dtype=np.int64)
        assert got[i] == (int((bits[:32] * w).sum()), int((bits[32:] * w).sum()))
