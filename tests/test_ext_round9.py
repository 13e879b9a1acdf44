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
