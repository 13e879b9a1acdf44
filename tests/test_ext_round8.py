"""Round-8 extension tests: GIF87a/LZW codec (the second real
compressed media format) and the item-item cosine plan rewrite."""

import numpy as np
import pytest


def test_lzw_hand_derived_reference_vector():
    """Independent reference, not a round-trip (encoder and decoder
    could share a symmetric bug): data [0,1,2,2] at min_code_size=2
    hand-derives to codes CLEAR(4),0,1,2 at width 3, then 2,EOI(5) at
    width 4 (the table hits 9 entries = 2^3+1 after '22'), packing
    LSB-first to exactly 0x44 0x24 0x05."""
    from entity_etl_spark.ext.image import _lzw_decode, _lzw_encode

    data = bytes([0, 1, 2, 2])
    enc = _lzw_encode(data, 2)
    assert enc == b"\x44\x24\x05"
    dec, n_clear = _lzw_decode(enc, 2)
    assert dec == data
    assert n_clear == 1


def test_gif_roundtrip_exact_and_structure():
    """GIF encode/decode round-trip is byte-exact for random images;
    the stream carries exactly one CLEAR; corrupted LZW data raises."""
    from entity_etl_spark.ext.image import _decode_gif, _encode_gif

    rng = np.random.default_rng(42)
    for _ in range(50):
        g = rng.integers(0, 256, 64).astype(np.uint8)
        blob = _encode_gif(g)
        w, h, img, n_clear, n_blocks = _decode_gif(blob)
        assert (w, h) == (8, 8)
        assert n_clear == 1
        assert n_blocks >= 1
        assert np.array_equal(img.ravel(), g)
    # constant-value images exercise maximal dictionary runs
    for v in (0, 255):
        g = np.full(64, v, dtype=np.uint8)
        _, _, img, _, _ = _decode_gif(_encode_gif(g))
        assert np.array_equal(img.ravel(), g)
    # truncate the LZW stream: decode must fail loudly, not wrap around
    blob = bytearray(_encode_gif(np.arange(64, dtype=np.uint8)))
    with pytest.raises(ValueError):
        _decode_gif(bytes(blob[:-6]) + b"\x00\x3b")


def test_lzw_cscsc_and_table_full():
    """The code==next_free (cScSc) special case decodes correctly
    (repetitive data forces it), and incompressible data long enough to
    fill the 4096-entry table round-trips through mid-stream CLEARs."""
    from entity_etl_spark.ext.image import _lzw_decode, _lzw_encode

    pattern = b"ab" * 4000  # aababb... forces code==next_free early
    dec, _ = _lzw_decode(_lzw_encode(pattern, 8), 8)
    assert dec == pattern

    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, 20000).astype(np.uint8).tobytes()
    dec, n_clear = _lzw_decode(_lzw_encode(noise, 8), 8)
    assert dec == noise
    assert n_clear > 1  # table filled -> mid-stream CLEARs happened


def test_gif_features_match_bmp_ground_truth(spark):
    """The full Spark seam: synthesize GIF blobs from embeddings, decode
    features, and pin the mean pixel against the UNCOMPRESSED BMP path
    over the same rows (independent of the LZW code entirely)."""
    from entity_etl_spark.ext.image import (
        decode_bmp_features,
        decode_gif_features,
        synthesize_bmp,
        synthesize_gif,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(64)
    )
    gif = {
        r["vec_id"]: r["mean_pixel"]
        for r in decode_gif_features(synthesize_gif(emb)).collect()
    }
    bmp = {
        r["vec_id"]: r["mean_pixel"]
        for r in decode_bmp_features(synthesize_bmp(emb)).collect()
    }
    assert gif == bmp and len(gif) == 64
