"""QOI codec: spec-derived chunk vectors (qoiformat.org specification),
exhaustive round-trips, malformed-stream guards."""

from __future__ import annotations

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.qoi import qoi_decode, qoi_encode


def _rt(img):
    dec, cs = qoi_decode(qoi_encode(img))
    assert dec.shape == img.shape
    assert (dec == img).all()
    return dec


def test_roundtrip_random_rgb_rgba():
    rng = np.random.RandomState(3)
    _rt(rng.randint(0, 256, (7, 9, 3)).astype(np.uint8))
    _rt(rng.randint(0, 256, (5, 5, 4)).astype(np.uint8))


def test_roundtrip_runs_and_gradients():
    _rt(np.zeros((4, 100, 3), np.uint8))          # long runs, 62-splits
    _rt(np.full((3, 3, 3), 255, np.uint8))
    g = np.zeros((1, 200, 3), np.uint8)           # DIFF/LUMA ladder
    for i in range(200):
        g[0, i] = (i % 256, (i * 2) % 256, (i * 3) % 256)
    _rt(g)


def test_spec_chunk_vectors():
    """Hand-derived from the spec's chunk definitions."""
    # first pixels equal to the implicit previous (0,0,0,255) -> RUN
    body = qoi_encode(np.zeros((1, 3, 3), np.uint8))[14:-8]
    assert body == bytes([0xC0 | 2])
    # large non-luma jump -> OP_RGB
    body = qoi_encode(np.array([[[100, 50, 200]]], np.uint8))[14:-8]
    assert body == bytes([0xFE, 100, 50, 200])
    # (255,0,0) from (0,0,0): dr wraps to -1 -> OP_DIFF (the classic
    # wraparound case the spec calls out)
    body = qoi_encode(np.array([[[255, 0, 0]]], np.uint8))[14:-8]
    assert body == bytes([0x40 | (1 << 4) | (2 << 2) | 2])
    # dg=10, dr-dg=2, db-dg=-3 -> OP_LUMA two-byte chunk
    img = np.array([[[10, 20, 30], [22, 30, 37]]], np.uint8)
    body = qoi_encode(img)[14:-8]
    assert body[-2:] == bytes([0x80 | (10 + 32), ((2 + 8) << 4) | (-3 + 8)])
    # seen color recurs after another -> OP_INDEX at its hash slot
    img = np.array([[[10, 20, 30], [100, 50, 200], [10, 20, 30]]],
                   np.uint8)
    body = qoi_encode(img)[14:-8]
    assert body[-1] == (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    # run of 62 splits: 63 identical pixels -> RUN(62) + RUN(1)
    img = np.zeros((1, 63, 3), np.uint8)
    body = qoi_encode(img)[14:-8]
    assert body == bytes([0xC0 | 61, 0xC0 | 0])


def test_header_and_end_marker():
    img = np.zeros((2, 5, 3), np.uint8)
    enc = qoi_encode(img, colorspace=1)
    assert enc[:4] == b"qoif"
    assert int.from_bytes(enc[4:8], "big") == 5      # width
    assert int.from_bytes(enc[8:12], "big") == 2     # height
    assert enc[12] == 3 and enc[13] == 1
    assert enc.endswith(b"\x00" * 7 + b"\x01")
    dec, cs = qoi_decode(enc)
    assert cs == 1


def test_malformed_guards():
    img = np.zeros((2, 2, 3), np.uint8)
    enc = qoi_encode(img)
    with pytest.raises(ValueError):
        qoi_decode(b"nope" + enc[4:])
    with pytest.raises(ValueError):
        qoi_decode(enc[:10])
    with pytest.raises(ValueError):
        qoi_decode(enc[:-8])                         # missing end marker
    with pytest.raises(ValueError):
        qoi_encode(np.zeros((4, 4), np.uint8))       # no channel axis


# property-based round-trips (hypothesis)
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 6), st.integers(1, 6), st.integers(3, 4),
           st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_property(h, w, ch, seed):
        rng = np.random.RandomState(seed % (2 ** 31))
        img = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        dec, _ = qoi_decode(qoi_encode(img))
        assert (dec == img).all()

    @given(st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=30, deadline=None)
    def test_roundtrip_low_entropy_property(seed):
        """Low-entropy images exercise RUN/INDEX/DIFF heavily."""
        rng = np.random.RandomState(seed % (2 ** 31))
        img = rng.randint(0, 3, (8, 8, 3)).astype(np.uint8) * 7
        dec, _ = qoi_decode(qoi_encode(img))
        assert (dec == img).all()
except ImportError:          # pragma: no cover
    pass


def test_decoder_fuzz_never_crashes():
    rng = np.random.RandomState(13)
    enc = qoi_encode(rng.randint(0, 256, (5, 5, 3)).astype(np.uint8))
    for _ in range(300):
        blob = bytes(rng.randint(0, 256, rng.randint(1, 60)))
        for case in (blob, enc[:rng.randint(0, len(enc))],
                     enc[:14] + blob):
            try:
                qoi_decode(case)
            except ValueError:
                pass
