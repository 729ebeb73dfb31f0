"""Netpbm P1-P6: spec-derived hand vectors, round-trips, header/comment
parsing, 16-bit big-endian, P4 row padding, malformed guards."""

from __future__ import annotations

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.netpbm import (netpbm_decode,
                                                         netpbm_encode)


def test_hand_vectors_binary():
    # P5 2x2 gray
    img = np.array([[0, 128], [255, 7]], np.uint8)
    enc = netpbm_encode(img, 5)
    assert enc == b"P5\n2 2\n255\n" + bytes([0, 128, 255, 7])
    dec, mv = netpbm_decode(enc)
    assert mv == 255 and (dec == img).all()
    # P6 1x2 color
    img = np.array([[[1, 2, 3], [250, 251, 252]]], np.uint8)
    enc = netpbm_encode(img, 6)
    assert enc == b"P6\n2 1\n255\n" + bytes([1, 2, 3, 250, 251, 252])
    dec, _ = netpbm_decode(enc)
    assert (dec == img).all()


def test_p4_packing_and_row_padding():
    """10-wide rows pad to 2 bytes; MSB-first within a byte."""
    img = np.zeros((2, 10), np.uint8)
    img[0, 0] = 1          # MSB of first byte
    img[0, 9] = 1          # second bit of second byte
    img[1, 7] = 1          # LSB of row-2 first byte
    enc = netpbm_encode(img, 4)
    assert enc == b"P4\n10 2\n" + bytes([0b10000000, 0b01000000,
                                         0b00000001, 0b00000000])
    dec, mv = netpbm_decode(enc)
    assert mv == 1 and (dec == img).all()


def test_ascii_variants_and_comments():
    dec, mv = netpbm_decode(b"P2 # comment\n# another\n3 1 10\n0 5 10\n")
    assert mv == 10 and (dec == np.array([[0, 5, 10]])).all()
    dec, _ = netpbm_decode(b"P1\n4 2\n0110\n1 0 0 1\n")
    assert (dec == np.array([[0, 1, 1, 0], [1, 0, 0, 1]])).all()
    dec, mv = netpbm_decode(b"P3\n1 1\n255\n9 8 7\n")
    assert mv == 255 and (dec == np.array([[[9, 8, 7]]])).all()
    # ASCII PGM encode round-trip
    img = np.array([[0, 99], [100, 255]], np.uint8)
    assert (netpbm_decode(netpbm_encode(img, 2))[0] == img).all()


def test_16bit_big_endian():
    img = np.array([[0, 1, 65535, 256]], np.uint16).reshape(1, 4)
    enc = netpbm_encode(img, 5, maxval=65535)
    assert enc.endswith(bytes([0, 0, 0, 1, 255, 255, 1, 0]))
    dec, mv = netpbm_decode(enc)
    assert mv == 65535 and dec.dtype == np.uint16 and (dec == img).all()


def test_roundtrip_random():
    rng = np.random.RandomState(5)
    for kind, shape in ((5, (7, 9)), (6, (4, 5, 3)), (2, (3, 8)),
                        (4, (5, 13))):
        hi = 2 if kind == 4 else 256
        img = rng.randint(0, hi, shape).astype(np.uint8)
        dec, _ = netpbm_decode(netpbm_encode(img, kind))
        assert (dec == img).all(), kind


def test_malformed_guards():
    with pytest.raises(ValueError):
        netpbm_decode(b"P7\n1 1\n255\nx")
    with pytest.raises(ValueError):
        netpbm_decode(b"P5\n2 2\n255\n\x00\x01")          # short raster
    with pytest.raises(ValueError):
        netpbm_decode(b"P2\n1 1\n10\n99\n")               # > maxval
    with pytest.raises(ValueError):
        netpbm_encode(np.array([[2]], np.uint8), 4)       # not 0/1
    with pytest.raises(ValueError):
        netpbm_encode(np.zeros((2, 2), np.uint8), 6)      # P6 needs color


def test_decoder_fuzz_never_crashes():
    """Garbage / truncated streams raise ValueError, never IndexError
    or infinite loops."""
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (5, 5)).astype(np.uint8)
    enc = netpbm_encode(img, 5)
    seeds = [b"P1 2 2 10", b"P1 1 1\n#", b"P2 1 1 10", b"P5\n",
             b"P4 3", b"P6 1 1 255"]
    for t in range(300):
        blob = bytes(rng.randint(0, 256, rng.randint(1, 60)))
        for case in (blob, enc[:rng.randint(0, len(enc))],
                     b"P5 " + blob, b"P2 " + blob, b"P1 " + blob,
                     *(seeds if t == 0 else ())):
            try:
                netpbm_decode(case)
            except ValueError:
                pass
