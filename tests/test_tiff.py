"""TIFF baseline codec: the spec's own PackBits worked example, IFD
round-trips (both compressions, multi-strip), big-endian + WhiteIsZero
decode, malformed guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.tiff import (packbits_decode,
                                                       packbits_encode,
                                                       tiff_decode,
                                                       tiff_encode)


def test_packbits_spec_example():
    """The worked example from TIFF 6.0 Section 9."""
    raw = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22"
                        + "AA" * 10)
    enc = packbits_encode(raw)
    assert enc == bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(enc, len(raw)) == raw


def test_packbits_edges():
    # long run splits at 128
    raw = b"\x55" * 300
    enc = packbits_encode(raw)
    assert packbits_decode(enc, 300) == raw
    # long literal splits at 128
    raw = bytes(range(256)) * 2
    assert packbits_decode(packbits_encode(raw), len(raw)) == raw
    # noop byte is skipped
    assert packbits_decode(b"\x80\x00A", 1) == b"A"
    with pytest.raises(ValueError):
        packbits_decode(b"\xfe", 3)          # truncated run


def test_roundtrip_gray_rgb_both_compressions():
    rng = np.random.RandomState(9)
    for shape in ((7, 11), (5, 4, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for pb in (False, True):
            dec = tiff_decode(tiff_encode(img, packbits=pb))
            assert dec.shape == img.shape and (dec == img).all()
    # low-entropy image actually compresses under PackBits
    flat = np.full((32, 32), 7, np.uint8)
    assert len(tiff_encode(flat, packbits=True)) < len(tiff_encode(flat))


def test_multi_strip():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (10, 6)).astype(np.uint8)
    for pb in (False, True):
        enc = tiff_encode(img, packbits=pb, rows_per_strip=3)
        assert (tiff_decode(enc) == img).all()


def test_big_endian_and_white_is_zero():
    """Hand-build a minimal MM (big-endian) gray TIFF with
    PhotometricInterpretation 0 (WhiteIsZero): decode must byte-swap
    the IFD and invert the samples."""
    w, h = 2, 1
    raster = bytes([10, 250])
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 1), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 0),
        (273, 4, 1, None), (277, 3, 1, 1), (278, 4, 1, 1),
        (279, 4, 1, len(raster)),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = struct.pack(">2sHI", b"MM", 42, ifd_off)
    out += struct.pack(">H", len(entries))
    for tag, vtype, count, val in entries:
        if val is None:
            val = data_off
        raw = (struct.pack(">H", val) + b"\x00\x00" if vtype == 3
               else struct.pack(">I", val))
        out += struct.pack(">HHI", tag, vtype, count) + raw
    out += struct.pack(">I", 0)
    out += raster
    dec = tiff_decode(out)
    assert dec.shape == (1, 2)
    assert list(dec[0]) == [245, 5]          # inverted


def test_malformed_guards():
    img = np.zeros((2, 2), np.uint8)
    enc = tiff_encode(img)
    with pytest.raises(ValueError):
        tiff_decode(b"XX" + enc[2:])
    with pytest.raises(ValueError):
        tiff_decode(enc[:20])
    bad = bytearray(enc)
    # patch Compression (tag 259) to JPEG-in-TIFF (7): unsupported
    n = struct.unpack("<H", enc[8:10])[0]
    for k in range(n):
        off = 10 + 12 * k
        if struct.unpack("<H", enc[off:off + 2])[0] == 259:
            bad[off + 8:off + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="compression"):
        tiff_decode(bytes(bad))


def test_lzw_hand_bitstream():
    """First-principles vector: for input b'AB' the code sequence is
    Clear(256), 65, 66, EOI(257), all at 9 bits, packed MSB-first."""
    from otel_arrow_collector_spark.operators.tiff import (lzw_decode,
                                                           lzw_encode)
    bits = "".join(format(c, "09b") for c in (256, 65, 66, 257))
    bits += "0" * (-len(bits) % 8)
    want = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert lzw_encode(b"AB") == want
    assert lzw_decode(want, 2) == b"AB"


def test_lzw_width_boundaries_and_table_full():
    from otel_arrow_collector_spark.operators.tiff import (lzw_decode,
                                                           lzw_encode)
    rng = np.random.RandomState(4)
    data = bytes(rng.randint(0, 256, 200000))
    # prefix lengths straddling the 9->10 bit EarlyChange boundary
    for n in (1097, 1098, 1099, 1100, 2500, 5000, 200000):
        assert lzw_decode(lzw_encode(data[:n]), n) == data[:n], n
    # all-same input: long phrase growth, different boundary path
    mono = bytes([7]) * 10000
    assert lzw_decode(lzw_encode(mono), len(mono)) == mono


def test_lzw_tiff_roundtrip_and_compression():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (40, 37, 3)).astype(np.uint8)
    enc = tiff_encode(img, lzw=True, rows_per_strip=7)
    assert (tiff_decode(enc) == img).all()
    flat = np.full((64, 64), 3, np.uint8)
    assert len(tiff_encode(flat, lzw=True)) < len(tiff_encode(flat))
    with pytest.raises(ValueError):
        tiff_encode(flat, lzw=True, packbits=True)


def test_decoder_fuzz_never_hangs_or_crashes():
    """Garbage and truncations must raise ValueError (or decode), never
    loop forever or throw non-ValueError."""
    from otel_arrow_collector_spark.operators.tiff import lzw_decode
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (6, 6)).astype(np.uint8)
    enc = tiff_encode(img, lzw=True)
    for _ in range(200):
        blob = bytes(rng.randint(0, 256, rng.randint(1, 64)))
        for payload in (blob, enc[:rng.randint(0, len(enc))],
                        enc[:12] + blob):
            try:
                tiff_decode(payload)
            except ValueError:
                pass
        try:
            lzw_decode(blob, 64)
        except ValueError:
            pass
