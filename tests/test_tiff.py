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


def _external_style_tiff() -> tuple[bytes, np.ndarray]:
    """Hand-built little-endian TIFF carrying the metadata tags every
    real encoder (libtiff/Pillow) attaches — ImageDescription (ASCII),
    Software (ASCII), XResolution/YResolution (RATIONAL),
    ResolutionUnit (SHORT) and a private UNDEFINED tag — around an
    uncompressed 4x3 grayscale raster.  Pillow is not in this
    container, so the fixture reproduces its tag layout byte-for-byte
    from the TIFF 6.0 spec instead of importing it."""
    img = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    raster = img.tobytes()
    desc = b"external encoder fixture\x00"
    soft = b"fakelibtiff 4.5\x00\x00"          # even-padded
    entries = []                                # (tag, type, count, value)

    blobs = bytearray()
    ifd_off = 8
    n = 11
    data_off = ifd_off + 2 + 12 * n + 4         # after IFD

    def ext(payload: bytes) -> int:
        off = data_off + len(blobs)
        blobs.extend(payload)
        return off

    raster_off = ext(raster)
    desc_off = ext(desc)
    soft_off = ext(soft)
    xres_off = ext(struct.pack("<II", 300, 1))
    yres_off = ext(struct.pack("<II", 300, 1))
    entries = [
        (256, 3, 1, struct.pack("<HH", 4, 0)),          # ImageWidth
        (257, 3, 1, struct.pack("<HH", 3, 0)),          # ImageLength
        (258, 3, 1, struct.pack("<HH", 8, 0)),          # BitsPerSample
        (259, 3, 1, struct.pack("<HH", 1, 0)),          # Compression=none
        (262, 3, 1, struct.pack("<HH", 1, 0)),          # BlackIsZero
        (270, 2, len(desc), struct.pack("<I", desc_off)),   # ASCII
        (273, 4, 1, struct.pack("<I", raster_off)),     # StripOffsets
        (279, 4, 1, struct.pack("<I", len(raster))),    # StripByteCounts
        (282, 5, 1, struct.pack("<I", xres_off)),       # RATIONAL
        (283, 5, 1, struct.pack("<I", yres_off)),       # RATIONAL
        (305, 2, len(soft), struct.pack("<I", soft_off)),   # ASCII
    ]
    assert len(entries) == n
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n)
    for tag, vtype, count, val in sorted(entries):
        out += struct.pack("<HHI", tag, vtype, count) + val
    out += struct.pack("<I", 0)                 # next-IFD terminator
    out += blobs
    return bytes(out), img


def test_external_encoder_tags_do_not_break_decode():
    """Decode must skip ASCII/RATIONAL metadata tags instead of raising
    'unhandled IFD type' (r6 ADVICE: every real-world TIFF has them)."""
    blob, img = _external_style_tiff()
    assert np.array_equal(tiff_decode(blob), img)


def test_private_and_unknown_types_skipped():
    """UNDEFINED (7), DOUBLE (12) and out-of-spec private types are
    skipped; a required tag of unusable type raises cleanly."""
    blob, img = _external_style_tiff()
    b = bytearray(blob)
    # rewrite the Software entry (tag 305) as UNDEFINED type in place
    for k in range(11):
        off = 10 + 12 * k
        tag, vtype = struct.unpack_from("<HH", b, off)
        if tag == 305:
            struct.pack_into("<H", b, off + 2, 7)
    assert np.array_equal(tiff_decode(bytes(b)), img)
    # a required tag with a skipped type -> clean ValueError, not KeyError
    b2 = bytearray(blob)
    for k in range(11):
        off = 10 + 12 * k
        tag, vtype = struct.unpack_from("<HH", b2, off)
        if tag == 273:                          # StripOffsets
            struct.pack_into("<H", b2, off + 2, 12)   # DOUBLE
    with pytest.raises(ValueError, match="required tag"):
        tiff_decode(bytes(b2))
