"""Snappy raw codec: cross-interop BOTH directions against pyarrow's
bundled snappy, format hand vectors, overlap copies, fuzz guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from otel_arrow_collector_spark.sources.snappy import (snappy_compress,
                                                       snappy_decompress)


def _cases():
    rng = np.random.RandomState(8)
    yield b""
    yield b"a"
    yield b"hello hello hello hello worldworldworld" * 3
    yield bytes(rng.randint(0, 256, 100_000))        # incompressible
    yield bytes([5]) * 100_000                       # max-run copies
    yield b"abcd" * 50_000                           # overlap pattern
    yield bytes(range(256)) * 300                    # long literals


def test_cross_interop_both_directions():
    for d in _cases():
        assert snappy_decompress(snappy_compress(d)) == d
        ref = pa.compress(d, codec="snappy", asbytes=True)
        assert snappy_decompress(ref) == d           # we read theirs
        assert pa.decompress(snappy_compress(d), decompressed_size=len(d),
                             codec="snappy", asbytes=True) == d


def test_format_hand_vectors():
    # empty input: just the varint 0
    assert snappy_compress(b"") == b"\x00"
    # 3-byte literal: varint 3, tag (3-1)<<2, payload
    assert snappy_compress(b"abc") == b"\x03" + bytes([2 << 2]) + b"abc"
    # self-overlapping copy decodes as pattern repeat:
    # varint 8, literal 'ab', copy offset 2 len 6 -> 'abababab'
    stream = b"\x08" + bytes([(2 - 1) << 2]) + b"ab" \
        + bytes([1 | ((6 - 4) << 2) | (0 << 5), 2])
    assert snappy_decompress(stream) == b"abababab"


def test_parquet_page_material():
    """Decode real parquet bytes (this corpus IS snappy territory)."""
    raw = open("/root/testdata/sf0.001/documents.parquet", "rb").read()
    d = raw[:150_000]
    assert snappy_decompress(snappy_compress(d)) == d


def test_malformed_guards():
    with pytest.raises(ValueError):
        snappy_decompress(b"\xff" * 8)               # varint overrun
    with pytest.raises(ValueError):
        snappy_decompress(b"\x05" + bytes([2 << 2]) + b"ab")  # short lit
    with pytest.raises(ValueError):
        # copy before any output: offset 1 with empty window
        snappy_decompress(b"\x04" + bytes([1 | (0 << 2), 1]))
    with pytest.raises(ValueError):
        # declared length != produced length
        snappy_decompress(b"\x09" + bytes([2 << 2]) + b"abc")


# ---------------------------------------------------------------------------
# framing format (framing_format.txt) — the gRPC snappy wire shape
# ---------------------------------------------------------------------------

def test_frame_roundtrip_shapes():
    from otel_arrow_collector_spark.sources.snappy import (frame_compress,
                                                           frame_decompress)
    import os
    for payload in (b"", b"a", b"hello world " * 500,
                    os.urandom(100_000),          # incompressible chunks
                    b"\x00" * 200_000):           # multi-chunk, compressible
        assert frame_decompress(frame_compress(payload)) == payload
    # empty payload: just the stream identifier, no zero-length data
    # chunk (golang/snappy BufferedWriter wire parity; r10 ADVICE)
    from otel_arrow_collector_spark.sources.snappy import _STREAM_ID
    assert frame_compress(b"") == _STREAM_ID


def test_frame_crc32c_is_castagnoli_masked():
    """The chunk checksum is the MASKED CRC32C of the uncompressed
    data — pinned against the canonical Castagnoli test vector."""
    from otel_arrow_collector_spark.sources.snappy import _crc32c, _mask_crc
    assert _crc32c(b"123456789") == 0xE3069283
    assert _mask_crc(0) == 0xA282EAD8


def test_frame_rejects_corruption_and_bombs():
    import pytest

    from otel_arrow_collector_spark.sources.snappy import (frame_compress,
                                                           frame_decompress)
    blob = bytearray(frame_compress(b"payload " * 1000))
    blob[14] ^= 0x01          # stored CRC lives right after stream id
    with pytest.raises(ValueError, match="CRC mismatch"):
        frame_decompress(bytes(blob))
    blob[14] ^= 0x01
    blob[-3] ^= 0x01          # body corruption dies too (block decode)
    with pytest.raises(ValueError):
        frame_decompress(bytes(blob))
    with pytest.raises(ValueError, match="stream identifier"):
        frame_decompress(b"\x00\x04\x00\x00abcd")
    with pytest.raises(ValueError, match="reserved unskippable"):
        frame_decompress(
            frame_compress(b"") + b"\x02\x01\x00\x00x")
    big = frame_compress(b" " * 300_000)
    with pytest.raises(ValueError, match="exceeds limit"):
        frame_decompress(big, cap=100_000)
    # skippable chunk types are skipped, padding ignored
    ok = frame_compress(b"data") + b"\xfe\x03\x00\x00pad"
    assert frame_decompress(ok) == b"data"


def test_chunk_bomb_rejected_before_decode():
    """A framed chunk whose raw block DECLARES more than the 64 KiB
    format limit is rejected from the preamble alone — never expanded
    in Python first (the DoS-hardening contract); and a raw block
    whose elements try to run PAST the declared length aborts within
    one element."""
    import pytest

    from otel_arrow_collector_spark.sources.snappy import (
        _MAX_CHUNK, _STREAM_ID, _crc32c, _mask_crc, _varint,
        frame_decompress, snappy_decompress)

    # (a) framed: declared length 10 MB -> refused pre-decode
    bomb_block = _varint(10 * 1024 * 1024) + b"\x00" * 100
    payload = _mask_crc(_crc32c(b"")).to_bytes(4, "little") + bomb_block
    framed = bytearray(_STREAM_ID)
    framed.append(0x00)
    framed += len(payload).to_bytes(3, "little")
    framed += payload
    with pytest.raises(ValueError, match="65536"):
        frame_decompress(bytes(framed))

    # (b) raw: declares 8 bytes, emits a 100-byte literal -> aborts
    lying = _varint(8) + bytes([60 << 2, 100 - 1]) + b"x" * 100
    with pytest.raises(ValueError, match="exceeds declared"):
        snappy_decompress(lying)


def test_frame_fuzz_roundtrip_and_corruption():
    """Hypothesis-style fuzz (deterministic seeds): arbitrary byte
    shapes round-trip the framing layer; flipping any single byte of a
    framed stream either still decodes to the SAME bytes (a flip in a
    skippable region) or raises ValueError — never a crash or a
    silent wrong answer."""
    import random

    from otel_arrow_collector_spark.sources.snappy import (
        frame_compress, frame_decompress)

    rng = random.Random(1234)
    shapes = [b"", b"\x00", rng.randbytes(100), rng.randbytes(70_000),
              b"ab" * 40_000, bytes(range(256)) * 300]
    for data in shapes:
        framed = frame_compress(data)
        assert frame_decompress(framed) == data
        assert frame_decompress(framed, cap=len(data)) == data
    data = rng.randbytes(5_000)
    framed = bytearray(frame_compress(data))
    for _ in range(300):
        i = rng.randrange(len(framed))
        orig = framed[i]
        framed[i] ^= 1 + rng.randrange(255)
        try:
            got = frame_decompress(bytes(framed))
            assert got == data, "corruption decoded to different bytes"
        except ValueError:
            pass
        framed[i] = orig
