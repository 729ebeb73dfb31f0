"""LZ4 block codec: cross-interop BOTH directions against pyarrow's
bundled lz4 (codec='lz4_raw'), format vectors, end-rule compliance,
malformed guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from otel_arrow_collector_spark.sources.lz4 import (lz4_compress,
                                                    lz4_decompress)


def _cases():
    rng = np.random.RandomState(8)
    yield b""
    yield b"a"
    yield b"short"
    yield b"hello hello hello worldworldworld" * 5
    yield bytes(rng.randint(0, 256, 100_000))
    yield bytes([5]) * 100_000
    yield b"abcd" * 50_000
    yield bytes(range(256)) * 300


def test_cross_interop_both_directions():
    for d in _cases():
        assert lz4_decompress(lz4_compress(d), len(d)) == d
        ref = pa.compress(d, codec="lz4_raw", asbytes=True)
        assert lz4_decompress(ref, len(d)) == d
        assert pa.decompress(lz4_compress(d), decompressed_size=len(d),
                             codec="lz4_raw", asbytes=True) == d


def test_format_hand_vectors():
    # literals-only block: token litlen<<4, payload
    assert lz4_compress(b"abc") == bytes([3 << 4]) + b"abc"
    # 20-literal block: token 15<<4, extension byte 5
    d = bytes(range(20))
    assert lz4_compress(d) == bytes([15 << 4, 5]) + d
    # hand-built sequence: 2 literals 'ab', match offset 2 len 6,
    # then the mandatory literal tail 'zzzzz'
    stream = (bytes([(2 << 4) | (6 - 4)]) + b"ab"
              + (2).to_bytes(2, "little")
              + bytes([5 << 4]) + b"zzzzz")
    assert lz4_decompress(stream, 13) == b"abababab" + b"zzzzz"


def test_encoder_end_rules():
    """Spec rules: last 5 bytes are literals; last match starts >= 12
    bytes before the end."""
    d = b"abcd" * 10                     # highly matchable to the end
    enc = lz4_compress(d)
    dec = lz4_decompress(enc, len(d))
    assert dec == d
    # the final sequence in our encoding is literals-only and >= 5 long
    # (verified behaviorally: pyarrow's strict decoder accepts it)
    assert pa.decompress(enc, decompressed_size=len(d),
                         codec="lz4_raw", asbytes=True) == d


def test_malformed_guards():
    with pytest.raises(ValueError):
        lz4_decompress(bytes([3 << 4]) + b"ab", 3)        # short literal
    with pytest.raises(ValueError):
        lz4_decompress(bytes([(1 << 4) | 0]) + b"a", 6)   # no offset
    with pytest.raises(ValueError):
        # offset beyond produced output
        lz4_decompress(bytes([(1 << 4) | 0]) + b"a"
                       + (9).to_bytes(2, "little"), 6)
    with pytest.raises(ValueError):
        lz4_decompress(bytes([3 << 4]) + b"abc", 99)      # len mismatch
