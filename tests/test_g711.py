"""G.711 companding (operators/g711.py): all four directions pinned
BYTE-EXACT against CPython's audioop (the C g711.c everyone interops
with) over the complete input domains — plus round-trip laws."""

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.g711 import (alaw_decode,
                                                       alaw_encode,
                                                       ulaw_decode,
                                                       ulaw_encode)

audioop = pytest.importorskip("audioop")   # stdlib until 3.12

ALL_PCM = np.arange(-32768, 32768, dtype=np.int16)
ALL_BYTES = np.arange(256, dtype=np.uint8)


def test_ulaw_encode_matches_audioop_full_range():
    want = np.frombuffer(audioop.lin2ulaw(ALL_PCM.tobytes(), 2), np.uint8)
    assert np.array_equal(ulaw_encode(ALL_PCM), want)


def test_ulaw_decode_matches_audioop_all_bytes():
    want = np.frombuffer(audioop.ulaw2lin(bytes(ALL_BYTES), 2), np.int16)
    assert np.array_equal(ulaw_decode(ALL_BYTES), want)


def test_alaw_encode_matches_audioop_full_range():
    want = np.frombuffer(audioop.lin2alaw(ALL_PCM.tobytes(), 2), np.uint8)
    assert np.array_equal(alaw_encode(ALL_PCM), want)


def test_alaw_decode_matches_audioop_all_bytes():
    want = np.frombuffer(audioop.alaw2lin(bytes(ALL_BYTES), 2), np.int16)
    assert np.array_equal(alaw_decode(ALL_BYTES), want)


def test_roundtrip_is_idempotent_on_codebook():
    """decode(encode(x)) is a fixed point of the quantizer: encoding a
    decoded value returns the same byte (both laws)."""
    for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
        once = dec(enc(ALL_PCM))
        assert np.array_equal(enc(once), enc(ALL_PCM))
        assert np.array_equal(dec(enc(once)), once)


def test_quantization_error_bounded_by_segment_step():
    """|x - decode(encode(x))| is within the top segment's half-step:
    mu-law 256 (step 1024 in 16-bit terms at seg 7 -> err < 512 + bias
    slack), A-law 256."""
    for enc, dec, bound in ((ulaw_encode, ulaw_decode, 1024),
                            (alaw_encode, alaw_decode, 1024)):
        err = np.abs(ALL_PCM.astype(np.int64)
                     - dec(enc(ALL_PCM)).astype(np.int64))
        assert int(err.max()) <= bound
