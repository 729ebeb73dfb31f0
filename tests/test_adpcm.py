"""IMA/DVI ADPCM: byte-exact against CPython's audioop (the reference
IMA implementation), both directions, including the carried
(valpred, index) state — a third-party interop pin, not a
self-round-trip claim."""

from __future__ import annotations

import warnings

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.adpcm import (
    STEP_TABLE, adpcm_decode, adpcm_encode)

audioop = pytest.importorskip("audioop")
warnings.filterwarnings("ignore", category=DeprecationWarning)


def _signals():
    rng = np.random.RandomState(7)
    for _ in range(10):
        yield rng.randint(-32768, 32768, 256).astype(np.int16)
    # adversarial: rail-to-rail (sweeps the index to 88), silence
    # (pins it at 0), slow ramp (exercises small steps), odd length
    yield np.array([32767, -32768] * 128, np.int16)
    yield np.zeros(256, np.int16)
    yield np.arange(-128, 128, dtype=np.int16)
    yield rng.randint(-32768, 32768, 33).astype(np.int16)  # odd


def test_encode_matches_audioop():
    for x in _signals():
        ref, (ref_vp, ref_ix) = audioop.lin2adpcm(x.tobytes(), 2, None)
        got, vp, ix = adpcm_encode(x)
        assert got == ref
        assert (vp, ix) == (ref_vp, ref_ix)


def test_decode_matches_audioop():
    for x in _signals():
        enc, _ = audioop.lin2adpcm(x.tobytes(), 2, None)
        ref, (ref_vp, ref_ix) = audioop.adpcm2lin(enc, 2, None)
        got, vp, ix = adpcm_decode(enc)
        assert got.tobytes() == ref
        assert (vp, ix) == (ref_vp, ref_ix)


def test_chunked_state_carry():
    """Encoding a stream in chunks with carried state equals encoding it
    whole (the streaming-ingest contract)."""
    rng = np.random.RandomState(11)
    x = rng.randint(-32768, 32768, 512).astype(np.int16)
    whole, vp_w, ix_w = adpcm_encode(x)
    a, vp, ix = adpcm_encode(x[:256])
    b, vp2, ix2 = adpcm_encode(x[256:], valpred=vp, index=ix)
    assert a + b == whole
    assert (vp2, ix2) == (vp_w, ix_w)


def test_odd_tail_held_in_state_and_n_trim():
    """audioop convention: an odd final sample stays in carried encoder
    state (no pad byte is emitted) — 33 samples encode to 16 bytes /
    32 nibbles; ``n`` trims decode below the nibble count."""
    x = np.arange(33, dtype=np.int16)
    enc, _, _ = adpcm_encode(x)
    assert len(enc) == 16
    ref, _ = audioop.lin2adpcm(x.tobytes(), 2, None)
    assert enc == ref
    dec, _, _ = adpcm_decode(enc)
    assert len(dec) == 32
    trimmed, _, _ = adpcm_decode(enc, n=30)
    assert len(trimmed) == 30
    assert (trimmed == dec[:30]).all()


def test_step_table_shape():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))


# property-based: byte-exact vs audioop on arbitrary signals
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_encode_decode_match_audioop_property(samples):
        x = np.array(samples, np.int16)
        ref_enc, ref_st = audioop.lin2adpcm(x.tobytes(), 2, None)
        enc, vp, ix = adpcm_encode(x)
        assert enc == ref_enc and (vp, ix) == ref_st
        ref_dec, ref_st2 = audioop.adpcm2lin(ref_enc, 2, None)
        dec, vp2, ix2 = adpcm_decode(ref_enc)
        assert dec.tobytes() == ref_dec and (vp2, ix2) == ref_st2
except ImportError:          # pragma: no cover
    pass
