"""IMA/DVI ADPCM audio codec (4-bit adaptive differential PCM).

The Intel/DVI flavor of IMA ADPCM — the 4:1 compressor WAV files tag as
format 0x11 and every telephony/edge-audio ingest path meets.  The
implementation follows the public IMA reference algorithm (the same one
CPython's ``audioop.lin2adpcm``/``adpcm2lin`` implements), and the test
suite pins BOTH directions byte-exact against ``audioop`` — including
the (valpred, index) state tuple — over random and adversarial signals,
so this is a third-party interop claim, not a self-consistent
round-trip claim (tests/test_adpcm.py).

The codec is inherently sequential per stream (each sample's quantizer
step depends on the previous prediction), so there is nothing to
vectorize WITHIN a clip; the parallelism is ACROSS clips, which is how
the Spark operator runs it (one mapInPandas stage, one clip per row).
The encoder tracks the decoder's reconstruction exactly, so the decoded
signal equals the encoder's ``valpred`` trajectory — the property that
lets a DuckDB recursive CTE re-derive the round-trip for the oracle.
"""

from __future__ import annotations

import numpy as np

#: IMA step-size table (89 entries) — public IMA/DVI specification;
#: byte-exactness vs audioop is pinned in tests, not assumed.
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
#: Index adjustment per 3-bit magnitude (sign bit does not matter).
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def adpcm_encode(pcm: np.ndarray, valpred: int = 0,
                 index: int = 0) -> tuple[bytes, int, int]:
    """int16 PCM -> packed 4-bit nibbles (first sample in the HIGH
    nibble, audioop convention).  Returns (bytes, valpred, index) so
    streams can be encoded chunk by chunk."""
    out = bytearray()
    buf = 0
    hi = True
    for s in pcm.astype(np.int64).tolist():
        step = STEP_TABLE[index]
        diff = s - valpred
        sign = 8 if diff < 0 else 0
        if sign:
            diff = -diff
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        valpred = valpred - vpdiff if sign else valpred + vpdiff
        valpred = max(-32768, min(32767, valpred))
        delta |= sign
        index = max(0, min(88, index + INDEX_TABLE[delta & 7]))
        if hi:
            buf = (delta << 4) & 0xF0
        else:
            out.append((delta & 0x0F) | buf)
        hi = not hi
    return bytes(out), valpred, index


def adpcm_decode(data: bytes, n: int | None = None, valpred: int = 0,
                 index: int = 0) -> tuple[np.ndarray, int, int]:
    """Packed nibbles -> int16 PCM.  ``n`` trims the trailing pad nibble
    when the clip length was odd."""
    deltas = []
    for b in data:
        deltas.append((b >> 4) & 0xF)
        deltas.append(b & 0xF)
    if n is not None:
        deltas = deltas[:n]
    out = np.empty(len(deltas), np.int16)
    for j, delta in enumerate(deltas):
        step = STEP_TABLE[index]
        index = max(0, min(88, index + INDEX_TABLE[delta & 7]))
        sign = delta & 8
        mag = delta & 7
        vpdiff = step >> 3
        if mag & 4:
            vpdiff += step
        if mag & 2:
            vpdiff += step >> 1
        if mag & 1:
            vpdiff += step >> 2
        valpred = valpred - vpdiff if sign else valpred + vpdiff
        valpred = max(-32768, min(32767, valpred))
        out[j] = valpred
    return out, valpred, index
