"""G.711 audio companding (mu-law + A-law), vectorized, both directions.

ITU-T G.711 is the telephony codec every audio ingestion pipeline meets
(8-bit logarithmic PCM).  These are numpy closed forms of the classic
Sun Microsystems g711.c segment/mantissa construction (public domain;
the same code CPython's ``audioop`` wraps), and the test suite pins all
four directions BYTE-EXACT against ``audioop`` over the full 16-bit
input range — a real third-party interop oracle, not a self-consistent
round-trip claim.

Conventions (matching audioop / Sun):
- mu-law companding runs in the 14-bit domain (``pcm >> 2``), bias 33,
  clip 8158, 8 segments x 4-bit mantissa, all bits inverted on the wire
  (positives XOR 0xFF, negatives XOR 0x7F).
- A-law runs in the 13-bit domain (``pcm >> 3``), one's-complement
  negative magnitude, clip 0xFFF, even-bit inversion (XOR 0x55 /
  0xD5).
- Decoders are exact table-free inverses of the segment layout.
"""

from __future__ import annotations

import numpy as np


def _exponent(m: np.ndarray, lo_bits: int) -> np.ndarray:
    """Segment number: position of the leading bit above ``lo_bits``
    (integer bit-length, no floats)."""
    exp = np.zeros(len(m), np.int32)
    for e in range(1, 8):
        exp[m >= (1 << (lo_bits + e))] = e
    return exp


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> mu-law bytes (audioop.lin2ulaw-exact)."""
    x14 = pcm.astype(np.int32) >> 2
    neg = x14 < 0
    m = np.where(neg, -x14, x14)
    m = np.minimum(m, 8158) + 33
    exp = _exponent(m, 5)
    uval = (exp << 4) | ((m >> (exp + 1)) & 0xF)
    return np.where(neg, uval ^ 0x7F, uval ^ 0xFF).astype(np.uint8)


def ulaw_decode(b: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 linear PCM (audioop.ulaw2lin-exact)."""
    u = (~b.astype(np.int32)) & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0xF
    mag = (((mant << 3) + 132) << exp) - 132
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> A-law bytes (audioop.lin2alaw-exact)."""
    x13 = pcm.astype(np.int32) >> 3
    neg = x13 < 0
    m = np.where(neg, -x13 - 1, x13)
    m = np.minimum(m, 0xFFF)
    exp = _exponent(np.maximum(m, 1), 4)
    mant = np.where(exp == 0, (m >> 1) & 0xF, (m >> exp) & 0xF)
    aval = (exp << 4) | mant
    return np.where(neg, aval ^ 0x55, aval ^ 0xD5).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear PCM (audioop.alaw2lin-exact)."""
    u = b.astype(np.int32) ^ 0x55
    exp = (u >> 4) & 7
    mant = u & 0xF
    mag = np.where(exp == 0, (mant << 1) + 1,
                   ((mant << 1) + 33) << (exp - 1)) << 3
    return np.where(u & 0x80, mag, -mag).astype(np.int16)
