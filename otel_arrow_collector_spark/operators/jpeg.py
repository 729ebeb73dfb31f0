"""Baseline JPEG codec — pure Python/numpy, no codec libraries.

Closes the "JPEG decode requires PIL" stub in ``multimodal.py``: the
reference treats media payloads as opaque bytes (pdata
``pcommon.ByteSlice``); a training-data pipeline needs to *decode* them,
and this container has no PIL/pyav.  Scope:

- **decode** (:func:`decode_jpeg`): baseline sequential DCT (SOF0/1)
  AND progressive DCT (SOF2 — spectral selection, successive
  approximation with correction bits, cross-block EOB runs, T.81 G.2),
  Huffman entropy coding (DHT), 8×8 dequantize + IDCT (orthonormal
  matrix form), chroma subsampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0)
  via nearest upsample, restart markers (DRI/RSTn), APPn/COM segments
  skipped.  Grayscale (1 component) and YCbCr (3 components).
- **encode** (:func:`encode_jpeg`): baseline 4:4:4 YCbCr with the
  T.81 Annex K example quantization (quality-scaled, IJG formula) and
  Huffman tables, so round-trip tests exercise the decoder on genuinely
  entropy-coded streams; :func:`encode_jpeg_progressive` emits a
  12-scan SOF2 script (both progression modes) whose coefficients are
  identical to the baseline encode — progressive and baseline encodes
  of one image decode to byte-identical RGB, the equality the tests pin.

12-bit sample precision (SOF1 extended sequential) is a REAL path in
both directions: 16-bit DQT entries parse, level shift/clipping track
the sample domain, output reduces by the high-bits shift, and the
encoder widens 8-bit input to v<<4|v>>4 before color conversion (flat
colors round-trip exactly; fidelity tests pin the 16x-finer quantizer).

Hierarchical and arithmetic-coded streams raise ``NotImplementedError``
loudly — the same stub policy as the other codecs in ``multimodal.py``
(the T.81 Table D.3 QM-coder constants cannot be reproduced here with
spec fidelity, and a self-consistent-but-wrong table would be a false
interop claim).

Performance stance: the entropy decode is a per-bit Python loop — fine
for the fixture-scale images these tests feed it, and isolated inside
the mapInPandas batch codec like the other decoders; the transform math
(IDCT, color convert, upsample) is vectorized numpy.  The implementation
is the textbook ITU-T T.81 spec; nothing derives from a codec library.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K examples; normative zigzag from Figure 5)
# ---------------------------------------------------------------------------

#: zigzag index -> raster index
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)

#: Annex K.1 example quantization tables (zigzag order when emitted)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    np.int64)

#: Annex K.3 example Huffman specs: (BITS[1..16], HUFFVAL)
_DC_L = ((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
         tuple(range(12)))
_DC_C = ((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
         tuple(range(12)))
_AC_L = ((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125), (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
_AC_C = ((0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119), (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

#: orthonormal 8x8 DCT-II basis; FDCT: C @ B @ C.T, IDCT: C.T @ X @ C
_C = np.array([[np.sqrt((1 if u == 0 else 2) / 8.0)
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _canonical_codes(bits, vals):
    """BITS/HUFFVAL -> {(length, code): symbol} (T.81 Annex C)."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(bits, vals):
    """Inverse of :func:`_canonical_codes`: symbol -> (length, code)."""
    return {sym: lc for lc, sym in _canonical_codes(bits, vals).items()}


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): t-bit magnitude -> signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

class _Bits:
    """Bit reader over an un-stuffed entropy-coded segment."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def bits(self, n: int) -> int:
        v = 0
        d, p = self.data, self.pos
        for _ in range(n):
            byte = d[p >> 3] if (p >> 3) < len(d) else 0
            v = (v << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def huff(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _split_ecs(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Un-stuff the entropy-coded data after SOS; split at RSTn markers.
    Returns (segments, end) — DC predictors/EOB runs reset per segment,
    ``end`` is the offset of the next marker after the scan data."""
    segs, cur = [], bytearray()
    n = len(buf)
    while pos < n:
        b = buf[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = buf[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:                                   # EOI or next marker
            break
    segs.append(bytes(cur))
    return segs, pos


def _decode_block(rd: _Bits, dc_tab, ac_tab, q: np.ndarray,
                  pred: int, level: float = 128.0
                  ) -> tuple[np.ndarray, int]:
    """One 8x8 block: Huffman-decode, dequantize, IDCT, +level shift
    (128 for 8-bit, 2048 for 12-bit samples).
    Returns (pixel block float64, new DC predictor)."""
    coef = np.zeros(64, np.int64)
    t = rd.huff(dc_tab)
    pred += _extend(rd.bits(t), t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = rd.huff(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:                         # ZRL: 16 zeros
                k += 16
                continue
            break                               # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overrun")
        coef[k] = _extend(rd.bits(s), s)
        k += 1
    blk = np.zeros(64, np.float64)
    blk[_ZIGZAG] = (coef * q).astype(np.float64)   # both in zigzag order
    px = _C.T @ blk.reshape(8, 8) @ _C + level
    return px, pred


def fenced_decoder(fn):
    """Decode fence: hostile bytes may fail ANYWHERE inside a bit/box
    walk (struct.error, zlib.error, KeyError, IndexError); the public
    contract is ValueError-only (the decode-before-ack 400 path and the
    fuzz sweep's invariant), so everything else is converted."""
    import functools

    @functools.wraps(fn)
    def wrap(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:
            raise ValueError(f"malformed input to {fn.__name__}: "
                             f"{type(e).__name__}: {e}") from e
    return wrap


@fenced_decoder
def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to
    (width, height, top-down RGB bytes)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    comps: list[dict] | None = None
    w = h = None
    dri = 0
    progressive = False
    coefs: list[np.ndarray] | None = None
    geom = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = payload[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + ln]
        if m == 0xC4:                                   # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = tuple(body[i + 1:i + 17])
                nv = sum(bits)
                vals = tuple(body[i + 17:i + 17 + nv])
                (hdc if tc == 0 else hac)[th] = _canonical_codes(bits, vals)
                i += 17 + nv
        elif m == 0xDB:                                 # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:                          # 16-bit entries (12-bit)
                    qt[tq] = np.frombuffer(
                        body[i + 1:i + 129],
                        dtype=">u2").astype(np.int64)
                    i += 129
                else:
                    qt[tq] = np.frombuffer(
                        body[i + 1:i + 65], np.uint8).astype(np.int64)
                    i += 65
        elif m in (0xC0, 0xC1, 0xC2):                   # SOF0/1 + SOF2
            progressive = m == 0xC2
            prec = body[0]
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if not (1 <= hv >> 4 <= 2 and 1 <= (hv & 15) <= 2):
                    raise NotImplementedError(
                        f"sampling factors {hv >> 4}x{hv & 15}")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{m:02X})")
        elif m == 0xDD:                                 # DRI
            dri = struct.unpack_from(">H", body, 0)[0]
        elif m == 0xDA:                                 # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if not progressive:
                scan = []
                for c in range(ns):
                    cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                    comp = next(x for x in comps if x["id"] == cs)
                    scan.append((comp, tt >> 4, tt & 15))
                return _decode_scan(payload, pos + 2 + ln, w, h, scan,
                                    qt, hdc, hac, dri, prec)
            # progressive: accumulate coefficients scan by scan
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                geom = (mcux, mcuy, hmax, vmax)
                coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                  np.int64) for c in comps]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(i for i, x in enumerate(comps)
                          if x["id"] == cs)
                scan.append((ci, comps[ci], tt >> 4, tt & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            segs, end = _split_ecs(payload, pos + 2 + ln)
            _decode_prog_scan(segs, scan, ss, se, ahal >> 4, ahal & 15,
                              coefs, geom, w, h, dri, hdc, hac)
            pos = end
            continue
        elif m == 0xD9:
            break
        pos += 2 + ln
    if progressive and coefs is not None:
        mcux, mcuy, hmax, vmax = geom
        return _finish_progressive(coefs, comps, qt, w, h, hmax, vmax,
                                   prec)
    raise ValueError("JPEG missing SOS")


def _nonint_blocks(c, w, h, hmax, vmax) -> tuple[int, int]:
    """Block grid of one component in a NON-interleaved scan
    (T.81 A.2.2): ceil over the component's own sample dimensions."""
    cw = (w * c["h"] + hmax - 1) // hmax
    ch = (h * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_prog_scan(segs, scan, ss, se, ah, al, coefs, geom, w, h,
                      dri, hdc, hac):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    single-component), AC first with EOB runs, AC successive-approximation
    refinement with correction bits.  Restart segments reset predictors
    and the EOB run."""
    mcux, mcuy, hmax, vmax = geom
    state = {"rd": _Bits(segs[0]), "seg": 0, "eob": 0,
             "pred": {ci: 0 for ci, *_ in scan}}

    def restart():
        state["seg"] += 1
        if state["seg"] >= len(segs):
            raise ValueError("JPEG missing restart segment")
        state["rd"] = _Bits(segs[state["seg"]])
        state["eob"] = 0
        state["pred"] = {ci: 0 for ci, *_ in scan}

    if ss == 0:                                        # DC scan
        if se != 0:
            raise ValueError("JPEG DC scan with Se != 0")
        if len(scan) > 1:                              # interleaved MCUs
            cnt = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and cnt and cnt % dri == 0:
                        restart()
                    for ci, c, td, _ta in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                _dc_unit(state, coefs[ci],
                                         my * c["v"] + by, mx * c["h"] + bx,
                                         ci, ah, al, hdc.get(td))
                    cnt += 1
        else:                                          # single component
            ci, c, td, _ta = scan[0]
            bh, bw = _nonint_blocks(c, w, h, hmax, vmax)
            cnt = 0
            for by in range(bh):
                for bx in range(bw):
                    if dri and cnt and cnt % dri == 0:
                        restart()
                    _dc_unit(state, coefs[ci], by, bx, ci, ah, al,
                             hdc.get(td))
                    cnt += 1
        return

    if len(scan) != 1:                                 # AC: ns must be 1
        raise ValueError("JPEG progressive AC scan must be non-interleaved")
    ci, c, _td, ta = scan[0]
    bh, bw = _nonint_blocks(c, w, h, hmax, vmax)
    cnt = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and cnt and cnt % dri == 0:
                restart()
            blk = coefs[ci][by, bx]
            if ah == 0:
                state["eob"] = _ac_first(state["rd"], blk, ss, se, al,
                                         hac[ta], state["eob"])
            else:
                state["eob"] = _ac_refine(state["rd"], blk, ss, se, al,
                                          hac[ta], state["eob"])
            cnt += 1


def _dc_unit(state, carr, by, bx, ci, ah, al, dc_tab):
    rd = state["rd"]
    if ah == 0:                                        # first DC pass
        t = rd.huff(dc_tab)
        state["pred"][ci] += _extend(rd.bits(t), t)
        carr[by, bx, 0] = state["pred"][ci] << al
    elif rd.bits(1):                                   # refinement bit
        carr[by, bx, 0] |= 1 << al


def _ac_first(rd, blk, ss, se, al, tab, eobrun):
    """AC first pass for one block (T.81 G.2.2): run-length + EOBn."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.huff(tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:                                # EOBn
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rd.bits(r)
                return eobrun
            k += 16                                    # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC index overrun")
        blk[k] = _extend(rd.bits(s), s) << al
        k += 1
    return 0


def _ac_refine(rd, blk, ss, se, al, tab, eobrun):
    """AC successive-approximation refinement for one block (T.81 G.2,
    Figure G.7): newly-nonzero coefficients arrive as ±1<<Al; every
    history-nonzero coefficient crossed on the way reads a correction
    bit that grows its magnitude by 1<<Al."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.huff(tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:                            # EOBn (incl. this)
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
                # ZRL: skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if rd.bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if rd.bits(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0 and rd.bits(1) and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(coefs, comps, qt, w, h, hmax, vmax, prec=8):
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    over all blocks per component) and hand off to the shared
    upsample/color path."""
    planes = []
    for ci, c in enumerate(comps):
        arr = coefs[ci]                                # (bh, bw, 64) zigzag
        deq = (arr * qt[c["tq"]]).astype(np.float64)
        rast = np.zeros_like(deq)
        rast[..., _ZIGZAG] = deq
        bh, bw = arr.shape[:2]
        blocks = rast.reshape(bh, bw, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) \
            + float(1 << (prec - 1))
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _color_assemble(planes, comps, hmax, vmax, w, h, prec)


def _decode_scan(buf, pos, w, h, scan, qt, hdc, hac, dri, prec=8):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), np.float64)
              for c, _, _ in scan]
    segs, _end = _split_ecs(buf, pos)
    rd = _Bits(segs[0])
    seg_i = 0
    pred = [0] * len(scan)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                rd = _Bits(segs[seg_i])
                pred = [0] * len(scan)
            for ci, (c, td, ta) in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk, pred[ci] = _decode_block(
                            rd, hdc[td], hac[ta], qt[c["tq"]], pred[ci],
                            float(1 << (prec - 1)))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            mcu += 1
    comps = [c for c, _, _ in scan]
    return _color_assemble(planes, comps, hmax, vmax, w, h, prec)


def _color_assemble(planes, comps, hmax, vmax, w, h, prec=8):
    """Upsample each component plane to full resolution, crop to (h, w),
    convert to RGB (shared by the baseline and progressive paths).
    12-bit samples color-convert in their own domain (chroma centered
    at 2048) and reduce to 8-bit by the standard high-bits shift."""
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    down = 1 << (prec - 8)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:                                  # grayscale
        y = (np.clip(np.floor(full[0] + 0.5), 0, maxv)
             .astype(np.int64) // down).astype(np.uint8)
        rgb = np.repeat(y.reshape(h, w, 1), 3, axis=2)
    elif len(full) == 3:                                # YCbCr (JFIF)
        y, cb, cr = full
        r = y + 1.402 * (cr - center)
        g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        b = y + 1.772 * (cb - center)
        # round in the sample domain, then the high-bits shift to 8-bit
        rgb = (np.clip(np.floor(np.stack([r, g, b], axis=2) + 0.5),
                       0, maxv).astype(np.int64) // down).astype(np.uint8)
    else:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    return w, h, rgb.tobytes()


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

class _BitWriter:
    """Entropy-coded bit writer with 0xFF stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)      # 1-pad to byte boundary
        return bytes(self.out)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (zigzag order)."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255)
    return ql, qc


#: Flat Huffman specs for 12-bit sample data: DC categories reach 15
#: and AC sizes 14, past the 8-bit Annex K tables' symbol sets — fixed-
#: length canonical tables sized for the full alphabets (16 DC symbols
#: at 5 bits, all 256 run/size symbols at 9 bits; both < all-ones).
_DC12 = ((0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
         tuple(range(16)))
_AC12 = ((0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0),
         tuple(range(256)))     # a BITS entry is one byte: 255 @ 9 + 1 @ 10


def _encode_block(wtr, blk, q, dc_codes, ac_codes, pred, level=128.0):
    """FDCT + quantize + Huffman one 8x8 block; returns new DC pred."""
    coef = _C @ (blk - level) @ _C.T
    # quantize in raster then reorder to zigzag: z[i] = raster[_ZIGZAG[i]]
    qraster = np.round(coef.reshape(-1)
                       / q[np.argsort(_ZIGZAG)]).astype(np.int64)
    z = qraster[_ZIGZAG]
    diff = int(z[0]) - pred
    pred = int(z[0])
    t = int(diff).bit_length() if diff else 0
    ln, code = dc_codes[t]
    wtr.put(code, ln)
    if t:
        wtr.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and z[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(z[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]           # ZRL
            wtr.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = ac_codes[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]               # EOB
        wtr.put(code, ln)
    return pred


def _dht_segment(tc, th, spec) -> bytes:
    bits, vals = spec
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _component_planes(pixels: bytes, width: int, height: int,
                      hy: int, vy: int, precision: int = 8
                      ) -> list[np.ndarray]:
    """RGB -> padded (Y, Cb, Cr) planes: Y at the full-MCU-padded
    resolution, chroma box-filter downsampled by (hy, vy) and padded to
    one block per MCU.  At precision=12 the 8-bit RGB widens to
    v<<4|v>>4 BEFORE color conversion, so chroma stays centered on
    2048."""
    # SOF dimensions are 16-bit fields (T.81 B.2.2): 0 and >65535 are
    # unrepresentable; a mismatched buffer must be loud, not truncated
    if not (1 <= width <= 65535 and 1 <= height <= 65535):
        raise ValueError(f"JPEG dimensions must be 1..65535, got "
                         f"{width}x{height}")
    if len(pixels) != 3 * width * height:
        raise ValueError(f"pixel buffer is {len(pixels)} bytes, geometry "
                         f"{width}x{height} needs {3 * width * height}")
    px = np.frombuffer(pixels, np.uint8) \
        .reshape(height, width, 3).astype(np.float64)
    if precision == 12:
        px = px * 16.0 + np.floor(px / 16.0)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    center = float(1 << (precision - 1))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
    mcux = (width + 8 * hy - 1) // (8 * hy)
    mcuy = (height + 8 * vy - 1) // (8 * vy)

    def pad(plane, th, tw):
        p = np.empty((th, tw), np.float64)
        ph0, pw0 = plane.shape
        p[:ph0, :pw0] = plane
        p[ph0:, :pw0] = plane[-1:, :]           # edge-replicate pad
        p[:, pw0:] = p[:, pw0 - 1:pw0]
        return p

    yp = pad(y, mcuy * 8 * vy, mcux * 8 * hy)
    if (hy, vy) == (1, 1):
        return [yp, pad(cb, mcuy * 8, mcux * 8), pad(cr, mcuy * 8, mcux * 8)]
    # box-filter chroma over (vy, hy) windows of the edge-padded plane
    ch = (height + vy - 1) // vy
    cw = (width + hy - 1) // hy
    out = [yp]
    for plane in (cb, cr):
        p = pad(plane, ch * vy, cw * hy)
        small = p.reshape(ch, vy, cw, hy).mean(axis=(1, 3))
        out.append(pad(small, mcuy * 8, mcux * 8))
    return out


def encode_jpeg(pixels: bytes, width: int, height: int, *,
                quality: int = 85, subsampling: str = "444",
                precision: int = 8) -> bytes:
    """Encode raw RGB triples as a baseline JFIF JPEG at 4:4:4, 4:2:2
    or 4:2:0 chroma subsampling (interleaved MCU order).  At
    ``precision=12`` (SOF1, the extended-sequential 12-bit mode) 8-bit
    inputs widen to v<<4|v>>4 — so the decoder's high-bits reduction
    round-trips exactly — and entropy coding uses flat tables sized for
    the wider category alphabet."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    hy, vy = _SUBSAMPLING[subsampling]
    ql, qc = _quality_tables(quality)
    planes = _component_planes(pixels, width, height, hy, vy, precision)
    level = float(1 << (precision - 1))
    mcux = (width + 8 * hy - 1) // (8 * hy)
    mcuy = (height + 8 * vy - 1) // (8 * vy)
    if precision == 8:
        dc_l, ac_l = _encode_codes(*_DC_L), _encode_codes(*_AC_L)
        dc_c, ac_c = _encode_codes(*_DC_C), _encode_codes(*_AC_C)
    else:
        dc_l = dc_c = _encode_codes(*_DC12)
        ac_l = ac_c = _encode_codes(*_AC12)
    wtr = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vy):                # luma blocks of the MCU
                for bx in range(hy):
                    y0, x0 = (my * vy + by) * 8, (mx * hy + bx) * 8
                    blk = planes[0][y0:y0 + 8, x0:x0 + 8]
                    pred[0] = _encode_block(wtr, blk, ql, dc_l, ac_l,
                                            pred[0], level)
            for ci in (1, 2):                   # one chroma block each
                blk = planes[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                pred[ci] = _encode_block(wtr, blk, qc, dc_c, ac_c,
                                         pred[ci], level)
    ecs = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    hv_y = (hy << 4) | vy
    sof_marker = 0xC0 if precision == 8 else 0xC1
    out = b"\xff\xd8"                                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(ql.astype(np.uint8)))  # DQT luma
    out += seg(0xDB, b"\x01" + bytes(qc.astype(np.uint8)))  # DQT chroma
    out += seg(sof_marker, struct.pack(">BHHB", precision, height, width, 3)
               + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1]))
    if precision == 8:
        out += seg(0xC4, _dht_segment(0, 0, _DC_L))
        out += seg(0xC4, _dht_segment(1, 0, _AC_L))
        out += seg(0xC4, _dht_segment(0, 1, _DC_C))
        out += seg(0xC4, _dht_segment(1, 1, _AC_C))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    else:
        out += seg(0xC4, _dht_segment(0, 0, _DC12))
        out += seg(0xC4, _dht_segment(1, 0, _AC12))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += ecs + b"\xff\xd9"                                # EOI
    return out


# ---------------------------------------------------------------------------
# progressive encode (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------

#: Flat Huffman specs for progressive scans.  The Annex K example tables
#: carry no EOBn symbols (r<15, s=0 beyond 0x00), so a progressive
#: encoder needs its own tables; rather than computing per-scan optimal
#: code lengths we use fixed-length canonical tables — 12 DC symbols at
#: 4 bits and all 176 run/size symbols at 8 bits (both < the all-ones
#: code, so the tables are valid).  Compression is worse than optimal;
#: correctness and decoder coverage are identical.
_P_DC = ((0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
         tuple(range(12)))
_P_AC = ((0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0),
         tuple((r << 4) | s for r in range(16) for s in range(11)))


def _quantize_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block of a padded plane; returns
    (bh, bw, 64) int64 in ZIGZAG order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ij,abjk,kl->abil", _C, blocks, _C.T)
    qraster = np.round(coef.reshape(bh, bw, 64)
                       / q[np.argsort(_ZIGZAG)]).astype(np.int64)
    return qraster[..., _ZIGZAG]


def _put_magnitude(wtr, v: int, t: int) -> None:
    wtr.put(v if v > 0 else v + (1 << t) - 1, t)


def _enc_dc_scan(wtr, zs, ah, al, dc_codes, hy=1, vy=1):
    """Interleaved DC scan in MCU order — (vy*hy) luma blocks then one
    block per chroma component per MCU: first pass = diff coding of the
    point-transformed DC; refinement = one raw bit per block."""
    preds = [0] * len(zs)
    mcuy, mcux = zs[1].shape[:2] if len(zs) > 1 else zs[0].shape[:2]

    def unit(ci, by, bx):
        dc = int(zs[ci][by, bx, 0])
        if ah == 0:
            v = dc >> al                              # arithmetic shift
            diff = v - preds[ci]
            preds[ci] = v
            t = abs(diff).bit_length()
            ln, code = dc_codes[t]
            wtr.put(code, ln)
            if t:
                _put_magnitude(wtr, diff, t)
        else:
            wtr.put((dc >> al) & 1, 1)

    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vy):
                for bx in range(hy):
                    unit(0, my * vy + by, mx * hy + bx)
            for ci in range(1, len(zs)):
                unit(ci, my, mx)


class _EobRun:
    """Shared EOB-run + buffered-correction-bit state for AC scans."""

    def __init__(self, wtr, ac_codes):
        self.wtr, self.ac = wtr, ac_codes
        self.run = 0
        self.bits: list[int] = []

    def emit(self):
        if self.run:
            r = self.run.bit_length() - 1
            ln, code = self.ac[r << 4]
            self.wtr.put(code, ln)
            if r:
                self.wtr.put(self.run - (1 << r), r)
            self.run = 0
        for b in self.bits:
            self.wtr.put(b, 1)
        self.bits = []

    def bump(self):
        self.run += 1
        if self.run == 32767:
            self.emit()


def _enc_ac_first_scan(wtr, blocks, ss, se, al, ac_codes):
    """AC first pass (T.81 G.1.2.2): run/size coding of the
    point-transformed band with cross-block EOB runs."""
    eob = _EobRun(wtr, ac_codes)
    for blk in blocks:
        band = blk[ss:se + 1]
        v = np.sign(band) * (np.abs(band) >> al)
        nz = np.nonzero(v)[0]
        if len(nz) == 0:
            eob.bump()
            continue
        eob.emit()
        run = 0
        for i in range(int(nz[-1]) + 1):
            x = int(v[i])
            if x == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                wtr.put(code, ln)
                run -= 16
            t = abs(x).bit_length()
            ln, code = ac_codes[(run << 4) | t]
            wtr.put(code, ln)
            _put_magnitude(wtr, x, t)
            run = 0
        if int(nz[-1]) < se - ss:
            eob.bump()
    eob.emit()


def _enc_ac_refine_scan(wtr, blocks, ss, se, al, ac_codes):
    """AC refinement pass (T.81 G.1.2.3): newly-nonzero coefficients emit
    (run, 1) + sign; history coefficients append buffered correction
    bits that ride behind the next emitted symbol or EOB run."""
    eob = _EobRun(wtr, ac_codes)
    for blk in blocks:
        band = blk[ss:se + 1]
        absv = (np.abs(band) >> al).astype(np.int64)
        last_new = 0
        for k in range(len(band)):
            if absv[k] == 1:
                last_new = k + 1
        r = 0
        pend: list[int] = []
        for k in range(len(band)):
            t = int(absv[k])
            if t == 0:
                r += 1
                continue
            while r > 15 and k < last_new:
                eob.emit()
                ln, code = ac_codes[0xF0]
                wtr.put(code, ln)
                r -= 16
                for b in pend:
                    wtr.put(b, 1)
                pend = []
            if t > 1:                                  # history coefficient
                pend.append(t & 1)
                continue
            eob.emit()
            ln, code = ac_codes[(r << 4) | 1]
            wtr.put(code, ln)
            wtr.put(1 if int(band[k]) >= 0 else 0, 1)
            for b in pend:
                wtr.put(b, 1)
            pend = []
            r = 0
        if r > 0 or pend:
            eob.bits.extend(pend)
            eob.bump()
    eob.emit()


#: The default scan script: DC at Al=1 then refined; luma AC split into
#: a coarse 1-5 band and the 6-63 tail, two successive-approximation
#: levels; chroma AC at Al=1 then refined.  Bands repeat exactly across
#: refinement passes (strict T.81 G.1.1.1.1 progression).
_PROG_SCRIPT = (
    ("dc", None, 0, 0, 0, 1),
    ("ac", 0, 1, 5, 0, 2),
    ("ac", 1, 1, 63, 0, 1),
    ("ac", 2, 1, 63, 0, 1),
    ("ac", 0, 6, 63, 0, 2),
    ("dc", None, 0, 0, 1, 0),
    ("ac", 0, 1, 5, 2, 1),
    ("ac", 0, 6, 63, 2, 1),
    ("ac", 1, 1, 63, 1, 0),
    ("ac", 2, 1, 63, 1, 0),
    ("ac", 0, 1, 5, 1, 0),
    ("ac", 0, 6, 63, 1, 0),
)


def encode_jpeg_progressive(pixels: bytes, width: int, height: int, *,
                            quality: int = 85,
                            subsampling: str = "444") -> bytes:
    """Encode raw RGB triples as a progressive (SOF2) JFIF JPEG at
    4:4:4 / 4:2:2 / 4:2:0 using :data:`_PROG_SCRIPT` — spectral
    selection AND successive approximation, so a decoder must exercise
    DC/AC first + refinement passes and EOB runs.  Coefficients and
    quant tables are identical to :func:`encode_jpeg` at the same
    quality and subsampling: progressive and baseline encodes of one
    image decode to byte-identical RGB.  AC scans are non-interleaved
    and cover each component's OWN ceil(samples/8) block grid (T.81
    A.2.2); the interleaved DC scan covers the full MCU grid including
    padding blocks.
    """
    hy, vy = _SUBSAMPLING[subsampling]
    ql, qc = _quality_tables(quality)
    planes = _component_planes(pixels, width, height, hy, vy)
    zs = [_quantize_plane(p, ql if i == 0 else qc)
          for i, p in enumerate(planes)]
    # non-interleaved AC block grids (exclude MCU padding blocks)
    nonint = [((height + 7) // 8, (width + 7) // 8),
              (((height + vy - 1) // vy + 7) // 8,
               ((width + hy - 1) // hy + 7) // 8)]
    nonint.append(nonint[1])
    dc_codes = _encode_codes(*_P_DC)
    ac_codes = _encode_codes(*_P_AC)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(ql.astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc.astype(np.uint8)))
    out += seg(0xC2, struct.pack(">BHHB", 8, height, width, 3)
               + bytes([1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += seg(0xC4, _dht_segment(0, 0, _P_DC))
    out += seg(0xC4, _dht_segment(1, 0, _P_AC))
    for kind, ci, ss, se, ah, al in _PROG_SCRIPT:
        wtr = _BitWriter()
        if kind == "dc":
            comps = bytes([1, 0x00, 2, 0x00, 3, 0x00])
            _enc_dc_scan(wtr, zs, ah, al, dc_codes, hy, vy)
            sos = bytes([3]) + comps
        else:
            bh, bw = nonint[ci]
            blocks = zs[ci][:bh, :bw].reshape(-1, 64)
            if ah == 0:
                _enc_ac_first_scan(wtr, blocks, ss, se, al, ac_codes)
            else:
                _enc_ac_refine_scan(wtr, blocks, ss, se, al, ac_codes)
            sos = bytes([1, ci + 1, 0x00])
        out += seg(0xDA, sos + bytes([ss, se, (ah << 4) | al]))
        out += wtr.flush()
    return out + b"\xff\xd9"
