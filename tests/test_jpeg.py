"""Baseline JPEG codec tests — dependency-free decode of genuinely
entropy-coded streams (operators/jpeg.py), mirroring the reference's
codec round-trip test pattern (pdata/ptrace/json_test.go) at the media
layer.  JPEG is lossy, so round-trips assert RMSE bounds, not equality;
structural fields (dims, marker handling) are exact."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.jpeg import (_AC_L, _DC_L, _Bits,
                                                       _BitWriter,
                                                       _canonical_codes,
                                                       _encode_block,
                                                       _encode_codes,
                                                       _quality_tables,
                                                       _split_ecs,
                                                       decode_jpeg,
                                                       encode_jpeg)


def _rmse(a: bytes, b: bytes) -> float:
    x = np.frombuffer(a, np.uint8).astype(float)
    y = np.frombuffer(b, np.uint8).astype(float)
    return float(np.sqrt(((x - y) ** 2).mean()))


def test_roundtrip_dims_and_noise_bound():
    """Random (worst-case) pixels: exact dims, bounded loss at q90."""
    rng = np.random.default_rng(7)
    for (w, h) in [(8, 8), (16, 8), (17, 13), (1, 1), (5, 3)]:
        pix = rng.integers(0, 256, 3 * w * h, dtype=np.uint8).tobytes()
        gw, gh, rgb = decode_jpeg(encode_jpeg(pix, w, h, quality=90))
        assert (gw, gh) == (w, h)
        assert len(rgb) == 3 * w * h
        assert _rmse(pix, rgb) < 15.0


def test_smooth_image_near_lossless():
    """A smooth gradient at q95 must come back nearly exact — the DCT
    energy compaction sanity check (a broken IDCT/zigzag/quant mapping
    fails this loudly while possibly passing a loose noise bound)."""
    w = h = 32
    grad = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            grad[y, x] = (x * 4, y * 4, 128)
    gw, gh, rgb = decode_jpeg(encode_jpeg(grad.tobytes(), w, h, quality=95))
    assert (gw, gh) == (w, h)
    assert _rmse(grad.tobytes(), rgb) < 2.0


def test_grayscale_single_component():
    """1-component stream decodes with Y replicated into RGB."""
    w, h = 16, 8
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (h, w)).astype(np.float64)
    ql, _ = _quality_tables(92)
    wtr = _BitWriter()
    dc, ac = _encode_codes(*_DC_L), _encode_codes(*_AC_L)
    pred = 0
    for mx in range(w // 8):
        pred = _encode_block(wtr, y[:, mx * 8:mx * 8 + 8], ql, dc, ac, pred)
    ecs = wtr.flush()

    def seg(m, body):
        return struct.pack(">BBH", 0xFF, m, len(body) + 2) + body

    buf = (b"\xff\xd8"
           + seg(0xDB, b"\x00" + bytes(ql.astype(np.uint8)))
           + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
           + seg(0xC4, bytes([0x00]) + bytes(_DC_L[0]) + bytes(_DC_L[1]))
           + seg(0xC4, bytes([0x10]) + bytes(_AC_L[0]) + bytes(_AC_L[1]))
           + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
           + ecs + b"\xff\xd9")
    gw, gh, rgb = decode_jpeg(buf)
    assert (gw, gh) == (w, h)
    px = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert (px[..., 0] == px[..., 1]).all() and (px[..., 1] == px[..., 2]).all()
    assert float(np.abs(px[..., 0].astype(float) - y).mean()) < 6.0


def test_chroma_subsampling_420():
    """4:2:0 decode: Y at 2x2 factors, constant chroma — the upsample
    path must reproduce the luma structure and neutral color."""
    w = h = 16
    rng = np.random.default_rng(5)
    y = rng.integers(40, 216, (h, w)).astype(np.float64)
    ql, qc = _quality_tables(92)
    wtr = _BitWriter()
    dcl, acl = _encode_codes(*_DC_L), _encode_codes(*_AC_L)
    pred = [0, 0, 0]
    flat = np.full((8, 8), 128.0)
    # one MCU = 16x16: 4 Y blocks then 1 Cb + 1 Cr (8x8 covering 16x16)
    for by in range(2):
        for bx in range(2):
            pred[0] = _encode_block(
                wtr, y[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                ql, dcl, acl, pred[0])
    pred[1] = _encode_block(wtr, flat, qc, dcl, acl, pred[1])
    pred[2] = _encode_block(wtr, flat, qc, dcl, acl, pred[2])
    ecs = wtr.flush()

    def seg(m, body):
        return struct.pack(">BBH", 0xFF, m, len(body) + 2) + body

    buf = (b"\xff\xd8"
           + seg(0xDB, b"\x00" + bytes(ql.astype(np.uint8)))
           + seg(0xDB, b"\x01" + bytes(qc.astype(np.uint8)))
           + seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                 + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
           + seg(0xC4, bytes([0x00]) + bytes(_DC_L[0]) + bytes(_DC_L[1]))
           + seg(0xC4, bytes([0x10]) + bytes(_AC_L[0]) + bytes(_AC_L[1]))
           + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
           + ecs + b"\xff\xd9")
    gw, gh, rgb = decode_jpeg(buf)
    assert (gw, gh) == (w, h)
    px = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(float)
    # neutral chroma -> R==G==B (within rounding)
    assert float(np.abs(px[..., 0] - px[..., 2]).max()) <= 2.0
    assert float(np.abs(px[..., 0] - y).mean()) < 6.0


def test_restart_markers():
    """DRI/RSTn: DC predictors reset at each restart interval."""
    w, h = 24, 8          # 3 MCUs at 4:4:4, restart every 1 MCU
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, 3 * w * h, dtype=np.uint8)
    px = pix.reshape(h, w, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    yp = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql, qc = _quality_tables(90)
    dcl, acl = _encode_codes(*_DC_L), _encode_codes(*_AC_L)
    chunks = []
    for mx in range(3):
        wtr = _BitWriter()
        pred = [0, 0, 0]   # reset per restart interval
        for ci, plane in enumerate((yp, cb, cr)):
            q = ql if ci == 0 else qc
            pred[ci] = _encode_block(
                wtr, plane[:, mx * 8:mx * 8 + 8], q, dcl, acl, pred[ci])
        chunks.append(wtr.flush())
    ecs = chunks[0] + b"\xff\xd0" + chunks[1] + b"\xff\xd1" + chunks[2]

    def seg(m, body):
        return struct.pack(">BBH", 0xFF, m, len(body) + 2) + body

    buf = (b"\xff\xd8"
           + seg(0xDB, b"\x00" + bytes(ql.astype(np.uint8)))
           + seg(0xDB, b"\x01" + bytes(qc.astype(np.uint8)))
           + seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                 + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
           + seg(0xC4, bytes([0x00]) + bytes(_DC_L[0]) + bytes(_DC_L[1]))
           + seg(0xC4, bytes([0x10]) + bytes(_AC_L[0]) + bytes(_AC_L[1]))
           + seg(0xDD, struct.pack(">H", 1))
           + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
           + ecs + b"\xff\xd9")
    gw, gh, rgb = decode_jpeg(buf)
    assert (gw, gh) == (w, h)
    assert _rmse(pix.tobytes(), rgb) < 15.0


def test_split_ecs_unstuffing():
    """0xFF00 un-stuffs to 0xFF; RSTn splits segments; EOI stops."""
    buf = b"\xff\xd8" + b"\xab\xff\x00\xcd" + b"\xff\xd0" + b"\x01\x02" \
        + b"\xff\xd9trailing"
    segs, end = _split_ecs(buf, 2)
    assert segs == [b"\xab\xff\xcd", b"\x01\x02"]
    assert buf[end:end + 2] == b"\xff\xd9"


def test_loud_stubs_and_errors():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")
    def seg(m, body):
        return struct.pack(">BBH", 0xFF, m, len(body) + 2) + body
    # invalid sample precision (only 8- and 12-bit exist in T.81)
    deep = (b"\xff\xd8"
            + seg(0xC0, struct.pack(">BHHB", 16, 8, 8, 1) + bytes([1, 0x11, 0])))
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(deep)


def test_huffman_tables_invert():
    """Canonical decode/encode tables are consistent inverses."""
    dec = _canonical_codes(*_AC_L)
    enc = _encode_codes(*_AC_L)
    for sym, (ln, code) in enc.items():
        assert dec[(ln, code)] == sym
    # decoding a written code recovers the symbol
    wtr = _BitWriter()
    ln, code = enc[0xF0]
    wtr.put(code, ln)
    # the writer emits a STUFFED stream (0xFF -> 0xFF 0x00); _Bits reads
    # un-stuffed segments, so strip the stuffing as _split_ecs would
    rd = _Bits(wtr.flush().replace(b"\xff\x00", b"\xff"))
    assert rd.huff(dec) == 0xF0


def test_image_pixels_routes_jpeg_and_resize_consumes_it():
    """The multimodal resize path accepts JPEG payloads end-to-end."""
    from otel_arrow_collector_spark.operators.multimodal import _image_pixels
    w, h = 16, 16
    grad = np.zeros((h, w, 3), np.uint8)
    grad[..., 0] = np.arange(w, dtype=np.uint8) * 8
    buf = encode_jpeg(grad.tobytes(), w, h, quality=95)
    gw, gh, rgb = _image_pixels(buf)
    assert (gw, gh) == (w, h)
    assert _rmse(grad.tobytes(), rgb) < 4.0


def test_decode_jpeg_stats_mean_luma():
    from otel_arrow_collector_spark.operators.multimodal import (
        decode_jpeg_stats)
    w = h = 8
    flat = np.full((h, w, 3), 100, np.uint8)
    st = decode_jpeg_stats(encode_jpeg(flat.tobytes(), w, h, quality=95))
    assert st["format"] == "image/jpeg"
    assert (st["width"], st["height"]) == (w, h)
    assert abs(st["mean_luma"] - 100) <= 2


# --- progressive (SOF2) ----------------------------------------------------

def test_progressive_equals_baseline_decode():
    """The progressive encode of an image carries the SAME quantized
    coefficients as its baseline encode, so both must decode to
    byte-identical RGB — one equality that covers DC first/refine, AC
    first with EOB runs, and successive-approximation refinement."""
    import numpy as np

    from otel_arrow_collector_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)
    rng = np.random.default_rng(7)
    for w, h, q in [(8, 8, 85), (24, 16, 85), (13, 11, 60), (32, 24, 92),
                    (16, 16, 10), (16, 16, 100)]:
        pix = bytes(rng.integers(0, 256, 3 * w * h, dtype=np.uint8))
        base = decode_jpeg(encode_jpeg(pix, w, h, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(pix, w, h, quality=q))
        assert base == prog, (w, h, q)


def test_progressive_eob_runs_and_zrl():
    """Degenerate contents that force the corner paths: flat images
    (multi-block EOB runs), per-block impulses (ZRL in first+refine
    passes), checkerboard (max AC energy)."""
    import numpy as np

    from otel_arrow_collector_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)
    flat = bytes([128, 128, 128]) * (64 * 64)
    imp = np.full((32, 32, 3), 10, np.uint8)
    imp[::8, ::8] = 250
    chk = np.zeros((16, 16, 3), np.uint8)
    chk[::2, 1::2] = 255
    chk[1::2, ::2] = 255
    for pix, w, h in [(flat, 64, 64), (imp.tobytes(), 32, 32),
                      (chk.tobytes(), 16, 16)]:
        assert decode_jpeg(encode_jpeg_progressive(pix, w, h)) \
            == decode_jpeg(encode_jpeg(pix, w, h))


def test_progressive_marker_is_sof2():
    from otel_arrow_collector_spark.operators.jpeg import \
        encode_jpeg_progressive
    j = encode_jpeg_progressive(bytes(192), 8, 8)
    assert b"\xff\xc2" in j and b"\xff\xc0" not in j
    assert j.count(b"\xff\xda") == 12        # the 12-scan script


def test_hierarchical_stays_loud():
    """SOF2 is real now; hierarchical (SOF5..7 etc.) stays a loud stub."""
    import pytest as _pytest

    from otel_arrow_collector_spark.operators.jpeg import (decode_jpeg,
                                                           encode_jpeg)
    j = bytearray(encode_jpeg(bytes(192), 8, 8))
    i = j.find(b"\xff\xc0")
    j[i + 1] = 0xC5
    with _pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(j))


def test_subsampled_baseline_roundtrip_and_flat_exact():
    """4:2:2/4:2:0 encode->decode: geometry preserved and a flat image
    (constant chroma: box filter is exact, DC quantizer 8 at q76)
    round-trips byte-exactly through the subsampled path."""
    import numpy as np

    from otel_arrow_collector_spark.operators.jpeg import (decode_jpeg,
                                                           encode_jpeg)
    rng = np.random.default_rng(5)
    for sub in ("422", "420"):
        for w, h in [(16, 16), (13, 11)]:
            pix = bytes(rng.integers(0, 256, 3 * w * h, dtype=np.uint8))
            gw, gh, _ = decode_jpeg(encode_jpeg(pix, w, h, subsampling=sub))
            assert (gw, gh) == (w, h)
        flat = bytes([90, 90, 90]) * (16 * 16)
        assert decode_jpeg(encode_jpeg(flat, 16, 16, quality=76,
                                       subsampling=sub))[2] == flat


def test_progressive_equals_baseline_all_subsamplings():
    """Progressive vs baseline byte-equality extends to 4:2:2/4:2:0 —
    pinning the decoder's subsampled-progressive geometry (interleaved
    DC over the MCU grid incl. padding blocks, non-interleaved AC over
    each component's own ceil(samples/8) grid)."""
    import numpy as np

    from otel_arrow_collector_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)
    rng = np.random.default_rng(11)
    for sub in ("422", "420"):
        for w, h in [(16, 16), (13, 11), (17, 9), (32, 24)]:
            pix = bytes(rng.integers(0, 256, 3 * w * h, dtype=np.uint8))
            assert decode_jpeg(encode_jpeg(pix, w, h, subsampling=sub)) \
                == decode_jpeg(encode_jpeg_progressive(
                    pix, w, h, subsampling=sub)), (sub, w, h)


# --- 12-bit (SOF1 extended sequential) -------------------------------------

def test_12bit_flat_exact_all_values():
    """Every flat color round-trips exactly through the 12-bit path at
    quality 76: 8-bit inputs widen to v<<4|v>>4 BEFORE color conversion
    (chroma stays centered on 2048), constant blocks survive
    DCT->quantize->IDCT, and the high-bits reduction shifts back."""
    from otel_arrow_collector_spark.operators.jpeg import (decode_jpeg,
                                                           encode_jpeg)
    for v in range(0, 256, 7):
        pix = bytes([v, v, v]) * (16 * 8)
        assert decode_jpeg(encode_jpeg(pix, 16, 8, quality=76,
                                       precision=12))[2] == pix, v


def test_12bit_is_higher_fidelity_than_8bit():
    """Same quality, same source: the 12-bit mode's effective quantizer
    is 16x finer, so reconstruction error must drop by >2x."""
    import numpy as np

    from otel_arrow_collector_spark.operators.jpeg import (decode_jpeg,
                                                           encode_jpeg)
    rng = np.random.default_rng(3)
    pix = bytes(rng.integers(0, 256, 3 * 16 * 16, dtype=np.uint8))
    src = np.frombuffer(pix, np.uint8).astype(int)
    e8 = np.abs(np.frombuffer(decode_jpeg(
        encode_jpeg(pix, 16, 16, quality=90))[2],
        np.uint8).astype(int) - src).mean()
    e12 = np.abs(np.frombuffer(decode_jpeg(
        encode_jpeg(pix, 16, 16, quality=90, precision=12))[2],
        np.uint8).astype(int) - src).mean()
    assert e12 < e8 / 2
    j = encode_jpeg(pix, 16, 16, precision=12)
    assert b"\xff\xc1" in j and j[j.index(b"\xff\xc1") + 4] == 12
