"""Encoder-side hostile-field sweep — completes the fenced_decoder
story: the mutation sweep (test_decoder_fuzz_sweep.py) feeds hostile
BYTES to every reader; this one feeds hostile FIELD VALUES to every
writer and pins the pack contract:

    pack(input) either (a) raises the loud contract (ValueError, or
    NotImplementedError on a documented stub) or (b) returns bytes its
    OWN reader accepts and that faithfully carry the input — never a
    third exception type, never bytes the matching decoder rejects,
    never silent corruption.

Hostile classes per format: ustar name-field overflow, WARC header
CR/LF injection, 16-bit dimension-field edges (JPEG/GIF), zero-size
images (QOI/TIFF/PNG/BMP/Netpbm), geometry/buffer mismatches,
out-of-range sample values, counter-field overflow (tar mtime/size
octal fields)."""

from __future__ import annotations

import io
import tarfile

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.adpcm import (adpcm_decode,
                                                        adpcm_encode)
from otel_arrow_collector_spark.operators.g711 import (alaw_decode,
                                                       alaw_encode,
                                                       ulaw_decode,
                                                       ulaw_encode)
from otel_arrow_collector_spark.operators.gif import decode_gif, encode_gif
from otel_arrow_collector_spark.operators.jpeg import decode_jpeg, encode_jpeg
from otel_arrow_collector_spark.operators.multimodal import (decode_bmp,
                                                             decode_png,
                                                             decode_wav,
                                                             encode_bmp,
                                                             encode_mp4_mjpeg,
                                                             encode_png,
                                                             encode_wav)
from otel_arrow_collector_spark.operators.netpbm import (netpbm_decode,
                                                         netpbm_encode)
from otel_arrow_collector_spark.operators.qoi import qoi_decode, qoi_encode
from otel_arrow_collector_spark.operators.tiff import tiff_decode, tiff_encode
from otel_arrow_collector_spark.sources.archive import tar_pack, tar_unpack
from otel_arrow_collector_spark.sources.warc import build_warc, parse_warc

LOUD = (ValueError, NotImplementedError)


def pack_or_loud(fn, *a, **kw):
    """Run a packer; a loud-contract exception returns None, any other
    exception type is the escape this sweep exists to catch."""
    try:
        return fn(*a, **kw)
    except LOUD:
        return None
    except Exception as e:                        # pragma: no cover
        pytest.fail(f"{fn.__name__} escaped the loud contract with "
                    f"{type(e).__name__}: {e}")


# -- tar ---------------------------------------------------------------------

@pytest.mark.parametrize("name", [
    "x" * 300,                       # no slash at all past both limits
    "x" * 99 + "/" + "y" * 200,      # remainder too long for the name field
    "a/" + "b" * 160,                # prefix fits, name 160 > 100
    "",                              # empty member name
    "π/ünïcode/" + "x" * 120,        # multibyte utf-8 around the split
    "dir/" * 60 + "leaf",            # many slashes, total 244
])
def test_tar_pack_hostile_names(name):
    blob = pack_or_loud(tar_pack, [(name, b"payload")])
    if blob is None:
        return
    assert tar_unpack(blob) == [(name, b"payload")]
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:   # interop reader
        assert [m.name for m in tf.getmembers()] == [name]


@pytest.mark.parametrize("mtime", [-1, 8 ** 11, 2 ** 63])
def test_tar_pack_mtime_overflow(mtime):
    # the 12-byte octal field holds < 8^11; anything outside must be
    # loud, never a corrupt header CPython's tarfile chokes on
    blob = pack_or_loud(tar_pack, [("f", b"x")], mtime=mtime)
    if blob is None:
        return
    assert tar_unpack(blob) == [("f", b"x")]
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert tf.getmembers()[0].mtime == mtime


def test_tar_pack_name_with_nul():
    # NUL terminates the ustar name field: emitting it would silently
    # truncate the name on read — loud error or faithful round-trip only
    blob = pack_or_loud(tar_pack, [("evil\x00name", b"p")])
    if blob is not None:
        assert tar_unpack(blob) == [("evil\x00name", b"p")]


# -- WARC --------------------------------------------------------------------

def _rec(**over):
    r = {"type": "response", "uri": "http://example.com/a",
         "date": "2026-01-01T00:00:00Z", "record_id": "<urn:uuid:1>",
         "payload": b"HTTP/1.1 200 OK\r\n\r\nbody"}
    r.update(over)
    return r


@pytest.mark.parametrize("field,value", [
    ("uri", "http://x/\r\nWARC-Type: evil"),
    ("type", "response\r\nContent-Length: 9999"),
    ("record_id", "<urn:a>\r\nX: y"),
    ("date", "2026\rT00:00:00Z"),
    ("content_type", "text/plain\r\nContent-Length: 0"),
])
def test_warc_header_crlf_injection(field, value):
    """A CR/LF in any header value would inject headers and desync the
    parser's Content-Length framing — must be loud, never emitted."""
    blob = pack_or_loud(build_warc, [_rec(**{field: value})])
    if blob is None:
        return
    recs = parse_warc(blob)
    assert len(recs) == 1
    got = recs[0]["headers"].get(
        {"uri": "WARC-Target-URI", "type": "WARC-Type",
         "record_id": "WARC-Record-ID", "date": "WARC-Date",
         "content_type": "Content-Type"}[field])
    assert got == value                 # faithful or nothing


def test_warc_payload_containing_warc_magic_roundtrips():
    evil = b"WARC/1.0\r\nWARC-Type: fake\r\n\r\n" * 3
    blob = build_warc([_rec(payload=evil)])
    recs = parse_warc(blob)
    assert len(recs) == 1 and recs[0]["payload"] == evil


# -- JPEG --------------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(0, 8), (8, 0), (65536, 1), (1, 65536)])
def test_jpeg_dimension_field_edges(w, h):
    # SOF dimensions are 16-bit: 0 and 65536 cannot be represented
    n = max(w * h, 0) * 3
    buf = bytes(n) if n <= 3 * 65536 else None
    if buf is None:
        pytest.skip("buffer too large")
    out = pack_or_loud(encode_jpeg, buf, w, h)
    if out is not None:
        dw, dh, _ = decode_jpeg(out)
        assert (dw, dh) == (w, h)


def test_jpeg_16bit_edge_dimension_encodes():
    # 65535 IS representable; a thin edge-width strip must round-trip
    w, h = 65535, 1
    out = encode_jpeg(bytes([128]) * (w * h * 3), w, h, quality=76)
    dw, dh, px = decode_jpeg(out)
    assert (dw, dh) == (w, h) and len(px) == w * h * 3


def test_jpeg_buffer_geometry_mismatch():
    assert pack_or_loud(encode_jpeg, bytes(10), 8, 8) is None


# -- GIF ---------------------------------------------------------------------

def test_gif_dimension_edges():
    assert pack_or_loud(encode_gif, b"", 0, 0) is None or True
    out = pack_or_loud(encode_gif, b"", 0, 5)
    if out is not None:
        w, h, px = decode_gif(out)
        assert (w, h, px) == (0, 5, b"")
    # 65536 overflows the 16-bit logical-screen field
    big = pack_or_loud(encode_gif, bytes(65536 * 3), 65536, 1)
    if big is not None:
        w, h, _ = decode_gif(big)
        assert (w, h) == (65536, 1)


def test_gif_buffer_mismatch_and_palette_overflow():
    assert pack_or_loud(encode_gif, bytes(10), 8, 8) is None
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8).tobytes()
    # 400 likely-unique colors: must be the documented loud error
    assert pack_or_loud(encode_gif, px, 20, 20) is None


# -- zero-size images --------------------------------------------------------

def test_qoi_zero_size():
    img = np.zeros((0, 5, 3), np.uint8)
    out = pack_or_loud(qoi_encode, img)
    if out is not None:
        dec, _ = qoi_decode(out)
        assert dec.shape == (0, 5, 3)


def test_tiff_zero_size():
    img = np.zeros((0, 4), np.uint8)
    out = pack_or_loud(tiff_encode, img)
    if out is not None:
        assert tiff_decode(out).shape == (0, 4)


def test_netpbm_zero_size_and_bad_maxval():
    img = np.zeros((0, 3), np.uint8)
    for kind in (2, 5):
        out = pack_or_loud(netpbm_encode, img, kind)
        if out is not None:
            dec, _ = netpbm_decode(out)
            assert dec.size == 0
    full = np.zeros((2, 2), np.uint8)
    for maxval in (0, -1, 70000):
        assert pack_or_loud(netpbm_encode, full, 5, maxval=maxval) is None


def test_png_bmp_zero_and_mismatch():
    out = pack_or_loud(encode_png, b"", 0, 0)
    if out is not None:
        meta = decode_png(out)
        assert meta["width"] == 0 and meta["height"] == 0
    assert pack_or_loud(encode_png, bytes(5), 4, 4) is None
    out2 = pack_or_loud(encode_bmp, b"", 0, 0)
    if out2 is not None:
        meta2 = decode_bmp(out2)
        assert meta2["width"] == 0 and meta2["height"] == 0
    assert pack_or_loud(encode_bmp, bytes(5), 4, 4) is None


# -- audio / video -----------------------------------------------------------

def test_wav_extreme_samples_roundtrip():
    # out-of-range samples clamp (documented PCM16 saturation); the
    # reader must agree with what the writer emitted
    samples = [0, 32767, -32768, 99999, -99999]
    out = encode_wav(samples, sample_rate=8000)
    meta = decode_wav(out)
    assert meta["n_samples"] == len(samples)
    assert pack_or_loud(encode_wav, [], 8000) is not None  # empty is legal


def test_adpcm_g711_empty_and_extreme():
    empty = np.array([], np.int16)
    enc, _vp, _ix = adpcm_encode(empty)
    assert adpcm_decode(enc, n=0)[0].size == 0
    ext = np.array([32767, -32768, 0, 1, -1], np.int16)
    for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
        back = dec(enc(ext))
        assert back.shape == ext.shape
        assert np.max(np.abs(back.astype(np.int32) - ext.astype(np.int32))) \
            < 1024                       # companding tolerance


def test_mp4_mjpeg_empty_frames():
    out = pack_or_loud(encode_mp4_mjpeg, [], 8, 8, fps=10)
    if out is not None:
        assert isinstance(out, bytes)
