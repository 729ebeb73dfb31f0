"""Unified mutation fuzz over the remaining byte decoders (GIF, WARC,
tar, LZ4, ADPCM) — QOI/Netpbm/TIFF/snappy have their own fuzz passes.

Contract under hostile input: every decoder either returns or raises
ValueError — never an IndexError/KeyError/struct.error escape, never a
hang.  Cases per decoder: pure garbage, truncations of a valid blob,
and single-byte corruptions of a valid blob (the mutation class that
finds framing/length-field bugs)."""

from __future__ import annotations

import numpy as np
import pytest

from otel_arrow_collector_spark.operators.adpcm import (adpcm_decode,
                                                        adpcm_encode)
from otel_arrow_collector_spark.operators.gif import decode_gif, encode_gif
from otel_arrow_collector_spark.sources.archive import tar_pack, tar_unpack
from otel_arrow_collector_spark.sources.lz4 import (lz4_compress,
                                                    lz4_decompress)
from otel_arrow_collector_spark.sources.warc import (build_warc,
                                                     http_response,
                                                     parse_warc)


def _sweep(decode, valid: bytes, rng, rounds: int = 250) -> int:
    """Run the three mutation classes; returns how many inputs decoded
    cleanly (sanity: at least the pristine blob must)."""
    ok = 0
    cases = [valid]
    for _ in range(rounds):
        kind = rng.randint(3)
        if kind == 0:
            cases.append(bytes(rng.randint(0, 256,
                                           rng.randint(1, 80),
                                           dtype=np.int64).astype(np.uint8)))
        elif kind == 1:
            cases.append(valid[:rng.randint(0, len(valid))])
        else:
            b = bytearray(valid)
            b[rng.randint(len(b))] ^= 1 << rng.randint(8)
            cases.append(bytes(b))
    for case in cases:
        try:
            decode(case)
            ok += 1
        except (ValueError, NotImplementedError):
            # NotImplementedError: a corruption can land on a
            # deliberate loud stub (e.g. a mutated JPEG SOF marker
            # selecting arithmetic coding) — typed and legal
            pass
    return ok


def test_gif_fuzz():
    rng = np.random.RandomState(7)
    # few distinct colors -> small palette, realistic LZW stream
    px = (rng.randint(0, 4, (9, 12, 3), dtype=np.int64) * 40) \
        .astype(np.uint8).tobytes()
    valid = encode_gif(px, 12, 9)
    assert _sweep(decode_gif, valid, rng) >= 1


def test_warc_fuzz():
    rng = np.random.RandomState(11)
    valid = build_warc([{
        "type": "response", "uri": "http://x/1",
        "date": "2026-01-01T00:00:00Z", "record_id": "<urn:uuid:1>",
        "payload": http_response(b"hello world", 200)}],
        gzip_members=True)
    assert _sweep(parse_warc, valid, rng) >= 1


def test_tar_fuzz():
    rng = np.random.RandomState(13)
    valid = tar_pack([("a/b.txt", b"payload"), ("c", bytes(600))],
                     gzip_stream=True)
    assert _sweep(tar_unpack, valid, rng) >= 1


def test_lz4_fuzz():
    rng = np.random.RandomState(17)
    raw = bytes(rng.randint(0, 8, 500, dtype=np.int64).astype(np.uint8))
    valid = lz4_compress(raw)
    assert _sweep(lambda b: lz4_decompress(b, len(raw)), valid, rng) >= 1


def test_adpcm_fuzz():
    rng = np.random.RandomState(19)
    pcm = (np.sin(np.arange(400) / 7.0) * 8000).astype(np.int16)
    valid, _, _ = adpcm_encode(pcm)
    # ADPCM has no framing: any byte string decodes to SOME signal, so
    # the contract here is "never crashes", not "rejects garbage"
    assert _sweep(lambda b: adpcm_decode(b), valid, rng) >= 1



def test_tiff_empty_tag_and_pb_wire_confusion():
    """Regression pins from the deep fuzz pass: (a) a TIFF whose
    optional tag has count=0 must reject, not IndexError; (b) protobuf
    wire-type confusion (varint where a submessage was expected) must
    surface as ValueError from decode_request."""
    import struct
    from otel_arrow_collector_spark.operators.tiff import (tiff_decode,
                                                           tiff_encode)
    from otel_arrow_collector_spark.sources.otlp_pb import decode_request

    blob = bytearray(tiff_encode(np.zeros((2, 2), np.uint8)))
    # zero out one IFD entry's count field (entry walk: IFD at offset 8)
    n = struct.unpack_from("<H", blob, 8)[0]
    for k in range(n):
        off = 10 + 12 * k
        tag = struct.unpack_from("<H", blob, off)[0]
        if tag == 259:                      # Compression: optional
            struct.pack_into("<I", blob, off + 4, 0)
    try:
        tiff_decode(bytes(blob))            # count=0 -> default, decodes
    except ValueError:
        pass                                # rejecting is also legal

    # nested varint where ResourceSpans submessage belongs
    with pytest.raises(ValueError):
        decode_request(b"\x0a\x06\x0a\x04\x0a\x02\x08", "traces")


def test_pb_decode_fuzz():
    rng = np.random.RandomState(23)
    valid = b"\x0a\x06\x0a\x04\x0a\x02\x08\x01"
    from otel_arrow_collector_spark.sources.otlp_pb import decode_request
    assert _sweep(lambda b: decode_request(b, "traces"), valid, rng) >= 1


def test_media_decoders_fuzz():
    """JPEG/BMP/WAV/PNG/MP4: all public media decoders are fenced — the
    box/bit walks fail typed (ValueError), never struct.error /
    zlib.error / KeyError escapes (found unfenced by the deep fuzz
    pass; fenced_decoder is the fix)."""
    from otel_arrow_collector_spark.operators.jpeg import (decode_jpeg,
                                                           encode_jpeg)
    from otel_arrow_collector_spark.operators.multimodal import (
        decode_bmp, decode_mp4_frames, decode_mp4_meta, decode_png,
        decode_wav, encode_bmp, encode_mp4_mjpeg, encode_png, encode_wav)
    rng = np.random.RandomState(29)
    px = (rng.randint(0, 4, (8, 8, 3)) * 60).astype(np.uint8).tobytes()
    jpg = encode_jpeg(px, 8, 8)
    mp4 = encode_mp4_mjpeg([jpg, jpg], 8, 8)
    for dec, valid in ((decode_jpeg, jpg),
                       (decode_bmp, encode_bmp(px, 8, 8)),
                       (decode_wav, encode_wav(list(range(-50, 50)))),
                       (decode_png, encode_png(px, 8, 8)),
                       (decode_mp4_meta, mp4),
                       (decode_mp4_frames, mp4)):
        assert _sweep(dec, valid, rng, rounds=150) >= 1
