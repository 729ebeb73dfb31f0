"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas``.

Two decode tiers:

- REAL decode for formats parseable with the standard library alone:
  BMP (24-bit uncompressed, BITMAPINFOHEADER) and WAV (PCM16 RIFF) are
  fully decoded — geometry, pixel/sample statistics — by the pure-Python
  parsers below (``decode_bmp`` / ``decode_wav``).  ``synthesize_media``
  renders genuine BMP/WAV payloads from document text so the corpus
  contains real media bytes to exercise them.
- STUB for formats that genuinely need codec libraries (PNG/JPEG/MP4):
  ``_fake_decode`` is a clearly-marked deterministic fake that RAISES on
  real compressed-media magic, keeping accidental production use loud.
  Swap in PIL/librosa/pyav there; the plan shape does not change.

Scale stance: mapInPandas streams Arrow batches — no row-at-a-time Python;
binary payloads never pass through a shuffle (decode is a map stage before
any wide op); feature outputs are small fixed-width columns.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _binary_docs(spark, sf_dir):
    """documents with an opaque binary payload column + typed metadata."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("lang").alias("meta_lang"),
    )


# ---------------------------------------------------------------------------
# metadata extraction (pure SQL -> oracle-checked)
# ---------------------------------------------------------------------------

def multimodal_binary_meta(spark, sf_dir):
    """Typed metadata over opaque payloads: byte length, 4-byte header
    ("magic"), content hash — the scan-side triage a media pipeline runs
    before committing to a decode."""
    b = _binary_docs(spark, sf_dir)
    return (b.select(
                "doc_id",
                F.length("payload").cast("long").alias("n_bytes"),
                F.substring(F.hex("payload"), 1, 8).alias("magic"),
                F.md5("payload").alias("content_hash"))
             .orderBy("doc_id").limit(200))


QUERIES["multimodal_binary_meta"] = multimodal_binary_meta
ORACLES["multimodal_binary_meta"] = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       substr(hex(encode(text)), 1, 8) AS magic,
       md5(text) AS content_hash
FROM documents ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# decode / feature-extract via mapInPandas (weak rows-only check: the decode
# itself is not SQL-expressible; the fake is deterministic so rows/schema
# are stable)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("mean_luma", IntegerType()),
    StructField("format", StringType()),
])


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decode.

    STUB: replace with e.g. PIL.Image.open / av.open in production.
    Raises NotImplementedError for payloads claiming a real media format,
    making accidental production use loud.
    """
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\x00\x00\x00\x18"):
        raise NotImplementedError(
            "real media decode requires PIL/librosa/pyav — not in this container")
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + n % 577,              # fake-but-deterministic geometry
        "height": 64 + (n * 7) % 421,
        "n_frames": 1 + n % 5,
        "mean_luma": sum(payload[:64]) % 256,
        "format": "fake/deterministic",
    }


def decode_features(df):
    """mapInPandas decode: Arrow-batched, payload-agnostic plumbing."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]
    return df.mapInPandas(run, DECODED_SCHEMA)


def multimodal_decode_stub(spark, sf_dir):
    """Decode+aggregate: fake features per payload, then a relational
    roll-up (the post-decode half is ordinary Spark)."""
    feats = decode_features(_binary_docs(spark, sf_dir))
    return (feats.groupBy("format")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("n_bytes").alias("total_bytes"),
                      F.avg("width").alias("avg_width"))
                 .orderBy("format"))


QUERIES["multimodal_decode_stub"] = multimodal_decode_stub
# no oracle: mapInPandas decode is not SQL-expressible -> rows-only check


# ---------------------------------------------------------------------------
# REAL media codecs (stdlib-only): BMP 24-bit + WAV PCM16
# ---------------------------------------------------------------------------

def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Render raw BGR triples (len >= 3*w*h, row-major bottom-up) as a
    well-formed 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER, 4-byte-padded rows)."""
    row_pad = (-3 * width) % 4
    rows = b""
    for y in range(height):
        start = y * 3 * width
        rows += pixels[start:start + 3 * width] + b"\x00" * row_pad
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    return header + info + rows


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP: geometry + integer mean luminance
    ((r+g+b)//3 per pixel, averaged — integer math, deterministic)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMP supported, got {bpp}")
    row_size = (3 * width + 3) // 4 * 4
    total = luma = 0
    for y in range(abs(height)):
        base = pix_off + y * row_size
        for x in range(width):
            b_, g, r = payload[base + 3 * x:base + 3 * x + 3]
            luma += (r + g + b_) // 3
            total += 1
    return {"format": "image/bmp", "width": width, "height": abs(height),
            "mean_luma": luma // max(1, total), "sample_rate": None,
            "n_samples": None, "duration_ms": None}


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Render mono PCM16 samples as a well-formed RIFF/WAVE file."""
    data = b"".join(struct.pack("<h", max(-32768, min(32767, s)))
                    for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> dict:
    """Parse RIFF/WAVE PCM16: sample rate, count, duration, mean |amp|."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, bits, data = 12, None, None, b""
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            _, _, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if bits != 16:
        raise NotImplementedError(f"only PCM16 WAV supported, got {bits}")
    n = len(data) // 2
    amps = struct.unpack(f"<{n}h", data[:2 * n]) if n else ()
    mean_amp = sum(abs(a) for a in amps) // max(1, n)
    return {"format": "audio/wav", "width": None, "height": None,
            "mean_luma": mean_amp, "sample_rate": rate, "n_samples": n,
            "duration_ms": n * 1000 // max(1, rate)}


MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
])

DECODED_MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_luma", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("duration_ms", IntegerType()),
])


def synthesize_media(df):
    """documents -> genuine media payloads: even doc_ids become 8x8 24-bit
    BMPs (pixels from the text bytes), odd doc_ids become PCM16 WAVs
    (samples from the text bytes).  Deterministic; real files."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "payload": [], "mime": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = text.encode("utf-8") or b"\x00"
                if doc_id % 2 == 0:
                    need = 3 * 8 * 8
                    pix = (seed * (need // len(seed) + 1))[:need]
                    payload, mime = encode_bmp(pix, 8, 8), "image/bmp"
                else:
                    samples = [(seed[i % len(seed)] - 128) * 256
                               for i in range(64)]
                    payload, mime = encode_wav(samples), "audio/wav"
                rows["doc_id"].append(doc_id)
                rows["payload"].append(payload)
                rows["mime"].append(mime)
            yield pd.DataFrame(rows)
    return df.select("doc_id", "text").mapInPandas(run, MEDIA_SCHEMA)


def decode_media(df):
    """mapInPandas REAL decode: BMP/WAV parsed by the stdlib codecs above;
    compressed formats (PNG/JPEG/MP4) raise NotImplementedError."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                b = bytes(p)
                if b[:2] == b"BM":
                    f_ = decode_bmp(b)
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    f_ = decode_wav(b)
                elif b[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0",
                               b"\x00\x00\x00\x18"):
                    raise NotImplementedError(
                        "PNG/JPEG/MP4 decode requires PIL/pyav — not in "
                        "this container")
                else:
                    raise ValueError(f"unknown media magic {b[:4]!r}")
                f_["n_bytes"] = len(b)
                feats.append(f_)
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in DECODED_MEDIA_SCHEMA.fields]]
    return df.mapInPandas(run, DECODED_MEDIA_SCHEMA)


def multimodal_decode_real(spark, sf_dir):
    """End-to-end REAL media path: synthesize genuine BMP/WAV files from
    the corpus, decode them with the stdlib codecs, aggregate per format.
    (rows-only check: binary parse is not SQL-expressible)."""
    docs = load_table(spark, sf_dir, "documents").limit(400)
    feats = decode_media(synthesize_media(docs))
    return (feats.groupBy("format")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("n_bytes").cast("long").alias("total_bytes"),
                      F.avg("mean_luma").alias("avg_signal"))
                 .orderBy("format"))


QUERIES["multimodal_decode_real"] = multimodal_decode_real
# no oracle: binary media parsing is not SQL-expressible -> rows-only check


# ---------------------------------------------------------------------------
# resize / frame-sample plumbing (STUB compute, real Spark shape)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumbnail", BinaryType()),
])


def resize_images(df, width: int = 32, height: int = 32):
    """mapInPandas resize: one thumbnail per payload.

    STUB: the 'resize' is a deterministic byte fold to width*height bytes
    (replace with PIL ``Image.resize`` in production — the plan shape,
    schema and Arrow batching are what this exercises).  1:1 row mapping,
    bounded output size: thumbnails are fixed-width columns, so the
    downstream shuffle carries W*H bytes per row regardless of source
    payload size — the property that makes resize-before-shuffle the
    correct plan order at scale.
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                b = bytes(p)
                # deterministic fold of the payload onto n_out bytes
                acc = bytearray(n_out)
                for i, by in enumerate(b):
                    acc[i % n_out] = (acc[i % n_out] + by) % 256
                thumbs.append(bytes(acc))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "width": width, "height": height,
                "thumbnail": thumbs})
    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def sample_frames(df, every_n: int = 2):
    """mapInPandas frame sampling: payload -> one row per sampled frame
    (row-expanding, the flatMap shape).

    STUB: 'frames' are equal slices of the payload, count from the fake
    decoder's ``n_frames``; replace the slicer with pyav keyframe
    extraction in production.  Output rows = ceil(n_frames / every_n) per
    input — the schema and expansion plumbing are real and tested.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = _fake_decode(b)["n_frames"]
                size = max(1, len(b) // n_frames)
                for idx in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(b[idx * size:(idx + 1) * size])
            yield pd.DataFrame(out)
    return df.mapInPandas(run, FRAME_SCHEMA)
