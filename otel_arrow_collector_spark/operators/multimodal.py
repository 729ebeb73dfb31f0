"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas``.

Two decode tiers:

- REAL decode for formats parseable with the standard library alone:
  BMP (24-bit uncompressed, BITMAPINFOHEADER), WAV (PCM16 RIFF) and PNG
  (8- AND 16-bit gray/RGB/RGBA, non-interlaced AND Adam7-interlaced —
  zlib inflate + full 5-filter unfilter incl. Paeth, per-pass for Adam7)
  are fully decoded — geometry, pixel/sample statistics, and raw pixels
  for the resize path — by the pure-Python parsers below (``decode_bmp``
  / ``decode_wav`` / ``decode_png``).  ``synthesize_media`` renders
  genuine BMP/WAV/PNG payloads from document text so the corpus contains
  real media bytes to exercise them, and ``resize_images`` does a true
  nearest-neighbor downsample over the decoded pixels.
- REAL decode also for baseline AND progressive JPEG: the
  dependency-free codec in ``jpeg.py`` (Huffman + dequantize + IDCT,
  4:4:4/4:2:2/4:2:0, restart markers, SOF2 spectral-selection +
  successive-approximation scans) feeds the same stats/resize paths.
- REAL structural parse for MP4 containers: ``decode_mp4_meta`` walks
  the ISO BMFF box tree for duration (mvhd) and geometry (tkhd) — the
  corpus-triage metadata — oracle-gated via ``multimodal_mp4_meta``.
- REAL VIDEO FRAME decode for Motion-JPEG MP4s: ``encode_mp4_mjpeg`` /
  ``decode_mp4_frames`` mux/demux through genuine stbl sample tables
  (stsd/stts/stsc/stsz/stco), each sample a complete baseline JPEG
  decoded by ``jpeg.py`` — oracle-gated end to end via
  ``multimodal_video_frames`` (solid-gray frames at quality 76 survive
  DCT→quantize→IDCT bit-exactly, so decoded luma has a closed form).
- STUB only where a codec library is genuinely required (compressed
  video codecs — avc1/hev1 — in MP4, hierarchical/arithmetic JPEG):
  the decoders RAISE loudly (NotImplementedError),
  keeping accidental production use visible.  Swap in PIL/librosa/pyav
  there; the plan shape does not change.

Scale stance: mapInPandas streams Arrow batches — no row-at-a-time Python;
binary payloads never pass through a shuffle (decode is a map stage before
any wide op); feature outputs are small fixed-width columns.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..sources.tables import load_table, parallel_table
from .jpeg import fenced_decoder

QUERIES: dict = {}
ORACLES: dict = {}


def _binary_docs(spark, sf_dir):
    """documents with an opaque binary payload column + typed metadata."""
    d = load_table(spark, sf_dir, "documents")
    # coalesce BEFORE encode: a NULL text must become an empty payload
    # (matching the oracles' coalesce(text,'')), not a NULL binary that
    # NULLs n_bytes/magic and crashes downstream decodes.
    return d.select(
        "doc_id",
        F.encode(F.coalesce("text", F.lit("")), "UTF-8").alias("payload"),
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
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       substr(hex(encode(coalesce(text, ''))), 1, 8) AS magic,
       md5(coalesce(text, '')) AS content_hash
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
            feats = [_fake_decode(bytes(p) if p is not None else b"")
                     for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]
    return df.mapInPandas(run, DECODED_SCHEMA)


def multimodal_decode_stub(spark, sf_dir):
    """Per-doc fake-decode features.  The stub decode is a DETERMINISTIC
    pure function of the payload bytes (geometry from n_bytes, luma from
    the first 64 bytes), so the whole mapInPandas path is oracle-gated:
    the DuckDB twin recomputes every stat from ``text`` with hex-digit
    byte extraction — no weak rows-only check needed."""
    feats = decode_features(_binary_docs(spark, sf_dir))
    return (feats.select(
                "doc_id",
                F.col("n_bytes").cast("long").alias("n_bytes"),
                F.col("width").cast("long").alias("width"),
                F.col("height").cast("long").alias("height"),
                F.col("n_frames").cast("long").alias("n_frames"),
                F.col("mean_luma").cast("long").alias("mean_luma"),
                "format")
             .orderBy("doc_id").limit(200))


QUERIES["multimodal_decode_stub"] = multimodal_decode_stub
# DuckDB twin of _fake_decode: byte values recovered from hex() pairs via
# strpos on the hex alphabet (payload == encode(coalesce(text, '')) here)
ORACLES["multimodal_decode_stub"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS n
  FROM documents ORDER BY doc_id LIMIT 200
),
b AS (
  SELECT d.doc_id,
         (strpos('0123456789ABCDEF', substr(d.hx, g.i*2+1, 1))-1)*16
       + (strpos('0123456789ABCDEF', substr(d.hx, g.i*2+2, 1))-1) AS bv
  FROM docs d, generate_series(0, 63) AS g(i)
  WHERE g.i < d.n
),
luma AS (SELECT doc_id, SUM(bv) % 256 AS mean_luma FROM b GROUP BY doc_id)
SELECT d.doc_id,
       CAST(d.n AS BIGINT)                AS n_bytes,
       CAST(64 + d.n % 577 AS BIGINT)     AS width,
       CAST(64 + (d.n * 7) % 421 AS BIGINT) AS height,
       CAST(1 + d.n % 5 AS BIGINT)        AS n_frames,
       CAST(COALESCE(l.mean_luma, 0) AS BIGINT) AS mean_luma,
       'fake/deterministic'               AS format
FROM docs d LEFT JOIN luma l USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# REAL media codecs (stdlib-only): BMP 24-bit + WAV PCM16
# ---------------------------------------------------------------------------

def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Render raw BGR triples (len == 3*w*h, row-major bottom-up) as a
    well-formed 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER, 4-byte-padded rows)."""
    if len(pixels) != 3 * width * height:
        # a short buffer would yield rows shorter than the declared
        # geometry — bytes the reader mis-walks, not a valid BMP
        raise ValueError(f"pixel buffer is {len(pixels)} bytes, geometry "
                         f"{width}x{height} needs {3 * width * height}")
    row_pad = (-3 * width) % 4
    rows = b""
    for y in range(height):
        start = y * 3 * width
        rows += pixels[start:start + 3 * width] + b"\x00" * row_pad
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    return header + info + rows


def _bmp_raster(payload: bytes):
    """BI_RGB BMP raster at 8 (palette), 24, or 32 bpp -> (width,
    signed_height, (h, w, 3) BGR uint8 array in STORED row order).

    8-bit rows index the BGRA color table that follows the info header
    (biClrUsed entries, 0 meaning the full 256); 32-bit rows are BGRA
    with the alpha byte dropped.  Compressed rasters (BI_RLE8/RLE4/
    BITFIELDS...) and other depths stay loud NotImplementedErrors."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height, _, bpp = struct.unpack_from(
        "<IiiHH", payload, 14)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"only BI_RGB (uncompressed) BMP supported, "
            f"got compression {compression}")
    h = abs(height)
    if bpp == 24:
        row_size = (3 * width + 3) // 4 * 4
        arr = np.frombuffer(payload, np.uint8, count=h * row_size,
                            offset=pix_off)
        px = arr.reshape(h, row_size)[:, :3 * width].reshape(h, width, 3)
    elif bpp == 32:
        arr = np.frombuffer(payload, np.uint8, count=h * 4 * width,
                            offset=pix_off)
        px = arr.reshape(h, width, 4)[:, :, :3]
    elif bpp == 8:
        clr_used = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = (np.frombuffer(payload, np.uint8, count=4 * clr_used,
                             offset=14 + hdr_size)
               .reshape(clr_used, 4)[:, :3])
        row_size = (width + 3) // 4 * 4
        idx = (np.frombuffer(payload, np.uint8, count=h * row_size,
                             offset=pix_off)
               .reshape(h, row_size)[:, :width])
        px = pal[idx]
    else:
        raise NotImplementedError(
            f"only 8/24/32-bit BI_RGB BMP supported, got {bpp}")
    return width, height, px


@fenced_decoder
def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed BMP (8-bit palette / 24-bit / 32-bit):
    geometry + integer mean luminance ((r+g+b)//3 per pixel, averaged —
    integer math, deterministic, channel-order invariant)."""
    width, height, px = _bmp_raster(payload)
    h = abs(height)
    px = px.astype(np.int64)
    luma = int((px.sum(axis=2) // 3).sum())
    total = h * width
    return {"format": "image/bmp", "width": width, "height": h,
            "mean_luma": luma // max(1, total), "sample_rate": None,
            "n_samples": None, "duration_ms": None}


def _bmp_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Uncompressed BMP -> (width, height, top-down row-major RGB bytes).

    BMP rows are stored bottom-up when height is positive; this flips
    them so downstream consumers (resize) see conventional image order.
    """
    width, height, px = _bmp_raster(payload)
    if height > 0:              # bottom-up storage -> flip to top-down
        px = px[::-1]
    return width, abs(height), \
        np.ascontiguousarray(px[..., ::-1]).tobytes()   # BGR->RGB


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Render mono PCM16 samples as a well-formed RIFF/WAVE file."""
    data = b"".join(struct.pack("<h", max(-32768, min(32767, s)))
                    for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


@fenced_decoder
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
    amps = np.frombuffer(data, "<i2", count=n).astype(np.int64)
    mean_amp = int(np.abs(amps).sum()) // max(1, n)
    return {"format": "audio/wav", "width": None, "height": None,
            "mean_luma": mean_amp, "sample_rate": rate, "n_samples": n,
            "duration_ms": n * 1000 // max(1, rate)}


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF box-structure parse — metadata without frame decode)
# ---------------------------------------------------------------------------

def encode_mp4_skeleton(width: int, height: int, duration_ms: int,
                        timescale: int = 1000) -> bytes:
    """Render a minimal well-formed ISO BMFF box tree (ftyp + moov with
    mvhd and one video trak/tkhd) — the header a real camera MP4 carries,
    without media data.  For exercising the metadata parser."""
    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    dur = duration_ms * timescale // 1000
    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)
               + b"\x00" * 80)
    tkhd = box(b"tkhd", struct.pack(">B3xIII4xI", 0, 0, 0, 1, dur)
               + b"\x00" * 52
               + struct.pack(">II", width << 16, height << 16))
    trak = box(b"trak", tkhd)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov


@fenced_decoder
def decode_mp4_meta(payload: bytes) -> dict:
    """Parse the ISO BMFF box tree for container METADATA: duration from
    mvhd (timescale-corrected), width/height from the first video tkhd.

    This is real structural decode of the MP4 container — what a
    corpus-triage pass needs (geometry, duration, track presence) —
    while FRAME decode (H.264 etc.) stays a loud stub behind pyav.
    """
    if payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            ln, typ = struct.unpack_from(">I4s", buf, pos)
            if ln < 8:
                break
            yield typ, pos + 8, min(pos + ln, end)
            pos += ln

    duration_ms = width = height = None
    def visit(start, end):
        nonlocal duration_ms, width, height
        for typ, b0, b1 in walk(payload, start, end):
            if typ in (b"moov", b"trak"):
                visit(b0, b1)
            elif typ == b"mvhd":
                ver = payload[b0]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, b0 + 20)
                else:
                    _, _, ts, dur = struct.unpack_from(
                        ">II II", payload, b0 + 4)
                if ts:
                    duration_ms = dur * 1000 // ts
            elif typ == b"tkhd" and width is None:
                ver = payload[b0]
                woff = b1 - b0 - 8        # width/height are the LAST 8 bytes
                w16, h16 = struct.unpack_from(">II", payload, b0 + woff)
                if w16 and h16:
                    width, height = w16 >> 16, h16 >> 16
    visit(0, len(payload))
    if duration_ms is None:
        raise ValueError("MP4 missing mvhd")
    return {"format": "video/mp4", "width": width, "height": height,
            "mean_luma": None, "sample_rate": None, "n_samples": None,
            "duration_ms": duration_ms}


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + typ + body


def encode_mp4_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10, timescale: int = 1000,
                     frames_per_chunk: int | None = None) -> bytes:
    """Render a well-formed ISO BMFF file carrying a Motion-JPEG video
    track: each sample is one complete baseline JPEG (``jpeg.encode_jpeg``
    output), indexed by real stbl sample tables (stsd 'jpeg' visual
    sample entry, stts timing run, stsc chunk map, stsz sizes, stco
    offset) — the layout a QuickTime/ISO MJPEG recorder writes.  All
    frames live in one mdat chunk placed before moov so stco is exact.
    """
    n = len(frames)
    if n == 0:
        raise ValueError("MJPEG track needs at least one frame")
    fpc = frames_per_chunk or n
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    data_off = len(ftyp) + 8                 # first frame byte in the file
    delta = timescale // fps
    dur = n * delta

    chunks = [frames[i:i + fpc] for i in range(0, n, fpc)]
    offs, runs, off = [], [], data_off
    for ci, ch in enumerate(chunks):
        offs.append(off)
        off += sum(len(f) for f in ch)
        if not runs or runs[-1][1] != len(ch):
            runs.append((ci + 1, len(ch)))

    entry = (b"\x00" * 6 + struct.pack(">H", 1)      # data_ref_index
             + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + b"\x00" * 4
             + struct.pack(">H", 1)                  # frame_count
             + b"\x05mjpeg" + b"\x00" * 26           # compressorname
             + struct.pack(">Hh", 24, -1))           # depth, pre_defined
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + _box(b"jpeg", entry))
    stts = _box(b"stts", struct.pack(">IIII", 0, 1, n, delta))
    stsc = _box(b"stsc", struct.pack(">II", 0, len(runs))
                + b"".join(struct.pack(">III", first, spc, 1)
                           for first, spc in runs))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, n)
                + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _box(b"stco", struct.pack(">II", 0, len(offs))
                + b"".join(struct.pack(">I", o) for o in offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _box(b"vmhd", struct.pack(">I4H", 1, 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + stbl)
    mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale,
                                     dur, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">I4x4s12x", 0, b"vide") + b"\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">B3xIII4xI", 0, 0, 0, 1, dur)
                + b"\x00" * 52
                + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)
                + b"\x00" * 80)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


@fenced_decoder
def decode_mp4_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Extract the video samples of an MP4 via its REAL sample tables:
    stsd codec gate (Motion-JPEG decodes via ``jpeg.decode_jpeg``; any
    compressed codec — avc1/hev1/mp4v — raises loudly for pyav), stsc
    run-length chunk map, stsz sizes, stco/co64 chunk offsets.

    Returns (width, height, [sample bytes]) for the first video track —
    each sample a complete baseline JPEG ready for ``decode_jpeg``.
    Reference analogue: the sample-table walk every demuxer performs
    (ISO/IEC 14496-12 §8.5-8.7).
    """
    if payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")

    def children(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            ln, typ = struct.unpack_from(">I4s", payload, pos)
            if ln < 8:
                break
            yield typ, pos + 8, min(pos + ln, end)
            pos += ln

    def find(path: list[bytes], start: int, end: int):
        for typ, b0, b1 in children(start, end):
            if typ == path[0]:
                if len(path) == 1:
                    return b0, b1
                got = find(path[1:], b0, b1)
                if got:
                    return got
        return None

    stbl = find([b"moov", b"trak", b"mdia", b"minf", b"stbl"],
                0, len(payload))
    if stbl is None:
        raise ValueError("MP4 missing sample tables (moov..stbl)")
    boxes = {typ: (b0, b1) for typ, b0, b1 in children(*stbl)}

    b0, _ = boxes[b"stsd"]
    fourcc = payload[b0 + 12:b0 + 16]
    if fourcc not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"MP4 codec {fourcc!r} needs pyav — only Motion-JPEG decodes "
            "dependency-free")
    # entry body = stsd body + 8 (version/flags + count) + 8 (entry
    # header); width/height sit 24 bytes in (6+2 dref, 16 pre_defined)
    w, h = struct.unpack_from(">HH", payload, b0 + 8 + 8 + 24)

    b0, _ = boxes[b"stsz"]
    uniform, count = struct.unpack_from(">II", payload, b0 + 4)
    sizes = ([uniform] * count if uniform else
             list(struct.unpack_from(f">{count}I", payload, b0 + 12)))

    if b"stco" in boxes:
        b0, _ = boxes[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", payload, b0 + 4)
        offsets = struct.unpack_from(f">{n_chunks}I", payload, b0 + 8)
    else:
        b0, _ = boxes[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", payload, b0 + 4)
        offsets = struct.unpack_from(f">{n_chunks}Q", payload, b0 + 8)

    b0, _ = boxes[b"stsc"]
    (n_runs,) = struct.unpack_from(">I", payload, b0 + 4)
    runs = [struct.unpack_from(">III", payload, b0 + 8 + 12 * i)
            for i in range(n_runs)]

    frames: list[bytes] = []
    si = 0
    for ri, (first, spc, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        for chunk in range(first, last + 1):
            off = offsets[chunk - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                frames.append(payload[off:off + sizes[si]])
                off += sizes[si]
                si += 1
    if si != len(sizes):
        raise ValueError("MP4 sample tables inconsistent (stsc vs stsz)")
    return w, h, frames


# ---------------------------------------------------------------------------
# PNG (stdlib-only: zlib inflate + per-scanline unfilter)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int, *,
               interlace: bool = False, depth: int = 8) -> bytes:
    """Render raw RGB triples (top-down row-major, len >= 3*w*h) as a
    well-formed 8- or 16-bit truecolor PNG (filter 0 scanlines, one zlib
    IDAT), optionally Adam7-interlaced.

    16-bit widens each 8-bit channel to v<<8|v (so the decoder's
    high-byte reduction round-trips exactly); Adam7 splits the image into
    the seven standard passes (RFC 2083 §2.6), each pass its own run of
    filter-0 scanlines in the single IDAT stream.
    """
    import zlib
    px = np.frombuffer(pixels[:3 * width * height], np.uint8)
    arr = px.reshape(height, width, 3)
    if depth == 16:
        arr = np.repeat(arr.reshape(height, width * 3), 2, axis=1) \
                .reshape(height, width, 6)
    elif depth != 8:
        raise ValueError(f"encode_png: depth must be 8 or 16, got {depth}")
    if not interlace:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue          # empty passes emit nothing (RFC 2083 §2.6)
            parts.extend(b"\x00" + sub[y].tobytes()
                         for y in range(sub.shape[0]))
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 2, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (RFC 2083 §2.6)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _unfilter_block(lines: np.ndarray, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering over one (sub-)image block.

    ``lines`` is (rows, 1 + stride) uint8 — filter byte + filtered bytes
    per scanline; ``bpp`` is the filter unit in BYTES per pixel (channel
    count × bytes per channel, RFC 2083 §6.2 — filters always operate on
    bytes regardless of bit depth).  Vectorized where the recurrence
    allows: Up is elementwise, Sub is a per-byte-lane prefix sum mod 256;
    Average is sequential in the left neighbor (per-pixel vector steps);
    Paeth stays a per-row scalar loop (data-dependent predictor).
    """
    rows, stride = lines.shape[0], lines.shape[1] - 1
    img = np.empty((rows, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(rows):
        ft = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int64)
        if ft == 0:                                    # None
            line = cur
        elif ft == 1:                                  # Sub: prefix sum
            line = cur.reshape(-1, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif ft == 2:                                  # Up
            line = (cur + prev) & 0xFF
        elif ft == 3:                                  # Average
            line = np.empty(stride, np.int64)
            left = np.zeros(bpp, np.int64)
            for i in range(0, stride, bpp):
                left = (cur[i:i + bpp]
                        + (left + prev[i:i + bpp]) // 2) & 0xFF
                line[i:i + bpp] = left
        elif ft == 4:                                  # Paeth
            lst, pv = cur.tolist(), prev.tolist()
            for i in range(stride):
                left = lst[i - bpp] if i >= bpp else 0
                ul = pv[i - bpp] if i >= bpp else 0
                lst[i] = (lst[i] + _paeth(left, pv[i], ul)) & 0xFF
            line = np.asarray(lst, np.int64)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        img[y] = prev = line
    return img.astype(np.uint8)


def _packed_indices(rows: np.ndarray, depth: int, pw: int) -> np.ndarray:
    """Unpack bit-packed palette indices: ``rows`` is (ph, stride) uint8
    unfiltered scanline bytes holding ``pw`` big-endian ``depth``-bit
    samples per row (RFC 2083 §2.3 packing, no padding between pixels,
    rows padded to a byte boundary).  Returns (ph, pw) uint8 indices."""
    if depth == 8:
        return rows[:, :pw]
    bits = np.unpackbits(rows.astype(np.uint8), axis=1)
    grouped = bits[:, :bits.shape[1] // depth * depth] \
        .reshape(rows.shape[0], -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (grouped * weights).sum(axis=2).astype(np.uint8)[:, :pw]


def _png_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8/16-bit gray/RGB/RGBA, 1/2/4/8-bit palette, or
    1/2/4-bit grayscale PNG —
    non-interlaced or Adam7-interlaced — to (width, height, top-down
    row-major RGB bytes): chunk walk, zlib inflate, the full 5-way
    scanline unfilter (None/Sub/Up/Average/Paeth) per (sub-)image,
    Adam7 pixel scatter, PLTE lookup for indexed color.

    16-bit channels reduce to 8 by taking the high byte (the standard
    presentation downsample); gray expands to RGB, RGBA drops alpha.
    Sub-byte grayscale (1/2/4-bit, color type 0) scales indices to
    0..255 via the standard v*255/(2^d-1) expansion.
    """
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, b"", None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if color not in (0, 2, 3, 6):
        raise NotImplementedError(
            f"PNG color type {color} not supported (gray/RGB/RGBA/palette)")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    packed = color == 3 or (color == 0 and depth < 8)
    if packed:                        # indexed color or sub-byte gray
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"bad packed PNG bit depth {depth}")
        if color == 3 and (plte is None or len(plte) % 3 or not plte):
            raise ValueError("palette PNG missing/odd PLTE chunk")
        bpp = 1                       # filters operate on whole bytes
        def stride_of(pw: int) -> int:
            return (depth * pw + 7) // 8
    else:
        if depth not in (8, 16):
            raise NotImplementedError(
                f"only 8/16-bit PNG supported, got {depth}")
        nch = {0: 1, 2: 3, 6: 4}[color]
        bpp = nch * (depth // 8)             # filter unit, bytes per pixel
        def stride_of(pw: int) -> int:
            return bpp * pw
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)

    idx = None
    if interlace == 0:
        stride = stride_of(w)
        if len(raw) < h * (1 + stride):
            raise ValueError("PNG pixel data truncated")
        img = _unfilter_block(raw[:h * (1 + stride)].reshape(h, 1 + stride),
                              bpp)
        if packed:
            idx = _packed_indices(img, depth, w)
    else:                                    # Adam7: 7 sub-images
        if packed:
            idx = np.zeros((h, w), np.uint8)
        else:
            img = np.zeros((h, w, bpp), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = stride_of(pw)
            need = ph * (1 + stride)
            if len(raw) < off + need:
                raise ValueError("PNG pixel data truncated (Adam7 pass)")
            block = _unfilter_block(
                raw[off:off + need].reshape(ph, 1 + stride), bpp)
            off += need
            if packed:
                idx[y0::dy, x0::dx] = _packed_indices(block, depth, pw)
            else:
                img[y0::dy, x0::dx] = block.reshape(ph, pw, bpp)
        if not packed:
            img = img.reshape(h, bpp * w)

    if packed:
        if color == 0:                # sub-byte gray: scale to 0..255
            gray = (idx.astype(np.uint16) * 255
                    // ((1 << depth) - 1)).astype(np.uint8)
            return w, h, np.repeat(gray.reshape(-1), 3).tobytes()
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        return w, h, pal[idx.reshape(-1)].reshape(-1).tobytes()

    px = img.reshape(-1, nch, depth // 8)
    flat = np.ascontiguousarray(px[:, :, 0]).reshape(-1)  # 16-bit: high byte
    if nch == 1:                                       # gray -> RGB
        flat = np.repeat(flat, 3)
    elif nch == 4:                                     # RGBA -> drop alpha
        flat = np.ascontiguousarray(flat.reshape(-1, 4)[:, :3]).reshape(-1)
    return w, h, flat.tobytes()


@fenced_decoder
def decode_png(payload: bytes) -> dict:
    """Parse a PNG via ``_png_pixels``: geometry + integer mean luminance
    ((r+g+b)//3 per pixel, averaged — same stat as ``decode_bmp``)."""
    w, h, rgb = _png_pixels(payload)
    n = w * h
    px = np.frombuffer(rgb, np.uint8).reshape(n, 3).astype(np.int64)
    luma = int((px.sum(axis=1) // 3).sum())
    return {"format": "image/png", "width": w, "height": h,
            "mean_luma": luma // max(1, n), "sample_rate": None,
            "n_samples": None, "duration_ms": None}


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
    """documents -> genuine media payloads, cycling by doc_id % 3:
    0 -> 8x8 24-bit BMP (pixels from the text bytes), 1 -> PCM16 WAV
    (samples from the text bytes), 2 -> 8x8 truecolor PNG (zlib IDAT).
    Deterministic; real files."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "payload": [], "mime": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                kind = doc_id % 3
                if kind == 0:
                    need = 3 * 8 * 8
                    pix = (seed * (need // len(seed) + 1))[:need]
                    payload, mime = encode_bmp(pix, 8, 8), "image/bmp"
                elif kind == 1:
                    samples = [(seed[i % len(seed)] - 128) * 256
                               for i in range(64)]
                    payload, mime = encode_wav(samples), "audio/wav"
                else:
                    need = 3 * 8 * 8
                    pix = (seed * (need // len(seed) + 1))[:need]
                    payload, mime = encode_png(pix, 8, 8), "image/png"
                rows["doc_id"].append(doc_id)
                rows["payload"].append(payload)
                rows["mime"].append(mime)
            yield pd.DataFrame(rows)
    return df.select("doc_id", "text").mapInPandas(run, MEDIA_SCHEMA)


def decode_jpeg_stats(payload: bytes) -> dict:
    """Parse a baseline JPEG via ``jpeg.decode_jpeg``: geometry + integer
    mean luminance — same stat as ``decode_bmp``/``decode_png``."""
    from .jpeg import decode_jpeg as _dj
    w, h, rgb = _dj(payload)
    n = w * h
    px = np.frombuffer(rgb, np.uint8).reshape(n, 3).astype(np.int64)
    luma = int((px.sum(axis=1) // 3).sum())
    return {"format": "image/jpeg", "width": w, "height": h,
            "mean_luma": luma // max(1, n), "sample_rate": None,
            "n_samples": None, "duration_ms": None}


def decode_gif_stats(payload: bytes) -> dict:
    """Parse a GIF via ``gif.decode_gif``: geometry + integer mean
    luminance — same stat contract as ``decode_bmp``/``decode_png``."""
    from .gif import decode_gif as _dg
    w, h, rgb = _dg(payload)
    n = w * h
    px = np.frombuffer(rgb, np.uint8).reshape(n, 3).astype(np.int64)
    luma = int((px.sum(axis=1) // 3).sum())
    return {"format": "image/gif", "width": w, "height": h,
            "mean_luma": luma // max(1, n), "sample_rate": None,
            "n_samples": None, "duration_ms": None}


def decode_media(df):
    """mapInPandas REAL decode: BMP/WAV/PNG/JPEG parsed by the
    dependency-free codecs (``jpeg.py`` carries the baseline JPEG
    decoder); MP4 yields container metadata (box-tree parse — geometry +
    duration) while its FRAME decode still needs pyav."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                b = bytes(p)
                if b[:2] == b"BM":
                    f_ = decode_bmp(b)
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    f_ = decode_wav(b)
                elif b[:8] == _PNG_SIG:
                    f_ = decode_png(b)
                elif b[:3] == b"\xff\xd8\xff":
                    f_ = decode_jpeg_stats(b)
                elif b[:4] == b"GIF8":
                    f_ = decode_gif_stats(b)
                elif b[4:8] == b"ftyp":
                    # container metadata is a real structural parse;
                    # FRAME decode still needs pyav and stays a stub
                    f_ = decode_mp4_meta(b)
                else:
                    raise ValueError(f"unknown media magic {b[:4]!r}")
                f_["n_bytes"] = len(b)
                feats.append(f_)
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in DECODED_MEDIA_SCHEMA.fields]]
    return df.mapInPandas(run, DECODED_MEDIA_SCHEMA)


def multimodal_decode_real(spark, sf_dir):
    """End-to-end REAL media path, per-doc and fully oracle-gated:
    synthesize genuine BMP/WAV/PNG payloads from the corpus, decode them
    with the stdlib codecs, emit per-doc geometry + signal stats.

    Because ``synthesize_media`` derives every payload deterministically
    from ``text`` (pixels/samples are seed-cycled utf-8 bytes), the
    decoded stats are pure functions of the text: the DuckDB twin
    recomputes them with hex-digit byte extraction — the full
    encode->binary->decode round trip is value-checked, not just
    rows-counted.  (n_bytes is intentionally omitted: the PNG size goes
    through zlib and is not SQL-expressible; it's covered by the codec
    round-trip tests instead.)"""
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(400)
    feats = decode_media(synthesize_media(docs))
    return feats.select(
        "doc_id", "format",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.col("mean_luma").cast("long").alias("mean_signal"))


QUERIES["multimodal_decode_real"] = multimodal_decode_real
# DuckDB twin of synthesize->decode: BMP/PNG luma = mean of per-pixel
# (b0+b1+b2)//3 over 192 seed-cycled bytes; WAV amp = mean |(b-128)*256|
# over 64 samples (decode_bmp/decode_png/decode_wav above)
ORACLES["multimodal_decode_real"] = """
WITH docs AS (
  SELECT doc_id, doc_id % 3 AS kind, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 400
),
b AS (  -- seed-cycled byte stream: hex() pairs -> integer byte values
  SELECT d.doc_id, d.kind, g.i, g.i // 3 AS px,
         (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+1, 1))-1)*16
       + (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+2, 1))-1) AS bv
  FROM docs d, generate_series(0, 191) AS g(i)
  WHERE g.i < CASE WHEN d.kind = 1 THEN 64 ELSE 192 END
),
px AS (  -- per-pixel integer luma for the two image kinds
  SELECT doc_id, px, SUM(bv) // 3 AS luma
  FROM b WHERE kind <> 1 GROUP BY doc_id, px
),
sig AS (
  SELECT doc_id, SUM(luma) // 64 AS s FROM px GROUP BY doc_id
  UNION ALL
  SELECT doc_id, SUM(ABS((bv - 128) * 256)) // 64 FROM b
  WHERE kind = 1 GROUP BY doc_id
)
SELECT d.doc_id,
  CASE d.kind WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
              ELSE 'image/png' END                    AS format,
  CAST(CASE WHEN d.kind <> 1 THEN 8 END AS BIGINT)    AS width,
  CAST(CASE WHEN d.kind <> 1 THEN 8 END AS BIGINT)    AS height,
  CAST(CASE WHEN d.kind = 1 THEN 8000 END AS BIGINT)  AS sample_rate,
  CAST(CASE WHEN d.kind = 1 THEN 64 END AS BIGINT)    AS n_samples,
  CAST(CASE WHEN d.kind = 1 THEN 8 END AS BIGINT)     AS duration_ms,
  CAST(s.s AS BIGINT)                                 AS mean_signal
FROM docs d JOIN sig s USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# resize / frame-sample plumbing (STUB compute, real Spark shape)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumbnail", BinaryType()),
])


def _image_pixels(b: bytes) -> tuple[int, int, bytes]:
    """Route an image payload to its dependency-free pixel decoder
    (BMP, PNG, or baseline JPEG)."""
    if b[:2] == b"BM":
        return _bmp_pixels(b)
    if b[:8] == _PNG_SIG:
        return _png_pixels(b)
    if b[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg as _dj
        return _dj(b)
    if b[:4] == b"GIF8":
        from .gif import decode_gif as _dg
        return _dg(b)
    if b[4:8] == b"ftyp":
        raise NotImplementedError(
            "MP4 decode requires pyav — not in this container")
    raise ValueError(f"unknown image magic {b[:4]!r}")


def resize_images(df, width: int = 32, height: int = 32):
    """mapInPandas resize: one RGB thumbnail per image payload — a REAL
    nearest-neighbor downsample over the decoded pixels (BMP/PNG via the
    stdlib codecs; source pixel (x*sw//w, y*sh//h) per output pixel).

    1:1 row mapping, bounded output size: thumbnails are fixed-width
    columns (3*W*H bytes), so the downstream shuffle carries the same
    bytes per row regardless of source payload size — the property that
    makes resize-before-shuffle the correct plan order at scale.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                sw, sh, rgb = _image_pixels(bytes(p))
                a = np.frombuffer(rgb, np.uint8).reshape(sh, sw, 3)
                ys = np.arange(height) * sh // height
                xs = np.arange(width) * sw // width
                thumbs.append(a[ys][:, xs].tobytes())
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

    REAL path for MP4 payloads: samples come out of the actual stbl walk
    (``decode_mp4_frames``), so every emitted frame is a complete
    baseline JPEG — an MJPEG corpus needs no codec library at all.
    Non-MP4 payloads keep the deterministic stub slicing (swap in pyav
    keyframe extraction for compressed codecs); either way output rows =
    ceil(n_frames / every_n) per input.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if b[4:8] == b"ftyp":
                    _, _, frames = decode_mp4_frames(b)
                    for idx in range(0, len(frames), every_n):
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(idx)
                        out["frame"].append(frames[idx])
                    continue
                n_frames = _fake_decode(b)["n_frames"]
                size = max(1, len(b) // n_frames)
                for idx in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(b[idx * size:(idx + 1) * size])
            yield pd.DataFrame(out)
    return df.mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# oracle-gated MP4 metadata loop
# ---------------------------------------------------------------------------

MP4_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])


def multimodal_mp4_meta(spark, sf_dir):
    """Oracle-gated MP4 container-metadata loop: per doc, render a real
    ISO BMFF skeleton whose geometry/duration are closed-form functions
    of (doc_id, n_chars), then parse it back with ``decode_mp4_meta``.
    The DuckDB twin recomputes the closed forms directly, so the full
    encode->box-walk->decode round trip is value-checked (same pattern
    as the BMP/WAV/PNG decode queries).

    Scale: pure narrow mapInPandas (payloads never shuffle), bounded
    output via the deterministic doc_id order + limit.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in MP4_META_SCHEMA.fields}
            for doc_id, n in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 16 + int(doc_id) % 16
                h = 9 + int(doc_id) % 9
                meta = decode_mp4_meta(
                    encode_mp4_skeleton(w, h, int(n) * 10))
                rows["doc_id"].append(int(doc_id))
                rows["format"].append(meta["format"])
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["duration_ms"].append(meta["duration_ms"])
            yield pd.DataFrame(rows)
    return (d.mapInPandas(run, MP4_META_SCHEMA)
             .orderBy("doc_id").limit(200))


QUERIES["multimodal_mp4_meta"] = multimodal_mp4_meta
ORACLES["multimodal_mp4_meta"] = """
SELECT doc_id, 'video/mp4' AS format,
       CAST(16 + doc_id % 16 AS INT) AS width,
       CAST(9 + doc_id % 9 AS INT) AS height,
       CAST(n_chars * 10 AS BIGINT) AS duration_ms
FROM documents ORDER BY doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# oracle-gated MJPEG video-frame loop (encode -> sample-table demux ->
# per-frame JPEG decode, value-checked end to end)
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("luma", IntegerType()),
])


def multimodal_video_frames(spark, sf_dir):
    """Oracle-gated VIDEO FRAME decode: per doc, render a real MJPEG MP4
    (2 + doc_id%4 solid-gray 16x8 baseline-JPEG frames, gray value
    (37*doc_id + 53*i) % 256), demux it back through the stbl sample
    tables (``sample_frames`` every_n=2), and fully JPEG-decode each
    sampled frame to its mean luma.

    At quality 76 the luma DC quantizer step is exactly 8, so a constant
    8x8 block survives DCT→quantize→IDCT bit-exactly — the decoded luma
    equals the closed-form gray value and the whole
    encode→mux→demux→entropy-decode→IDCT loop is value-checked by a
    closed-form DuckDB twin (generate_series over the same recurrence).

    Scale: payloads are built and consumed inside one mapInPandas stage —
    frames never shuffle; output is 5 fixed-width columns.
    """
    from .jpeg import decode_jpeg as _dj
    from .jpeg import encode_jpeg as _ej
    d = load_table(spark, sf_dir, "documents") \
        .select("doc_id").orderBy("doc_id").limit(100)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                frames = [
                    _ej(bytes([(37 * did + 53 * i) % 256]) * 3 * 16 * 8,
                        16, 8, quality=76)
                    for i in range(2 + did % 4)]
                payloads.append(encode_mp4_mjpeg(
                    frames, 16, 8, frames_per_chunk=2))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "payload": payloads,
                "mime": "video/mp4"})
    videos = d.mapInPandas(synth, MEDIA_SCHEMA)
    sampled = sample_frames(videos, every_n=2)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in VIDEO_FRAME_SCHEMA.fields}
            for doc_id, idx, fr in zip(pdf["doc_id"], pdf["frame_idx"],
                                       pdf["frame"]):
                w, h, rgb = _dj(bytes(fr))
                px = np.frombuffer(rgb, np.uint8).reshape(-1, 3) \
                    .astype(np.int64)
                n = max(1, w * h)
                rows["doc_id"].append(int(doc_id))
                rows["frame_idx"].append(int(idx))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["luma"].append(int((px.sum(axis=1) // 3).sum()) // n)
            yield pd.DataFrame(rows)
    return (sampled.select("doc_id", "frame_idx", "frame")
                   .mapInPandas(stats, VIDEO_FRAME_SCHEMA)
                   .orderBy("doc_id", "frame_idx"))


QUERIES["multimodal_video_frames"] = multimodal_video_frames
ORACLES["multimodal_video_frames"] = """
WITH docs AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100)
SELECT d.doc_id,
       CAST(g.i AS INT) AS frame_idx,
       CAST(16 AS INT) AS width,
       CAST(8 AS INT) AS height,
       CAST((37 * d.doc_id + 53 * g.i) % 256 AS INT) AS luma
FROM docs d, generate_series(0, 4) AS g(i)
WHERE g.i < 2 + d.doc_id % 4 AND g.i % 2 = 0
ORDER BY d.doc_id, g.i
"""


def video_thumbnails(df, every_n: int = 2, width: int = 8,
                     height: int = 8):
    """Video → per-frame thumbnails: the composition a vision-training
    pipeline runs over a video corpus — demux real frames from the MP4
    sample tables (``sample_frames``), then the fixed-size
    nearest-neighbor resize over each decoded JPEG
    (``resize_images`` consumes the frame column unchanged).

    Both stages are mapInPandas over the same partitioning: frames
    never shuffle between demux and resize, and the output is
    fixed-width (doc_id, frame_idx, thumbnail) rows.
    """
    frames = sample_frames(df, every_n=every_n)
    return (frames.select("doc_id", "frame_idx",
                          F.col("frame").alias("payload"))
                  .mapInPandas(_thumb_runner(width, height),
                               THUMB_SCHEMA))


THUMB_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumbnail", BinaryType()),
])


def _thumb_runner(width: int, height: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                sw, sh, rgb = _image_pixels(bytes(p))
                a = np.frombuffer(rgb, np.uint8).reshape(sh, sw, 3)
                ys = (np.arange(height) * sh) // height
                xs = (np.arange(width) * sw) // width
                thumbs.append(a[ys][:, xs].tobytes())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "frame_idx": pdf["frame_idx"].values,
                "width": width, "height": height,
                "thumbnail": thumbs})
    return run


# ---------------------------------------------------------------------------
# audio windowing (oracle-gated: the audio feature-extraction pass)
# ---------------------------------------------------------------------------

AUDIO_WINDOW_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("win", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("sum_sq", LongType()),
    StructField("max_abs", LongType()),
])


def audio_windows(df, window: int = 16):
    """Fixed-length audio windowing over decoded PCM16 samples: per
    (doc, window) the integer energy (sum of squared samples) and peak
    |amplitude| — the framing every audio-training feature extractor
    (fbank/VAD/loudness normalization) starts from.  Integer stats so
    the whole decode->window loop is value-checkable cross-engine."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in AUDIO_WINDOW_SCHEMA.fields}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                pos, data = 12, b""
                while pos + 8 <= len(b):
                    cid = b[pos:pos + 4]
                    ln = struct.unpack_from("<I", b, pos + 4)[0]
                    if cid == b"data":
                        data = b[pos + 8:pos + 8 + ln]
                    pos += 8 + ln + (ln & 1)
                s = np.frombuffer(data, "<i2").astype(np.int64)
                for wi in range(0, len(s), window):
                    seg = s[wi:wi + window]
                    rows["doc_id"].append(int(doc_id))
                    rows["win"].append(wi // window)
                    rows["n_samples"].append(len(seg))
                    rows["sum_sq"].append(int((seg * seg).sum()))
                    rows["max_abs"].append(int(np.abs(seg).max()))
            yield pd.DataFrame(rows)
    return df.mapInPandas(run, AUDIO_WINDOW_SCHEMA)


def multimodal_audio_windows(spark, sf_dir):
    """Oracle-gated audio windowing: synthesize the corpus's WAV third
    (samples are (text_byte - 128) * 256, a closed form of the text),
    window the decoded PCM at 16 samples, emit integer energy/peak per
    window — the DuckDB twin recomputes every sample from hex() digit
    pairs, so the full encode->RIFF-parse->window loop is value-checked.
    """
    d = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % 3 == 1).orderBy("doc_id").limit(120)
    media = synthesize_media(d)
    return (audio_windows(media, window=16)
            .orderBy("doc_id", "win"))


QUERIES["multimodal_audio_windows"] = multimodal_audio_windows
ORACLES["multimodal_audio_windows"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS n
  FROM documents WHERE doc_id % 3 = 1 ORDER BY doc_id LIMIT 120),
samples AS (
  SELECT d.doc_id, g.i,
         ((strpos('0123456789ABCDEF',
                  substr(d.hx, (g.i % d.n)*2+1, 1))-1)*16
        + (strpos('0123456789ABCDEF',
                  substr(d.hx, (g.i % d.n)*2+2, 1))-1) - 128) * 256 AS s
  FROM docs d, generate_series(0, 63) AS g(i))
SELECT doc_id,
       CAST(i // 16 AS INT) AS win,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(s)) AS BIGINT) AS max_abs
FROM samples GROUP BY doc_id, i // 16 ORDER BY doc_id, win
"""


# ---------------------------------------------------------------------------
# GIF path (operators/gif.py — LZW, palettes, interlace)
# ---------------------------------------------------------------------------

def synthesize_gifs(df):
    """documents -> genuine single-frame GIFs: 8x8 RGB from seed-cycled
    utf-8 text bytes (same pixel recipe as the BMP/PNG kinds so the
    oracle's hex-digit twin applies), odd doc_ids written INTERLACED —
    both layouts decode to identical pixels, which the query verifies
    by value."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import encode_gif
        for pdf in batches:
            rows = {"doc_id": [], "payload": [], "mime": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                need = 3 * 8 * 8
                pix = (seed * (need // len(seed) + 1))[:need]
                rows["doc_id"].append(doc_id)
                rows["payload"].append(
                    encode_gif(pix, 8, 8, interlace=bool(doc_id % 2)))
                rows["mime"].append("image/gif")
            yield pd.DataFrame(rows)
    return df.select("doc_id", "text").mapInPandas(run, MEDIA_SCHEMA)


def multimodal_gif_decode(spark, sf_dir):
    """GIF encode->decode loop, value-gated end to end: synthesize real
    LZW-compressed GIF89a payloads from the corpus (interlaced for odd
    doc_ids), decode them with the dependency-free codec, emit per-doc
    geometry + integer mean luma.  The DuckDB twin recomputes the luma
    from hex-digit byte extraction — palette construction, LZW, and
    (de)interlacing all cancel exactly or the hash breaks."""
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(400)
    feats = decode_media(synthesize_gifs(docs))
    return feats.select(
        "doc_id", "format",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("mean_luma").cast("long").alias("mean_luma"))


QUERIES["multimodal_gif_decode"] = multimodal_gif_decode
ORACLES["multimodal_gif_decode"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 400
),
b AS (
  SELECT d.doc_id, g.i, g.i // 3 AS px,
         (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+1, 1))-1)*16
       + (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+2, 1))-1) AS bv
  FROM docs d, generate_series(0, 191) AS g(i)
),
px AS (
  SELECT doc_id, px, SUM(bv) // 3 AS luma FROM b GROUP BY doc_id, px
)
SELECT d.doc_id, 'image/gif' AS format,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST(SUM(p.luma) // 64 AS BIGINT) AS mean_luma
FROM docs d JOIN px p USING (doc_id)
GROUP BY d.doc_id ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# G.711 companding path (operators/g711.py — audioop-pinned closed forms)
# ---------------------------------------------------------------------------

G711_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("sum_ulaw", LongType()),
    StructField("sum_alaw", LongType()),
    StructField("max_err_ulaw", LongType()),
    StructField("max_err_alaw", LongType()),
])


def multimodal_g711_roundtrip(spark, sf_dir):
    """G.711 companding end to end, value-gated: synthesize PCM16
    samples from the corpus (the WAV recipe: (byte-128)*256), push them
    through BOTH mu-law and A-law encode->decode, publish per-doc sums
    of the decoded signals and the max quantization error.

    The codec closed forms are audioop-pinned (tests/test_g711.py);
    the DuckDB twin re-derives the full segment/mantissa quantizer in
    SQL over the 256-value byte domain, so a single wrong bias, clip,
    threshold, or inversion mask breaks the value hash.  Map-only plan:
    companding runs inside one mapInPandas stage, no shuffle."""
    from .g711 import alaw_decode, alaw_encode, ulaw_decode, ulaw_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                b = np.frombuffer(
                    (seed * (64 // len(seed) + 1))[:64], np.uint8)
                x = ((b.astype(np.int32) - 128) * 256).astype(np.int16)
                du = ulaw_decode(ulaw_encode(x)).astype(np.int64)
                da = alaw_decode(alaw_encode(x)).astype(np.int64)
                x64 = x.astype(np.int64)
                rows.append({
                    "doc_id": doc_id, "n_samples": 64,
                    "sum_ulaw": int(du.sum()),
                    "sum_alaw": int(da.sum()),
                    "max_err_ulaw": int(np.abs(x64 - du).max()),
                    "max_err_alaw": int(np.abs(x64 - da).max())})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(400))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, G711_SCHEMA).orderBy("doc_id"))


QUERIES["multimodal_g711_roundtrip"] = multimodal_g711_roundtrip
# SQL re-derivation of the G.711 quantizer over the 256-value byte
# domain (x = (bv-128)*256): mu-law in the 14-bit domain (bias 33, clip
# 8158), A-law in the 13-bit domain (one's-complement negatives).
ORACLES["multimodal_g711_roundtrip"] = """
WITH bytes AS (
  SELECT g.i AS bv,
         (g.i - 128) * 256 AS x,
         (g.i - 128) * 64  AS x14,
         (g.i - 128) * 32  AS x13
  FROM generate_series(0, 255) AS g(i)
),
umap AS (  -- mu-law: 14-bit domain, bias 33, clip 8158, exp at 2^(5+e)
  SELECT bv, x,
         CASE WHEN neg THEN -duv ELSE duv END AS du
  FROM (
    SELECT bv, x, neg,
           (((m // (1 << (exp + 1))) % 16) * 8 + 132) * (1 << exp) - 132
             AS duv
    FROM (
      SELECT bv, x, neg, m,
             CASE WHEN m >= 4096 THEN 7 WHEN m >= 2048 THEN 6
                  WHEN m >= 1024 THEN 5 WHEN m >=  512 THEN 4
                  WHEN m >=  256 THEN 3 WHEN m >=  128 THEN 2
                  WHEN m >=   64 THEN 1 ELSE 0 END AS exp
      FROM (SELECT bv, x, bv < 128 AS neg,
                   least(CASE WHEN bv < 128 THEN -x14 ELSE x14 END,
                         8158) + 33 AS m
            FROM bytes)))
),
amap AS (  -- A-law: 13-bit domain, 1s-compl negatives, exp at 2^(4+e)
  SELECT bv, x,
         CASE WHEN neg THEN -dav ELSE dav END AS da
  FROM (
    SELECT bv, x, neg,
           (CASE WHEN exp = 0 THEN ((m // 2) % 16) * 2 + 1
                 ELSE (((m // (1 << exp)) % 16) * 2 + 33)
                      * (1 << (exp - 1)) END) * 8 AS dav
    FROM (
      SELECT bv, x, neg, m,
             CASE WHEN m >= 2048 THEN 7 WHEN m >= 1024 THEN 6
                  WHEN m >=  512 THEN 5 WHEN m >=  256 THEN 4
                  WHEN m >=  128 THEN 3 WHEN m >=   64 THEN 2
                  WHEN m >=   32 THEN 1 ELSE 0 END AS exp
      FROM (SELECT bv, x, bv < 128 AS neg,
                   least(CASE WHEN bv < 128 THEN -x13 - 1 ELSE x13 END,
                         4095) AS m
            FROM bytes)))
),
docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 400
),
samples AS (
  SELECT d.doc_id,
         (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+1, 1))-1)*16
       + (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+2, 1))-1) AS bv
  FROM docs d, generate_series(0, 63) AS g(i)
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT)               AS n_samples,
       CAST(SUM(u.du) AS BIGINT)              AS sum_ulaw,
       CAST(SUM(am.da) AS BIGINT)             AS sum_alaw,
       CAST(MAX(ABS(u.x - u.du)) AS BIGINT)   AS max_err_ulaw,
       CAST(MAX(ABS(am.x - am.da)) AS BIGINT) AS max_err_alaw
FROM samples s
JOIN umap u ON u.bv = s.bv
JOIN amap am ON am.bv = s.bv
GROUP BY s.doc_id ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM path (operators/adpcm.py — audioop-pinned reference loop)
# ---------------------------------------------------------------------------

ADPCM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("sum_dec", LongType()),
    StructField("min_dec", LongType()),
    StructField("max_dec", LongType()),
    StructField("end_ix", LongType()),
])


def multimodal_adpcm_roundtrip(spark, sf_dir):
    """IMA ADPCM end to end, value-gated: synthesize PCM16 clips from
    the corpus (the WAV recipe: (byte-128)*256, text bytes cycled to 64
    samples), run encode -> decode, publish per-doc aggregates of the
    DECODED signal plus the final quantizer index.

    The codec loop is audioop-pinned byte-exact (tests/test_adpcm.py).
    The DuckDB twin re-derives the whole adaptive-quantizer recursion in
    a recursive CTE — the encoder tracks the decoder, so the decoded
    signal IS the encoder's valpred trajectory — which means one wrong
    step-table entry, clamp, or index bump anywhere in the 64-sample
    loop breaks the value hash.  Map-only plan: one mapInPandas stage,
    clips are independent rows (the codec is sequential per clip, the
    parallelism is across clips)."""
    from .adpcm import adpcm_decode, adpcm_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                b = np.frombuffer(
                    (seed * (64 // len(seed) + 1))[:64], np.uint8)
                x = ((b.astype(np.int32) - 128) * 256).astype(np.int16)
                enc, _, _ = adpcm_encode(x)
                dec, _, ix = adpcm_decode(enc, n=64)
                d = dec.astype(np.int64)
                rows.append({
                    "doc_id": doc_id, "n_samples": 64,
                    "sum_dec": int(d.sum()),
                    "min_dec": int(d.min()), "max_dec": int(d.max()),
                    "end_ix": int(ix)})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, ADPCM_SCHEMA).orderBy("doc_id"))


QUERIES["multimodal_adpcm_roundtrip"] = multimodal_adpcm_roundtrip
# Recursive re-derivation of the IMA adaptive quantizer: the encoder
# and decoder share state by construction, so decoded[i] == the
# encoder's clamped prediction after consuming sample i.
ORACLES["multimodal_adpcm_roundtrip"] = """
WITH RECURSIVE docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 300
),
samples AS (
  SELECT d.doc_id, g.i + 1 AS i,
         ((strpos('0123456789ABCDEF',
                  substr(d.hx, ((g.i % d.len)) * 2 + 1, 1)) - 1) * 16
          + (strpos('0123456789ABCDEF',
                    substr(d.hx, ((g.i % d.len)) * 2 + 2, 1)) - 1)
          - 128) * 256 AS x
  FROM docs d, generate_series(0, 63) AS g(i)
),
steps(six, step) AS (VALUES __STEPVALS__),
st AS (
  SELECT doc_id, 0 AS i, 0 AS vp, 0 AS ix, CAST(0 AS BIGINT) AS ssum,
         32767 AS mn, -32768 AS mx
  FROM docs
  UNION ALL
  SELECT doc_id, i + 1, vp2, ix2,
         ssum + vp2, least(mn, vp2), greatest(mx, vp2)
  FROM (
    SELECT q3.doc_id, q3.i, q3.ssum, q3.mn, q3.mx,
           CASE WHEN sign THEN greatest(vp - vpdiff, -32768)
                ELSE least(vp + vpdiff, 32767) END AS vp2,
           least(greatest(ix + CASE WHEN mag < 4 THEN -1
                                    WHEN mag = 4 THEN 2
                                    WHEN mag = 5 THEN 4
                                    WHEN mag = 6 THEN 6
                                    ELSE 8 END, 0), 88) AS ix2
    FROM (
      SELECT q2.*,
             (step >> 3)
             + CASE WHEN d4 THEN step ELSE 0 END
             + CASE WHEN d2 THEN step >> 1 ELSE 0 END
             + CASE WHEN d1 THEN step >> 2 ELSE 0 END AS vpdiff,
             CASE WHEN d4 THEN 4 ELSE 0 END
             + CASE WHEN d2 THEN 2 ELSE 0 END
             + CASE WHEN d1 THEN 1 ELSE 0 END AS mag
      FROM (
        SELECT q1.*,
               (a2 - CASE WHEN d2 THEN step >> 1 ELSE 0 END)
                 >= (step >> 2) AS d1
        FROM (
          SELECT q0.*,
                 a1 - CASE WHEN d4 THEN step ELSE 0 END AS a2,
                 (a1 - CASE WHEN d4 THEN step ELSE 0 END)
                   >= (step >> 1) AS d2
          FROM (
            SELECT st.doc_id, st.i, st.vp, st.ix, st.ssum, st.mn, st.mx,
                   tb.step,
                   (s.x - st.vp) < 0 AS sign,
                   abs(s.x - st.vp) AS a1,
                   abs(s.x - st.vp) >= tb.step AS d4
            FROM st
            JOIN samples s ON s.doc_id = st.doc_id AND s.i = st.i + 1
            JOIN steps tb ON tb.six = st.ix
            WHERE st.i < 64
          ) q0
        ) q1
      ) q2
    ) q3
  ) q4
)
SELECT doc_id, CAST(64 AS BIGINT) AS n_samples,
       CAST(ssum AS BIGINT) AS sum_dec,
       CAST(mn AS BIGINT) AS min_dec, CAST(mx AS BIGINT) AS max_dec,
       CAST(ix AS BIGINT) AS end_ix
FROM st WHERE i = 64 ORDER BY doc_id
""".replace("__STEPVALS__", "(0,7),(1,8),(2,9),(3,10),(4,11),(5,12),(6,13),(7,14),(8,16),(9,17),(10,19),(11,21),(12,23),(13,25),(14,28),(15,31),(16,34),(17,37),(18,41),(19,45),(20,50),(21,55),(22,60),(23,66),(24,73),(25,80),(26,88),(27,97),(28,107),(29,118),(30,130),(31,143),(32,157),(33,173),(34,190),(35,209),(36,230),(37,253),(38,279),(39,307),(40,337),(41,371),(42,408),(43,449),(44,494),(45,544),(46,598),(47,658),(48,724),(49,796),(50,876),(51,963),(52,1060),(53,1166),(54,1282),(55,1411),(56,1552),(57,1707),(58,1878),(59,2066),(60,2272),(61,2499),(62,2749),(63,3024),(64,3327),(65,3660),(66,4026),(67,4428),(68,4871),(69,5358),(70,5894),(71,6484),(72,7132),(73,7845),(74,8630),(75,9493),(76,10442),(77,11487),(78,12635),(79,13899),(80,15289),(81,16818),(82,18500),(83,20350),(84,22385),(85,24623),(86,27086),(87,29794),(88,32767)")


# ---------------------------------------------------------------------------
# QOI lossless image path (operators/qoi.py — reference-encoder chunk order)
# ---------------------------------------------------------------------------

QOI_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_px", LongType()),
    StructField("sum_r", LongType()),
    StructField("sum_g", LongType()),
    StructField("sum_b", LongType()),
    StructField("lossless", LongType()),
])


def multimodal_qoi_roundtrip(spark, sf_dir):
    """QOI encode -> decode over synthesized 16x16 RGB images (pixel
    bytes = text bytes cycled, the g711/WAV recipe), value-gated on the
    DECODED image: per-channel sums must equal the source sums (QOI is
    lossless), and ``lossless`` is the exact-equality flag.  The DuckDB
    twin re-derives the source-channel sums from the same byte recipe,
    so any corruption anywhere in the chunk state machine (index
    collisions, DIFF wraparound, run splits) flips a sum or the flag
    and breaks the value hash.  Chunk-level byte behavior is pinned
    separately against spec-derived vectors (tests/test_qoi.py).
    Map-only plan: one mapInPandas stage, images independent per row."""
    from .qoi import qoi_decode, qoi_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                raw = np.frombuffer(
                    (seed * (768 // len(seed) + 1))[:768], np.uint8)
                img = raw.reshape(16, 16, 3)
                dec, _ = qoi_decode(qoi_encode(img))
                d = dec.astype(np.int64)
                rows.append({
                    "doc_id": doc_id, "n_px": 256,
                    "sum_r": int(d[:, :, 0].sum()),
                    "sum_g": int(d[:, :, 1].sum()),
                    "sum_b": int(d[:, :, 2].sum()),
                    "lossless": int((dec == img).all())})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, QOI_SCHEMA).orderBy("doc_id"))


QUERIES["multimodal_qoi_roundtrip"] = multimodal_qoi_roundtrip
# Source-channel sums re-derived from the cycled-byte recipe; channel
# of byte j is j % 3.  lossless == 1 is part of the gated contract.
ORACLES["multimodal_qoi_roundtrip"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 300
),
bytes AS (
  SELECT d.doc_id, g.j % 3 AS chan,
         (strpos('0123456789ABCDEF',
                 substr(d.hx, ((g.j % d.len)) * 2 + 1, 1)) - 1) * 16
         + (strpos('0123456789ABCDEF',
                   substr(d.hx, ((g.j % d.len)) * 2 + 2, 1)) - 1) AS bv
  FROM docs d, generate_series(0, 767) AS g(j)
)
SELECT doc_id, CAST(256 AS BIGINT) AS n_px,
       CAST(SUM(CASE WHEN chan = 0 THEN bv ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN chan = 1 THEN bv ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN chan = 2 THEN bv ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(1 AS BIGINT) AS lossless
FROM bytes GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Netpbm path (operators/netpbm.py — P1-P6, spec-vector tested)
# ---------------------------------------------------------------------------

NETPBM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_px", LongType()),
    StructField("sum_gray", LongType()),
    StructField("n_black", LongType()),
    StructField("sum_rgb", LongType()),
])


def multimodal_netpbm_roundtrip(spark, sf_dir):
    """Netpbm end to end, value-gated across THREE variants per doc:
    the 16x16 gray image (text bytes cycled) rides P5 encode -> decode
    (sum must survive — lossless), its >=128 threshold rides P4 packed
    bits (popcount must survive — the MSB-first row-padded packing is
    where bugs live), and the 768-byte RGB image rides P6 (total sum).
    The DuckDB twin recomputes all three aggregates from the same byte
    recipe.  Map-only plan: one mapInPandas stage."""
    from .netpbm import netpbm_decode, netpbm_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                raw = np.frombuffer(
                    (seed * (768 // len(seed) + 1))[:768], np.uint8)
                gray = raw[:256].reshape(16, 16)
                g2, _ = netpbm_decode(netpbm_encode(gray, 5))
                bits = (gray >= 128).astype(np.uint8)
                b2, _ = netpbm_decode(netpbm_encode(bits, 4))
                rgb = raw.reshape(16, 16, 3)
                c2, _ = netpbm_decode(netpbm_encode(rgb, 6))
                rows.append({
                    "doc_id": doc_id, "n_px": 256,
                    "sum_gray": int(g2.astype(np.int64).sum()),
                    "n_black": int(b2.astype(np.int64).sum()),
                    "sum_rgb": int(c2.astype(np.int64).sum())})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, NETPBM_SCHEMA).orderBy("doc_id"))


QUERIES["multimodal_netpbm_roundtrip"] = multimodal_netpbm_roundtrip
ORACLES["multimodal_netpbm_roundtrip"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 300
),
bytes AS (
  SELECT d.doc_id, g.j AS j,
         (strpos('0123456789ABCDEF',
                 substr(d.hx, ((g.j % d.len)) * 2 + 1, 1)) - 1) * 16
         + (strpos('0123456789ABCDEF',
                   substr(d.hx, ((g.j % d.len)) * 2 + 2, 1)) - 1) AS bv
  FROM docs d, generate_series(0, 767) AS g(j)
)
SELECT doc_id, CAST(256 AS BIGINT) AS n_px,
       CAST(SUM(CASE WHEN j < 256 THEN bv ELSE 0 END) AS BIGINT)
         AS sum_gray,
       CAST(SUM(CASE WHEN j < 256 AND bv >= 128 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_black,
       CAST(SUM(bv) AS BIGINT) AS sum_rgb
FROM bytes GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# TIFF baseline path (operators/tiff.py — spec-example-pinned PackBits)
# ---------------------------------------------------------------------------

TIFF_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_px", LongType()),
    StructField("sum_gray", LongType()),
    StructField("sum_rgb", LongType()),
    StructField("lossless", LongType()),
])


def multimodal_tiff_roundtrip(spark, sf_dir):
    """Baseline TIFF end to end, value-gated: the 16x16 gray image
    (text bytes cycled) rides an UNCOMPRESSED single-strip encode ->
    decode, then a PACKBITS multi-strip (rows_per_strip=4) encode ->
    decode — the strip walk and Section-9 codec both on the hot path —
    and the RGB image rides PackBits too.  ``lossless`` asserts all
    three decodes equal their sources; sums re-derived by the DuckDB
    twin from the byte recipe.  Map-only plan: one mapInPandas stage."""
    from .tiff import tiff_decode, tiff_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                raw = np.frombuffer(
                    (seed * (768 // len(seed) + 1))[:768], np.uint8)
                gray = raw[:256].reshape(16, 16)
                g1 = tiff_decode(tiff_encode(gray))
                g2 = tiff_decode(tiff_encode(gray, packbits=True,
                                             rows_per_strip=4))
                g3 = tiff_decode(tiff_encode(gray, lzw=True,
                                             rows_per_strip=5))
                rgb = raw.reshape(16, 16, 3)
                c1 = tiff_decode(tiff_encode(rgb, packbits=True))
                ok = (int((g1 == gray).all()) & int((g2 == gray).all())
                      & int((g3 == gray).all()) & int((c1 == rgb).all()))
                rows.append({
                    "doc_id": doc_id, "n_px": 256,
                    "sum_gray": int(g2.astype(np.int64).sum()),
                    "sum_rgb": int(c1.astype(np.int64).sum()),
                    "lossless": ok})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, TIFF_SCHEMA).orderBy("doc_id"))


QUERIES["multimodal_tiff_roundtrip"] = multimodal_tiff_roundtrip
ORACLES["multimodal_tiff_roundtrip"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 300
),
bytes AS (
  SELECT d.doc_id, g.j AS j,
         (strpos('0123456789ABCDEF',
                 substr(d.hx, ((g.j % d.len)) * 2 + 1, 1)) - 1) * 16
         + (strpos('0123456789ABCDEF',
                   substr(d.hx, ((g.j % d.len)) * 2 + 2, 1)) - 1) AS bv
  FROM docs d, generate_series(0, 767) AS g(j)
)
SELECT doc_id, CAST(256 AS BIGINT) AS n_px,
       CAST(SUM(CASE WHEN j < 256 THEN bv ELSE 0 END) AS BIGINT)
         AS sum_gray,
       CAST(SUM(bv) AS BIGINT) AS sum_rgb,
       CAST(1 AS BIGINT) AS lossless
FROM bytes GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# WARC ingest path (sources/warc.py — Common Crawl container)
# ---------------------------------------------------------------------------

WARC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("status", LongType()),
    StructField("body_len", LongType()),
    StructField("sum_body", LongType()),
    StructField("gz", LongType()),
])


def warc_extract(spark, sf_dir):
    """The Common Crawl ingest loop, value-gated: each document becomes
    a WARC response record (HTTP envelope, status 404 for every
    n_chars%7==0 doc, gzip MEMBER framing for odd doc_ids — the
    .warc.gz multi-member layout), then the reader walks record framing
    -> HTTP envelope -> body and publishes per-doc accounting.  The
    DuckDB twin recomputes status/length/byte-sum from the text, so a
    framing bug anywhere (Content-Length, trailer CRLFs, member
    boundaries, status line) surfaces as a value mismatch.  Map-only
    plan: build+parse run inside one mapInPandas stage."""
    from ..sources.warc import (build_warc, extract_http_body,
                                http_response, parse_warc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                status = 404 if len(text) % 7 == 0 else 200
                gz = int(doc_id) % 2 == 1
                blob = build_warc([{
                    "type": "response",
                    "uri": f"http://corpus/doc/{doc_id}",
                    "date": "2026-01-01T00:00:00Z",
                    "record_id": f"<urn:uuid:{doc_id}>",
                    "payload": http_response(body, status)}],
                    gzip_members=gz)
                recs = parse_warc(blob)
                st, got = extract_http_body(recs[0]["payload"])
                rows.append({
                    "doc_id": doc_id, "status": st,
                    "body_len": len(got),
                    "sum_body": int(sum(got)),
                    "gz": int(gz)})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, WARC_SCHEMA).orderBy("doc_id"))


QUERIES["warc_extract"] = warc_extract
# NB the status gate uses CHARACTER length (len(text)) in both engines;
# body_len/sum_body use BYTE length of the utf-8 encoding.
ORACLES["warc_extract"] = """
WITH docs AS (
  SELECT doc_id, text, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS blen
  FROM documents ORDER BY doc_id LIMIT 300
)
SELECT doc_id,
       CAST(CASE WHEN length(text) % 7 = 0 THEN 404 ELSE 200 END
            AS BIGINT) AS status,
       CAST(blen AS BIGINT) AS body_len,
       CAST(COALESCE(list_sum(list_transform(range(0, blen), j ->
              (strpos('0123456789ABCDEF', substr(hx, j * 2 + 1, 1)) - 1)
              * 16
              + (strpos('0123456789ABCDEF', substr(hx, j * 2 + 2, 1))
                 - 1))), 0) AS BIGINT) AS sum_body,
       CAST(doc_id % 2 AS BIGINT) AS gz
FROM docs ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tar bundle path (sources/archive.py — tarfile-interop-pinned ustar)
# ---------------------------------------------------------------------------

TAR_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("bundle", LongType()),
    StructField("n_members", LongType()),
    StructField("body_len", LongType()),
    StructField("sum_body", LongType()),
])


def tar_extract(spark, sf_dir):
    """Document-bundle ingest, value-gated: docs group into 4-doc
    bundles (doc_id div 4), each bundle packs into ONE ustar archive
    (gzipped whole for odd bundles — .tar.gz), then unpacks and emits
    per-member accounting.  The ustar writer is pinned byte-compatible
    with CPython's tarfile (tests/test_archive.py), and the DuckDB twin
    recomputes member counts and byte sums from the corpus — so header
    layout, checksum, padding, and end-block bugs all surface as value
    mismatches.  Plan: ONE grouped shuffle (applyInPandas per bundle) —
    the bundle is the natural unit of work a 100 TB packer ships."""
    from ..sources.archive import tar_pack, tar_unpack

    def pack_unpack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bundle = int(pdf["bundle"].iloc[0])
        members = [(f"doc_{int(i)}.txt", t.encode("utf-8"))
                   for i, t in zip(pdf["doc_id"], pdf["text"])]
        blob = tar_pack(members, gzip_stream=bundle % 2 == 1)
        got = tar_unpack(blob)
        rows = []
        for name, body in got:
            rows.append({
                "doc_id": int(name[4:-4]), "bundle": bundle,
                "n_members": len(got), "body_len": len(body),
                "sum_body": int(sum(body))})
        return pd.DataFrame(rows)

    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300)
            .withColumn("bundle", F.expr("doc_id div 4")))
    return (docs.select("doc_id", "bundle", "text")
            .groupBy("bundle").applyInPandas(pack_unpack, TAR_SCHEMA)
            .orderBy("doc_id"))


QUERIES["tar_extract"] = tar_extract
ORACLES["tar_extract"] = """
WITH docs AS (
  SELECT doc_id, doc_id // 4 AS bundle, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS blen
  FROM documents ORDER BY doc_id LIMIT 300
)
SELECT doc_id, CAST(bundle AS BIGINT) AS bundle,
       CAST(COUNT(*) OVER (PARTITION BY bundle) AS BIGINT) AS n_members,
       CAST(blen AS BIGINT) AS body_len,
       CAST(COALESCE(list_sum(list_transform(range(0, blen), j ->
              (strpos('0123456789ABCDEF', substr(hx, j * 2 + 1, 1)) - 1)
              * 16
              + (strpos('0123456789ABCDEF', substr(hx, j * 2 + 2, 1))
                 - 1))), 0) AS BIGINT) AS sum_body
FROM docs ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Snappy path (sources/snappy.py — pyarrow-cross-interop-pinned)
# ---------------------------------------------------------------------------

SNAPPY_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("body_len", LongType()),
    StructField("sum_body", LongType()),
    StructField("lossless", LongType()),
])


def snappy_roundtrip(spark, sf_dir):
    """Snappy raw-block compress -> decompress per document, value
    gated on losslessness (byte sum + length + equality flag).  The
    codec itself is pinned in BOTH interop directions against
    pyarrow's bundled snappy (tests/test_snappy.py) — this query gates
    the Spark-side plumbing and the corpus-shaped inputs.  Map-only
    plan: one mapInPandas stage."""
    from ..sources.snappy import snappy_compress, snappy_decompress

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                got = snappy_decompress(snappy_compress(body))
                rows.append({
                    "doc_id": doc_id, "body_len": len(got),
                    "sum_body": int(sum(got)),
                    "lossless": int(got == body)})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, SNAPPY_SCHEMA).orderBy("doc_id"))


QUERIES["snappy_roundtrip"] = snappy_roundtrip
ORACLES["snappy_roundtrip"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS blen
  FROM documents ORDER BY doc_id LIMIT 300
)
SELECT doc_id, CAST(blen AS BIGINT) AS body_len,
       CAST(COALESCE(list_sum(list_transform(range(0, blen), j ->
              (strpos('0123456789ABCDEF', substr(hx, j * 2 + 1, 1)) - 1)
              * 16
              + (strpos('0123456789ABCDEF', substr(hx, j * 2 + 2, 1))
                 - 1))), 0) AS BIGINT) AS sum_body,
       CAST(1 AS BIGINT) AS lossless
FROM docs ORDER BY doc_id
"""


def lz4_roundtrip(spark, sf_dir):
    """LZ4-block compress -> decompress per document (the parquet
    LZ4_RAW codec), value-gated on losslessness; codec cross-pinned
    both directions against pyarrow's lz4 (tests/test_lz4.py).
    Map-only plan."""
    from ..sources.lz4 import lz4_compress, lz4_decompress

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                got = lz4_decompress(lz4_compress(body), len(body))
                rows.append({
                    "doc_id": doc_id, "body_len": len(got),
                    "sum_body": int(sum(got)),
                    "lossless": int(got == body)})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, SNAPPY_SCHEMA).orderBy("doc_id"))


QUERIES["lz4_roundtrip"] = lz4_roundtrip
ORACLES["lz4_roundtrip"] = ORACLES["snappy_roundtrip"]


# ---------------------------------------------------------------------------
# WARC-fronted crawl-curation capstone (r6 verdict ask #7): the
# cc_pipeline funnel with a REAL binary front door — each page is
# packed into a Common Crawl-layout WARC response record (gzip members
# for odd doc_ids), read back through record framing -> HTTP envelope
# -> HTML, and only then handed to the JVM-side text chain
# (strip -> langid -> quality gate).  A framing bug anywhere in the
# WARC/HTTP leg corrupts the recovered HTML and surfaces as a funnel
# value mismatch against the cc_pipeline oracle.
# ---------------------------------------------------------------------------

CC_WARC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("lang", StringType()),
    StructField("html", StringType()),
])


def cc_pipeline_warc(spark, sf_dir):
    """Declared query: binary -> HTML -> langid -> quality, end to end.

    Stage 1 (Arrow-batched Python, map-only — the part SQL cannot
    express): synthesize the page's HTML (byte-identical to
    cc_pipeline's _synth_html_col), wrap it in an HTTP 200 envelope
    inside a WARC response record (sources/warc.py, gzip MEMBER framing
    for odd doc_ids), then parse the record back and recover the HTML.
    Stage 2 (pure JVM columns, identical to cc_pipeline): strip the
    HTML with the codegen regex chain, language-ID the recovered text,
    apply the integer quality gate, aggregate the (lang, predicted,
    kept) funnel.  Plan: one Python map stage, no join, one hash
    aggregation — the Common Crawl snapshot loop at any scale."""
    from ..sources.warc import (build_warc, extract_http_body,
                                http_response, parse_warc)
    from .text import (CC_MAX_WORDS, CC_MIN_WORDS, CC_STOPWORD_PER_20,
                       LEXICON, html_to_text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, lang, text in zip(pdf["doc_id"], pdf["lang"],
                                          pdf["text"]):
                html = (
                    "<html><head><title>t</title>"
                    "<script type='text/javascript'>var x = 1 < 2;"
                    "</script><style>p { color: red; }</style></head>"
                    "<body><p>"
                    + text.replace("&", "&amp;").replace(" ", "</p>\n<p>")
                    + "</p><!-- note --></body></html>")
                blob = build_warc([{
                    "type": "response",
                    "uri": f"http://corpus/doc/{doc_id}",
                    "date": "2026-01-01T00:00:00Z",
                    "record_id": f"<urn:uuid:{doc_id}>",
                    "payload": http_response(html.encode("utf-8"), 200)}],
                    gzip_members=int(doc_id) % 2 == 1)
                st, body = extract_http_body(parse_warc(blob)[0]["payload"])
                assert st == 200
                rows.append({"doc_id": doc_id, "lang": lang,
                             "html": body.decode("utf-8")})
            yield pd.DataFrame(rows)

    # fan-out: the WARC gzip roundtrip (Python) plus the regex chain are
    # all downstream of a single-split scan otherwise (guide §2.5/§4)
    docs = parallel_table(spark, sf_dir, "documents")
    pages = docs.select("doc_id", "lang", "text") \
                .mapInPandas(run, CC_WARC_SCHEMA)
    txt = html_to_text_col(F.col("html"))
    ws = F.split(txt, " ")

    def hits(lex):
        return F.size(F.filter(ws, lambda w: w.isin(*lex)))

    s = {lang: hits(lex) for lang, lex in LEXICON.items()}
    pred = (F.when((s["en"] >= s["es"]) & (s["en"] >= s["zh"]), "en")
             .when(s["es"] >= s["zh"], "es").otherwise("zh"))
    n_words = F.size(ws)
    s_all = s["en"] + s["es"] + s["zh"]
    keep = ((n_words >= CC_MIN_WORDS) & (n_words <= CC_MAX_WORDS)
            & (s_all * 20 >= CC_STOPWORD_PER_20 * n_words))
    return (pages.select("lang", pred.alias("predicted"),
                         keep.cast("int").alias("kept"),
                         n_words.alias("n_words"))
            .groupBy("lang", "predicted", "kept")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").cast("long").alias("sum_words"))
            .select("lang", "predicted",
                    F.col("kept").cast("long").alias("kept"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    "sum_words")
            .orderBy("lang", "predicted", "kept"))


QUERIES["cc_pipeline_warc"] = cc_pipeline_warc
# identical funnel accounting to cc_pipeline: the WARC/HTTP leg is an
# identity transport for the HTML, so the same oracle gates it — any
# framing defect breaks the identity and the funnel hashes diverge
from .text import ORACLES as _TEXT_ORACLES  # noqa: E402
ORACLES["cc_pipeline_warc"] = _TEXT_ORACLES["cc_pipeline"]


# ---------------------------------------------------------------------------
# Quarantine decode — the corrupt-file tolerance a 100 TB corpus scan
# REQUIRES: a real crawl always contains truncated/bit-rotted media, and
# an unfenced per-file decode would fail the whole Spark task, not the
# file.  Bad payloads are flagged and carried (the quarantine pattern),
# good payloads decode normally — one mapInPandas pass, never a job
# failure.
# ---------------------------------------------------------------------------

QUARANTINE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("ok", LongType()),
    StructField("mean_signal", LongType()),
])


def decode_media_quarantine(df):
    """mapInPandas decode with per-file fault isolation: ValueError
    (every decoder's fenced contract for hostile bytes) marks the row
    quarantined instead of propagating into a task failure."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                try:
                    if b[:2] == b"BM":
                        f_ = decode_bmp(b)
                    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        f_ = decode_wav(b)
                    elif b[:8] == _PNG_SIG:
                        f_ = decode_png(b)
                    else:
                        raise ValueError("unrecognized media signature")
                    rows.append({"doc_id": doc_id, "ok": 1,
                                 "mean_signal": int(
                                     f_.get("mean_luma",
                                            f_.get("mean_amplitude", 0)))})
                except (ValueError, NotImplementedError):
                    rows.append({"doc_id": doc_id, "ok": 0,
                                 "mean_signal": None})
            yield pd.DataFrame(rows)
    return df.mapInPandas(run, QUARANTINE_SCHEMA)


def multimodal_decode_quarantine(spark, sf_dir):
    """Declared query: the corrupt-corpus scan.  Every doc_id % 5 == 0
    payload is deterministically TRUNCATED to 6 bytes after synthesis
    (always invalid for BMP/WAV/PNG), then the quarantine decode runs
    the whole corpus in one pass: bad files come back (ok=0, NULL
    signal), good files decode to the same stats multimodal_decode_real
    value-checks — so the oracle verifies BOTH that no corrupt file
    kills the scan AND that quarantining never perturbs good rows."""
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(400))
    media = synthesize_media(docs)
    corrupted = media.withColumn(
        "payload",
        F.when(F.col("doc_id") % 5 == 0,
               F.expr("substring(payload, 1, 6)"))
        .otherwise(F.col("payload")))
    return (decode_media_quarantine(corrupted)
            .select("doc_id", "ok", "mean_signal")
            .orderBy("doc_id"))


QUERIES["multimodal_decode_quarantine"] = multimodal_decode_quarantine
ORACLES["multimodal_decode_quarantine"] = """
WITH docs AS (
  SELECT doc_id, doc_id % 3 AS kind, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 400
),
b AS (
  SELECT d.doc_id, d.kind, g.i, g.i // 3 AS px,
         (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+1, 1))-1)*16
       + (strpos('0123456789ABCDEF', substr(d.hx, ((g.i % d.len))*2+2, 1))-1) AS bv
  FROM docs d, generate_series(0, 191) AS g(i)
  WHERE g.i < CASE WHEN d.kind = 1 THEN 64 ELSE 192 END
),
px AS (
  SELECT doc_id, px, SUM(bv) // 3 AS luma
  FROM b WHERE kind <> 1 GROUP BY doc_id, px
),
sig AS (
  SELECT doc_id, SUM(luma) // 64 AS s FROM px GROUP BY doc_id
  UNION ALL
  SELECT doc_id, SUM(ABS((bv - 128) * 256)) // 64 FROM b
  WHERE kind = 1 GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(CASE WHEN d.doc_id % 5 = 0 THEN 0 ELSE 1 END AS BIGINT) AS ok,
  CAST(CASE WHEN d.doc_id % 5 = 0 THEN NULL ELSE s.s END AS BIGINT)
    AS mean_signal
FROM docs d JOIN sig s USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# audio resampling (decimate 2:1 + midpoint reconstruction, WAV-framed)
# ---------------------------------------------------------------------------

RESAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("in_rate", LongType()),
    StructField("out_rate", LongType()),
    StructField("n_in", LongType()),
    StructField("n_down", LongType()),
    StructField("sum_down", LongType()),
    StructField("max_err", LongType()),
])


def _pcm16(payload: bytes) -> np.ndarray:
    """data-chunk PCM16 samples of a RIFF/WAVE payload (int64)."""
    pos, data = 12, b""
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            data = payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    return np.frombuffer(data, "<i2").astype(np.int64)


def multimodal_resample(spark, sf_dir):
    """Oracle-gated audio RESAMPLING with the container in the loop:
    synthesize the corpus's WAV third (samples (byte-128)*256 at
    8 kHz), decimate 2:1 by integer pair-average (floor), re-encode the
    half-rate signal as a real 4 kHz WAV and re-parse it, then
    reconstruct to full rate by midpoint interpolation and publish the
    max reconstruction error — the downsample/upsample pair every audio
    pipeline runs before feature extraction.  All stats integer; the
    DuckDB twin recomputes both resample passes from hex digit pairs,
    so a framing bug in either WAV leg or an off-by-one in the
    decimator breaks the value hash.  Map-only plan: one mapInPandas
    stage, no shuffle.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                samples = [(seed[i % len(seed)] - 128) * 256
                           for i in range(64)]
                wav = encode_wav(samples, 8000)
                meta = decode_wav(wav)                 # real RIFF leg in
                x = _pcm16(wav)
                y = (x[0::2] + x[1::2]) // 2           # floor decimation
                wav2 = encode_wav([int(v) for v in y],
                                  meta["sample_rate"] // 2)
                meta2 = decode_wav(wav2)               # real RIFF leg out
                y2 = _pcm16(wav2)
                z = np.empty(len(x), np.int64)         # midpoint upsample
                z[0::2] = y2
                z[1::2] = (y2 + np.append(y2[1:], y2[-1])) // 2
                rows.append({
                    "doc_id": int(doc_id),
                    "in_rate": int(meta["sample_rate"]),
                    "out_rate": int(meta2["sample_rate"]),
                    "n_in": int(meta["n_samples"]),
                    "n_down": int(meta2["n_samples"]),
                    "sum_down": int(y2.sum()),
                    "max_err": int(np.abs(x - z).max())})
            yield pd.DataFrame(rows)
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 == 1).orderBy("doc_id").limit(150))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, RESAMPLE_SCHEMA).orderBy("doc_id"))


QUERIES["multimodal_resample"] = multimodal_resample
ORACLES["multimodal_resample"] = """
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS n
  FROM documents WHERE doc_id % 3 = 1 ORDER BY doc_id LIMIT 150),
samples AS (
  SELECT d.doc_id, g.i,
         ((strpos('0123456789ABCDEF',
                  substr(d.hx, (g.i % d.n)*2+1, 1))-1)*16
        + (strpos('0123456789ABCDEF',
                  substr(d.hx, (g.i % d.n)*2+2, 1))-1) - 128) * 256 AS s
  FROM docs d, generate_series(0, 63) AS g(i)),
down AS (
  SELECT doc_id, i // 2 AS j,
         CAST(FLOOR(SUM(s) / 2.0) AS BIGINT) AS d
  FROM samples GROUP BY doc_id, i // 2),
up AS (
  SELECT doc_id, j, d,
         CAST(FLOOR((d + COALESCE(LEAD(d) OVER w, d)) / 2.0) AS BIGINT)
           AS mid
  FROM down WINDOW w AS (PARTITION BY doc_id ORDER BY j)),
recon AS (
  SELECT doc_id, j * 2 AS i, d AS z FROM up
  UNION ALL
  SELECT doc_id, j * 2 + 1 AS i, mid AS z FROM up),
err AS (
  SELECT s.doc_id, MAX(ABS(s.s - r.z)) AS max_err
  FROM samples s JOIN recon r ON r.doc_id = s.doc_id AND r.i = s.i
  GROUP BY s.doc_id)
SELECT d.doc_id,
       CAST(8000 AS BIGINT) AS in_rate, CAST(4000 AS BIGINT) AS out_rate,
       CAST(64 AS BIGINT) AS n_in, CAST(32 AS BIGINT) AS n_down,
       CAST((SELECT SUM(dd.d) FROM down dd WHERE dd.doc_id = d.doc_id)
            AS BIGINT) AS sum_down,
       CAST(e.max_err AS BIGINT) AS max_err
FROM docs d JOIN err e USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# perceptual-hash image dedup (aHash + banded Hamming near-dup pairs)
# ---------------------------------------------------------------------------

PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("b0", LongType()),
    StructField("b1", LongType()),
    StructField("b2", LongType()),
    StructField("b3", LongType()),
])

#: near-dup verdict: Hamming distance over the 64 aHash bits
PHASH_HAM_MAX = 10


def multimodal_phash_dedup(spark, sf_dir):
    """Image near-dup detection — the multimodal counterpart of the
    MinHash text dedup, the pipeline every image-training corpus runs:
    each synthesized BMP decodes (REAL container leg through
    _image_pixels) to an 8x8 average-hash — bit i set iff pixel i's
    integer luma clears the image mean (cross-multiplied:
    luma_i * 64 >= sum_luma, no division) — carried as four 16-bit
    bands; candidate pairs come from an equality join on ANY shared
    band (the LSH banding trick transplanted to Hamming space: a pair
    within distance 6 has <= 6 differing bits over 4 bands, so most
    near-dups collide on at least one unchanged band); the verify step
    computes the exact 64-bit Hamming distance via bit_count(xor) and
    keeps pairs <= PHASH_HAM_MAX (10 of 64 bits, the usual aHash
    near-dup band).

    Scale shape: hashing is one Arrow-batched map; the candidate join
    keys on (band_index, band_value) — near-uniform 16-bit keys, never
    all-pairs; verification touches candidates only.  The oracle
    recomputes the hash from hex digit pairs (mapping decoded top-down
    pixel i to the synth BMP's bottom-up triple), so a flipped row, a
    wrong threshold, or a banding off-by-one breaks the value hash.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = _image_pixels(bytes(payload))
                px = np.frombuffer(rgb, np.uint8).reshape(w * h, 3)
                luma = px.astype(np.int64).sum(axis=1) // 3
                bits = (luma * 64 >= luma.sum()).astype(np.int64)
                bands = [int((bits[16 * k:16 * k + 16]
                              << np.arange(16, dtype=np.int64)).sum())
                         for k in range(4)]
                rows.append({"doc_id": int(doc_id), "b0": bands[0],
                             "b1": bands[1], "b2": bands[2],
                             "b3": bands[3]})
            yield pd.DataFrame(rows)
    def build():
        docs = (load_table(spark, sf_dir, "documents")
                .filter(F.col("doc_id") % 3 == 0)
                .orderBy("doc_id").limit(200))
        return materialized(synthesize_media(docs)
                            .select("doc_id", "payload")
                            .mapInPandas(run, PHASH_SCHEMA))
    # the hash relation feeds FOUR plan sites (two candidate sides, two
    # verify sides): memoized like the kNN edge list so the Python
    # decode+hash stage runs once, not four times
    from .cache_registry import cached, materialized
    hashes = cached("mm.phash", spark, sf_dir, build)
    bands = hashes.select(
        "doc_id", F.explode(F.expr(
            "map(0, b0, 1, b1, 2, b2, 3, b3)")).alias("k", "band"))
    cand = (bands.alias("x").join(bands.alias("y"), ["k", "band"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"))
            .distinct())
    a = hashes.select(F.col("doc_id").alias("doc_a"),
                      *(F.col(f"b{i}").alias(f"a{i}") for i in range(4)))
    b = hashes.select(F.col("doc_id").alias("doc_b"),
                      *(F.col(f"b{i}").alias(f"bb{i}") for i in range(4)))
    ham = sum(F.bit_count(F.expr(f"a{i} ^ bb{i}")) for i in range(4))
    return (cand.join(a, "doc_a").join(b, "doc_b")
            .select("doc_a", "doc_b",
                    ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= PHASH_HAM_MAX)
            .orderBy("doc_a", "doc_b").limit(500))


QUERIES["multimodal_phash_dedup"] = multimodal_phash_dedup
ORACLES["multimodal_phash_dedup"] = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS n
  FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id LIMIT 200),
-- decoded top-down pixel i = synth bottom-up pixel p = (7-i//8)*8+i%8;
-- luma = (byte(3p)+byte(3p+1)+byte(3p+2)) // 3 from seed-cycled bytes
lum AS (
  SELECT d.doc_id, g.i,
         ((strpos('0123456789ABCDEF', substr(d.hx, (((7 - g.i // 8) * 8 + g.i % 8) * 3 % d.n) * 2 + 1, 1)) - 1) * 16
        + (strpos('0123456789ABCDEF', substr(d.hx, (((7 - g.i // 8) * 8 + g.i % 8) * 3 % d.n) * 2 + 2, 1)) - 1)
        + (strpos('0123456789ABCDEF', substr(d.hx, (((7 - g.i // 8) * 8 + g.i % 8) * 3 + 1) % d.n * 2 + 1, 1)) - 1) * 16
        + (strpos('0123456789ABCDEF', substr(d.hx, (((7 - g.i // 8) * 8 + g.i % 8) * 3 + 1) % d.n * 2 + 2, 1)) - 1)
        + (strpos('0123456789ABCDEF', substr(d.hx, (((7 - g.i // 8) * 8 + g.i % 8) * 3 + 2) % d.n * 2 + 1, 1)) - 1) * 16
        + (strpos('0123456789ABCDEF', substr(d.hx, (((7 - g.i // 8) * 8 + g.i % 8) * 3 + 2) % d.n * 2 + 2, 1)) - 1)
         ) // 3 AS luma
  FROM docs d, generate_series(0, 63) AS g(i)),
tot AS (SELECT doc_id, SUM(luma) AS s FROM lum GROUP BY doc_id),
bits AS (
  SELECT l.doc_id, l.i,
         CASE WHEN l.luma * 64 >= t.s THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (doc_id)),
bands AS (
  SELECT doc_id, i // 16 AS k,
         CAST(SUM(b * (1 << (i % 16))) AS BIGINT) AS band
  FROM bits GROUP BY doc_id, i // 16),
h AS (
  SELECT doc_id,
         MAX(CASE WHEN k = 0 THEN band END) AS b0,
         MAX(CASE WHEN k = 1 THEN band END) AS b1,
         MAX(CASE WHEN k = 2 THEN band END) AS b2,
         MAX(CASE WHEN k = 3 THEN band END) AS b3
  FROM bands GROUP BY doc_id),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.k = y.k AND x.band = y.band AND x.doc_id < y.doc_id),
pairs AS (
  SELECT c.doc_a, c.doc_b,
         CAST(bit_count(CAST(xor(a.b0, b.b0) AS BIGINT))
            + bit_count(CAST(xor(a.b1, b.b1) AS BIGINT))
            + bit_count(CAST(xor(a.b2, b.b2) AS BIGINT))
            + bit_count(CAST(xor(a.b3, b.b3) AS BIGINT)) AS BIGINT)
           AS hamming
  FROM cand c JOIN h a ON a.doc_id = c.doc_a
              JOIN h b ON b.doc_id = c.doc_b)
SELECT doc_a, doc_b, hamming FROM pairs
WHERE hamming <= {PHASH_HAM_MAX}
ORDER BY doc_a, doc_b LIMIT 500
"""


# ---------------------------------------------------------------------------
# inline data-URI extraction (crawl HTML -> embedded image payloads)
# ---------------------------------------------------------------------------

#: the crawl-pipeline regex for inline images (RFC 2397 data URIs)
DATA_URI_RE = r'data:([a-z+/-]+);base64,([A-Za-z0-9+/=]+)'


def multimodal_data_uri(spark, sf_dir):
    """Inline-image extraction — the crawl-pipeline step that pulls
    data-URI payloads (RFC 2397) out of HTML before media processing:
    per doc a synthetic HTML line embeds the doc's leading 24 utf-8
    bytes as an ``<img src="data:image/bmp;base64,...">`` attribute;
    the extractor regexp-captures mime + base64 body and decodes it —
    ENTIRELY JVM-side (regexp_extract + unbase64, zero Python) — and
    publishes the payload digest next to an INDEPENDENTLY computed
    digest of the source byte slice, so both base64 legs and the regex
    capture are value-gated cross-engine (the identity-transport
    property, cc_pipeline's oracle shape).

    Scale shape: pure map over the corpus — one scan, no shuffle
    before the presentation sort; at 100 TB this is exactly the
    scan-side extraction a curation funnel fuses with its other gates.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit('<p>pre</p><img alt="x" src="'),
        F.lit("data:image/bmp;base64,"),
        F.base64(F.encode(F.substring("text", 1, 24), "utf-8")),
        F.lit('"/><p>post</p>'))
    ex = d.select(
        "doc_id",
        F.regexp_extract(html, DATA_URI_RE, 1).alias("mime"),
        F.unbase64(F.regexp_extract(html, DATA_URI_RE, 2)).alias("payload"),
        F.encode(F.substring("text", 1, 24), "utf-8").alias("src"))
    return (ex.select(
        "doc_id", "mime",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"),
        F.md5(F.hex("src")).alias("src_md5"))
        .orderBy("doc_id").limit(300))


QUERIES["multimodal_data_uri"] = multimodal_data_uri
ORACLES["multimodal_data_uri"] = r"""
WITH d AS (SELECT doc_id, text FROM documents),
h AS (
  SELECT doc_id,
         '<p>pre</p><img alt="x" src="data:image/bmp;base64,'
         || to_base64(encode(substring(text, 1, 24)))
         || '"/><p>post</p>' AS html,
         encode(substring(text, 1, 24)) AS src
  FROM d),
ex AS (
  SELECT doc_id,
         regexp_extract(html, 'data:([a-z+/-]+);base64,([A-Za-z0-9+/=]+)', 1)
           AS mime,
         from_base64(regexp_extract(html,
           'data:([a-z+/-]+);base64,([A-Za-z0-9+/=]+)', 2)) AS payload,
         src
  FROM h)
SELECT doc_id, mime,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       md5(hex(payload)) AS payload_md5,
       md5(hex(src)) AS src_md5
FROM ex ORDER BY doc_id LIMIT 300
"""


# ---------------------------------------------------------------------------
# EXIF metadata: extract + scrub (the privacy pass an image corpus runs)
# ---------------------------------------------------------------------------

def build_exif_app1(orientation: int, datetime_str: str,
                    gps: bool = False) -> bytes:
    """A complete JPEG APP1 Exif segment (marker + length + "Exif\\0\\0"
    + a little-endian TIFF structure): IFD0 with Orientation (0x0112
    SHORT) and DateTime (0x0132 ASCII, the spec's fixed 20 bytes), plus
    an optional GPS IFD pointer (0x8825) carrying GPSVersionID — enough
    structure that a scrubber must actually walk the IFD to know the
    payload is location-bearing."""
    dt = datetime_str.encode("ascii")
    if len(dt) != 19:
        raise ValueError("EXIF DateTime must be 'YYYY:MM:DD HH:MM:SS'")
    dt += b"\x00"
    n = 3 if gps else 2
    data_off = 8 + 2 + 12 * n + 4            # IFD0 ends, value area starts
    entries = [
        struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH",
                                                        orientation, 0),
        struct.pack("<HHII", 0x0132, 2, 20, data_off),
    ]
    if gps:
        gps_off = data_off + 20
        entries.append(struct.pack("<HHII", 0x8825, 4, 1, gps_off))
    ifd0 = struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
    body = b"II" + struct.pack("<HI", 42, 8) + ifd0 + dt
    if gps:
        gps_ifd = (struct.pack("<H", 1)
                   + struct.pack("<HHI", 0x0000, 1, 4) + b"\x02\x03\x00\x00"
                   + struct.pack("<I", 0))
        body += gps_ifd
    payload = b"Exif\x00\x00" + body
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def _jpeg_segments(data: bytes):
    """Yield (marker, start, end) for each segment up to and including
    SOS; everything from SOS onward is entropy-coded payload."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[i + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            yield marker, i, i + 2
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        yield marker, i, i + 2 + seg_len
        if marker == 0xDA:                   # SOS: entropy data follows
            return
        i += 2 + seg_len


def parse_exif(data: bytes) -> dict | None:
    """Extract Orientation / DateTime / GPS-presence from a JPEG's APP1
    Exif segment, or None when the image carries none (e.g. after
    :func:`scrub_exif`)."""
    for marker, s, e in _jpeg_segments(data):
        if marker != 0xE1 or data[s + 4:s + 10] != b"Exif\x00\x00":
            continue
        t = data[s + 10:e]
        endian = {"II": "<", "MM": ">"}.get(t[:2].decode("latin-1"))
        if endian is None:
            raise ValueError("bad EXIF TIFF endianness")
        magic, ifd_off = struct.unpack(endian + "HI", t[2:8])
        if magic != 42:
            raise ValueError("bad EXIF TIFF magic")
        n = struct.unpack_from(endian + "H", t, ifd_off)[0]
        out = {"orientation": None, "datetime": None, "has_gps": False}
        for k in range(n):
            tag, vtype, count = struct.unpack_from(
                endian + "HHI", t, ifd_off + 2 + 12 * k)
            raw = t[ifd_off + 10 + 12 * k: ifd_off + 14 + 12 * k]
            if tag == 0x0112 and vtype == 3:
                out["orientation"] = struct.unpack(endian + "HH", raw)[0]
            elif tag == 0x0132 and vtype == 2:
                off = struct.unpack(endian + "I", raw)[0]
                out["datetime"] = (t[off:off + count].rstrip(b"\x00")
                                   .decode("ascii", "replace"))
            elif tag == 0x8825:
                out["has_gps"] = True
        return out
    return None


def scrub_exif(data: bytes) -> bytes:
    """Strip every APP1 Exif segment (the privacy scrub a training-data
    image pipeline runs before publication); all other segments and the
    entropy-coded payload pass through byte-identical."""
    out = bytearray(data[:2])
    last = 2
    for marker, s, e in _jpeg_segments(data):
        out += data[last:s]
        if not (marker == 0xE1
                and data[s + 4:s + 10] == b"Exif\x00\x00"):
            out += data[s:e]
        last = e
    out += data[last:]
    return bytes(out)


#: the two deterministic APP1 sizes the audit's oracle predicts
_EXIF_LEN_PLAIN = len(build_exif_app1(1, "2024:01:01 00:00:00", False))
_EXIF_LEN_GPS = len(build_exif_app1(1, "2024:01:01 00:00:00", True))

_EXIF_ROW_SCHEMA = StructType([
    StructField("orientation", LongType()),
    StructField("has_gps", LongType()),
    StructField("bytes_removed", LongType()),
    StructField("clean", LongType()),
])


def multimodal_exif_audit(spark, sf_dir):
    """Oracle-gated EXIF privacy pass over real JPEG bytes: per doc,
    render a solid-gray 8x8 baseline JPEG, inject an APP1 Exif segment
    (orientation 1 + doc_id%8, a doc_id-derived DateTime, GPS IFD iff
    doc_id%2==0), then PARSE it back and SCRUB it — reporting, per
    orientation, the doc count, location-bearing count, exact bytes the
    scrub removed, and how many scrubbed files parse as EXIF-free.
    Every output is a deterministic integer function of doc_id, so the
    DuckDB twin predicts the whole report arithmetically — a parser or
    scrubber that mis-walks a single segment breaks the value hash.

    Plan: ONE Arrow-batched Python stage over a 150-doc slice + one
    hash aggregate; zero joins."""
    from .jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = (37 * d + 53) % 256
                base = encode_jpeg(bytes([g] * (3 * 64)), 8, 8)
                dt = ("2024:01:%02d 00:00:%02d"
                      % (1 + d % 28, d % 60))
                gps = d % 2 == 0
                app1 = build_exif_app1(1 + d % 8, dt, gps)
                tagged = base[:2] + app1 + base[2:]
                meta = parse_exif(tagged)
                scrubbed = scrub_exif(tagged)
                ok_dt = meta["datetime"] == dt
                rows.append({
                    "orientation": int(meta["orientation"]) if ok_dt else -1,
                    "has_gps": int(meta["has_gps"]),
                    "bytes_removed": len(tagged) - len(scrubbed),
                    "clean": int(parse_exif(scrubbed) is None
                                 and scrubbed == base)})
            yield pd.DataFrame(rows)

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 == 2).orderBy("doc_id").limit(150))
    per_doc = docs.select("doc_id").mapInPandas(run, _EXIF_ROW_SCHEMA)
    return (per_doc.groupBy("orientation")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("has_gps").cast("long").alias("n_gps"),
                 F.sum("bytes_removed").cast("long").alias("bytes_removed"),
                 F.sum("clean").cast("long").alias("n_clean"))
            .orderBy("orientation"))


QUERIES["multimodal_exif_audit"] = multimodal_exif_audit
ORACLES["multimodal_exif_audit"] = f"""
WITH sel AS (
  SELECT doc_id FROM documents WHERE doc_id % 3 = 2
  ORDER BY doc_id LIMIT 150),
pred AS (
  SELECT CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS has_gps,
         CAST(CASE WHEN doc_id % 2 = 0 THEN {_EXIF_LEN_GPS}
                   ELSE {_EXIF_LEN_PLAIN} END AS BIGINT) AS bytes_removed
  FROM sel)
SELECT orientation, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(has_gps) AS BIGINT) AS n_gps,
       CAST(SUM(bytes_removed) AS BIGINT) AS bytes_removed,
       CAST(COUNT(*) AS BIGINT) AS n_clean
FROM pred GROUP BY orientation ORDER BY orientation
"""


BMP_RT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_px", LongType()),
    StructField("sum_b", LongType()),
    StructField("sum_g", LongType()),
    StructField("sum_r", LongType()),
    StructField("lossless", LongType()),
])

#: deliberately NOT a multiple of 4: 15*3 = 45 bytes/row forces 3 pad
#: bytes per row — the 4-byte row alignment is where BMP readers break.
BMP_RT_W, BMP_RT_H = 15, 17


def multimodal_bmp_roundtrip(spark, sf_dir):
    """BMP encode -> decode over synthesized 15x17 BGR images (pixel
    bytes = text bytes cycled, the QOI/g711 recipe), value-gated on the
    DECODED raster: per-channel sums must equal the source sums (BI_RGB
    is uncompressed) and ``lossless`` asserts exact byte equality.  The
    15-pixel width makes every row carry 3 alignment pad bytes, so any
    off-by-one in the 4-byte row padding (the classic BMP reader bug —
    reference file-format handling: exporter/fileexporter marshals
    whole payloads, never rasters, so this is engine-added multimodal
    surface) shears the raster and flips a channel sum.  The DuckDB
    twin re-derives the source sums from the same cycled-byte recipe
    (buffer channel of byte j is j % 3 = B,G,R).

    Map-only plan: one mapInPandas stage, images independent per row —
    at 100 TB this is embarrassingly parallel with zero shuffle.
    """
    n_bytes = 3 * BMP_RT_W * BMP_RT_H

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = (text or "").encode("utf-8") or b"\x00"
                raw = (seed * (n_bytes // len(seed) + 1))[:n_bytes]
                bmp = encode_bmp(raw, BMP_RT_W, BMP_RT_H)
                w, h, px = _bmp_raster(bmp)
                src = np.frombuffer(raw, np.uint8).reshape(
                    BMP_RT_H, BMP_RT_W, 3)
                d = px.astype(np.int64)
                rows.append({
                    "doc_id": doc_id, "n_px": BMP_RT_W * BMP_RT_H,
                    "sum_b": int(d[:, :, 0].sum()),
                    "sum_g": int(d[:, :, 1].sum()),
                    "sum_r": int(d[:, :, 2].sum()),
                    "lossless": int(w == BMP_RT_W and abs(h) == BMP_RT_H
                                    and (px == src).all())})
            yield pd.DataFrame(rows)

    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(300))
    return (docs.select("doc_id", "text")
                .mapInPandas(run, BMP_RT_SCHEMA).orderBy("doc_id"))


QUERIES["multimodal_bmp_roundtrip"] = multimodal_bmp_roundtrip
# Source-channel sums re-derived from the cycled-byte recipe; channel
# of byte j is j % 3 (B, G, R).  lossless == 1 is part of the contract.
ORACLES["multimodal_bmp_roundtrip"] = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         greatest(octet_length(encode(coalesce(text, ''))), 1) AS len
  FROM documents ORDER BY doc_id LIMIT 300
),
bytes AS (
  SELECT d.doc_id, g.j % 3 AS chan,
         (strpos('0123456789ABCDEF',
                 substr(d.hx, ((g.j % d.len)) * 2 + 1, 1)) - 1) * 16
         + (strpos('0123456789ABCDEF',
                   substr(d.hx, ((g.j % d.len)) * 2 + 2, 1)) - 1) AS bv
  FROM docs d, generate_series(0, {3 * BMP_RT_W * BMP_RT_H - 1}) AS g(j)
)
SELECT doc_id, CAST({BMP_RT_W * BMP_RT_H} AS BIGINT) AS n_px,
       CAST(SUM(CASE WHEN chan = 0 THEN bv ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(SUM(CASE WHEN chan = 1 THEN bv ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN chan = 2 THEN bv ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(1 AS BIGINT) AS lossless
FROM bytes GROUP BY doc_id ORDER BY doc_id
"""
