"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas``.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic fake (``_fake_decode``) behind the real Spark
plumbing — schema, partitioning, UDF signature and batch shape are genuine
and tested.  Swap ``_fake_decode`` for PIL/librosa/pyav in production; the
plan shape does not change.

The synthetic corpus has no binary table; ``documents.text`` is encoded to
UTF-8 bytes as the stand-in payload (the plumbing is payload-agnostic).

Scale stance: mapInPandas streams Arrow batches — no row-at-a-time Python;
binary payloads never pass through a shuffle (decode is a map stage before
any wide op); feature outputs are small fixed-width columns.
"""

from __future__ import annotations

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
