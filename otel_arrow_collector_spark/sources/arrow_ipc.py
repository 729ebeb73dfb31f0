"""Arrow IPC transport codec — the fork's signature wire format
(exporter/otlpexporter/internal/arrow/stream.go:464-491 encodes pdata ->
BatchArrowRecords; receiver/otlpreceiver/internal/arrow/arrow.go:361-433
decodes) re-expressed as ``mapInArrow`` over the engine's columnar batches.

Spark's in-memory format already round-trips through Arrow at the Python
boundary, so encode/decode are zero-copy-ish per batch: each task
serializes its record batches to Arrow IPC *stream* bytes (schema +
dictionaries + batch — self-contained, like one BatchArrowRecords message)
and decode reverses it.  Cross-batch stateful dictionary deltas
(the reference's per-stream producer state) are deliberately NOT
reproduced: Spark tasks are stateless between batches by design; IPC-stream
framing carries dictionaries per payload instead, trading some wire bytes
for scale-out statelessness (documented divergence).

Batch framing metadata mirrors netstats accounting
(internal/netstats/netstats.go:48-72): each payload row carries its row
count and byte size, so compression/throughput telemetry is a trivial
aggregation over the encoded stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from .hpack import HpackDecoder, HpackEncoder

ENCODED_DDL = ("payload binary, n_rows bigint, n_bytes bigint, "
               "headers binary")


def encode_ipc(df: DataFrame, headers: dict | None = None) -> DataFrame:
    """DataFrame -> one row per Arrow record batch: (payload, n_rows,
    n_bytes, headers).  The payload is a self-contained IPC stream.

    ``headers`` (per-request gRPC metadata, BatchArrowRecords.headers) is
    hpack-encoded with one stateful encoder per partition — the partition
    plays the reference's per-stream role, so the first frame carries the
    literal-with-indexing block and subsequent frames the 1-byte indexed
    form (exporter side of arrow.go:85-131's headerReceiver contract)."""
    items = sorted((headers or {}).items())

    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        hp = HpackEncoder()
        for b in batches:
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, b.schema) as w:
                w.write_batch(b)
            buf = sink.getvalue()
            yield pa.RecordBatch.from_pydict({
                "payload": [buf.to_pybytes()],
                "n_rows": [b.num_rows],
                "n_bytes": [buf.size],
                "headers": [hp.encode(items) if items else b""],
            })
    return df.mapInArrow(enc, ENCODED_DDL)


def frame_headers(encoded: DataFrame) -> DataFrame:
    """Decode each frame's hpack header block -> (n_rows, headers map).

    One stateful HpackDecoder per partition, mirroring the reference's
    one-decoder-per-stream rule (arrow.go:131): indexed fields in later
    frames resolve against the dynamic table built by earlier ones."""
    def dec(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        hp = HpackDecoder()
        for b in batches:
            rows = b.column("n_rows").to_pylist()
            hdrs = [dict(hp.decode(h)) if h else {}
                    for h in b.column("headers").to_pylist()]
            yield pa.RecordBatch.from_pydict(
                {"n_rows": rows, "headers": hdrs},
                schema=pa.schema([
                    ("n_rows", pa.int64()),
                    ("headers", pa.map_(pa.string(), pa.string()))]))
    return encoded.mapInArrow(dec, "n_rows bigint, headers map<string,string>")


def decode_ipc(encoded: DataFrame, schema_ddl: str) -> DataFrame:
    """(payload, ...) rows -> original rows.  ``schema_ddl`` must match the
    encoded schema (the receiver knows its signal schema, arrow.go:368-430
    payload-type switch)."""
    def dec(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for payload in b.column("payload").to_pylist():
                with pa.ipc.open_stream(pa.BufferReader(payload)) as r:
                    yield from r
    return encoded.mapInArrow(dec, schema_ddl)


def roundtrip_ipc(df: DataFrame) -> DataFrame:
    """encode |> decode — wire-format identity (codec conformance)."""
    return decode_ipc(encode_ipc(df), df._jdf.schema().toDDL())


def wire_stats(encoded: DataFrame) -> dict:
    """netstats-style accounting: batches / rows / wire bytes."""
    from pyspark.sql import functions as F
    row = encoded.agg(
        F.count(F.lit(1)).alias("batches"),
        F.sum("n_rows").alias("rows"),
        F.sum("n_bytes").alias("wire_bytes")).first()
    return {"batches": row.batches, "rows": row.rows,
            "wire_bytes": row.wire_bytes}
