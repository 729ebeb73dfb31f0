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


def _check_compression(compression: str | None) -> str | None:
    """Validate the IPC payload compression codec — the reference
    negotiates zstd over the Arrow stream (otel-arrow exporter
    ``compression: zstd`` / Arrow IPC body-buffer compression); pyarrow
    supports ``zstd`` and ``lz4`` and the reader auto-detects.

    Returns the validated name; the actual ``IpcWriteOptions`` must be
    constructed INSIDE the executor closure (it is not picklable)."""
    if compression is not None and compression not in ("zstd", "lz4"):
        raise ValueError(
            f"IPC compression must be 'zstd' or 'lz4', got {compression!r}")
    return compression


def encode_ipc(df: DataFrame, headers: dict | None = None,
               compression: str | None = None) -> DataFrame:
    """DataFrame -> one row per Arrow record batch: (payload, n_rows,
    n_bytes, headers).  The payload is a self-contained IPC stream,
    optionally zstd/lz4-compressed (body buffers; the decoder is
    format-agnostic).

    ``headers`` (per-request gRPC metadata, BatchArrowRecords.headers) is
    hpack-encoded with one stateful encoder per partition — the partition
    plays the reference's per-stream role, so the first frame carries the
    literal-with-indexing block and subsequent frames the 1-byte indexed
    form (exporter side of arrow.go:85-131's headerReceiver contract)."""
    items = sorted((headers or {}).items())
    comp = _check_compression(compression)

    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        hp = HpackEncoder()
        opts = pa.ipc.IpcWriteOptions(compression=comp)
        for b in batches:
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, b.schema, options=opts) as w:
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


# ---------------------------------------------------------------------------
# stateful stream mode: cross-batch delta dictionaries
# (exporter/otlpexporter/internal/arrow/stream.go per-stream producer state;
# the reference re-sends only dictionary DELTAS after the first batch)
# ---------------------------------------------------------------------------

STREAM_DDL = ("payload binary, frame_seq bigint, n_rows bigint, "
              "n_bytes bigint, headers binary")


def encode_ipc_stream(df: DataFrame, dict_cols: tuple = (),
                      headers: dict | None = None,
                      compression: str | None = None) -> DataFrame:
    """DataFrame -> per-partition Arrow IPC *stream* frames with stateful
    dictionaries: every partition writes ONE logical stream (schema once,
    then per-batch frames), and `dict_cols` are dictionary-encoded against
    a dictionary that only ever grows, so pyarrow's
    ``emit_dictionary_deltas`` sends just the new values after frame 0.

    Frames must be replayed to the decoder in partition order without
    reshuffling — the same contract as a gRPC stream.  A zero-row trailer
    frame carries the stream's EOS marker."""
    import io

    items = sorted((headers or {}).items())
    cols = tuple(dict_cols)
    comp = _check_compression(compression)

    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        hp = HpackEncoder()
        sink = io.BytesIO()
        writer = None
        last = 0
        seq = 0
        vocab: dict = {c: {} for c in cols}

        def frame(payload: bytes, n_rows: int) -> pa.RecordBatch:
            nonlocal seq
            b = pa.RecordBatch.from_pydict({
                "payload": [payload], "frame_seq": [seq],
                "n_rows": [n_rows], "n_bytes": [len(payload)],
                "headers": [hp.encode(items) if items else b""]})
            seq += 1
            return b

        for b in batches:
            arrays, fields = [], []
            for i, name in enumerate(b.schema.names):
                col = b.column(i)
                if name in vocab:
                    m = vocab[name]
                    vals = col.to_pylist()
                    for v in vals:
                        if v is not None and v not in m:
                            m[v] = len(m)
                    idx = pa.array(
                        [None if v is None else m[v] for v in vals],
                        pa.int32())
                    col = pa.DictionaryArray.from_arrays(
                        idx, pa.array(list(m), col.type))
                arrays.append(col)
                fields.append(pa.field(name, col.type))
            nb = pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))
            if writer is None:
                writer = pa.ipc.new_stream(
                    sink, nb.schema,
                    options=pa.ipc.IpcWriteOptions(
                        compression=comp, emit_dictionary_deltas=True))
            writer.write_batch(nb)
            pos = sink.tell()
            yield frame(bytes(sink.getbuffer()[last:pos]), nb.num_rows)
            last = pos
        if writer is not None:
            writer.close()                    # EOS marker -> trailer frame
            pos = sink.tell()
            if pos > last:
                yield frame(bytes(sink.getbuffer()[last:pos]), 0)

    return df.mapInArrow(enc, STREAM_DDL)


def decode_ipc_stream(encoded: DataFrame, schema_ddl: str) -> DataFrame:
    """Reassemble per-partition stream frames (receiver side of the
    stateful-dictionary contract, arrow.go:361-433's per-stream consumer):
    frames concatenate into one IPC stream, dictionary columns decode back
    to plain values."""
    def dec(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        chunks: list[bytes] = []
        for b in batches:
            chunks.extend(b.column("payload").to_pylist())
        if not chunks:
            return
        with pa.ipc.open_stream(pa.BufferReader(b"".join(chunks))) as r:
            for batch in r:
                arrays = [c.dictionary_decode()
                          if pa.types.is_dictionary(c.type) else c
                          for c in batch.columns]
                yield pa.RecordBatch.from_arrays(
                    arrays, names=batch.schema.names)
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
