"""OTel-Arrow stream protocol — BatchArrowRecords / BatchStatus codec
and the per-stream decode state the live gRPC receiver uses.

The fork's signature RPC (receiver/otlpreceiver/internal/arrow/arrow.go
:251-263): four bidi-streaming services (``ArrowStreamService/
ArrowStream`` mixed-signal plus per-signal ``ArrowTracesService/
ArrowTraces`` etc.) carrying ``BatchArrowRecords`` requests — a batch id,
a set of Arrow-IPC payloads, optional hpack-encoded per-batch headers —
acknowledged one ``BatchStatus`` per batch on the reverse direction
(arrow.go:326-349: OK / INVALID_ARGUMENT for data errors / UNAVAILABLE
for consumer errors).

Wire schemas are the public otel-arrow experimental arrow/v1 protos
(BatchArrowRecords{batch_id=1, arrow_payloads=2, headers=3};
ArrowPayload{schema_id=1, type=2, record=3}; BatchStatus{batch_id=1,
status_code=2, status_message=3}; main payload types METRICS=10,
LOGS=30, SPANS=40), re-encoded with this repo's dependency-free proto3
wire helpers.

IPC payload decode is STATEFUL per (stream, schema_id), matching the
reference's per-stream consumer state (arrow.go:272 ``newConsumer``):
the first record for a schema id carries the Arrow schema, later
records continue the same logical IPC stream (delta dictionaries
included).  ``ArrowStreamState`` accumulates each schema id's stream
bytes and yields only the batches not yet consumed.
"""

from __future__ import annotations

import io

from .hpack import HpackDecoder
from .otlp_pb import (_dec_varint, _f_bytes, _f_msg, _f_str, _f_varint,
                      _fields, _u64)

#: ArrowPayloadType main-signal values (public otel-arrow proto).
PAYLOAD_METRICS = 10
PAYLOAD_LOGS = 30
PAYLOAD_SPANS = 40

PAYLOAD_SIGNAL = {PAYLOAD_SPANS: "traces", PAYLOAD_LOGS: "logs",
                  PAYLOAD_METRICS: "metrics"}

#: BatchStatus.status_code values used by the reference stream loop
#: (arrow.go:336-346, gRPC-aligned numbering).
STATUS_OK = 0
STATUS_INVALID_ARGUMENT = 3
STATUS_UNAVAILABLE = 14


def encode_batch(batch_id: int, payloads: list[tuple[str, int, bytes]],
                 headers: bytes = b"") -> bytes:
    """(schema_id, payload_type, record_bytes) list -> BatchArrowRecords."""
    out = _f_varint(1, batch_id, keep_zero=True)
    for schema_id, ptype, record in payloads:
        body = (_f_str(1, schema_id) + _f_varint(2, ptype)
                + _f_bytes(3, record))
        out += _f_msg(2, body)
    if headers:
        out += _f_bytes(3, headers)
    return out


def decode_batch(buf: bytes) -> dict:
    """BatchArrowRecords -> {batch_id, payloads: [(schema_id, type,
    record)], headers}."""
    batch_id, payloads, headers = 0, [], b""
    for field, wt, val in _fields(buf):
        if field == 1:
            batch_id = val
        elif field == 2:
            sid, ptype, record = "", 0, b""
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    sid = v2.decode("utf-8")
                elif f2 == 2:
                    ptype = v2
                elif f2 == 3:
                    record = v2
            payloads.append((sid, ptype, record))
        elif field == 3:
            headers = val
    return {"batch_id": batch_id, "payloads": payloads, "headers": headers}


def encode_status(batch_id: int, status_code: int,
                  message: str = "") -> bytes:
    out = _f_varint(1, batch_id, keep_zero=True)
    out += _f_varint(2, status_code, keep_zero=status_code == 0)
    if message:
        out += _f_str(3, message)
    return out


def decode_status(buf: bytes) -> dict:
    batch_id = code = 0
    msg = ""
    for field, _wt, val in _fields(buf):
        if field == 1:
            batch_id = val
        elif field == 2:
            code = val
        elif field == 3:
            msg = val.decode("utf-8")
    return {"batch_id": batch_id, "status_code": code,
            "status_message": msg}


class StreamBudgetExceeded(ValueError):
    """The stream's pending (fed-but-not-yet-decoded) bytes outgrew the
    budget — a resource condition, not a data error.  The server acks it
    UNAVAILABLE so a SendAndWait exporter retries on a fresh stream
    (the reference maps consumer resource conditions to UNAVAILABLE and
    recycles streams via max_stream_lifetime, arrow.go:342)."""


class _GrowBuffer:
    """Append-only byte source for a persistent IPC stream reader:
    ``feed`` appends, ``read`` pops from the front.  ``consume`` only
    asks the reader for messages whose bytes are already fed, so a read
    is never short."""

    def __init__(self):
        self._buf = bytearray()
        self._pos = 0                      # cumulative bytes handed out

    def feed(self, b: bytes) -> None:
        self._buf += b

    def __len__(self) -> int:
        return len(self._buf)

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = len(self._buf)
        out = bytes(self._buf[:n])
        del self._buf[:n]
        self._pos += len(out)
        return out

    def tell(self) -> int:
        return self._pos

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def close(self) -> None:
        pass

    closed = False


class ArrowStreamState:
    """Per-stream consumer state: one logical Arrow IPC stream per
    schema id, grown record-by-record; yields newly-complete batches.

    Each schema id keeps ONE persistent ``RecordBatchStreamReader`` over
    a front-drained buffer, so a stream of N batches costs O(N) decode
    work and the retained memory is only the not-yet-decoded tail
    (normally zero — fragments are message-aligned and fully drained).
    ``max_stream_bytes`` caps that pending tail; exceeding it is a
    resource condition (:class:`StreamBudgetExceeded`), distinct from
    data errors, mirroring the reference's stream-recycling behavior
    (max_stream_lifetime) rather than poisoning the data.
    """

    def __init__(self, max_stream_bytes: int = 64 * 1024 * 1024):
        self.max_stream_bytes = max_stream_bytes
        self._bufs: dict[str, _GrowBuffer] = {}
        self._readers: dict[str, object] = {}
        self._consumed: dict[str, int] = {}
        self.hpack = HpackDecoder()

    def consume(self, schema_id: str, record: bytes):
        """Append one ArrowPayload.record; return the new pyarrow record
        batches (possibly empty if the fragment was a pure schema or
        dictionary message).

        Each fragment must contain a WHOLE number of IPC messages (the
        producer writes messages atomically; a fragment with bad or
        truncated framing is a data error -> ValueError, which the
        server maps to BatchStatus INVALID_ARGUMENT, arrow.go:342)."""
        import pyarrow as pa

        n_new = 0
        try:                           # framing validation, message-wise
            rd = pa.ipc.MessageReader.open_stream(io.BytesIO(record))
            while True:
                if rd.read_next_message().type == "record batch":
                    n_new += 1
        except StopIteration:
            pass
        except Exception as e:
            raise ValueError(f"bad Arrow IPC framing: {e}") from e
        src = self._bufs.setdefault(schema_id, _GrowBuffer())
        src.feed(record)
        if len(src) > self.max_stream_bytes:
            raise StreamBudgetExceeded(
                "arrow stream exceeds per-stream pending-byte budget")
        batches = []
        try:
            reader = self._readers.get(schema_id)
            if reader is None:         # first fragment: schema message
                reader = pa.ipc.open_stream(src)
                self._readers[schema_id] = reader
            for _ in range(n_new):     # dict/schema msgs drain implicitly
                batches.append(reader.read_next_batch())
        except Exception as e:         # message-aligned, so this is corrupt
            raise ValueError(f"corrupt Arrow IPC stream: {e}") from e
        self._consumed[schema_id] = \
            self._consumed.get(schema_id, 0) + len(batches)
        return batches

    def headers(self, headers_bytes: bytes) -> list[tuple[str, str]]:
        """Per-batch metadata: hpack-encoded header block (the reference
        carries call metadata per batch once the stream is up,
        arrow.go:304 combineHeaders)."""
        if not headers_bytes:
            return []
        return list(self.hpack.decode(headers_bytes))
