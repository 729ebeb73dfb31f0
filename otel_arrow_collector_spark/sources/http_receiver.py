"""Live OTLP/HTTP ingest — the reference's HTTP front door
(receiver/otlpreceiver/otlp.go:93-110 startHTTPServer, :231-305 the
/v1/{traces,logs,metrics} handlers), re-expressed as a stdlib
``http.server`` endpoint that SPOOLS requests to files for Spark.

Design (the Spark-native split): the HTTP server is an edge concern —
tiny, stateless, horizontally scalable — so it does NOT hold telemetry
in memory for Spark to poll.  Each accepted request body is written
atomically into a spool directory; the engine ingests the spool with the
existing file-level codecs (``read_otlp_json`` / ``read_otlp_pb``) in
batch, or as a Structured Streaming file source for continuous ingest
(new-file discovery is Spark's native streaming contract).  At 100 TB a
fleet of these receivers writes to shared object storage and ONE Spark
job consumes every spool — receiver count and executor count scale
independently.

Faithful HTTP semantics (otlp.go + config.go):
- content types: ``application/json`` and ``application/x-protobuf``
  (415 otherwise, like the reference's fallback handler)
- ``Content-Encoding``: gzip/zstd/zlib/deflate accepted (capped), others 400
- success: 200 with an empty partial-success body in the request's
  content type
- malformed payload: 400 (the reference decodes before acking)
- auth: optional bearer token -> 401/403 (the configauth server path,
  receiver/otlpreceiver/internal/arrow/arrow.go:87-216 analogue)
- backpressure: spool occupancy cap -> 503 + Retry-After (the
  memory-limiter refusal contract: reject, never drop accepted data)

Durability: a request is acked ONLY after its spool file is fsync'd and
atomically renamed into place — the ack-after-persist rule the
reference's persistent queue follows (persistent_storage.go:278-345).
"""

from __future__ import annotations

import gzip
import itertools
import zlib
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_SIGNALS = ("traces", "logs", "metrics")

#: URL path -> signal (otlp.go registers exactly these three).
_ROUTES = {f"/v1/{s}": s for s in _SIGNALS}


def _inflate_capped(data: bytes, cap: int, wbits: int,
                    chunk: int = 1 << 20) -> bytes:
    """Inflate zlib-family `data`, rejecting as soon as output exceeds
    `cap`.

    confighttp caps bytes read from the *decompressed* stream incrementally
    (config/confighttp compression.go wraps the body in a limited reader);
    a one-shot decompress() would materialize an arbitrarily large
    bomb before any size check runs. wbits=47 accepts gzip and zlib
    framing (stdlib gzip tolerance); wbits=15 is plain zlib — the
    reference's "deflate" decoder is zlib.NewReader, i.e. zlib-framed
    (compression.go:113-119).
    """
    d = zlib.decompressobj(wbits=wbits)
    out: list[bytes] = []
    total = 0
    buf = data
    while True:
        piece = d.decompress(buf, chunk)
        total += len(piece)
        if total > cap:
            raise ValueError("decompressed body exceeds limit")
        out.append(piece)
        buf = d.unconsumed_tail
        if d.eof:
            break
        if not buf and not piece:
            raise ValueError("truncated compressed body")
    return b"".join(out)


def _gunzip_capped(data: bytes, cap: int) -> bytes:
    return _inflate_capped(data, cap, wbits=47)


def _zstd_capped(data: bytes, cap: int) -> bytes:
    """Decompress one zstd frame with the size cap enforced BEFORE any
    oversized allocation.  Two shapes arrive in practice:

    - one-shot encoders write the RFC 8878 Frame_Content_Size field —
      parse it first (clean-room; magic + FHD flags -> FCS width/
      offset), refuse over-cap claims pre-allocation, then decode with
      pyarrow at that exact size;
    - the reference's own HTTP/gRPC clients compress with a STREAMING
      ``zstd.NewWriter`` (confighttp/compressor.go:31), which emits
      frames WITHOUT the content-size field — those are decompressed
      incrementally through pyarrow's CompressedInputStream with the
      cap enforced per 64 KiB chunk (mirror of ``_inflate_capped``),
      so a zstd bomb still dies at the cap, never at allocation."""
    if len(data) < 6 or data[:4] != b"\x28\xb5\x2f\xfd":
        raise ValueError("not a zstd frame")
    fhd = data[4]
    if fhd & 0x08:
        raise ValueError("reserved bit set in zstd frame header")
    single_segment = (fhd >> 5) & 1
    fcs_flag = fhd >> 6
    did_size = (0, 1, 2, 4)[fhd & 0x03]
    pos = 5 + (0 if single_segment else 1) + did_size
    import pyarrow as pa
    if fcs_flag == 0 and not single_segment:
        # Sizeless streaming-mode frame: bounded incremental decode.
        out = bytearray()
        rd = pa.CompressedInputStream(pa.BufferReader(data), "zstd")
        while True:
            chunk = rd.read(65536)
            if not chunk:
                return bytes(out)
            out += chunk
            if len(out) > cap:
                raise ValueError("decompressed body exceeds limit")
    if fcs_flag == 0:
        size = data[pos]
    elif fcs_flag == 1:
        size = int.from_bytes(data[pos:pos + 2], "little") + 256
    elif fcs_flag == 2:
        size = int.from_bytes(data[pos:pos + 4], "little")
    else:
        size = int.from_bytes(data[pos:pos + 8], "little")
    if size > cap:
        raise ValueError("decompressed body exceeds limit")
    return bytes(pa.Codec("zstd").decompress(data, size))


#: Content-Encoding -> capped decoder — the reference decompressor's
#: decoder map (confighttp/compression.go:83-123: "" none, gzip, zstd,
#: zlib, deflate=zlib); anything else is 400 "unsupported".
_BODY_DECODERS = {
    "gzip": _gunzip_capped,
    "zstd": _zstd_capped,
    "zlib": lambda b, cap: _inflate_capped(b, cap, wbits=15),
    "deflate": lambda b, cap: _inflate_capped(b, cap, wbits=15),
}


def _decompress_body(encoding: str, body: bytes, cap: int) -> bytes:
    if not encoding:
        return body
    dec = _BODY_DECODERS.get(encoding)
    if dec is None:
        raise ValueError(f"unsupported Content-Encoding: {encoding}")
    return dec(body, cap)


class OtlpHttpReceiver:
    """Minimal OTLP/HTTP server spooling requests for Spark ingest.

    Usage::

        rcv = OtlpHttpReceiver(spool_dir)
        rcv.start()                      # returns (host, port)
        ... clients POST to /v1/traces etc ...
        df = rcv.read_spool(spark, "traces")   # or point a streaming
        rcv.stop()                             # file source at the dirs
    """

    def __init__(self, spool_dir: str, *, host: str = "127.0.0.1",
                 port: int = 0, token: str | None = None,
                 authenticator=None,
                 max_pending_files: int = 100_000,
                 max_body_bytes: int = 64 * 1024 * 1024,
                 tls=None, zpages=None, exposition=None,
                 record_client_info: bool = False):
        from .auth import resolve_authenticator
        self.spool_dir = spool_dir
        self.host, self._port = host, port
        self.token = token
        # configauth surface (extension/auth/server.go:18-29): a named/
        # callable/instance authenticator; token= stays as bearer sugar
        self.authenticator = resolve_authenticator(authenticator, token)
        self.tls = tls                       # TLSConfig | None (configtls)
        self.zpages = zpages                 # plans.zpages.ZPages | None
        # plans.proctelemetry.PrometheusExposition | None: attaching one
        # serves GET /metrics from this receiver's listener, the
        # confighttp shared-server stance for an empty
        # telemetry.metrics.address
        self.exposition = exposition
        self.max_pending_files = max_pending_files
        self.max_body_bytes = max_body_bytes
        # client.Info surface (reference client/client.go:86-151): pb
        # spool laid out client_addr=/client_principal= so ingest can
        # expose peer + principal columns (read_spool(client_info=True)).
        self.record_client_info = record_client_info
        self.counters: dict[str, int] = {}   # obsreport-style
        self._seq = itertools.count()
        self._lock = threading.Lock()
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        for s in _SIGNALS:
            os.makedirs(self._dir(s, "json"), exist_ok=True)
            os.makedirs(self._dir(s, "pb"), exist_ok=True)

    # -- paths -------------------------------------------------------------

    def _dir(self, signal: str, wire: str) -> str:
        return os.path.join(self.spool_dir, f"{signal}_{wire}")

    def spool_paths(self, signal: str) -> dict[str, str]:
        """{wire format -> spool directory} for one signal."""
        return {w: self._dir(signal, w) for w in ("json", "pb")}

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> tuple[str, int]:
        receiver = self

        class Handler(BaseHTTPRequestHandler):
            daemon_threads = True

            def setup(self):
                # TLS handshake runs HERE (handler thread), not in the
                # accept loop: socketserver silently swallows OSErrors in
                # get_request, but a setup() failure routes through
                # handle_error -> the refusal counter
                if receiver.tls is not None:
                    self.request.do_handshake()
                super().setup()

            def log_message(self, *a):          # keep test output quiet
                pass

            def do_POST(self):                  # noqa: N802 (stdlib name)
                t0 = time.perf_counter()
                code = receiver._handle(self)
                rec = getattr(receiver.zpages, "tracez_recorder", None)
                if rec is not None:
                    # operation-boundary span for /debug/tracez
                    # (zpagesextension.go:45-52 span processor)
                    rec.record(f"receiver{self.path.split('?', 1)[0]}",
                               int((time.perf_counter() - t0) * 1e6),
                               error=(code or 200) >= 400,
                               detail=f"HTTP {code or 200}")

            def do_GET(self):                   # noqa: N802 (stdlib name)
                receiver._handle_status(self)

        class Server(ThreadingHTTPServer):
            def handle_error(self, request, client_address):
                # TLS handshake failures from unauthorized clients are an
                # expected refusal path, not a server crash — count, don't
                # spew tracebacks
                receiver._count("refused_tls_handshake")

        self._server = Server((self.host, self._port), Handler)
        self._server.daemon_threads = True
        if self.tls is not None:
            self._server.socket = self.tls.server_context().wrap_socket(
                self._server.socket, server_side=True,
                do_handshake_on_connect=False)
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="otlp-http", daemon=True)
        self._thread.start()
        self._port = self._server.server_address[1]
        return self.host, self._port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    @property
    def endpoint(self) -> str:
        scheme = "https" if self.tls is not None else "http"
        return f"{scheme}://{self.host}:{self._port}"

    # -- request handling --------------------------------------------------

    def _count(self, key: str) -> None:
        with self._lock:
            self.counters[key] = self.counters.get(key, 0) + 1

    def _pending(self, signal: str) -> int:
        return sum(len(os.listdir(self._dir(signal, w)))
                   for w in ("json", "pb"))

    def _handle(self, h: BaseHTTPRequestHandler) -> None:
        signal = _ROUTES.get(h.path)
        if signal is None:
            self._count("refused_not_found")
            return self._plain(h, 404, b"unknown signal path")
        principal = "anonymous"
        if self.authenticator is not None:
            try:
                principal = self.authenticator.authenticate(
                    {k.lower(): v for k, v in h.headers.items()})
            except Exception:
                # any authenticator error is a non-retryable refusal
                # (auth/server.go:21-22)
                self._count(f"refused_unauth_{signal}")
                return self._plain(h, 401, b"unauthorized")
        ctype = (h.headers.get("Content-Type") or "").split(";")[0].strip()
        if ctype == "application/json":
            wire = "json"
        elif ctype == "application/x-protobuf":
            wire = "pb"
        else:
            self._count(f"refused_content_type_{signal}")
            return self._plain(h, 415, b"unsupported content type")
        if self._pending(signal) >= self.max_pending_files:
            # memory-limiter refusal: backpressure, never accept-and-drop
            self._count(f"refused_backpressure_{signal}")
            h.send_response(503)
            h.send_header("Retry-After", "1")
            h.end_headers()
            return 503
        n = int(h.headers.get("Content-Length", 0))
        if n > self.max_body_bytes:
            # the reference caps request size (confighttp max_request_body_
            # size); reject BEFORE reading the body
            self._count(f"refused_too_large_{signal}")
            return self._plain(h, 413, b"request body too large")
        try:
            body = h.rfile.read(n)
            body = _decompress_body(
                h.headers.get("Content-Encoding", "").lower(),
                body, self.max_body_bytes)
            payload = self._validate(body, signal, wire)
        except Exception as e:                   # malformed -> 400, no spool
            self._count(f"refused_bad_payload_{signal}")
            return self._plain(h, 400, str(e).encode()[:512])
        self._spool(payload, signal, wire,
                    client=("%s:%s" % h.client_address[:2], principal))
        self._count(f"accepted_{signal}_{wire}")
        # empty partial-success response in the request's content type
        resp = b"{}" if wire == "json" else b""
        h.send_response(200)
        h.send_header("Content-Type", ctype)
        h.send_header("Content-Length", str(len(resp)))
        h.end_headers()
        h.wfile.write(resp)
        return 200

    def _handle_status(self, h: BaseHTTPRequestHandler) -> None:
        """GET /status — the zpages-style diagnostics surface
        (extension/zpagesextension analogue): request counters + spool
        occupancy as JSON.  With a ``zpages`` object attached, also
        serves the reference's /debug/{servicez,pipelinez,extensionz,
        featurez} HTML pages (service/zpages.go:17-23)."""
        if (self.exposition is not None
                and h.path.split("?", 1)[0] == "/metrics"):
            from .compression import encode_response
            coding, body = encode_response(
                h.headers.get("Accept-Encoding"), self.exposition.render())
            h.send_response(200)
            h.send_header("Content-Type",
                          "text/plain; version=0.0.4; charset=utf-8")
            if coding is not None:
                h.send_header("Content-Encoding", coding)
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)
            return None
        if self.zpages is not None and h.path.startswith("/debug/"):
            from urllib.parse import parse_qsl, urlsplit
            parts = urlsplit(h.path)
            page = self.zpages.handle(parts.path, dict(parse_qsl(parts.query)))
            if page is None:
                return self._plain(h, 404, b"not found")
            code, body = page
            h.send_response(code)
            h.send_header("Content-Type", "text/html; charset=utf-8")
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)
            return None
        if h.path != "/status":
            return self._plain(h, 404, b"not found")
        with self._lock:
            counters = dict(self.counters)
        body = json.dumps({
            "counters": counters,
            "pending_files": {s: self._pending(s) for s in _SIGNALS},
            "max_pending_files": self.max_pending_files,
        }, sort_keys=True).encode()
        h.send_response(200)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    @staticmethod
    def _plain(h: BaseHTTPRequestHandler, code: int, msg: bytes) -> int:
        h.send_response(code)
        h.send_header("Content-Type", "text/plain")
        h.send_header("Content-Length", str(len(msg)))
        h.end_headers()
        h.wfile.write(msg)
        return code

    def _validate(self, body: bytes, signal: str, wire: str) -> bytes:
        """Decode-before-ack (otlp.go does a full unmarshal): returns the
        canonical spool payload or raises."""
        if wire == "json":
            doc = json.loads(body)
            if not isinstance(doc, dict):
                raise ValueError("OTLP/JSON body must be an object")
            # one request doc per line — the line-oriented shape
            # read_otlp_json consumes
            return json.dumps(doc, separators=(",", ":")).encode()
        from .otlp_pb import decode_request
        decode_request(body, signal)             # raises on bad wire bytes
        return body

    def _spool(self, payload: bytes, signal: str, wire: str,
               client: tuple[str, str] | None = None) -> None:
        """fsync + atomic rename, ack only afterwards (ack-after-persist,
        persistent_storage.go:278-345).  With ``record_client_info`` the
        pb spool nests per client (addr, principal) — the JSON spool
        stays flat (its line-oriented streaming reader has no per-file
        metadata channel)."""
        with self._lock:
            seq = next(self._seq)
        ext = "json" if wire == "json" else "pb"
        d = self._dir(signal, wire)
        if self.record_client_info and client is not None and wire == "pb":
            from urllib.parse import quote
            addr, principal = client
            d = os.path.join(d, f"client_addr={quote(addr, safe='')}",
                             f"client_principal={quote(principal, safe='')}")
            os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{seq:08d}")
        dst = os.path.join(d, f"req-{seq:08d}.{ext}")
        with open(tmp, "wb") as fh:
            fh.write(payload + (b"\n" if wire == "json" else b""))
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, dst)

    # -- Spark ingest ------------------------------------------------------

    def read_spool(self, spark, signal: str, client_info: bool = False):
        """Batch-ingest everything spooled for one signal (both wire
        formats) into the engine's row model.  ``client_info=True`` adds
        ``client_addr``/``client_principal`` columns (NULL for the JSON
        spool, which records no per-file peer metadata)."""
        return read_spool(spark, self.spool_dir, signal,
                          client_info=client_info)


def stream_spool(spark, spool_dir: str, signal: str):
    """CONTINUOUS ingest of the JSON spool as a Structured Streaming file
    source: new-file discovery is Spark's native streaming contract, so a
    receiver fleet appending to shared storage feeds one streaming query
    with checkpointed exactly-once progress (the ack-after-persist rule on
    the write side + the WAL on the read side compose into the reference's
    persistent-queue semantics end to end).

    JSON wire only: the line-oriented text source streams naturally; pb
    spools are batch-ingested via :func:`read_spool` (binaryFile has no
    streaming reader in this engine's scope)."""
    from .otlp_json import _READERS
    if signal not in _READERS:
        raise NotImplementedError(
            f"streaming spool ingest for signal {signal!r} "
            f"(supported: {sorted(_READERS)})")
    json_dir = os.path.join(spool_dir, f"{signal}_json")
    raw = (spark.readStream.text(json_dir)
                .withColumnRenamed("value", "json"))
    return _READERS[signal](raw)


def read_spool(spark, spool_dir: str, signal: str,
               client_info: bool = False):
    """Ingest an OTLP/HTTP spool directory (both wire formats) into the
    row model — the consumer half of :class:`OtlpHttpReceiver`, also
    reachable as the pipeline compiler's ``kind: http_spool`` receiver.
    Works on any receiver fleet's shared spool, server running or not."""
    from .otlp_json import read_otlp_json
    from .otlp_pb import read_otlp_pb
    json_dir = os.path.join(spool_dir, f"{signal}_json")
    pb_dir = os.path.join(spool_dir, f"{signal}_pb")
    parts = []
    if os.path.isdir(json_dir) and os.listdir(json_dir):
        j = read_otlp_json(spark, json_dir, signal)
        if client_info:
            from pyspark.sql import functions as F
            j = (j.withColumn("client_addr", F.lit(None).cast("string"))
                  .withColumn("client_principal",
                              F.lit(None).cast("string")))
        parts.append(j)
    if os.path.isdir(pb_dir) and os.listdir(pb_dir):
        parts.append(read_otlp_pb(spark, pb_dir, signal,
                                  client_info=client_info))
    if not parts:
        from ..model.telemetry import (LOG_SCHEMA, METRIC_POINT_SCHEMA,
                                       SPAN_SCHEMA)
        empty = {"traces": SPAN_SCHEMA, "logs": LOG_SCHEMA,
                 "metrics": METRIC_POINT_SCHEMA}[signal]
        return spark.createDataFrame([], empty)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
