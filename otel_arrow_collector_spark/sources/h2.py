"""Minimal HTTP/2 (RFC 7540) framing — just enough to carry gRPC.

The reference's OTLP/gRPC receiver and exporter ride on grpc-go's HTTP/2
stack (receiver/otlpreceiver/otlp.go:93-110 registers the three Export
services).  This container has no grpcio, so the live gRPC pair is built
on the standard library: this module speaks the wire format (connection
preface, frame header, SETTINGS/PING/WINDOW_UPDATE bookkeeping), and the
repo's RFC 7541 codec (``sources/hpack.py``) compresses the header
blocks.  Only the server/client feature set gRPC unary + client-streaming
calls need is implemented; everything else is rejected loudly.

Frame layout (RFC 7540 §4.1): 24-bit length, 8-bit type, 8-bit flags,
31-bit stream id, payload.
"""

from __future__ import annotations

import struct

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

# frame types (§6)
DATA = 0x0
HEADERS = 0x1
PRIORITY = 0x2
RST_STREAM = 0x3
SETTINGS = 0x4
PUSH_PROMISE = 0x5
PING = 0x6
GOAWAY = 0x7
WINDOW_UPDATE = 0x8
CONTINUATION = 0x9

# flags
FLAG_END_STREAM = 0x1      # DATA / HEADERS
FLAG_ACK = 0x1             # SETTINGS / PING
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

# settings ids (§6.5.2)
SETTINGS_HEADER_TABLE_SIZE = 0x1
SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5

DEFAULT_MAX_FRAME = 16_384


class H2Error(ConnectionError):
    pass


class H2Closed(H2Error):
    """Peer closed cleanly on a frame boundary (normal teardown)."""


def pack_frame(ftype: int, flags: int, stream_id: int,
               payload: bytes = b"") -> bytes:
    if len(payload) >= 1 << 24:
        raise H2Error(f"frame too large: {len(payload)}")
    return (struct.pack(">I", len(payload))[1:]
            + bytes((ftype, flags))
            + struct.pack(">I", stream_id & 0x7FFFFFFF)
            + payload)


def settings_payload(pairs: dict[int, int]) -> bytes:
    return b"".join(struct.pack(">HI", k, v) for k, v in pairs.items())


def parse_settings(payload: bytes) -> dict[int, int]:
    if len(payload) % 6:
        raise H2Error("SETTINGS payload not a multiple of 6")
    return {k: v for k, v in struct.iter_unpack(">HI", payload)}


def recv_exact(sock, n: int, at_boundary: bool = False) -> bytes:
    """Read exactly n bytes or raise (peer closed mid-frame).  With
    ``at_boundary``, EOF before the first byte raises :class:`H2Closed`
    (clean teardown between frames) instead of a hard error."""
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            if at_boundary and not buf:
                raise H2Closed("connection closed on frame boundary")
            raise H2Error(f"connection closed ({len(buf)}/{n} bytes)")
        buf += chunk
    return bytes(buf)


def recv_frame(sock) -> tuple[int, int, int, bytes]:
    """-> (type, flags, stream_id, payload)."""
    hdr = recv_exact(sock, 9, at_boundary=True)
    length = int.from_bytes(hdr[:3], "big")
    ftype, flags = hdr[3], hdr[4]
    stream_id = int.from_bytes(hdr[5:9], "big") & 0x7FFFFFFF
    payload = recv_exact(sock, length) if length else b""
    return ftype, flags, stream_id, payload


def strip_padding(flags: int, payload: bytes) -> bytes:
    """Remove DATA/HEADERS padding (and HEADERS priority block)."""
    if flags & FLAG_PADDED:
        pad = payload[0]
        payload = payload[1:]
        if pad > len(payload):
            raise H2Error("padding exceeds payload")
        payload = payload[:len(payload) - pad]
    return payload


def grpc_frame(message: bytes, compressed: bool = False) -> bytes:
    """gRPC length-prefixed message (gRPC-over-HTTP2 spec §Message)."""
    return bytes((1 if compressed else 0,)) + struct.pack(
        ">I", len(message)) + message


def parse_grpc_frames(buf: bytes) -> list[tuple[bool, bytes]]:
    """-> [(compressed, message)] — raises on truncation."""
    out = []
    pos = 0
    while pos < len(buf):
        if pos + 5 > len(buf):
            raise H2Error("truncated gRPC frame header")
        compressed = buf[pos] == 1
        ln = int.from_bytes(buf[pos + 1:pos + 5], "big")
        if pos + 5 + ln > len(buf):
            raise H2Error("truncated gRPC message body")
        out.append((compressed, buf[pos + 5:pos + 5 + ln]))
        pos += 5 + ln
    return out


def chunk_data_frames(stream_id: int, body: bytes, end_stream: bool,
                      max_frame: int = DEFAULT_MAX_FRAME) -> list[bytes]:
    """Split a body into DATA frames <= max_frame, flagging the last."""
    frames = []
    if not body:
        return [pack_frame(DATA, FLAG_END_STREAM if end_stream else 0,
                           stream_id)]
    for i in range(0, len(body), max_frame):
        chunk = body[i:i + max_frame]
        last = i + max_frame >= len(body)
        frames.append(pack_frame(
            DATA, FLAG_END_STREAM if (last and end_stream) else 0,
            stream_id, chunk))
    return frames
