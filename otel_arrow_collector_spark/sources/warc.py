"""WARC 1.0 reader/writer (ISO 28500) — the Common Crawl container,
i.e. the file format an actual 100 TB pretraining corpus arrives in.

Clean-room from the public WARC 1.0 specification and the Common Crawl
conventions:

- a WARC file is a sequence of records; each record is a version line
  ``WARC/1.0`` + named headers (``WARC-Type``, ``WARC-Record-ID``,
  ``WARC-Date``, ``WARC-Target-URI``, ``Content-Type``,
  ``Content-Length``) + CRLF CRLF + exactly Content-Length payload
  bytes + CRLF CRLF.
- ``response`` records carry an HTTP/1.1 message as payload (status
  line, headers, CRLF CRLF, body) — extracting the BODY from that
  nested envelope is the part every corpus pipeline implements.
- Common Crawl stores each record as its own gzip MEMBER, so a .warc.gz
  is a multi-member gzip stream; the reader walks members with zlib
  (window 16+15) via each member's unused tail.

The Spark operator maps record extraction over binary WARC blobs in
one mapInPandas stage — the classic "WARC shard in, clean text out"
ingest step.
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """records: [{type, uri, date, record_id, payload: bytes}] ->
    WARC bytes (optionally one gzip member per record, Common Crawl
    layout)."""
    out = bytearray()
    for r in records:
        for field in ("type", "record_id", "date", "uri", "content_type"):
            v = r.get(field)
            if v is not None and ("\r" in str(v) or "\n" in str(v)):
                # a CR/LF inside a header value would inject headers and
                # desync the reader's Content-Length framing — loud
                # error, never emitted (the same header-smuggling class
                # HTTP/1.1 forbids)
                raise ValueError(
                    f"WARC header field {field!r} contains CR/LF: {v!r}")
        head = bytearray(b"WARC/1.0" + _CRLF)
        head += f"WARC-Type: {r['type']}".encode() + _CRLF
        head += f"WARC-Record-ID: {r['record_id']}".encode() + _CRLF
        head += f"WARC-Date: {r['date']}".encode() + _CRLF
        if r.get("uri"):
            head += f"WARC-Target-URI: {r['uri']}".encode() + _CRLF
        ctype = r.get("content_type",
                      "application/http; msgtype=response")
        head += f"Content-Type: {ctype}".encode() + _CRLF
        head += f"Content-Length: {len(r['payload'])}".encode() + _CRLF
        rec = bytes(head) + _CRLF + r["payload"] + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def http_response(body: bytes, status: int = 200,
                  content_type: str = "text/plain") -> bytes:
    """Wrap a body in the HTTP/1.1 envelope a response record carries."""
    reason = {200: "OK", 404: "Not Found", 503: "Service Unavailable"}
    head = (f"HTTP/1.1 {status} {reason.get(status, 'X')}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body


def _split_members(data: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream member by member; plain
    (non-gzip) input passes through whole."""
    if data[:2] != b"\x1f\x8b":
        return [data]
    out = []
    rest = data
    while rest:
        d = zlib.decompressobj(16 + 15)
        try:
            chunk = d.decompress(rest)
        except zlib.error as ex:
            raise ValueError(f"bad gzip member: {ex}") from None
        if not d.eof:
            raise ValueError("truncated gzip member")
        out.append(chunk)
        rest = d.unused_data
    return out


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (plain or .gz multi-member) -> list of records:
    {headers: {name: value}, payload: bytes}.  Raises ValueError on
    malformed framing."""
    records = []
    for chunk in _split_members(data):
        pos = 0
        while pos < len(chunk):
            if chunk[pos:pos + 5] != b"WARC/":
                raise ValueError(f"bad record start at {pos}")
            hdr_end = chunk.find(_CRLF + _CRLF, pos)
            if hdr_end < 0:
                raise ValueError("unterminated WARC header")
            lines = chunk[pos:hdr_end].split(_CRLF)
            headers: dict[str, str] = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(b":")
                if not _:
                    raise ValueError(f"bad WARC header line {ln!r}")
                headers[k.strip().decode()] = v.strip().decode()
            try:
                clen = int(headers["Content-Length"])
            except (KeyError, ValueError):
                raise ValueError("missing/bad Content-Length") from None
            body_at = hdr_end + 4
            payload = chunk[body_at:body_at + clen]
            if len(payload) < clen:
                raise ValueError("truncated WARC payload")
            if chunk[body_at + clen:body_at + clen + 4] != _CRLF + _CRLF:
                raise ValueError("missing record trailer")
            records.append({"headers": headers, "payload": payload})
            pos = body_at + clen + 4
    return records


def extract_http_body(payload: bytes) -> tuple[int, bytes]:
    """HTTP response payload -> (status, body)."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response payload")
    status_line = payload[:payload.find(_CRLF)]
    parts = status_line.split(b" ", 2)
    if len(parts) < 2:
        raise ValueError("bad HTTP status line")
    return int(parts[1]), payload[sep + 4:]
