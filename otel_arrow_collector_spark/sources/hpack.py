"""HPACK (RFC 7541) header codec — dependency-free.

The reference's Arrow transport carries per-batch gRPC metadata as
hpack-encoded header blocks (``BatchArrowRecords.headers``), decoded
statefully per stream with a 4096-byte dynamic table
(receiver/otlpreceiver/internal/arrow/arrow.go:35,85-131 `headerReceiver`;
exporter side encodes with golang.org/x/net/http2/hpack).  This module
re-implements that wire format from the public RFC so the Spark transport
(`sources/arrow_ipc.py`) can round-trip real collector header blocks.

Implements the full RFC 7541 surface:
- integer representation with N-bit prefix (§5.1)
- string literals, raw or Huffman-coded (§5.2, Appendix B code table)
- indexed / literal-with-incremental-indexing / without-indexing /
  never-indexed field representations (§6.1-6.2)
- dynamic table with size accounting (entry = name + value + 32, §4.1),
  eviction (§4.4) and size-update instructions (§6.3)

Conformance: tests/test_hpack.py replays the RFC's Appendix C request and
response sequences (C.3/C.4/C.6) byte-for-byte.
"""

from __future__ import annotations

# RFC 7541 Appendix A — the 61-entry static table.
STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""),
    ("expires", ""), ("from", ""), ("host", ""), ("if-match", ""),
    ("if-modified-since", ""), ("if-none-match", ""), ("if-range", ""),
    ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
    ("location", ""), ("max-forwards", ""), ("proxy-authenticate", ""),
    ("proxy-authorization", ""), ("range", ""), ("referer", ""),
    ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""),
    ("via", ""), ("www-authenticate", ""),
]

# RFC 7541 Appendix B — Huffman code per symbol 0..256 (256 = EOS),
# as (code, bit_length).
HUFFMAN_TABLE: list[tuple[int, int]] = [
    (0x1ff8, 13), (0x7fffd8, 23), (0xfffffe2, 28), (0xfffffe3, 28),
    (0xfffffe4, 28), (0xfffffe5, 28), (0xfffffe6, 28), (0xfffffe7, 28),
    (0xfffffe8, 28), (0xffffea, 24), (0x3ffffffc, 30), (0xfffffe9, 28),
    (0xfffffea, 28), (0x3ffffffd, 30), (0xfffffeb, 28), (0xfffffec, 28),
    (0xfffffed, 28), (0xfffffee, 28), (0xfffffef, 28), (0xffffff0, 28),
    (0xffffff1, 28), (0xffffff2, 28), (0x3ffffffe, 30), (0xffffff3, 28),
    (0xffffff4, 28), (0xffffff5, 28), (0xffffff6, 28), (0xffffff7, 28),
    (0xffffff8, 28), (0xffffff9, 28), (0xffffffa, 28), (0xffffffb, 28),
    (0x14, 6), (0x3f8, 10), (0x3f9, 10), (0xffa, 12), (0x1ff9, 13),
    (0x15, 6), (0xf8, 8), (0x7fa, 11), (0x3fa, 10), (0x3fb, 10),
    (0xf9, 8), (0x7fb, 11), (0xfa, 8), (0x16, 6), (0x17, 6), (0x18, 6),
    (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6), (0x1a, 6), (0x1b, 6),
    (0x1c, 6), (0x1d, 6), (0x1e, 6), (0x1f, 6), (0x5c, 7), (0xfb, 8),
    (0x7ffc, 15), (0x20, 6), (0xffb, 12), (0x3fc, 10), (0x1ffa, 13),
    (0x21, 6), (0x5d, 7), (0x5e, 7), (0x5f, 7), (0x60, 7), (0x61, 7),
    (0x62, 7), (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7), (0x67, 7),
    (0x68, 7), (0x69, 7), (0x6a, 7), (0x6b, 7), (0x6c, 7), (0x6d, 7),
    (0x6e, 7), (0x6f, 7), (0x70, 7), (0x71, 7), (0x72, 7), (0xfc, 8),
    (0x73, 7), (0xfd, 8), (0x1ffb, 13), (0x7fff0, 19), (0x1ffc, 13),
    (0x3ffc, 14), (0x22, 6), (0x7ffd, 15), (0x3, 5), (0x23, 6), (0x4, 5),
    (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6), (0x27, 6), (0x6, 5),
    (0x74, 7), (0x75, 7), (0x28, 6), (0x29, 6), (0x2a, 6), (0x7, 5),
    (0x2b, 6), (0x76, 7), (0x2c, 6), (0x8, 5), (0x9, 5), (0x2d, 6),
    (0x77, 7), (0x78, 7), (0x79, 7), (0x7a, 7), (0x7b, 7), (0x7ffe, 15),
    (0x7fc, 11), (0x3ffd, 14), (0x1ffd, 13), (0xffffffc, 28),
    (0xfffe6, 20), (0x3fffd2, 22), (0xfffe7, 20), (0xfffe8, 20),
    (0x3fffd3, 22), (0x3fffd4, 22), (0x3fffd5, 22), (0x7fffd9, 23),
    (0x3fffd6, 22), (0x7fffda, 23), (0x7fffdb, 23), (0x7fffdc, 23),
    (0x7fffdd, 23), (0x7fffde, 23), (0xffffeb, 24), (0x7fffdf, 23),
    (0xffffec, 24), (0xffffed, 24), (0x3fffd7, 22), (0x7fffe0, 23),
    (0xffffee, 24), (0x7fffe1, 23), (0x7fffe2, 23), (0x7fffe3, 23),
    (0x7fffe4, 23), (0x1fffdc, 21), (0x3fffd8, 22), (0x7fffe5, 23),
    (0x3fffd9, 22), (0x7fffe6, 23), (0x7fffe7, 23), (0xffffef, 24),
    (0x3fffda, 22), (0x1fffdd, 21), (0xfffe9, 20), (0x3fffdb, 22),
    (0x3fffdc, 22), (0x7fffe8, 23), (0x7fffe9, 23), (0x1fffde, 21),
    (0x7fffea, 23), (0x3fffdd, 22), (0x3fffde, 22), (0xfffff0, 24),
    (0x1fffdf, 21), (0x3fffdf, 22), (0x7fffeb, 23), (0x7fffec, 23),
    (0x1fffe0, 21), (0x1fffe1, 21), (0x3fffe0, 22), (0x1fffe2, 21),
    (0x7fffed, 23), (0x3fffe1, 22), (0x7fffee, 23), (0x7fffef, 23),
    (0xfffea, 20), (0x3fffe2, 22), (0x3fffe3, 22), (0x3fffe4, 22),
    (0x7ffff0, 23), (0x3fffe5, 22), (0x3fffe6, 22), (0x7ffff1, 23),
    (0x3ffffe0, 26), (0x3ffffe1, 26), (0xfffeb, 20), (0x7fff1, 19),
    (0x3fffe7, 22), (0x7ffff2, 23), (0x3fffe8, 22), (0x1ffffec, 25),
    (0x3ffffe2, 26), (0x3ffffe3, 26), (0x3ffffe4, 26), (0x7ffffde, 27),
    (0x7ffffdf, 27), (0x3ffffe5, 26), (0xfffff1, 24), (0x1ffffed, 25),
    (0x7fff2, 19), (0x1fffe3, 21), (0x3ffffe6, 26), (0x7ffffe0, 27),
    (0x7ffffe1, 27), (0x3ffffe7, 26), (0x7ffffe2, 27), (0xfffff2, 24),
    (0x1fffe4, 21), (0x1fffe5, 21), (0x3ffffe8, 26), (0x3ffffe9, 26),
    (0xffffffd, 28), (0x7ffffe3, 27), (0x7ffffe4, 27), (0x7ffffe5, 27),
    (0xfffec, 20), (0xfffff3, 24), (0xfffed, 20), (0x1fffe6, 21),
    (0x3fffe9, 22), (0x1fffe7, 21), (0x1fffe8, 21), (0x7ffff3, 23),
    (0x3fffea, 22), (0x3fffeb, 22), (0x1ffffee, 25), (0x1ffffef, 25),
    (0xfffff4, 24), (0xfffff5, 24), (0x3ffffea, 26), (0x7ffff4, 23),
    (0x3ffffeb, 26), (0x7ffffe6, 27), (0x3ffffec, 26), (0x3ffffed, 26),
    (0x7ffffe7, 27), (0x7ffffe8, 27), (0x7ffffe9, 27), (0x7ffffea, 27),
    (0x7ffffeb, 27), (0xffffffe, 28), (0x7ffffec, 27), (0x7ffffed, 27),
    (0x7ffffee, 27), (0x7ffffef, 27), (0x7fffff0, 27), (0x3ffffee, 26),
    (0x3fffffff, 30),
]

_DECODE = {(code, bits): sym for sym, (code, bits) in enumerate(HUFFMAN_TABLE)}
_EOS_SYM = 256
_ENTRY_OVERHEAD = 32   # RFC 7541 §4.1


class HpackError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman coding (Appendix B)
# ---------------------------------------------------------------------------

def huffman_encode(data: bytes) -> bytes:
    acc = 0
    nbits = 0
    out = bytearray()
    for byte in data:
        code, blen = HUFFMAN_TABLE[byte]
        acc = (acc << blen) | code
        nbits += blen
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        pad = 8 - nbits                      # pad with EOS-prefix 1-bits
        out.append(((acc << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes) -> bytes:
    out = bytearray()
    code = 0
    blen = 0
    for byte in data:
        for shift in range(7, -1, -1):
            code = (code << 1) | ((byte >> shift) & 1)
            blen += 1
            sym = _DECODE.get((code, blen))
            if sym is not None:
                if sym == _EOS_SYM:
                    raise HpackError("EOS symbol in huffman string")
                out.append(sym)
                code = 0
                blen = 0
            elif blen > 30:
                raise HpackError("invalid huffman code")
    # §5.2: padding must be the EOS prefix (< 8 bits, all ones)
    if blen >= 8 or code != (1 << blen) - 1:
        raise HpackError("invalid huffman padding")
    return bytes(out)


# ---------------------------------------------------------------------------
# primitive representations (§5.1, §5.2)
# ---------------------------------------------------------------------------

def _encode_int(value: int, prefix_bits: int, flags: int = 0) -> bytearray:
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytearray([flags | value])
    out = bytearray([flags | limit])
    value -= limit
    while value >= 0x80:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    out.append(value)
    return out


def _decode_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise HpackError("truncated integer")
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return value, pos


def _encode_str(s: bytes, huffman: bool = True) -> bytearray:
    if huffman:
        enc = huffman_encode(s)
        if len(enc) < len(s):
            return _encode_int(len(enc), 7, 0x80) + enc
    return _encode_int(len(s), 7, 0x00) + s


def _decode_str(data: bytes, pos: int) -> tuple[bytes, int]:
    is_huff = bool(data[pos] & 0x80)
    length, pos = _decode_int(data, pos, 7)
    raw = data[pos:pos + length]
    if len(raw) != length:
        raise HpackError("truncated string")
    pos += length
    return (huffman_decode(raw) if is_huff else raw), pos


# ---------------------------------------------------------------------------
# dynamic table (§4)
# ---------------------------------------------------------------------------

class _DynamicTable:
    def __init__(self, max_size: int):
        self.max_size = max_size
        self.entries: list[tuple[str, str]] = []   # most recent first
        self.size = 0

    @staticmethod
    def _entry_size(name: str, value: str) -> int:
        return (len(name.encode()) + len(value.encode()) + _ENTRY_OVERHEAD)

    def add(self, name: str, value: str) -> None:
        need = self._entry_size(name, value)
        self._evict_to(self.max_size - need)
        if need <= self.max_size:
            self.entries.insert(0, (name, value))
            self.size += need

    def resize(self, new_max: int) -> None:
        self.max_size = new_max
        self._evict_to(new_max)

    def _evict_to(self, budget: int) -> None:
        while self.entries and self.size > max(budget, 0):
            n, v = self.entries.pop()
            self.size -= self._entry_size(n, v)

    def get(self, index: int) -> tuple[str, str]:
        """1-based HPACK index across static + dynamic tables (§2.3.3)."""
        if 1 <= index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        d = index - len(STATIC_TABLE) - 1
        if 0 <= d < len(self.entries):
            return self.entries[d]
        raise HpackError(f"index {index} out of table bounds")


# ---------------------------------------------------------------------------
# decoder (§3.2) — stateful per stream, like arrow.go:131's one decoder
# per headerReceiver
# ---------------------------------------------------------------------------

class HpackDecoder:
    def __init__(self, max_dynamic_size: int = 4096):
        self.table = _DynamicTable(max_dynamic_size)

    def decode(self, data: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(data):
            b = data[pos]
            if b & 0x80:                                   # indexed (§6.1)
                index, pos = _decode_int(data, pos, 7)
                if index == 0:
                    raise HpackError("indexed field with index 0")
                out.append(self.table.get(index))
            elif b & 0x40:            # literal, incremental indexing (§6.2.1)
                name, value, pos = self._literal(data, pos, 6)
                self.table.add(name, value)
                out.append((name, value))
            elif b & 0x20:                       # table size update (§6.3)
                new_max, pos = _decode_int(data, pos, 5)
                self.table.resize(new_max)
            else:          # literal without indexing / never indexed (§6.2.2-3)
                name, value, pos = self._literal(data, pos, 4)
                out.append((name, value))
        return out

    def _literal(self, data: bytes, pos: int,
                 prefix: int) -> tuple[str, str, int]:
        name_idx, pos = _decode_int(data, pos, prefix)
        if name_idx:
            name = self.table.get(name_idx)[0]
        else:
            raw, pos = _decode_str(data, pos)
            name = raw.decode("utf-8", "surrogateescape")
        raw, pos = _decode_str(data, pos)
        return name, raw.decode("utf-8", "surrogateescape"), pos


# ---------------------------------------------------------------------------
# encoder — static/dynamic full-match -> indexed; else literal with
# incremental indexing (indexed name when available) + Huffman when shorter,
# mirroring golang.org/x/net/http2/hpack's encoder strategy
# ---------------------------------------------------------------------------

class HpackEncoder:
    def __init__(self, max_dynamic_size: int = 4096):
        self.table = _DynamicTable(max_dynamic_size)
        self._pending_resize: int | None = None

    def set_max_size(self, new_max: int) -> None:
        self._pending_resize = new_max
        self.table.resize(new_max)

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        if self._pending_resize is not None:
            out += _encode_int(self._pending_resize, 5, 0x20)
            self._pending_resize = None
        for name, value in headers:
            out += self._encode_field(name, value)
        return bytes(out)

    def _find(self, name: str, value: str) -> tuple[int, int]:
        """(full_match_index, name_match_index), 0 = none (1-based)."""
        name_idx = 0
        for i, (n, v) in enumerate(STATIC_TABLE, start=1):
            if n == name:
                if v == value:
                    return i, i
                name_idx = name_idx or i
        for i, (n, v) in enumerate(self.table.entries,
                                   start=len(STATIC_TABLE) + 1):
            if n == name:
                if v == value:
                    return i, i
                name_idx = name_idx or i
        return 0, name_idx

    def _encode_field(self, name: str, value: str) -> bytearray:
        full, name_idx = self._find(name, value)
        if full:
            return _encode_int(full, 7, 0x80)
        out = _encode_int(name_idx, 6, 0x40)       # incremental indexing
        if not name_idx:
            out += _encode_str(name.encode())
        out += _encode_str(value.encode())
        self.table.add(name, value)
        return out
