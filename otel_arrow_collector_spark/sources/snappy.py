"""Snappy raw-block codec — the compression under every parquet file
this engine reads.

Clean-room from the public format description
(google/snappy format_description.txt): a varint uncompressed-length
preamble, then tagged elements — literals (tag&3==0, length in the tag
or 1-4 trailing LE bytes) and back-references (1-byte-offset copies of
4..11 bytes with the offset's high bits in the tag; 2- and 4-byte
LE-offset copies of 1..64 bytes).  Copies may self-overlap (offset <
length repeats the pattern), which the decoder honors byte-at-a-time.

The encoder is a greedy 4-byte-hash matcher emitting 2-byte-offset
copies — a VALID stream, not necessarily the reference encoder's exact
bytes; interop is pinned in BOTH directions against pyarrow's bundled
snappy (our decoder reads its output, its decoder reads ours) plus
round-trips — tests/test_snappy.py.
"""

from __future__ import annotations

_MIN_MATCH = 4


def _varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _emit_literal(out: bytearray, data: bytes) -> None:
    n = len(data)
    if n == 0:
        return
    if n <= 60:
        out.append((n - 1) << 2)
    elif n <= 0x100:
        out.append(60 << 2)
        out.append(n - 1)
    elif n <= 0x10000:
        out.append(61 << 2)
        out += (n - 1).to_bytes(2, "little")
    elif n <= 0x1000000:
        out.append(62 << 2)
        out += (n - 1).to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += (n - 1).to_bytes(4, "little")
    out += data


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    while length > 0:
        if length > 64:
            step = 60 if length - 64 < 4 else 64
        else:
            step = length
        if step >= 4 and step <= 11 and offset < 2048:
            out.append(1 | ((step - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
        elif offset < 0x10000:
            out.append(2 | ((step - 1) << 2))
            out += offset.to_bytes(2, "little")
        else:
            out.append(3 | ((step - 1) << 2))
            out += offset.to_bytes(4, "little")
        length -= step


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-match encoder -> valid snappy raw block."""
    out = bytearray(_varint(len(data)))
    n = len(data)
    i = 0
    lit_start = 0
    table: dict[int, int] = {}
    while i + _MIN_MATCH <= n:
        key = int.from_bytes(data[i:i + 4], "little")
        cand = table.get(key)
        table[key] = i
        if cand is not None and data[cand:cand + 4] == data[i:i + 4]:
            # extend the match
            j = i + 4
            k = cand + 4
            while j < n and data[j] == data[k]:
                j += 1
                k += 1
            _emit_literal(out, data[lit_start:i])
            _emit_copy(out, i - cand, j - i)
            i = j
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data[lit_start:])
    return bytes(out)


def _declared_length(data: bytes) -> int:
    """The varint uncompressed-length preamble of a raw block —
    readable without decoding, so callers can enforce size limits
    BEFORE paying the byte-at-a-time decode."""
    total = 0
    shift = 0
    i = 0
    while True:
        if i >= len(data) or shift > 35:
            raise ValueError("bad snappy length varint")
        b = data[i]
        i += 1
        total |= (b & 0x7F) << shift
        if not b & 0x80:
            return total
        shift += 7


def snappy_decompress(data: bytes) -> bytes:
    """Snappy raw block -> bytes; raises ValueError on malformed
    streams (bad varint, zero offsets, overruns, length mismatch).
    Output is bounded by the DECLARED length as it grows — an element
    pushing past it aborts within one element (<= 64 bytes), so a
    crafted stream cannot expand far beyond its preamble's claim."""
    # varint preamble
    total = 0
    shift = 0
    i = 0
    while True:
        if i >= len(data) or shift > 35:
            raise ValueError("bad snappy length varint")
        b = data[i]
        i += 1
        total |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while i < len(data):
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:                         # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if i + nb > len(data):
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(data[i:i + nb], "little")
                i += nb
            ln += 1
            if i + ln > len(data):
                raise ValueError("truncated literal")
            out += data[i:i + ln]
            i += ln
            if len(out) > total:
                raise ValueError("output exceeds declared length")
            continue
        if kind == 1:                         # 1-byte-offset copy
            if i >= len(data):
                raise ValueError("truncated copy1")
            ln = ((tag >> 2) & 7) + 4
            off = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:
            if i + 2 > len(data):
                raise ValueError("truncated copy2")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i:i + 2], "little")
            i += 2
        else:
            if i + 4 > len(data):
                raise ValueError("truncated copy4")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i:i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError(f"bad copy offset {off}")
        for _ in range(ln):                   # overlap-safe
            out.append(out[-off])
        if len(out) > total:
            raise ValueError("output exceeds declared length")
    if len(out) != total:
        raise ValueError(f"length mismatch: {len(out)} != {total}")
    return bytes(out)


# ---------------------------------------------------------------------------
# Framed stream format (framing_format.txt) — what the reference's gRPC
# snappy compressor speaks (go-grpc-compression/snappy wraps
# golang/snappy's NewBufferedWriter/NewReader, the framing format), and
# what confighttp clients emit for compression: snappy.
# ---------------------------------------------------------------------------

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536            # max uncompressed bytes per data chunk

#: CRC32C (Castagnoli, reflected 0x82F63B78) slicing-by-8 tables —
#: table-driven pure Python; messages on this path are size-capped, so
#: throughput is bounded-work by construction.
_CRC32C_POLY = 0x82F63B78


def _crc32c_tables():
    t0 = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ (_CRC32C_POLY if c & 1 else 0)
        t0.append(c)
    tables = [t0]
    for k in range(1, 8):
        prev = tables[k - 1]
        tables.append([t0[prev[n] & 0xFF] ^ (prev[n] >> 8)
                       for n in range(256)])
    return tables


_T = _crc32c_tables()


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    n = len(data)
    i = 0
    t0, t1, t2, t3, t4, t5, t6, t7 = _T
    end8 = n - (n % 8)
    while i < end8:
        crc ^= int.from_bytes(data[i:i + 4], "little")
        b4, b5, b6, b7 = data[i + 4], data[i + 5], data[i + 6], data[i + 7]
        crc = (t7[crc & 0xFF] ^ t6[(crc >> 8) & 0xFF]
               ^ t5[(crc >> 16) & 0xFF] ^ t4[crc >> 24]
               ^ t3[b4] ^ t2[b5] ^ t1[b6] ^ t0[b7])
        i += 8
    while i < n:
        crc = t0[(crc ^ data[i]) & 0xFF] ^ (crc >> 8)
        i += 1
    return crc ^ 0xFFFFFFFF


def _mask_crc(crc: int) -> int:
    """The framing format stores CRCs masked (rotate right 15 +
    0xa282ead8) so CRCs of CRC-bearing data don't fixate."""
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def frame_compress(data: bytes) -> bytes:
    """bytes -> snappy framing-format stream: stream identifier, then
    one compressed (type 0x00) — or uncompressed (0x01) when
    compression doesn't pay — chunk per 64 KiB, each carrying the
    masked CRC32C of its UNCOMPRESSED content.  Empty input emits just
    the stream identifier, matching golang/snappy's BufferedWriter
    (r10 ADVICE: no zero-length data chunk on the wire)."""
    out = bytearray(_STREAM_ID)
    for i in range(0, len(data), _MAX_CHUNK):
        chunk = data[i:i + _MAX_CHUNK]
        crc = _mask_crc(_crc32c(chunk)).to_bytes(4, "little")
        comp = snappy_compress(chunk)
        if len(comp) < len(chunk):
            payload, kind = crc + comp, 0x00
        else:
            payload, kind = crc + chunk, 0x01
        out.append(kind)
        out += len(payload).to_bytes(3, "little")
        out += payload
    return bytes(out)


def frame_decompress(data: bytes, cap: int | None = None) -> bytes:
    """Framing-format stream -> bytes; verifies the stream identifier,
    every chunk CRC, and (when ``cap`` is given) enforces the
    decompressed-size cap incrementally — a snappy bomb dies at the
    cap, not at allocation.  Skippable chunks (0x80-0xfd, 0xfe pad)
    are skipped; reserved unskippable types (0x02-0x7f) are errors,
    all per framing_format.txt."""
    if not data.startswith(_STREAM_ID):
        raise ValueError("missing snappy stream identifier")
    i = len(_STREAM_ID)
    out = bytearray()
    while i < len(data):
        if i + 4 > len(data):
            raise ValueError("truncated chunk header")
        kind = data[i]
        ln = int.from_bytes(data[i + 1:i + 4], "little")
        i += 4
        if i + ln > len(data):
            raise ValueError("truncated chunk payload")
        payload = data[i:i + ln]
        i += ln
        if kind in (0x00, 0x01):
            if ln < 4:
                raise ValueError("chunk too short for CRC")
            want = int.from_bytes(payload[:4], "little")
            if kind == 0x00:
                # validate the declared size BEFORE the pure-Python
                # decode: a chunk claiming more than the format's
                # 64 KiB limit dies here, never as a hundreds-of-MB
                # bytearray mid-decode (the chunk-bomb path)
                if _declared_length(payload[4:]) > _MAX_CHUNK:
                    raise ValueError(
                        "chunk exceeds 65536-byte format limit")
                chunk = snappy_decompress(payload[4:])
            else:
                chunk = bytes(payload[4:])
            if len(chunk) > _MAX_CHUNK:
                raise ValueError("chunk exceeds 65536-byte format limit")
            if _mask_crc(_crc32c(chunk)) != want:
                raise ValueError("snappy chunk CRC mismatch")
            out += chunk
            if cap is not None and len(out) > cap:
                raise ValueError("decompressed body exceeds limit")
        elif kind == 0xFF:
            if payload != _STREAM_ID[4:]:
                raise ValueError("bad repeated stream identifier")
        elif kind >= 0x80:
            continue                          # skippable / padding
        else:
            raise ValueError(f"reserved unskippable chunk 0x{kind:02x}")
    return bytes(out)
