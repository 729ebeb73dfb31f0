"""POSIX ustar tar archiver — the other container document corpora
arrive in (bundle-of-files dumps, model-checkpoint shards).

Clean-room from the public POSIX.1-1988 ustar layout: 512-byte header
blocks (name 100, mode 8, uid 8, gid 8, size 12 octal, mtime 12 octal,
chksum 8, typeflag 1, linkname 100, magic "ustar\\0" + version "00",
uname 32, gname 32, devmajor 8, devminor 8, prefix 155, pad 12); the
checksum is the byte sum of the header with the chksum field treated
as 8 spaces; payloads pad to 512-byte blocks; the archive ends with
two zero blocks.  Optional whole-stream gzip (.tar.gz).
"""

from __future__ import annotations

import zlib

_BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    # the field holds width-1 octal digits + NUL; a value outside that
    # range would silently corrupt the 512-byte header grid
    if not 0 <= n < 8 ** (width - 1):
        raise ValueError(f"value {n} does not fit a {width}-byte ustar "
                         f"octal field")
    return f"{n:0{width - 1}o}".encode() + b"\x00"


def tar_pack(members: list[tuple[str, bytes]],
             gzip_stream: bool = False, mtime: int = 0) -> bytes:
    """[(name, payload)] -> ustar bytes (optionally gzipped whole)."""
    out = bytearray()
    for name, payload in members:
        nb = name.encode()
        prefix = b""
        if len(nb) > 100:
            # ustar long-path split (POSIX.1-1988): prefix holds the
            # leading directories (<=155 bytes), name the remainder
            # (<=100), joined at a '/' — the same split CPython's
            # tarfile performs.  The search window is bounded on BOTH
            # sides: the slash must leave <=100 bytes of name (start)
            # and <=155 bytes of prefix (end), so a legal earlier
            # slash is found even when a later one sits past byte 155.
            cut = nb.rfind(b"/", max(0, len(nb) - 101),
                           min(156, len(nb) - 1))
            if cut <= 0 or cut > 155:
                raise ValueError(f"name too long for ustar: {name!r}")
            prefix, nb = nb[:cut], nb[cut + 1:]
            if len(prefix) > 155 or len(nb) > 100:
                raise ValueError(f"name too long for ustar: {name!r}")
        hdr = bytearray(_BLOCK)
        hdr[0:len(nb)] = nb
        hdr[345:345 + len(prefix)] = prefix
        hdr[100:108] = _octal(0o644, 8)
        hdr[108:116] = _octal(0, 8)
        hdr[116:124] = _octal(0, 8)
        hdr[124:136] = _octal(len(payload), 12)
        hdr[136:148] = _octal(mtime, 12)
        hdr[148:156] = b" " * 8                  # chksum placeholder
        hdr[156:157] = b"0"                      # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
        out += hdr
        out += payload
        pad = -len(payload) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    if gzip_stream:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)


def tar_unpack(data: bytes) -> list[tuple[str, bytes]]:
    """ustar bytes (plain or gzipped) -> [(name, payload)]; verifies
    magic and checksum, raises ValueError on malformed input."""
    if data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + 15)
        try:
            data = d.decompress(data)
        except zlib.error as ex:
            raise ValueError(f"bad gzip stream: {ex}") from None
        if not d.eof:
            raise ValueError("truncated gzip stream")
    out = []
    pos = 0
    while True:
        hdr = data[pos:pos + _BLOCK]
        if len(hdr) < _BLOCK:
            raise ValueError("truncated tar header")
        if hdr == b"\x00" * _BLOCK:              # end-of-archive
            return out
        if hdr[257:262] != b"ustar":
            raise ValueError(f"bad ustar magic at {pos}")
        stored = int(hdr[148:156].rstrip(b"\x00 ") or b"0", 8)
        calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
        if stored != calc:
            raise ValueError(f"tar checksum mismatch at {pos}")
        name = hdr[:100].rstrip(b"\x00").decode()
        # ustar prefix field (bytes 345..500): CPython tarfile splits
        # >100-char paths into prefix + name; rejoin or the path is
        # silently truncated.
        prefix = hdr[345:500].rstrip(b"\x00").decode()
        if prefix:
            name = prefix + "/" + name
        size = int(hdr[124:136].rstrip(b"\x00 ") or b"0", 8)
        body_at = pos + _BLOCK
        payload = data[body_at:body_at + size]
        if len(payload) < size:
            raise ValueError("truncated tar payload")
        out.append((name, payload))
        pos = body_at + size + (-size % _BLOCK)
