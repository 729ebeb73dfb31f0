"""LZ4 block codec (LZ4_RAW in parquet) — clean-room from the public
LZ4 block format description (lz4_Block_format.md):

A block is a series of sequences: a token byte (literal-length nibble
<< 4 | match-length nibble), optional 255-continued length extension
bytes, the literals, then a 2-byte little-endian match offset
(1..65535) and optional match-length extensions; match lengths are
nibble+4 (minmatch 4).  The final sequence is literals-only.  The spec
pins two encoder-side end rules the decoder may rely on: the last 5
bytes are always literals, and the last match must start at least 12
bytes before the end of the block.

Interop pinned BOTH directions against pyarrow's bundled lz4
(codec='lz4_raw'): our decoder reads its output, its decoder reads
ours — tests/test_lz4.py.
"""

from __future__ import annotations

_MIN_MATCH = 4
_LAST_LITERALS = 5
_MATCH_GUARD = 12


def _write_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def lz4_compress(data: bytes) -> bytes:
    """Greedy hash-match encoder -> valid LZ4 block."""
    n = len(data)
    out = bytearray()
    i = 0
    lit_start = 0
    table: dict[int, int] = {}
    limit = n - _MATCH_GUARD            # last match must start before
    while i + _MIN_MATCH <= n and i < limit:
        key = int.from_bytes(data[i:i + 4], "little")
        cand = table.get(key)
        table[key] = i
        if (cand is not None and i - cand <= 0xFFFF
                and data[cand:cand + 4] == data[i:i + 4]):
            j = i + 4
            k = cand + 4
            stop = n - _LAST_LITERALS   # match may not eat the tail
            while j < stop and data[j] == data[k]:
                j += 1
                k += 1
            lit = data[lit_start:i]
            mlen = j - i
            tok_lit = 15 if len(lit) >= 15 else len(lit)
            tok_m = 15 if mlen - 4 >= 15 else mlen - 4
            out.append((tok_lit << 4) | tok_m)
            if tok_lit == 15:
                _write_len(out, len(lit) - 15)
            out += lit
            out += (i - cand).to_bytes(2, "little")
            if tok_m == 15:
                _write_len(out, mlen - 4 - 15)
            i = j
            lit_start = i
        else:
            i += 1
    # final literals-only sequence
    lit = data[lit_start:]
    tok_lit = 15 if len(lit) >= 15 else len(lit)
    out.append(tok_lit << 4)
    if tok_lit == 15:
        _write_len(out, len(lit) - 15)
    out += lit
    return bytes(out)


def lz4_decompress(data: bytes, expect: int) -> bytes:
    """LZ4 block -> exactly ``expect`` bytes; ValueError on malformed
    streams."""
    out = bytearray()
    i = 0
    nd = len(data)

    def read_ext(base: int) -> int:
        nonlocal i
        n = base
        if base == 15:
            while True:
                if i >= nd:
                    raise ValueError("truncated length extension")
                b = data[i]
                i += 1
                n += b
                if b != 255:
                    break
        return n

    while i < nd:
        token = data[i]
        i += 1
        lit_len = read_ext(token >> 4)
        if i + lit_len > nd:
            raise ValueError("truncated literals")
        out += data[i:i + lit_len]
        i += lit_len
        if i >= nd:
            break                       # final literals-only sequence
        if i + 2 > nd:
            raise ValueError("truncated offset")
        off = int.from_bytes(data[i:i + 2], "little")
        i += 2
        if off == 0 or off > len(out):
            raise ValueError(f"bad match offset {off}")
        mlen = read_ext(token & 0xF) + _MIN_MATCH
        for _ in range(mlen):           # overlap-safe
            out.append(out[-off])
    if len(out) != expect:
        raise ValueError(f"length mismatch: {len(out)} != {expect}")
    return bytes(out)
