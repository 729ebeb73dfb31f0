"""TIFF 6.0 baseline codec — grayscale/RGB 8-bit, uncompressed and
PackBits, both byte orders on decode.

Clean-room from the public TIFF 6.0 specification: the II/MM header,
IFD walk (12-byte entries: tag, type, count, inline-value-or-offset),
strip assembly (StripOffsets/StripByteCounts/RowsPerStrip), and the
PackBits scheme of Section 9 (control byte n: 0..127 copy n+1
literals, 129..255 repeat next byte 257-n times, 128 is a noop) —
pinned against the spec's own worked example in the tests.

Scope: the profile a document-scan corpus actually contains — 8 bits
per sample, 1 or 3 samples per pixel, Compression 1 (none), 5 (LZW,
Section 13: MSB-first code packing, 9->12 bit widths with the
EarlyChange one-code-early bump, Clear=256/EOI=257) or 32773
(PackBits), PhotometricInterpretation 0/1/2 (WhiteIsZero inverts on
decode so callers always see BlackIsZero semantics).  Anything else
(JPEG-in-TIFF, tiles, planar, predictors) raises loudly.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

#: TIFF 6.0 field-type sizes (spec §2, "Types").  Real-world encoders
#: (libtiff, Pillow) attach ASCII (2: ImageDescription/Software) and
#: RATIONAL (5: XResolution/YResolution) tags to every file; the
#: decoder must tolerate all of these, not just the raster tags' BYTE/
#: SHORT/LONG.
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
               9: 4, 10: 8, 11: 4, 12: 8}


_LZW_CLEAR = 256
_LZW_EOI = 257


def lzw_encode(data: bytes) -> bytes:
    """TIFF Section-13 LZW: MSB-first variable-width codes, 9..12 bits,
    width bumps ONE CODE EARLY (EarlyChange, the TIFF/PDF convention),
    Clear emitted up front and whenever the table reaches 4094."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    def fresh():
        return {bytes([i]): i for i in range(256)}, _LZW_EOI + 1, 9

    table, nxt, width = fresh()
    put(_LZW_CLEAR, width)
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        table[cand] = nxt
        nxt += 1
        # EarlyChange: the ENCODER widens when the next code to be
        # assigned is 511/1023/2047 (one before the power of two)
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        cur = bytes([b])
        if nxt == 4094:
            put(_LZW_CLEAR, width)
            table, nxt, width = fresh()
    if cur:
        put(table[cur], width)
    put(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expect: int) -> bytes:
    """Inverse of lzw_encode; decodes exactly ``expect`` bytes."""
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0

    def get(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        return code

    def fresh():
        return ([bytes([i]) for i in range(256)] + [b"", b""], 9)

    table, width = fresh()
    prev = None
    while len(out) < expect:
        code = get(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table, width = fresh()
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out += entry
        prev = entry
        # decoder widens ONE ENTRY before the encoder's bump point:
        # the decoder's table lags the encoder's by one entry at the
        # moment it reads a code (it appends entry e while processing
        # the code AFTER the one whose emission created e), so the
        # encoder's "next code would be 511" is visible here as a
        # table of 510 entries (EarlyChange, TIFF 6.0 Section 13)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expect:
        raise ValueError("LZW output length mismatch")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Canonical greedy PackBits: runs of >= 3 identical bytes become
    repeat packets (max 128), everything else batches into literal
    packets (max 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal: extend until a >=3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if (k + 2 < n and data[k] == data[k + 1] == data[k + 2]):
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    """Decode exactly ``expect`` bytes of PackBits output."""
    out = bytearray()
    i = 0
    while len(out) < expect:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        c = data[i]
        i += 1
        if c == 128:                      # noop
            continue
        if c < 128:                       # c+1 literals
            out += data[i:i + c + 1]
            if len(data) < i + c + 1:
                raise ValueError("truncated PackBits literal")
            i += c + 1
        else:                             # repeat next byte 257-c times
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expect:
        raise ValueError("PackBits output overrun")
    return bytes(out)


def _read_ifd_values(data, e, vtype, count, raw):
    """Decode one IFD entry's values, or ``None`` for entry types the
    raster path has no use for (ASCII descriptions, signed/float types,
    private types) — externally produced files always carry such tags
    and must still decode (r6 ADVICE).  Only the numeric types the
    raster tags can legally use (BYTE/SHORT/LONG, plus RATIONAL as
    flattened numerator/denominator pairs) are interpreted."""
    size = _TYPE_SIZES.get(vtype)
    if size is None or vtype not in (1, 3, 4, 5):
        return None                       # unneeded type: skip, don't raise
    total = size * count
    if total <= 4:
        payload = raw[:total]
    else:
        off = struct.unpack(e + "I", raw)[0]
        payload = data[off:off + total]
        if len(payload) < total:
            raise ValueError("truncated IFD value")
    if vtype == 3:
        return list(struct.unpack(e + "H" * count, payload))
    if vtype == 4:
        return list(struct.unpack(e + "I" * count, payload))
    if vtype == 5:                        # RATIONAL: LONG num, LONG den
        return list(struct.unpack(e + "I" * (2 * count), payload))
    return list(payload)                  # vtype == 1 (BYTE)


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF bytes -> (H, W) or (H, W, 3) uint8 (BlackIsZero)."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    magic, ifd_off = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if len(data) < ifd_off + 2:
        raise ValueError("truncated IFD")
    n_entries = struct.unpack(e + "H", data[ifd_off:ifd_off + 2])[0]
    if len(data) < ifd_off + 2 + 12 * n_entries + 4:
        raise ValueError("truncated IFD entries")
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        ent = data[ifd_off + 2 + 12 * k: ifd_off + 14 + 12 * k]
        tag, vtype, count = struct.unpack(e + "HHI", ent[:8])
        vals = _read_ifd_values(data, e, vtype, count, ent[8:12])
        if vals is not None:
            tags[tag] = vals

    def req(tag: int, what: str) -> list[int]:
        if not tags.get(tag):             # absent, skipped type, count=0
            raise ValueError(f"missing or non-numeric required tag "
                             f"{what} ({tag})")
        return tags[tag]

    def opt(tag: int, default: int) -> int:
        vals = tags.get(tag)
        return int(vals[0]) if vals else default   # count=0 -> default

    w = req(_TAG_WIDTH, "ImageWidth")[0]
    h = req(_TAG_LENGTH, "ImageLength")[0]
    spp = opt(_TAG_SPP, 1)
    bits = tags.get(_TAG_BITS) or [8] * spp
    comp = opt(_TAG_COMPRESSION, 1)
    photo = opt(_TAG_PHOTOMETRIC, 1)
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError(f"unsupported TIFF profile bits={bits} spp={spp}")
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported photometric {photo}")
    offs = req(_TAG_STRIP_OFFSETS, "StripOffsets")
    cnts = req(_TAG_STRIP_COUNTS, "StripByteCounts")
    rps = opt(_TAG_ROWS_PER_STRIP, h)
    if rps <= 0:
        raise ValueError("bad RowsPerStrip")
    row_bytes = w * spp
    raster = bytearray()
    for si, (o, c) in enumerate(zip(offs, cnts)):
        strip = data[o:o + c]
        if len(strip) < c:
            raise ValueError("truncated strip")
        rows = min(rps, h - si * rps)
        if comp == 1:
            if c < rows * row_bytes:
                raise ValueError("short uncompressed strip")
            raster += strip[:rows * row_bytes]
        elif comp == 5:
            raster += lzw_decode(strip, rows * row_bytes)
        else:
            raster += packbits_decode(strip, rows * row_bytes)
    arr = np.frombuffer(bytes(raster), np.uint8)[:h * row_bytes]
    img = arr.reshape((h, w, 3) if spp == 3 else (h, w)).copy()
    if photo == 0:                        # WhiteIsZero -> invert
        img = (255 - img.astype(np.int16)).astype(np.uint8)
    return img


def tiff_encode(img: np.ndarray, packbits: bool = False,
                rows_per_strip: int | None = None,
                lzw: bool = False) -> bytes:
    """(H, W[, 3]) uint8 -> little-endian baseline TIFF
    (uncompressed, PackBits, or LZW)."""
    if packbits and lzw:
        raise ValueError("pick one compression")
    if img.ndim == 3 and img.shape[2] == 3:
        h, w, spp = img.shape
    elif img.ndim == 2:
        h, w = img.shape
        spp = 1
    else:
        raise ValueError(f"need (H, W) or (H, W, 3), got {img.shape}")
    if h == 0 or w == 0:
        # a zero-size strip grid is bytes our own reader rejects
        # (RowsPerStrip 0 is invalid baseline TIFF)
        raise ValueError(f"TIFF needs a non-empty image, got {h}x{w}")
    rps = rows_per_strip or h
    row_bytes = w * spp
    flat = img.astype(np.uint8).tobytes()
    strips = []
    for r0 in range(0, h, rps):
        rows = min(rps, h - r0)
        chunk = flat[r0 * row_bytes:(r0 + rows) * row_bytes]
        strips.append(packbits_encode(chunk) if packbits
                      else lzw_encode(chunk) if lzw else chunk)

    entries = []                         # (tag, type, count, values)
    entries.append((_TAG_WIDTH, 4, 1, [w]))
    entries.append((_TAG_LENGTH, 4, 1, [h]))
    entries.append((_TAG_BITS, 3, spp, [8] * spp))
    entries.append((_TAG_COMPRESSION, 3, 1,
                    [32773 if packbits else 5 if lzw else 1]))
    entries.append((_TAG_PHOTOMETRIC, 3, 1, [2 if spp == 3 else 1]))
    entries.append((_TAG_STRIP_OFFSETS, 4, len(strips), None))  # patched
    entries.append((_TAG_SPP, 3, 1, [spp]))
    entries.append((_TAG_ROWS_PER_STRIP, 4, 1, [rps]))
    entries.append((_TAG_STRIP_COUNTS, 4, len(strips),
                    [len(s) for s in strips]))

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_size       # overflow value area
    extra = bytearray()

    def values_bytes(vtype, vals):
        fmt = {3: "H", 4: "I"}[vtype]
        return b"".join(struct.pack("<" + fmt, v) for v in vals)

    # first pass: lay out overflow areas (strip offsets patched after)
    layout = []
    for tag, vtype, count, vals in entries:
        size = _TYPE_SIZES[vtype] * count
        if size > 4:
            layout.append((tag, vtype, count, vals, extra_off + len(extra)))
            extra += (b"\x00" * size if vals is None
                      else values_bytes(vtype, vals))
        else:
            layout.append((tag, vtype, count, vals, None))
    data_off = extra_off + len(extra)
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, vtype, count, vals, ovf in layout:
        if tag == _TAG_STRIP_OFFSETS:
            vals = strip_offs
        raw = (struct.pack("<I", ovf) if ovf is not None
               else values_bytes(vtype, vals).ljust(4, b"\x00"))
        out += struct.pack("<HHI", tag, vtype, count) + raw
    out += struct.pack("<I", 0)          # no next IFD
    # overflow area with strip offsets patched in
    epos = 0
    for tag, vtype, count, vals, ovf in layout:
        if ovf is None:
            continue
        size = _TYPE_SIZES[vtype] * count
        if tag == _TAG_STRIP_OFFSETS:
            extra[epos:epos + size] = values_bytes(vtype, strip_offs)
        epos += size
    out += extra
    for s in strips:
        out += s
    return bytes(out)
