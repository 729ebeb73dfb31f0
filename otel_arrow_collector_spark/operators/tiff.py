"""TIFF 6.0 baseline codec — grayscale/RGB 8-bit, uncompressed and
PackBits, both byte orders on decode.

Clean-room from the public TIFF 6.0 specification: the II/MM header,
IFD walk (12-byte entries: tag, type, count, inline-value-or-offset),
strip assembly (StripOffsets/StripByteCounts/RowsPerStrip), and the
PackBits scheme of Section 9 (control byte n: 0..127 copy n+1
literals, 129..255 repeat next byte 257-n times, 128 is a noop) —
pinned against the spec's own worked example in the tests.

Scope: the baseline profile a document-scan corpus actually contains —
8 bits per sample, 1 or 3 samples per pixel, Compression 1 (none) or
32773 (PackBits), PhotometricInterpretation 0/1/2 (WhiteIsZero inverts
on decode so callers always see BlackIsZero semantics).  Anything else
(LZW, JPEG-in-TIFF, tiles, planar) raises loudly.
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

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


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
    size = _TYPE_SIZES.get(vtype)
    if size is None:
        raise ValueError(f"unsupported IFD type {vtype}")
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
    if vtype == 1:
        return list(payload)
    raise ValueError(f"unhandled IFD type {vtype}")


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
        tags[tag] = _read_ifd_values(data, e, vtype, count, ent[8:12])
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_LENGTH][0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8] * spp)
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError(f"unsupported TIFF profile bits={bits} spp={spp}")
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported photometric {photo}")
    offs = tags[_TAG_STRIP_OFFSETS]
    cnts = tags[_TAG_STRIP_COUNTS]
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
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
        else:
            raster += packbits_decode(strip, rows * row_bytes)
    arr = np.frombuffer(bytes(raster), np.uint8)[:h * row_bytes]
    img = arr.reshape((h, w, 3) if spp == 3 else (h, w)).copy()
    if photo == 0:                        # WhiteIsZero -> invert
        img = (255 - img.astype(np.int16)).astype(np.uint8)
    return img


def tiff_encode(img: np.ndarray, packbits: bool = False,
                rows_per_strip: int | None = None) -> bytes:
    """(H, W[, 3]) uint8 -> little-endian baseline TIFF."""
    if img.ndim == 3 and img.shape[2] == 3:
        h, w, spp = img.shape
    elif img.ndim == 2:
        h, w = img.shape
        spp = 1
    else:
        raise ValueError(f"need (H, W) or (H, W, 3), got {img.shape}")
    rps = rows_per_strip or h
    row_bytes = w * spp
    flat = img.astype(np.uint8).tobytes()
    strips = []
    for r0 in range(0, h, rps):
        rows = min(rps, h - r0)
        chunk = flat[r0 * row_bytes:(r0 + rows) * row_bytes]
        strips.append(packbits_encode(chunk) if packbits else chunk)

    entries = []                         # (tag, type, count, values)
    entries.append((_TAG_WIDTH, 4, 1, [w]))
    entries.append((_TAG_LENGTH, 4, 1, [h]))
    entries.append((_TAG_BITS, 3, spp, [8] * spp))
    entries.append((_TAG_COMPRESSION, 3, 1, [32773 if packbits else 1]))
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
