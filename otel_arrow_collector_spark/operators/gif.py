"""GIF87a/89a codec — dependency-free, numpy-assisted, both directions.

Clean-room implementation of the public GIF specification (CompuServe
GIF89a, 1990; W3C mirror) — the remaining still-image container a
training-data pipeline meets after BMP/PNG/JPEG.  Scope:

- :func:`encode_gif` — palettized single-frame GIF from RGB24 pixels
  (<=256 unique colors; loud error otherwise — GIF is palette-only by
  spec, quantization is a modeling choice we refuse to make silently),
  optional row interlace, variable-width LZW with clear/EOI codes.
- :func:`decode_gif` — header + logical screen descriptor, global AND
  local color tables, 89a extension blocks (GCE/comment/app) skipped
  structurally, four-pass interlace undone, full LZW decoder with
  12-bit code growth and mid-stream CLEAR resets.

LZW details follow the spec's Appendix F: initial code width is
``min_code_size+1``; CLEAR = ``1<<min_code_size``; EOI = CLEAR+1; the
dictionary grows by one entry per emitted code and the width bumps when
the next assignable code crosses a power of two, capping at 12 bits
(the encoder emits CLEAR and restarts rather than freezing — both
behaviors decode identically).

Reference parity note: the otel-arrow reference ships no media codecs;
this module extends the engine's multimodal family (SURVEY.md LLM-ops
north star) alongside operators/jpeg.py.
"""

from __future__ import annotations

import numpy as np

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

class _BitWriter:
    """LSB-first bit packer (GIF packs codes little-endian within bytes)."""

    def __init__(self):
        self._acc = 0
        self._nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> None:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW: emit CLEAR, then greedy longest-match codes, growing the
    code width as the table fills; CLEAR+reset at the 4096 cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh():
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    bw.write(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        bw.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        elif next_code > (1 << _MAX_CODE_WIDTH):
            bw.write(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([b])
    if prefix:
        bw.write(table[prefix], width)
    bw.write(eoi, width)
    bw.flush()
    return bytes(bw.out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`lzw_encode`; tolerates deferred CLEARs and the
    standard KwKwK first-use case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = nbits = pos = 0
    out = bytearray()

    def fresh():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = fresh()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):          # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def encode_gif(pixels: bytes, width: int, height: int, *,
               interlace: bool = False) -> bytes:
    """RGB24 pixels (row-major, 3*width*height bytes) -> single-frame
    GIF89a with a global color table.  >256 unique colors is a loud
    error (palette quantization is the caller's decision)."""
    if not (0 <= width <= 65535 and 0 <= height <= 65535):
        # logical-screen / image-descriptor fields are 16-bit (GIF89a
        # spec §18): beyond that struct.pack would overflow
        raise ValueError(f"GIF dimensions must be 0..65535, got "
                         f"{width}x{height}")
    if len(pixels) != 3 * width * height:
        raise ValueError("pixel buffer does not match geometry")
    px = np.frombuffer(pixels, np.uint8).reshape(height * width, 3)
    colors, inverse = np.unique(px, axis=0, return_inverse=True)
    n = len(colors)
    if n > 256:
        raise ValueError(f"GIF needs a <=256-color palette, got {n}")
    # palette size field is log2(entries); entries padded to a power of 2
    gct_bits = max(1, int(n - 1).bit_length())
    entries = 1 << gct_bits
    palette = np.zeros((entries, 3), np.uint8)
    palette[:n] = colors
    indices = inverse.astype(np.uint8).reshape(height, width)
    if interlace:
        indices = indices[_interlace_order(height)]
    min_code_size = max(2, gct_bits)
    lzw = lzw_encode(indices.tobytes(), min_code_size)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1))  # GCT flag
    out += b"\x00\x00"                       # background idx, aspect
    out += palette.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"     # image descriptor at (0,0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)  # no LCT; interlace flag
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):        # data sub-blocks
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"                       # block terminator, trailer
    return bytes(out)


def _byte(payload: bytes, pos: int) -> int:
    """Bounds-checked byte read: truncation is a ValueError, never an
    IndexError escaping to the caller (fuzz contract)."""
    if pos >= len(payload):
        raise ValueError("truncated GIF")
    return payload[pos]


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """GIF -> (width, height, RGB24 bytes) of the FIRST image frame."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = _byte(payload, 10)
    pos = 13
    gct = None
    if flags & 0x80:
        entries = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * entries],
                            np.uint8).reshape(entries, 3)
        pos += 3 * entries
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                    # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:                    # extension: label + subblocks
            pos += 1
            while _byte(payload, pos):
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        iw = int.from_bytes(payload[pos + 4:pos + 6], "little")
        ih = int.from_bytes(payload[pos + 6:pos + 8], "little")
        iflags = _byte(payload, pos + 8)
        pos += 9
        table = gct
        if iflags & 0x80:                    # local color table
            entries = 2 << (iflags & 0x07)
            table = np.frombuffer(payload[pos:pos + 3 * entries],
                                  np.uint8).reshape(entries, 3)
            pos += 3 * entries
        if table is None:
            raise ValueError("GIF image without any color table")
        min_code_size = _byte(payload, pos)
        pos += 1
        data = bytearray()
        while _byte(payload, pos):
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(lzw_decode(bytes(data), min_code_size),
                            np.uint8)
        if len(idx) != iw * ih:
            raise ValueError(
                f"LZW yielded {len(idx)} indices for {iw}x{ih}")
        rows = idx.reshape(ih, iw)
        if iflags & 0x40:                    # undo 4-pass interlace
            order = _interlace_order(ih)
            deinter = np.empty_like(rows)
            deinter[order] = rows
            rows = deinter
        if int(rows.max(initial=0)) >= len(table):
            raise ValueError("palette index out of range")
        rgb = table[rows.reshape(-1)]
        return iw, ih, rgb.tobytes()
    raise ValueError("truncated GIF (no trailer)")
