"""QOI ("Quite OK Image") codec — the 2022 single-page public spec
(qoiformat.org/qoi-specification.pdf), both directions.

QOI is the lossless format edge pipelines like for cheap intermediate
image storage: byte-oriented, single-pass, no entropy coder.  The
encoder follows the reference qoi.h greedy chunk order exactly
(RUN > INDEX > DIFF > LUMA > RGB/RGBA), so output is byte-identical to
the reference implementation for any input; tests pin hand-derived
chunk vectors from the spec plus exhaustive round-trips.

Wire format (all big-endian):
- header: "qoif", width u32, height u32, channels u8 (3|4),
  colorspace u8
- chunks: QOI_OP_RGB 0xFE, QOI_OP_RGBA 0xFF,
  QOI_OP_INDEX 0b00iiiiii (hash (3r+5g+7b+11a) % 64),
  QOI_OP_DIFF 0b01_dr_dg_db (2-bit, bias 2, alpha unchanged),
  QOI_OP_LUMA 0b10_dddddd + drdg<<4|dbdg (dg bias 32, dr-dg / db-dg
  bias 8, alpha unchanged),
  QOI_OP_RUN 0b11_rrrrrr (1..62, bias -1)
- end marker: seven 0x00 bytes then 0x01
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def qoi_encode(img: np.ndarray, colorspace: int = 0) -> bytes:
    """(H, W, 3|4) uint8 -> QOI bytes (reference-encoder chunk order)."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"need (H, W, 3|4) uint8, got {img.shape}")
    h, w, ch = img.shape
    out = bytearray(_MAGIC + struct.pack(">IIBB", w, h, ch, colorspace))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, ch).astype(np.int32)
    for px in flat:
        if ch == 4:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), int(px[3])
        else:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), pa
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hx = _hash(r, g, b, a)
        if index[hx] == (r, g, b, a):
            out.append(hx)
        else:
            index[hx] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                dr_dg = dr - dg
                db_dg = db - dg
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4)
                               | ((dg + 2) << 2) | (db + 2))
                elif (-32 <= dg <= 31 and -8 <= dr_dg <= 7
                      and -8 <= db_dg <= 7):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def qoi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """QOI bytes -> ((H, W, channels) uint8, colorspace)."""
    if data[:4] != _MAGIC or len(data) < 14:
        raise ValueError("not a QOI stream")
    w, h, ch, colorspace = struct.unpack(">IIBB", data[4:14])
    if ch not in (3, 4):
        raise ValueError(f"bad channel count {ch}")
    n = w * h
    px = np.empty((n, 4), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i, pos = 14, 0
    while pos < n:
        if i >= len(data) - 8:
            raise ValueError("truncated QOI stream")
        op = data[i]
        i += 1
        if op == 0xFE:
            r, g, b = data[i], data[i + 1], data[i + 2]
            i += 3
        elif op == 0xFF:
            r, g, b, a = data[i], data[i + 1], data[i + 2], data[i + 3]
            i += 4
        elif op >> 6 == 0:                      # INDEX
            r, g, b, a = index[op]
        elif op >> 6 == 1:                      # DIFF
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            b = (b + (op & 3) - 2) % 256
        elif op >> 6 == 2:                      # LUMA
            dg = (op & 0x3F) - 32
            b2 = data[i]
            i += 1
            r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (b2 & 0xF) - 8) % 256
        else:                                   # RUN
            cnt = (op & 0x3F) + 1
            px[pos:pos + cnt] = (r, g, b, a)
            pos += cnt
            continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        px[pos] = (r, g, b, a)
        pos += 1
    if pos != n:
        raise ValueError(f"pixel overflow: {pos} != {n}")
    if data[i:i + 8] != _END:
        raise ValueError("missing QOI end marker")
    img = px.reshape(h, w, 4)
    return (img if ch == 4 else img[:, :, :3]).copy(), colorspace
