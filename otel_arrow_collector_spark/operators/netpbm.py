"""Netpbm codecs (PBM/PGM/PPM, P1-P6) — the plainest image family in
existence and still the interchange format of OCR / document-scan
pipelines (pngtopnm | ... | pnmtopng is the classic Unix chain).

Clean-room from the public netpbm format specs (pbm(5)/pgm(5)/ppm(5)):
- header: magic P1..P6, then whitespace-separated width, height, and
  (except P1/P4) maxval; '#' comments may appear between tokens and are
  skipped; a SINGLE whitespace byte separates the header from binary
  raster data.
- P1/P2/P3: ASCII samples (P1 allows digits to run together).
- P4: packed bits, MSB first, each ROW padded to a whole byte;
  1 = black.
- P5/P6: binary samples, 1 byte per sample for maxval < 256 else
  2 bytes BIG-endian.

Encoders emit canonical binary variants (P4/P5/P6) plus ASCII P2.
"""

from __future__ import annotations

import numpy as np


def _tokens(data: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens starting at
    ``pos``, skipping '#' comments; returns (values, next_pos)."""
    out: list[int] = []
    i = pos
    while len(out) < n:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if i < len(data) and data[i] == ord("#"):
            while i < len(data) and data[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        out.append(int(data[i:j]))
        i = j
    return out, i


def netpbm_decode(data: bytes) -> tuple[np.ndarray, int]:
    """PNM bytes -> ((H, W) or (H, W, 3) uint8/uint16 array, maxval).
    P1/P4 bitmaps decode to 0/1 arrays with maxval 1 (1 = black, as the
    spec defines)."""
    if len(data) < 2 or data[0] != ord("P") or data[1] not in b"123456":
        raise ValueError("not a netpbm stream")
    kind = int(chr(data[1]))
    bitmap = kind in (1, 4)
    color = kind in (3, 6)
    nhdr = 2 if bitmap else 3
    hdr, pos = _tokens(data, nhdr, 2)
    w, h = hdr[0], hdr[1]
    maxval = 1 if bitmap else hdr[2]
    if w <= 0 or h <= 0 or not (1 <= maxval <= 65535):
        raise ValueError(f"bad netpbm geometry {w}x{h} maxval={maxval}")
    ns = w * h * (3 if color else 1)
    if kind in (2, 3):                      # ASCII samples
        vals, _ = _tokens(data, ns, pos)
        arr = np.array(vals)
    elif kind == 1:                         # ASCII bitmap: digits may touch
        vals = []
        i = pos
        while len(vals) < ns:
            if i >= len(data):
                raise ValueError("truncated P1 raster")
            c = data[i]
            if c in (ord("0"), ord("1")):
                vals.append(c - ord("0"))
            elif chr(c).isspace():
                pass
            elif c == ord("#"):
                while i < len(data) and data[i] not in (10, 13):
                    i += 1
            else:
                raise ValueError(f"bad P1 byte {c!r}")
            i += 1
        arr = np.array(vals)
    else:                                   # binary rasters
        raster = data[pos + 1:]             # single whitespace separator
        if kind == 4:
            rb = (w + 7) // 8
            if len(raster) < rb * h:
                raise ValueError("truncated P4 raster")
            rows = np.frombuffer(raster[:rb * h], np.uint8).reshape(h, rb)
            bits = np.unpackbits(rows, axis=1)[:, :w]
            arr = bits
        else:
            bps = 1 if maxval < 256 else 2
            need = ns * bps
            if len(raster) < need:
                raise ValueError("truncated raster")
            if bps == 1:
                arr = np.frombuffer(raster[:need], np.uint8)
            else:
                arr = np.frombuffer(raster[:need], ">u2").astype(np.uint16)
    if arr.max(initial=0) > maxval:
        raise ValueError("sample exceeds maxval")
    dt = np.uint8 if maxval < 256 else np.uint16
    arr = arr.astype(dt)
    shape = (h, w, 3) if color else (h, w)
    return arr.reshape(shape), maxval


def netpbm_encode(img: np.ndarray, kind: int, maxval: int = 255) -> bytes:
    """Array -> canonical PNM bytes.  kind: 2 (ASCII PGM), 4 (packed
    PBM; input is 0/1), 5 (binary PGM), 6 (binary PPM)."""
    if kind not in (2, 4, 5, 6):
        raise ValueError(f"unsupported netpbm kind P{kind}")
    if not 1 <= maxval <= 65535:
        # the PNM maxval token is specified as 0 < maxval < 65536; a
        # header outside that is bytes our own reader rejects
        raise ValueError(f"maxval must be 1..65535, got {maxval}")
    if img.size == 0:
        raise ValueError(f"netpbm needs a non-empty image, got shape "
                         f"{img.shape}")
    if kind == 6:
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("P6 needs (H, W, 3)")
        h, w = img.shape[:2]
    else:
        if img.ndim != 2:
            raise ValueError(f"P{kind} needs (H, W)")
        h, w = img.shape
    if kind == 4:
        if img.max(initial=0) > 1:
            raise ValueError("P4 needs 0/1 samples")
        head = f"P4\n{w} {h}\n".encode()
        body = np.packbits(img.astype(np.uint8), axis=1).tobytes()
        return head + body
    if img.max(initial=0) > maxval:
        raise ValueError("sample exceeds maxval")
    head = f"P{kind}\n{w} {h}\n{maxval}\n".encode()
    if kind == 2:
        lines = "\n".join(" ".join(str(int(v)) for v in row)
                          for row in img)
        return head + lines.encode() + b"\n"
    if maxval < 256:
        return head + img.astype(np.uint8).tobytes()
    return head + img.astype(">u2").tobytes()
