"""PNM codec (P5 binary graymap / P6 binary pixmap) — the reference's
``frmts/pnm/pnmdataset.cpp`` raw netpbm driver: magic + ASCII dims +
maxval, then raw big-endian samples (single byte at maxval 255).

Pure numpy, byte-exact: PNM is uncompressed, so encode/decode round-trips
are lossless by construction.
"""

from __future__ import annotations

import numpy as np


def encode_pnm(arr: np.ndarray) -> bytes:
    """HxW / HxWx1 -> P5, HxWx3 -> P6 (uint8, maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    h, w = a.shape[:2]
    if a.ndim == 2:
        return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()
    if a.ndim == 3 and a.shape[2] == 3:
        return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()
    raise ValueError(f"PNM supports 1 or 3 bands, got shape {a.shape}")


def decode_pnm(data: bytes) -> np.ndarray:
    """P5/P6 bytes -> HxWxC uint8 (C=1 gray, C=3 RGB). Handles comment
    lines (#) and arbitrary whitespace in the header, per the netpbm spec
    (pnmdataset.cpp token scan)."""
    buf = bytes(data)
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM payload: {buf[:2]!r}")
    nbands = 1 if buf[:2] == b"P5" else 3
    # scan three header tokens (w, h, maxval) past comments/whitespace
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        toks.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval, then raster data
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    a = np.frombuffer(buf, dtype=np.uint8, count=w * h * nbands, offset=pos)
    return a.reshape(h, w, nbands)
