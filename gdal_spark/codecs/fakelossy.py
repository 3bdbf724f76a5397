"""Deterministic stand-in lossy codecs for ``jpeg`` / ``webp``.

This container ships no image libraries (no Pillow / libjpeg / libwebp), so —
per the build contract — the lossy decode step is a clearly-marked
deterministic fake: the Spark-side plumbing (binary column, fmt dispatch,
Arrow batch shape, PSNR gate) is real; the bit-level codec is not.

Format: magic ``FAKJ``/``FAKW`` + header (h, w, channels, quant step) +
zlib-compressed quantized pixels. Quantization step q loses information like
a real lossy codec (uniform quantizer, MSE ≈ q²/12 → PSNR ≈ 59 dB for q=2,
well above the 40 dB gate), is deterministic, and round-trips stably
(decode(encode(decode(x))) == decode(x)).

Swap in Pillow-backed real codecs via ``gdal_spark.codecs.registry`` when the
environment provides them (import-gated there).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = {"jpeg": b"FAKJ", "webp": b"FAKW"}
_QUANT = {"jpeg": 4, "webp": 2}  # per-format quantization step


def encode_fake_lossy(arr: np.ndarray, fmt: str) -> bytes:
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("fake lossy codec: uint8 only")
    if a.ndim == 2:
        h, w, c = a.shape[0], a.shape[1], 1
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w, c = a.shape[0], a.shape[1], 3
    else:
        raise ValueError(f"unsupported shape {a.shape}")
    q = _QUANT[fmt]
    # mid-rise uniform quantizer: x -> q * floor(x/q) + q//2, clipped
    quant = np.clip((a // q) * q + q // 2, 0, 255).astype(np.uint8)
    header = _MAGIC[fmt] + struct.pack(">IIBB", h, w, c, q)
    return header + zlib.compress(quant.tobytes(), 6)


def decode_fake_lossy(data: bytes) -> np.ndarray:
    magic = data[:4]
    if magic not in _MAGIC.values():
        raise ValueError("not a fake-lossy payload")
    h, w, c, _q = struct.unpack(">IIBB", data[4:14])
    a = np.frombuffer(zlib.decompress(data[14:]), dtype=np.uint8)
    return a.reshape(h, w) if c == 1 else a.reshape(h, w, c)
