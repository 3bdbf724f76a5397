"""Deterministic fake audio/video codecs — the multimodal-column plumbing
mandated for the training-data engine.

No audio/video libraries exist in this container, so (exactly like the
FAKJ/FAKW image stand-ins) the CONTAINERS are real — magic bytes, header
with sample-rate / frame geometry, payload layout — while the payload is a
deterministic pure function of the header, so every downstream feature
(RMS, zero crossings, frame statistics) has a closed form the DuckDB
oracle can replay. Swapping in real codecs (ffmpeg/soundfile) changes ONLY
`decode_*`; the Spark-side schema, batching, and operators are unchanged.

* FAKA (audio): ``b"FAKA" + <I sample_rate> + <I n_samples> + <I seed>``,
  int16 PCM ``s[k] = (((k * 37 + seed * 13) % 256) - 128) * 64``.
* FAKV (video): ``b"FAKV" + <HHHH w h n_frames fps> + <I seed>``, one
  uint8 gray frame per index f with pixel ``(k + 7*f + seed) % 256`` for
  flat index k (the make_pixels band-1 convention per frame).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    return struct.pack("<4sIII", b"FAKA", sample_rate, n_samples, seed)


def decode_audio(data: bytes):
    """-> (samples int16 ndarray, sample_rate)."""
    magic, sr, n, seed = struct.unpack_from("<4sIII", data, 0)
    if magic != b"FAKA":
        raise ValueError("not a FAKA audio payload")
    k = np.arange(n, dtype=np.int64)
    s = (((k * 37 + seed * 13) % 256) - 128) * 64
    return s.astype(np.int16), sr


def encode_video(w: int, h: int, n_frames: int, fps: int, seed: int) -> bytes:
    return struct.pack("<4sHHHHI", b"FAKV", w, h, n_frames, fps, seed)


def video_meta(data: bytes):
    magic, w, h, n, fps, seed = struct.unpack_from("<4sHHHHI", data, 0)
    if magic != b"FAKV":
        raise ValueError("not a FAKV video payload")
    return w, h, n, fps, seed


def decode_frame(data: bytes, f: int) -> np.ndarray:
    """Decode ONE frame (h, w) uint8 — frame-addressable like a real
    container's seek+decode; whole-video decode never materializes."""
    w, h, n, fps, seed = video_meta(data)
    if not 0 <= f < n:
        raise IndexError(f"frame {f} of {n}")
    k = np.arange(h * w, dtype=np.int64)
    return ((k + 7 * f + seed) % 256).astype(np.uint8).reshape(h, w)
