"""Deterministic synthetic audio+video media table (multimodal columns):
every field a pure function of the row index, like fixtures/images.py, so
Spark generates rows in parallel and the DuckDB oracle can replay the
payload formulas exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..codecs.av import encode_audio, encode_video

SR_CYCLE = (8000, 16000)
VID_W_CYCLE = (32, 64)
VID_H_CYCLE = (24, 48)
FPS_CYCLE = (5, 10)


def n_samples_of(i: int) -> int:
    return 1000 + (i % 7) * 500


def n_frames_of(i: int) -> int:
    return 10 + (i % 11)


def generate_media_pdf(n: int) -> pd.DataFrame:
    rows = []
    for i in range(n):
        rows.append(dict(
            media_id=f"med{i:06d}",
            audio=encode_audio(SR_CYCLE[i % 2], n_samples_of(i), i),
            video=encode_video(VID_W_CYCLE[i % 2], VID_H_CYCLE[i % 2],
                               n_frames_of(i), FPS_CYCLE[i % 2], i),
        ))
    return pd.DataFrame(rows)


def media_df(spark, n: int):
    return spark.createDataFrame(generate_media_pdf(n))
