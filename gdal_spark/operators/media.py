"""Audio / video operators over opaque binary media columns — the
multimodal training-data plumbing (task mandate: decode / feature-extract /
resize / frame-sample as Arrow-batched UDFs; the fake codecs in
codecs/av.py keep the payloads deterministic, the Spark shapes are real).

Execution shapes:
* audio features: map-only `mapInPandas` over media rows, numpy per clip —
  the audio twin of image_decode_stats;
* video frame sampling: the media row EXPLODES to one row per sampled
  frame (a generator UDF — frames never exist before their row does), each
  frame decoded independently and optionally resized with the warp
  kernels; downstream joins/groupBys see plain frame rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..codecs.av import decode_audio, decode_frame, video_meta
from ..oracle.checksum import checksum_image
from ..oracle.resample import scale_to_tile


def audio_features(media: DataFrame, audio_col: str = "audio",
                   id_col: str = "media_id") -> DataFrame:
    """Per-clip audio features: duration, mean, RMS, peak, zero-crossing
    count — computed on the decoded PCM inside the batch."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                s, sr = decode_audio(bytes(getattr(r, audio_col)))
                x = s.astype(np.float64)
                zc = int(((x[:-1] < 0) & (x[1:] >= 0)).sum()
                         + ((x[:-1] >= 0) & (x[1:] < 0)).sum()) if x.size > 1 else 0
                out.append(dict(
                    media_id=getattr(r, id_col),
                    duration_s=float(np.round(x.size / sr, 6)),
                    mean_amp=float(np.round(x.mean(), 6)) if x.size else 0.0,
                    rms=float(np.round(np.sqrt((x * x).mean()), 6)) if x.size else 0.0,
                    peak=int(np.abs(s).max()) if x.size else 0,
                    zero_crossings=zc,
                ))
            yield pd.DataFrame(
                out, columns=["media_id", "duration_s", "mean_amp", "rms",
                              "peak", "zero_crossings"]
            )

    return media.select(id_col, audio_col).mapInPandas(
        gen,
        schema="media_id string, duration_s double, mean_amp double, "
               "rms double, peak int, zero_crossings long",
    )


def video_frame_sample(media: DataFrame, every_n: int = 5,
                       video_col: str = "video", id_col: str = "media_id",
                       resize_to: int | None = None,
                       method: str = "nearest") -> DataFrame:
    """Sample every ``every_n``-th frame of each video into its own row
    (frame index, per-frame mean + checksum), optionally resized with the
    warp kernel set — the frame-extraction front of a video training
    pipeline."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                blob = bytes(getattr(r, video_col))
                w, h, n, fps, seed = video_meta(blob)
                for f in range(0, n, every_n):
                    frame = decode_frame(blob, f)
                    if resize_to is not None:
                        frame = scale_to_tile(frame, resize_to, method)
                    out.append(dict(
                        media_id=getattr(r, id_col),
                        frame_idx=int(f),
                        t_sec=float(np.round(f / fps, 6)),
                        fmean=float(np.round(frame.astype(np.float64).mean(), 6)),
                        cs=checksum_image(frame)[0],
                    ))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "t_sec", "fmean", "cs"]
            )

    return media.select(id_col, video_col).mapInPandas(
        gen,
        schema="media_id string, frame_idx int, t_sec double, "
               "fmean double, cs long",
    )
