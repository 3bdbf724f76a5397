"""Audio/video multimodal operators vs numpy replay of the fake codecs."""

import numpy as np
import pytest

from gdal_spark.codecs.av import decode_audio, decode_frame, video_meta
from gdal_spark.fixtures.media import generate_media_pdf, media_df


class TestMedia:
    def test_audio_features_match_numpy(self, spark):
        from gdal_spark.operators.media import audio_features

        pdf = generate_media_pdf(10)
        got = audio_features(media_df(spark, 10)).toPandas().set_index("media_id")
        for r in pdf.itertuples(index=False):
            s, sr = decode_audio(r.audio)
            x = s.astype(np.float64)
            row = got.loc[r.media_id]
            assert row["duration_s"] == pytest.approx(round(x.size / sr, 6))
            assert row["rms"] == pytest.approx(np.sqrt((x * x).mean()), rel=1e-6)
            assert row["peak"] == np.abs(s).max()
            zc = int(((x[:-1] < 0) & (x[1:] >= 0)).sum()
                     + ((x[:-1] >= 0) & (x[1:] < 0)).sum())
            assert row["zero_crossings"] == zc

    def test_video_frame_sample_and_resize(self, spark):
        from gdal_spark.operators.media import video_frame_sample
        from gdal_spark.oracle.checksum import checksum_image
        from gdal_spark.oracle.resample import scale_to_tile

        pdf = generate_media_pdf(6)
        got = video_frame_sample(media_df(spark, 6), every_n=3).toPandas()
        for r in pdf.itertuples(index=False):
            w, h, n, fps, seed = video_meta(r.video)
            sub = got[got.media_id == r.media_id].sort_values("frame_idx")
            assert list(sub["frame_idx"]) == list(range(0, n, 3))
            for rr in sub.itertuples(index=False):
                frame = decode_frame(r.video, rr.frame_idx)
                assert rr.cs == checksum_image(frame)[0]
                assert rr.fmean == pytest.approx(frame.mean(), abs=1e-6)
        # resize path runs the warp kernels per frame
        rez = video_frame_sample(media_df(spark, 3), every_n=4,
                                 resize_to=16, method="average").toPandas()
        r0 = generate_media_pdf(3).iloc[0]
        f0 = scale_to_tile(decode_frame(r0.video, 0), 16, "average")
        rrow = rez[(rez.media_id == r0.media_id) & (rez.frame_idx == 0)].iloc[0]
        assert rrow["cs"] == checksum_image(f0)[0]

    def test_codec_errors(self):
        with pytest.raises(ValueError):
            decode_audio(b"XXXX" + b"\0" * 12)
        pdf = generate_media_pdf(1)
        with pytest.raises(IndexError):
            decode_frame(pdf.iloc[0].video, 99)
