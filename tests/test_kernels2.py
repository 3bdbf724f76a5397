"""Second kernel batch: cubic/lanczos/average/mode resampling, contour,
fill-nodata, union/symdifference/update layer algebra."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.oracle import resample as RS
from gdal_spark.oracle.contour import contour_segments, contour_summary, fill_nodata


class TestKernels:
    def test_cubic_constant_preserved(self):
        a = np.full((16, 16), 99, dtype=np.uint8)
        assert (RS.resample_convolve(a, 7, 11, "cubic") == 99).all()

    def test_lanczos_constant_preserved(self):
        a = np.full((16, 16), 42, dtype=np.uint8)
        assert (RS.resample_convolve(a, 32, 8, "lanczos") == 42).all()

    def test_cubic_identity(self):
        a = (np.arange(256) % 251).astype(np.uint8).reshape(16, 16)
        out = RS.resample_convolve(a, 16, 16, "cubic")
        # identity resize: kernel centered on each sample -> exact
        np.testing.assert_array_equal(out, a)

    def test_cubic_linear_ramp(self):
        # cubic interpolation reproduces linear ramps exactly (interior)
        a = np.tile(np.arange(0, 128, 2, dtype=np.float64), (8, 1))
        out = RS.resample_convolve(a, 8, 128, "cubic")
        exp = (np.arange(128) + 0.5) * 0.5 - 0.5
        exp = np.clip(exp * 2.0, 0, 126)
        np.testing.assert_allclose(out[:, 4:-4], np.tile(exp, (8, 1))[:, 4:-4],
                                   atol=1e-9)

    def test_average_exact(self):
        a = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = RS.resample_average(a, 2, 2)
        exp = np.array([[2.5, 4.5], [10.5, 12.5]])
        np.testing.assert_array_equal(out, np.floor(exp + 0.5).astype(np.uint8))

    def test_average_3band(self):
        a = np.stack([np.full((4, 4), v, dtype=np.uint8) for v in (10, 20, 30)], axis=2)
        out = RS.resample_average(a, 2, 2)
        assert out.shape == (2, 2, 3)
        assert (out[..., 0] == 10).all() and (out[..., 2] == 30).all()

    def test_mode(self):
        a = np.array([[1, 1, 2, 2], [1, 3, 2, 2], [5, 5, 6, 6], [5, 5, 7, 6]],
                     dtype=np.uint8)
        out = RS.resample_mode(a, 2, 2)
        np.testing.assert_array_equal(out, [[1, 2], [5, 6]])

    def test_mode_tiebreak_smallest(self):
        a = np.array([[1, 2], [2, 1]], dtype=np.uint8)
        assert RS.resample_mode(a, 1, 1)[0, 0] == 1

    @pytest.mark.parametrize("method", ["cubic", "lanczos", "average", "mode"])
    def test_scale_to_tile_all_methods(self, method):
        from gdal_spark.fixtures.images import make_pixels

        a = make_pixels(100, 80)
        out = RS.scale_to_tile(a, 64, method)
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.uint8


class TestTilingMethods:
    @pytest.mark.parametrize("method", ["cubic", "average"])
    def test_pyramid_render_with_kernel(self, method):
        from gdal_spark.codecs.registry import decode
        from gdal_spark.fixtures.images import generate_images_pdf
        from gdal_spark.oracle.tiling import render_image_tiles

        r = generate_images_pdf(1).iloc[0]
        arr = decode(r["bytes"])
        tiles = list(render_image_tiles(arr, r["lon"], r["lat"], r["gsd_m"], method))
        assert len(tiles) >= 1
        for _, _, _, t in tiles:
            assert t.shape == (256, 256, 3)


class TestContourFill:
    def test_contour_simple_step(self):
        # half the raster above the level -> one vertical line of segments
        a = np.zeros((6, 6))
        a[:, 3:] = 10.0
        segs = contour_segments(a, [5.0])
        assert len(segs) == 5  # one per cell row
        for _, x1, y1, x2, y2 in segs:
            assert x1 == pytest.approx(2.5)
            assert x2 == pytest.approx(2.5)

    def test_contour_summary_lengths(self):
        a = np.zeros((6, 6))
        a[:, 3:] = 10.0
        summ = contour_summary(a, [5.0])
        n, ln = summ[5.0]
        assert n == 5
        assert ln == pytest.approx(5.0)

    def test_contour_no_crossing(self):
        assert contour_segments(np.zeros((4, 4)), [5.0]) == []

    def test_fill_nodata(self):
        a = np.full((9, 9), 100.0)
        mask = np.zeros((9, 9), dtype=bool)
        mask[4, 4] = True
        a[4, 4] = -1
        out = fill_nodata(a, mask)
        assert out[4, 4] == pytest.approx(100.0)
        assert (out[~mask] == 100.0).all()

    def test_fill_nodata_gradient(self):
        a = np.tile(np.arange(9, dtype=np.float64), (9, 1))
        mask = np.zeros((9, 9), dtype=bool)
        mask[4, 4] = True
        out = fill_nodata(a, mask, max_distance=2)
        assert out[4, 4] == pytest.approx(4.0, abs=0.2)


class TestLayerAlgebraCompletion:
    @pytest.fixture(scope="class")
    def layers(self, spark):
        a = spark.createDataFrame(
            pd.DataFrame(
                [
                    dict(aid=1, minx=0.0, miny=0.0, maxx=10e5, maxy=10e5),
                    dict(aid=2, minx=-20e5, miny=-20e5, maxx=-15e5, maxy=-15e5),
                ]
            )
        )
        b = spark.createDataFrame(
            pd.DataFrame([dict(bid=10, minx=5e5, miny=5e5, maxx=20e5, maxy=20e5)])
        )
        return a, b

    def _area(self, df):
        return ((df.maxx - df.minx) * (df.maxy - df.miny)).sum()

    def test_union_partition(self, layers):
        from gdal_spark.operators.layer_algebra import union

        a, b = layers
        got = union(a, b).toPandas()
        both = got[got.aid.notna() & got.bid.notna()]
        a_only = got[got.bid.isna()]
        b_only = got[got.aid.isna()]
        assert len(both) == 1  # one intersecting pair
        # pieces partition area(A) + area(B): total = A + B - overlap
        total = self._area(got)
        assert total == pytest.approx(
            self._area(a.toPandas()) + self._area(b.toPandas()) - self._area(both)
        )
        assert len(a_only) >= 2 and len(b_only) >= 2

    def test_sym_difference(self, layers):
        from gdal_spark.operators.layer_algebra import sym_difference

        a, b = layers
        got = sym_difference(a, b).toPandas()
        overlap = 5e5 * 5e5
        assert self._area(got) == pytest.approx(
            self._area(a.toPandas()) + self._area(b.toPandas()) - 2 * overlap
        )

    def test_update(self, layers):
        from gdal_spark.operators.layer_algebra import update

        a, b = layers
        got = update(a, b).toPandas()
        # method layer passes through whole; A clipped around it
        assert ((got.bid == 10) & (got.minx == 5e5)).any()
        assert self._area(got) == pytest.approx(
            self._area(a.toPandas()) + self._area(b.toPandas())
            - 5e5 * 5e5  # overlap erased from A
        )


class TestContourOperator:
    def test_contour_operator(self, spark):
        from gdal_spark.fixtures.images import generate_images_pdf
        from gdal_spark.operators.rasterops import contour

        imgs = spark.createDataFrame(generate_images_pdf(3))
        got = contour(imgs).toPandas()
        assert set(got["level"].unique()) <= {64.0, 128.0, 192.0}
        assert (got["n_segments"] > 0).all()

    def test_fill_nodata_operator(self, spark):
        from gdal_spark.fixtures.images import generate_images_pdf
        from gdal_spark.operators.rasterops import fill_nodata_stats

        imgs = spark.createDataFrame(generate_images_pdf(3))
        got = fill_nodata_stats(imgs).toPandas()
        assert (got["n_filled"] >= 0).all()
        assert (got["n_filled"] > 0).any()
