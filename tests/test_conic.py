"""Lambert conformal conic + polar stereographic closed forms
(oracle/conic.py; Snyder PP 1395) and the generic projected-CRS warp."""

import numpy as np
import pytest

from gdal_spark.oracle import conic as CC


class TestConicTransforms:
    def test_lcc_round_trip(self):
        p = CC.lcc_europe()
        rng = np.random.default_rng(3)
        lon = rng.uniform(-10, 30, 500)
        lat = rng.uniform(36, 64, 500)
        E, N = p.forward(lon, lat)
        lo2, la2 = p.inverse(E, N)
        assert np.abs(lo2 - lon).max() < 1e-12
        assert np.abs(la2 - lat).max() < 1e-12

    def test_lcc_origin_and_scale(self):
        p = CC.lcc_europe()
        E, N = p.forward(10.0, 52.0)
        assert E == pytest.approx(4000000.0)
        assert N == pytest.approx(2800000.0)
        # conformal: scale along both standard parallels equals 1 -> the
        # projected length of a 0.1-deg arc on lat1 matches the geodesic
        for lat in (35.0, 65.0):
            e1, n1 = p.forward(9.95, lat)
            e2, n2 = p.forward(10.05, lat)
            s = np.sin(np.deg2rad(lat))
            arc = (np.deg2rad(0.1) * np.cos(np.deg2rad(lat)) * CC._A
                   / np.sqrt(1 - CC._E2 * s * s))
            assert np.hypot(e2 - e1, n2 - n1) == pytest.approx(arc, rel=1e-6)

    def test_polar_stereo_known_values(self):
        s = CC.epsg_3031()
        E, N = s.forward(0.0, -71.0)
        # EPSG:3031 standard-parallel point on the central meridian
        assert E == pytest.approx(0.0, abs=1e-6)
        assert N == pytest.approx(2082760.1085, abs=0.01)
        E, N = s.forward(0.0, -90.0)
        assert E == pytest.approx(0.0, abs=1e-6) and N == pytest.approx(0.0, abs=1e-6)
        # quadrant sanity: +90E maps to +x
        E, N = s.forward(90.0, -71.0)
        assert E > 2e6 and abs(N) < 1.0

    def test_polar_stereo_round_trip_both_aspects(self):
        rng = np.random.default_rng(5)
        for p, losign in ((CC.epsg_3031(), -1), (CC.epsg_3413(), 1)):
            lon = rng.uniform(-180, 180, 500)
            lat = losign * rng.uniform(55, 89.5, 500)
            E, N = p.forward(lon, lat)
            lo2, la2 = p.inverse(E, N)
            dl = (lo2 - lon + 180) % 360 - 180
            assert np.abs(dl).max() < 1e-11
            assert np.abs(la2 - lat).max() < 1e-11

    def test_generic_warp_with_lcc(self):
        from gdal_spark.oracle.warp import warp_proj_to_4326

        p = CC.lcc_europe()
        rng = np.random.default_rng(7)
        a = rng.integers(0, 256, (40, 40), dtype=np.uint8)
        cx, cy = p.forward(10.0, 50.0)
        gt = [float(cx) - 20 * 100.0, 100.0, 0.0,
              float(cy) + 20 * 100.0, 0.0, -100.0]
        out, dst_gt = warp_proj_to_4326(
            a, gt, to_lonlat=p.inverse, from_lonlat=p.forward,
            method="nearest")
        assert out.shape == a.shape
        # dst bbox must bracket the source center lon/lat
        assert dst_gt[0] < 10.0 < dst_gt[0] + 40 * dst_gt[1]
        assert dst_gt[3] + 40 * dst_gt[5] < 50.0 < dst_gt[3]
        # same-resolution nearest warp keeps the value population
        assert abs(float(out.mean()) - float(a.mean())) < 8.0


class TestTransformPoints:
    def test_all_families_roundtrip(self, spark):
        import numpy as np

        from gdal_spark.fixtures.images import images_df
        from gdal_spark.functions.crs import transform_points

        imgs = images_df(spark, 20).select("image_id", "lon", "lat")
        from pyspark.sql import functions as F

        domains = {
            "3857": imgs,
            "utm31": imgs.select("image_id", (F.col("lon") / 60 + 3).alias("lon"),
                                 (F.col("lat") * 0.4).alias("lat")),
            "lcc_eu": imgs.select("image_id", (F.col("lon") / 12 + 10).alias("lon"),
                                  (F.col("lat") / 8 + 48).alias("lat")),
            "stereo_s": imgs.select("image_id", "lon",
                                    (-70 + F.col("lat") / 20).alias("lat")),
        }
        for fam, src in domains.items():
            got = transform_points(src, fam).toPandas()
            assert (got["rt_err_udeg"] < 1e-3).all(), fam
            assert got["x"].nunique() > 1, fam

    def test_3857_matches_oracle(self, spark):
        import numpy as np

        from gdal_spark.fixtures.images import images_df
        from gdal_spark.functions.crs import transform_points
        from gdal_spark.oracle.mercator import lonlat_to_meters

        imgs = images_df(spark, 10).select("image_id", "lon", "lat")
        got = transform_points(imgs, "3857").toPandas()
        ex, ey = lonlat_to_meters(got["lon"].to_numpy(), got["lat"].to_numpy())
        np.testing.assert_allclose(got["x"], ex, rtol=0, atol=1e-6)
        np.testing.assert_allclose(got["y"], ey, rtol=0, atol=1e-6)
