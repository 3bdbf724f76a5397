"""ST_* SQL functions, grid interpolation, rasterize/polygonize/sieve/
proximity kernels and operators."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.oracle import rasterize as RZ


class TestRasterizeKernels:
    def test_rasterize_square(self):
        gt = [0.0, 1.0, 0.0, 10.0, 0.0, -1.0]
        ring = [(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]
        out = RZ.rasterize_polygon(ring, gt, 10, 10)
        # pixel centers strictly inside [2,8]x[2,8]: cols/rows 2..7
        assert out.sum() == 36
        assert out[2:8, 2:8].all()  # rows 2..7 (y from 8 down to 2)

    def test_rasterize_points_add(self):
        gt = [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]
        out = RZ.rasterize_points([0.5, 0.7, 3.2], [3.5, 3.5, 0.5], gt, 4, 4)
        assert out[0, 0] == 2  # two points in the top-left pixel
        assert out[3, 3] == 1
        assert out.sum() == 3

    def test_label_components(self):
        a = np.array(
            [[1, 1, 2], [1, 2, 2], [3, 3, 2]], dtype=np.uint8
        )
        labels, n = RZ.label_components(a)
        assert n == 3
        assert labels[0, 0] == labels[1, 0] == labels[0, 1]
        assert labels[0, 2] == labels[1, 1] == labels[2, 2]
        assert labels[2, 0] == labels[2, 1]

    def test_label_snake(self):
        # serpentine component exercises propagation convergence
        a = np.zeros((5, 5), dtype=np.uint8)
        a[0, :] = 1
        a[1, 4] = 1
        a[2, :] = 1
        a[3, 0] = 1
        a[4, :] = 1
        labels, n = RZ.label_components(a)
        assert n == 3  # the snake + two background gaps
        snake = labels[a == 1]
        assert (snake == snake[0]).all()

    def test_polygonize_rows(self):
        a = np.array([[5, 5, 7], [5, 7, 7]], dtype=np.uint8)
        rows = RZ.polygonize(a)
        assert len(rows) == 2
        vals = {r[0]: r for r in rows}
        assert vals[5.0][1] == 3  # count
        assert vals[7.0][1] == 3
        assert vals[5.0][2:] == (0, 0, 1, 1)  # bbox of the 5-component

    def test_sieve_removes_small(self):
        a = np.zeros((6, 6), dtype=np.uint8)
        a[2, 2] = 9  # single-pixel island
        out = RZ.sieve(a, threshold=2)
        assert (out == 0).all()

    def test_proximity_exact(self):
        m = np.zeros((7, 9), dtype=bool)
        m[3, 4] = True
        d = RZ.proximity(m)
        assert d[3, 4] == 0
        assert d[3, 5] == 1
        assert d[2, 3] == pytest.approx(np.sqrt(2))
        # chamfer (1, sqrt2) distance for (2, 1) offset = sqrt2 + 1
        assert d[1, 3] == pytest.approx(np.sqrt(2) + 1)


class TestSTFunctions:
    @pytest.fixture(scope="class", autouse=True)
    def register(self, spark):
        from gdal_spark.sql.ogr_compat import register_st_functions

        register_st_functions(spark)

    @pytest.fixture(scope="class")
    def geoms(self, spark):
        from gdal_spark.fixtures.tile_grid import wkb_polygon
        from gdal_spark.sql.ogr_compat import wkb_point

        pdf = pd.DataFrame(
            {
                "gid": [1, 2, 3],
                "g": [
                    wkb_polygon([(0, 0), (10, 0), (10, 6), (0, 6), (0, 0)]),
                    wkb_point(5.0, 3.0),
                    wkb_point(20.0, 20.0),
                ],
            }
        )
        df = spark.createDataFrame(pdf)
        df.createOrReplaceTempView("geoms")
        return pdf

    def test_area_astext(self, spark, geoms):
        got = spark.sql(
            "SELECT gid, ST_Area(g) AS a, ST_AsText(g) AS t FROM geoms ORDER BY gid"
        ).collect()
        assert got[0]["a"] == 60.0
        assert got[0]["t"].startswith("POLYGON ((0 0, 10 0")
        assert got[1]["t"] == "POINT (5 3)"

    def test_predicates(self, spark, geoms):
        got = spark.sql(
            """
            SELECT a.gid, b.gid AS bid,
                   ST_Intersects(a.g, b.g) AS i,
                   ST_Within(b.g, a.g) AS w,
                   ST_Contains(a.g, b.g) AS c
            FROM geoms a JOIN geoms b ON a.gid = 1 AND b.gid IN (2, 3)
            ORDER BY bid
            """
        ).collect()
        assert (got[0]["i"], got[0]["w"], got[0]["c"]) == (True, True, True)
        assert (got[1]["i"], got[1]["w"], got[1]["c"]) == (False, False, False)

    def test_distance_centroid_buffer(self, spark, geoms):
        # NOTE: scalar-subquery arguments to pandas UDFs misbehave in Spark
        # (both args collapse to one value) — use column references, the
        # realistic call shape.
        got = spark.sql(
            """
            SELECT ST_Distance(a.g, b.g) AS d,
                   ST_X(ST_Centroid(p.g)) AS cx,
                   ST_Area(ST_Buffer(p.g, 1.0)) AS ba
            FROM geoms a, geoms b, geoms p
            WHERE a.gid = 2 AND b.gid = 3 AND p.gid = 1
            """
        ).collect()[0]
        assert got["d"] == pytest.approx(np.hypot(15, 17))
        assert got["cx"] == pytest.approx(5.0)
        assert got["ba"] == pytest.approx(12 * 8)

    def test_wkt_roundtrip(self, spark, geoms):
        got = spark.sql(
            "SELECT ST_AsText(ST_GeomFromText('POINT (1.5 -2.25)')) AS t"
        ).collect()[0]["t"]
        assert got == "POINT (1.5 -2.25)"


class TestGridding:
    @pytest.fixture(scope="class")
    def pts(self, spark):
        rng = np.random.default_rng(9)
        pdf = pd.DataFrame(
            {
                "x": rng.uniform(0, 100, 300),
                "y": rng.uniform(0, 100, 300),
                "v": rng.uniform(0, 10, 300),
            }
        )
        return spark.createDataFrame(pdf), pdf

    @pytest.mark.parametrize("alg", ["invdist", "average", "nearest", "count"])
    def test_matches_numpy(self, spark, pts, alg):
        from gdal_spark.operators.gridding import grid_interpolate

        df, pdf = pts
        nx = ny = 10
        cellsz = 10.0
        radius = 15.0
        got = (
            grid_interpolate(df, 0.0, 0.0, cellsz, nx, ny, radius, alg)
            .toPandas()
            .set_index(["px", "py"])
            .sort_index()
        )
        xs, ys, vs = pdf["x"].to_numpy(), pdf["y"].to_numpy(), pdf["v"].to_numpy()
        for px in range(nx):
            for py in range(ny):
                cx = (px + 0.5) * cellsz
                cy = 100.0 - (py + 0.5) * cellsz
                d2 = (xs - cx) ** 2 + (ys - cy) ** 2
                m = d2 <= radius * radius
                if not m.any():
                    assert (px, py) not in got.index
                    continue
                if alg == "invdist":
                    w = 1.0 / d2[m]
                    exp = (w * vs[m]).sum() / w.sum()
                elif alg == "average":
                    exp = vs[m].mean()
                elif alg == "nearest":
                    exp = vs[m][np.argmin(d2[m])]
                else:
                    exp = m.sum()
                assert got.loc[(px, py), "value"] == pytest.approx(exp, abs=2e-6), (
                    alg, px, py
                )
                assert got.loc[(px, py), "n"] == m.sum()


class TestVectorizeOperators:
    def test_polygonize_operator(self, spark):
        from gdal_spark.fixtures.images import generate_images_pdf
        from gdal_spark.operators.vectorize import polygonize

        pdf = generate_images_pdf(3)
        imgs = spark.createDataFrame(pdf)
        got = polygonize(imgs, quantize=64, downsample_to=32).toPandas()
        # components partition the (possibly downsampled) raster exactly
        sums = got.groupby("image_id")["pixel_count"].sum()
        for r in pdf.itertuples(index=False):
            exp = min(r.w, 32) * min(r.h, 32)
            assert sums[r.image_id] == exp
        assert (got["value"] < 4).all()

    def test_proximity_operator(self, spark):
        from gdal_spark.fixtures.images import generate_images_pdf
        from gdal_spark.operators.vectorize import proximity_map

        imgs = spark.createDataFrame(generate_images_pdf(3))
        got = proximity_map(imgs, target_value=0, downsample_to=32).toPandas()
        # -1 = documented sentinel for "no target pixel in this image"
        assert (got["dmax"] >= -1).all()
        assert (got["dmax"] >= 0).any()

    def test_rasterize_point_counts(self, spark):
        from gdal_spark.operators.vectorize import rasterize_point_counts

        pdf = pd.DataFrame({"x": [0.5, 0.7, 3.2], "y": [3.5, 3.5, 0.5]})
        got = (
            rasterize_point_counts(
                spark.createDataFrame(pdf), 0.0, 4.0, 1.0, 4, 4
            )
            .toPandas()
            .set_index(["px", "py"])
        )
        assert got.loc[(0, 0), "n"] == 2
        assert got.loc[(3, 3), "n"] == 1


class TestPolygonizeRings:
    def test_ring_kernels(self):
        import numpy as np

        from gdal_spark.oracle.rasterize import polygonize_rings, trace_rings

        def area(r):
            return 0.5 * abs(np.dot(r[:-1, 0], r[1:, 1]) - np.dot(r[1:, 0], r[:-1, 1]))

        m = np.zeros((7, 7), dtype=bool)
        m[1:6, 1:6] = True
        m[3, 3] = False  # donut
        rings = trace_rings(m)
        assert sorted(round(area(r)) for r in rings) == [1, 25]
        rows = polygonize_rings(np.array([[5, 5, 7], [5, 7, 7]], dtype=np.uint8))
        for val, cnt, outer, holes in rows:
            assert area(outer) == cnt  # solid components: ring area == pixels
            assert holes == 0

    def test_operator_emit_rings(self, spark):
        import numpy as np

        from gdal_spark.fixtures.images import generate_images_pdf
        from gdal_spark.fixtures.tile_grid import parse_wkb_polygon
        from gdal_spark.operators.vectorize import polygonize

        imgs = spark.createDataFrame(generate_images_pdf(2))
        got = polygonize(imgs, quantize=64, downsample_to=24, emit_rings=True).toPandas()
        assert {"wkb", "n_holes"} <= set(got.columns)
        for r in got.itertuples(index=False):
            ring = parse_wkb_polygon(bytes(r.wkb))
            assert np.array_equal(ring[0], ring[-1])  # closed
            a = 0.5 * abs(
                np.dot(ring[:-1, 0], ring[1:, 1]) - np.dot(ring[1:, 0], ring[:-1, 1])
            )
            assert a >= r.pixel_count - 1e-9 if r.n_holes else a == r.pixel_count
