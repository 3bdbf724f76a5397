"""Multidim chunked arrays: hyperslab + dimension reductions vs numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.multidim import (
    MDMeta, array_to_chunks, chunks_to_array, hyperslab, reduce_dim,
)


@pytest.fixture(scope="module")
def cube(spark):
    rng = np.random.default_rng(7)
    arr = rng.uniform(0, 100, (12, 30, 40))  # (time, y, x)
    meta = MDMeta("temp", [("time", 12), ("y", 30), ("x", 40)], [5, 16, 16])
    return arr, meta, array_to_chunks(spark, arr, meta)


class TestMultidim:
    def test_roundtrip(self, spark, cube):
        arr, meta, df = cube
        # 12/5 x 30/16 x 40/16 chunks
        assert df.count() == 3 * 2 * 3
        back = chunks_to_array(df, meta)
        np.testing.assert_array_equal(back, arr)

    @pytest.mark.parametrize("starts,counts", [
        ((0, 0, 0), (12, 30, 40)),     # everything
        ((3, 5, 7), (6, 20, 25)),      # crosses chunk boundaries everywhere
        ((5, 16, 16), (5, 14, 24)),    # chunk-aligned start
        ((11, 29, 39), (1, 1, 1)),     # single corner element
    ])
    def test_hyperslab_matches_numpy(self, spark, cube, starts, counts):
        arr, meta, df = cube
        sub = hyperslab(df, meta, starts, counts)
        got = chunks_to_array(sub, meta)
        exp = arr[tuple(slice(s, s + c) for s, c in zip(starts, counts))]
        np.testing.assert_array_equal(got, exp)

    def test_hyperslab_prunes_chunks(self, spark, cube):
        """The slab predicate prunes to exactly the touched chunks before
        any python slicing happens."""
        arr, meta, df = cube
        sub = hyperslab(df, meta, (0, 0, 0), (5, 16, 16))  # first chunk only
        assert sub.count() == 1

    @pytest.mark.parametrize("dim,op", [
        (0, "mean"), (0, "sum"), (1, "min"), (2, "max"),
    ])
    def test_reduce_dim_matches_numpy(self, spark, cube, dim, op):
        arr, meta, df = cube
        red = reduce_dim(df, meta, dim, op)
        got = chunks_to_array(red, 2)
        exp = getattr(arr, op if op != "mean" else "mean")(axis=dim)
        np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_partitioned_store_roundtrip_and_pruning(self, spark, cube,
                                                     tmp_path):
        """write_md_store lays out var=<name>/c0=<idx> parquet partitions;
        open_md_store + hyperslab turn the slab range into PARTITION
        filters (zero I/O for pruned chunk directories); the group
        sidecar exposes the GDALGroup hierarchy."""
        import io
        import contextlib
        import re

        from gdal_spark.operators.multidim import (
            md_group_tree, open_md_store, write_md_store)

        arr, meta, df = cube
        meta2 = MDMeta(var="/model/era5/t2m", dims=meta.dims,
                       chunks=meta.chunks)
        df2 = df.withColumn("var", F.lit(meta2.var))
        path = str(tmp_path / "store")
        write_md_store(df2, meta2, path, attrs={"title": "demo"})
        back, metas, side = open_md_store(spark, path)
        assert metas[meta2.var].sizes == meta.sizes
        tree = md_group_tree(side)
        assert tree["groups"]["model"]["groups"]["era5"]["vars"] == ["t2m"]
        sub = hyperslab(back, metas[meta2.var], (3, 5, 7), (6, 20, 25))
        got = chunks_to_array(sub, 3)
        np.testing.assert_array_equal(got, arr[3:9, 5:25, 7:32])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            sub.explain()
        pf = re.search(r"PartitionFilters: \[[^\]]*\]", buf.getvalue())
        assert pf and "c0" in pf.group(0) and "/model/era5/t2m" in pf.group(0)


class TestMdCompare:
    """gdal mdim compare (round 5): store diff report."""

    def test_report(self, spark):
        import numpy as np

        from gdal_spark.operators.multidim import (MDMeta, array_to_chunks,
                                                   md_compare)

        m1 = MDMeta("temp", [("t", 6), ("y", 8), ("x", 8)], [2, 4, 4])
        m2 = MDMeta("salt", [("y", 8), ("x", 8)], [4, 4])
        a1 = np.arange(6 * 8 * 8, dtype=np.float64).reshape(6, 8, 8)
        a2 = np.arange(8 * 8, dtype=np.float64).reshape(8, 8)
        ref = array_to_chunks(spark, a1, m1).unionByName(
            array_to_chunks(spark, a2, m2))
        b1 = a1.copy()
        b1[0, 0, 0] += 5.0
        b1[3, 4, 4] -= 2.5
        b1[5, 7, 7] += 0.25
        m3 = MDMeta("wind", [("y", 4), ("x", 4)], [4, 4])
        inp = array_to_chunks(spark, b1, m1).unionByName(
            array_to_chunks(spark, np.ones((4, 4)), m3))
        rep = {(r["var"], r["aspect"]): (r["n"], r["max_abs"])
               for _, r in md_compare(ref, inp).toPandas().iterrows()}
        assert rep[("salt", "only_in_ref")][0] == 4
        assert rep[("wind", "only_in_input")][0] == 1
        assert rep[("temp", "values")] == (3, 5.0)
        assert ("temp", "shape") not in rep
        # identical stores -> empty report (return code 0)
        assert md_compare(ref, ref).count() == 0
        # tolerance drops sub-threshold diffs
        rep2 = {(r["var"], r["aspect"]): r["n"]
                for _, r in md_compare(ref, inp, tolerance=1.0)
                .toPandas().iterrows()}
        assert rep2[("temp", "values")] == 2


class TestMdMosaic:
    """gdal mdim mosaic (round 5): chunk-aligned source placement."""

    def test_tiling_and_last_wins(self, spark):
        import numpy as np

        from gdal_spark.operators.multidim import (MDMeta, array_to_chunks,
                                                   chunks_to_array,
                                                   md_mosaic)

        parts = []
        for i, (oy, ox) in enumerate([(0, 0), (0, 6), (4, 0), (4, 6)]):
            a = np.full((4, 6), float(i + 1))
            m = MDMeta("z", [("y", 4), ("x", 6)], [2, 3])
            parts.append((array_to_chunks(spark, a, m), m, (oy, ox)))
        mw = MDMeta("zw", [("y", 4), ("x", 6)], [2, 3])
        parts.append((array_to_chunks(spark, np.full((4, 6), 9.0), mw),
                      mw, (2, 3)))
        merged, meta = md_mosaic(parts, var="z")
        assert [s for _, s in meta.dims] == [8, 12]
        got = chunks_to_array(merged, meta)
        exp = np.zeros((8, 12))
        exp[0:4, 0:6] = 1
        exp[0:4, 6:12] = 2
        exp[4:8, 0:6] = 3
        exp[4:8, 6:12] = 4
        exp[2:6, 3:9] = 9        # later source wins
        assert np.array_equal(got, exp)

    def test_alignment_contract(self, spark):
        import numpy as np
        import pytest

        from gdal_spark.operators.multidim import (MDMeta, array_to_chunks,
                                                   md_mosaic)

        m = MDMeta("z", [("y", 4), ("x", 6)], [2, 3])
        df = array_to_chunks(spark, np.ones((4, 6)), m)
        with pytest.raises(ValueError, match="not aligned"):
            md_mosaic([(df, m, (1, 0))])
        m2 = MDMeta("z", [("y", 4), ("x", 6)], [4, 3])
        df2 = array_to_chunks(spark, np.ones((4, 6)), m2)
        with pytest.raises(ValueError, match="chunk sizes"):
            md_mosaic([(df, m, (0, 0)), (df2, m2, (4, 0))])


class TestMdReproject:
    """gdal mdim reproject (round 5): map-only horizontal warp."""

    def test_plane_parity_and_contract(self, spark):
        import numpy as np
        import pytest

        from gdal_spark.operators.multidim import (MDMeta, array_to_chunks,
                                                   chunks_to_array,
                                                   md_reproject)
        from gdal_spark.oracle.warp import (lonlat_to_mercator_xy,
                                            mercator_to_lonlat_xy,
                                            warp_proj_to_4326)

        rng = np.random.RandomState(42)
        a = rng.randint(0, 255, size=(4, 16, 16)).astype(np.float64)
        m = MDMeta("b", [("t", 4), ("y", 16), ("x", 16)], [1, 16, 16])
        gt = [-2000000.0, 250000.0, 0.0, 2000000.0, 0.0, -250000.0]
        wdf, wm = md_reproject(array_to_chunks(spark, a, m), m, gt,
                               mercator_to_lonlat_xy,
                               lonlat_to_mercator_xy, method="bilinear")
        got = chunks_to_array(wdf, wm)
        exp = np.stack([
            warp_proj_to_4326(a[t], gt, mercator_to_lonlat_xy,
                              lonlat_to_mercator_xy, method="bilinear")[0]
            for t in range(4)])
        assert np.array_equal(got, exp)
        # horizontal dims must be chunk-resident
        bad = MDMeta("b", [("t", 4), ("y", 16), ("x", 16)], [1, 8, 16])
        with pytest.raises(ValueError, match="unchunked"):
            md_reproject(array_to_chunks(spark, a, bad), bad, gt,
                         mercator_to_lonlat_xy, lonlat_to_mercator_xy)
