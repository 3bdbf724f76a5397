"""Multidim chunked arrays: hyperslab + dimension reductions vs numpy."""

import numpy as np
import pytest

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
