"""Raster attribute tables (gcore/gdal_rat.cpp: thematic VALUE/COUNT
default RAT, athematic min/max GetRowOfValue classification)."""

import numpy as np

from gdal_spark.operators.rat import (classify_with_rat, default_rat,
                                      rat_row_of_value)

RAT = [(0, 120, 0, "low"), (120, 150, 1, "mid"),
       (150, 180, 2, "high"), (180, 256, 3, "peak")]


class TestRowOfValue:
    def test_half_open_ranges(self):
        assert rat_row_of_value(RAT, 0) == 0
        assert rat_row_of_value(RAT, 119.999) == 0
        assert rat_row_of_value(RAT, 120) == 1
        assert rat_row_of_value(RAT, 179.5) == 2
        assert rat_row_of_value(RAT, 255) == 3
        assert rat_row_of_value(RAT, 300) == -1
        assert rat_row_of_value(RAT, -1) == -1


class TestDefaultRat:
    def test_value_counts_match_bincount(self, spark):
        from gdal_spark.fixtures.images import images_df, make_pixels

        imgs = images_df(spark, 6).where("fmt = 'png'")
        got = default_rat(imgs).collect()
        by_img = {}
        for r in got:
            by_img.setdefault(r["image_id"], {})[r["value"]] = r["count"]
        metas = {r["image_id"]: (r["w"], r["h"])
                 for r in imgs.select("image_id", "w", "h").collect()}
        assert set(by_img) == set(metas)
        for iid, (w, h) in metas.items():
            b1 = make_pixels(w, h)[..., 0]
            cnt = np.bincount(b1.ravel(), minlength=256)
            want = {int(v): int(cnt[v]) for v in np.nonzero(cnt)[0]}
            assert by_img[iid] == want


class TestClassify:
    def test_cone_classification_counts_and_checksum(self, spark):
        from gdal_spark.fixtures.patterns import (cone_pixels,
                                                  pattern_images_df)
        from gdal_spark.oracle.checksum import checksum_image

        imgs = pattern_images_df(spark, "cone", 6)
        got = {r["image_id"]: r
               for r in classify_with_rat(imgs, RAT).collect()}
        metas = {r["image_id"]: (r["w"], r["h"])
                 for r in imgs.select("image_id", "w", "h").collect()}
        for iid, (w, h) in metas.items():
            b1 = cone_pixels(w, h)[..., 0].astype(np.float64)
            cls = np.select([b1 < 120, b1 < 150, b1 < 180],
                            [0, 1, 2], default=3)
            r = got[iid]
            assert r["n_classes"] == len(np.unique(cls))
            assert list(r["class_counts"]) == [
                int((cls == c).sum()) for c in range(4)]
            assert r["cs"] == checksum_image(cls.astype(np.uint8))[0]

    def test_out_of_rat_values_unclassified(self, spark):
        # a RAT that covers only [0, 100) leaves the rest at class -1
        from gdal_spark.fixtures.patterns import cone_pixels, pattern_images_df

        imgs = pattern_images_df(spark, "cone", 3)
        small = [(0, 100, 0, "only")]
        got = classify_with_rat(imgs, small).collect()
        # cone values are >= 104 at these sizes: nothing classifies
        for r in got:
            assert r["n_classes"] == 0
            assert list(r["class_counts"]) == [0]
