"""ExecuteSQL dialect surface, special fields, phash hamming, streaming dedup."""

import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR


class TestExecuteSQL:
    def test_sparksql_dialect(self, spark):
        from gdal_spark.sql.execute_sql import execute_sql

        df = execute_sql(
            spark, "SELECT COUNT(*) AS n FROM orders", sf_dir=SF_DIR
        )
        assert df.collect()[0]["n"] > 0

    def test_ogrsql_dialect_rejects_group_by(self, spark):
        from gdal_spark.sql.execute_sql import execute_sql

        with pytest.raises(ValueError, match="OGR SQL"):
            execute_sql(
                spark,
                "SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY o_orderstatus",
                sf_dir=SF_DIR, dialect="OGRSQL",
            )

    def test_ogrsql_summary_allowed(self, spark):
        from gdal_spark.sql.execute_sql import execute_sql

        df = execute_sql(
            spark,
            "SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders",
            sf_dir=SF_DIR, dialect="OGRSQL",
        )
        r = df.collect()[0]
        assert r["mn"] < r["mx"]

    def test_st_functions_available(self, spark):
        from gdal_spark.sql.execute_sql import execute_sql

        df = execute_sql(
            spark,
            "SELECT ST_AsText(ST_GeomFromText('POINT (1 2)')) AS t",
            sf_dir=SF_DIR,
        )
        assert df.collect()[0]["t"] == "POINT (1 2)"

    def test_special_fields(self, spark):
        from gdal_spark.fixtures.tile_grid import tile_grid_df
        from gdal_spark.sql.execute_sql import execute_sql, with_special_fields

        execute_sql(spark, "SELECT 1", sf_dir=SF_DIR)  # registers ST fns
        g = with_special_fields(tile_grid_df(spark, 2, 2), geom_col="wkb")
        pdf = g.select("FID", "OGR_GEOM_AREA").toPandas()
        assert pdf["FID"].is_unique
        assert (pdf["OGR_GEOM_AREA"] > 0).all()


class TestHammingPairs:
    def test_planted_pairs_recovered(self, spark):
        from gdal_spark.operators.dedup import hamming_near_pairs

        rng = np.random.default_rng(4)
        base = rng.integers(0, 1 << 62, 200, dtype=np.int64)
        hashes = base.copy()
        # plant: ids 100.. share id-100's hash with 1-3 bits flipped
        for i in range(5):
            hashes[100 + i] = base[i] ^ (1 << (i * 7)) ^ (1 if i % 2 else 0)
        df = spark.createDataFrame(
            pd.DataFrame({"pid": np.arange(200, dtype=np.int64), "ph": hashes})
        )
        got = hamming_near_pairs(df, "ph", "pid", max_hamming=3).toPandas()
        pairs = set(zip(got.id_a, got.id_b))
        for i in range(5):
            assert (i, 100 + i) in pairs, i
        assert (got["hamming"] <= 3).all()


class TestStreamingDedup:
    def test_streaming_dedup(self, spark, tmp_path):
        from gdal_spark.fixtures.images import generate_images_pdf
        from gdal_spark.streaming.incremental import streaming_dedup

        src = str(tmp_path / "src")
        pdf = generate_images_pdf(10)
        dup = pd.concat([pdf, pdf.head(4)], ignore_index=True)  # duplicates
        spark.createDataFrame(dup).coalesce(1).write.parquet(src)
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")
        streaming_dedup(spark, src, ckpt, sink)
        out = spark.read.parquet(sink).toPandas()
        assert len(out) == 10
        assert out["image_id"].is_unique
