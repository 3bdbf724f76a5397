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

    @pytest.mark.parametrize("max_hamming", [1, 3, 7, 10])
    def test_recall_exhaustive_at_every_radius(self, spark, max_hamming):
        """Pigeonhole guarantee: EVERY pair within max_hamming bits is found
        (round-1 fix: bands must be max_hamming + 1, not fixed at 4)."""
        from gdal_spark.operators.dedup import hamming_near_pairs

        rng = np.random.default_rng(7)
        base = rng.integers(0, 1 << 62, 60, dtype=np.int64)
        hashes = base.copy()
        # plant pairs at every Hamming distance k = 0..max_hamming, with the
        # flipped bits spread across the word (worst case for narrow bands)
        for k in range(max_hamming + 1):
            v = int(base[k])
            step = max(1, 63 // max(k, 1))
            for j in range(k):
                v ^= 1 << ((j * step + 5 * k) % 63)
            hashes[30 + k] = np.int64(v)
        df = spark.createDataFrame(
            pd.DataFrame({"pid": np.arange(60, dtype=np.int64), "ph": hashes})
        )
        got = hamming_near_pairs(df, "ph", "pid", max_hamming=max_hamming).toPandas()
        pairs = set(zip(got.id_a, got.id_b))
        for k in range(max_hamming + 1):
            assert (k, 30 + k) in pairs, f"missed planted pair at Hamming {k}"
        # oracle: exhaustive numpy cross check — no pair under the radius missed
        xor = hashes[:, None] ^ hashes[None, :]
        ham = np.vectorize(lambda v: bin(v & ((1 << 64) - 1)).count("1"))(
            xor.astype(np.uint64)
        )
        expect = {
            (int(a), int(b))
            for a in range(60) for b in range(a + 1, 60)
            if ham[a, b] <= max_hamming
        }
        assert pairs == expect

    def test_minhash_skips_empty_docs(self, spark):
        """Empty/whitespace docs share a sentinel signature — they must not
        form a quadratic LSH bucket (round-1 hot-bucket guard)."""
        from gdal_spark.operators.dedup import minhash_lsh_pairs

        docs = [(i, "") if i < 20 else (i, "   \t ") for i in range(40)]
        docs += [(100, "a real document with words " * 4),
                 (101, "a real document with words " * 4)]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
        got = minhash_lsh_pairs(df, jaccard_threshold=0.5).toPandas()
        pairs = set(zip(got.id_a, got.id_b))
        assert (100, 101) in pairs
        assert all(a >= 100 for a, _ in pairs)  # no empty-doc pairs


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


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark):
        """Pre-bucketing both sides on the join key removes every Exchange
        from the join plan — the co-located-join strategy for repeated
        big-table joins (Iceberg bucket-transform analogue)."""
        from pyspark.sql import functions as F

        from gdal_spark.sources.bucketed import (
            assert_no_shuffle, bucketed_join, write_bucketed,
        )

        a = (
            spark.range(20000).withColumnRenamed("id", "k")
            .withColumn("va", F.col("k") * 2)
        )
        b = (
            spark.range(10000).withColumnRenamed("id", "k")
            .withColumn("vb", F.col("k") + 1)
        )
        write_bucketed(a, "bkt_test_a", "k", 8)
        write_bucketed(b, "bkt_test_b", "k", 8)
        try:
            j = bucketed_join(spark, "bkt_test_a", "bkt_test_b", "k",
                              force_sort_merge=True)
            assert_no_shuffle(j)
            assert j.count() == 10000
            # the unbucketed control DOES shuffle — the assertion is real
            plain = a.hint("MERGE").join(b, "k")
            plan = plain._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan or "Broadcast" in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS bkt_test_a")
            spark.sql("DROP TABLE IF EXISTS bkt_test_b")


class TestArrowDbConnector:
    def test_read_sql_matches_spark_read(self, spark):
        """Arrow-native DB read (ADBC role, gcore/gdal_adbc.cpp): DuckDB
        executes, results cross as Arrow — equal to Spark's own scan."""
        from gdal_spark.sources.adbc import read_sql

        got = read_sql(
            spark,
            f"SELECT o_orderkey, o_totalprice FROM "
            f"read_parquet('{SF_DIR}/orders.parquet') WHERE o_orderkey <= 500",
        ).toPandas().sort_values("o_orderkey", ignore_index=True)
        exp = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .where("o_orderkey <= 500")
            .select("o_orderkey", "o_totalprice")
            .toPandas().sort_values("o_orderkey", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_partitioned_read_complete_and_distributed(self, spark):
        """Ranged partitioned read: every row exactly once across stride
        partitions (open-ended first/last), executed task-side."""
        from gdal_spark.sources.adbc import read_sql_partitioned

        sql = (f"SELECT o_orderkey, o_custkey FROM "
               f"read_parquet('{SF_DIR}/orders.parquet')")
        got = read_sql_partitioned(
            spark, sql, "o_orderkey", lower=0, upper=60000, num_partitions=6
        )
        exp = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        assert got.count() == exp.count()
        g = got.toPandas().sort_values("o_orderkey", ignore_index=True)
        e = exp.select("o_orderkey", "o_custkey").toPandas().sort_values(
            "o_orderkey", ignore_index=True
        )
        pd.testing.assert_frame_equal(g, e)
