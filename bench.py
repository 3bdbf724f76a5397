"""Benchmark harness — prints ONE JSON line.

Headline metric: wall seconds for the end-to-end north-rule pipeline
(synthesize/read image+caption table -> cell encode -> tile assign ->
decode -> native-zoom tile render -> overview reduction -> checksums), plus
per-query seconds for representative operators at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N executors):
run the same pipeline at local[8] and local[32] on the same input and report
throughput at both + efficiency = (T8 / T32) / 4. Enabled with
SPARK_GRAFT_SCALING=1 (adds a second, smaller-parallelism run).

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir for query timings (default testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the main run (default 32)
  SPARK_GRAFT_IMAGES   synthetic image count (default 20000)
  SPARK_GRAFT_SCALING  "1" -> also run local[cpus/4] and report efficiency
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_IMAGES", "20000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "0") == "1"
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data")

BENCH_QUERIES = [
    "tile_assign",
    "spatial_join_tiles",
    "knn_nearest_supplier",
    "group_by_agg",
    "summary_stats",
    "window_rank",
    "minhash_lsh_pairs",
    "similarity_topk",
    "image_decode_stats",
]


def ensure_images(spark, n: int) -> str:
    """Materialize the deterministic image table once (bench reads parquet so
    the measured pipeline excludes synthesis)."""
    path = os.path.join(CACHE_DIR, f"images_{n}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from gdal_spark.fixtures.images import write_images_parquet

        write_images_parquet(spark, path, n, partitions=max(CPUS * 4, 32))
    return path


def run_pipeline(spark, images_path: str) -> tuple[float, int]:
    """The timed north-rule job. Returns (seconds, tile_rows)."""
    from pyspark.sql import functions as F

    from gdal_spark.functions import cells as C
    from gdal_spark.operators.tiling import build_tile_pyramid

    imgs = spark.read.parquet(images_path)
    # drop any cached plans (build_tile_pyramid persists levels; Spark's
    # CacheManager matches canonicalized plans, so a previous run's cache
    # would silently serve this one and fake the timing)
    spark.catalog.clearCache()
    t0 = time.time()
    tiles = build_tile_pyramid(imgs, tminz=8)
    out = (
        tiles.withColumn("cell", C.cell(F.lit(2.3), F.lit(48.8), "z"))
        .agg(
            F.count("*").alias("n"),
            F.sum("cs1").alias("s1"),
            F.sum(F.crc32(F.col("tile"))).alias("sbytes"),
        )
        .collect()[0]
    )
    return time.time() - t0, int(out["n"])


def fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # force a brand-new context with the new master
        SparkSession.builder._options = {}

    from gdal_spark.session import get_spark

    s = get_spark(cores=cores, app_name=f"bench-{cores}")
    s.sparkContext.setLogLevel("ERROR")
    return s


def main():
    result: dict = {"sf": SF_DIR, "unit": "sec", "images": N_IMAGES}

    spark = fresh_spark(CPUS)
    images_path = ensure_images(spark, N_IMAGES)

    # warm-up (JVM/codegen) on a small DISJOINT table — same path as the
    # timed input would leave matching cached plans behind
    warm_path = ensure_images(spark, 800)
    run_pipeline(spark, warm_path)

    t_full, n_tiles = run_pipeline(spark, images_path)
    result["metric"] = "e2e_tile_pipeline_sec"
    result["value"] = round(t_full, 3)
    result["tiles"] = n_tiles
    result["images_per_sec"] = round(N_IMAGES / t_full, 1)

    # representative operator timings at SF_DIR
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qtimes = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        qtimes[name] = round(time.time() - t0, 3)
    result["queries"] = qtimes

    if DO_SCALING:
        small = max(2, CPUS // 4)
        spark_small = fresh_spark(small)
        run_pipeline(spark_small, warm_path)  # JVM/codegen warm-up
        t_small, _ = run_pipeline(spark_small, images_path)
        eff = (t_small / t_full) / (CPUS / small)
        result["scaling"] = {
            f"local[{small}]_sec": round(t_small, 3),
            f"local[{CPUS}]_sec": round(t_full, 3),
            f"images_per_sec_{small}": round(N_IMAGES / t_small, 1),
            f"images_per_sec_{CPUS}": round(N_IMAGES / t_full, 1),
            "efficiency": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
