"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship north-rule pipeline at sf0.001.
queries()       — operator queries from SURVEY.md §2 (see gdal_spark.queries).
oracle_sql()    — DuckDB-equivalent SQL per query where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the north-rule pipeline end to end at sf0.001 —
    synthesize the image+caption table (input_hint schema), H3-role cell
    encode, spatial join against the tile grid, native-zoom tile render +
    overview reduction, captions joined back byte-identical."""
    from pyspark.sql import functions as F

    from gdal_spark.fixtures.images import images_df
    from gdal_spark.functions import cells as C
    from gdal_spark.operators.tiling import build_tile_pyramid

    imgs = images_df(spark, 60).persist()
    tiles = build_tile_pyramid(imgs, tminz=8)
    return (
        tiles.join(imgs.select("image_id", "caption", "lon", "lat"), "image_id")
        .withColumn("cell", C.cell("lon", "lat", "z"))
        .select("image_id", "z", "x", "y", "cell", "cs1", "cs2", "cs3", "caption")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gdal_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from gdal_spark.queries import all_oracles

    return all_oracles()
